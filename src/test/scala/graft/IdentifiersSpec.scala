package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Mirror of the reference's validate_identifier tests
  * (/root/reference/test/unit/test_etl.py:8-53): legal names pass, SQL
  * injection shapes raise. ScalaCheck generators add the property layer
  * the reference lacks (driven directly — no scalatestplus bridge).
  */
class IdentifiersSpec extends AnyFunSuite {

  private val good = Seq("my_table", "my_schema.my_table", "MyTable", "_hidden",
    "tablé", "t2", "a$b")
  private val bad = Seq("", "2table", "table;", "table with space",
    "my_schema.my_table.category", "table;DROP TABLE users",
    "t'--", "t\"x", "Robert'); DROP TABLE Students;--", "a.b.c", ".", "a.")

  good.foreach { id =>
    test(s"accepts '$id'") { assert(Identifiers.validate(id) == id) }
  }
  bad.foreach { id =>
    test(s"rejects '${id.take(20)}'") {
      assertThrows[EtlBadIdentifierError](Identifiers.validate(id))
    }
  }

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: validated identifiers never contain SQL metacharacters") {
    samples(Gen.asciiPrintableStr, 500).foreach { s =>
      if (Identifiers.isValid(s))
        assert(!s.exists(c => ";'\"()- ".contains(c)), s"identifier: $s")
    }
  }

  test("property: alphanumeric underscore names always validate") {
    val gen = for {
      h <- Gen.alphaChar
      t <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
    } yield (h :: t).mkString
    samples(gen, 500).foreach { s => assert(Identifiers.isValid(s), s"identifier: $s") }
  }
}
