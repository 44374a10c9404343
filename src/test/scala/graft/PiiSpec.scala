package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** PII detection/redaction behavior on adversarial fixtures (the oracled
  * q160/q161 pin cross-engine parity on the derived corpus; this spec
  * proves the detectors themselves — Luhn arithmetic, regex boundaries,
  * multi-match redaction).
  */
class PiiSpec extends SparkSuite {

  import spark.implicits._

  private val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val cardRe = "[0-9]{16}"

  test("Luhn check: canonical valid/invalid cards, non-digit and empty " +
    "inputs are false, NULL propagates — codegen and SQL paths agree") {
    val rows = Seq(
      ("4111111111111111", Some(true)),   // classic Visa test number
      ("4111111111111112", Some(false)),  // last digit off by one
      ("79927398713", Some(true)),        // the worked example from the algorithm
      ("79927398710", Some(false)),
      ("4111 11111111 1111", Some(false)), // separators are the extractor's job
      ("", Some(false)),
      (null, None))
    val df = rows.map(_._1).toDF("s")
      .select(col("s"), GraftFunctions.graftLuhnCheck(col("s")).as("ok"))
    val got = df.collect().map(r => if (r.isNullAt(1)) None else Some(r.getBoolean(1)))
    assert(got.toSeq == rows.map(_._2))

    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_luhn_check('4111111111111111')")
      .head().getBoolean(0))
    assert(!spark.sql("SELECT graft_luhn_check('4111111111111112')")
      .head().getBoolean(0))
  }

  test("extraction + Luhn gate separates card-shaped from card-valid, " +
    "and digit runs inside longer runs / phone digits never false-match") {
    val text = "call 555-867-5309 or mail a.b-c_d@ex-ample.org; " +
      "card 4111111111111111 backup 4111111111111112 ref 12345678901234567"
    val df = Seq(text).toDF("t").select(
      regexp_extract_all(col("t"), lit(phoneRe), lit(0)).as("phones"),
      regexp_extract_all(col("t"), lit(emailRe), lit(0)).as("emails"),
      regexp_extract_all(col("t"), lit(cardRe), lit(0)).as("cards"))
    val r = df.head()
    assert(r.getSeq[String](0) == Seq("555-867-5309"))
    assert(r.getSeq[String](1) == Seq("a.b-c_d@ex-ample.org"))
    // the 17-digit ref yields a 16-digit prefix match (card-SHAPED)…
    assert(r.getSeq[String](2) ==
      Seq("4111111111111111", "4111111111111112", "1234567890123456"))
    // …but only the genuine card passes the Luhn gate
    val valid = df.select(
      filter(col("cards"), x => GraftFunctions.graftLuhnCheck(x)).as("v"))
      .head().getSeq[String](0)
    assert(valid == Seq("4111111111111111"))
  }

  test("redaction replaces EVERY match of every class and leaves the " +
    "surrounding text intact") {
    val texts = Seq(
      "a@b.io then c@d.io end",
      "ph 123-456-7890 and 999-888-7777; card 4111111111111111 tail",
      "clean text stays byte-identical 12345")
    val got = texts.toDF("t").select(
      regexp_replace(regexp_replace(regexp_replace(col("t"),
        emailRe, "[EMAIL]"), cardRe, "[CARD]"), phoneRe, "[PHONE]").as("r"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "[EMAIL] then [EMAIL] end",
      "ph [PHONE] and [PHONE]; card [CARD] tail",
      "clean text stays byte-identical 12345"))
  }
}
