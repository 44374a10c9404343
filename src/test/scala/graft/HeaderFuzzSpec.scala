package graft

import graft.functions.{ImageHeaders, MediaHeaders}

/** Fuzz armor for the byte-walk kernels: NO input may throw — random
  * bytes, truncations of VALID headers at every length, and
  * adversarial prefixes (magic bytes followed by garbage) must parse
  * to null or a well-formed row, never raise. A crawl's binary column
  * is exactly this distribution, and one uncaught IndexOutOfBounds in
  * a scan-stage expression kills the stage.
  */
class HeaderFuzzSpec extends SparkSuite {

  private def checkNeverThrows(payload: Array[Byte], what: String): Unit = {
    try { ImageHeaders.parse(payload); () }
    catch { case e: Throwable =>
      fail(s"ImageHeaders.parse threw on $what: $e")
    }
    try { MediaHeaders.parse(payload); () }
    catch { case e: Throwable =>
      fail(s"MediaHeaders.parse threw on $what: $e")
    }
  }

  test("10k seeded-random payloads never throw in either kernel") {
    val rnd = new scala.util.Random(42)
    (1 to 10000).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      checkNeverThrows(b, s"random payload #$i (len ${b.length})")
    }
  }

  test("every truncation of a valid header parses to null or a full " +
    "row — never an exception") {
    // real-ish valid headers, then chop at every length
    val png = (Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      0, 0, 1, 0, 0, 0, 1, 0, 8, 6, 0, 0, 0)).map(_.toByte)
    val wav = ("RIFF".getBytes ++ Array[Byte](36, 0, 0, 0) ++
      "WAVE".getBytes ++ "fmt ".getBytes ++
      Array[Byte](16, 0, 0, 0, 1, 0, 2, 0) ++
      Array[Byte](0x44, 0xac.toByte, 0, 0) ++
      Array[Byte](0x10, 0xb1.toByte, 2, 0, 4, 0, 16, 0) ++
      "data".getBytes ++ Array[Byte](0, 0, 1, 0))
    Seq(png, wav).foreach { full =>
      (0 to full.length).foreach { n =>
        checkNeverThrows(full.take(n), s"truncation at $n")
      }
    }
  }

  test("magic bytes followed by adversarial garbage never throw: " +
    "JPEG marker walks, RIFF size lies, MP4 box-size lies") {
    val rnd = new scala.util.Random(7)
    val prefixes = Seq(
      Array(0xff, 0xd8).map(_.toByte),                     // JPEG SOI
      "RIFF1234WAVE".getBytes,                             // RIFF
      (Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes),       // MP4 ftyp
      "GIF89a".getBytes)
    prefixes.foreach { p =>
      (1 to 2000).foreach { i =>
        val tail = new Array[Byte](rnd.nextInt(80))
        rnd.nextBytes(tail)
        checkNeverThrows(p ++ tail, s"prefix+garbage #$i")
      }
      // size fields of all-0xFF (maximal lies)
      checkNeverThrows(p ++ Array.fill(40)(0xff.toByte), "maximal sizes")
    }
  }
}
