package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** graft_image_header: REAL container parsing (PNG IHDR, JPEG SOF walk,
  * GIF screen descriptor) — hand-built headers with known dimensions must
  * parse exactly; every malformed shape must yield NULL, never an error
  * (crawl payloads lie about their content type routinely).
  */
class ImageHeaderSpec extends SparkSuite {

  private def png(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array(0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff,
      8, 6, 0, 0, 0)
    (sig ++ ihdr).map(_.toByte)
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8)
    // an APP0 segment the walk must skip (len 8: 2 len bytes + 6 payload)
    val app0 = Array(0xff, 0xe0, 0x00, 0x08, 'J'.toInt, 'F'.toInt,
      'I'.toInt, 'F'.toInt, 0, 0)
    val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 8,
      h >>> 8, h & 0xff, w >>> 8, w & 0xff, 3)
    (soi ++ app0 ++ sof0).map(_.toByte)
  }

  private def gif(w: Int, h: Int): Array[Byte] =
    (Array('G'.toInt, 'I'.toInt, 'F'.toInt, '8'.toInt, '9'.toInt, 'a'.toInt,
      w & 0xff, w >>> 8, h & 0xff, h >>> 8, 0, 0, 0)).map(_.toByte)

  private def parseAll(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    payloads.toDF("id", "payload")
      .select(col("id"), GraftFunctions.graftImageHeader(col("payload")).as("hdr"))
      .select(col("id"), col("hdr.format"), col("hdr.width"), col("hdr.height"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))
  }

  test("PNG, JPEG (with skipped APP segments), and GIF headers parse to " +
    "their exact pixel dimensions") {
    val got = parseAll(Seq(
      (1L, png(640, 480)),
      (2L, jpeg(1024, 768)),
      (3L, gif(320, 200))))
    assert(got.toSeq == Seq(
      (1L, Some("png"), 640, 480),
      (2L, Some("jpeg"), 1024, 768),
      (3L, Some("gif"), 320, 200)))
  }

  test("malformed payloads are NULL, never errors: truncation, missing " +
    "SOF, desync, zero dims, wrong magic, empty") {
    val got = parseAll(Seq(
      (1L, png(640, 480).take(20)),            // truncated before height
      (2L, Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)), // SOI then EOI
      (3L, Array(0xff, 0xd8, 0x00, 0x00).map(_.toByte)), // desynced stream
      (4L, png(0, 480)),                        // zero width
      (5L, "plain text pretending".getBytes("UTF-8")),
      (6L, Array.empty[Byte])))
    assert(got.forall(_._2.isEmpty),
      s"all malformed payloads must parse to NULL, got ${got.toSeq}")
  }

  test("a SQL user gets the same parser via the registered function, and " +
    "nulls propagate") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, png(99, 7)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload").createOrReplaceTempView("img_hdr_t")
    val got = spark.sql(
      "SELECT id, graft_image_header(payload) AS hdr FROM img_hdr_t ORDER BY id")
      .selectExpr("id", "hdr.format", "hdr.width", "hdr.height")
      .collect()
    assert(got(0).getString(1) == "png" && got(0).getInt(2) == 99 &&
      got(0).getInt(3) == 7)
    assert(got(1).isNullAt(1))
  }

  test("the parser composes with the binaryFile ingest + stub pipeline: " +
    "header metadata rides beside the decode features") {
    import spark.implicits._
    val df = Seq((10L, png(32, 32)), (11L, jpeg(64, 48)))
      .toDF("doc_id", "payload")
    val out = graft.operators.Multimodal.imageHeader(df)
      .select(col("doc_id"), col("image_header.format").as("fmt"),
        col("image_header.width").as("w"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((10L, "png", 32), (11L, "jpeg", 64)))
  }
}
