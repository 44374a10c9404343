package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** graft_media_header: REAL container parsing (WAV RIFF chunk walk, MP4
  * box walk to moov/mvhd) — hand-built headers with known duration/
  * channels/rate must parse exactly; malformed shapes yield NULL, never
  * an error.
  */
class MediaHeaderSpec extends SparkSuite {

  private def le16(v: Int) = Array(v & 0xff, (v >>> 8) & 0xff)
  private def le32(v: Int) =
    Array(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, (v >>> 24) & 0xff)
  private def be32(v: Int) =
    Array((v >>> 24) & 0xff, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
  private def asc(s: String) = s.map(_.toInt).toArray

  /** Canonical 44-byte WAV header + empty data of `dataSize` declared. */
  private def wav(channels: Int, rate: Int, bits: Int,
      dataSize: Int): Array[Byte] = {
    val byteRate = rate * channels * bits / 8
    (asc("RIFF") ++ le32(36 + dataSize) ++ asc("WAVE") ++
      asc("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(byteRate) ++ le16(channels * bits / 8) ++ le16(bits) ++
      asc("data") ++ le32(dataSize)).map(_.toByte)
  }

  /** Minimal MP4: ftyp box, then moov containing an mvhd v0. */
  private def mp4v0(timescale: Int, duration: Int): Array[Byte] = {
    val ftyp = be32(16) ++ asc("ftyp") ++ asc("isom") ++ be32(0)
    val mvhdPayload = Array(0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ Array.fill(80)(0)
    val mvhd = be32(8 + mvhdPayload.length) ++ asc("mvhd") ++ mvhdPayload
    val moov = be32(8 + mvhd.length) ++ asc("moov") ++ mvhd
    (ftyp ++ moov).map(_.toByte)
  }

  private def parseAll(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    payloads.toDF("id", "payload")
      .select(col("id"),
        GraftFunctions.graftMediaHeader(col("payload")).as("hdr"))
      .select(col("id"), col("hdr.format"), col("hdr.duration_ms"),
        col("hdr.channels"), col("hdr.sample_rate"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4)))
  }

  test("WAV fmt/data walk and MP4 moov/mvhd walk parse duration, " +
    "channels and sample rate exactly") {
    // 2ch 16-bit 44100 Hz, 1 second of data = 176400 bytes
    val got = parseAll(Seq(
      (1L, wav(2, 44100, 16, 176400)),
      (2L, wav(1, 16000, 16, 8000)),   // 0.25 s mono 16 kHz
      (3L, mp4v0(600, 1500)),          // 2.5 s at timescale 600
      (4L, mp4v0(90000, 90))))         // 1 ms at 90 kHz
    assert(got.toSeq == Seq(
      (1L, Some("wav"), 1000L, 2, 44100),
      (2L, Some("wav"), 250L, 1, 16000),
      (3L, Some("mp4"), 2500L, -1, -1),
      (4L, Some("mp4"), 1L, -1, -1)),
      s"unexpected parses: ${got.toSeq}")
  }

  test("an extra RIFF chunk before fmt is skipped word-aligned; " +
    "corrupt/truncated/foreign payloads parse to NULL") {
    // a 3-byte LIST chunk (odd size -> padded to 4) before fmt
    val oddChunk = asc("LIST").map(_.toByte) ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val shifted = wav(2, 44100, 16, 176400)
    val withSkip = (shifted.take(12) ++ oddChunk ++ shifted.drop(12))
    val got = parseAll(Seq(
      (1L, withSkip),
      (2L, "not media at all".getBytes),
      (3L, wav(2, 44100, 16, 176400).take(30)),  // truncated mid-fmt
      (4L, mp4v0(600, 1500).take(20)),           // truncated after ftyp
      (5L, mp4v0(0, 1500)),                      // zero timescale
      (6L, Array.emptyByteArray)))
    assert(got(0) == ((1L, Some("wav"), 1000L, 2, 44100)),
      s"chunk skip failed: ${got(0)}")
    assert(got.drop(1).forall(_._2.isEmpty),
      s"malformed payloads must parse NULL: ${got.drop(1).toSeq}")
  }

  test("the SQL registration works and NULL input stays NULL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, wav(1, 8000, 8, 8000))).toDF("id", "payload")
      .createOrReplaceTempView("media_payloads")
    val r = spark.sql(
      """SELECT graft_media_header(payload).duration_ms AS d,
                graft_media_header(CAST(NULL AS BINARY)) AS n
         FROM media_payloads""").head()
    assert(r.getLong(0) == 1000L && r.isNullAt(1))
  }
}
