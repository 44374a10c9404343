package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal binary plumbing: payload attach, partition-wise decode stub,
  * feature shape, frame-sample offsets.
  */
class MultimodalSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("decodeAndFeaturize yields typed metadata + fixed-width features") {
    val docs = Tables(spark, dir, "documents")
    val decoded = Multimodal.decodeAndFeaturize(Multimodal.withPayload(docs))
    val rows = decoded.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(r => math.abs(r.features.sum - 1.0f) < 1e-3))
    assert(rows.forall(r => r.width >= 64 && r.channels == 3))
    // deterministic: same input -> same features
    val again = Multimodal.decodeAndFeaturize(Multimodal.withPayload(docs))
      .collect().map(r => r.doc_id -> r.features.toSeq).toMap
    assert(rows.forall(r => again(r.doc_id) == r.features.toSeq))
  }

  test("binaryFile source ingests a directory of assets into the payload " +
    "pipeline (glob-pruned at listing, stable hashed ids)") {
    val assetDir = tmpDir("bin-assets")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$assetDir/$name"), bytes)
    put("a.img", Array.tabulate(300)(_.toByte))
    put("b.img", "tiny".getBytes("UTF-8"))
    put("skip.txt", "not an image".getBytes("UTF-8"))

    val files = Multimodal.fromBinaryFiles(spark, assetDir, glob = "*.img")
    val rows = files.collect()
    // the glob pruned skip.txt at listing time
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Array[Byte]]("payload").nonEmpty))
    val byPath = rows.map(r => r.getAs[String]("path") -> r).toMap
    assert(byPath.keys.count(_.endsWith(".img")) == 2)
    // length metadata matches the payload actually carried
    assert(rows.forall(r =>
      r.getAs[Long]("n_bytes") == r.getAs[Array[Byte]]("payload").length.toLong))

    // ids are stable across re-reads (hash of path, not read order)
    val again = Multimodal.fromBinaryFiles(spark, assetDir, glob = "*.img")
      .collect().map(r => r.getAs[String]("path") -> r.getAs[Long]("doc_id")).toMap
    assert(rows.forall(r => again(r.getAs[String]("path")) == r.getAs[Long]("doc_id")))

    // the existing decode pipeline consumes the source unchanged
    val decoded = Multimodal.decodeAndFeaturize(files).collect()
    assert(decoded.length == 2)
    assert(decoded.forall(_.features.length == 16))
    val a = decoded.find(_.n_bytes == 300).get
    assert(a.width == 64 + 300 % 640)
  }

  test("frameSampleOffsets plans strided frame reads as column arithmetic") {
    val docs = Multimodal.withPayload(Tables(spark, dir, "documents"))
    val out = Multimodal.frameSampleOffsets(docs, frameSize = 16, stride = 2)
    val r = out.select(col("doc_id"), col("frame_offsets"),
      octet_length(col("payload")).as("len")).head()
    val offsets = r.getAs[scala.collection.Seq[Long]]("frame_offsets").toSeq
    assert(offsets.head == 0L)
    assert(offsets.forall(o => o < r.getAs[Int]("len")))
    assert(offsets == offsets.sorted)
  }

  test("frameSampleOffsets: empty payload -> no offsets, null payload -> " +
    "null (no phantom frame 0); decode drops null-payload rows") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array[Byte](1, 2, 3))),
      (2L, Some(Array.empty[Byte])),
      (3L, None)
    ).toDF("doc_id", "payload")
    val out = Multimodal.frameSampleOffsets(df, frameSize = 1, stride = 1)
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[Long](2).nonEmpty)
    assert(out(1).getSeq[Long](2).isEmpty, "empty payload must yield []")
    assert(out(2).isNullAt(2), "null payload must stay null")
    val decoded = Multimodal.decodeAndFeaturize(df).collect()
    assert(decoded.map(_.doc_id).sorted.toSeq == Seq(1L, 2L),
      "null-payload row must be dropped, empty payload decoded")
  }

  test("features feed the similarity operators (cosine over decoded docs)") {
    import graft.functions.VectorFunctions
    val docs = Tables(spark, dir, "documents").limit(50)
    val feats = Multimodal.decodeAndFeaturize(Multimodal.withPayload(docs))
      .toDF().select(col("doc_id"), col("features").cast("array<double>").as("v"))
    val a = feats.as("a"); val b = feats.as("b")
    val sims = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(VectorFunctions.cosine(col("a.v"), col("b.v")).as("sim"))
    val stats = sims.agg(min("sim"), max("sim")).head()
    assert(stats.getDouble(0) >= -1.0000001 && stats.getDouble(1) <= 1.0000001)
  }
}
