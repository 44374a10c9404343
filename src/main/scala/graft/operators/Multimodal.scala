package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed partition-by-partition.
  *
  * The decode step is STUBBED deterministically (this container has no
  * image/audio codecs — per spec) — everything around it is the real
  * production shape: binary columns stay columnar in parquet, the decode
  * runs inside mapPartitions so one task amortizes codec init across its
  * whole partition (the Scala analogue of mapInPandas batching), feature
  * vectors come back as fixed-width arrays ready for the similarity
  * operators, and nothing ever collects to the driver.
  */
object Multimodal {

  /** Typed decoded record: what a real image decode would yield. */
  final case class DecodedMeta(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, channels: Int, features: Array[Float])

  /** Attach a binary payload column (stand-in for stored image bytes). */
  def withPayload(df: DataFrame, textCol: String = "text",
      payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(textCol), "UTF-8"))

  /** Ingest a directory of binary assets (images/audio/video files) via
    * Spark's `binaryFile` source: one row per file, content as the
    * `payload` column feeding decodeAndFeaturize unchanged, plus the
    * file-level metadata a curation pipeline filters on. The id is the
    * xxhash64 of the file path — stable across re-reads and executors.
    *
    * Scale notes: `pathGlobFilter` prunes at LISTING time (non-matching
    * files are never opened); each file must fit in one row (the source's
    * contract — large video goes through chunked range reads instead);
    * listing parallelizes across the cluster for object-store prefixes.
    */
  def fromBinaryFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("path"),
        col("length").as("n_bytes"),
        col("modificationTime").as("modified_at"),
        col("content").as("payload"))

  /** STUB codec: a real implementation would call the image library here
    * (one codec instance per partition). Deterministic fake: dimensions
    * derived from payload length, features = normalized byte histogram.
    */
  private def decodeStub(id: Long, payload: Array[Byte]): DecodedMeta = {
    val n = payload.length
    val hist = new Array[Float](16)
    var i = 0
    while (i < n) { hist((payload(i) & 0xff) % 16) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n; j += 1 } }
    DecodedMeta(id, n, width = 64 + n % 640, height = 64 + (n * 7) % 480,
      channels = 3, features = hist)
  }

  /** Decode + feature-extract over partitions: the batch shape, schema, and
    * partition-local codec lifecycle are real; only decodeStub is fake.
    * Rows with a null id or null payload are dropped up front — a missing
    * blob is an absent asset, not a task-killing NullPointerException.
    */
  def decodeAndFeaturize(df: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "payload"): Dataset[DecodedMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .na.drop()
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (amortized across rows)
        it.map { case (id, payload) => decodeStub(id, payload) }
      }
  }

  /** REAL container-header metadata for an image payload column — the
    * non-stubbed half of the decode story: PNG/JPEG/GIF carry their pixel
    * dimensions in the container header, so format/width/height parse
    * from the first bytes with no codec (see
    * [[graft.functions.ImageHeaderExpr]]). Unrecognized or corrupt
    * payloads yield a NULL struct, never an error — crawl data lies about
    * its content type routinely. This is the filter a curation pipeline
    * runs BEFORE the expensive decode: drop icons, cap megapixels,
    * partition by aspect ratio, all from header bytes.
    */
  def imageHeader(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("image_header",
      graft.functions.GraftFunctions.graftImageHeader(col(payloadCol)))

  /** Audio/video twin of [[imageHeader]]: WAV/MP4 container metadata
    * (duration, channels, sample rate) from header bytes — the
    * pre-decode filter for time-based media (drop sub-second clips, cap
    * hours, partition by sample rate). See
    * [[graft.functions.MediaHeaderExpr]].
    */
  def mediaHeader(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("media_header",
      graft.functions.GraftFunctions.graftMediaHeader(col(payloadCol)))

  /** Frame-sample offsets for a byte stream chunked at `frameSize`: every
    * `stride`-th frame start — the video-frame-sampling access pattern as
    * pure column arithmetic (no decode needed to plan the read). Empty
    * payloads get an empty offset list and null payloads stay null — never
    * a phantom offset 0 into a stream with no bytes.
    */
  def frameSampleOffsets(df: DataFrame, payloadCol: String = "payload",
      frameSize: Int = 1024, stride: Int = 10): DataFrame =
    df.withColumn("frame_offsets",
      when(col(payloadCol).isNull, lit(null).cast("array<bigint>"))
        .when(octet_length(col(payloadCol)) === 0, array().cast("array<bigint>"))
        .otherwise(sequence(lit(0L),
          (octet_length(col(payloadCol)) - 1).cast("long"),
          lit(frameSize.toLong * stride))))
}
