package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header metadata for an audio/video payload — the
  * [[ImageHeaderExpr]] discipline applied to the time-based media a
  * multimodal corpus carries: WAV (RIFF chunk walk: fmt + data) and MP4
  * (ISO-BMFF box walk: moov/mvhd) keep duration/channels/sample-rate in
  * their first kilobytes, so the pre-decode curation filters (drop
  * sub-second clips, cap hours, partition by sample rate) run without a
  * codec. Returns `struct<format string, duration_ms bigint,
  * channels int, sample_rate int>` — channels/sample_rate are NULL for
  * video — or NULL for unrecognized/truncated/corrupt payloads (crawl
  * bytes must select away, not kill tasks; every read is
  * bounds-checked and both walks detect desync).
  *
  * Native expression: one static call per row inside whole-stage
  * codegen, no UDF closure, runs in the scan stage on the binary
  * column.
  */
case class MediaHeaderExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = MediaHeaders.schema
  override def nullable: Boolean = true

  override def nullSafeEval(b: Any): Any =
    MediaHeaders.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.MediaHeaders.parse(${childGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderExpr =
    copy(child = newChild)
}

/** The scalar kernel behind [[MediaHeaderExpr]] — top-level object for
  * janino-callable static forwarders (the ImageHeaders packaging).
  */
object MediaHeaders {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true)))

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    def u8(i: Int): Int = b(i) & 0xff
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def u32be(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u64be(i: Int): Long = (u32be(i) << 32) | u32be(i + 4)
    def tag(i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(k => u8(i + k) == s.charAt(k))
    def row(fmt: String, durMs: Long, ch: Integer, sr: Integer): InternalRow =
      if (durMs < 0) null
      else new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
        durMs, ch, sr))

    // WAV: "RIFF" .... "WAVE", then a padded chunk walk; fmt_ carries
    // channels/sample_rate/byte_rate, data's size gives the duration
    if (b.length >= 44 && tag(0, "RIFF") && tag(8, "WAVE")) {
      var i = 12
      var channels = -1; var sampleRate = -1L; var byteRate = -1L
      var dataSize = -1L
      while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
        val size = u32le(i + 4)
        if (size < 0 || size > Int.MaxValue) return null
        if (tag(i, "fmt ")) {
          if (i + 24 > b.length || size < 16) return null
          channels = u16le(i + 10)
          sampleRate = u32le(i + 12)
          byteRate = u32le(i + 16)
        } else if (tag(i, "data")) {
          dataSize = size
        }
        i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || dataSize < 0)
        return null
      return row("wav", dataSize * 1000L / byteRate,
        Int.box(channels), Int.box(sampleRate.toInt))
    }

    // MP4/ISO-BMFF: top-level box walk to moov, child walk to mvhd;
    // timescale+duration live at a version-dependent offset
    if (b.length >= 16 && tag(4, "ftyp")) {
      def walk(from: Int, to: Int, name: String): Int = {
        var i = from
        while (i + 8 <= to) {
          var size = u32be(i)
          var hdr = 8
          if (size == 1) {
            if (i + 16 > to) return -1
            size = u64be(i + 8); hdr = 16
          } else if (size == 0) size = (to - i).toLong // box runs to end
          if (size < hdr || i + size > to) return -1
          if (tag(i + 4, name)) return i + hdr
          i += size.toInt
        }
        -1
      }
      val moov = walk(0, b.length, "moov")
      if (moov < 0) return null
      // mvhd is a child of moov; moov's own extent ends at its size
      val moovSize = u32be(moov - 8)
      val moovEnd =
        if (moovSize == 0) b.length
        else math.min(b.length.toLong, (moov - 8) + moovSize).toInt
      val mvhd = walk(moov, moovEnd, "mvhd")
      if (mvhd < 0 || mvhd + 4 > b.length) return null
      val version = u8(mvhd)
      if (version == 0) {
        if (mvhd + 20 > b.length) return null
        val timescale = u32be(mvhd + 12)
        val duration = u32be(mvhd + 16)
        if (timescale <= 0) return null
        return row("mp4", duration * 1000L / timescale, null, null)
      } else if (version == 1) {
        if (mvhd + 32 > b.length) return null
        val timescale = u32be(mvhd + 20)
        val duration = u64be(mvhd + 24)
        if (timescale <= 0 || duration < 0) return null
        return row("mp4", duration * 1000L / timescale, null, null)
      }
      return null
    }
    null
  }
}
