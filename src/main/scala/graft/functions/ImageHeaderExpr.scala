package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header metadata for an image payload — REAL byte-format
  * parsing, not the decode stub: PNG (IHDR), JPEG (SOF segment walk) and
  * GIF (logical screen descriptor) carry their pixel dimensions in the
  * first bytes of the file, so width/height/format extraction needs no
  * codec — exactly the metadata a curation pipeline filters on (drop
  * icons, cap megapixels, partition by aspect ratio) before ever paying
  * for a decode. Returns a `struct<format string, width int, height int>`
  * or NULL for unrecognized/truncated/corrupt payloads (a crawl's
  * mislabeled bytes must select away, not kill the task).
  *
  * Native expression, not a UDF: the generated code makes one static call
  * per row inside whole-stage codegen — no closure serialization, no row
  * boxing — and at 100 TB this runs in the scan stage on the `binary`
  * column, so a parquet reader that prunes to the header page never
  * materializes the full payload downstream.
  */
case class ImageHeaderExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ImageHeaders.schema
  override def nullable: Boolean = true

  override def nullSafeEval(b: Any): Any =
    ImageHeaders.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.ImageHeaders.parse(${childGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ImageHeaderExpr =
    copy(child = newChild)
}

/** The scalar kernel behind [[ImageHeaderExpr]] — a top-level object so
  * Scala emits static forwarders callable from janino-generated code (the
  * TextNormalizer packaging).
  */
object ImageHeaders {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse the payload's container header; null if no supported format
    * matches. Every read is bounds-checked — truncation yields null.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    def u8(i: Int): Int = b(i) & 0xff
    def u16be(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32be(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def row(fmt: String, w: Long, h: Long): InternalRow =
      // dimensions above Int range (PNG allows u32) are corrupt in practice
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
      else new GenericInternalRow(
        Array[Any](UTF8String.fromString(fmt), w.toInt, h.toInt))

    // PNG: 8-byte signature, then the IHDR chunk (len + "IHDR" + w + h)
    if (b.length >= 24 && b.startsWith(PngSig)) {
      if (u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
        return row("png", u32be(16), u32be(20))
      return null
    }
    // GIF: "GIF87a"/"GIF89a" then little-endian logical screen w, h
    if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      return row("gif", u16le(6), u16le(8))
    // JPEG: SOI then a marker-segment walk to the first frame header
    // (SOFn, n in 0..15 minus DHT/JPG/DAC); dims sit after the precision
    // byte. Standalone markers (RSTn/TEM) carry no length field.
    if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xff) return null // desynced stream
        val marker = u8(i + 1)
        if (marker == 0xff) { i += 1 } // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else if (marker == 0xd9) return null // EOI before any frame header
        else {
          if (i + 3 >= b.length) return null
          val len = u16be(i + 2)
          if (len < 2) return null
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 8 >= b.length) return null
            return row("jpeg", u16be(i + 7).toLong, u16be(i + 5).toLong)
          }
          i += 2 + len
        }
      }
      return null
    }
    null
  }
}
