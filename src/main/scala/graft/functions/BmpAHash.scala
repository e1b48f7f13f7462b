package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** REAL perceptual average-hash (aHash) over a 24-bpp BMP blob — the
  * standard image near-dup fingerprint, computed library-free from the
  * uncompressed pixel array: sample an 8×8 grid of pixels (integer
  * grid mapping, BMP bottom-up row order honored), grayscale each as
  * the exact R+G+B sum, threshold against the integer mean, and pack
  * the 64 bits into [hi, lo] 32-bit halves (two BIGINTs, so the DuckDB
  * oracle's `1::BIGINT << i` never overflows — the d4 SimHash
  * precedent for engine-portable bit arithmetic).
  *
  * Every step is integer arithmetic on bytes — no floats, no codecs —
  * so the hash is bit-exact across engines and the oracle re-derives
  * it from the same blob with `substring`/`hex` byte reads.
  *
  * Why a custom expression (SURVEY §7.3 (b)): the declarative form is
  * 64 pixels × 3 byte-reads of `conv(hex(substr))` folded into ONE
  * sum expression — a single unsplittable codegen tree in the 64 KB
  * janino danger zone (the [[CodebookArgMax]] lesson). This loop is
  * O(1) generated code at any grid size.
  *
  * NULL for: NULL/short blobs, missing 'BM' magic, a sample format
  * outside the contract (24-bpp, or 32-bpp BI_RGB — round-13: the
  * ubiquitous BGRX screenshot layout, gray = the same first three
  * bytes with the pad byte skipped; a 32-bpp BI_BITFIELDS mask could
  * reorder channels and stays fail-closed), non-positive width /
  * zero height, or a pixel array that overruns the blob (truncated
  * file) — a diagnosable null beats garbage bits. Negative stored
  * height (top-down row order) is honored.
  */
case class BmpAHashExpr(child: Expression) extends UnaryExpression {

  private val Grid = 8

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_ahash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bmp_ahash needs binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val out = BmpAHash.compute(b, Grid)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      val out = ctx.freshName("ahash")
      s"""
         |long[] $out = graft.functions.BmpAHash.compute($bin, $Grid);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BmpAHashExpr =
    copy(child = newChild)
}

/** [[BmpAHashExpr]]'s convention over a RAW 8-bit gray frame inside a
  * larger blob — `frame_ahash(content, off, w, h)` (round-12, mm19):
  * the demuxed video frames carry no container of their own (w×h
  * bytes, row-major, top-down), so the locator is explicit. Same
  * integer grid mapping (`r·h/8`, `c·w/8` point samples), same
  * integer mean threshold, same [hi, lo] 32-bit packing — a frame
  * and a BMP of the same content hash comparably. NULL for
  * non-positive dims or a frame overrunning the blob. */
case class FrameAHashExpr(content: Expression, off: Expression,
    w: Expression, h: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = content
  override def second: Expression = off
  override def third: Expression = w
  override def fourth: Expression = h

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "frame_ahash"

  override def checkInputDataTypes(): TypeCheckResult =
    (content.dataType, off.dataType, w.dataType, h.dataType) match {
      case (BinaryType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, o, ww, hh) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary, int, int, int), got " +
          s"(${c.simpleString}, ${o.simpleString}, ${ww.simpleString}, " +
          s"${hh.simpleString})")
    }

  override def nullSafeEval(c: Any, o: Any, ww: Any, hh: Any): Any = {
    val out = BmpAHash.computeFrame(c.asInstanceOf[Array[Byte]],
      o.asInstanceOf[Int], ww.asInstanceOf[Int], hh.asInstanceOf[Int])
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, o, ww, hh) => {
      val out = ctx.freshName("fahash")
      s"""
         |long[] $out = graft.functions.BmpAHash.computeFrame($c, $o, $ww, $hh);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): FrameAHashExpr =
    copy(content = newFirst, off = newSecond, w = newThird, h = newFourth)
}

object BmpAHash {

  /** [[FrameAHashExpr]]'s shared kernel: [hi, lo] or null. */
  def computeFrame(b: Array[Byte], off: Int, w: Int, h: Int): Array[Long] = {
    if (b == null || w <= 0 || h <= 0 || off < 0 ||
        off.toLong + w.toLong * h > b.length) return null
    val grid = 8
    val n = grid * grid
    val gray = new Array[Long](n)
    var sum = 0L
    var i = 0
    while (i < n) {
      val r = i / grid
      val c = i % grid
      val p = off.toLong + (r.toLong * h / grid) * w + (c.toLong * w / grid)
      gray(i) = b(p.toInt) & 0xffL
      sum += gray(i)
      i += 1
    }
    val mean = sum / n
    var hi = 0L
    var lo = 0L
    i = 0
    while (i < n) {
      if (gray(i) > mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    Array(hi, lo)
  }

  /** `frame_ahash` as a Column. */
  def frameAHash(content: Column, off: Column, w: Column,
      h: Column): Column =
    Bridge.column(FrameAHashExpr(Bridge.expression(content),
      Bridge.expression(off.cast("int")), Bridge.expression(w.cast("int")),
      Bridge.expression(h.cast("int"))))

  /** The shared interpreted/codegen kernel (the generated code calls
    * straight into it — the hash is one tight JVM loop either way, so
    * there is no eval/codegen divergence to test for). Returns
    * [hi, lo] or null per the expression's NULL contract. */
  /** Shared BMP pixel-array locator: [w, h, topDown(0/1), stride,
    * off, bytesPerPixel], or null for anything the grid walk must
    * not touch. 24-bpp as ever; 32-bpp admits when biCompression is
    * 0 = BI_RGB (round-13 — the image twin of the audio
    * sample-format widening: 32-bpp BGRX is ubiquitous in
    * screenshots/render dumps, and its gray is the same first three
    * bytes with the pad byte skipped; a BI_BITFIELDS mask could
    * REORDER channels, so it stays fail-closed). The 24-bpp path
    * keeps its round-10 contract byte for byte — compression is
    * deliberately unchecked there, exactly as both engines always
    * have. */
  private[functions] def header(b: Array[Byte]): Array[Long] = {
    def u8(p: Long): Long = b(p.toInt) & 0xffL
    def le32(p: Int): Long =
      u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16) | (u8(p + 3) << 24)
    def signed(v: Long): Long = if (v > Int.MaxValue) v - 4294967296L else v
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val w = signed(le32(18))
    val hRaw = signed(le32(22))
    val bpp = u8(28) | (u8(29) << 8)
    val comp = le32(30)
    val off = le32(10)
    if (w <= 0 || hRaw == 0) return null
    if (bpp != 24 && !(bpp == 32 && comp == 0)) return null
    val bpx = (bpp / 8).toInt
    val h = math.abs(hRaw)
    val stride = (w * bpx + 3) / 4 * 4
    if (off + h * stride > b.length) return null
    Array(w, h, if (hRaw < 0) 1L else 0L, stride, off, bpx.toLong)
  }

  def compute(b: Array[Byte], grid: Int): Array[Long] = {
    require(grid * grid == 64, s"bit packing assumes an 8x8 grid, got $grid")
    def u8(p: Long): Long = b(p.toInt) & 0xffL
    val hd = header(b)
    if (hd == null) return null
    val Array(w, h, td, stride, off, bpx) = hd
    val topDown = td == 1L
    val n = grid * grid
    val gray = new Array[Long](n)
    var sum = 0L
    var i = 0
    while (i < n) {
      val r = i / grid
      val c = i % grid
      val rImg = r * h / grid
      val cImg = c * w / grid
      val row = if (topDown) rImg else h - 1 - rImg
      val p = off + row * stride + cImg * bpx
      gray(i) = u8(p) + u8(p + 1) + u8(p + 2)
      sum += gray(i)
      i += 1
    }
    val mean = sum / n
    var hi = 0L
    var lo = 0L
    i = 0
    while (i < n) {
      if (gray(i) > mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    Array(hi, lo)
  }

  /** Column API: [hi, lo] 32-bit halves of the 8×8 aHash. */
  def aHash(bin: Column): Column =
    Bridge.column(BmpAHashExpr(Bridge.expression(bin)))

  /** Difference-hash kernel (dHash): sample an 8-row × 9-column
    * integer grid, bit (r, c) = gray(r, c) > gray(r, c + 1) — the
    * GRADIENT fingerprint. Same byte-exact arithmetic and NULL
    * contract as [[compute]]; robust to the global brightness/
    * contrast shifts that move aHash's mean threshold, which is why
    * real pipelines carry both. Returns [hi, lo] or null. */
  def computeDHash(b: Array[Byte]): Array[Long] = {
    def u8(p: Long): Long = b(p.toInt) & 0xffL
    val hd = header(b)
    if (hd == null) return null
    val Array(w, h, td, stride, off, bpx) = hd
    val topDown = td == 1L
    val rows = 8
    val cols = 9
    val gray = new Array[Long](rows * cols)
    var i = 0
    while (i < rows * cols) {
      val r = i / cols
      val c = i % cols
      val rImg = r * h / rows
      val cImg = c * w / cols
      val row = if (topDown) rImg else h - 1 - rImg
      val p = off + row * stride + cImg * bpx
      gray(i) = u8(p) + u8(p + 1) + u8(p + 2)
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        if (gray(r * cols + c) > gray(r * cols + c + 1)) {
          val bit = r * 8 + c
          if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
        }
        c += 1
      }
      r += 1
    }
    Array(hi, lo)
  }

  /** Column API: [hi, lo] 32-bit halves of the 8×9-grid dHash. */
  def dHash(bin: Column): Column =
    Bridge.column(BmpDHashExpr(Bridge.expression(bin)))

  /** Gray-statistics kernel for the mm9 image quality gate: over the
    * SAME 8×8 sample grid as [[compute]] (identical grid mapping, so
    * the oracle reuses the aHash CTE chain's sampled grays verbatim),
    * returns [sum, sumSq, min, max] of the exact R+G+B grays
    * (0..765). Pure integer arithmetic — sum ≤ 765·64, sumSq ≤
    * 765²·64 ≈ 3.7e7, nowhere near overflow — and the same NULL
    * contract as the hashes. */
  def computeGrayStats(b: Array[Byte]): Array[Long] = {
    def u8(p: Long): Long = b(p.toInt) & 0xffL
    val hd = header(b)
    if (hd == null) return null
    val Array(w, h, td, stride, off, bpx) = hd
    val topDown = td == 1L
    val grid = 8
    var sum = 0L
    var sumSq = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var i = 0
    while (i < grid * grid) {
      val r = i / grid
      val c = i % grid
      val rImg = r * h / grid
      val cImg = c * w / grid
      val row = if (topDown) rImg else h - 1 - rImg
      val p = off + row * stride + cImg * bpx
      val g = u8(p) + u8(p + 1) + u8(p + 2)
      sum += g
      sumSq += g * g
      if (g < mn) mn = g
      if (g > mx) mx = g
      i += 1
    }
    Array(sum, sumSq, mn, mx)
  }

  /** Column API: [sum, sumSq, min, max] grid-sampled grays. */
  def grayStats(bin: Column): Column =
    Bridge.column(BmpGrayStatsExpr(Bridge.expression(bin)))
}

/** [[BmpAHash.computeDHash]] as a codegen expression — same
  * one-call-into-the-kernel generated code as [[BmpAHashExpr]]. */
case class BmpDHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_dhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bmp_dhash needs binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val out = BmpAHash.computeDHash(input.asInstanceOf[Array[Byte]])
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      val out = ctx.freshName("dhash")
      s"""
         |long[] $out = graft.functions.BmpAHash.computeDHash($bin);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BmpDHashExpr =
    copy(child = newChild)
}

/** [[BmpAHash.computeGrayStats]] as a codegen expression — same
  * one-call-into-the-kernel generated code as [[BmpAHashExpr]]. */
case class BmpGrayStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bmp_gray_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bmp_gray_stats needs binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val out = BmpAHash.computeGrayStats(input.asInstanceOf[Array[Byte]])
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      val out = ctx.freshName("gstats")
      s"""
         |long[] $out = graft.functions.BmpAHash.computeGrayStats($bin);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): BmpGrayStatsExpr =
    copy(child = newChild)
}
