package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pixel-level pins for the library-free BMP average-hash: synthetic
  * bitmaps with KNOWN pixel content, both row orders, and the NULL
  * contract for malformed blobs. */
class BmpAHashSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal 24-bpp BMP: 54-byte header + bottom-up (or top-down when
    * `height` < 0) rows, `pix(x, y)` giving (r, g, b) in IMAGE
    * coordinates (y=0 is the top row). */
  private def bmp(width: Int, height: Int,
      pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val h = math.abs(height)
    val stride = (width * 3 + 3) / 4 * 4
    val size = 54 + h * stride
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    b.putInt(0).putInt(h * stride).putInt(2835).putInt(2835)
    b.putInt(0).putInt(0)
    for (row <- 0 until h) {
      // physical row `row` holds image row (bottom-up flips)
      val y = if (height < 0) row else h - 1 - row
      for (x <- 0 until width) {
        val (r, g, bl) = pix(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
      }
      b.position(54 + (row + 1) * stride) // stride padding
    }
    b.array()
  }

  private def hash(bytes: Array[Byte]): Option[(Long, Long)] = {
    val r = Seq(Tuple1(bytes)).toDF("bin")
      .select(BmpAHash.aHash(col("bin")).as("ah")).head()
    if (r.isNullAt(0)) None
    else { val s = r.getSeq[Long](0); Some((s(0), s(1))) }
  }

  test("uniform image hashes to all-zero bits (no gray exceeds the mean)") {
    assert(hash(bmp(16, 16, (_, _) => (100, 100, 100))) === Some((0L, 0L)))
  }

  test("left-bright half-image sets exactly the left grid columns") {
    val h = hash(bmp(16, 16,
      (x, _) => if (x < 8) (255, 255, 255) else (0, 0, 0))).get
    // grid cols 0-3 sample x in 0..7 (bright), cols 4-7 sample x >= 8:
    // per row bits 0-3 set → nibble 0b00001111 repeated
    val expected = java.lang.Long.parseLong("0f0f0f0f", 16)
    assert(h === ((expected, expected)))
  }

  test("top-down (negative height) equals the bottom-up twin") {
    def pix(x: Int, y: Int) =
      if ((x + y) % 3 == 0) (200, 10, 30) else (5, 80, 160)
    assert(hash(bmp(20, 12, pix)) === hash(bmp(20, -12, pix)))
    // and an ASYMMETRIC image differs between orientations read
    // naively — the sign handling is load-bearing, prove it: flipping
    // the image vertically must flip which rows are bright
    val topBright = hash(bmp(16, 16,
      (_, y) => if (y < 8) (255, 255, 255) else (0, 0, 0))).get
    val bottomBright = hash(bmp(16, 16,
      (_, y) => if (y >= 8) (255, 255, 255) else (0, 0, 0))).get
    assert(topBright !== bottomBright)
    // top rows = bits 0..31 (i = r*8+c, r = grid row from the top)
    assert(topBright === ((0L, 4294967295L)))
    assert(bottomBright === ((4294967295L, 0L)))
  }

  /** 32-bpp BI_RGB twin of [[bmp]]: same pixels, BGRX layout. */
  private def bmp32(width: Int, height: Int,
      pix: (Int, Int) => (Int, Int, Int),
      compression: Int = 0): Array[Byte] = {
    val h = math.abs(height)
    val stride = width * 4
    val size = 54 + h * stride
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(32)
    b.putInt(compression).putInt(h * stride).putInt(2835).putInt(2835)
    b.putInt(0).putInt(0)
    for (row <- 0 until h) {
      val y = if (height < 0) row else h - 1 - row
      for (x <- 0 until width) {
        val (r, g, bl) = pix(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte).put(0.toByte)
      }
    }
    b.array()
  }

  test("32-bpp BI_RGB hashes identically to its 24-bpp twin") {
    // round-13: same pixels through both layouts must produce the
    // SAME bits (gray is the same first three bytes; the pad byte is
    // skipped and the stride math honors 4 bytes/px) — and a 32-bpp
    // blob declaring BI_BITFIELDS (masks could reorder channels)
    // stays NULL, fail-closed
    def pix(x: Int, y: Int) =
      if (x >= 8) (200, 180, 160) else (10, 20, 30)
    assert(hash(bmp32(16, 16, pix)) === hash(bmp(16, 16, pix)))
    assert(hash(bmp32(16, -16, pix)) === hash(bmp(16, 16, pix)))
    assert(hash(bmp32(16, 16, pix, compression = 3)) === None)
    // dHash and grayStats ride the same shared header parse
    assert(BmpAHash.computeDHash(bmp32(16, 16, pix)).toSeq ===
      BmpAHash.computeDHash(bmp(16, 16, pix)).toSeq)
    assert(BmpAHash.computeGrayStats(bmp32(16, 16, pix)).toSeq ===
      BmpAHash.computeGrayStats(bmp(16, 16, pix)).toSeq)
    assert(BmpAHash.computeGrayStats(
      bmp32(16, 16, pix, compression = 3)) === null)
  }

  test("malformed blobs are NULL, not garbage") {
    val good = bmp(8, 8, (_, _) => (1, 2, 3))
    assert(hash("not a bmp".getBytes) === None)       // no magic
    assert(hash(good.take(40)) === None)              // short header
    assert(hash(good.dropRight(4)) === None)          // truncated pixels
    val bpp8 = good.clone(); bpp8(28) = 8             // unsupported depth
    assert(hash(bpp8) === None)
    assert(hash(good).isDefined)
  }

  test("interpreted eval matches codegen") {
    val img = bmp(33, 7, (x, y) => ((x * 37) % 256, (y * 91) % 256, 17))
    val df = Seq(Tuple1(img)).toDF("bin")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try df.select(BmpAHash.aHash(col("bin"))).head().getSeq[Long](0)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    val gen = df.select(BmpAHash.aHash(col("bin"))).head().getSeq[Long](0)
    assert(interp === gen)
  }

  private def dhash(bytes: Array[Byte]): Option[(Long, Long)] = {
    val r = Seq(Tuple1(bytes)).toDF("bin")
      .select(BmpAHash.dHash(col("bin")).as("dh")).head()
    if (r.isNullAt(0)) None
    else { val s = r.getSeq[Long](0); Some((s(0), s(1))) }
  }

  test("dHash reads gradients: ramps give all-zero / all-one, where aHash can't tell") {
    // width 18 → sample columns x = 0,2,…,16: strictly monotone
    val rising = bmp(18, 16, (x, _) => (x * 10, x * 10, x * 10))
    val falling = bmp(18, 16,
      (x, _) => (170 - x * 10, 170 - x * 10, 170 - x * 10))
    // rising: gray(c) < gray(c+1) everywhere → no bits
    assert(dhash(rising) === Some((0L, 0L)))
    // falling: every adjacent comparison true → all 64 bits
    assert(dhash(falling) === Some((4294967295L, 4294967295L)))
    // aHash sees BOTH ramps as the same half-bright pattern class
    // (mirror images of each other), dHash separates them maximally —
    // the different-failure-modes claim, concretely
    val (ar, af) = (hash(rising).get, hash(falling).get)
    assert(java.lang.Long.bitCount(ar._1) + java.lang.Long.bitCount(ar._2)
      === java.lang.Long.bitCount(af._1) + java.lang.Long.bitCount(af._2),
      "aHash assigns both ramps the same bit mass")
  }

  private def gstats(bytes: Array[Byte]): Option[Seq[Long]] = {
    val r = Seq(Tuple1(bytes)).toDF("bin")
      .select(BmpAHash.grayStats(col("bin")).as("st")).head()
    if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
  }

  test("gray stats: uniform image — exact sum/sumSq, zero spread") {
    // gray = 300 at every sample → sum 300·64, sumSq 300²·64, min=max
    assert(gstats(bmp(16, 16, (_, _) => (100, 100, 100))) ===
      Some(Seq(300L * 64, 300L * 300 * 64, 300L, 300L)))
  }

  test("gray stats: half-bright image and both row orders") {
    val s = gstats(bmp(16, 16,
      (x, _) => if (x < 8) (255, 255, 255) else (0, 0, 0))).get
    // 32 samples at 765, 32 at 0
    assert(s === Seq(765L * 32, 765L * 765 * 32, 0L, 765L))
    def pix(x: Int, y: Int) =
      if ((x + y) % 3 == 0) (200, 10, 30) else (5, 80, 160)
    assert(gstats(bmp(20, 12, pix)) === gstats(bmp(20, -12, pix)))
  }

  test("gray stats: NULL contract and interpreted-vs-codegen parity") {
    val good = bmp(8, 8, (_, _) => (1, 2, 3))
    assert(gstats("not a bmp".getBytes) === None)
    assert(gstats(good.dropRight(3)) === None)
    val img = bmp(33, 7, (x, y) => ((x * 37) % 256, (y * 91) % 256, 17))
    val df = Seq(Tuple1(img)).toDF("bin")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try df.select(BmpAHash.grayStats(col("bin"))).head().getSeq[Long](0)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    val gen = df.select(BmpAHash.grayStats(col("bin"))).head().getSeq[Long](0)
    assert(interp === gen)
  }

  test("dHash honors both row orders and the NULL contract") {
    def pix(x: Int, y: Int) =
      if ((x * 7 + y * 3) % 5 < 2) (220, 40, 10) else (15, 90, 140)
    assert(dhash(bmp(27, 14, pix)) === dhash(bmp(27, -14, pix)))
    assert(dhash(bmp(27, 14, pix)).isDefined)
    val good = bmp(9, 8, (_, _) => (1, 2, 3))
    assert(dhash("nope".getBytes) === None)
    assert(dhash(good.dropRight(2)) === None)
    assert(dhash(good).isDefined)
  }
}
