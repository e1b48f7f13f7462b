package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming media ingest: corrupt/oversized blobs are gated on
  * metadata alone, re-crawled content collapses to one stored copy,
  * and real BMP headers survive with their true dimensions. */
class MediaStreamSpec extends SparkSpec {

  import spark.implicits._

  /** Minimal 24-bpp BMP (the BmpAHashSpec builder). `varied` fills
    * the pixel array with a high-contrast pattern so the image passes
    * the flat-image ingest gate; false leaves it solid (all-zero) —
    * the placeholder junk the gate exists to drop. */
  private def bmp(width: Int, height: Int,
      varied: Boolean = true): Array[Byte] = {
    val stride = (width * 3 + 3) / 4 * 4
    val size = 54 + height * stride
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    b.putInt(0).putInt(height * stride).putInt(2835).putInt(2835)
    b.putInt(0).putInt(0)
    val arr = b.array()
    if (varied)
      (54 until size).foreach(i => arr(i) = ((i * 89) % 251).toByte)
    arr
  }

  test("gate drops corrupt/oversized, dedup collapses re-crawls, BMP dims real") {
    implicit val sqlCtx = spark.sqlContext
    val good = bmp(8, 8)
    val zeroDim = bmp(8, 8).clone()
    // zero out the width field (LE int32 at offset 18): a BMP whose
    // REAL header parse reports width 0 must be gated
    (18 until 22).foreach(i => zeroDim(i) = 0)
    val tiny = Array[Byte](1, 2, 3)
    val oversize = Array.fill[Byte](2048)(7)
    val audio = Array.tabulate[Byte](200)(i => (i * 37 % 251).toByte)
    // a REAL PNG: the gate must pass it with ImageIO-probed dims
    val png = {
      val img = new java.awt.image.BufferedImage(5, 4,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    // a solid-color BMP: headers valid, dims real — only the mm9
    // pixel-variance gate can reject it
    val flat = bmp(8, 8, varied = false)

    // a 32-bpp BI_RGB bitmap (round-13 intake widening): varied BGRX
    // pixels — must admit with real dims through the shared header
    // parse; a flat 32-bpp one still hits the variance gate
    def bmp32(varied: Boolean): Array[Byte] = {
      val w = 8; val h = 8; val stride = w * 4
      val size = 54 + h * stride
      val b = java.nio.ByteBuffer.allocate(size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(32)
      b.putInt(0).putInt(h * stride).putInt(2835).putInt(2835)
      b.putInt(0).putInt(0)
      val arr = b.array()
      if (varied)
        (54 until size).foreach(i => arr(i) = ((i * 131) % 247).toByte)
      arr
    }
    val deep = bmp32(varied = true)
    val deepFlat = bmp32(varied = false)

    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val media = in.toDF().toDF("media_id", "content", "ingest_ts")
    val outDir = Files.createTempDirectory("media-ingest").toString
    val ckpt = Files.createTempDirectory("media-ingest-ckpt").toString
    val q = MediaStream.start(media, outDir, ckpt, maxBytes = 1024)

    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    in.addData(Seq(
      (1L, good, t0),
      (2L, good.clone(), t0), // re-crawl of the same bytes
      (3L, zeroDim, t0),
      (4L, tiny, t0),
      (5L, oversize, t0),
      (6L, audio, t0),
      (7L, png, t0),
      (8L, flat, t0),
      (9L, deep, t0),
      (10L, deepFlat, t0)))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outDir)
    val kept = out.select("media_id").as[Long].collect().toSet
    // exactly one of {1,2} (content-dedup), plus the non-BMP blob
    assert(kept.intersect(Set(1L, 2L)).size == 1, s"kept $kept")
    assert(kept.contains(6L) && !kept.contains(3L) &&
      !kept.contains(4L) && !kept.contains(5L), s"kept $kept")
    val bmpRow = out.where(col("media_id").isin(1L, 2L))
      .select("media_type", "width", "height", "bpp").head()
    assert(bmpRow.getString(0) == "image")
    assert(bmpRow.getInt(1) == 8 && bmpRow.getInt(2) == 8)
    assert(bmpRow.getInt(3) == 24)
    // the PNG survived the gate with REAL ImageIO-probed dimensions
    assert(kept.contains(7L), s"kept $kept")
    val pngRow = out.where(col("media_id") === 7L)
      .select("media_type", "width", "height").head()
    assert(pngRow.getString(0) == "image")
    assert(pngRow.getInt(1) == 5 && pngRow.getInt(2) == 4)
    // the solid-color placeholder was dropped by the pixel-variance
    // gate even though its header is perfectly valid
    assert(!kept.contains(8L), s"flat image admitted: $kept")
    // the 32-bpp blob admits with real dims (round-13: the shared
    // header parse covers BGRX); the flat 32-bpp twin still gates
    assert(kept.contains(9L), s"32-bpp dropped: $kept")
    val deepRow = out.where(col("media_id") === 9L)
      .select("media_type", "width", "height", "bpp").head()
    assert(deepRow.getString(0) == "image")
    assert(deepRow.getInt(1) == 8 && deepRow.getInt(2) == 8)
    assert(deepRow.getInt(3) == 32)
    assert(!kept.contains(10L), s"flat 32-bpp admitted: $kept")
  }
}
