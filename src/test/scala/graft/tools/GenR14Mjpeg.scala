package graft.tools

/** Round-14 MJPEG fixture generator (rerunnable; run with
  * `sbt "Test/runMain graft.tools.GenR14Mjpeg"`). Writes two
  * frame-for-frame PIXEL TWINS into the bundled media dir:
  *
  *  - `vid_mj_raw.avi`: 8 raw 16×16 gray frames in `00db` chunks
  *    (handler 0 — the existing uncompressed path);
  *  - `vid_mj.avi`: the SAME 8 frames JPEG-encoded (this JVM's
  *    encoder, quality 0.95) in `00dc` chunks, strh fccHandler and
  *    strf biCompression = 'MJPG'.
  *
  * Frame f is a quadrant pattern: 8×8 block q holds 224 where bit q
  * of (f+1) is set, 32 elsewhere — aligned to JPEG's DCT blocks and
  * ±96 from any possible mean, so the decoded aHash equals the raw
  * twin's EXACTLY (the generator asserts it through the very
  * ImageIo path the engine uses, refusing to write drifting
  * fixtures). Prints the spec-pin numbers (frame sums, hashes). */
object GenR14Mjpeg {

  private val D = "src/main/resources/meta/media"

  private def le(n: Long, w: Int): Array[Byte] =
    (0 until w).map(i => ((n >> (8 * i)) & 0xFF).toByte).toArray

  private def chunk(cid: String, data: Array[Byte]): Array[Byte] =
    cid.getBytes("ISO-8859-1") ++ le(data.length.toLong, 4) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)

  private def lst(form: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", form.getBytes("ISO-8859-1") ++ payload)

  private def avih(uspf: Int, frames: Int, streams: Int, w: Int,
      h: Int): Array[Byte] =
    chunk("avih", le(uspf.toLong, 4) ++ le(0, 12) ++ le(frames.toLong, 4) ++
      le(0, 4) ++ le(streams.toLong, 4) ++ le(0, 4) ++ le(w.toLong, 4) ++
      le(h.toLong, 4) ++ le(0, 16))

  private def strhVids(handler: String): Array[Byte] =
    chunk("strh", "vids".getBytes("ISO-8859-1") ++
      (if (handler.isEmpty) le(0, 4) else handler.getBytes("ISO-8859-1")) ++
      Array.fill[Byte](48)(0))

  // BITMAPINFOHEADER: biSize(40), w, h, planes(1), bpp, biCompression
  private def strfVideo(w: Int, h: Int, bpp: Int,
      comp: String): Array[Byte] =
    chunk("strf", le(40, 4) ++ le(w.toLong, 4) ++ le(h.toLong, 4) ++
      le(1, 2) ++ le(bpp.toLong, 2) ++
      (if (comp.isEmpty) le(0, 4) else comp.getBytes("ISO-8859-1")) ++
      le(0, 20))

  private def avi(uspf: Int, frames: Int, w: Int, h: Int,
      strl: Array[Byte], movi: Seq[Array[Byte]]): Array[Byte] = {
    val body = "AVI ".getBytes("ISO-8859-1") ++
      lst("hdrl", avih(uspf, frames, 1, w, h) ++ strl) ++
      lst("movi", movi.flatten.toArray)
    "RIFF".getBytes("ISO-8859-1") ++ le(body.length.toLong, 4) ++ body
  }

  private def jpegEncode(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = px(y * w + x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  /** The raw-frame aHash rule (BmpAHash grid on w×h gray bytes). */
  private def rawHash(px: Array[Int], w: Int, h: Int): (Long, Long) = {
    val gray = (0 until 64).map(i =>
      px(((i / 8) * h / 8) * w + (i % 8) * w / 8).toLong)
    val mean = gray.sum / 64
    var hi = 0L; var lo = 0L
    gray.zipWithIndex.foreach { case (g, i) =>
      if (g > mean) { if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32) }
    }
    (hi, lo)
  }

  def main(args: Array[String]): Unit = {
    val (w, h, n) = (16, 16, 8)
    val frames = (0 until n).map { f =>
      Array.tabulate(w * h) { i =>
        val q = (if (i / w >= 8) 2 else 0) + (if (i % w >= 8) 1 else 0)
        if ((((f + 1) >> q) & 1) != 0) 224 else 32
      }
    }
    val rawPay = frames.map(_.map(_.toByte))
    val jpgPay = frames.map(px => jpegEncode(px, w, h))
    // refuse to write fixtures whose decode drifts from the raw twin
    frames.zipWithIndex.foreach { case (px, f) =>
      val expect = rawHash(px, w, h)
      val got = graft.functions.ImageIo.aHash(jpgPay(f), 8)
      require(got != null && (got(0), got(1)) == expect,
        s"frame $f decode-hash drift: expect $expect got " +
          (if (got == null) "null" else (got(0), got(1)).toString))
    }
    val raw = avi(40000, n, w, h,
      lst("strl", strhVids("") ++ strfVideo(w, h, 8, "")),
      rawPay.map(p => chunk("00db", p)))
    val mj = avi(40000, n, w, h,
      lst("strl", strhVids("MJPG") ++ strfVideo(w, h, 8, "MJPG")),
      jpgPay.map(p => chunk("00dc", p)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$D/vid_mj_raw.avi"), raw)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$D/vid_mj.avi"), mj)
    println(s"vid_mj_raw.avi ${raw.length} B; vid_mj.avi ${mj.length} B")
    println("raw frame sums: " +
      frames.map(_.map(_.toLong).sum).mkString(", "))
    println("jpg frame sums: " +
      jpgPay.map(_.map(b => (b & 0xFF).toLong).sum).mkString(", "))
    println("frame hashes (hi, lo): " +
      frames.map(px => rawHash(px, w, h)).mkString(", "))
  }
}
