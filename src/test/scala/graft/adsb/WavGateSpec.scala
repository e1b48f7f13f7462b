package graft.adsb

import graft.SparkSpec
import graft.queries.AdsbQueries

/** The canonical-PCM narrowing of [[AdsbQueries.wavParsed]] must be
  * GATED, not assumed: a blob failing any of the four chunk-id checks
  * (RIFF / WAVE / 'fmt ' / 'data') is excluded visibly, never
  * mis-parsed into garbage header fields. Malformed twins are
  * constructed byte-for-byte from the valid fixture. */
class WavGateSpec extends SparkSpec {

  private def bytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/meta/media/$name")
    require(in != null)
    val b = in.readAllBytes(); in.close(); b
  }

  private def plant(files: (String, Array[Byte])*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-wavgate")
    files.foreach { case (n, b) =>
      java.nio.file.Files.write(dir.resolve(n), b)
      dir.resolve(n).toFile.deleteOnExit()
    }
    dir.toFile.deleteOnExit()
    dir.toString
  }

  test("malformed containers are excluded; the valid twin still parses") {
    val good = bytes("dialog_h_w.wav")
    def corrupt(at: Int, to: Array[Byte]): Array[Byte] = {
      val c = good.clone(); to.zipWithIndex.foreach { case (b, i) =>
        c(at + i) = b }; c
    }
    val dir = plant(
      "good.wav" -> good,
      // 'RIFX' — the big-endian variant this parser must NOT claim
      "bad_riff.wav" -> corrupt(0, "RIFX".getBytes),
      // wrong form type
      "bad_wave.wav" -> corrupt(8, "AVI ".getBytes),
      // a LIST chunk before fmt — non-canonical layout, must be
      // excluded rather than read as shifted garbage
      "bad_fmt.wav" -> corrupt(12, "LIST".getBytes),
      // a fact chunk where data is expected
      "bad_data.wav" -> corrupt(36, "fact".getBytes),
      // truncated header: shorter than the 44 canonical bytes
      "tiny.wav" -> good.take(20))
    val rows = AdsbQueries.wavParsed(spark, dir)
      .select("model").collect().map(_.getString(0))
    assert(rows.toSeq === Seq("good"))
  }

  test("parsed payload of the valid twin is byte-identical to the pcm") {
    val pcm = bytes("dialog_h.pcm")
    val row = AdsbQueries.wavParsed(spark)
      .selectExpr("model", "substring(content, 45, cast(data_bytes AS int))")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(row("dialog_h_w"), pcm))
  }
}
