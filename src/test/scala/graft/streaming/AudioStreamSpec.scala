package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming audio ingest: the RIFF admission gate, the silence gate,
  * and the PAYLOAD-keyed dedup (a .wav re-upload of a stored .pcm
  * collapses cross-container) — the batch mm11/mm14 semantics at the
  * stream. */
class AudioStreamSpec extends SparkSpec {

  import spark.implicits._

  /** n frames of 64 8-bit samples: loud frames alternate 128±amp
    * (energy 64·amp² ≥ 4096 at amp ≥ 8), silent frames sit at 128. */
  private def pcm(frames: Int, amp: Int, silentPrefix: Int = 0): Array[Byte] =
    Array.tabulate(frames * 64) { i =>
      val f = i / 64
      if (f < silentPrefix) 128.toByte
      else (128 + (if (i % 2 == 0) amp else -amp)).toByte
    }

  private def wav(data: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    b.put("data".getBytes).putInt(data.length).put(data)
    b.array()
  }

  test("RIFF gate, silence gate, and cross-container payload dedup") {
    implicit val sqlCtx = spark.sqlContext
    val loud = pcm(16, 40)
    val loudWav = wav(loud) // the container twin of `loud`
    val other = pcm(16, 20, silentPrefix = 4) // 25% silent — passes
    val silent = pcm(16, 40, silentPrefix = 12) // 75% silent — dropped
    val flat = pcm(16, 0) // wall-to-wall silence — dropped
    val badRiff = {
      val c = wav(pcm(8, 30)); c(8) = 'A'.toByte; c // RIFF but not WAVE
    }
    val sixteenBit = {
      // bits_per_sample = 16 (LE u16 at offset 34): round-13 ADMITS
      // and canonicalizes — 512 payload bytes become 256 top-byte
      // samples (the constant 226 here: every LE pair is (158, 98)),
      // 4 loud frames
      val c = wav(pcm(8, 30)); c(34) = 16.toByte; c
    }
    val twentyFourBit = {
      // 24-bit stays OUTSIDE the canonicalization contract — the
      // fail-closed case: rejected, never mis-read as samples
      val c = wav(pcm(8, 30)); c(34) = 24.toByte; c
    }
    val tiny = Array.fill[Byte](10)(1)

    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val media = in.toDF().toDF("media_id", "content", "ingest_ts")
    val outDir = Files.createTempDirectory("audio-ingest").toString
    val ckpt = Files.createTempDirectory("audio-ingest-ckpt").toString
    val q = AudioStream.start(media, outDir, ckpt)
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    in.addData(Seq(
      (1L, loud, t0),
      (2L, loudWav, t0), // same samples, real container
      (3L, other, t0),
      (4L, silent, t0),
      (5L, flat, t0),
      (6L, badRiff, t0),
      (7L, sixteenBit, t0),
      (8L, tiny, t0),
      (9L, twentyFourBit, t0)))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outDir)
      .select("media_id", "container", "n_frames", "silence_ppm")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap

    // the wav twin deduped against the pcm original (payload-keyed):
    // exactly ONE of ids 1/2 survives, with the full 16-frame lattice
    val twins = Seq(1L, 2L).filter(out.contains)
    assert(twins.size === 1, s"cross-container dedup: $out")
    assert(out(twins.head)._2 === 16L)
    assert(out(twins.head)._3 === 0L)
    // the partially-silent blob survives with its exact share
    assert(out(3L) === (("pcm", 16L, 250000L)))
    // silence gate, RIFF admission, sample-width and size gates
    assert(!out.contains(4L), "75%-silent must drop")
    assert(!out.contains(5L), "flat must drop")
    assert(!out.contains(6L), "RIFF-but-not-WAVE must drop")
    // round-13: 16-bit ADMITS through the canonical decode — the 512
    // payload bytes collapse to 256 constant-226 samples (4 frames,
    // no silence); 24-bit stays fail-closed
    assert(out(7L) === (("wav", 4L, 0L)))
    assert(!out.contains(8L), "sub-frame blob must drop")
    assert(!out.contains(9L), "24-bit wav must drop (fail-closed)")
  }

  test("RF64 and float PCM stream in; a broken RF64 drops, not raw-reads") {
    // round-14: the bundled RF64 (ds64-declared sizes) and IEEE
    // float-PCM fixtures must ADMIT through the streaming gate with
    // their exact canonical lattices, and an RF64 whose ds64 is
    // missing must be riff_rejected — never fall through to the
    // headerless-PCM branch and feed header bytes to the energy math
    implicit val sqlCtx = spark.sqlContext
    def fixture(n: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/meta/media/$n")
      val b = in.readAllBytes(); in.close(); b
    }
    val rf64 = fixture("bell_r64.wav")
    val f32 = fixture("flute_f32.wav")
    val brokenRf64 = {
      // corrupt the ds64 chunk id: the walk no longer finds it, so
      // the placeholder sizes have no authority — wav_ok false
      val c = rf64.clone(); c(12) = 'x'.toByte; c
    }
    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val media = in.toDF().toDF("media_id", "content", "ingest_ts")
    val outDir = Files.createTempDirectory("audio-ingest-r14").toString
    val ckpt = Files.createTempDirectory("audio-ingest-r14-ckpt").toString
    val q = AudioStream.start(media, outDir, ckpt)
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    in.addData(Seq((31L, rf64, t0), (32L, f32, t0), (33L, brokenRf64, t0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(outDir)
      .select("media_id", "container", "n_frames", "silence_ppm")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // the generator-pinned lattices (gen_r14_media.py report lines)
    assert(out(31L) === (("wav", 70L, 128571L)))
    assert(out(32L) === (("wav", 68L, 102941L)))
    assert(!out.contains(33L), s"broken RF64 must drop: $out")
  }

  test("non-canonical wav admits through the SHARED chunk walk (round-11)") {
    // a LIST/INFO chunk between fmt and data — the round-10 stream
    // gate (fixed offsets) dropped this; the shared Riff walk admits
    // it with the payload located correctly
    implicit val sqlCtx = spark.sqlContext
    val data = pcm(16, 40)
    val info = "INFO".getBytes ++ "IART".getBytes ++
      Array[Byte](4, 0, 0, 0) ++ "spec".getBytes
    val b = java.nio.ByteBuffer
      .allocate(44 + 8 + info.length + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + 8 + info.length + data.length)
      .put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    b.put("LIST".getBytes).putInt(info.length).put(info)
    b.put("data".getBytes).putInt(data.length).put(data)
    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val media = in.toDF().toDF("media_id", "content", "ingest_ts")
    val outDir = Files.createTempDirectory("audio-ingest-nc").toString
    val ckpt = Files.createTempDirectory("audio-ingest-nc-ckpt").toString
    val q = AudioStream.start(media, outDir, ckpt)
    in.addData(Seq((21L, b.array(), Timestamp.valueOf("2024-03-01 10:00:00"))))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(outDir)
      .select("media_id", "container", "n_frames", "n_bytes")
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 21L)
    assert(rows.head.getString(1) === "wav")
    // the payload slice came from the WALKED data offset: exactly the
    // 16-frame sample section, not a shifted garbage window
    assert(rows.head.getLong(2) === 16L)
    assert(rows.head.getLong(3) === data.length.toLong)
  }

  test("an interleaved AVI's 01wb audio admits; an audio-less AVI rejects") {
    // round-12: the THIRD container through the shared gate — the
    // bundled vid_talk fixture (4096 audio bytes across three 01wb
    // chunks between video frames) must ingest as its demuxed
    // payload; vid_pre (video-only movi) must stay riff_rejected
    def fixture(name: String): Array[Byte] = {
      val in0 = getClass.getResourceAsStream(s"/meta/media/$name")
      require(in0 != null); val b = in0.readAllBytes(); in0.close(); b
    }
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val media = in.toDF().toDF("media_id", "content", "ingest_ts")
    val outDir = Files.createTempDirectory("audio-ingest-avi").toString
    val ckpt = Files.createTempDirectory("audio-ingest-avi-ck").toString
    val q = AudioStream.start(media, outDir, ckpt)
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    // an UNSUPPORTED auds declaration (wBitsPerSample byte of
    // vid_talk's auds strf flipped 8 -> 24): outside the
    // canonicalization contract, MUST reject — feeding
    // unknown-format bytes to the energy math is the silent
    // mis-parse the gates exist for. (A 16-bit declaration now
    // ADMITS — round-13 — which vid_duet proves below.)
    val wide = fixture("vid_talk.avi").clone()
    assert(wide(310) === 8.toByte, "auds strf layout moved — repin")
    wide(310) = 24.toByte
    in.addData(Seq(
      (31L, fixture("vid_talk.avi"), t0),
      (32L, fixture("vid_pre.avi"), t0),
      (33L, wide, t0),
      (34L, fixture("vid_duet.avi"), t0),
      (35L, fixture("vid_wall.avi"), t0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(outDir)
      .select("media_id", "container", "n_bytes", "n_frames",
        "silence_ppm")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set(31L, 34L))
    // the demuxed concat: exactly the 4096 planted audio bytes, with
    // the planted 24/64 silent-frame share — chunk headers and video
    // frames never leak into the sample stream
    assert(rows(31L) === (("avi", 4096L, 64L, 375000L)))
    // round-13: the REAL 16-bit stereo fixture admits through the
    // canonical decode — 16640 raw bytes collapse to 4160 top-byte
    // channel-mean samples, 65 frames with the planted 4-frame
    // silent rim (ppm 61538 = 4·10⁶ div 65)
    assert(rows(34L) === (("avi", 4160L, 65L, 61538L)))
    // vid_wall: the 4102-sub-chunk movi hits the 4096 walk cap —
    // the stream must REJECT rather than store a truncated demux
    // (round-13, ADVICE r12 #1 at the intake)
    assert(!rows.contains(35L))
  }

  test("intake counter names every reject: mp3, h264, layout, unparsed") {
    // round-15 (VERDICT r14 ask #4): the fail-closed gates stand,
    // but the rejects stop vanishing — (window, container, reason)
    // counts through the SAME classify the sink uses, with the
    // planted compressed-codec fixtures landing their named codes
    implicit val sqlCtx = spark.sqlContext
    def fixture(n: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/meta/media/$n")
      val b = in.readAllBytes(); in.close(); b
    }
    val mp3 = fixture("talk_mp3.wav")
    val h264 = fixture("vid_h264.avi")
    val ok = wav(pcm(8, 30))
    val twentyFourBit = { val c = wav(pcm(8, 30)); c(34) = 24.toByte; c }
    val badRiff = { val c = wav(pcm(8, 30)); c(8) = 'A'.toByte; c }
    val in = MemoryStream[(Long, Array[Byte], Timestamp)]
    val media = in.toDF().toDF("media_id", "content", "ingest_ts")
    val outDir = Files.createTempDirectory("audio-intake").toString
    val ckpt = Files.createTempDirectory("audio-intake-ckpt").toString
    val q = AudioStream.startIntakeCounter(media, outDir, ckpt)
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    in.addData(Seq((41L, mp3, t0), (42L, h264, t0), (43L, ok, t0),
      (44L, twentyFourBit, t0), (45L, badRiff, t0), (46L, mp3, t0)))
    q.processAllAvailable()
    // a later event advances the watermark past the first window so
    // its counts EMIT (append mode semantics)
    in.addData(Seq((47L, ok,
      Timestamp.valueOf("2024-03-01 10:30:00"))))
    q.processAllAvailable()
    q.stop()
    val counts = spark.read.parquet(outDir)
      .collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(counts(("riff_rejected", "mp3_layer3")) === 2L)
    assert(counts(("riff_rejected", "h264")) === 1L)
    assert(counts(("riff_rejected", "unsupported_layout")) === 1L)
    assert(counts(("riff_rejected", "unparsed")) === 1L)
    assert(counts(("wav", "ok")) === 1L)
  }
}
