package graft.operators

import graft.SparkSpec
import graft.queries.AdsbQueries

/** Semantic pins for the audio/video media ops (the oracle proves the
  * arithmetic; these prove the ops MEAN something): the planted
  * perturbed near-dup audio pairs must find each other at near-zero
  * hamming while unrelated signals stay far, and frame sampling must
  * honor the container header exactly. */
class MediaFingerprintSpec extends SparkSpec {

  private lazy val mm7 =
    AdsbQueries.defs("mm7_audio_fingerprint")(spark, "unused")
      .collect().map(r => r.getString(0) ->
        (r.getString(4), r.getLong(5))).toMap

  test("every MJPG-routed bundled model has a declared pixel-twin pin") {
    // ADVICE r14: the mm19/mm20/mm22 oracles expect an MJPG model's
    // frame hashes to equal its raw pixel-twin's derived hashes
    // (DuckDB cannot decode JPEG). An unpinned MJPG fixture would go
    // red with a confusing zero-oracle-rows diff — this pin makes the
    // failure mode a clear message at the declared home instead.
    import org.apache.spark.sql.functions.col
    val avi = graft.functions.Riff.withAviColumns(
      graft.adsb.Meta.loadMediaFiles(spark, graft.adsb.Meta.mediaDir(),
        "avi"))
    val routed = avi.where(col("avi_ok") && col("avi_is_mjpg"))
      .select(col("model")).collect().map(_.getString(0)).toSet
    val bundled = avi.select(col("model")).collect()
      .map(_.getString(0)).toSet
    val pins = AdsbQueries.MjpegTwinPins.toMap
    assert(routed === pins.keySet,
      s"MJPG-routed models $routed must exactly match the declared " +
        s"MjpegTwinPins keys ${pins.keySet} (AdsbQueries.MjpegTwinPins)")
    pins.values.foreach(raw => assert(bundled.contains(raw),
      s"MjpegTwinPins raw twin '$raw' is not a bundled AVI model"))
  }

  test("perturbed audio near-dups are each other's nearest neighbor") {
    // ±1 on every 97th byte barely moves 64-sample energies: the
    // sign-of-delta bits are nearly unchanged
    assert(mm7("tone_a")._1 === "tone_a_dup")
    assert(mm7("tone_a_dup")._1 === "tone_a")
    assert(mm7("tone_a")._2 <= 2, s"near-dup hamming: ${mm7("tone_a")}")
    assert(mm7("sweep_d")._1 === "sweep_d_dup")
    assert(mm7("sweep_d")._2 <= 2)
  }

  test("unrelated audio signals sit far apart in fingerprint space") {
    // noise vs the pure tone: no structural reason for agreement
    assert(mm7("noise_c")._2 > 8, s"noise NN: ${mm7("noise_c")}")
  }

  test("frame sampling honors the GVID header and k=4 lattice") {
    val rows = AdsbQueries.defs("mm8_frame_sample")(spark, "unused")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byModel = rows.groupBy(_._1)
    // vid_b: 20 frames -> sampled 0,4,8,12,16
    assert(byModel("vid_b").map(_._3).sorted === Seq(0L, 4L, 8L, 12L, 16L))
    assert(byModel("vid_b").head._2 === 20L)
    // vid_c: 9 frames -> 0,4,8
    assert(byModel("vid_c").map(_._3).sorted === Seq(0L, 4L, 8L))
    // the truncated copy samples a strict prefix of the original's lattice
    val a = byModel("vid_a").map(_._3).sorted
    val cut = byModel("vid_a_cut").map(_._3).sorted
    assert(cut === a.take(cut.length))
  }

  test("frame sampling demuxes the AVI twin to the gvid's exact checksums") {
    val rows = AdsbQueries.defs("mm8_frame_sample")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4)))
    def of(m: String) = rows.collect { case ((`m`, f), v) => f -> v }.toMap
    val (g, a) = (of("vid_scene"), of("vid_scene_a"))
    assert(g.nonEmpty && a.keySet === g.keySet)
    g.keySet.foreach { f =>
      assert(a(f)._2 === g(f)._2, s"frame $f bytesum") // same content
      // but the byte offsets honor each container's own layout:
      // gvid 8 + f·256, avi movi-payload 108 + f·264
      assert(g(f)._1 === 8L + f * 256L)
      assert(a(f)._1 === 108L + f * 264L)
    }
  }

  test("shot-boundary detection fires exactly at the planted cut") {
    val rows = AdsbQueries.defs("mm10_shot_boundaries")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(5)))
    // vid_scene: dark frames 0-7, bright 8-15 → the ONLY boundary is
    // the 7→8 transition (reported at frame_idx 8); every other
    // delta is fixture noise well under the 2×-mean threshold
    val scene = rows.filter(_._1 == "vid_scene")
    assert(scene.length === 15) // n_frames - 1 comparison rows
    assert(scene.filter(_._3).map(_._2).toSeq === Seq(8L))
    // vid_a_cut is a prefix of vid_a: their shared comparison rows
    // agree flag-for-flag (the threshold is per-video, so only check
    // the structural prefix property on deltas via flags count ≥ 0)
    assert(rows.count(_._1 == "vid_a") === 15)
    assert(rows.count(_._1 == "vid_a_cut") === 11)
  }

  test("silence gate: planted half-silent audio lands exactly on the cut") {
    val rows = AdsbQueries.defs("mm11_audio_silence")(spark, "unused")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    // speech_g: 16+16 silent frames around 32 active → exactly 500000
    // ppm, and the >= boundary admits it as mostly-silent
    assert(rows("speech_g") === ((32L, 500000L, true)))
    // quiet_f is wall-to-wall silence; every real signal has none
    assert(rows("quiet_f") === ((64L, 1000000L, true)))
    assert(rows("tone_a")._1 === 0L)
    assert(rows("noise_c")._3 === false)
    // round-13: the EXTENSIBLE 16-bit stereo wav canonicalizes in
    // through the SubFormat-GUID gate (6 silent of 66 frames); the
    // 24-bit wav never reaches the lattice — fail-closed
    assert(rows("hymn_x") === ((6L, 90909L, false)))
    assert(!rows.contains("organ_24"))
    // round-15: the MP3-in-WAV never reaches the lattice either —
    // fail-closed stands; what changed is that mm18 now NAMES it
    assert(!rows.contains("talk_mp3"))
    // round-14: the RF64 container (ds64-declared sizes) and the
    // IEEE-float format-3 wav decode through the same shared gate —
    // planted silent rims land exactly (9/70 and 7/68 frames)
    assert(rows("bell_r64") === ((9L, 128571L, false)))
    assert(rows("flute_f32") === ((7L, 102941L, false)))
    // the G.711 captures decode through the ITU formulas: the
    // planted silent rims land exactly (8/24 and 10/24 frames)
    assert(rows("phone_u") === ((8L, 333333L, false)))
    assert(rows("fax_a") === ((10L, 416666L, false)))
  }

  test("speech segments: planted three-burst dialog splits exactly") {
    // dialog_h plants bursts at frames 8-19 (amp 30), 30-45 (amp 50),
    // 52-61 (amp 20) between four silent gaps — the multi-segment
    // case that makes the silent-prefix grouping load-bearing; a
    // wall-to-wall silent blob yields NO rows, a continuous signal
    // exactly one.
    val rows = AdsbQueries.defs("mm13_speech_segments")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows(("dialog_h", 1L)) === ((8L, 19L, 12L, 64L * 900)))
    assert(rows(("dialog_h", 2L)) === ((30L, 45L, 16L, 64L * 2500)))
    assert(rows(("dialog_h", 3L)) === ((52L, 61L, 10L, 64L * 400)))
    assert(!rows.keys.exists(_._1 == "quiet_f"))
    assert(rows.keys.count(_._1 == "tone_a") === 1)
  }

  test("RIFF/WAVE twin: identical samples through a real container") {
    // dialog_h_w.wav wraps dialog_h's exact 4096 samples in a
    // canonical RIFF header, and dialog_h_16.wav (round-13) carries
    // the SAME signal as 16-bit little-endian samples — all three
    // must segment IDENTICALLY (mm13) and fingerprint to hamming 0
    // (mm7): container- AND bit-depth-independent audio analysis,
    // the mm5 cross-format story for the audio leg
    val segs = AdsbQueries.defs("mm13_speech_segments")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    (1L to 3L).foreach { i =>
      assert(segs(("dialog_h_w", i)) === segs(("dialog_h", i)), s"seg $i")
      assert(segs(("dialog_h_16", i)) === segs(("dialog_h", i)), s"s16 $i")
    }
    // three hamming-0 twins: ties break to the smallest model name
    assert(mm7("dialog_h")._1 === "dialog_h_16")
    assert(mm7("dialog_h")._2 === 0L)
    assert(mm7("dialog_h_16") === (("dialog_h", 0L)))
    assert(mm7("dialog_h_w") === (("dialog_h", 0L)))
  }

  test("WAV header parse matches the planted canonical-PCM fixture") {
    val all = AdsbQueries.defs("mm14_wav_header")(spark, "unused").collect()
    // all bundled wavs parse: the canonical twin, the round-11
    // non-canonical chant_i (LIST/INFO between fmt and data),
    // claim_j (valid structure, lying byte_rate — mm18's case), and
    // the round-13 sample-format trio — 16-bit, stereo, and the
    // format-rejected 24-bit (whose HEADER must still read: mm14 is
    // the metadata readout, not the analysis gate)
    assert(all.map(_.getString(0)).toSet ===
      Set("dialog_h_w", "chant_i", "claim_j",
        "dialog_h_16", "duet_s8", "organ_24", "hymn_x",
        "phone_u", "fax_a", "bell_r64", "flute_f32", "talk_mp3"))
    // round-15: the MP3-in-WAV header reads as declared (mm14 is the
    // metadata readout — the codec REJECTION lives in the gates and
    // is named by mm18's codec_reason)
    val mp3 = all.filter(_.getString(0) == "talk_mp3").head
    assert(mp3.getLong(3) === 85L) // WAVE_FORMAT_MPEGLAYER3
    assert(mp3.getLong(5) === 22050L)
    assert(mp3.getLong(9) === 400L)
    // round-14 RF64: the 32-bit size fields hold the 0xFFFFFFFF
    // placeholder — riff_bytes and data_bytes must be the ds64
    // values (EBU Tech 3306), not the placeholder
    val r64 = all.filter(_.getString(0) == "bell_r64").head
    assert(r64.getLong(1) === 9032L) // ds64 riffSize = file - 8
    assert(r64.getLong(3) === 1L) // PCM inside the RF64 form
    assert(r64.getLong(8) === 16L)
    assert(r64.getLong(9) === 8960L) // ds64 dataSize (4480 · 2)
    // round-14 float PCM: header reads the declared format 3 / 32
    val f32 = all.filter(_.getString(0) == "flute_f32").head
    assert(f32.getLong(3) === 3L)
    assert(f32.getLong(7) === 4L) // block_align = 1 ch · 32/8
    assert(f32.getLong(8) === 32L)
    assert(f32.getLong(9) === 17408L) // 4352 samples · 4
    // the EXTENSIBLE container: header reads normally (format is the
    // 0xFFFE marker; the PCM admission decision lives in the gates)
    val rx = all.filter(_.getString(0) == "hymn_x").head
    assert(rx.getLong(3) === 65534L) // WAVE_FORMAT_EXTENSIBLE
    assert(rx.getLong(4) === 2L)
    assert(rx.getLong(8) === 16L)
    val r16 = all.filter(_.getString(0) == "dialog_h_16").head
    assert(r16.getLong(4) === 1L) // mono
    assert(r16.getLong(6) === 16000L) // byte_rate = 8000·1·16/8
    assert(r16.getLong(7) === 2L) // block_align
    assert(r16.getLong(8) === 16L) // bits_per_sample
    assert(r16.getLong(9) === 8192L) // data_bytes = 4096 samples · 2
    val rst = all.filter(_.getString(0) == "duet_s8").head
    assert(rst.getLong(4) === 2L) // stereo
    assert(rst.getLong(7) === 2L) // block_align = 2·8/8
    assert(rst.getLong(9) === 4096L) // 2048 sample frames · 2 ch
    val r24 = all.filter(_.getString(0) == "organ_24").head
    assert(r24.getLong(8) === 24L) // declared 24-bit — parses here
    val r = all.filter(_.getString(0) == "dialog_h_w")
    val row = r.head
    assert(row.getLong(1) === 36L + 4096L) // riff_bytes
    assert(row.getLong(2) === 16L) // fmt_bytes (canonical PCM)
    assert(row.getLong(3) === 1L) // audio_format = PCM
    assert(row.getLong(4) === 1L) // mono
    assert(row.getLong(5) === 8000L) // sample_rate
    assert(row.getLong(6) === 8000L) // byte_rate = sr*ch*bps/8
    assert(row.getLong(7) === 1L) // block_align
    assert(row.getLong(8) === 8L) // bits_per_sample
    assert(row.getLong(9) === 4096L) // data_bytes
    assert(row.getLong(10) === 512L) // duration_ms = 1000*4096/8000
  }

  test("AVI header parse matches the planted canonical fixture") {
    val all = AdsbQueries.defs("mm16_avi_header")(spark, "unused").collect()
    // every bundled avi parses: the canonical twin, the round-11
    // non-canonical vid_junk (strl + JUNK + odd frames + idx1), the
    // round-12 walked-header pair (JUNK before hdrl; interleaved
    // movi with a strl-padded hdrl), and the round-13 pair (16-bit
    // stereo audio; the >4096-sub-chunk movi — whose HEADER still
    // reads fine)
    assert(all.map(_.getString(0)).toSet ===
      Set("vid_scene_a", "vid_junk", "vid_pre", "vid_mix", "vid_talk",
        "vid_scene_b", "vid_duet", "vid_wall", "vid_mj", "vid_mj_raw",
        "vid_duet_c", "vid_h264"))
    // round-15: the H264 container's header reads as declared; its
    // frames never reach any raw family (codec-rejected, visibly)
    val h264 = all.filter(_.getString(0) == "vid_h264").head
    assert(h264.getLong(2) === 41708L)
    assert(h264.getLong(3) === 2L)
    assert(h264.getLong(5) === 8L)
    val r = all.filter(_.getString(0) == "vid_scene_a")
    val row = r.head
    assert(row.getLong(2) === 40000L) // us_per_frame (25 fps)
    assert(row.getLong(3) === 16L) // total_frames = vid_scene's
    assert(row.getLong(4) === 1L) // n_streams
    assert(row.getLong(5) === 16L) // width
    assert(row.getLong(6) === 16L) // height
    assert(row.getLong(7) === 25000L) // fps_milli = 1e9/40000
    assert(row.getLong(8) === 640L) // duration_ms = 40000*16/1000
  }

  test("curation audit: every planted rejection fires with its reason") {
    val rows = AdsbQueries.defs("mm17_curation_audit")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getBoolean(3), r.getString(4)))
      .toMap
    // the planted rejects, each through a DIFFERENT gate
    assert(rows(("audio", "quiet_f")) === ((false, "mostly_silent")))
    assert(rows(("audio", "speech_g")) === ((false, "mostly_silent")))
    assert(rows(("video", "vid_a_cut")) === ((false, "contained_dup")))
    assert(rows(("video", "vid_scene_a")) === ((false, "exact_dup")))
    // the survivors: real signals, varied images, original videos
    // (incl. the round-12 walked-header fixtures — unique content,
    // so the dedup gate must admit them)
    Seq(("audio", "dialog_h"), ("audio", "dialog_h_w"), ("image", "A1"),
      ("video", "vid_a"), ("video", "vid_scene"), ("video", "vid_pre"),
      ("video", "vid_mix"), ("video", "vid_talk"),
      ("video", "vid_scene_b"), ("audio", "vid_talk")).foreach { k =>
      assert(rows(k) === ((true, "ok")), k)
    }
    // the interleaved fixture's 30-byte audio stream: demuxed (one
    // row per media stream, video AND audio for the same container),
    // visibly rejected as too short — never hidden
    assert(rows(("audio", "vid_mix")) === ((false, "too_short")))
    // admitted is the reason predicate, never independent state
    rows.values.foreach { case (adm, r) => assert(adm === (r == "ok")) }
  }

  test("mm19: the re-encoded twin is invisible to sums, 0 to the phash") {
    // vid_scene_b = vid_scene_a with two OFF-SAMPLE-GRID pixels
    // perturbed per frame: every frame byte-sum changes, so the
    // mm15 sum-signature dedup reads the pair as weakly related
    // (containment well under the dup threshold) — while the
    // perceptual frame hash is bit-identical, so mm19 finds all 16
    // frames at hamming 0 in vid_scene_a. THE reason frame-level
    // perceptual hashing exists.
    val sums = AdsbQueries.defs("mm15_video_neardup")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    val contB = sums.getOrElse(("vid_scene_a", "vid_scene_b"), 0L)
    assert(contB < 500000L, s"sum containment should be weak: $contB")
    val ph = AdsbQueries.defs("mm19_frame_phash")(spark, "unused")
      .collect()
      .filter(_.getString(0) == "vid_scene_b")
      .map(r => (r.getLong(1), r.getString(4), r.getLong(5)))
    assert(ph.length === 16)
    ph.foreach { case (fi, nn, ham) =>
      assert(ham === 0L, s"frame $fi")
      assert(nn.startsWith("vid_scene_a#"), s"frame $fi nn $nn")
    }
    // and the off-dims vid_mix frames are EXCLUDED from hashing
    // (frame 2 is 17 B vs the declared 6x3) — visible via the gap
    val mix = AdsbQueries.defs("mm19_frame_phash")(spark, "unused")
      .collect().filter(_.getString(0) == "vid_mix").map(_.getLong(1))
    assert(mix.sorted.toSeq === Seq(0L, 1L, 3L))
  }

  test("mm21: segment contours match across containers and bit depths") {
    // round-13: dialog_h's three bursts (lengths 12/16/10) must find
    // their twins inside dialog_h_w (same bytes behind a RIFF
    // header) and dialog_h_16 (same signal at 16-bit) at hamming 0 —
    // segment-grain dedup composed on top of the canonicalization;
    // ties at 0 break to the smallest (model rank, seg) key, which
    // is dialog_h_16 for dialog_h and dialog_h for the other two.
    // The flat-contour bursts separate by LENGTH CLASS (fp_hi), so
    // three same-blob flat bursts never collapse into one.
    val rows = AdsbQueries.defs("mm21_segment_neardup")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(4), r.getLong(5)))
      .toMap
    (1L to 3L).foreach { i =>
      assert(rows(("dialog_h", i)) === ((s"dialog_h_16#$i", 0L)), s"s$i")
      assert(rows(("dialog_h_w", i)) === ((s"dialog_h#$i", 0L)), s"w$i")
      assert(rows(("dialog_h_16", i)) === ((s"dialog_h#$i", 0L)), s"x$i")
    }
    // perturbed whole-blob dups still pair at 0 at the segment grain
    assert(rows(("sweep_d", 1L)) === (("sweep_d_dup#1", 0L)))
    assert(rows(("tone_a", 1L)) === (("tone_a_dup#1", 0L)))
    // unrelated contours stay far
    assert(rows(("noise_c", 1L))._2 > 8)
  }

  test("mm19: MJPEG frames decode onto the raw twin's exact hashes") {
    // round-14 (VERDICT r13 ask #1): vid_mj's 00dc chunks are whole
    // JPEGs — encodes of vid_mj_raw's 00db frames pixel for pixel.
    // The in-engine decode (ImageIo, the mm5 path) must land every
    // frame's 8×8 aHash EXACTLY on the raw twin's byte-derived hash:
    // each of the 8 frames finds its twin frame at hamming 0, both
    // directions. The quadrant fixtures are ±96 gray levels from any
    // possible mean, so a drifting decoder fails LOUDLY, never by
    // luck.
    val ph = AdsbQueries.defs("mm19_frame_phash")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(4), r.getLong(5)))
      .toMap
    (0L until 8L).foreach { f =>
      assert(ph(("vid_mj", f)) === ((s"vid_mj_raw#$f", 0L)), s"mj $f")
      assert(ph(("vid_mj_raw", f)) === ((s"vid_mj#$f", 0L)), s"raw $f")
    }
    // the compressed byte sums share NOTHING with the raw twin: the
    // pair is invisible to mm15's sum signatures (the vid_scene_b
    // story at the codec grain) — which is exactly why the decoded
    // perceptual hash has to exist
    val sums = AdsbQueries.defs("mm15_video_neardup")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    assert(!sums.contains(("vid_mj", "vid_mj_raw")))
    // and the MJPEG container flows through the whole video family:
    // mm8 samples its frames at the demuxed 00dc offsets
    val mm8 = AdsbQueries.defs("mm8_frame_sample")(spark, "unused")
      .collect().filter(_.getString(0) == "vid_mj").map(_.getLong(2))
    assert(mm8.sorted.toSeq === Seq(0L, 4L))
  }

  test("mm20: the shot medoid is the perceptually central frame") {
    // round-13 (stretch): composes mm10's shots with mm19's frame
    // hashes. vid_scene_a's planted cut at frame 8 yields two
    // 8-frame shots whose medoid argmin must pick the earliest
    // frame of each (ties inside near-uniform shots break to the
    // smallest index), and the re-encoded twin — hash-identical by
    // construction — must produce the SAME medoid table; hash-less
    // off-dims frames (vid_mix frame 2) neither vote nor win
    val rows = AdsbQueries.defs("mm20_shot_medoids")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows(("vid_scene_a", 0L))._1 === 0L)
    assert(rows(("vid_scene_a", 1L))._1 === 8L)
    assert(rows(("vid_scene_a", 0L))._3 === 8L) // 8 hashed members
    assert(rows(("vid_scene_b", 0L)) === rows(("vid_scene_a", 0L)))
    assert(rows(("vid_scene_b", 1L)) === rows(("vid_scene_a", 1L)))
    // vid_mix: 5 frames, frame 2 off-dims → only 3 voters in shot 0
    assert(rows(("vid_mix", 0L))._3 === 3L)
    // gvid-only videos carry no frame hashes — no medoid rows
    assert(!rows.keys.exists(_._1 == "vid_a"))
  }

  test("mm22: every planted container-pair class lands its verdict") {
    // round-14 (stretch): the verdict table composing mm19's frame
    // hashes with mm21's segment fingerprints — each planted pair
    // must land in ITS class, through a different modality pattern
    val rows = AdsbQueries.defs("mm22_container_dup")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(6))
      .toMap
    // byte-identical re-upload: both legs agree
    assert(rows(("vid_duet", "vid_duet_c")) === "full_dup")
    // codec twins: identical decoded frames, no audio stream at all
    assert(rows(("vid_mj", "vid_mj_raw")) === "video_only_dup")
    // the dialog trio: same speech through three containers / bit
    // depths — audio-only containers, so the video leg stays empty
    assert(rows(("dialog_h", "dialog_h_16")) === "audio_only_dup")
    assert(rows(("dialog_h", "dialog_h_w")) === "audio_only_dup")
    assert(rows(("dialog_h_16", "dialog_h_w")) === "audio_only_dup")
    // perturbed whole-blob audio dups classify at the segment grain
    assert(rows(("sweep_d", "sweep_d_dup")) === "audio_only_dup")
    // no pair may claim a modality neither container carries
    val full = AdsbQueries.defs("mm22_container_dup")(spark, "unused")
      .collect()
    full.foreach { r =>
      if (r.getString(6) == "full_dup")
        assert(r.getLong(2) > 0 && r.getLong(4) > 0, r.toString)
    }
  }

  test("AVI demux: the container twin segments IDENTICALLY to the gvid") {
    // vid_scene_a carries vid_scene's exact frames behind RIFF/AVI
    // chunk headers — the strided demux must reproduce the boundary
    // lattice row for row (energies, deltas, threshold, flags)
    val rows = AdsbQueries.defs("mm10_shot_boundaries")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val gvid = rows.collect { case ((m, f), v) if m == "vid_scene" => f -> v }
    val avi = rows.collect { case ((m, f), v) if m == "vid_scene_a" => f -> v }
    assert(gvid.nonEmpty)
    assert(avi.toMap === gvid.toMap)
    // and the keyframe picks agree shot for shot
    val kf = AdsbQueries.defs("mm12_keyframes")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val g = kf.collect { case ((m, sid), v) if m == "vid_scene" => sid -> v }
    val a = kf.collect { case ((m, sid), v) if m == "vid_scene_a" => sid -> v }
    assert(g.nonEmpty)
    assert(a.toMap === g.toMap)
  }
}
