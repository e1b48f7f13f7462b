package graft.operators

import graft.SparkSpec
import graft.queries.AdsbQueries

/** mm18 (round-11): the declared-vs-derived container audit — one row
  * per RIFF blob INCLUDING structural rejects, with the planted
  * lying-header fixture failing exactly its one check. */
class ContainerAuditSpec extends SparkSpec {

  test("claim_j fails exactly the rate check; everything else passes") {
    // (structure, riff_size, rate, payload, demux_complete,
    //  codec_reason, consistent)
    val rows = AdsbQueries.defs("mm18_container_audit")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getBoolean(7), r.getBoolean(9)),
          r.getString(8)))
      .toMap
    def checks(k: (String, String)) = rows(k)._1
    def reason(k: (String, String)) = rows(k)._2
    // one row per bundled RIFF container
    assert(rows.keySet === Set(
      ("wav", "dialog_h_w"), ("wav", "chant_i"), ("wav", "claim_j"),
      ("wav", "dialog_h_16"), ("wav", "duet_s8"), ("wav", "organ_24"),
      ("wav", "hymn_x"), ("wav", "phone_u"), ("wav", "fax_a"),
      ("wav", "bell_r64"), ("wav", "flute_f32"), ("wav", "talk_mp3"),
      ("avi", "vid_scene_a"), ("avi", "vid_junk"), ("avi", "vid_pre"),
      ("avi", "vid_mix"), ("avi", "vid_talk"), ("avi", "vid_scene_b"),
      ("avi", "vid_duet"), ("avi", "vid_wall"),
      ("avi", "vid_mj"), ("avi", "vid_mj_raw"),
      ("avi", "vid_duet_c"), ("avi", "vid_h264")))
    // the lying byte_rate: structure fine, size fine, payload fine,
    // rate WRONG, consistent false
    assert(checks(("wav", "claim_j")) ===
      ((true, true, false, true, true, false)))
    // the interleaved fixture's two off-dims frames (17 B, 11 B vs
    // the declared 6x3): structurally valid and complete, but the
    // per-frame dims check flags it — visible, never hidden
    assert(checks(("avi", "vid_mix")) ===
      ((true, true, false, true, true, false)))
    // round-13 (ADVICE r12 #1): the 4102-sub-chunk movi hits the
    // 4096 walk cap — every per-chunk check that DID run passes, but
    // the walk cannot attest it saw every chunk: demux_complete
    // false, consistent false. The audit never reads a truncated
    // list as "the chunks".
    assert(checks(("avi", "vid_wall")) ===
      ((true, true, true, true, false, false)))
    // round-15 (VERDICT r14 ask #4): the codec column NAMES what the
    // fail-closed gates reject. talk_mp3 is structurally CONSISTENT
    // (codec rejection is a different axis than header honesty);
    // vid_h264's declared frames are honestly not demuxable as raw
    // (payload_ok false) and its reason is the named 'h264' class.
    assert(checks(("wav", "talk_mp3")) ===
      ((true, true, true, true, true, true)))
    assert(reason(("wav", "talk_mp3")) === "mp3_layer3")
    assert(checks(("avi", "vid_h264")) ===
      ((true, true, true, false, true, false)))
    assert(reason(("avi", "vid_h264")) === "h264")
    // a codec the engine decodes at an unsupported layout says so
    assert(reason(("wav", "organ_24")) === "unsupported_layout")
    // everything decodable — including MJPG — reads 'ok'
    (rows.keySet -- Set(("wav", "talk_mp3"), ("wav", "organ_24"),
      ("avi", "vid_h264")))
      .foreach(k => assert(reason(k) === "ok", k.toString))
    // every honestly-built fixture is fully consistent — including
    // the round-13 16-bit/stereo/24-bit wavs (rate_ok's
    // block_align = channels·bits/8 identity covers all three)
    (rows.keySet -- Set(("wav", "claim_j"), ("avi", "vid_mix"),
      ("avi", "vid_wall"), ("avi", "vid_h264")))
      .foreach { k =>
        assert(checks(k) === ((true, true, true, true, true, true)),
          k.toString)
      }
  }

  test("a malformed container stays VISIBLE as a failing audit row") {
    // mm17's principle at the container grain: an audit that hides
    // its failures is not an audit — a truncated wav must appear
    // with structure_ok = false, not vanish. (Constructed via the
    // same loader path on a temp dir.)
    val good = {
      val in = getClass.getResourceAsStream("/meta/media/dialog_h_w.wav")
      val b = in.readAllBytes(); in.close(); b
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-audit")
    java.nio.file.Files.write(dir.resolve("cut.wav"), good.take(30))
    // truncated PAYLOAD (round-11 review): the data chunk declares
    // its full size but the blob ends early — structure parses,
    // wav_fits must go false, and the analysis parser must EXCLUDE
    // it (admitting it would feed a declared-length lattice over
    // missing bytes)
    java.nio.file.Files.write(dir.resolve("shear.wav"), good.take(1000))
    import org.apache.spark.sql.functions._
    val w = graft.functions.Riff.withWavColumns(
      graft.adsb.Meta.loadMediaFiles(spark, dir.toString, "wav"))
      .select(col("model"), col("wav_ok"), col("wav_fits")).collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2)))
      .toMap
    assert(w("cut") === ((false, false)))
    assert(w("shear") === ((true, false)))
    val admitted = AdsbQueries.wavParsed(spark, dir.toString)
      .select("model").collect()
    assert(admitted.isEmpty,
      "neither truncated container may reach the analysis corpus")
  }
}
