package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.adsb.Meta
import graft.operators.MediaSignals
import graft.queries.AdsbQueries

/** Round-15 (VERDICT r14 stretch #7): the ONLINE container-dup
  * verdict leg must equal the at-rest mm22 table — a store built
  * without two containers, plus those two streamed through
  * `MediaStream.startDupVerdicts`, must emit exactly the mm22 rows
  * involving them for the full corpus (same signals, same hot sets,
  * same cuts). */
class StreamDupVerdictSpec extends SparkSpec {

  import spark.implicits._

  test("streamed verdicts equal the at-rest mm22 rows for the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    // one video-dup container (both modality legs: vid_duet_c is the
    // byte re-upload of vid_duet) and one audio-dup wav (the 16-bit
    // twin of dialog_h)
    val replayed = Set("vid_duet_c", "dialog_h_16")
    val store = Files.createTempDirectory("dupverdict-store")
      .resolve("sig").toString
    MediaSignals.build(spark, store,
      AdsbQueries.frameHashesOf(
        Meta.loadMediaFiles(spark, Meta.mediaDir(), "avi"))
        .where(!col("model").isin(replayed.toSeq: _*)),
      AdsbQueries.audioSegFingerprints(spark)
        .where(!col("model").isin(replayed.toSeq: _*)))

    def fixture(n: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/meta/media/$n")
      val b = in.readAllBytes(); in.close(); b
    }
    val in = MemoryStream[(String, Array[Byte], Timestamp)]
    val media = in.toDF().toDF("media_id", "content", "ingest_ts")
    val outDir = Files.createTempDirectory("dupverdict-out").toString
    val ckpt = Files.createTempDirectory("dupverdict-ckpt").toString
    val q = MediaStream.startDupVerdicts(media, store, outDir, ckpt)
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    in.addData(Seq(
      ("vid_duet_c", fixture("vid_duet_c.avi"), t0),
      ("dialog_h_16", fixture("dialog_h_16.wav"), t0)))
    q.processAllAvailable()
    q.stop()

    def rowSet(df: org.apache.spark.sql.DataFrame) = df
      .select("model_a", "model_b", "v_shared", "v_cont_ppm",
        "a_shared", "a_cont_ppm", "verdict")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6)))
      .toSet
    val streamed = rowSet(spark.read.parquet(s"$outDir/batch_id=0"))
    val expected = rowSet(
      AdsbQueries.defs("mm22_container_dup")(spark, "unused")
        .where(col("model_a").isin(replayed.toSeq: _*) ||
          col("model_b").isin(replayed.toSeq: _*)))
    assert(streamed === expected,
      s"streamed=$streamed\nexpected=$expected")
    // the planted classes surface ONLINE: the byte re-upload is a
    // full dup, the 16-bit twin an audio-only dup
    assert(streamed.exists(r => r._1 == "vid_duet" &&
      r._2 == "vid_duet_c" && r._7 == "full_dup"))
    assert(streamed.exists(r => r._2 == "dialog_h_16" &&
      r._7 == "audio_only_dup"))
  }
}
