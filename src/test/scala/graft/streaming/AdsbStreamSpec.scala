package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.adsb.{AdsbPipeline, Sbs}

/** Streaming/batch agreement: replaying the reference capture through
  * the `flatMapGroupsWithState` operator must produce the same rows as
  * the batch fold (they share the state machine; this pins the
  * micro-batch plumbing — incremental folds, state carry-over,
  * event-time timeouts). */
class AdsbStreamSpec extends SparkSpec {

  import spark.implicits._

  test("streaming replay equals batch replay (3 micro-batches)") {
    val msgs = Sbs.messages(
      Sbs.fixtureLines(spark, "adsb_message_stream.txt"))
      .collect().sortBy(_.seq)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[graft.adsb.AdsbMsg]
    val out = AdsbStream.sessionize(stream.toDS())
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = out.writeStream
      .format("memory").queryName("adsb_stream_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    msgs.grouped(700).foreach(b => stream.addData(b.toSeq))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("adsb_stream_out")
    val batch = AdsbPipeline.replayFixture(spark, "adsb_message_stream.txt")

    // Open sessions at end-of-stream have no flight row in streaming
    // (the watermark never passes their timeout), so compare positions
    // and events exactly, and flights as a subset.
    def key(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "kind", "hexident", "cast(session_start as string)",
      "cast(time as string)", "lon", "lat", "alt_m", "runway")

    val sPos = key(streamed.where("kind != 'flight'").toDF())
    val bPos = key(batch.toDF().where("kind != 'flight'"))
    assert(sPos.exceptAll(bPos).count() === 0)
    assert(bPos.exceptAll(sPos).count() === 0)

    val sFl = key(streamed.where("kind = 'flight'").toDF())
    val bFl = key(batch.toDF().where("kind = 'flight'"))
    assert(sFl.exceptAll(bFl).count() === 0)
  }
}
