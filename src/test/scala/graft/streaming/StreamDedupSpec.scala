package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming ingest dedup: re-delivered copies of the same message
  * (socket reconnect replays) collapse to one row, with state bounded
  * by the watermark delay rather than the stream lifetime. */
class StreamDedupSpec extends SparkSpec {

  import spark.implicits._

  test("ingest with dedupReplays collapses a full socket re-delivery") {
    implicit val sqlCtx = spark.sqlContext
    val lines = MemoryStream[String]
    val outDir = Files.createTempDirectory("graft-dedup-e2e").toString
    val ckpt = Files.createTempDirectory("graft-dedup-e2e-ckpt").toString
    val raw = graft.adsb.Sbs.fixtureLines(spark, "adsb_message_stream.txt")
      .select("value").as[String].collect().toSeq
    val q = AdsbStream.start(lines.toDF(), outDir, ckpt,
      dedupReplays = true)
    lines.addData(raw)
    q.processAllAvailable()
    lines.addData(raw) // reconnect replays the whole capture
    q.processAllAvailable()
    q.stop()

    // the capture spans <2 s, far inside the watermark delay, so every
    // re-delivered row is still in dedup state → output equals the
    // single-delivery batch replay
    val batchPositions = graft.adsb.AdsbPipeline
      .replayFixture(spark, "adsb_message_stream.txt")
      .toDF().where("kind = 'position'").count()
    val got = spark.read.parquet(s"$outDir/positions").count()
    assert(got === batchPositions)
  }

  test("retransmitted rows within the watermark dedup to one output") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp, Int)]
    val df = in.toDF().toDF("hexident", "gen_ts", "ttype")
      .withWatermark("gen_ts", "10 seconds")

    val deduped = StreamDedup.withinWatermark(df,
      Seq("hexident", "gen_ts", "ttype"))

    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    val t0 = java.sql.Timestamp.valueOf("2019-10-20 11:00:00")
    val t1 = java.sql.Timestamp.valueOf("2019-10-20 11:00:01")
    // batch 1: original delivery (one dup inside the same batch)
    in.addData(("ABC123", t0, 3), ("ABC123", t0, 3), ("DEF456", t1, 2))
    q.processAllAvailable()
    // batch 2: socket reconnect re-delivers batch 1 plus one new row
    val t2 = java.sql.Timestamp.valueOf("2019-10-20 11:00:02")
    in.addData(("ABC123", t0, 3), ("DEF456", t1, 2), ("ABC123", t2, 3))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out")
    assert(out.count() === 3) // two originals + the one new row
    assert(out.where(col("hexident") === "ABC123").count() === 2)
  }
}
