package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Generic Structured Streaming surface: file-stream → watermark →
  * tumbling-window aggregation must equal the same aggregation run in
  * batch (closed windows only). */
class WindowedAggSpec extends SparkSpec {

  test("streaming tumbling-window counts equal batch counts") {
    // stage events as a ntz-timestamp parquet drop-dir (the raw table
    // carries ns timestamps Spark can't stream-read directly)
    val dir = Files.createTempDirectory("graft-winagg").toString
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
    ev.write.mode("overwrite").parquet(s"$dir/in")

    val schema = spark.read.parquet(s"$dir/in").schema
    val streamed = spark.readStream.schema(schema).parquet(s"$dir/in")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val ckpt = Files.createTempDirectory("graft-winagg-ckpt").toString
    val q = streamed.writeStream
      .format("memory").queryName("win_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("win_out")
      .select(col("window.start").as("w"), col("event_type"), col("n"))
    val batch = ev
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("event_type"), col("n"))

    // append mode only emits windows closed by the final watermark:
    // everything strictly before max(ts) - 1h - 6h is surely present.
    val horizon = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val cutoff = new java.sql.Timestamp(
      horizon.getTime - (7L * 3600 * 1000))
    val gotC = got.where(col("w") < cutoff)
    val batC = batch.where(col("w") < cutoff)
    assert(batC.count() > 0)
    assert(gotC.exceptAll(batC).count() === 0)
    assert(batC.exceptAll(gotC).count() === 0)
  }
}
