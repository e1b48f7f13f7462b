package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join — the streaming twin of the q16/q17
  * attribution shapes: purchases join clicks of the same user within
  * a bounded look-back window. Both sides carry watermarks, and the
  * time-range join condition is what lets Spark expire join state —
  * unbounded-state stream joins don't survive an unbounded feed. */
class StreamStreamJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("purchases join clicks within a 10-minute look-back, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]

    val c = clicks.toDF().toDF("click_id", "c_user", "c_ts")
      .withWatermark("c_ts", "1 minute")
    val p = purchases.toDF().toDF("purchase_id", "p_user", "p_ts")
      .withWatermark("p_ts", "1 minute")

    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"))

    val ckpt = Files.createTempDirectory("graft-ssj-ckpt").toString
    val q = joined.writeStream
      .format("memory").queryName("ssj_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    clicks.addData((100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 10:20:00")),
      (102L, 2L, ts("2024-01-01 10:00:00")))
    purchases.addData((200L, 1L, ts("2024-01-01 10:05:00")), // ← click 100
      (201L, 1L, ts("2024-01-01 10:25:00")),                 // ← click 101
      (202L, 2L, ts("2024-01-01 10:30:00")),                 // 30 min gap: none
      (203L, 3L, ts("2024-01-01 10:05:00")))                 // no clicks at all
    q.processAllAvailable()
    q.stop()

    val out = spark.table("ssj_out")
      .select(col("purchase_id"), col("click_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((200L, 100L), (201L, 101L)))
  }
}
