package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Anomaly

/** The streaming quarantine gate: outliers (by the batch-proven
  * integer z² predicate) land in quarantine, clean rows and rows of
  * unseen types do not, and replay delivers no duplicates.
  */
class EventStreamSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("quarantine gate matches the batch predicate and admits unseen types") {
    implicit val sqlCtx = spark.sqlContext
    // reference corpus: type a centered at 10.00 with one historic
    // spike wide enough that 1000.00 is the only >2σ point
    val ref = ((1 to 100).map(i => (i.toLong, "a", 10.0)) ++
      Seq((101L, "a", 1000.0)))
      .toDF("event_id", "event_type", "value")
    val stats = Anomaly.referenceStats(ref, col("event_type"), col("value"))

    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val outDir = Files.createTempDirectory("evt-quar").toString
    val ckpt = Files.createTempDirectory("evt-quar-ckpt").toString
    val q = EventStream.startQuarantine(events, stats, outDir, ckpt)

    val rows = Seq(
      (1L, ts("2024-03-01 10:00:00"), "a", 10.5), // clean
      (2L, ts("2024-03-01 10:00:01"), "a", 900.0), // outlier vs ref
      (3L, ts("2024-03-01 10:00:02"), "zz", 1e9), // unseen type → admit
      (4L, ts("2024-03-01 10:00:03"), "a", 9.5)) // clean
    in.addData(rows)
    q.processAllAvailable()
    q.stop()

    val flagged = spark.read.parquet(outDir)
      .select("event_id").as[Long].collect().toSet
    assert(flagged === Set(2L))

    // batch ≡ stream: the same rows through the batch operator flag
    // the same set
    val batchFlagged = Anomaly.flag(
        rows.toDF("event_id", "ts", "event_type", "value"), stats)
      .where(col("is_anomaly"))
      .select("event_id").as[Long].collect().toSet
    assert(batchFlagged === flagged)

    // restart on the same checkpoint with the same data already
    // committed → no duplicate quarantine rows
    val in2 = MemoryStream[(Long, Timestamp, String, Double)]
    in2.addData(rows)
    val q2 = EventStream.startQuarantine(
      in2.toDF().toDF("event_id", "ts", "event_type", "value"),
      stats, outDir, ckpt)
    q2.processAllAvailable()
    q2.stop()
    val after = spark.read.parquet(outDir)
      .select("event_id").as[Long].collect().toSet
    assert(after === Set(2L))
  }
}
