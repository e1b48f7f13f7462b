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

  test("rate monitor: cross-batch CUSUM matches the sequential fold, surge flags, silence counts") {
    implicit val sqlCtx = spark.sqlContext
    // profile: type a expects ~10 rows/batch (σ≈2), type b ~5 (σ≈1)
    val ref = Seq(("a", 10000000L, 2000000L), ("b", 5000000L, 1000000L))
      .toDF("event_type", "mu6", "sig6")
    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val events = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val outDir = Files.createTempDirectory("evt-rate").toString
    val ckpt = Files.createTempDirectory("evt-rate-ckpt").toString
    val q = EventStream.startRateMonitor(events, ref, outDir, ckpt)

    // epochs: two in-profile, then an a-surge; b goes SILENT in the
    // surge epochs (the dead-partition case)
    val perEpoch = Seq(
      Seq.fill(10)("a") ++ Seq.fill(5)("b"),
      Seq.fill(11)("a") ++ Seq.fill(4)("b"),
      Seq.fill(30)("a"),
      Seq.fill(32)("a"))
    var id = 0L
    for (batch <- perEpoch) {
      in.addData(batch.map { t =>
        id += 1; (id, ts("2024-03-01 10:00:00"), t, 1.0)
      })
      q.processAllAvailable()
    }
    q.stop()

    // sequential reference: the same two-sided integer fold, in
    // plain Longs
    val mu = Map("a" -> 10000000L, "b" -> 5000000L)
    val sig = Map("a" -> 2000000L, "b" -> 1000000L)
    val expected = Seq("a", "b").flatMap { t =>
      var s = 0L
      var sl = 0L
      perEpoch.zipWithIndex.map { case (b, i) =>
        val n = b.count(_ == t).toLong
        s = math.max(0L, s + (n * 1000000L - mu(t) - sig(t) / 2))
        sl = math.max(0L, sl + (mu(t) - sig(t) / 2 - n * 1000000L))
        def r6(v: Long) = BigDecimal(v.toDouble / 1000000.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        ((t, i.toLong),
          (n, r6(s), s > 4 * sig(t), r6(sl), sl > 4 * sig(t)))
      }
    }.toMap

    val alarms = (0 until perEpoch.size).flatMap { i =>
      spark.read.parquet(s"$outDir/alarms/batch_id=$i")
        .collect().map(r => ((r.getString(0), i.toLong),
          (r.getLong(1), r.getDouble(2), r.getBoolean(3),
            r.getDouble(4), r.getBoolean(5))))
    }.toMap
    assert(alarms.keySet === expected.keySet,
      "every profiled type must report every epoch, silent ones included")
    for ((k, v) <- expected)
      assert(alarms(k) === v, s"epoch state at $k")

    // the a-surge fires the HIGH side when it starts, not before;
    // b's silence fires the LOW side (the dead-partition alarm)
    val aFlags = (0 until perEpoch.size)
      .map(i => alarms(("a", i.toLong))._3)
    assert(aFlags === Seq(false, false, true, true), s"high path $aFlags")
    val bLow = (0 until perEpoch.size)
      .map(i => alarms(("b", i.toLong))._5)
    assert(bLow === Seq(false, false, true, true), s"low path $bLow")
    assert(!(0 until perEpoch.size).exists(i => alarms(("b", i.toLong))._3),
      "b never surges")
  }
}
