package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Anomaly

/** Streaming hygiene for the event stream: the batch gates applied at
  * ingest, before rows reach the feature store.
  */
object EventStream {

  /** Stateless quarantine gate: every incoming event is tested with
    * [[Anomaly.flag]] against STATIC reference stats (a snapshot of
    * [[Anomaly.referenceStats]] over the at-rest corpus — the
    * re-snapshot-between-runs convention `startDriftMonitor` and
    * `curateIncremental` use), and the rows that FAIL land in
    * `outDir` — the quarantine channel an operator reviews while the
    * clean stream flows on unimpeded.
    *
    * Scale shape: select + broadcast-join + filter only — ZERO
    * streaming state (no watermark, no aggregation buffers), so
    * throughput is the stateless-projection ceiling and the query
    * recovers from any crash by replaying the source offsets
    * (append-mode parquet sink = exactly-once per sink epoch).
    */
  def startQuarantine(events: DataFrame, refStats: DataFrame,
      outDir: String, checkpoint: String): StreamingQuery =
    Anomaly.flag(events, refStats)
      .where(col("is_anomaly")).drop("is_anomaly")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Streaming CUSUM rate monitor — [[graft.operators.Cusum]]'s alarm
    * at ingest: per micro-batch, each event type's row count extends
    * the cross-batch CUSUM S = max(0, S + (n − μ − σ/2)) against a
    * STATIC per-type volume profile `refStats` = (event_type, mu6,
    * sig6) (fixed-point micro-units, the [[Cusum]] convention — e.g.
    * a snapshot of batch-sized slices of the at-rest corpus), and an
    * epoch whose S exceeds 4σ lands an alarm row. The quarantine
    * gate above catches single poison VALUES; this catches sustained
    * VOLUME shifts (a stuck producer, a surge, a dead partition) that
    * no single row reveals.
    *
    * State discipline: the CUSUM pair (p6 = Σd, minp6 = min prefix)
    * is integer, per-type, and lives in `outDir/state/batch_id=N` —
    * each epoch reads the newest COMPLETED epoch's state below its
    * own id and OVERWRITEs its own directory, so a replayed epoch
    * recomputes from the same predecessor and lands byte-identical
    * (the `AnnStream`/`curateIncremental` idempotent-epoch
    * convention; nothing is double-applied). Alarms land the same
    * way under `alarms/batch_id=N` as (event_type, n_events, cusum,
    * flagged, cusum_low, flagged_low) — the monitor is TWO-SIDED:
    * the high side catches surges, the low side (the mirrored
    * recursion S⁻ = max(0, S⁻ + (μ − σ/2 − n))) catches sustained
    * volume DROPS. Types absent from a batch count 0 rows — silence
    * IS a volume signal (the dead-partition case), so every profiled
    * type gets a row every epoch and feeds the low side. State and
    * alarm size are |types| rows per epoch — metadata-sized,
    * bounded, and the whole fold is integer so replay, partitioning
    * and engine cannot drift it.
    */
  def startRateMonitor(events: DataFrame, refStats: DataFrame,
      outDir: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val prior = priorState(spark, s"$outDir/state", batchId)
        val counts = refStats.select(col("event_type"), col("mu6"),
            col("sig6"))
          .join(batch.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_events")),
            Seq("event_type"), "left")
          .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
        val next = counts
          .join(prior, Seq("event_type"), "left")
          .withColumn("d6", col("n_events") * 1000000L - col("mu6") -
            expr("sig6 div 2"))
          .withColumn("d6l", col("mu6") - expr("sig6 div 2") -
            col("n_events") * 1000000L)
          .withColumn("p6", coalesce(col("p6"), lit(0L)) + col("d6"))
          .withColumn("minp6",
            least(coalesce(col("minp6"), lit(0L)), col("p6")))
          .withColumn("s6", col("p6") - least(lit(0L), col("minp6")))
          .withColumn("p6l", coalesce(col("p6l"), lit(0L)) + col("d6l"))
          .withColumn("minp6l",
            least(coalesce(col("minp6l"), lit(0L)), col("p6l")))
          .withColumn("s6l", col("p6l") - least(lit(0L), col("minp6l")))
          .persist()
        try {
          next.select(col("event_type"), col("p6"), col("minp6"),
              col("p6l"), col("minp6l"))
            .write.mode("overwrite")
            .parquet(s"$outDir/state/batch_id=$batchId")
          next.select(col("event_type"), col("n_events"),
              round(col("s6").cast("double") / 1000000.0d, 6).as("cusum"),
              (col("s6") > lit(4L) * col("sig6")).as("flagged"),
              round(col("s6l").cast("double") / 1000000.0d, 6)
                .as("cusum_low"),
              (col("s6l") > lit(4L) * col("sig6")).as("flagged_low"))
            .write.mode("overwrite")
            .parquet(s"$outDir/alarms/batch_id=$batchId")
        } finally next.unpersist(blocking = false)
        ()
      }
      .start()

  /** The newest completed epoch's state strictly below `batchId`
    * (empty frame with the state schema when none exists — first
    * epoch, or a replay of it). */
  private def priorState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, batchId: Long): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids =
      if (!fs.exists(new org.apache.hadoop.fs.Path(stateDir))) Seq.empty
      else fs.listStatus(new org.apache.hadoop.fs.Path(stateDir)).toSeq
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("batch_id=") =>
          s.stripPrefix("batch_id=").toLong }
        .filter(_ < batchId)
    if (ids.isEmpty) {
      import spark.implicits._
      Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("event_type", "p6", "minp6", "p6l", "minp6l")
    } else
      spark.read.parquet(s"$stateDir/batch_id=${ids.max}")
  }
}
