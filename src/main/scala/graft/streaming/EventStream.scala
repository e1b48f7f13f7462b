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
}
