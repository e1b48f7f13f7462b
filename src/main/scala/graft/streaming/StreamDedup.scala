package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication with bounded state.
  *
  * SBS-1 receivers retransmit: the same (hexident, gen_date_time,
  * transmission_type) line can arrive more than once when the socket
  * reconnects mid-capture (the reference re-processes such lines —
  * its dedup happens later in SQL, `database/sql/maintenance.sql:1-16`).
  * The streaming-native fix dedups at ingest with
  * `dropDuplicatesWithinWatermark`: per-key state is retained only
  * for the watermark delay, so state is bounded by the key arrival
  * rate × delay, not by the stream's lifetime — the property that
  * makes it safe on an unbounded 100 TB/day feed (a plain
  * `dropDuplicates` on a stream keeps ALL keys forever).
  */
object StreamDedup {

  /** Drop re-deliveries of the same `keys` arriving within the
    * watermark delay of the first copy. `df` must already carry a
    * watermark on its event-time column. */
  def withinWatermark(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(keys)
}
