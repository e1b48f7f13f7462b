package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-binned event histograms with gap fill.
  *
  * Re-expresses the reference's `events_histogram` /
  * `landings_histogram` / `takeoffs_histogram` SQL functions
  * (dump1090-postgis `database/sql/create_public_schema.sql:182-197`,
  * `:289-307`, `:484-499`) as Spark plans: a generated bin spine
  * LEFT-OUTER-joined to a pre-aggregated per-bin count, so empty bins
  * surface as NULL rows exactly like the reference's `generate_series`
  * LEFT OUTER JOIN.
  *
  * Scale design:
  *  - the per-bin aggregation is a map-side-combinable `groupBy` on the
  *    truncated time (partial aggregation before the shuffle), keyed by
  *    bin — the natural partitioning for the result;
  *  - the spine is tiny (#bins rows) and generated on the fly; the
  *    aggregated side is ≤ #bins groups, so the gap-fill join is a
  *    broadcast hash join with no extra shuffle;
  *  - only `timeCol`/`idCol` are read, so parquet column pruning and
  *    (with a time predicate) row-group skipping apply.
  */
object Histogram {

  /** One row per bin timestamp in [start, end + endExtensionHours],
    * step = 1 `bin`. `start`/`end` are naive timestamps interpreted in
    * `tz` (UTC when None), mirroring `generate_series(date_trunc(bin,
    * from), date_trunc(bin, ends + interval '23 hours'), '1 bin')` —
    * the reference extends the spine end by 23 h
    * (`create_public_schema.sql:189`) so a date-typed `ends` still
    * covers its final day's hour bins. Output column: `datetime`
    * (TimestampType, session UTC). */
  def binSpine(base: DataFrame, start: String, end: String, bin: String,
      endExtensionHours: Int): DataFrame =
    base.sparkSession.range(1).select(
      explode(sequence(
        date_trunc(bin, lit(start).cast("timestamp")),
        date_trunc(bin, lit(end).cast("timestamp") +
          expr(s"interval $endExtensionHours hours")),
        expr(s"interval 1 $bin"))).as("datetime"))

  /** Gap-filled histogram: (datetime, events, ids) where `events` is
    * NULL (not 0) in empty bins and `ids` is the sorted, comma-joined
    * id list (`array_agg(flight_id)` analog made deterministic).
    * Parity note: like the reference's `array_agg`, per-bin `ids`
    * state is unbounded in the bin's event count — at 100 TB callers
    * that don't need the full id list should set `maxIdsPerBin`,
    * which bounds the per-bin AGGREGATION STATE (a windowed min-k
    * prune before any list is built, not a post-hoc slice) as well
    * as the emitted list, keeping the k smallest ids per bin.
    *
    * Scan pruning is the CALLER's job: the range filter here sits on
    * the derived (truncated, possibly tz-shifted) bin time, which can
    * never reach the parquet scan — it exists for exactness, not
    * pruning. Pass a pre-ranged frame (`Tables.eventsRanged` with the
    * UTC superset of the bin range — tz callers widen ±1 day exactly
    * as q5 does) so row-group skipping happens below this operator;
    * the composition stays correct because the agg-side predicate
    * re-applies the exact bound.
    *
    * When `tz` is set, bins are computed on local wall-clock time and
    * labelled by the local bin start expressed back in UTC — the double
    * `AT TIME ZONE` round-trip of `create_public_schema.sql:289-307`.
    *
    * `endExtensionHours` defaults to the reference's `+ interval '23
    * hours'` spine extension (`create_public_schema.sql:189`): a
    * day-granularity `end` still covers its final day's hour bins.
    * Pass 0 for an exact [start, end] spine.
    */
  def eventsHistogram(
      events: DataFrame,
      timeCol: Column,
      idCol: Column,
      start: String,
      end: String,
      bin: String,
      tz: Option[String] = None,
      endExtensionHours: Int = 23,
      maxIdsPerBin: Option[Int] = None): DataFrame = {

    def toLocal(c: Column): Column =
      tz.fold(c)(z => from_utc_timestamp(c, z))
    def toUtc(c: Column): Column =
      tz.fold(c)(z => to_utc_timestamp(c, z))

    val spine = binSpine(events, start, end, bin, endExtensionHours)
    val base = events
      .select(
        date_trunc(bin, toLocal(timeCol.cast("timestamp"))).as("bin_time"),
        idCol.as("id"))
      .where(col("bin_time").between(
        date_trunc(bin, lit(start).cast("timestamp")),
        date_trunc(bin, lit(end).cast("timestamp") +
          expr(s"interval $endExtensionHours hours"))))
    val agg = maxIdsPerBin match {
      case None =>
        base.groupBy(col("bin_time"))
          .agg(count(col("id")).as("events"),
            array_join(sort_array(collect_list(col("id"))), ",").as("ids"))
      case Some(k) =>
        // the cap must bound the AGGREGATION STATE, not just the
        // emitted string — slice(sort_array(collect_list), 1, k)
        // would still hold and shuffle every id per bin (review
        // finding, round 8). A per-bin row_number keeps only the k
        // smallest ids BEFORE any list is built (sort spill, bounded
        // memory), and the count agg rides the window's bin
        // partitioning — no extra exchange.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("bin_time")).orderBy(col("id"))
        val counts = base.groupBy(col("bin_time"))
          .agg(count(col("id")).as("events"))
        val topK = base
          .withColumn("_rn", row_number().over(w))
          .where(col("_rn") <= k)
          .groupBy(col("bin_time"))
          .agg(array_join(sort_array(collect_list(col("id"))), ",")
            .as("ids"))
        counts.join(topK, Seq("bin_time"))
    }

    spine
      .join(broadcast(agg), spine("datetime") === agg("bin_time"), "left_outer")
      .select(
        toUtc(spine("datetime")).cast("timestamp_ntz").as("datetime"),
        col("events"),
        col("ids"))
      .orderBy("datetime")
  }

  /** Plain bin+count histogram without gap fill — `landings_hist_on`
    * (`create_public_schema.sql:264-273`). */
  def simpleHistogram(events: DataFrame, timeCol: Column, bin: String): DataFrame =
    events
      .select(date_trunc(bin, timeCol.cast("timestamp")).as("bin_time"))
      .groupBy(col("bin_time"))
      .agg(count(lit(1)).as("events"))
      .select(col("bin_time").cast("timestamp_ntz").as("datetime"), col("events"))
      .orderBy("datetime")

  /** Half-open local-date range slice [fromDate, toDate) evaluated in
    * `tz` — `landings_fromto` (`create_materialized_views.sql:3-46`). */
  def localDateRange(timeCol: Column, fromDate: String, toDate: String, tz: String): Column = {
    val local = from_utc_timestamp(timeCol.cast("timestamp"), tz)
    local >= lit(fromDate).cast("timestamp") && local < lit(toDate).cast("timestamp")
  }

  /** Single-day slice [day, day+1) in UTC — `landings_on`
    * (`create_public_schema.sql:331-339`). */
  def onDay(timeCol: Column, day: String): Column = {
    val t = timeCol.cast("timestamp")
    t >= lit(day).cast("timestamp") &&
      t < lit(day).cast("timestamp") + expr("interval 1 day")
  }
}
