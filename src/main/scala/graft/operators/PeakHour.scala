package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding trailing-interval peak detection.
  *
  * Re-expresses `peak_hour_all/_landings/_takeoffs`
  * (dump1090-postgis `database/sql/create_public_schema.sql:346-468`):
  * inner query = per event, `COUNT(*) OVER (ORDER BY time RANGE BETWEEN
  * '1 hour' PRECEDING AND CURRENT ROW)` labelled at the window midpoint
  * minute; outer query = per local day, keep the row with the highest
  * count (latest wins ties), sorted by count desc.
  *
  * Scale design: a literal global RANGE window is a single-partition
  * sort — a non-starter at 100 TB. Because the frame only looks back
  * `windowSec`, the window is day-partitionable: each UTC day's rows
  * are processed together with a *replica* of the trailing `windowSec`
  * of the previous day ("borrowed" rows participate in frames but emit
  * no output). The plan then shuffles by day and sorts within
  * partitions — fully parallel, identical results.
  */
object PeakHour {

  /** Returns (peak_hour, events): the per-`tz`-local-day peak of the
    * trailing `windowSec` event count. `timeCol` must be castable to
    * timestamp; output `peak_hour` is TIMESTAMP_NTZ (UTC). */
  def peakHours(
      events: DataFrame,
      timeCol: Column,
      tz: String = "Europe/Paris",
      windowSec: Long = 3600L): DataFrame = {
    // the borrow replication reaches exactly ONE day back; a window
    // wider than a day would silently undercount early-day frames
    require(windowSec > 0 && windowSec <= 86400L,
      s"windowSec $windowSec out of (0, 86400] — multi-day windows " +
        "need multi-day borrow replication")

    val windowMicros = windowSec * 1000000L

    val ev = events.select(timeCol.cast("timestamp").as("time"))

    // Rows in the last windowSec of their UTC day also serve the next
    // day's frames: replicate them tagged as borrowed.
    val dayStart = date_trunc("DAY", col("time"))
    val own = ev.select(
      col("time"), to_date(col("time")).as("day"), lit(false).as("borrowed"))
    val borrowed = ev
      .where(unix_micros(col("time")) >=
        unix_micros(dayStart) + (86400L * 1000000L - windowMicros))
      .select(
        col("time"), date_add(to_date(col("time")), 1).as("day"),
        lit(true).as("borrowed"))

    val w = Window
      .partitionBy(col("day"))
      .orderBy(unix_micros(col("time")))
      .rangeBetween(-windowMicros, 0)

    val counted = own.unionByName(borrowed)
      .withColumn("events", count(lit(1)).over(w))
      .where(!col("borrowed"))
      .select(
        date_trunc("MINUTE",
          col("time") - expr(s"interval ${windowSec / 2} seconds"))
          .as("peak_hour"),
        col("events"))

    val perDay = Window
      .partitionBy(to_date(from_utc_timestamp(col("peak_hour"), tz)))
      .orderBy(col("events").desc, col("peak_hour").desc)

    counted
      .withColumn("rn", row_number().over(perDay))
      .where(col("rn") === 1)
      .select(col("peak_hour").cast("timestamp_ntz").as("peak_hour"), col("events"))
      .orderBy(col("events").desc, col("peak_hour").desc)
  }

  /** The reference's full `peak_hour_all(startdate, enddate)`
    * composition (`create_public_schema.sql:346-376`): UNION —
    * DISTINCT, per SQL `union` — of the landings and takeoffs streams,
    * bounded to `[localDayStart(start)+w/2, localDayStart(end)+w/2)`
    * where the day boundary is taken in `tz` and the half-window shift
    * mirrors the reference's fixed `'30 minutes'` (half its 1 h
    * window), then the per-local-day trailing-window peak.
    *
    * Both inputs must share a schema; `timeCol` names the event-time
    * column after the union. The union-distinct is one shuffle on the
    * projected row — project the inputs to the columns that define
    * event identity before calling. */
  def peakHoursAll(
      landings: DataFrame,
      takeoffs: DataFrame,
      timeCol: Column,
      startDate: String,
      endDate: String,
      tz: String = "Europe/Paris",
      windowSec: Long = 3600L): DataFrame = {
    val half = s"interval ${windowSec / 2} seconds"
    val lo = to_utc_timestamp(
      date_trunc("DAY", lit(startDate).cast("timestamp")), tz) + expr(half)
    val hi = to_utc_timestamp(
      date_trunc("DAY", lit(endDate).cast("timestamp")), tz) + expr(half)
    val unioned = landings.unionByName(takeoffs).distinct()
    peakHours(
      unioned.where(timeCol >= lo && timeCol < hi), timeCol, tz, windowSec)
  }
}
