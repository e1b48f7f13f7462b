package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: points matched into [start, end] intervals.
  *
  * Not in the reference's SQL surface (SURVEY §2.5); the platform
  * primitive behind "events inside a flight session", "log lines
  * inside an incident window", "positions inside a time slice".
  *
  * Scale shape: Spark plans a raw `t BETWEEN start AND end` join as a
  * broadcast-nested-loop / per-key cross product. Binning makes it an
  * EQUI-join: both sides map to `binSec`-wide epoch bins — an interval
  * explodes to each bin it touches, a point lands in exactly one — so
  * the match runs as a hash join on (key, bin) with the exact bounds
  * as a residual filter. No duplicate elimination is needed: a point's
  * single bin meets each interval at most once. Pick `binSec` near the
  * typical interval length (fan-out stays O(1) per interval); heavily
  * mixed interval lengths warrant a two-tier bin.
  */
object RangeJoin {

  /** Rows of `points` joined to every `intervals` row of the same key
    * whose [startCol, endCol] contains the point's time (inclusive
    * both ends). Output carries all columns of both inputs — column
    * names must not collide across the two sides. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: String,
      intervalKey: String,
      pointTime: String,
      startCol: String,
      endCol: String,
      binSec: Long): DataFrame = {
    val binUs = binSec * 1000000L
    def binOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / binUs)

    val p = points.withColumn("__bin", binOf(col(pointTime)))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    p.join(i,
        p("__bin") === i("__bin") &&
          p(pointKey) === i(intervalKey) &&
          p(pointTime).cast("timestamp") >= i(startCol).cast("timestamp") &&
          p(pointTime).cast("timestamp") <= i(endCol).cast("timestamp"))
      .drop("__bin")
  }
}
