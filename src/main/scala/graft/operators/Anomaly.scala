package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact population-outlier detection over a money-like value
  * column — the "drop corrupt datapoints" gate a training-data ingest
  * runs before rows join a feature store.
  *
  * Over fixed-point cents c with per-group n, S=Σc, Q=Σc², a point is
  * an outlier iff it sits strictly more than 2 population standard
  * deviations from the group mean:
  *
  *   z² > 4  ⇔  (n·c − S)² > 4·(n·Q − S²)
  *
  * — no sqrt, no float mean, so the decision boundary can never flip
  * across engines or partitionings, and a zero-variance group (the
  * right-hand side is 0) flags nothing under the strict inequality.
  * Interior products reach ~1e20 at sf0.1 and ~1e33 at petabyte row
  * counts — still inside decimal(38,0) (≡ HUGEINT in the DuckDB
  * oracle for `qq_value_anomaly`, which pins this arithmetic).
  *
  * Scale shape: [[referenceStats]] is one map-side-combinable pass;
  * the |groups|-row stats table broadcasts into [[flag]] — no window,
  * no self-join, and the same broadcast works unchanged on an
  * unbounded stream (see `EventStream.startQuarantine`).
  */
object Anomaly {

  /** value → fixed-point cents, the repo's money convention
    * (floor(+0.5): Spark's double→long cast truncates where DuckDB's
    * rounds, so round explicitly before the cast). */
  def cents(valueCol: Column): Column =
    floor(valueCol * 100 + 0.5).cast("long")

  /** Per-group population stats (n, Σc, Σc²), decimal(38,0) so the
    * downstream products stay exact. Output columns:
    * (event_type, n, s_sum, q_sum). */
  def referenceStats(df: DataFrame, typeCol: Column,
      valueCol: Column): DataFrame = {
    val d = cents(valueCol).cast("decimal(38,0)")
    df.groupBy(typeCol.as("event_type")).agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(d).as("s_sum"), sum(d * d).as("q_sum"))
  }

  /** The strict-2σ predicate, pure column arithmetic over a cents
    * column and the [[referenceStats]] columns. */
  def outlier(c: Column, n: Column, s: Column, q: Column): Column = {
    val dev = n * c.cast("decimal(38,0)") - s
    dev * dev > lit(4).cast("decimal(38,0)") * (n * q - s * s)
  }

  /** Row-level flagging against (possibly static/historic) stats:
    * appends `is_anomaly`. Groups absent from `stats` are ADMITTED
    * (flag false) — a quarantine gate must not reject rows it has no
    * evidence against; re-snapshot the stats to pick new groups up. */
  def flag(df: DataFrame, stats: DataFrame): DataFrame =
    df.join(broadcast(stats), Seq("event_type"), "left")
      .withColumn("is_anomaly",
        coalesce(outlier(cents(col("value")), col("n"), col("s_sum"),
          col("q_sum")), lit(false)))
      .drop("n", "s_sum", "q_sum")
}
