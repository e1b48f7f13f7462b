package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic warehouse
  * (/root/testdata/sf*, see TESTDATA.md). All analytics operators take
  * DataFrames, so these helpers are the only place that knows the
  * on-disk layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects
      // ([PARQUET_TYPE_ILLEGAL]); read as long and truncate ns→µs —
      // exactly what DuckDB's TIMESTAMP_NS→TIMESTAMP cast does, so the
      // oracle sees identical values. The raw long survives as `ts_ns`:
      // filters on the derived `ts` cannot reach the parquet scan, so
      // time-sliced queries add an equivalent `ts_ns` range (the
      // truncation is monotone) to get row-group pruning back.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
        .withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** events with a pushdown-capable UTC time range pre-filter:
    * [lo, hi) on the raw ns column (exact for the truncated `ts` —
    * floor(ns/1000) ≥ L·1000 ⟺ ns ≥ L·1000·1000). Callers layering a
    * timezone-local filter should widen the bounds and keep their
    * exact predicate on `ts`. */
  def eventsRanged(spark: SparkSession, dir: String,
      loUtc: String, hiUtc: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // parse as UTC EXPLICITLY: Timestamp.valueOf/getTime resolve in
    // the JVM default timezone, which would silently shift the
    // pushdown range (and drop rows at the day edges) on any
    // non-UTC host even though the session timezone is pinned
    def us(s: String): Long = {
      // lossless micros (toEpochMilli would truncate sub-millisecond
      // bounds and silently shift the range)
      val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L
    }
    load(spark, dir, "events")
      .where(col("ts_ns") >= us(loUtc) * 1000 &&
        col("ts_ns") < us(hiUtc) * 1000)
  }

  /** Register every table as a temp view so the same queries run via
    * spark.sql(...) too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
