package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-provided synthetic warehouse
  * (/root/testdata/sf*, see TESTDATA.md). All analytics operators take
  * DataFrames, so these helpers are the only place that knows the
  * on-disk layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet has shipped in two physical layouts across testdata
    * generations; the loader is SCHEMA-ADAPTIVE so a regeneration never
    * breaks the query surface again:
    *  - `ts` as parquet TIMESTAMP(NANOS): Spark 4 rejects nanos
    *    ([PARQUET_TYPE_ILLEGAL]), so read as raw long via the
    *    `nanosAsLong` legacy conf (the Boolean is `true` here).
    *  - `ts` as parquet TIMESTAMP(MICROS) (current generation): reads
    *    natively (TIMESTAMP_NTZ under default inference — which we
    *    keep, because orders/lineitem date columns rely on it).
    * Returns the raw frame plus which layout was found. */
  private def rawEvents(spark: SparkSession, dir: String): (DataFrame, Boolean) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    (raw, raw.schema("ts").dataType == LongType)
  }

  /** Normalize either physical layout to the one logical schema every
    * consumer sees: `ts` TIMESTAMP (LTZ, micros precision — identical
    * values to what DuckDB's TIMESTAMP_NS→TIMESTAMP truncation or
    * native micros read produces, so oracle hashes match) and `ts_ns`
    * BIGINT epoch-nanos. In the nanos layout `ts_ns` is the NATIVE
    * column (filters on it reach the scan); in the micros layout `ts`
    * is native-adjacent (see [[eventsRanged]] for the pushdown rule)
    * and `ts_ns` is derived — exact, micros store only whole-µs values. */
  private def shapeEvents(raw: DataFrame, nanosAsLong: Boolean): DataFrame =
    if (nanosAsLong)
      raw.withColumn("ts_ns", col("ts"))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else
      // NTZ→LTZ cast is value-preserving under the pinned UTC session
      // timezone; ts_ns derives from the same cast (whole micros ⇒ ×1000
      // is exact), keeping every downstream consumer layout-agnostic.
      raw.withColumn("ts_ns", unix_micros(col("ts").cast("timestamp")) * 1000)
        .withColumn("ts", col("ts").cast("timestamp"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      val (raw, nanos) = rawEvents(spark, dir)
      shapeEvents(raw, nanos)
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** events with a pushdown-capable UTC time range pre-filter, [lo, hi).
    * The filter lands on whichever column is PHYSICAL in the file —
    * the raw ns long in the nanos layout (floor(ns/1000) ≥ L·1000 ⟺
    * ns ≥ L·1000·1000, so the range is exact for the truncated `ts`),
    * the native timestamp in the micros layout — because a predicate
    * on a DERIVED column cannot reach the parquet scan for row-group
    * pruning. Callers layering a timezone-local filter should widen
    * the bounds and keep their exact predicate on `ts`. */
  def eventsRanged(spark: SparkSession, dir: String,
      loUtc: String, hiUtc: String): DataFrame = {
    // parse as UTC EXPLICITLY: Timestamp.valueOf/getTime resolve in
    // the JVM default timezone, which would silently shift the
    // pushdown range (and drop rows at the day edges) on any
    // non-UTC host even though the session timezone is pinned
    def ldt(s: String): java.time.LocalDateTime =
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
    // lossless micros (toEpochMilli would truncate sub-millisecond
    // bounds and silently shift the range)
    def us(s: String): Long =
      ldt(s).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt(s).getNano / 1000L
    val (raw, nanos) = rawEvents(spark, dir)
    val ranged =
      if (nanos)
        raw.where(col("ts") >= us(loUtc) * 1000 &&
          col("ts") < us(hiUtc) * 1000)
      else {
        // literal type must match the file column's catalyst type or
        // the comparison inserts a cast that blocks pushdown: NTZ
        // column ⇒ LocalDateTime literal, LTZ ⇒ Instant literal.
        def bound(s: String) =
          if (raw.schema("ts").dataType == TimestampNTZType) lit(ldt(s))
          else lit(java.time.Instant.ofEpochSecond(0).plus(
            java.time.Duration.ofNanos(us(s) * 1000)))
        raw.where(col("ts") >= bound(loUtc) && col("ts") < bound(hiUtc))
      }
    shapeEvents(ranged, nanos)
  }

  /** Register every table as a temp view so the same queries run via
    * spark.sql(...) too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
