package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global row_number WITHOUT a single-task window.
  *
  * `row_number() OVER (ORDER BY ...)` plans an
  * `Exchange SinglePartition`: at 100 TB the entire table funnels
  * through one reducer. This operator produces the SAME ranks with
  * bounded parallelism loss: approximate quantiles of the order key
  * split the domain into `nBuckets` order-consistent ranges (equal
  * keys always land in one bucket, so ranks never split a tie group
  * incorrectly — the tie column finishes the order within a bucket),
  * per-bucket counts prefix-sum into bucket base offsets (an
  * nBuckets-row window, metadata-sized — the [[Pack]] convention),
  * and rank = base + row_number within the bucket. Bucket boundaries
  * only shape EXECUTION (balance), never the result: ranks are exact
  * for any boundary choice, so the output is deterministic and
  * oracle-checkable even though approxQuantile is approximate.
  *
  * The driving use case is curriculum ordering: sort a corpus by
  * quality and hand out rank-derived shards (`p10_curriculum`).
  * Degenerate key distributions (one value dominating) collapse to
  * few buckets — use a finer-grained order key if that matters.
  * Boundary estimation is one `approxQuantile` summary pass over the
  * order column; at extreme scale compute it from a fixed-fraction
  * sample instead — the output is boundary-independent, so any
  * boundary source is safe.
  */
object Rank {

  /** Append `rank` (1-based, long): position in the total order
    * (`orderCol` asc or desc, ties by `tieCol` asc — `tieCol` must be
    * unique; `orderCol` must be numeric, non-null, non-NaN).
    *
    * The double ordering column is used ONLY for bucket placement
    * (negated AFTER the cast — negating an integral column first
    * would wrap on Long.MinValue); the within-bucket window orders by
    * the ORIGINAL column, so keys that collapse to one double (longs
    * above 2^53) still rank in their exact order — the cast's
    * monotonicity guarantees bucket placement stays order-consistent
    * either way.
    *
    * Working columns are generated collision-free against the input's
    * schema, so a caller's own `_ord`/`_bucket` column survives. The
    * output column `rank` is the API: a pre-existing `rank` column IS
    * replaced. */
  def globalRowNumber(df: DataFrame, orderCol: Column, tieCol: Column,
      nBuckets: Int = 32, descending: Boolean = false): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    def fresh(base: String): String =
      Iterator.from(0)
        .map(i => if (i == 0) base else s"$base$i")
        .dropWhile(df.columns.contains)
        .next()
    val ordName = fresh("_ord")
    val bucketName = fresh("_bucket")
    val baseName = fresh("_base")
    val ordD = orderCol.cast("double")
    val keyed = df.withColumn(ordName, if (descending) -ordD else ordD)
    // bounded driver metadata (≤ nBuckets-1 doubles), like the
    // IVF/PQ codebooks; boundaries are allowed to be approximate
    val probes = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else keyed.stat.approxQuantile(ordName, probes, 0.01).distinct.sorted
    // bucket = #boundaries strictly below the key: a chain of codegen
    // comparisons against literals (equal keys → equal bucket)
    val bucket =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col(ordName) > lit(b), 1).otherwise(0))
        .reduce(_ + _)
    val bucketed = keyed.withColumn(bucketName, bucket)
    val wIn = Window.partitionBy(col(bucketName))
      .orderBy(if (descending) orderCol.desc else orderCol.asc, tieCol)
    val counts = bucketed.groupBy(col(bucketName))
      .agg(count(lit(1)).as("_n"))
    // ≤ nBuckets rows — the one unpartitioned window, metadata-sized
    val wBase = Window.orderBy(col(bucketName))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = counts
      .withColumn(baseName, coalesce(sum(col("_n")).over(wBase), lit(0L)))
      .select(col(bucketName), col(baseName))
    bucketed.join(broadcast(bases), Seq(bucketName))
      .withColumn("rank",
        (col(baseName) + row_number().over(wIn).cast("long")))
      .drop(ordName, bucketName, baseName)
  }
}
