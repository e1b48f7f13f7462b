package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Sequence packing for LLM training: concatenate documents in a
  * deterministic global order and cut fixed-size token windows
  * (GPT-style concat-then-chunk). Reports, per document, its token
  * offset in the concatenated stream and the first/last training
  * sequence it lands in.
  *
  * 100 TB shape — the global prefix sum is computed DISTRIBUTED,
  * never as one global window:
  *   1. docs hash into `nBuckets` ordered buckets (deterministic
  *      portable hash, so the global order is reproducible across
  *      engines/runs/partitionings);
  *   2. the within-bucket running sum is a bucket-partitioned window
  *      (parallel across buckets, each a fraction of the data);
  *   3. bucket base offsets come from a window over the
  *      nBuckets-row totals table — metadata-sized, like the IVF
  *      codebook — broadcast-joined back.
  * Global offset = bucket base + within-bucket running sum. The only
  * unpartitioned window touches nBuckets rows.
  *
  * At a real 100 TB run nBuckets scales with the cluster (e.g. 10k):
  * per-bucket data stays bounded and the totals table is still tiny.
  */
object Pack {

  /** Per-document packing report over `(idCol, tokensCol)` rows:
    * `(id, n_tokens, offset, seq_first, seq_last, n_seqs)`.
    * `budget` is the training-sequence length in tokens. */
  def packReport(df: DataFrame, idCol: Column, tokensCol: Column,
      budget: Long, nBuckets: Int = 8, seed: Int = 13): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = df.select(idCol.as("id"),
      tokensCol.cast("long").as("n_tokens"))
    val keyed = base
      .withColumn("_key", PortableHash.phash(col("id").cast("string"), seed))
      .withColumn("_bucket", pmod(col("_key"), lit(nBuckets.toLong)))
    val wIn = Window.partitionBy(col("_bucket"))
      .orderBy(col("_key"), col("id"))
    val cum = keyed.withColumn("_cum", sum(col("n_tokens")).over(wIn))
    val totals = keyed.groupBy(col("_bucket"))
      .agg(sum(col("n_tokens")).as("_tot"))
    // nBuckets rows — the one unpartitioned window, metadata-sized.
    val wBase = Window.orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = totals
      .withColumn("_base", coalesce(sum(col("_tot")).over(wBase), lit(0L)))
      .select(col("_bucket"), col("_base"))
    cum.join(broadcast(bases), Seq("_bucket"))
      .withColumn("offset", col("_base") + col("_cum") - col("n_tokens"))
      .withColumn("seq_first", expr(s"offset div ${budget}L"))
      // zero-token docs occupy NO sequence: pinned explicitly because
      // Spark's `div` truncates toward zero while the oracle's `//`
      // floors — at offset 0 the two would otherwise disagree on
      // (offset + n_tokens - 1) div budget for the degenerate row
      .withColumn("seq_last",
        when(col("n_tokens") === 0L, col("seq_first") - 1)
          .otherwise(expr(s"(offset + n_tokens - 1) div ${budget}L")))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + lit(1L))
      .select(col("id"), col("n_tokens"), col("offset"),
        col("seq_first"), col("seq_last"), col("n_seqs"))
  }
}
