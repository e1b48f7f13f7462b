package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fair-share (water-filling) budget allocation — the solve of
  *
  *   Σ_s min(avail_s, θ) = B
  *
  * behind `p24_budget_waterfill`: every group gets an equal share θ
  * of the budget, capped at what it actually has; small groups are
  * taken whole and the remainder splits evenly over the big ones.
  *
  * Realized by the sorted-prefix closed form (no iteration): sort
  * groups by avail ascending; group k (of n) is fully taken iff
  *
  *   avail_k ≤ (B − cum_{<k}) / (n − k + 1)
  *
  * (the predicate is monotone in k: once a group overflows its fair
  * share, all larger ones do too), and then
  *
  *   θ = (B − Σ_taken avail) / (n − #taken).
  *
  * Exactness: avail and B are exact integers < 2^53, so every IEEE
  * quotient above — and thus every comparison and the final θ — is
  * identical on any engine; no fixed-point machinery needed.
  *
  * Scale shape: the input is a per-group aggregate (|groups| rows,
  * metadata-sized), so the single-partition window is free; the
  * solve never touches row-level data.
  */
object WaterFill {

  /** Allocates `floor(budgetFrac · Σ avail)` over the groups of
    * `df` (one row per group: `key`, integer `avail`). Output
    * columns: `key`, `avail`, `taken` (fully allocated?),
    * `alloc_tokens` (double, Σ = B in reals), `take_frac`
    * (alloc/avail) — callers re-alias to their domain names.
    */
  def allocate(df: DataFrame, key: Column, avail: Column,
      budgetFrac: Double): DataFrame = {
    val bySrc = df.select(key.as("__k"), avail.cast("long").as("__a"))
    val tot = bySrc.agg(sum(col("__a")).as("t"), count(lit(1)).as("n"))
    val w = Window.orderBy(col("__a"), col("__k"))
    val ranked = bySrc.crossJoin(broadcast(tot))
      .withColumn("budget", floor(col("t").cast("double") * budgetFrac))
      .withColumn("rn", row_number().over(w))
      .withColumn("cum_prev",
        coalesce(sum(col("__a"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("fair_k",
        (col("budget") - col("cum_prev")).cast("double") /
          (col("n") - col("rn") + 1))
      .withColumn("taken", col("__a") <= col("fair_k"))
    val level = ranked.agg(
      sum(when(col("taken"), col("__a")).otherwise(lit(0L))).as("cum_taken"),
      sum(when(col("taken"), 1L).otherwise(0L)).as("n_taken"))
    ranked.crossJoin(broadcast(level))
      // when EVERY group is taken (budget ≥ total) the divisor is 0
      // and ANSI division — double included — raises; no row reads
      // theta in that case, so guard it to NULL
      .withColumn("theta",
        when(col("n") === col("n_taken"), lit(null).cast("double"))
          .otherwise((col("budget") - col("cum_taken")).cast("double") /
            (col("n") - col("n_taken"))))
      .select(col("__k").as("key"), col("__a").as("avail"), col("taken"),
        round(when(col("taken"), col("__a").cast("double"))
          .otherwise(col("theta")), 6).as("alloc_tokens"),
        round(when(col("taken"), lit(1.0d))
          .otherwise(col("theta") / col("__a")), 6).as("take_frac"))
  }
}
