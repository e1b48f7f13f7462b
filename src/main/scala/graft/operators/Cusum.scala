package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-sided CUSUM changepoint detection over keyed, ordered integer
  * series — the rate-drift alarm behind `qz_cusum_changepoint`.
  *
  * Semantics (per key, rows ordered by `ord`): the classic positive
  * CUSUM recursion
  *
  *   S_k = max(0, S_{k-1} + (x_k − μ − σ·slack)),  S_0 = 0
  *
  * with μ, σ the per-key mean / population stddev of x, flagged when
  * S_k > σ·threshold. Realized CLOSED-FORM, not as a fold: with
  * d_k = x_k − μ − σ·slack and prefix sums P_k,
  *
  *   S_k = P_k − min(0, min_{j≤k} P_j)
  *
  * — two analytic windows (running sum + running min), no
  * driver-side recursion, no `aggregate()` lambda.
  *
  * Exactness discipline (the cross-engine parity rules the rest of
  * the library uses): μ and σ derive from INTEGER Σx and Σx²
  * (σ² = (n·Σx² − (Σx)²)/n² — never a float Σ(x−μ)² whose
  * accumulation order is engine-dependent), and the entire CUSUM
  * state runs in fixed-point micro-units (`d6 = x·1e6 − ⌊μ·1e6⌋ −
  * ⌊σ·1e6⌋ div 2·slack…` — see below), so the window sums are
  * integer arithmetic and bit-identical on any engine and any
  * partitioning.
  *
  * Scale shape: stats are one map-side-combinable aggregation over
  * the (already aggregated) series and broadcast back (|keys| rows);
  * the two windows shuffle once by key. The input is expected to be
  * a pre-aggregated series (e.g. daily counts), so window state is
  * |points-per-key|, not raw-event-sized.
  *
  * `slackHalf`/`threshold` are fixed at the conventional σ/2 and 4σ:
  * the fixed-point literals are part of the cross-engine contract
  * (an arbitrary float multiplier would need its own ⌊·1e6⌋ rule),
  * and these are the values the oracle replays.
  */
object Cusum {

  /** Adds `cusum` (double, 1e-6 resolution) and `flagged` (bool) to
    * `df`, which must carry one row per (key, ord) with integer
    * measure `x`. Output columns: `key`, `ord`, `x`, `cusum`,
    * `flagged` — callers re-alias to their domain names.
    */
  def detect(df: DataFrame, key: Column, ord: Column, x: Column): DataFrame = {
    val in = Dedup.share(df.select(key.as("__k"), ord.as("__o"),
      x.cast("long").as("__x")))
    val stats = in.groupBy(col("__k"))
      .agg(count(lit(1)).as("nd"), sum(col("__x")).as("sx"),
        sum(col("__x") * col("__x")).as("sx2"))
      .select(col("__k"),
        floor(col("sx").cast("double") / col("nd") * 1000000.0d).as("mu6"),
        floor(sqrt((col("nd") * col("sx2") - col("sx") * col("sx"))
            .cast("double") / (col("nd") * col("nd"))) * 1000000.0d)
          .as("sig6"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    in.join(broadcast(stats), Seq("__k"))
      .withColumn("d6",
        col("__x") * 1000000L - col("mu6") - expr("sig6 div 2"))
      .withColumn("p6", sum(col("d6")).over(w))
      .withColumn("s6", col("p6") - least(lit(0L), min(col("p6")).over(w)))
      .select(col("__k").as("key"), col("__o").as("ord"),
        col("__x").as("x"),
        round(col("s6").cast("double") / 1000000.0d, 6).as("cusum"),
        (col("s6") > lit(4L) * col("sig6")).as("flagged"))
  }
}
