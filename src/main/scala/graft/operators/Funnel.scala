package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream — the product
  * analytics primitive behind "of the users who viewed, how many
  * clicked, then purchased, within a day?" (the ClickHouse
  * `windowFunnel` / Amplitude funnel semantic).
  *
  * Semantics (greedy earliest-match, window anchored at step 1):
  * step 1's timestamp is the user's EARLIEST step-1 event; step i+1
  * matches the earliest step-(i+1) event STRICTLY after the chosen
  * step-i event and within `window` of the step-1 anchor. A user's
  * depth is the longest prefix matched. Greedy-earliest is the
  * standard resolution — it maximizes the remaining window for later
  * steps, so it never under-reports depth versus any other
  * single-pass choice of step events.
  *
  * Scale shape: NO per-user sequence assembly (no collect_list, no
  * UDF over sorted arrays — the naive funnel implementation that
  * dies on power users with millions of events). Each step is one
  * map-side-combinable min-aggregation plus one equi-join on the
  * user key; all k-1 joins share the same key, so at scale they
  * co-partition after a single shuffle of the (already
  * type-filtered) step events, and the per-step frames are one row
  * per qualifying user, shrinking monotonically down the funnel.
  * The summary is a ≤k-row aggregate.
  */
object Funnel {

  /** Per-user funnel depth: (user, t1, t_last, depth) — one row per
    * user who completed step 1; `depth` ∈ [1, steps.length] and
    * `t_last` is the timestamp of the DEEPEST step matched (= t1 at
    * depth 1), so `t_last - t1` is the user's time-to-reach-depth —
    * the latency the qx percentiles aggregate. */
  def userDepth(events: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, steps: Seq[String], window: String): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"steps must be distinct: $steps")
    val e = events.select(userCol.as("user"), typeCol.as("et"),
      tsCol.cast("timestamp").as("ts"))
    // Each fold round references the previous frame TWICE (the step
    // join and the stall-preserving left join), so an unshared fold
    // nests the upstream plan 2^k times — the scan-budget spec
    // caught exactly this (14 events scans for 3 steps). share()
    // bounds it: per-round frames are one NARROW row per step-1 user
    // (user, t1, t_prev, depth), and the step-event scans stay
    // per-step filtered parquet reads (the et = step predicate
    // pushes down, so each pass reads only its step's rows).
    val s1 = Dedup.share(e.where(col("et") === steps.head)
      .groupBy(col("user")).agg(min(col("ts")).as("t1"))
      .select(col("user"), col("t1"), col("t1").as("t_prev"),
        lit(1L).as("depth")))
    steps.tail.zipWithIndex.foldLeft(s1) { case (prev, (step, idx)) =>
      // ONLY users at exactly the required depth may attempt this
      // step — a user stalled earlier must not match a later step
      // event (view→purchase with no click is depth 1, not 2); users
      // stalled at any depth keep their row (left join + coalesce)
      val need = idx + 1L
      val nxt = e.where(col("et") === step)
        .join(prev.where(col("depth") === need)
          .select(col("user"), col("t1"), col("t_prev")), Seq("user"))
        .where(col("ts") > col("t_prev") &&
          col("ts") <= col("t1") + expr(s"interval $window"))
        .groupBy(col("user"))
        .agg(min(col("ts")).as("t_step"))
      Dedup.share(prev.join(nxt, Seq("user"), "left")
        .select(col("user"), col("t1"),
          coalesce(col("t_step"), col("t_prev")).as("t_prev"),
          (col("depth") + when(col("t_step").isNotNull, 1L)
            .otherwise(0L)).as("depth")))
    }.select(col("user"), col("t1"), col("t_prev").as("t_last"),
      col("depth"))
  }

  /** Funnel summary: one row per step — (step, event_type, n_users,
    * conv_rate) where conv_rate is relative to step 1's cohort. */
  def summary(events: DataFrame, userCol: Column, typeCol: Column,
      tsCol: Column, steps: Seq[String], window: String): DataFrame = {
    val depths = userDepth(events, userCol, typeCol, tsCol, steps, window)
    val stepDf = depths.sparkSession.createDataFrame(
      steps.zipWithIndex.map { case (s, i) => (i + 1L, s) })
      .toDF("step", "event_type")
    val counts = depths.groupBy(col("depth")).agg(
      count(lit(1)).as("n_at_depth"))
    // n_users at step s = users with depth >= s: a k-row running sum
    // over the ≤k-row depth histogram (broadcast-scale by definition)
    val byStep = stepDf.join(counts,
        counts("depth") >= stepDf("step"), "left")
      .groupBy(col("step"), col("event_type"))
      .agg(coalesce(sum(col("n_at_depth")), lit(0L)).as("n_users"))
    val base = byStep.where(col("step") === 1)
      .select(col("n_users").as("n_base"))
    // empty entry cohort → conv_rate NULL for every step (0/0 is
    // undefined, not 0% or 100%) — matches the oracle's
    // n / nullif(n_base, 0)
    byStep.crossJoin(broadcast(base))
      .select(col("step"), col("event_type"), col("n_users"),
        round(col("n_users").cast("double") /
          when(col("n_base") > 0, col("n_base")), 6).as("conv_rate"))
      .orderBy(col("step"))
  }
}
