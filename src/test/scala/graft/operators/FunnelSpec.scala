package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Windowed-funnel semantics pinned by hand: greedy earliest match,
  * strictly-after step ordering, the conversion window anchored at
  * the step-1 event, inclusive window edge. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val steps = Seq("view", "click", "purchase")

  private val rows = Seq(
    // A: clean 3-step conversion
    (1L, "view", ts("2024-01-01 00:00:00")),
    (1L, "click", ts("2024-01-01 01:00:00")),
    (1L, "purchase", ts("2024-01-01 02:00:00")),
    // B: click lands outside the 24 h anchor window → stalls at 1
    (2L, "view", ts("2024-01-01 00:00:00")),
    (2L, "click", ts("2024-01-02 01:00:00")),
    // C: a purchase BEFORE the first qualifying click must not count;
    // greedy picks click@2h then the 3h purchase → depth 3
    (3L, "view", ts("2024-01-01 00:00:00")),
    (3L, "purchase", ts("2024-01-01 01:00:00")),
    (3L, "click", ts("2024-01-01 02:00:00")),
    (3L, "purchase", ts("2024-01-01 03:00:00")),
    // D: no view → not in the funnel at all
    (4L, "click", ts("2024-01-01 00:00:00")),
    (4L, "purchase", ts("2024-01-01 01:00:00")),
    // E: click at the SAME instant as the view — strictly-after → 1
    (5L, "view", ts("2024-01-01 00:00:00")),
    (5L, "click", ts("2024-01-01 00:00:00")),
    // F: click exactly ON the 24 h edge — inclusive → depth 2
    (6L, "view", ts("2024-01-01 00:00:00")),
    (6L, "click", ts("2024-01-02 00:00:00")),
    // G: view then purchase with NO click — a stalled user must not
    // match a later step (the bug the qv oracle caught): depth 1
    (7L, "view", ts("2024-01-01 00:00:00")),
    (7L, "purchase", ts("2024-01-01 01:00:00")))
    .toDF("user_id", "event_type", "ts")

  test("per-user depth: greedy earliest, strict order, anchored window") {
    val got = Funnel.userDepth(rows, col("user_id"), col("event_type"),
        col("ts"), steps, "24 hours")
      .select(col("user"), col("depth")).as[(Long, Long)]
      .collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 3L, 5L -> 1L,
      6L -> 2L, 7L -> 1L))
    assert(!got.contains(4L), "user without step 1 must be absent")
  }

  test("summary counts cohorts per step with rates vs the entry cohort") {
    val got = Funnel.summary(rows, col("user_id"), col("event_type"),
        col("ts"), steps, "24 hours")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, "view", 6L, 1.0),
      (2L, "click", 3L, 0.5),           // A, C, F reach click
      (3L, "purchase", 2L, 0.333333)))  // A, C convert
  }

  test("empty entry cohort: zero counts, NULL rates (0/0 is undefined)") {
    val noViews = rows.where(col("event_type") =!= "view")
    val got = Funnel.summary(noViews, col("user_id"), col("event_type"),
        col("ts"), steps, "24 hours")
      .select(col("step"), col("n_users"), col("conv_rate"))
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((1L, 0L, None), (2L, 0L, None), (3L, 0L, None)))
  }

  test("funnel depth is invariant to event arrival order and partitioning") {
    val shuffled = rows.orderBy(rand(7)).repartition(13)
    val a = Funnel.userDepth(rows, col("user_id"), col("event_type"),
      col("ts"), steps, "24 hours").orderBy("user").collect().toSeq
    val b = Funnel.userDepth(shuffled, col("user_id"), col("event_type"),
      col("ts"), steps, "24 hours").orderBy("user").collect().toSeq
    assert(a === b)
  }
}
