package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binned interval join: inclusive bounds, bin-straddling intervals,
  * and the equi-join (no cross product) plan shape. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val intervals = Seq(
    // straddles two 1h bins
    ("A", 1L, ts("2024-01-01 09:30:00"), ts("2024-01-01 10:30:00")),
    ("A", 2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00")),
    ("B", 1L, ts("2024-01-01 09:45:00"), ts("2024-01-01 09:50:00"))
  ).toDF("k", "iv", "start_t", "end_t")

  private lazy val points = Seq(
    ("A", 10L, ts("2024-01-01 09:30:00")), // == start: inclusive
    ("A", 11L, ts("2024-01-01 10:15:00")), // second bin of interval 1
    ("A", 12L, ts("2024-01-01 10:30:00")), // == end: inclusive
    ("A", 13L, ts("2024-01-01 11:00:00")), // in no interval
    ("A", 14L, ts("2024-01-01 12:05:00")), // interval 2
    ("B", 15L, ts("2024-01-01 09:47:00")), // key B only
    ("C", 16L, ts("2024-01-01 09:47:00"))  // key with no intervals
  ).toDF("pk", "pid", "t")

  test("points match inclusive bounds across bin boundaries, keyed") {
    val out = RangeJoin.pointInInterval(points, intervals,
        "pk", "k", "t", "start_t", "end_t", binSec = 3600L)
      .select(col("pid"), col("k"), col("iv"))
      .orderBy(col("pid")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      Seq((10L, 1L), (11L, 1L), (12L, 1L), (14L, 2L), (15L, 1L)))
  }

  test("each (point, interval) pair emerges exactly once") {
    val out = RangeJoin.pointInInterval(points, intervals,
      "pk", "k", "t", "start_t", "end_t", binSec = 60L) // many bins/interval
    assert(out.groupBy("pid", "iv").count().where(col("count") > 1)
      .count() === 0)
  }

  test("plans an equi hash join, not a nested-loop cross product") {
    val p = RangeJoin.pointInInterval(points, intervals,
        "pk", "k", "t", "start_t", "end_t", binSec = 3600L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
