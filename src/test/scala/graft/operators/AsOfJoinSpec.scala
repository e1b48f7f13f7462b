package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Nearest-preceding semantics: latest right row wins, equal
  * timestamps match, no-preceding rows yield NULL (left join). */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:10")),
      (3L, "B", ts("2024-01-01 10:00:01")), // before any B quote → NULL
      (4L, "B", ts("2024-01-01 10:00:20"))  // equal-time quote matches
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:07"), 101.0),
      ("A", ts("2024-01-01 10:00:30"), 999.0), // after both A trades
      ("B", ts("2024-01-01 10:00:20"), 55.0)
    ).toDF("sym", "qt", "px")

    val out = AsOfJoin.asOf(trades, quotes, leftKey = "sym",
        rightKey = "sym",
        leftTime = "t", rightTime = "qt", payload = Seq("px", "qt"))
      .orderBy(col("trade_id"))
      .select(col("trade_id"), col("asof.px"))
      .collect()

    assert(out(0).getDouble(1) === 100.0) // 10:00:05 → quote at :00
    assert(out(1).getDouble(1) === 101.0) // 10:00:10 → quote at :07
    assert(out(2).isNullAt(1))            // nothing precedes
    assert(out(3).getDouble(1) === 55.0)  // equal timestamp matches
  }

  test("NULL right times never match (nulls-first sort must not leak)") {
    // a NULL quote time sorts before everything in the union's
    // ascending order — without the explicit filter its payload would
    // attach as a bogus "preceding" match for quotes-less trades
    val trades = Seq((1L, "A", ts("2024-01-01 10:00:05")))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", null.asInstanceOf[Timestamp], 666.0),
      ("A", ts("2024-01-01 10:00:30"), 999.0) // after the trade
    ).toDF("sym", "qt", "px")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "sym", "t", "qt",
        payload = Seq("px"))
      .select(col("asof.px")).collect()
    assert(out.length === 1 && out(0).isNullAt(0))
  }

  test("asOf plans one shuffle, not an inequality cross product") {
    val l = Seq((1L, "A", ts("2024-01-01 10:00:05"))).toDF("id", "k", "t")
    val r = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "qt", "v")
    val p = AsOfJoin.asOf(l, r, "k", "k", "t", "qt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin")) // resolved by window, not join
  }
}
