package graft.plans

import graft.SparkSpec
import graft.queries.DocQueries

/** d19 is THE query that keeps HammingNN's banded production branch
  * gate-visible (the media corpora are 6–13 blobs and always take the
  * pairwise fast path) — pin that it actually takes it: the physical
  * plan must contain the band-bucket candidate join (posexplode of
  * the four 16-bit bands feeding an equi-join) and no cartesian /
  * nested-loop shape, and the LEFT-join readout must preserve every
  * chunk row (band-isolated keys surface as NULL-NN, never drop). */
class ChunkNNPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("d19 takes the banded branch: band join present, no cartesian") {
    val df = DocQueries.defs("d19_chunk_nn")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the banded branch's signature: the posexplode'd band column is
    // an equi-join key in the physical plan, and the hot-bucket cap
    // sits in front as a broadcast anti-join (round-11)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("posexplode"),
      "expected the band posexplode of HammingNN's banded branch")
    assert(p.contains("LeftAnti"),
      "expected the HotKeys anti-join hot-bucket cap")
  }

  test("d19 preserves every chunk row through the left-join readout") {
    val docs = graft.Tables.load(spark, dir, "documents")
    val nChunks = docs.where(org.apache.spark.sql.functions
        .length(org.apache.spark.sql.functions.col("text")) > 0)
      .selectExpr("sum((length(text) - 1) div 32 + 1)")
      .head().getLong(0)
    assert(nChunks > 4096, s"corpus must exceed the pairwise limit: $nChunks")
    val out = DocQueries.defs("d19_chunk_nn")(spark, dir).count()
    assert(out === nChunks)
  }
}
