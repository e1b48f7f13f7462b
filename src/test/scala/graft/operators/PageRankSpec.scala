package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[PageRank.ranksPpm]] to the literal sequential recurrence
  * (plain Longs, no Spark):
  *
  *   rₜ₊₁(v) = 150000 + ⌊85 · Σ_{u→v} ⌊rₜ(u)/deg(u)⌋ / 100⌋
  *
  * on structured graphs (cycle, star, dangling) and a seeded random
  * graph — and asserts the result is invariant to input partitioning
  * (the determinism the g1 oracle's unrolled replay depends on).
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def referenceRanks(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iterations: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(v => v -> (150000L + 85L * in.getOrElse(v, 0L) / 100L))
        .toMap
    }
    r
  }

  private def sparkRanks(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iterations: Int, parts: Int = 1): Map[Long, Long] = {
    val n = nodes.toDF("id").repartition(parts)
    val e = edges.toDF("src", "dst").repartition(parts)
    PageRank.ranksPpm(n, e, iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cycle conserves mass; an isolated node settles at the base") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)) // 4 is isolated
    val got = sparkRanks(nodes, edges, 8)
    assert(got === referenceRanks(nodes, edges, 8))
    // symmetric cycle: equal ranks, near-full mass (floor loss only)
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(1L) > 990000L)
    assert(got(4L) === 150000L)
  }

  test("star: the hub concentrates rank exactly as the recurrence says") {
    val nodes = (1L to 6L)
    val edges = (2L to 6L).map(v => (v, 1L)) // 5 spokes -> hub
    val got = sparkRanks(nodes, edges, 8)
    assert(got === referenceRanks(nodes, edges, 8))
    assert(got(1L) > got(2L)) // hub above spokes
  }

  test("dangling node leaks its mass (the documented simplification)") {
    val nodes = Seq(1L, 2L)
    val edges = Seq((1L, 2L)) // 2 is dangling
    val got = sparkRanks(nodes, edges, 3)
    assert(got === referenceRanks(nodes, edges, 3))
    // node 2 receives from 1 but re-emits nothing: total < 2e6
    assert(got.values.sum < 2000000L)
  }

  test("seeded random graph matches the reference and is partition-invariant") {
    val rnd = new Random(17)
    val nodes = (0L until 40L)
    val edges = (for (s <- 0L until 40L; _ <- 0 until 3)
      yield (s, rnd.nextInt(40).toLong)).filterNot(e => e._1 == e._2)
    val ref = referenceRanks(nodes, edges, 8)
    assert(sparkRanks(nodes, edges, 8, parts = 1) === ref)
    assert(sparkRanks(nodes, edges, 8, parts = 7) === ref)
  }
}
