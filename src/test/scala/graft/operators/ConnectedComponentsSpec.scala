package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chains collapse to the min id") {
    // a~b, b~c is ONE cluster even though (a,c) was never a pair
    val l = labelsOf(Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(l === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("deep path converges past one round") {
    // path 10-9-...-1: min-label needs ~diameter rounds to reach 10
    val l = labelsOf((1L until 10L).map(i => (i, i + 1)))
    assert(l.size === 10)
    assert(l.values.forall(_ === 1L))
  }

  test("cluster canonicals drop transitive near-dups pairwise losers keep") {
    // chain 1~3, 2~3: docs 1 and 2 are near-dups only transitively.
    // Dropping pair losers (id_b) keeps BOTH 1 and 2; cluster
    // canonicals (p8's policy) keep only the component min.
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val losers = Dedup.connectedComponents(pairs)
      .where(col("id") =!= col("label"))
      .select("id").as[Long].collect().toSet
    assert(losers === Set(2L, 3L))
  }

  test("exceeding maxIters throws instead of returning non-minimal labels") {
    // path 8-7-...-1 has diameter 7; one round cannot finish it, and a
    // silent return would hand non-minimal cluster labels to d7/d8/p8
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIters = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("label propagation is invariant under input partitioning") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L))
    val a = labelsOf(pairs)
    val b = Dedup.connectedComponents(
      pairs.toDF("id_a", "id_b").repartition(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
