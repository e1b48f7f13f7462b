package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins containmentPairs' semantics on constructed docs: a short doc
  * embedded in a long one scores containment 1.0 while jaccardPairs
  * misses it, exact dups score 1.0 both ways, and the stop-gram cap
  * only ever under-reports (capped pairs ⊆ uncapped pairs). */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val short = "alpha beta gamma delta epsilon"
  private val long = short + " zeta eta theta iota kappa lambda mu nu " +
    "xi omicron pi rho sigma tau upsilon phi chi psi omega one two " +
    "three four five six seven eight nine ten eleven twelve"

  private def docs = Seq(
    (1L, long), (2L, short), (3L, long), (4L, "unrelated words only here")
  ).toDF("doc_id", "text")

  test("short-in-long scores containment 1.0 where jaccard misses it") {
    val c = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    // (1,2): short ⊂ long — the SECOND doc (higher id) is contained
    assert(c((1L, 2L))._2 === 1.0)
    // (1,3): exact dup — both directions 1.0
    assert(c((1L, 3L)) === ((1.0, 1.0)))
    // doc 4 shares nothing
    assert(!c.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // jaccard at the same 3-gram granularity misses the (1,2) embed:
    // |sh(short)| = 3, |sh(long)| = 41 → jaccard = 3/41 ≈ 0.07
    val j = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((1L, 2L)))
    assert(j.contains((1L, 3L))) // but catches the symmetric dup
  }

  test("stop-gram cap only under-reports, never invents") {
    val uncapped = Dedup.containmentPairs(docs, col("doc_id"),
      col("text"), n = 3, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.containmentPairs(docs, col("doc_id"),
      col("text"), n = 3, threshold = 0.3, maxGramDf = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
  }
}
