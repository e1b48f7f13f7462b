package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Behavior pins for the in-engine NB classifier beyond its oracle. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog ate the bone"),
    (3L, "de", "der hund und die katze"),
    (4L, "de", "die maus und der mann"),
    (5L, "en", "the the the dog"),
    (6L, "de", "der der die und")).toDF("doc_id", "lang", "text")

  test("classification is invariant under repartitioning (fixed-point sums)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      NaiveBayes.selfClassify(df, col("doc_id"), col("lang"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(4)))
        .toSet
    assert(run(docs) === run(docs.repartition(7)))
  }

  test("distinctive-vocabulary docs classify to their own language") {
    val out = NaiveBayes.selfClassify(docs, col("doc_id"), col("lang"),
        col("text"))
      .select(col("id"), col("correct")).as[(Long, Boolean)]
      .collect().toMap
    // every doc's vocabulary is fully disjoint between the two
    // languages here, so self-classification must be perfect
    assert(out.size === 6 && out.values.forall(identity))
  }

  test("one row per doc; score is the argmax class's posterior") {
    val out = NaiveBayes.selfClassify(docs, col("doc_id"), col("lang"),
      col("text")).collect()
    assert(out.length === 6)
    assert(out.map(_.getLong(0)).toSet === (1L to 6L).toSet)
    // fixed-point log-posteriors are strictly negative (probabilities < 1)
    assert(out.forall(_.getLong(4) < 0L))
  }
}
