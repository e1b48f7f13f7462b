package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins for the in-engine logistic-regression probe: training is
  * partition-order-invariant (fixed-point gradient sums), a linearly
  * separable toy set trains to perfect self-accuracy, and the scoring
  * sign convention matches the emitted fixed-point score. */
class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  // y = 1 iff first coordinate positive; cleanly separable
  private def toy = Seq(
    (1L, Array(1.0f, 0.2f), 1), (2L, Array(0.8f, -0.5f), 1),
    (3L, Array(0.6f, 0.9f), 1), (4L, Array(-1.0f, 0.1f), 0),
    (5L, Array(-0.7f, -0.8f), 0), (6L, Array(-0.9f, 0.6f), 0)
  ).toDF("id", "x", "y")

  test("separable data trains to perfect self-accuracy") {
    val w = LinearProbe.train(toy, col("x"), col("y"), dim = 2,
      iters = 50, step = 2.0)
    val out = LinearProbe.score(toy, col("id"), col("x"), col("y"), w)
    assert(out.where(!col("correct")).count() === 0L)
    // the learned boundary leans on the separating coordinate
    assert(math.abs(w(0)) > math.abs(w(1)))
  }

  test("training is invariant under input repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      LinearProbe.train(df, col("x"), col("y"), dim = 2,
        iters = 7, step = 1.0).toSeq
    assert(run(toy) === run(toy.repartition(5)))
  }

  test("score_fp sign IS the prediction; bias row is used") {
    // all-negative weights + large positive bias: prediction flips to
    // 1 everywhere only because the bias term is applied
    val w = Array(-0.001, -0.001, 5.0)
    val out = LinearProbe.score(toy, col("id"), col("x"), col("y"), w)
      .select(col("score_fp"), col("pred")).collect()
    assert(out.forall(r => r.getLong(1) === (if (r.getLong(0) >= 0) 1L else 0L)))
    assert(out.forall(_.getLong(1) === 1L))
  }
}
