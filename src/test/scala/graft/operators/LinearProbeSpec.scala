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

  test("train matches a sequential fixed-point GD reference exactly") {
    val rnd = new scala.util.Random(2468)
    val data = (1L to 60L).map { i =>
      val x = Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat)
      (i, x, if (x(0) + 0.3 * x(2) > 0) 1 else 0)
    }
    // local reference: identical fixed-point gradient accumulation,
    // identical update arithmetic, sequential
    var w = Array.fill(5)(0.0d)
    val n = data.size.toDouble
    for (_ <- 1 to 9) {
      val g = Array.fill(5)(0L)
      for ((_, x, y) <- data) {
        val z = (0 until 4).map(j => x(j) * w(j)).sum + w(4)
        val d = y - 1.0 / (1.0 + math.exp(-z))
        for (j <- 0 until 4)
          g(j) += math.floor(d * x(j) * 1e6).toLong
        g(4) += math.floor(d * 1e6).toLong
      }
      w = w.indices.map(j => w(j) + 0.5 * g(j) / 1e6 / n).toArray
    }
    val got = LinearProbe.train(data.toDF("id", "x", "y"),
      col("x"), col("y"), dim = 4, iters = 9, step = 0.5)
    assert(got.toSeq === w.toSeq)
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
