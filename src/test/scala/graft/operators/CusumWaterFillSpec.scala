package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the two late-round-8 kernels to sequential references:
  *
  *  - [[Cusum.detect]]'s closed form (prefix sum − running min) must
  *    equal the textbook recursion S_k = max(0, S_{k−1} + d_k),
  *    replayed here in plain Longs with the same fixed-point rules —
  *    and must be invariant to input partitioning (the point of the
  *    integer state).
  *  - [[WaterFill.allocate]]'s sorted-prefix solve must agree with an
  *    INDEPENDENT iterative water-filler (repeatedly cap groups at
  *    the fair share until a fixed point) on the taken set, the
  *    water level, and budget conservation.
  */
class CusumWaterFillSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(23)

  // --- Cusum ---

  // 3 keys × 40 points: flat-ish Poisson-ish bulk; key "b" jumps
  // +60% for its last 8 points (a real changepoint), key "c" is
  // exactly constant (σ = 0 edge).
  private val series: Seq[(String, Int, Long)] =
    (for (i <- 0 until 40) yield ("a", i, 100L + rnd.nextInt(11) - 5)) ++
      (for (i <- 0 until 40)
        yield ("b", i, (if (i < 32) 100L else 160L) + rnd.nextInt(7) - 3)) ++
      (for (i <- 0 until 40) yield ("c", i, 42L))

  /** The same fixed-point arithmetic as the operator, as the literal
    * recursion — sequential Longs, no Spark. */
  private def referenceCusum(
      data: Seq[(String, Int, Long)]): Map[(String, Int), (Double, Boolean)] =
    data.groupBy(_._1).flatMap { case (k, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val nd = xs.size.toLong
      val sx = xs.sum
      val sx2 = xs.map(x => x * x).sum
      val mu6 = math.floor(sx.toDouble / nd * 1000000.0).toLong
      val sig6 = math.floor(math.sqrt(
        (nd * sx2 - sx * sx).toDouble / (nd * nd)) * 1000000.0).toLong
      var s = 0L
      rows.sortBy(_._2).map { case (_, o, x) =>
        val d6 = x * 1000000L - mu6 - sig6 / 2
        s = math.max(0L, s + d6)
        ((k, o),
          (BigDecimal(s.toDouble / 1000000.0)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            s > 4 * sig6))
      }
    }

  test("closed-form CUSUM equals the sequential recursion, any partitioning") {
    val expected = referenceCusum(series)
    for (parts <- Seq(1, 7)) {
      val got = Cusum.detect(
          series.toDF("k", "o", "x").repartition(parts),
          col("k"), col("o"), col("x"))
        .collect()
        .map(r => ((r.getString(0), r.getInt(1)),
          (r.getDouble(3), r.getBoolean(4))))
        .toMap
      assert(got.size === expected.size)
      for ((ko, (c, f)) <- expected) {
        assert(got(ko)._1 === c, s"cusum at $ko (parts=$parts)")
        assert(got(ko)._2 === f, s"flagged at $ko (parts=$parts)")
      }
    }
  }

  test("the step change flags; the flat and in-control series never do") {
    val got = Cusum.detect(series.toDF("k", "o", "x"),
        col("k"), col("o"), col("x"))
      .where(col("flagged")).select(col("key"), col("ord")).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(got.nonEmpty, "the injected +60% shift must trip the alarm")
    assert(got.forall(_._1 == "b"), s"only key b shifted, got $got")
    assert(got.forall(_._2 >= 32), "flags must not precede the shift")
  }

  // --- WaterFill ---

  /** Independent iterative water-filler: start with everyone
    * un-capped; repeatedly set θ = remaining/(#uncapped) and cap any
    * group with avail ≤ θ, until no new group caps. */
  private def referenceFill(avail: Map[String, Long],
      budget: Long): (Set[String], Double) = {
    var capped = Set.empty[String]
    var changed = true
    var theta = 0.0
    while (changed) {
      val remaining = budget - capped.toSeq.map(avail).sum
      val open = avail.keySet -- capped
      theta = remaining.toDouble / open.size
      val newly = open.filter(k => avail(k) <= theta)
      changed = newly.nonEmpty
      capped ++= newly
    }
    (capped, theta)
  }

  test("sorted-prefix solve matches the iterative filler on random groups") {
    for (trial <- 1 to 5) {
      val avail = (1 to 12)
        .map(i => (s"g$i", 1000L + rnd.nextInt(500000))).toMap
      val frac = 0.3 + 0.1 * trial
      val budget = math.floor(avail.values.sum.toDouble * frac).toLong
      val (refTaken, refTheta) = referenceFill(avail, budget)

      val got = WaterFill.allocate(avail.toSeq.toDF("k", "a"),
        col("k"), col("a"), budgetFrac = frac).collect()
      val gotTaken = got.filter(_.getBoolean(2)).map(_.getString(0)).toSet
      assert(gotTaken === refTaken, s"taken set, trial $trial")

      // water level: every untaken row's alloc is θ
      val thetas = got.filterNot(_.getBoolean(2)).map(_.getDouble(3))
      for (t <- thetas)
        assert(math.abs(t - refTheta) < 1e-5, s"level, trial $trial")

      // conservation: Σ alloc = budget (alloc is rounded to 1e-6)
      val total = got.map(_.getDouble(3)).sum
      assert(math.abs(total - budget) < 1e-3,
        s"allocated $total vs budget $budget, trial $trial")

      // caps respected
      for (r <- got)
        assert(r.getDouble(3) <= r.getLong(1) + 1e-6,
          s"alloc over avail for ${r.getString(0)}")
    }
  }

  test("budgetFrac 1.0 takes every group whole") {
    val df = Seq(("a", 10L), ("b", 20L), ("c", 30L)).toDF("k", "a")
    val got = WaterFill.allocate(df, col("k"), col("a"), budgetFrac = 1.0d)
      .collect()
    assert(got.forall(_.getBoolean(2)))
    for (r <- got) assert(r.getDouble(3) === r.getLong(1).toDouble)
  }
}
