package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.blockedEditPairs]] and [[Similarity.bitextMarginPairs]]
  * against naive in-memory references — seeded, so deterministic. */
class FuzzyBitextSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(777)

  test("blockedEditPairs matches a naive blocked levenshtein") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val words = Seq("alpha", "beta", "gamma", "delta")
    val rows = (1L to 80L).map { id =>
      val blk = words(rnd.nextInt(words.length))
      (id, blk + " " + (1 to 4).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString, blk)
    }
    val naive = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1
      d = lev(a._2, b._2) if d <= 3
    } yield (a._1, b._1, d.toLong)).sorted
    val got = Dedup.blockedEditPairs(rows.toDF("id", "v", "blk"),
        col("id"), col("v"), col("blk"), maxDist = 3, maxBlock = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("blockedEditPairs drops over-cap blocks wholesale") {
    val hot = (1L to 30L).map(id => (id, s"hot $id", "hot"))
    val cold = Seq((100L, "cold x", "cold"), (101L, "cold y", "cold"))
    val got = Dedup.blockedEditPairs((hot ++ cold).toDF("id", "v", "blk"),
        col("id"), col("v"), col("blk"), maxDist = 10, maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the 30-row hot block exceeds the cap: no pair from it survives
    assert(got.toSeq === Seq((100L, 101L)))
  }

  test("bitextMarginPairs matches a naive margin computation") {
    val k = 3
    def vec(): Array[Float] =
      Array.fill(8)(rnd.nextFloat() * 2 - 1)
    val left = (1L to 12L).map(i => (i, vec()))
    val right = (101L to 120L).map(i => (i, vec()))
    def cos6(a: Array[Float], b: Array[Float]): Long = {
      def dot(x: Array[Float], y: Array[Float]): Double =
        x.zip(y).foldLeft(0.0) { case (s, (p, q)) =>
          s + p.toDouble * q.toDouble }
      math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        * 1e6).toLong
    }
    val sims = for (l <- left; r <- right) yield (l._1, r._1, cos6(l._2, r._2))
    val fwd = sims.groupBy(_._1).map { case (q, s) =>
      q -> s.sortBy(x => (-x._3, x._2)).take(k).map(_._3).sum }
    val bwd = sims.groupBy(_._2).map { case (v, s) =>
      v -> s.sortBy(x => (-x._3, x._1)).take(k).map(_._3).sum }
    val naive = sims.groupBy(_._1).toSeq.map { case (q, s) =>
      val best = s.minBy(x => (-x._3, x._2))
      val den = fwd(q) + bwd(best._2)
      (q, best._2, math.rint(best._3 * 2.0 * k / den * 1e6) / 1e6)
    }.filter { case (q, v, _) => fwd(q) + bwd(v) > 0 }.sortBy(_._1)
    val got = Similarity.bitextMarginPairs(
        left.toDF("qid", "qvec"), right.toDF("vec_id", "embedding"),
        k, threshold = 1.0)
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length === naive.length)
    got.zip(naive).foreach { case ((gq, gv, gm), (nq, nv, nm)) =>
      assert(gq === nq && gv === nv)
      assert(math.abs(gm - nm) < 2e-6) // same fixed-point integers
    }
  }

  test("bitextMarginPairs accepts exactly margins >= threshold") {
    val left = (1L to 6L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
    val right = (11L to 30L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
    val out = Similarity.bitextMarginPairs(
        left.toDF("qid", "qvec"), right.toDF("vec_id", "embedding"),
        k = 3, threshold = 1.01)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(4) === (r.getDouble(3) >= 1.01))
    }
  }
}
