package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins for the round-7 additions: MMR diversified re-ranking and
  * temperature mixture sampling. */
class MmrMixtureSpec extends SparkSpec {
  import spark.implicits._

  // --- Mmr ---

  /** naive reference: greedy MMR in plain Scala */
  private def naiveMmr(cands: Seq[(Long, Long, Double)],
      ps: Map[(Long, Long, Long), Double], selectK: Int,
      lambda: Double): Seq[(Long, Long, Long)] =
    cands.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
      val sims = cs.map(c => c._2 -> c._3).toMap
      var selected = Vector.empty[Long]
      val picks = scala.collection.mutable.Buffer.empty[(Long, Long, Long)]
      for (it <- 1 to selectK) {
        val rem = sims.keys.filterNot(selected.contains).toSeq
        if (rem.nonEmpty) {
          val scored = rem.map { c =>
            val sc =
              if (selected.isEmpty) sims(c)
              else lambda * sims(c) -
                (1 - lambda) * selected.map(s => ps((qid, c, s))).max
            (c, sc)
          }
          val best = scored.minBy { case (c, sc) => (-sc, c) }._1
          selected :+= best
          picks += ((qid, best, it.toLong))
        }
      }
      picks
    }

  private def randCase(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val cands = for (q <- 0L until 4L; c <- 0L until 8L)
      yield (q, 100 + c, math.rint(rnd.nextDouble() * 1e5) / 1e5)
    val ids = (0L until 8L).map(100 + _)
    val ps = (for (q <- 0L until 4L; a <- ids; b <- ids if a != b) yield {
      ((q, a, b), math.rint(rnd.nextDouble() * 1e5) / 1e5)
    }).toMap
    // symmetrize (cosine is): ps(a,b)=ps(b,a)
    val sym = ps.map { case ((q, a, b), v) =>
      if (a < b) ((q, a, b), v) else ((q, a, b), ps((q, b, a)))
    }
    (cands, sym)
  }

  test("MMR matches the naive greedy on random symmetric sims") {
    for (seed <- Seq(1, 7, 42)) {
      val (cands, ps) = randCase(seed)
      val cdf = cands.toDF("qid", "vec_id", "sim")
      val pdf = ps.toSeq.map { case ((q, a, b), v) => (q, a, b, v) }
        .toDF("qid", "id_a", "id_b", "psim")
      val got = Mmr.rerank(cdf, pdf, selectK = 5)
        .select(col("qid"), col("vec_id"), col("mmr_rank"))
        .as[(Long, Long, Long)].collect().toSet
      val want = naiveMmr(cands, ps, 5, 0.5).toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("rank 1 is the pure-relevance argmax; ranks are 1..k per query") {
    val (cands, ps) = randCase(3)
    val got = Mmr.rerank(cands.toDF("qid", "vec_id", "sim"),
      ps.toSeq.map { case ((q, a, b), v) => (q, a, b, v) }
        .toDF("qid", "id_a", "id_b", "psim"), selectK = 3)
    val byQ = got.collect().groupBy(_.getLong(0))
    assert(byQ.size === 4)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L))
      val top = cands.filter(_._1 == qid).maxBy(c => (c._3, -c._2))
      assert(rows.find(_.getLong(2) == 1L).get.getLong(1) === top._2)
    }
  }

  test("fewer candidates than selectK yields that many ranks") {
    val cdf = Seq((1L, 10L, 0.9), (1L, 11L, 0.8)).toDF("qid", "vec_id", "sim")
    val pdf = Seq((1L, 10L, 11L, 0.5), (1L, 11L, 10L, 0.5))
      .toDF("qid", "id_a", "id_b", "psim")
    assert(Mmr.rerank(cdf, pdf, selectK = 5).count() === 2)
  }

  test("missing pair coverage fails loudly, not silently") {
    val cdf = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7))
      .toDF("qid", "vec_id", "sim")
    // (12,10) direction missing
    val pdf = Seq((1L, 10L, 11L, 0.5), (1L, 11L, 10L, 0.5),
      (1L, 10L, 12L, 0.4), (1L, 12L, 11L, 0.3), (1L, 11L, 12L, 0.3))
      .toDF("qid", "id_a", "id_b", "psim")
    val e = intercept[Exception] {
      Mmr.rerank(cdf, pdf, selectK = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("missing pairs")))
  }

  // --- Mixture ---

  private def mixDocs(ns: Map[String, Int]) =
    ns.toSeq.flatMap { case (g, n) =>
      (0 until n).map(i => (s"$g-$i text ${i * 31}", g))
    }.toDF("text", "grp")

  test("temperature sampling: smallest group keeps everything") {
    val d = mixDocs(Map("big" -> 400, "small" -> 25))
    val kept = Mixture.temperatureSample(d, col("grp"),
      graft.functions.PortableHash.phash(col("text"), 5))
    val byG = kept.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    assert(byG("small") === 25L) // rate 1.0 → hash % 1e6 < 1e6 always
    // big keeps ≈ sqrt(25·400)=100 in expectation; hash-binomial, so
    // allow a generous band — the EXACT set is pinned by the oracle
    assert(byG("big") > 50L && byG("big") < 200L, byG("big"))
  }

  test("temperature sampling is invariant under repartitioning") {
    val d = mixDocs(Map("a" -> 120, "b" -> 40, "c" -> 13))
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixture.temperatureSample(df, col("grp"),
        graft.functions.PortableHash.phash(col("text"), 5))
        .select("text").as[String].collect().toSet
    assert(run(d) === run(d.repartition(13)))
  }

  test("T→∞ keeps rates flat at n_min/n_g; T=1 keeps everything") {
    val d = mixDocs(Map("a" -> 100, "b" -> 50))
    // T=1: alpha=0 → rate 1 for every group
    val t1 = Mixture.temperatureSample(d, col("grp"),
      graft.functions.PortableHash.phash(col("text"), 5), temperature = 1.0)
    assert(t1.count() === 150L)
    // huge T: rate_g → (n_min/n_g)^1 → expected kept ≈ n_min per group
    val tInf = Mixture.temperatureSample(d, col("grp"),
      graft.functions.PortableHash.phash(col("text"), 5),
      temperature = 1e9)
    val byG = tInf.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    assert(byG("b") === 50L)
    assert(byG("a") > 25L && byG("a") < 80L, byG("a"))
  }
}
