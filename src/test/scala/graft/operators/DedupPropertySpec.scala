package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized cross-checks of the round-5 dedup/rank operators
  * against naive in-memory references — seeded, so deterministic.
  * Docs are word sequences over a small vocabulary so shingle
  * collisions, ties and containment chains all actually occur. */
class DedupPropertySpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(7)
  private val vocab = ('a' to 'p').map(c => s"w$c")

  // 80 docs: random 5–30 word texts, some exact copies, some prefixes
  private val texts: Seq[(Long, String)] = {
    val base = (1 to 60).map { i =>
      (i.toLong,
        Seq.fill(5 + rnd.nextInt(26))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
    val copies = (1 to 10).map { i =>
      (100L + i, base(rnd.nextInt(base.size))._2)
    }
    val prefixes = (1 to 10).map { i =>
      val src = base(rnd.nextInt(base.size))._2.split(" ")
      (200L + i, src.take(3 + rnd.nextInt(src.length)).mkString(" "))
    }
    base ++ copies ++ prefixes
  }

  private def shingleSet(text: String, n: Int): Set[String] =
    text.split(" ").sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSet

  test("containmentPairs matches the naive set computation") {
    val df = texts.toDF("doc_id", "text")
    val threshold = 0.5
    val got = Dedup.containmentPairs(df, col("doc_id"), col("text"),
      n = 3, threshold = threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

    val sets = texts.map { case (id, t) => id -> shingleSet(t, 3) }
      .filter(_._2.nonEmpty).toMap
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      common = (sa & sb).size if common > 0
      ca = common.toDouble / sa.size
      cb = common.toDouble / sb.size
      if ca >= threshold || cb >= threshold
    } yield (a, b) -> (common.toLong, ca, cb)).toMap

    assert(want.nonEmpty, "constructed corpus must contain pairs")
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (common, ca, cb)) =>
      val (wc, wa, wb) = want(k)
      assert(common === wc, s"pair $k common")
      assert(math.abs(ca - wa) < 1e-9 && math.abs(cb - wb) < 1e-9, s"$k")
    }
  }

  test("containment dominates jaccard on every co-occurring pair") {
    val df = texts.toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, col("doc_id"), col("text"),
      n = 3, threshold = 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        math.max(r.getDouble(3), r.getDouble(4))).toMap
    val jac = Dedup.jaccardPairs(df, col("doc_id"), col("text"),
      n = 3, threshold = 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac.keySet === cont.keySet)
    jac.foreach { case (k, j) =>
      assert(cont(k) >= j - 1e-9, s"pair $k: containment ${cont(k)} < $j")
    }
  }

  test("globalRowNumber matches sort order on random data with ties") {
    // heavy ties: keys drawn from just 10 values
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(10).toDouble))
    val df = rows.toDF("id", "v")
    val got = Rank.globalRowNumber(df, col("v"), col("id"),
      nBuckets = 8, descending = true)
      .select(col("id"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.sortBy { case (id, v) => (-v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got === want)
  }
}
