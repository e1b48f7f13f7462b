package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mattr kernel ≡ the round-9 declarative MATTR formulation
  * (per-window `array_distinct(slice(...))`), on the fixture corpus
  * and on adversarial vocabularies chosen to break prev-occurrence
  * arithmetic: repeats at lag exactly w−1 / w / w+1 (the boundary
  * where "new in window" flips), doc length exactly w and w−1,
  * all-equal tokens, multi-space runs, empty text. */
class MattrEquivalenceSpec extends SparkSpec {

  private def oldFormulation(w: Int) = expr(
    s"""CASE WHEN size(toks) >= $w THEN
       |  aggregate(transform(sequence(0, size(toks) - $w),
       |    i -> cast(size(array_distinct(slice(toks, i + 1, $w)))
       |           AS bigint)),
       |    0L, (acc, x) -> acc + x) ELSE 0L END""".stripMargin)

  private def check(texts: Seq[String], w: Int): Unit = {
    import spark.implicits._
    val rows = texts.toDF("text")
      .withColumn("toks", filter(split(col("text"), " "), t => length(t) > 0))
      .select(col("text"),
        size(col("toks")).cast("long").as("old_n"),
        oldFormulation(w).as("old_sum"),
        Mattr.mattrWindow(col("text"), w).as("mw"))
      .collect()
    rows.foreach { r =>
      val mw = r.getSeq[Long](3)
      assert(mw(0) === r.getLong(1), s"n_tokens for '${r.getString(0)}'")
      assert(mw(1) === r.getLong(2), s"sum_distinct for '${r.getString(0)}'")
    }
  }

  test("kernel ≡ declarative ladder on the documents fixture corpus") {
    val texts = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    assert(texts.size === 500)
    check(texts, 25)
  }

  test("adversarial vocabularies at small w") {
    def rep(t: String, n: Int) = Seq.fill(n)(t).mkString(" ")
    val w = 4
    val cases = Seq(
      "", " ", "a", "a  b   c", // empties / multi-space runs
      rep("x", 3), rep("x", 4), rep("x", 5), // length w−1 / w / w+1
      "a b c a b c a b c a", // repeats at lag 3 = w−1
      "a b c d a b c d a", // repeats at lag 4 = w
      "a b c d e a b c d e a", // repeats at lag 5 = w+1
      "a a a a a a a a", // all-equal
      "a b a b a b a b a b", // alternating inside every window
      "q w e r t y u i o p") // all-distinct
    check(cases, w)
    check(cases, 1) // w=1: every window is a single token
  }

  test("t30 at w=25 over planted long docs") {
    val r = new scala.util.Random(7)
    val vocab = (0 until 12).map(i => s"tok$i")
    val docs = (0 until 50).map { _ =>
      (0 until (20 + r.nextInt(60))).map(_ => vocab(r.nextInt(vocab.size)))
        .mkString(" ")
    }
    check(docs, 25)
  }
}
