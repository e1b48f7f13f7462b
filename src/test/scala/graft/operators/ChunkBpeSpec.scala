package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Chunk.tokenWindows]] invariants on random documents and
  * [[Bpe.mergePairs]] against a naive in-memory count — seeded, so
  * deterministic. */
class ChunkBpeSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(4242)

  test("chunk windows cover every token and always add new tokens") {
    val w = 32; val stride = 24
    // token counts spanning 1 token .. several windows, incl. exact
    // multiples of stride and of w
    val docs = ((1 to 60).map(i => (i.toLong, rnd.nextInt(120) + 1)) ++
      Seq((101L, 1), (102L, w), (103L, stride), (104L, w + 1),
        (105L, 2 * stride), (106L, 3 * w)))
      .map { case (id, n) => (id, (1 to n).map(t => s"t$t").mkString(" ")) }
    val out = Chunk.tokenWindows(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), w, stride)
      .collect().groupBy(_.getLong(0))
    assert(out.size === docs.size)
    for ((id, text) <- docs) {
      val n = text.split(" ").length
      val chunks = out(id).sortBy(_.getLong(3))
      assert(chunks.forall(_.getLong(1) == n))
      assert(chunks.forall(_.getLong(2) == chunks.length))
      assert(chunks.map(_.getLong(3)).toSeq === (0L until chunks.length))
      val starts = chunks.map(_.getLong(4))
      assert(starts.head === 1L)
      assert(starts.toSeq === starts.sorted.toSeq)
      // coverage: last window reaches the final token
      assert(starts.last + w - 1 >= n)
      // progress: consecutive starts differ by exactly stride, and no
      // window is fully contained in its predecessor
      starts.sliding(2).foreach {
        case Array(a, b) => assert(b - a === stride)
        case _ =>
      }
      chunks.foreach { c =>
        val st = c.getLong(4); val len = c.getLong(5)
        assert(len === math.min(w.toLong, n - st + 1))
        assert(len >= w - stride + 1 || chunks.length == 1)
      }
    }
  }

  test("chunk hashes are the md5 of the space-joined window") {
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val out = Chunk.tokenWindows(Seq((7L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), w = 32, stride = 24)
      .orderBy("chunk_id").collect()
    val toks = text.split(" ")
    assert(out.length === 2) // n=50: starts 1, 25 (42 would exceed n-8)
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out.foreach { c =>
      val st = c.getLong(4).toInt
      val expect = toks.slice(st - 1, math.min(st - 1 + 32, toks.length))
      assert(c.getString(6) === md5Hex(expect.mkString(" ")))
    }
  }

  test("bpe merge pairs match a naive weighted count") {
    val words = Seq("low", "lower", "newest", "widest", "aaa", "x")
    val corpus = (1 to 120).map { i =>
      (i.toLong, (1 to 8).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" "))
    }
    val naive = corpus.flatMap(_._2.split(" ")).filter(_.length >= 2)
      .flatMap(wd => wd.sliding(2).map(p => (p, wd)))
      .groupBy(_._1)
      .map { case (p, occ) =>
        (p, occ.size.toLong, occ.map(_._2).distinct.size.toLong) }
      .toSeq.sortBy(r => (-r._2, r._1))
    val got = Bpe.mergePairs(corpus.toDF("doc_id", "text"),
        col("text"), topK = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === naive)
    // "aaa" contributes the pair "aa" twice per occurrence
    val aa = got.find(_._1 == "aa").get
    val aaaOcc = corpus.flatMap(_._2.split(" ")).count(_ == "aaa")
    assert(aa._2 === 2L * aaaOcc && aa._3 === 1L)
  }

  test("bpe topK cut is deterministic: ties break on pair ascending") {
    val df = Seq((1L, "ab cd ab cd ef")).toDF("doc_id", "text")
    val got = Bpe.mergePairs(df, col("text"), topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("ab", 2L), ("cd", 2L)))
  }
}
