package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized cross-checks of the distributed pipeline operators
  * against naive in-memory reference implementations — seeded, so
  * deterministic. */
class PipelinePropertySpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(1234)

  test("packReport matches a local sort-and-cumsum on random inputs") {
    val docs = (1L to 200L).map(i => (i, rnd.nextInt(700) + 1))
    val budget = 512L
    val nBuckets = 8
    // local reference: the same deterministic global order (bucket,
    // key, id), one sequential cumulative sum
    def key(id: Long): Long = Similarity.phashLocal(s"$id#13")
    val ordered = docs.sortBy { case (id, _) =>
      (key(id) % nBuckets, key(id), id)
    }
    var off = 0L
    val expect = ordered.map { case (id, n) =>
      val row = (id, n.toLong, off, off / budget,
        (off + n - 1) / budget, (off + n - 1) / budget - off / budget + 1)
      off += n
      row
    }.sortBy(_._1)
    val got = Pack.packReport(docs.toDF("id", "n"), col("id"), col("n"),
        budget, nBuckets)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
  }

  test("connectedComponents matches local union-find on random graphs") {
    // sparse random graph over 120 nodes: many small components, some
    // chains, some isolated-by-absence nodes
    val pairs = (1 to 90).map { _ =>
      val a = rnd.nextInt(120).toLong
      val b = rnd.nextInt(120).toLong
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }.distinct

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val expect = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => n -> find(n)).toMap

    val got = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }
}
