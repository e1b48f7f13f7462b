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

  test("simhash banding finds EVERY pair within the hamming bound") {
    // pigeonhole: hamming <= bands-1 implies one whole chunk agrees,
    // so banding must equal the brute-force pair scan exactly
    val base = (1 to 40).map(_ => rnd.nextLong() & ((1L << 60) - 1))
    val sims = base.zipWithIndex.flatMap { case (s, i) =>
      // each base fingerprint plus perturbations at hamming 1..4
      Seq((i * 10L, s)) ++ (1 to 3).map { d =>
        val flipped = (0 until d).foldLeft(s)((acc, j) =>
          acc ^ (1L << ((i * 7 + j * 13) % 60)))
        (i * 10L + d, flipped)
      }
    }.toDF("id", "simhash")
    val got = Dedup.simhashNearDupPairs(sims, maxHamming = 3, bands = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = sims.collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(got === expect)
    assert(expect.nonEmpty)
  }

  test("simhash mega-buckets drop under the cap, small buckets survive") {
    val sims = Seq(
      (1L, 7L), (2L, 7L), (3L, 7L), (4L, 7L), // 4-way identical: capped
      (10L, 99L), (11L, 99L))                 // pair: survives
      .toDF("id", "simhash")
    val pairs = Dedup.simhashNearDupPairs(sims, maxHamming = 3,
        bands = 4, maxBucketSize = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L)))
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
