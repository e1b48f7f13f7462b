package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotProduct.dotF
import graft.functions.PortableHash.phash

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Brute-force cosine top-k is the correctness baseline (and exactly
  * what the DuckDB oracle reproduces); random-hyperplane LSH bucketing
  * is the 100 TB path: queries only compare against their bucket,
  * turning an O(N·Q) cross join into a bucket-partitioned join.
  *
  * Dot products are unrolled to a static sum of `element_at` products:
  * higher-order functions (`zip_with`/`aggregate`) run interpreted
  * with per-row allocations (measured ~10× slower), while the unrolled
  * form stays in whole-stage codegen. float×float is exact in double,
  * and the left-to-right add order matches the oracle's `list_sum`.
  * Norms are computed once per vector, not once per pair.
  */
object Similarity {

  /** Codegen-friendly dot product for a known dimension. */
  def dotFixed(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  /** Generic-dimension dot product (interpreted; prefer [[dotFixed]]). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  /** Norm via the native dot-product expression (any dimension). */
  def norm(v: Column): Column = sqrt(dotF(v, v))

  /** cosine via precomputed norms: dot / (normA·normB). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dotF(a, b) / (normA * normB)

  /** Exact top-k neighbors for each query vector.
    * queries: (qid, qvec), corpus: (vec_id, embedding). The query side
    * is broadcast (small by construction) with its norms precomputed,
    * so the corpus scan is a single pass with no shuffle until the
    * per-qid top-k window (which WindowGroupLimit prunes).
    * Similarity is rounded to `roundDigits` to make cross-engine
    * ordering deterministic. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      roundDigits: Int = 5,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.withColumn("qnorm", norm(col("qvec")))
    val c = corpus.withColumn("vnorm", norm(col("embedding")))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
    val sims = joined.select(
      col("qid"), col("vec_id"),
      round(cosineWithNorms(col("qvec"), col("embedding"),
        col("qnorm"), col("vnorm")), roundDigits).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  private def normOf(v: Array[Float]): Double = {
    var s = 0.0d; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with
    * cosine ≥ threshold — EXACT (no candidate filter), computed
    * distributed via triangle block partitioning.
    *
    * Each vector lands in block `id % nBlocks`; every unordered block
    * pair (i ≤ j) becomes one task that runs a dense O(|i|·|j|)
    * double-accumulation kernel over just those two blocks. The
    * join-based plan spends ~95% of its time copying the two float
    * arrays into every joined row (measured 25 µs/pair); here each
    * vector is shuffled `nBlocks` times total and the kernel does the
    * math at memory bandwidth. Per-task memory is 2·n/nBlocks vectors
    * — `nBlocks` is the scale knob (grow it ∝ √corpus to hold
    * per-task memory constant; work stays n²/2 overall but spread
    * over nBlocks·(nBlocks+1)/2 parallel tasks). No driver collect,
    * no broadcast of the corpus.
    *
    * At 100 TB pre-filter with [[hyperplaneSignature]] buckets or
    * [[graft.operators.Dedup.minhashCandidates]] and verify only
    * candidates; this operator is the exact ground truth. The
    * threshold applies to the rounded value so the cut is
    * reproducible across engines. */
  def embeddingNearDupPairs(
      corpus: DataFrame,
      idCol: Column,
      vecCol: Column,
      threshold: Double,
      roundDigits: Int = 5,
      nBlocks: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nB = nBlocks
    val vecs = corpus.select(idCol.cast("long").as("id"), vecCol.as("vec"))
      .as[(Long, Array[Float])]
    // Replicate each vector to every block pair containing its block.
    val replicated = vecs.flatMap { case (id, v) =>
      val b = ((id % nB) + nB).toInt % nB
      val pids = (b until nB).map(j => b * nB + j) ++
        (0 until b).map(i => i * nB + b)
      pids.map(pid => (pid, id, v))
    }
    // Below this raw-double bound a value can never round up to the
    // threshold — the expensive exact BigDecimal rounding only runs on
    // the (rare) pairs at or above it.
    val preBound = threshold - 0.5 * math.pow(10, -roundDigits) - 1e-12
    replicated.groupByKey(_._1).flatMapGroups { (pid, it) =>
      val i = pid / nB; val j = pid % nB
      val rows = it.map { case (_, id, v) => (id, v, normOf(v)) }.toArray
      val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      def kernel(ida: Long, va: Array[Float], na: Double,
          idb: Long, vb: Array[Float], nb: Double): Unit = {
        var dot = 0.0d; var k = 0
        while (k < va.length) { dot += va(k).toDouble * vb(k).toDouble; k += 1 }
        val raw = dot / (na * nb)
        if (raw >= preBound) {
          val sim = BigDecimal(raw)
            .setScale(roundDigits, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
          if (sim >= threshold)
            hits += ((math.min(ida, idb), math.max(ida, idb), sim))
        }
      }
      if (i == j) {
        // intra-block: all (a < b) pairs within one block
        var a = 0
        while (a < rows.length) {
          val (ida, va, na) = rows(a)
          var b = a + 1
          while (b < rows.length) {
            val (idb, vb, nb) = rows(b)
            kernel(ida, va, na, idb, vb, nb)
            b += 1
          }
          a += 1
        }
      } else {
        // cross-block: every (left ∈ i, right ∈ j) pair, exactly once
        val left = rows.filter { case (id, _, _) => ((id % nB) + nB) % nB == i }
        val right = rows.filter { case (id, _, _) => ((id % nB) + nB) % nB == j }
        var a = 0
        while (a < left.length) {
          val (ida, va, na) = left(a)
          var b = 0
          while (b < right.length) {
            val (idb, vb, nb) = right(b)
            kernel(ida, va, na, idb, vb, nb)
            b += 1
          }
          a += 1
        }
      }
      hits.iterator
    }.toDF("id_a", "id_b", "sim")
  }

  /** `nBits`-bit random-hyperplane signature of a vector: bit i = sign
    * of the dot product with a deterministic pseudo-random ±1
    * hyperplane derived from portable hashes of (i, dim). */
  def hyperplaneSignature(vec: Column, nBits: Int): Column = {
    val sigBits = (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(
          transform(vec, _.cast("double")),
          transform(sequence(lit(0), size(vec) - 1),
            d => when(phash(d.cast("string"), i) % 2 === 0, 1.0d).otherwise(-1.0d)),
          (x, s) => x * s),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    sigBits.reduce(_ + _)
  }

  /** ANN via hyperplane-LSH bucketing: compare only within signature
    * buckets. Returns the same schema as [[bruteForceTopK]]; recall<1
    * by construction. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nBits: Int = 12,
      roundDigits: Int = 5): DataFrame = {
    val qb = queries.withColumn("bucket", hyperplaneSignature(col("qvec"), nBits))
      .withColumn("qnorm", norm(col("qvec")))
    val cb = corpus.withColumn("bucket", hyperplaneSignature(col("embedding"), nBits))
      .withColumn("vnorm", norm(col("embedding")))
    val joined = cb.join(broadcast(qb), Seq("bucket"))
      .where(col("qid") =!= col("vec_id"))
    val sims = joined.select(
      col("qid"), col("vec_id"),
      round(cosineWithNorms(col("qvec"), col("embedding"),
        col("qnorm"), col("vnorm")), roundDigits).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }
}
