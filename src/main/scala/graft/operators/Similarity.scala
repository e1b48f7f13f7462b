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

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with
    * cosine ≥ threshold. The exact quadratic ground truth — at 100 TB
    * pre-filter with [[hyperplaneSignature]] buckets and verify pairs
    * with this formula. The threshold applies to the rounded value so
    * the cut is reproducible across engines. */
  def embeddingNearDupPairs(
      corpus: DataFrame,
      idCol: Column,
      vecCol: Column,
      threshold: Double,
      dim: Int = 64,
      roundDigits: Int = 5): DataFrame = {
    // Dense O(n²/2) numeric kernel: the join-based plan spends ~95% of
    // its time copying the two float arrays into every joined row
    // (measured 25 µs/pair); a broadcast + tight double-accumulation
    // loop does the same math at memory bandwidth. The broadcast side
    // must fit an executor — the same constraint as any broadcast
    // dim; for larger corpora pre-bucket with [[hyperplaneSignature]]
    // and run this kernel per bucket. Accumulation order (ascending
    // index, left-to-right) matches the SQL oracle's list_sum exactly.
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(idCol.cast("long").as("id"), vecCol.as("vec"))
      .as[(Long, Array[Float])]
    val all = vecs.collect().sortBy(_._1)
    val norms = all.map { case (_, v) =>
      var s = 0.0d; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((all, norms))
    vecs.mapPartitions { it =>
      val (vs, ns) = bc.value
      it.flatMap { case (ida, va) =>
        var sa = 0.0d; var i = 0
        while (i < va.length) { sa += va(i).toDouble * va(i).toDouble; i += 1 }
        val na = math.sqrt(sa)
        vs.iterator.zipWithIndex
          .filter { case ((idb, _), _) => idb > ida }
          .flatMap { case ((idb, vb), j) =>
            var dot = 0.0d; var k = 0
            while (k < va.length) { dot += va(k).toDouble * vb(k).toDouble; k += 1 }
            val sim = BigDecimal(dot / (na * ns(j)))
              .setScale(roundDigits, BigDecimal.RoundingMode.HALF_UP)
              .toDouble
            if (sim >= threshold) Some((ida, idb, sim)) else None
          }
      }
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
