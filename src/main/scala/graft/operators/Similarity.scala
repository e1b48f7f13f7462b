package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.phash

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Brute-force cosine top-k is the correctness baseline (and exactly
  * what the DuckDB oracle reproduces); random-hyperplane LSH bucketing
  * is the 100 TB path: queries only compare against their bucket,
  * turning an O(N·Q) cross join into a bucket-partitioned join.
  *
  * Dot products run as codegen'd `aggregate(zip_with(...))` over
  * double-cast elements — float×float is exact in double, so the only
  * FP nondeterminism is summation order, which is fixed (left-to-right)
  * for both Spark and the oracle's identical formula.
  */
object Similarity {

  /** Sequential-order dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** cosine(a,b) on float/double array columns. */
  def cosine(a: Column, b: Column): Column = {
    val (ad, bd) = (asDouble(a), asDouble(b))
    dot(ad, bd) / sqrt(dot(ad, ad) * dot(bd, bd))
  }

  /** Exact top-k neighbors for each query vector.
    * queries: (qid, qvec), corpus: (vec_id, embedding). The query side
    * is broadcast (small by construction), so the scan over the corpus
    * is a single pass with no shuffle until the per-qid top-k, which is
    * a partitionBy(qid) window over k·|Q| surviving rows.
    * Similarity is rounded to `roundDigits` to make cross-engine
    * ordering deterministic. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      roundDigits: Int = 5,
      excludeSelf: Boolean = true): DataFrame = {
    val joined = corpus.join(broadcast(queries),
      if (excludeSelf) col("qid") =!= col("vec_id") else lit(true))
    val sims = joined.select(
      col("qid"), col("vec_id"),
      round(cosine(col("qvec"), col("embedding")), roundDigits).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }

  /** `nBits`-bit random-hyperplane signature of a vector: bit i = sign
    * of the dot product with a deterministic pseudo-random ±1
    * hyperplane derived from portable hashes of (i, dim). */
  def hyperplaneSignature(vec: Column, nBits: Int): Column = {
    val sigBits = (0 until nBits).map { i =>
      // ±1 component per dimension: parity of phash(i, dim)
      val proj = aggregate(
        zip_with(
          asDouble(vec),
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
    val cb = corpus.withColumn("bucket", hyperplaneSignature(col("embedding"), nBits))
    val joined = cb.join(broadcast(qb), Seq("bucket"))
      .where(col("qid") =!= col("vec_id"))
    val sims = joined.select(
      col("qid"), col("vec_id"),
      round(cosine(col("qvec"), col("embedding")), roundDigits).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy(col("qid"), col("rank"))
  }
}
