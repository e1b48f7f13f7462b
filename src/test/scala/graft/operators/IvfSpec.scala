package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF ANN: deterministic builds, valid output shape, and useful
  * recall against the brute-force ground truth. */
class IvfSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private lazy val queries = emb.where(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("build is deterministic and covers the corpus") {
    val i1 = Ivf.build(emb, col("vec_id"), col("embedding"), k = 8)
    val i2 = Ivf.build(emb, col("vec_id"), col("embedding"), k = 8)
    assert(i1.assigned.count() === emb.count())
    val a1 = i1.assigned.select("id", "cid")
    val a2 = i2.assigned.select("id", "cid")
    assert(a1.exceptAll(a2).count() === 0)
    assert(i1.centroids.count() === 8)
  }

  test("bounded training sample yields a partition-invariant, usable index") {
    // cap below the corpus size forces the hash-stride sampling path;
    // decimal centroid means make the codebook (hence every cid)
    // identical under any input partitioning
    val i1 = Ivf.build(emb, col("vec_id"), col("embedding"), k = 8,
      trainSampleCap = 100)
    val i2 = Ivf.build(emb.repartition(5), col("vec_id"), col("embedding"),
      k = 8, trainSampleCap = 100)
    assert(i1.assigned.count() === emb.count()) // full corpus still assigned
    assert(i1.assigned.select("id", "cid")
      .exceptAll(i2.assigned.select("id", "cid")).count() === 0)
    val ivf = Ivf.search(i1, queries, topK = 10, nProbe = 3)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 10)
    val hit = ivf.select("qid", "vec_id")
      .intersect(exact.select("qid", "vec_id")).count()
    assert(hit / 100.0 >= 0.3, s"sampled-train recall ${hit / 100.0}")
  }

  test("search recall against brute force is substantial") {
    val index = Ivf.build(emb, col("vec_id"), col("embedding"), k = 8)
    val ivf = Ivf.search(index, queries, topK = 10, nProbe = 3)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 10)
    val hit = ivf.select("qid", "vec_id")
      .intersect(exact.select("qid", "vec_id")).count()
    val total = exact.count()
    val recall = hit.toDouble / total
    assert(total === 100)
    assert(recall >= 0.3, s"recall $recall too low")
    // probing everything must recover brute force exactly
    val full = Ivf.search(index, queries, topK = 10, nProbe = 8)
    assert(full.select("qid", "vec_id")
      .exceptAll(exact.select("qid", "vec_id")).count() === 0)
  }
}
