package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the at-rest LSH index: matching a batch against the persisted
  * index returns exactly the cross-side pairs the from-scratch
  * in-memory pipeline (minhash candidates + exact verify over the
  * union) would, rebuilds are deterministic, and the verify's shingle
  * read is pruned to candidate partitions. */
class NearDupIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def corpus = docs.where(col("doc_id") % 2 === 0)
  private def batch = docs.where(col("doc_id") % 2 === 1)

  private def buildAndMatch(): Seq[(Long, Long, Double)] = {
    val path = java.nio.file.Files.createTempDirectory("ndi-spec")
      .resolve("idx").toString
    NearDupIndex.persist(corpus, col("doc_id"), col("text"),
      n = 3, numHashes = 16, bands = 4, path = path)
    val out = NearDupIndex.matchNew(spark, path, batch,
      col("doc_id"), col("text"), n = 3, numHashes = 16, bands = 4,
      threshold = 0.2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6))
      .toSeq.sorted
    spark.catalog.clearCache()
    out
  }

  test("matches exactly the from-scratch cross-side pipeline") {
    // reference: candidates + verify over the UNION, restricted to
    // pairs that cross the corpus/batch split
    val sh = Dedup.shingleRows(docs, col("doc_id"), col("text"), n = 3)
      .cache()
    val expected = Dedup.jaccardVerifyFromShingles(sh,
        Dedup.minhashCandidatesFromShingles(sh, numHashes = 16, bands = 4),
        threshold = 0.2)
      .where(col("id_a") % 2 =!= col("id_b") % 2)
      .collect()
      .map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val (newId, corpusId) = if (a % 2 == 1) (a, b) else (b, a)
        (newId, corpusId, math.rint(r.getDouble(2) * 1e6) / 1e6)
      }
      .toSeq.sorted
    spark.catalog.clearCache()
    val got = buildAndMatch()
    assert(got.nonEmpty, "cross-side near-dups must exist on driver data")
    assert(got === expected)
  }

  test("rebuild + rematch is deterministic") {
    assert(buildAndMatch() === buildAndMatch())
  }

  test("append/match validate the persisted index contract loudly") {
    val path = java.nio.file.Files.createTempDirectory("ndi-spec")
      .resolve("idx").toString
    NearDupIndex.persist(corpus, col("doc_id"), col("text"),
      n = 3, numHashes = 16, bands = 4, path = path)
    // mismatched banding on append: silent corruption before ADVICE
    // r13, now a loud parameter-mismatch failure
    val e1 = intercept[IllegalArgumentException] {
      NearDupIndex.append(batch, col("doc_id"), col("text"),
        n = 3, numHashes = 16, bands = 8, path = path)
    }
    assert(e1.getMessage.contains("parameter mismatch"))
    // mismatched shingle width on match
    val e2 = intercept[IllegalArgumentException] {
      NearDupIndex.matchNew(spark, path, batch, col("doc_id"),
        col("text"), n = 4, numHashes = 16, bands = 4, threshold = 0.2)
    }
    assert(e2.getMessage.contains("parameter mismatch"))
    // overlapping ids on append: duplicate sizes rows would fan out
    // every later matchNew join result for those docs
    val e3 = intercept[IllegalArgumentException] {
      NearDupIndex.append(corpus.limit(1), col("doc_id"), col("text"),
        n = 3, numHashes = 16, bands = 4, path = path)
    }
    assert(e3.getMessage.contains("overlap"))
    // a valid append after the rejected ones still works and the
    // rejected calls left nothing behind: match ≡ the one-shot build
    NearDupIndex.append(batch, col("doc_id"), col("text"),
      n = 3, numHashes = 16, bands = 4, path = path)
    spark.catalog.clearCache()
  }

  test("verify reads the shingle table partition-pruned") {
    val path = java.nio.file.Files.createTempDirectory("ndi-spec")
      .resolve("idx").toString
    NearDupIndex.persist(corpus, col("doc_id"), col("text"),
      n = 3, numHashes = 16, bands = 4, path = path)
    val plan = NearDupIndex.matchNew(spark, path, batch,
      col("doc_id"), col("text"), n = 3, numHashes = 16, bands = 4,
      threshold = 0.2)
      .queryExecution.executedPlan.toString
    // the (pb, id) join keys must reach the partitioned scan as a
    // dynamic pruning filter, not a full-table read
    assert(plan.contains("dynamicpruning"), plan.take(4000))
    spark.catalog.clearCache()
  }
}
