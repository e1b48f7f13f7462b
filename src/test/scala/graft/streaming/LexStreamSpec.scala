package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Bm25

/** Streaming lexical indexing + serving: a streamed-in index serves
  * exactly what a batch build serves, epochs replay idempotently
  * (term frequencies never double-count), deferred stats refresh
  * converges, and the serving side streams query batches against the
  * growing index. */
class LexStreamSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def docRows(pred: org.apache.spark.sql.Column): Seq[(Long, String)] =
    docs.where(pred).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

  private def queriesDf = docs.where(col("doc_id") < 5)
    .select(col("doc_id").as("qid"),
      array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"))

  test("a streamed-in index serves exactly what a batch build serves") {
    implicit val sqlCtx = spark.sqlContext
    val idxDir = Files.createTempDirectory("lex-idx").resolve("i").toString
    val ckpt = Files.createTempDirectory("lex-ckpt").toString
    val in = MemoryStream[(Long, String)]
    val q = LexStream.startIngest(in.toDF().toDF("doc_id", "text"),
      idxDir, ckpt, col("doc_id"), col("text"))
    in.addData(docRows(col("doc_id") % 2 === 0))
    q.processAllAvailable()
    in.addData(docRows(col("doc_id") % 2 === 1))
    q.processAllAvailable()
    q.stop()

    val streamed = Bm25.searchAt(spark, idxDir, queriesDf, topK = 5)
      .collect().toSeq
    val batchDir = Files.createTempDirectory("lex-b").resolve("i").toString
    Bm25.persist(Bm25.build(docs, col("doc_id"), col("text")), batchDir)
    val batch = Bm25.searchAt(spark, batchDir, queriesDf, topK = 5)
      .collect().toSeq
    assert(streamed === batch)
  }

  test("a replayed epoch rewrites its directory: tf never double-counts") {
    val idxDir = Files.createTempDirectory("lex-rep").resolve("i").toString
    val half = docs.where(col("doc_id") < 250)
      .select(col("doc_id"), col("text"))
    LexStream.ingestEpoch(half, idxDir, col("doc_id"), col("text"),
      epoch = 0, k1 = 1.2, b = 0.75, refreshEvery = 1)
    val once = Bm25.searchAt(spark, idxDir, queriesDf, topK = 5)
      .collect().toSeq
    val postingsOnce = spark.read.parquet(idxDir).count()
    // crash-before-offset-commit: the same epoch runs again
    LexStream.ingestEpoch(half, idxDir, col("doc_id"), col("text"),
      epoch = 0, k1 = 1.2, b = 0.75, refreshEvery = 1)
    assert(spark.read.parquet(idxDir).count() === postingsOnce,
      "replay must not append duplicate postings")
    assert(Bm25.searchAt(spark, idxDir, queriesDf, topK = 5)
      .collect().toSeq === once)
  }

  test("deferred refresh: stale idf misses new terms, refresh converges") {
    val idxDir = Files.createTempDirectory("lex-def").resolve("i").toString
    val ingest = (epoch: Long, pred: org.apache.spark.sql.Column) =>
      LexStream.ingestEpoch(
        docs.where(pred).select(col("doc_id"), col("text")), idxDir,
        col("doc_id"), col("text"), epoch, 1.2, 0.75, refreshEvery = 2)
    ingest(0, col("doc_id") % 2 === 0) // refreshes (0 % 2 == 0)
    val marker = Seq((9999L, "zzzunique zzzunique")).toDF("doc_id", "text")
    LexStream.ingestEpoch(marker, idxDir, col("doc_id"), col("text"),
      epoch = 1, k1 = 1.2, b = 0.75, refreshEvery = 2) // deferred
    val q = Seq((0L, "zzzunique")).toDF("qid", "qtext")
    // the new term is in the postings but not yet in the idf sidecar
    assert(Bm25.searchAt(spark, idxDir, q, topK = 5).count() === 0)
    ingest(2, col("doc_id") < 0) // empty epoch, triggers the refresh
    val hits = Bm25.searchAt(spark, idxDir, q, topK = 5).collect()
    assert(hits.length === 1 && hits.head.getLong(1) === 9999L)
  }

  test("streamed query batches serve from the index (batch ≡ stream)") {
    implicit val sqlCtx = spark.sqlContext
    val idxDir = Files.createTempDirectory("lex-srv").resolve("i").toString
    Bm25.persist(Bm25.build(docs, col("doc_id"), col("text")), idxDir)
    val outDir = Files.createTempDirectory("lex-out").toString
    val ckpt = Files.createTempDirectory("lex-sckpt").toString
    val in = MemoryStream[(Long, String)]
    val q = LexStream.startSearch(in.toDF().toDF("qid", "qtext"),
      idxDir, outDir, ckpt, topK = 5)
    val qrows = queriesDf.as[(Long, String)].collect().toSeq
    in.addData(qrows.take(2))
    q.processAllAvailable()
    in.addData(qrows.drop(2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("qid", "doc_id", "score", "rank")
      .orderBy("qid", "rank").collect().toSeq
    val direct = Bm25.searchAt(spark, idxDir, queriesDf, topK = 5)
      .select("qid", "doc_id", "score", "rank")
      .orderBy("qid", "rank").collect().toSeq
    assert(streamed === direct)
  }
}
