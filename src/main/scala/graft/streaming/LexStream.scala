package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Bm25

/** Streaming lexical (BM25) indexing and serving — the text twin of
  * [[AnnStream]]: documents stream INTO a growing at-rest index,
  * query batches stream AGAINST it.
  *
  * Ingest ([[startIngest]]): each micro-batch's postings OVERWRITE
  * `indexPath/epoch=N` (stride-sharded inside), then the idf/stats
  * sidecar refreshes via a staged swap. A replayed epoch (crash
  * between sink write and offset commit) rewrites its own directory
  * with identical content instead of double-counting term
  * frequencies, and re-runs a refresh that is idempotent by
  * construction — the AnnStream epoch protocol applied to index
  * ingest. A crash BETWEEN the epoch write and the sidecar swap
  * leaves stats one batch stale; the terms of the unrefreshed epoch
  * simply don't match until the replay completes the refresh (bounded
  * staleness, never wrong membership).
  *
  * Per-epoch cost: the postings write is ∝ batch; the sidecar refresh
  * aggregates the full postings table (term/doc_id/dl — three narrow
  * columns, term-dominated). On an unbounded corpus that refresh is
  * the term: amortize it with `refreshEvery` (sidecar refreshes on
  * every K-th epoch and at every replay of one), trading bounded idf
  * staleness for K× less refresh work — Lucene's deferred global
  * stats, made explicit. With `refreshEvery > 1` the staleness is
  * bounded only while the stream RUNS: a stream that stops (an
  * AvailableNow backfill, a planned shutdown) may end on unrefreshed
  * trailing epochs — run [[finalizeIngest]] after `q.stop()` /
  * `awaitTermination` to fold them in.
  *
  * Serving ([[startSearch]]): [[Bm25.searchAt]] per query micro-batch
  * — stride-pruned scan, epoch directories are just another partition
  * level — into `batch_id=N` overwrite sinks, exactly as AnnStream
  * serves vectors.
  */
object LexStream {

  /** Stream `docs` ((doc_id, text) rows) into a growing BM25 index at
    * `indexPath`. */
  def startIngest(docs: DataFrame, indexPath: String, checkpoint: String,
      idCol: Column, textCol: Column,
      k1: Double = 1.2, b: Double = 0.75, refreshEvery: Int = 1,
      backfill: Boolean = false): StreamingQuery = {
    require(refreshEvery >= 1, s"refreshEvery must be >= 1: $refreshEvery")
    val w = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestEpoch(batch, indexPath, idCol, textCol, batchId,
          k1, b, refreshEvery)
        ()
      }
    (if (backfill) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** One ingest epoch — the foreachBatch body, exposed so the replay
    * spec (and an external exactly-once orchestrator) can drive it
    * directly. */
  private[streaming] def ingestEpoch(batch: DataFrame, indexPath: String,
      idCol: Column, textCol: Column, epoch: Long,
      k1: Double, b: Double, refreshEvery: Int): Unit = {
    val spark = batch.sparkSession
    Bm25.writeEpoch(spark, indexPath, batch, idCol, textCol, epoch, k1, b)
    if (epoch % refreshEvery == 0)
      Bm25.refreshMeta(spark, indexPath, k1, b)
  }

  /** Fold any unrefreshed trailing epochs into the sidecar — call
    * after a `refreshEvery > 1` ingest stream stops. Idempotent (the
    * refresh recomputes from the full postings tree). */
  def finalizeIngest(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, k1: Double = 1.2, b: Double = 0.75): Unit =
    Bm25.refreshMeta(spark, indexPath, k1, b)

  /** Serve a persisted BM25 index (batch OR epoch layout) per query
    * micro-batch of `queries` ((qid, qtext) rows). */
  def startSearch(queries: DataFrame, indexPath: String, outDir: String,
      checkpoint: String, topK: Int = 5,
      backfill: Boolean = false): StreamingQuery = {
    val w = queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Bm25.searchAt(batch.sparkSession, indexPath, batch, topK)
          .write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")
        ()
      }
    (if (backfill) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
