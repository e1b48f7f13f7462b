package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions

/** Streaming corpus ingest — the curation pipeline (p1's quality/lang
  * gate, exact dedup, PII scrub) applied AT INGEST instead of as a
  * batch pass: documents stream in, junk and duplicates never reach
  * storage.
  *
  * Everything except the dedup is a stateless projection, so the batch
  * operators from [[graft.functions.TextFunctions]] compose onto the
  * stream unchanged (batch ≡ stream parity is spec-pinned). The dedup
  * is `dropDuplicatesWithinWatermark` on the content hash: state is
  * bounded by the watermark delay × arrival rate, not the stream's
  * lifetime — on an unbounded feed that is the difference between a
  * working pipeline and an OOM (`StreamDedup`'s rationale). Exact
  * copies arriving farther apart than the delay fall through to the
  * periodic batch dedup (d1/d7), the standard lambda split.
  *
  * Input schema: (doc_id, text, lang, ingest_ts).
  */
object DocStream {

  /** The curation transform: quality ∧ language gate, PII scrub,
    * exact dedup. Works on batch AND streaming frames (the parity
    * spec runs both): streaming dedups within the watermark (first
    * arrival wins), batch keeps the min-ingest-ts row per hash — the
    * same winner when arrival order follows event time. */
  def curate(docs: DataFrame, minQuality: Double = 0.3,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val wm = if (docs.isStreaming)
      docs.withWatermark("ingest_ts", watermarkDelay) else docs
    val gated = wm
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("lang_guess", TextFunctions.langGuess(col("text")))
      .where(col("quality") >= minQuality &&
        col("lang_guess") === col("lang"))
      // sha2-256, not md5: the MediaStream rationale (round-8
      // advisory) — md5 collisions are practically constructible, so
      // a poisoned crawl could ship a colliding doc that shadows a
      // distinct legitimate one at the dedup. Callers supplying
      // `knownHashes` to curateIncremental must hash the corpus with
      // the same function (schema-change note: pre-round-8
      // checkpoints/dedup state keyed on md5 need a fresh start).
      .withColumn("text_hash", sha2(col("text"), 256))
      .withColumn("clean_text", TextFunctions.scrubPii(col("text")))
      .select(col("doc_id"), col("ingest_ts"), col("lang"),
        col("quality"), col("text_hash"), col("clean_text"))
    if (docs.isStreaming)
      StreamDedup.withinWatermark(gated, Seq("text_hash"))
    else
      graft.operators.Dedup.keepOnePerGroup(gated,
        Seq(col("text_hash")), Seq(col("ingest_ts"), col("doc_id")))
  }

  /** [[curate]] plus dedup against the EXISTING corpus: a
    * stream-static left-anti join on the content hash drops documents
    * whose exact text is already stored — within-stream copies are
    * handled by the watermark dedup, historical copies by this join.
    * `knownHashes` is a static (text_hash) frame (e.g. a projection
    * of the curated corpus; at 100 TB a bucketed table on text_hash,
    * re-snapshotted between runs — the standard incremental-ingest
    * split: the static side refreshes per batch job, not per
    * micro-batch). */
  def curateIncremental(docs: DataFrame, knownHashes: DataFrame,
      minQuality: Double = 0.3,
      watermarkDelay: String = "10 seconds"): DataFrame =
    curate(docs, minQuality, watermarkDelay)
      .join(knownHashes.select(col("text_hash")), Seq("text_hash"),
        "left_anti")

  /** [[curateIncremental]] extended to NEAR-duplicates: each
    * micro-batch runs the batch curation, drops exact known hashes,
    * then matches the remainder against an at-rest
    * [[graft.operators.NearDupIndex]] and drops every doc with a
    * verified Jaccard match — streaming ingest that rejects fuzzy
    * mirrors of the stored corpus, not just byte-identical copies.
    *
    * Runs inside `foreachBatch` (the AnnStream/T10 pattern): the LSH
    * match needs per-batch bucket groupBys and a DPP-pruned corpus
    * join, not expressible as an incremental streaming plan — and
    * per-batch cost stays batch-proportional by the index's own
    * contract. Matching shingles the post-scrub `clean_text` (what
    * would be stored). Each epoch OVERWRITEs `outDir/batch_id=N`
    * (day-partitioned inside), so replays are idempotent — the
    * AnnStream epoch protocol. Same-batch near-dup PAIRS (neither doc
    * in the corpus yet) pass through; they resolve at the next index
    * refresh, the standard lambda split for fuzzy dedup.
    */
  def startIncrementalNearDup(docs: DataFrame, knownHashes: DataFrame,
      indexPath: String, outDir: String, checkpoint: String,
      minQuality: Double = 0.3, n: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.2,
      backfill: Boolean = false): StreamingQuery = {
    val w = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch frame is non-streaming, so the incremental
        // curation is the SAME code path as the batch operator
        val cur = curateIncremental(batch, knownHashes, minQuality)
          .cache()
        val losers = graft.operators.NearDupIndex.matchNew(
            batch.sparkSession, indexPath, cur, col("doc_id"),
            col("clean_text"), n, numHashes, bands, threshold)
          .select(col("new_id").as("doc_id")).distinct()
        cur.join(losers, Seq("doc_id"), "left_anti")
          .withColumn("ingest_date", to_date(col("ingest_ts")))
          .write.mode("overwrite").partitionBy("ingest_date")
          .parquet(s"$outDir/batch_id=$batchId")
        // the one cache is ours; matchNew holds none (its frames
        // recompute off the batch) — epoch state stays bounded
        cur.unpersist(blocking = false)
        ()
      }
    (if (backfill)
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else w).start()
  }

  /** Ingest-time drift alarm: per micro-batch, the per-source KL
    * divergence of the batch's unigram distribution against a STATIC
    * reference profile (`reference` = (tok, ref_cnt), e.g. the
    * at-rest corpus token counts — re-snapshotted between runs like
    * `curateIncremental`'s hash set). Runs the BATCH operator
    * [[graft.operators.Drift.klAgainst]] inside `foreachBatch`
    * (batch ≡ stream by construction — the repo's foreachBatch
    * convention), because windowed KL needs two aggregation levels
    * (per-(window,tok) counts, then per-window totals) that a single
    * incremental streaming plan cannot express. Each epoch OVERWRITEs
    * `outDir/batch_id=N`, so replays are idempotent. Output rows:
    * (slice, n_tokens, kl_nats) per batch — the admit-or-alarm signal
    * BEFORE a batch joins the corpus. */
  def startDriftMonitor(docs: DataFrame, reference: DataFrame,
      outDir: String, checkpoint: String,
      sliceCol: org.apache.spark.sql.Column = col("lang")): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // explicit persist + unpersist per epoch (NOT Dedup.share):
        // a resident monitor must not grow the cache catalog by one
        // entry per micro-batch — startIncrementalNearDup's
        // "epoch state stays bounded" discipline
        val counts = graft.operators.Drift
          .sliceCounts(batch, sliceCol, col("text")).persist()
        try
          graft.operators.Drift.klAgainstCounts(counts, reference)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        finally counts.unpersist(blocking = false)
        ()
      }
      .start()

  /** Run the curation stream into day-partitioned parquet (retention
    * by partition drop, as the position sink does). `backfill = true`
    * runs with `Trigger.AvailableNow`: process everything already in
    * the source in rate-limited micro-batches, then terminate — the
    * catch-up mode after downtime or for an initial corpus load, with
    * the same checkpoint (and so exactly-once hand-off back to the
    * continuous trigger). */
  def start(docs: DataFrame, outDir: String, checkpoint: String,
      minQuality: Double = 0.3, backfill: Boolean = false): StreamingQuery = {
    val w = curate(docs, minQuality)
      .withColumn("ingest_date", to_date(col("ingest_ts")))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy("ingest_date")
      .outputMode("append")
    (if (backfill)
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else w).start()
  }
}
