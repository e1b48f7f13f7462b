package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Multimodal

/** Streaming multimodal ingest: the batch media gates applied at the
  * stream, before blobs reach the corpus store — the mm-family twin
  * of `DocStream.start` / `EventStream.startQuarantine`.
  */
object MediaStream {

  /** Gate + dedup + day-partitioned sink for a stream of
    * (media_id, content binary, ingest_ts) rows.
    *
    * ==DATA-DELETING DEFAULT — `dropFlatImages = true`==
    * Since round 8 this gate PERMANENTLY DISCARDS solid-color BMPs at
    * ingest (sampled-gray population variance < 1000 — see the inline
    * threshold note). Valid blobs that earlier deployments stored now
    * never reach storage, and a pipeline restarting on an old
    * checkpoint gets no warning: the filter is stateless, so the
    * checkpoint replays fine and the blobs are just gone. Callers
    * that need archival (keep-everything) semantics must pass
    * `dropFlatImages = false` explicitly; the default serves the
    * curation deployments this library targets, where a flat
    * placeholder in the corpus is the bug.
    *
    * Gates (all metadata-level — headers parsed, pixel data never
    * decoded): NULL/short blobs (< 54 bytes can't even hold a BMP
    * header), oversize blobs (> `maxBytes` — the classic crawler
    * poison input), and images whose REAL parsed header reports a
    * degenerate dimension — BMP via pure codegen byte reads, PNG/
    * JPEG/GIF via the JDK ImageIO header probe
    * ([[Multimodal.withMetadata]]); only formats beyond ImageIO's
    * set keep the documented deterministic stub metadata and pass
    * the dimension gate by construction.
    *
    * Dedup: `dropDuplicatesWithinWatermark` on the content sha2-256
    * (not md5: collisions there are practically constructible, so a
    * poisoned crawl could ship a colliding blob that shadows a
    * distinct legitimate one inside the watermark — silent loss at
    * ingest; sha2-256 keeps the same bounded-state shape with a
    * collision-resistant key) — re-crawls and socket re-deliveries
    * collapse to one stored copy while state stays bounded by the
    * watermark (the StreamDedup convention). UPGRADE NOTE: the
    * round-8 md5→sha2-256 key swap changes the dedup operator's
    * state schema — a deployment restarting over a pre-change
    * checkpoint must start a FRESH checkpoint (and accepts that
    * in-flight md5-keyed dedup state cannot carry across the
    * upgrade), the same non-migration rule as
    * `AdsbStream.useRocksDbStateStore`. This is the one stage
    * that shuffles blobs (the
    * surviving row must land where its key decides); everything
    * before it is a pure projection, so the shuffle carries only
    * already-gated rows.
    */
  /** ONLINE container-dup verdicts (round-15, VERDICT r14 stretch
    * #7): per micro-batch, derive each ingested container's
    * perceptual signals with the SAME kernels the batch build path
    * uses (the mm19 frame-hash lattice; the mm21 segment
    * fingerprints over the canonical audio stream) and match them
    * against the at-rest [[graft.operators.MediaSignals]] store —
    * the d10 `matchNew` shape at the container grain. Emits
    * mm22-class verdict rows for every pair involving a batch
    * container; `MediaSignals.matchVerdicts` computes over
    * store ∪ batch, so a batch-replay of the stream equals the
    * at-rest mm22 table for the same total corpus (spec-pinned).
    * Each epoch OVERWRITEs `outDir/batch_id=N` — idempotent replay
    * (the foreachBatch convention). Matching is read-only; appending
    * the batch's signals to the store stays the ingest pipeline's
    * separate (validated) `MediaSignals.append` step. */
  def startDupVerdicts(media: DataFrame, storePath: String,
      outDir: String, checkpoint: String): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val blobs = batch
          .select(col("media_id").cast("string").as("model"),
            col("content"))
          .persist()
        try {
          val fr = graft.queries.AdsbQueries.frameHashesOf(blobs)
          val canon = AudioStream.classify(blobs)
            .where(col("container") =!= "riff_rejected")
            .withColumn("payload", AudioStream.canonicalPayload)
            .select(col("model"), col("payload").as("content"),
              length(col("payload")).cast("long").as("length"))
          val sg = graft.queries.AdsbQueries
            .segFingerprintsOfCanonical(canon)
          graft.operators.MediaSignals.matchVerdicts(
              batch.sparkSession, storePath, fr, sg)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        } finally { blobs.unpersist(blocking = false); () }
      }
      .start()

  def start(media: DataFrame, outDir: String, checkpoint: String,
      maxBytes: Int = 10 << 20,
      watermark: String = "10 minutes",
      dropFlatImages: Boolean = true): StreamingQuery = {
    // mm9's pixel-stats kernel applied AT INGEST (default on): a BMP
    // whose sampled-gray population variance is near zero is a
    // solid-color placeholder — the classic crawl junk — and is
    // dropped before it pays for the dedup shuffle or storage. The
    // DROP threshold (variance < 1000, std ≈ 32 on the 0..765 gray
    // scale) is deliberately far stricter than mm9's ADVISORY
    // low-contrast flag (20000): even uniform random noise has
    // variance ≈ 15.7k, so the advisory cut would reject legitimate
    // busy images — a gate that deletes data must only fire on the
    // unambiguous case. Pixel-level but still a pure codegen
    // projection (the grayStats kernel); non-BMP containers pass —
    // ImageIO full-decode stats at the stream would fight the
    // metadata-only gate discipline, so only the byte-kernel
    // container gets the pixel gate.
    val st = graft.functions.BmpAHash.grayStats(col("content"))
    val flatBmp = Multimodal.isBmp(col("content")) &&
      st.isNotNull &&
      lit(64L) * st(1) - st(0) * st(0) < lit(1000L * 4096)
    Multimodal.withMetadata(media, col("content"))
      .where(col("content").isNotNull &&
        length(col("content")) >= 54 &&
        length(col("content")) <= maxBytes &&
        col("width") > 0 && col("height") > 0)
      .where(if (dropFlatImages) !flatBmp else lit(true))
      .withColumn("content_sha256", sha2(col("content"), 256))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("content_sha256")
      .withColumn("ingest_date", to_date(col("ingest_ts")))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy("ingest_date")
      .outputMode("append")
      .start()
  }
}
