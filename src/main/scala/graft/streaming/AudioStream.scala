package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming AUDIO ingest — the audio twin of [[MediaStream.start]]:
  * the batch audio gates (mm11's silence lattice, mm14's RIFF/WAVE
  * admission) applied at the stream, before blobs reach the corpus
  * store.
  *
  * Container handling: a blob leading with the RIFF magic must pass
  * a shared chunk-walk gate — `Riff.withWavColumns` (WAVE payloads,
  * round-11) or `Riff.withAviAudio` (the demuxed 01wb audio stream
  * of an interleaved AVI, round-12) — the SAME gates the batch
  * parser uses, one home for the magics; both containers carry the
  * shared sample contract (integer PCM at 8/16 bits, or G.711
  * A-law/µ-law at 8 bits, channels ∈ {1,2} — round-13 widened from 8-bit mono, with payloads
  * CANONICALIZED onto the unsigned-8-mono stream by the same
  * `Pcm.canonical` kernel the batch corpus uses). A RIFF blob that
  * fails both gates is a container this parser cannot read and is
  * DROPPED — admitting it as "raw PCM" would feed header bytes into
  * the energy math as samples (silent mis-parse, the worst failure
  * mode). Anything not RIFF-prefixed is headerless 8-bit PCM by
  * this pipeline's input contract. The stored payload is the
  * CANONICAL sample stream in all three cases.
  *
  * Dedup is keyed on the sha2-256 of the PAYLOAD, not the container
  * bytes: a .wav re-upload of an already-stored .pcm (or vice versa)
  * collapses to one stored copy — the mm5/mm7 container-independence
  * story enforced at ingest. (Consequence: the SECOND container's
  * header metadata is not stored; the payload is what trains.)
  *
  * ==DATA-DELETING DEFAULT — `dropMostlySilent = true`==
  * Like [[MediaStream]]'s flat-image gate, this PERMANENTLY DISCARDS
  * blobs whose silent-frame share (exact integer energy < 4096 over
  * 64-sample frames) is ≥ 50% at ingest — the mostly-silent
  * recordings an audio curation pipeline refuses to pay
  * transcription/embedding for. Archival callers pass `false`
  * explicitly; a pipeline restarting on an old checkpoint gets no
  * warning (the filter is stateless).
  */
object AudioStream {

  /** The shared intake CLASSIFICATION (round-15, VERDICT r14 ask #4
    * — one home for the sink gate and the reject counter, so the
    * two can never diverge): the walked container columns plus
    * `container` (`wav` / `avi` / `pcm` admitted; `riff_rejected`
    * dropped) and `reject_reason` — 'ok' for admitted rows; for a
    * rejected RIFF blob the [[graft.functions.Riff]] codec codes
    * (`mp3_layer3`, `h264`, `unsupported_codec`,
    * `unsupported_layout`), `no_audio_stream` for a structurally
    * fine video-only AVI, `unparsed` for a container the walk
    * cannot read. Length/size gating stays in the callers (the
    * counter must SEE oversize blobs; the sink must not). */
  private[streaming] def classify(media: DataFrame): DataFrame = {
    import graft.functions.Riff
    // RF64 is RIFF-family (round-14): an RF64-prefixed blob must go
    // through the container gates — falling through to "pcm" would
    // feed its header bytes into the energy math as samples
    val isRiff =
      hex(substring(col("content"), 1, 4)).isin("52494646", "52463634")
    // ONE gate shared with the batch parser (Riff.withWavColumns —
    // round-11: the duplicated header offsets are gone): the chunk
    // walk must find fmt + data, PLUS this stream's sample contract
    // — the shared sampleFormatOk admission (round-13/14 widenings
    // included); anything RIFF-prefixed that fails is a container
    // this parser cannot read, and is DROPPED, never fed to the
    // energy math as samples.
    val wavOk = col("wav_ok") && col("wav_fits") &&
      Riff.sampleFormatOk(col("content"), col("fmt_off"),
        col("fmt_bytes"), col("audio_format"), col("bits_per_sample"),
        col("n_channels"))
    Riff.withAviAudio(Riff.withWavColumns(media))
      .withColumn("container",
        when(isRiff && wavOk, "wav")
          // the THIRD container (round-12): an interleaved AVI's
          // audio is the demuxed 01wb concatenation, through the
          // same shared gate the batch corpus uses (Riff
          // .withAviAudio) — an audio-less or truncated AVI (or one
          // whose movi walk hit the 4096-chunk cap, round-13) still
          // rejects
          .when(isRiff && col("avi_audio_ok"), "avi")
          .when(isRiff, "riff_rejected")
          .otherwise("pcm"))
      .withColumn("reject_reason",
        when(col("container") =!= "riff_rejected", lit("ok"))
          // a walked WAV whose codec the engine cannot decode: name
          // the codec (the mm18 codes, same classifier)
          .when(col("wav_ok") && col("wav_fits"),
            Riff.audioCodecReason(col("content"), col("fmt_off"),
              col("fmt_bytes"), col("audio_format"),
              col("bits_per_sample"), col("n_channels")))
          // a structurally fine AVI that yields no admissible audio:
          // if its VIDEO stream names a known compressed codec,
          // that is the reason (the h264 crawl class); otherwise it
          // simply carries no decodable audio stream
          .when(col("avi_ok"),
            when(Riff.videoCodecReason(col("avi_vcodec_hex")) =!= "ok",
              Riff.videoCodecReason(col("avi_vcodec_hex")))
              .otherwise(lit("no_audio_stream")))
          .otherwise(lit("unparsed")))
  }

  /** Windowed intake REJECT COUNTERS — the visibility half of the
    * fail-closed policy (round-15): every blob classifies through
    * the SAME gates the sink uses, and (window, container, reason)
    * counts land in a parquet sink — so the compressed-codec share
    * of a crawl stops vanishing silently. Bounded state (watermarked
    * window aggregate); counts emit when their window closes. */
  def startIntakeCounter(media: DataFrame, outDir: String,
      checkpoint: String, windowLen: String = "1 minute",
      watermark: String = "10 minutes"): StreamingQuery =
    classify(media.where(col("content").isNotNull))
      .select(col("ingest_ts"), col("container"), col("reject_reason"))
      .withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), windowLen), col("container"),
        col("reject_reason"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("container"),
        col("reject_reason"), col("n"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** The CANONICAL sample stream of a [[classify]]-ed admitted row —
    * the unsigned-8-mono payload every consumer (energy lattice,
    * segment fingerprints, dedup key) runs on. One home with the
    * batch corpus' Pcm.pcmCanonical kernel. */
  private[streaming] def canonicalPayload: org.apache.spark.sql.Column = {
    import graft.functions.{Pcm, Riff}
    when(col("container") === "wav",
      Pcm.pcmCanonical(Riff.wavPayload, col("audio_format"),
        col("bits_per_sample"), col("n_channels")))
      .when(col("container") === "avi",
        Pcm.pcmCanonical(col("avi_audio"), col("avi_audio_format"),
          col("avi_audio_bits"), col("avi_audio_channels")))
      .otherwise(col("content"))
  }

  /** Gate + cross-container dedup + day-partitioned sink for a stream
    * of (media_id, content binary, ingest_ts) rows. */
  def start(media: DataFrame, outDir: String, checkpoint: String,
      maxBytes: Int = 10 << 20,
      watermark: String = "10 minutes",
      dropMostlySilent: Boolean = true): StreamingQuery = {
    classify(media
        .where(col("content").isNotNull &&
          length(col("content")) >= 64 && // at least one 64-sample frame
          length(col("content")) <= maxBytes))
      .where(col("container") =!= "riff_rejected")
      .withColumn("payload", canonicalPayload)
      .where(length(col("payload")) >= 64)
      .withColumn("energies", graft.functions.FrameSums.frameEnergies(
        col("payload"), lit(0), lit(64)))
      .withColumn("n_frames", size(col("energies")).cast("long"))
      .withColumn("silence_ppm", expr(
        """(1000000L * aggregate(energies, 0L,
          |  (acc, e) -> acc + IF(e < 4096, 1L, 0L))) div n_frames"""
          .stripMargin))
      .where(if (dropMostlySilent) col("silence_ppm") < 500000L
        else lit(true))
      .withColumn("content_sha256", sha2(col("payload"), 256))
      .select(col("media_id"), col("container"), col("payload"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("n_frames"), col("silence_ppm"), col("content_sha256"),
        col("ingest_ts"))
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
