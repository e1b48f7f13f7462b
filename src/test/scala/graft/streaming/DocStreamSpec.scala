package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming corpus curation: junk and duplicates never reach the
  * sink, PII is scrubbed at ingest, and the stream output matches the
  * batch operators applied to the same rows. */
class DocStreamSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val good =
    "the quick brown fox jumps over the lazy dog and runs far into " +
      "the quiet green hills of the old countryside before the sun is " +
      "down and the long warm evening settles in over the wide river " +
      "valley with a slow golden light on the water"

  test("curation stream gates, scrubs and dedups at ingest") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, String, Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "lang", "ingest_ts")
    val outDir = Files.createTempDirectory("doc-stream").toString
    val ckpt = Files.createTempDirectory("doc-stream-ckpt").toString
    val q = DocStream.start(docs, outDir, ckpt)

    val rows = Seq(
      (1L, good, "en", ts("2024-03-01 10:00:00")),
      (2L, "x", "en", ts("2024-03-01 10:00:01")), // low quality
      (3L, good + " mail me a.b@c.org today ok", "en",
        ts("2024-03-01 10:00:02")), // pii, scrubbed not dropped
      (4L, good, "de", ts("2024-03-01 10:00:03")), // lang mismatch
      (5L, good, "en", ts("2024-03-01 10:00:04"))) // exact dup of 1
    in.addData(rows)
    q.processAllAvailable()
    in.addData(rows) // full re-delivery inside the watermark
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() === 2) // doc 1 (dup 5 dropped) + doc 3
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
    val clean3 = out.where(col("doc_id") === 3)
      .select("clean_text").as[String].head()
    assert(clean3.contains("<EMAIL>") && !clean3.contains("a.b@c.org"))
    // day partition exists (retention = partition drop)
    assert(new java.io.File(s"$outDir/ingest_date=2024-03-01").isDirectory)
  }

  test("backfill trigger drains a parquet drop-dir and terminates") {
    val srcDir = Files.createTempDirectory("doc-backfill-src").toString
    Seq(
      (1L, good, "en", ts("2024-03-02 09:00:00")),
      (2L, "junk", "en", ts("2024-03-02 09:00:01")))
      .toDF("doc_id", "text", "lang", "ingest_ts")
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, ingest_ts TIMESTAMP")
      .parquet(srcDir)
    val outDir = Files.createTempDirectory("doc-backfill-out").toString
    val ckpt = Files.createTempDirectory("doc-backfill-ckpt").toString
    val q = DocStream.start(stream, outDir, ckpt, backfill = true)
    // AvailableNow terminates on its own once the source drains
    assert(q.awaitTermination(60000), "backfill did not terminate")
    val out = spark.read.parquet(outDir)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("near-dup incremental stream rejects fuzzy mirrors of the corpus") {
    implicit val sqlCtx = spark.sqlContext
    // corpus: one stored doc; index it
    val corpus = Seq((100L, good)).toDF("doc_id", "text")
    val idxPath = Files.createTempDirectory("ndi-stream")
      .resolve("idx").toString
    graft.operators.NearDupIndex.persist(corpus, col("doc_id"),
      col("text"), n = 3, numHashes = 16, bands = 4, path = idxPath)
    val known = corpus.select(sha2(col("text"), 256).as("text_hash"))

    // a fuzzy mirror: same text with the tail reworded — high 3-gram
    // jaccard to the stored doc, but a different content hash
    val mirror = good.split(" ").dropRight(3).mkString(" ") +
      " bright cold morning"
    val fresh =
      "a completely different and rather long note about seven small " +
        "ships that sail the northern sea at dawn and come back to the " +
        "harbor with a hold full of silver fish and the crew singing " +
        "songs about the wind and the waves and the long road home"

    val in = MemoryStream[(Long, String, String, Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "lang", "ingest_ts")
    val outDir = Files.createTempDirectory("ndi-stream-out").toString
    val ckpt = Files.createTempDirectory("ndi-stream-ckpt").toString
    val q = DocStream.startIncrementalNearDup(docs, known, idxPath,
      outDir, ckpt)
    in.addData(Seq(
      (1L, good, "en", ts("2024-03-03 10:00:00")), // exact known copy
      (2L, mirror, "en", ts("2024-03-03 10:00:01")), // near-dup → drop
      (3L, fresh, "en", ts("2024-03-03 10:00:02")), // genuinely new
      (4L, "x", "en", ts("2024-03-03 10:00:03")))) // junk
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outDir)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(3L))
    // sanity: the mirror really was a verified near-dup, not a gate drop
    val m = graft.operators.NearDupIndex.matchNew(spark, idxPath,
      Seq((2L, mirror)).toDF("doc_id", "text"), col("doc_id"),
      col("text"), n = 3, numHashes = 16, bands = 4, threshold = 0.2)
    assert(m.count() === 1L)
    spark.catalog.clearCache()
  }

  test("incremental curation drops docs already in the corpus") {
    implicit val sqlCtx = spark.sqlContext
    val known = Seq(good).toDF("text")
      .select(sha2(col("text"), 256).as("text_hash"))
    val in = MemoryStream[(Long, String, String, Timestamp)]
    val ckpt = Files.createTempDirectory("doc-incr-ckpt").toString
    val q = DocStream.curateIncremental(
      in.toDF().toDF("doc_id", "text", "lang", "ingest_ts"), known)
      .writeStream.format("memory").queryName("doc_incr")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    in.addData(Seq(
      (1L, good, "en", ts("2024-03-01 10:00:00")), // already ingested
      (2L, good + " with a fresh new tail of words", "en",
        ts("2024-03-01 10:00:01")))) // genuinely new
    q.processAllAvailable()
    q.stop()
    val out = spark.table("doc_incr").select("doc_id").as[Long].collect()
    assert(out.toSeq === Seq(2L))
  }

  test("stream output equals the batch operators on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, good, "en", ts("2024-03-01 10:00:00")),
      (2L, "x!", "en", ts("2024-03-01 10:00:01")),
      (3L, good + " extra tail words here", "en", ts("2024-03-01 10:00:02")),
      (4L, good, "en", ts("2024-03-01 10:00:03")))
    val batch = DocStream.curate(
      rows.toDF("doc_id", "text", "lang", "ingest_ts"))
      .orderBy("doc_id").collect().toSeq

    val in = MemoryStream[(Long, String, String, Timestamp)]
    val ckpt = Files.createTempDirectory("doc-parity-ckpt").toString
    val q = DocStream.curate(in.toDF().toDF("doc_id", "text", "lang", "ingest_ts"))
      .writeStream.format("memory").queryName("doc_parity")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    in.addData(rows)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("doc_parity").orderBy("doc_id").collect().toSeq
    assert(streamed === batch)
  }

  test("drift monitor scores each batch against the static reference") {
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq(("the", 50L), ("quick", 10L), ("fox", 10L))
      .toDF("tok", "ref_cnt")
    val rows = Seq(
      (1L, "the quick fox", "en", ts("2024-03-01 10:00:00")),
      (2L, "zzz yyy xxx", "de", ts("2024-03-01 10:00:01")))
    // batch ground truth: the foreachBatch body IS the batch operator
    // (unshared counts so THIS computation cannot pollute the cache
    // catalog the assertion below inspects)
    val batchKl = graft.operators.Drift.klAgainstCounts(
        graft.operators.Drift.sliceCounts(
          rows.toDF("doc_id", "text", "lang", "ingest_ts"),
          col("lang"), col("text")), reference)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet

    val in = MemoryStream[(Long, String, String, Timestamp)]
    val outDir = Files.createTempDirectory("drift-out").toString
    val ckpt = Files.createTempDirectory("drift-ckpt").toString
    val q = DocStream.startDriftMonitor(
      in.toDF().toDF("doc_id", "text", "lang", "ingest_ts"),
      reference, outDir, ckpt)
    in.addData(rows)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$outDir/batch_id=0")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed === batchKl)
    // the in-reference slice tracks the reference; the disjoint
    // slice diverges harder
    val m = batchKl.map { case (s, _, k) => s -> k }.toMap
    assert(m("de") > m("en"))
    // a RESIDENT monitor must leave the cache catalog empty after
    // every epoch — one leaked entry per micro-batch is an OOM on an
    // unbounded feed (the per-epoch unpersist discipline)
    assert(spark.sharedState.cacheManager.isEmpty,
      "drift monitor left entries in the cache catalog")
  }
}
