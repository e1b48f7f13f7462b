package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Ivf, IvfPq}

/** Streaming ANN serving: per-micro-batch pruned search over a
  * persisted index, batch ≡ stream parity, idempotent epoch replay. */
class AnnStreamSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def queryRows(ids: Long*): Seq[(Long, Array[Float])] =
    emb.where(col("vec_id").isin(ids.map(Long.box): _*))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq

  test("streamed IVF-PQ results equal the batch search, batch by batch") {
    implicit val sqlCtx = spark.sqlContext
    val index = IvfPq.build(emb, col("vec_id"), col("embedding"),
      dim = 64, kCoarse = 8, m = 16, k = 16, iters = 3)
    val idxDir = Files.createTempDirectory("ann-idx").resolve("i").toString
    IvfPq.persist(index, idxDir)

    val in = MemoryStream[(Long, Array[Float])]
    val outDir = Files.createTempDirectory("ann-out").toString
    val ckpt = Files.createTempDirectory("ann-ckpt").toString
    val q = AnnStream.startIvfPq(
      in.toDF().toDF("qid", "qvec"), idxDir, index, outDir, ckpt,
      topK = 5, nProbe = 3)
    in.addData(queryRows(0L, 1L, 2L))
    q.processAllAvailable()
    in.addData(queryRows(3L, 4L))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outDir)
      .select("qid", "vec_id", "score", "rank")
      .orderBy("qid", "rank").collect().toSeq
    val batch = IvfPq.searchPersisted(spark, idxDir, index,
        queryRows(0L, 1L, 2L, 3L, 4L).toDF("qid", "qvec"),
        topK = 5, nProbe = 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(streamed === batch)
    // one partition directory per epoch — the idempotent-replay unit
    assert(new java.io.File(outDir).listFiles()
      .count(_.getName.startsWith("batch_id=")) === 2)
  }

  test("the served index grows mid-stream: appended vectors are visible") {
    implicit val sqlCtx = spark.sqlContext
    // index only the even half; serve; append the odd half BETWEEN
    // epochs — searchPersisted re-resolves the parquet files per
    // micro-batch, so the grown index serves without a restart
    val index = Ivf.build(emb.where(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), k = 8)
    val idxDir = Files.createTempDirectory("ann-grow").resolve("i").toString
    Ivf.persist(index, idxDir)

    val in = MemoryStream[(Long, Array[Float])]
    val outDir = Files.createTempDirectory("ann-grow-out").toString
    val ckpt = Files.createTempDirectory("ann-grow-ckpt").toString
    // probe everything so the only variable is index CONTENT
    val q = AnnStream.startIvf(in.toDF().toDF("qid", "qvec"), idxDir,
      index.codebook, outDir, ckpt, topK = 200, nProbe = 8)
    in.addData(queryRows(0L))
    q.processAllAvailable()
    Ivf.appendPersisted(spark, idxDir, emb.where(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"))
    in.addData(queryRows(2L))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(outDir)
    val odd0 = out.where(col("qid") === 0L && col("vec_id") % 2 === 1)
    val odd2 = out.where(col("qid") === 2L && col("vec_id") % 2 === 1)
    assert(odd0.count() === 0L, "epoch 1 must see only the even half")
    assert(odd2.count() > 0L, "epoch 2 must see appended odd vectors")
    spark.catalog.clearCache()
  }

  test("filtered serving: the predicate holds in every streamed epoch") {
    implicit val sqlCtx = spark.sqlContext
    val index = Ivf.build(emb, col("vec_id"), col("embedding"), k = 8)
    val idxDir = Files.createTempDirectory("ann-flt").resolve("i").toString
    Ivf.persistWithPayload(index,
      emb.select(col("vec_id").as("id"), col("label")), idxDir)
    val in = MemoryStream[(Long, Array[Float])]
    val outDir = Files.createTempDirectory("ann-flt-out").toString
    val ckpt = Files.createTempDirectory("ann-flt-ckpt").toString
    val q = AnnStream.startIvf(in.toDF().toDF("qid", "qvec"), idxDir,
      index.codebook, outDir, ckpt, topK = 5, nProbe = 8,
      corpusFilter = col("label") < 3)
    in.addData(queryRows(0L, 1L))
    q.processAllAvailable()
    in.addData(queryRows(2L))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(outDir)
    assert(out.count() > 0L)
    val bad = out.join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .where(col("label") >= 3).count()
    assert(bad === 0L, "streamed epoch served an ineligible vector")
    index.assigned.unpersist(blocking = false)
  }

  test("streamed radius results equal the batch range search") {
    implicit val sqlCtx = spark.sqlContext
    val index = Ivf.build(emb, col("vec_id"), col("embedding"), k = 8)
    val idxDir = Files.createTempDirectory("ann-ridx").resolve("i").toString
    Ivf.persist(index, idxDir)

    val in = MemoryStream[(Long, Array[Float])]
    val outDir = Files.createTempDirectory("ann-rout").toString
    val ckpt = Files.createTempDirectory("ann-rckpt").toString
    val q = AnnStream.startIvfRadius(
      in.toDF().toDF("qid", "qvec"), idxDir, outDir, ckpt,
      minSim = 0.25, nProbe = 3)
    in.addData(queryRows(0L, 1L, 2L))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(outDir)
      .select("qid", "vec_id", "sim")
      .orderBy("qid", "vec_id").collect().toSeq
    val batch = Ivf.searchRadiusAt(spark, idxDir,
        queryRows(0L, 1L, 2L).toDF("qid", "qvec"),
        minSim = 0.25, nProbe = 3)
      .orderBy("qid", "vec_id").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("a replayed epoch overwrites its directory instead of duplicating") {
    val index = Ivf.build(emb, col("vec_id"), col("embedding"), k = 8)
    val idxDir = Files.createTempDirectory("ann-idx2").resolve("i").toString
    Ivf.persist(index, idxDir)
    val outDir = Files.createTempDirectory("ann-out2").toString
    val search = (batch: org.apache.spark.sql.DataFrame) =>
      Ivf.searchPersisted(spark, idxDir, index.codebook, batch,
        topK = 5, nProbe = 3)
    val batchDf = queryRows(0L, 1L).toDF("qid", "qvec")
    // simulate the foreachBatch body running twice for the same epoch
    search(batchDf).write.mode("overwrite").parquet(s"$outDir/batch_id=7")
    search(batchDf).write.mode("overwrite").parquet(s"$outDir/batch_id=7")
    assert(spark.read.parquet(outDir).count() === 10) // 2 qids x top-5
  }

  test("backfill trigger drains queued queries and terminates") {
    val index = Ivf.build(emb, col("vec_id"), col("embedding"), k = 8)
    val idxDir = Files.createTempDirectory("ann-idx3").resolve("i").toString
    Ivf.persist(index, idxDir)
    val srcDir = Files.createTempDirectory("ann-src").toString
    queryRows(0L, 1L, 2L).toDF("qid", "qvec")
      .write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema("qid LONG, qvec ARRAY<FLOAT>").parquet(srcDir)
    val outDir = Files.createTempDirectory("ann-out3").toString
    val ckpt = Files.createTempDirectory("ann-ckpt3").toString
    val q = AnnStream.start(stream, outDir, ckpt, backfill = true) { b =>
      Ivf.searchPersisted(spark, idxDir, index.codebook, b,
        topK = 5, nProbe = 3)
    }
    assert(q.awaitTermination(60000), "backfill did not terminate")
    assert(spark.read.parquet(outDir).count() === 15) // 3 qids x top-5
  }
}
