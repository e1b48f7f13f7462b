package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Bloom sketch contract that makes p4b ≡ p4 safe:
  * no false negatives ever, false-positive rate actually bounded,
  * empty key set matches nothing, and the whole prefilter + exact
  * confirm composition reproduces the exact semi-join bit-for-bit
  * on the driver's own tables. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("no false negatives: every inserted key passes mightContain") {
    val keys = (0L until 5000L).map(i => s"key-$i").toDF("k")
    val bf = Bloom.sketch(keys, col("k"), 1L << 13, 1L << 16)
    val missed = keys.where(!Bloom.mightContain(bf, col("k"))).count()
    assert(missed === 0L)
  }

  test("false positives are rare on disjoint probes") {
    val keys = (0L until 5000L).map(i => s"key-$i").toDF("k")
    val bf = Bloom.sketch(keys, col("k"), 1L << 13, 1L << 16)
    val probes = (0L until 5000L).map(i => s"other-$i").toDF("k")
    val fp = probes.where(Bloom.mightContain(bf, col("k"))).count()
    // 64 Ki bits / 8 Ki expected items → theoretical fpp ~2%; give 5×
    assert(fp < 500L, s"false-positive count $fp out of 5000")
  }

  test("empty key set matches nothing") {
    val keys = Seq.empty[String].toDF("k")
    val bf = Bloom.sketch(keys, col("k"))
    assert(bf.isEmpty)
    val probes = Seq("a", "b").toDF("k")
    assert(probes.where(Bloom.mightContain(bf, col("k"))).count() === 0L)
  }

  test("probe predicate stays codegen'd (no UDF fallback)") {
    // parquet-backed input: a local Seq would be constant-folded into
    // a LocalTableScan and prove nothing about the executor-side plan
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(md5(col("text")).as("k"))
    val bf = Bloom.sketch(d, col("k"), 1L << 10, 1L << 14)
    val plan = d.where(Bloom.mightContain(bf, col("k")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks the operator as inside a
    // WholeStageCodegen stage in the plan rendering
    assert(plan.contains("*(1) Filter might_contain"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("p4b bloom prefilter + confirm ≡ p4 exact semi-join") {
    val p4 = graft.SparkEntry.queries("p4_contamination")(spark, sf)
    val p4b = graft.SparkEntry.queries("p4b_contamination_bloom")(spark, sf)
    assert(p4b.collect().toSeq === p4.collect().toSeq)
    spark.catalog.clearCache()
  }

  test("prefilter prunes: candidate rows ≤ test split, ≥ contaminated") {
    // rebuild p4's corpus pieces to measure the prefilter selectivity
    val d0 = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mx = d0.agg((max(col("doc_id")) + 1).as("_mx"))
    val d = d0.unionByName(
      d0.where(col("doc_id") % 5 === 0).crossJoin(broadcast(mx))
        .select((col("doc_id") + col("_mx")).as("doc_id"), col("text")))
    val bucket = PortableHash.phash(col("doc_id").cast("string"), 7) % 100
    val withSplit = d.select(col("doc_id"), md5(col("text")).as("h"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
    val trainHashes = withSplit.where(col("split") === "train")
      .select(col("h")).distinct()
    val bf = Bloom.sketch(trainHashes, col("h"), 1L << 17, 1L << 20)
    val test = withSplit.where(col("split") === "test")
    val candidates = test.where(Bloom.mightContain(bf, col("h"))).count()
    val exact = test.join(trainHashes, Seq("h"), "left_semi").count()
    assert(candidates >= exact)     // bloom never loses a true positive
    assert(candidates < test.count()) // and it actually prunes the scan
  }
}
