package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Rank.globalRowNumber: exact parity with the naive global
  * window, invariance under repartitioning and bucket count, and the
  * plan property that motivates it — the big-side row_number windows
  * are partitioned by bucket, never a whole-table SinglePartition
  * sort. */
class RankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def scored = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("n_chars").cast("double").as("v"))

  private def naive = scored.withColumn("rank",
    row_number().over(Window.orderBy(col("v").desc, col("doc_id")))
      .cast("long"))

  private def collectRanks(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("matches the naive global window exactly") {
    val got = Rank.globalRowNumber(scored, col("v"), col("doc_id"),
      nBuckets = 16, descending = true)
    assert(collectRanks(got) === collectRanks(naive))
  }

  test("invariant under repartitioning and bucket count") {
    val base = collectRanks(Rank.globalRowNumber(scored, col("v"),
      col("doc_id"), nBuckets = 16, descending = true))
    val rep = collectRanks(Rank.globalRowNumber(scored.repartition(7),
      col("v"), col("doc_id"), nBuckets = 16, descending = true))
    val other = collectRanks(Rank.globalRowNumber(scored, col("v"),
      col("doc_id"), nBuckets = 5, descending = true))
    assert(rep === base)
    assert(other === base)
  }

  test("ascending order and single bucket degenerate correctly") {
    val asc = Rank.globalRowNumber(scored, col("v"), col("doc_id"),
      nBuckets = 1)
    val expected = scored.withColumn("rank",
      row_number().over(Window.orderBy(col("v"), col("doc_id")))
        .cast("long"))
    assert(collectRanks(asc) === collectRanks(expected))
  }

  test("long extremes rank exactly: no negation overflow, no double collapse") {
    import spark.implicits._
    // Long.MinValue would wrap under negate-before-cast; 2^53 and
    // 2^53+1 collapse to one double — bucket placement may merge
    // them, but the within-bucket order on the ORIGINAL column must
    // keep their exact relative rank
    val big = 1L << 53
    val vals = Seq(Long.MinValue, -5L, 0L, big, big + 1, Long.MaxValue)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Rank.globalRowNumber(df, col("v"), col("id"),
      nBuckets = 3, descending = true)
      .select(col("id"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = vals.zipWithIndex
      .sortBy { case (v, i) => (-BigInt(v), i) }
      .zipWithIndex.map { case ((_, id), r) => id.toLong -> (r + 1L) }
      .toMap
    assert(got === want)
  }

  test("the corpus-wide window is bucket-partitioned, not global") {
    val plan = Rank.globalRowNumber(scored, col("v"), col("doc_id"),
      nBuckets = 16, descending = true)
      .queryExecution.executedPlan.toString
    // the row_number over data rows must carry the bucket partition
    assert(plan.contains("windowspecdefinition(_bucket"), plan)
  }
}
