package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.PortableHash.phash
object Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").config("spark.sql.codegen.wholeStage", sys.env.getOrElse("WSCG","true")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p4] $n: ${(System.nanoTime()-t0)/1e9}%.1fs"); r
    }
    val mt = Dedup.minhashMinTable(docs, col("doc_id"), col("text"), 3, 16)
    time("mintable") { println(mt.count()) }
    val banded = mt.withColumn("band", expr("i div 4"))
      .groupBy("id", "band")
      .agg(phash(array_join(transform(
        array_sort(collect_list(struct(col("i"), col("mh")))),
        s => s("mh").cast("string")), ","), -1).as("bucket"))
    time("banded") { println(banded.count()) }
    val buckets = banded.groupBy("band", "bucket").agg(collect_list(col("id")).as("ids"))
      .where(size(col("ids")) > 1)
    time("buckets") { println(buckets.count()) }
    val pairs = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b")).distinct()
    time("pairs") { println(pairs.count()) }
    time("buckets2") { println(buckets.count()) }
    time("cands_fresh") { println(Dedup.minhashCandidates(docs, col("doc_id"), col("text"), 3, 16, 4).count()) }
    spark.stop()
  }
}
