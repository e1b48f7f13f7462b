package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p2] $n: ${(System.nanoTime()-t0)/1e9}%.1fs"); r
    }
    time("shingle explode count") {
      println(Dedup.shingleRows(docs, col("doc_id"), col("text"), 3).count())
    }
    time("hash rows count") {
      println(Dedup.shingleRows(docs, col("doc_id"), col("text"), 3)
        .select(col("id"), col("sh"), explode(sequence(lit(0), lit(15))).as("i")).count())
    }
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 3, 16)
    time("signatures") { println(sigs.count()) }
    val cands = Dedup.minhashCandidates(docs, col("doc_id"), col("text"), 3, 16, 4)
    time("candidates") { println(cands.count()) }
    spark.stop()
  }
}
