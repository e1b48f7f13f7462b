package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotProduct.dotF

/** IVF (inverted-file) approximate nearest neighbor: k-means-lite
  * clustering as the coarse quantizer, then queries probe only their
  * `nProbe` nearest clusters.
  *
  * The 100 TB path alongside [[Similarity.lshTopK]]: the corpus
  * shuffles ONCE by cluster id at build time (`Sinks.writeClustered`
  * persists it co-located), and a query touches nProbe/k of the data.
  * Everything is DataFrame ops — assignment is a broadcast join +
  * per-vector argmin window, centroid recomputation is a
  * posexplode/groupBy mean (map-side combinable).
  *
  * Determinism: centroids seed from the first k vectors by id and
  * Lloyd iterations are fixed-count, so builds are reproducible run to
  * run (no RNG).
  */
object Ivf {

  final case class Index(centroids: DataFrame, assigned: DataFrame)

  private def simTo(vec: Column, cvec: Column): Column =
    dotF(vec, cvec) /
      (sqrt(dotF(vec, vec)) * sqrt(dotF(cvec, cvec)))

  /** Assign each (id, vec) row to its max-cosine centroid. */
  private def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val joined = vectors.crossJoin(broadcast(centroids))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("csim").desc, col("cid"))
    joined
      .withColumn("csim", simTo(col("vec"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("id"), col("vec"), col("cid"))
  }

  /** Mean vector per cluster via posexplode — no vector UDAF needed. */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy("cid")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s("m").cast("float")).as("cvec"))

  /** Build the index: seed = first k vectors by id, `iters` fixed
    * Lloyd rounds. */
  def build(corpus: DataFrame, idCol: Column, vecCol: Column,
      k: Int, iters: Int = 2): Index = {
    val vectors = corpus.select(idCol.as("id"), vecCol.as("vec"))
    val seed = vectors.orderBy(col("id")).limit(k)
      .select(row_number().over(Window.orderBy(col("id"))).as("cid"),
        col("vec").as("cvec"))
    var centroids = seed
    var assigned: DataFrame = null
    (0 until math.max(iters, 1)).foreach { _ =>
      assigned = assign(vectors, centroids)
      centroids = recompute(assigned)
    }
    Index(centroids.cache(), assign(vectors, centroids).cache())
  }

  /** Top-k search probing the `nProbe` nearest clusters per query.
    * queries: (qid, qvec). Output matches
    * [[Similarity.bruteForceTopK]]: (qid, vec_id, sim, rank). */
  def search(index: Index, queries: DataFrame, topK: Int,
      nProbe: Int = 2, roundDigits: Int = 5): DataFrame = {
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("cid"))
    val probes = queries.crossJoin(broadcast(index.centroids))
      .withColumn("csim", simTo(col("qvec"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nProbe)
      .select(col("qid"), col("qvec"), col("cid"))
    val cands = index.assigned.join(broadcast(probes), Seq("cid"))
      .where(col("qid") =!= col("id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    cands
      .withColumn("sim", round(simTo(col("qvec"), col("vec")), roundDigits))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("qid"), col("id").as("vec_id"), col("sim"), col("rank"))
      .orderBy(col("qid"), col("rank"))
  }
}
