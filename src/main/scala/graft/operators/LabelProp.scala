package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic synchronous label propagation (community detection)
  * and exact triangle counting over an explicit edge list — the two
  * non-iterative-vs-iterative poles of corpus-graph analytics beside
  * [[PageRank]] (communities say WHICH near-dup/topic island a
  * document lives in; triangle density says how tightly knit that
  * island is — both standard curation signals over a kNN graph).
  *
  * Both are integer-exact and replayable by an external SQL engine:
  * LPA's vote is (count desc, label asc) — the tie always breaks to
  * the SMALLEST label, so synchronous rounds are deterministic on any
  * partitioning; triangles use the canonical ordered-wedge closure
  * (i<j<k once each).
  */
object LabelProp {

  /** Undirected, deduplicated, self-loop-free edge view of a directed
    * edge list: both orientations of every edge, each once. */
  def undirect(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** Community labels after `iterations` synchronous votes, as
    * `(id, community)`. Initial label = own id; each round a node
    * takes the most frequent neighbor label, ties to the smallest;
    * isolated nodes keep their own label.
    *
    * Scale shape: per round ONE edges⋈labels shuffle join, one
    * (dst, lbl) count, and a per-dst top-1 — planned as
    * WindowGroupLimit so only each node's leading labels survive the
    * shuffle. State is `localCheckpoint`ed per round (O(1) plan
    * depth, the [[PageRank.ranksPpm]] discipline).
    */
  def communities(nodes: DataFrame, edges: DataFrame,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = undirect(edges).localCheckpoint(true)
    val n = nodes.select(col("id")).localCheckpoint(true)
    var labels = n.withColumn("lbl", col("id")).localCheckpoint(true)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("votes").desc, col("lbl"))
    for (_ <- 1 to iterations) {
      val vote = e.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("id"), col("lbl").as("new_lbl"))
      labels = labels.join(vote, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** Per-node triangle participation count over the undirected view,
    * as `(id, triangles)` — one row per node of `nodes` (0 for
    * nodes in no triangle). Each triangle {i<j<k} is found exactly
    * once by closing ordered wedges, then credited to all three
    * corners.
    *
    * Scale shape: the canonical two-join distributed triangle count —
    * the ordered edge list (src<dst) wedge-joins itself on the middle
    * vertex, and the closure check is an equi-join back onto the
    * ordered edges; at kNN degree k the wedge set is |V|·k² rows,
    * never |V|². No iteration, no window.
    */
  def triangles(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val und = undirect(edges)
    // ordered representative of each undirected edge: src < dst
    val ord = und.where(col("src") < col("dst")).localCheckpoint(true)
    // wedge j: i<j<k with edges (i,j) and (j,k)
    val wedges = ord.select(col("src").as("i"), col("dst").as("j"))
      .join(ord.select(col("src").as("j"), col("dst").as("k")), Seq("j"))
    val tris = wedges.join(ord,
        wedges("i") === ord("src") && wedges("k") === ord("dst"))
      .select(col("i"), col("j"), col("k"))
    val credit = tris.select(col("i").as("id"))
      .unionByName(tris.select(col("j").as("id")))
      .unionByName(tris.select(col("k").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    nodes.select(col("id")).join(credit, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
