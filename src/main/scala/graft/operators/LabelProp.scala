package graft.operators

import org.apache.spark.sql.DataFrame
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
    * Scale shape (round-9 exchange-elimination): the edge list is
    * hash-partitioned by `src` ONCE before the loop and the label
    * state stays hash-partitioned by `id` through every checkpoint —
    * `localCheckpoint` captures the physical output partitioning into
    * the `LogicalRDD`, so each round's edges⋈labels join and the
    * labels⋈vote update join are co-partitioned (no |E|- or |V|-sized
    * exchange; explicit partition counts keep AQE from coalescing the
    * two sides apart). The per-round shuffle floor that remains is
    * the vote aggregation itself: (dst, lbl) counts, then a
    * partial-aggregable `min(struct(-votes, lbl))` top-1 per node —
    * same (count desc, label asc) vote as the row_number formulation
    * it replaces, but only each node's leading label survives the
    * second (post-agg, tiny) shuffle instead of a full window sort.
    * State is `localCheckpoint`ed per round (O(1) plan depth, the
    * [[PageRank.ranksPpm]] discipline).
    */
  def communities(nodes: DataFrame, edges: DataFrame,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val (e, labels0) = lpaInputs(nodes, edges)
    var labels = labels0
    for (_ <- 1 to iterations)
      labels = lpaRound(e, labels).localCheckpoint(true)
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** The pre-loop co-partitioning: `(edges hash(src), labels hash(id))`
    * — exposed so `LabelPropSpec` can pin one round's exchange count. */
  private[operators] def lpaInputs(nodes: DataFrame,
      edges: DataFrame): (DataFrame, DataFrame) = {
    val parts = nodes.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val e = undirect(edges).repartition(parts, col("src"))
      .localCheckpoint(true)
    val n = nodes.select(col("id")).repartition(parts, col("id"))
      .localCheckpoint(true)
    (e, n.withColumn("lbl", col("id")).localCheckpoint(true))
  }

  /** One synchronous vote round (pre-checkpoint). */
  private[operators] def lpaRound(e: DataFrame,
      labels: DataFrame): DataFrame = {
    val vote = e.join(labels.withColumnRenamed("id", "src"), Seq("src"))
      .groupBy(col("dst").as("id"), col("lbl"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("id"))
      .agg(min(struct((-col("votes")).as("nv"), col("lbl").as("lbl")))
        .as("top"))
      .select(col("id"), col("top.lbl").as("new_lbl"))
    labels.join(vote, Seq("id"), "left")
      .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
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
