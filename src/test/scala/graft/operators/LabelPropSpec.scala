package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[LabelProp.communities]] to the literal sequential vote
  * (most-frequent neighbor label, ties to the smallest, isolated
  * nodes keep their own) and [[LabelProp.triangles]] to brute-force
  * triangle enumeration — plus partition invariance for both. */
class LabelPropSpec extends SparkSpec {

  import spark.implicits._

  private def undirect(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).toSet

  private def referenceCommunities(nodes: Seq[Long],
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val adj = undirect(edges).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).toSeq }
    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to iterations) {
      lbl = nodes.map { v =>
        val votes = adj.getOrElse(v, Nil).map(lbl)
          .groupBy(identity).map { case (l, vs) => (l, vs.size) }
        v -> (if (votes.isEmpty) lbl(v)
              else votes.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
    }
    lbl
  }

  private def referenceTriangles(nodes: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = undirect(edges)
    val ord = und.filter(e => e._1 < e._2).toSeq.sorted
    val tris = for {
      (i, j) <- ord; (j2, k) <- ord if j2 == j && und((i, k))
    } yield (i, j, k)
    val credit = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    nodes.map(v => v -> credit.getOrElse(v, 0L)).toMap
  }

  private def runCommunities(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iterations: Int, parts: Int): Map[Long, Long] =
    LabelProp.communities(nodes.toDF("id").repartition(parts),
        edges.toDF("src", "dst").repartition(parts), iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def runTriangles(nodes: Seq[Long], edges: Seq[(Long, Long)],
      parts: Int): Map[Long, Long] =
    LabelProp.triangles(nodes.toDF("id").repartition(parts),
        edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by a bridge resolve to two communities") {
    val nodes = (1L to 8L)
    val k4a = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    val k4b = for (i <- 5L to 8L; j <- 5L to 8L if i < j) yield (i, j)
    val edges = k4a ++ k4b ++ Seq((4L, 5L))
    val got = runCommunities(nodes, edges, 5, 3)
    assert(got === referenceCommunities(nodes, edges, 5))
    // min-label tie-breaking pulls each clique to its smallest member
    assert(Set(got(1L), got(2L), got(3L)).size === 1)
    assert(Set(got(6L), got(7L), got(8L)).size === 1)
    assert(got(1L) !== got(8L))
  }

  test("seeded random graph: LPA matches the reference, partition-invariant") {
    val rnd = new Random(31)
    val nodes = (0L until 30L)
    val edges = (for (_ <- 0 until 70)
      yield (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filterNot(e => e._1 == e._2)
    val ref = referenceCommunities(nodes, edges, 5)
    assert(runCommunities(nodes, edges, 5, 1) === ref)
    assert(runCommunities(nodes, edges, 5, 7) === ref)
  }

  test("triangles: clique/path/random all match brute force") {
    // K4: every node in C(3,2)=3 triangles
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    assert(runTriangles(1L to 4L, k4, 2)
      === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // path: no triangles
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(runTriangles(1L to 4L, path, 2).values.forall(_ == 0L))
    val rnd = new Random(41)
    val nodes = (0L until 25L)
    val edges = (for (_ <- 0 until 80)
      yield (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filterNot(e => e._1 == e._2)
    val ref = referenceTriangles(nodes, edges)
    assert(runTriangles(nodes, edges, 1) === ref)
    assert(runTriangles(nodes, edges, 5) === ref)
  }

  test("one LPA round pays only the vote-aggregation exchanges") {
    // round-9 exchange-elimination pin: with edges hash(src) and
    // labels hash(id) captured through localCheckpoint, a round's
    // static plan shuffles ONLY for the two vote aggregations
    // ((dst,lbl) counts, then the post-agg per-node top-1) — the
    // edges⋈labels and labels⋈vote joins are co-partitioned. AQE off
    // for the assertion so the pinned plan is the deterministic
    // static one (AQE can only merge stages further, never add
    // exchanges).
    val rnd = new Random(53)
    val nodes = (0L until 40L)
    val edges = (for (_ <- 0 until 120)
      yield (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filterNot(e => e._1 == e._2)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (e, labels) = LabelProp.lpaInputs(
        nodes.toDF("id"), edges.toDF("src", "dst"))
      val plan = LabelProp.lpaRound(e, labels)
        .queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r
        .findAllIn(plan).size
      assert(shuffles == 2, s"expected 2 vote-agg exchanges, got $shuffles:\n$plan")
      // broadcasts are fine (tiny checkpointed label stats — at corpus
      // scale real stats flip these to the co-partitioned joins the
      // repartition set up); what must never appear is a shuffle of
      // the |E|-sized edge side or a cartesian
      assert(!plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("duplicate and reversed directed edges collapse to one undirected edge") {
    val nodes = Seq(1L, 2L, 3L)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L))
    assert(runTriangles(nodes, edges, 2)
      === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(runCommunities(nodes, edges, 3, 2)
      === referenceCommunities(nodes, edges, 3))
  }
}
