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

  // exactly `rounds` synchronous peels — the bounded semantics kCore
  // pins (its scaladoc has the fixpoint-vs-bounded rationale)
  private def referenceKCore(nodes: Seq[Long], edges: Seq[(Long, Long)],
      k: Int, rounds: Int): Map[Long, Option[Long]] = {
    var und = undirect(edges)
    for (_ <- 1 to rounds) {
      val deg = und.groupBy(_._1).map { case (v, es) => v -> es.size }
      val bad = deg.filter(_._2 < k).keySet
      und = und.filter(e => !bad(e._1) && !bad(e._2))
    }
    val coreDeg = und.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    nodes.map(v => v -> coreDeg.get(v)).toMap
  }

  private def runKCore(nodes: Seq[Long], edges: Seq[(Long, Long)],
      k: Int, parts: Int, rounds: Int = 8): Map[Long, Option[Long]] =
    LabelProp.kCore(nodes.toDF("id").repartition(parts),
        edges.toDF("src", "dst").repartition(parts), k, rounds)
      .collect().map { r =>
        val deg = if (r.isNullAt(2)) None else Some(r.getLong(2))
        assert(r.getBoolean(1) == deg.isDefined) // in_core <=> has core_deg
        r.getLong(0) -> deg
      }.toMap

  test("kCore: clique survives, hanging chain peels, brute-force parity") {
    // K4 on 1..4 (internal degree 3), a chain 4-5-6-7 hanging off,
    // node 8 isolated: at k=2 the chain peels END-FIRST over three
    // cascading rounds (the iteration is load-bearing, not one pass)
    // and the clique alone survives; at k=3 likewise; at k=4 the
    // graph empties. 8 rounds ≥ the 3-round peel depth, so the
    // bounded result here IS the true core.
    val nodes = (1L to 8L)
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    val edges = k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))
    for (k <- 2 to 4; parts <- Seq(1, 5)) {
      val got = runKCore(nodes, edges, k, parts)
      assert(got === referenceKCore(nodes, edges, k, 8), s"k=$k parts=$parts")
    }
    val core2 = runKCore(nodes, edges, 2, 3)
    assert(core2.filter(_._2.isDefined).keySet === Set(1L, 2L, 3L, 4L))
    assert(core2(1L).contains(3L)) // within-core degree, chain excluded
    assert(runKCore(nodes, edges, 4, 3).values.forall(_.isEmpty))
  }

  test("kCore: bounded rounds are exact mid-peel, monotone, convergent") {
    // rounds=1 on the chain peels only the end (7); rounds=2 also 6;
    // rounds>=3 reaches the fixpoint — pins that `rounds` means
    // EXACTLY that many synchronous rounds, and that survivor sets
    // shrink monotonically to the true core
    val nodes = (1L to 7L)
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    val edges = k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))
    def survivors(rounds: Int): Set[Long] =
      runKCore(nodes, edges, 2, 3, rounds)
        .filter(_._2.isDefined).keySet.toSet
    assert(survivors(1) === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(survivors(2) === Set(1L, 2L, 3L, 4L, 5L))
    assert(survivors(3) === Set(1L, 2L, 3L, 4L))
    assert(survivors(8) === Set(1L, 2L, 3L, 4L))
    (1 to 3).foreach { r =>
      assert(runKCore(nodes, edges, 2, 3, r)
        === referenceKCore(nodes, edges, 2, r), s"rounds=$r")
    }
  }

  test("kCore: seeded random graph matches brute force, partition-invariant") {
    val rnd = new Random(61)
    val nodes = (0L until 30L)
    val edges = (for (_ <- 0 until 45)
      yield (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filterNot(e => e._1 == e._2)
    for (k <- Seq(2, 3)) {
      val ref = referenceKCore(nodes, edges, k, 8)
      assert(runKCore(nodes, edges, k, 1) === ref, s"k=$k")
      assert(runKCore(nodes, edges, k, 7) === ref, s"k=$k")
    }
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
      // ≤ 2 (round-16): with the data-size-driven loop partition
      // count (Parts), a fixture-sized graph pins to ONE partition
      // and even the vote aggregations need no exchange — the bound
      // that matters is "never MORE than the two vote aggs", i.e. the
      // joins stay co-partitioned.
      assert(shuffles <= 2, s"expected <=2 vote-agg exchanges, got $shuffles:\n$plan")
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
