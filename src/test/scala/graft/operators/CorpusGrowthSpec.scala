package graft.operators

import graft.SparkSpec
import graft.queries.{AdsbQueries, DocQueries}

/** Semantic pins for the round-10 growth/near-dup readouts (the
  * oracle proves the arithmetic; these prove the curves MEAN
  * something). */
class CorpusGrowthSpec extends SparkSpec {

  test("t31: decile curve is monotone and ends at the full inventory") {
    val rows = DocQueries.defs("t31_heaps_growth")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (1L to 10L))
    // cumulative prefixes: both axes monotone non-decreasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3, s"$a -> $b")
    }
    // the k=10 prefix IS the corpus: vocab must equal the distinct
    // trigram count and n_grams the occurrence total, independently
    // recomputed
    import org.apache.spark.sql.functions._
    import graft.functions.PortableHash.phash
    val grams = Dedup.shingleRows(
        graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
        col("doc_id"), col("text"), 3)
      .select(phash(col("sh"), 3).as("g"))
    val (total, distinct) = (grams.count(),
      grams.distinct().count())
    assert(rows.last._2 === total)
    assert(rows.last._3 === distinct)
    // Heaps: the vocabulary must still be GROWING sub-linearly, not
    // saturated (the word-level curve saturates at 31 — the reason
    // t31 runs on trigrams)
    assert(rows.last._3 > rows.head._3 * 2)
  }

  test("mm15: a strict prefix cut scores containment exactly 10^6") {
    val rows = AdsbQueries.defs("mm15_video_neardup")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val (shared, jacc, cont) = rows(("vid_a", "vid_a_cut"))
    assert(cont === 1000000L) // every cut frame exists in the original
    assert(shared === 12L) // the cut's full frame set
    assert(jacc < 1000000L) // but the cut is NOT an exact dup
    // the AVI container twin of vid_scene: identical frame set from
    // a REAL container — exact dup at both measures (round-10 demux)
    val (ts, tj, tc) = rows(("vid_scene", "vid_scene_a"))
    // 16 frames, 14 DISTINCT sums (the dark frames repeat) — both
    // sides collapse identically, so both measures read exact-dup
    assert((ts, tj, tc) === ((14L, 1000000L, 1000000L)))
    // the round-14 byte-identical re-upload (mm22's full-dup
    // fixture): exact dup at both measures
    val (ds, dj, dc) = rows(("vid_duet", "vid_duet_c"))
    assert((dj, dc) === ((1000000L, 1000000L)), s"shared $ds")
    // unrelated videos must not read as near-dups
    val planted = Set(("vid_a", "vid_a_cut"), ("vid_scene", "vid_scene_a"),
      ("vid_duet", "vid_duet_c"))
    rows.foreach { case (k, (_, _, c)) =>
      if (!planted(k)) assert(c < 500000L, k)
    }
  }

  test("t32: novelty is conserved — Σ novel occurrences = Σ first-doc mass") {
    val rows = DocQueries.defs("t32_doc_novelty")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // every gram type's occurrences inside its first doc are novel
    // there and nowhere else, so per-doc novel sums bound total grams
    val (grams, novel) = (rows.map(_._1).sum, rows.map(_._2).sum)
    assert(novel > 0 && novel <= grams)
    // doc 0 introduces everything it contains
    val first = DocQueries.defs("t32_doc_novelty")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(first.getLong(0) === 0L) // ordered by doc_id
    assert(first.getLong(1) === first.getLong(2)) // all novel in doc 0
  }

  test("sk10: Bloom has false positives but NEVER false negatives") {
    // sf0.01, not sf0.001: the planted-fp claim needs the ~65%-full
    // filter (134 build users × 2 hashes over 256 bits); the tiny
    // corpus is legitimately fp-free
    val rows = graft.queries.EventQueries.defs("sk10_bloom_membership")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (np, hits, members, fp) =>
      assert(hits >= members, "a Bloom filter cannot miss a member")
      assert(fp === hits - members)
      assert(hits <= np)
    }
    // the m=256 sizing plants false positives by construction — a
    // 0-fp green would prove nothing
    assert(rows.map(_._4).sum > 0, "expected planted false positives")
  }

  test("t33: pair frame is metadata-sized and set algebra holds") {
    val rows = DocQueries.defs("t33_source_overlap")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(6)))
    val nSources = rows.flatMap(r => Seq(r._1, r._2)).distinct.size.toLong
    assert(rows.length <= nSources * (nSources - 1) / 2)
    rows.foreach { case (a, b, na, nb, shared, cont) =>
      assert(a < b, s"ordered pair violated: $a $b")
      assert(shared <= math.min(na, nb), s"$a/$b")
      assert(cont <= 1000000L)
    }
  }
}
