package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Bm25, Bpe, Dedup, Drift, Ivf, IvfPq, Mixture, Mmr, NaiveBayes, Pack, Pq, Similarity}

/** Training-data-pipeline operators over `documents` / `embeddings`:
  * dedup (exact, MinHash-LSH, n-gram Jaccard, SimHash), ANN similarity
  * search, and text analysis. Hashing is engine-portable (md5-derived)
  * so every query here has a bit-exact DuckDB oracle.
  */
object DocQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** The EXACT 6-dp mean of a fixed-point(1e6) integer sum: round
    * half-away-from-zero of `sumMicro / den` in INTEGER space, then
    * one double division by 1e6 (round-14, VERDICT r13 ask #2).
    *
    * `round(sum/1e6/den, 6)` on a double was the last float boundary
    * in the fixed-point discipline: when `sum/den` lands on an exact
    * decimal .5 tie (measured at sf0.1: p13 doc 64, w/n = −127835.5),
    * the tie is NOT representable as a double, and the engines break
    * it differently — Spark's round() rounds the double's SHORTEST
    * DECIMAL representation (BigDecimal.valueOf, HALF_UP) while
    * DuckDB rounds the true binary value, flipping the 6th decimal on
    * exact-boundary rows only. Integer tie-breaking
    * (`(2·|sum| + den) div (2·den)`, sign reapplied) makes the
    * rounded micro-value an exact BIGINT in both engines; the final
    * `/ 1e6` is one IEEE op on identical inputs. The oracle twin is
    * the same expression in DuckDB SQL. Operand bound: 2·|sum| + den
    * must fit a long — sums here are ≤ ~30e6 micro-units per token ×
    * tokens per doc, orders of magnitude inside 2⁶³ at any doc size. */
  private def microMean6(sumMicro: String, den: String): Column =
    expr(s"CAST((CASE WHEN $sumMicro >= 0 THEN 1 ELSE -1 END) * " +
      s"((2 * abs($sumMicro) + $den) DIV (2 * $den)) AS DOUBLE) " +
      "/ 1000000.0")

  /** [[microMean6]]'s DuckDB twin (same integer tie-break, `//` =
    * integer division on the non-negative operands). */
  private def microMean6Sql(sumMicro: String, den: String): String =
    s"CAST((CASE WHEN $sumMicro >= 0 THEN 1 ELSE -1 END) * " +
      s"((2 * abs($sumMicro) + $den) // (2 * $den)) AS DOUBLE) / 1000000"

  // One persisted index per (session, key): an index is built and
  // persisted ONCE per JVM, then every later invocation serves from
  // the existing files — Bench's warmup + timed runs measure the
  // match/serve path (the deployment steady state), not repeated
  // index construction, and temp dirs no longer accumulate one index
  // copy per run (round-5 ADVICE). One shutdown hook removes the
  // whole tree.
  private val idxMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()
  private lazy val idxTmpRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-idx")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(root.toFile)
    }))
    root
  }
  private[queries] def persistedIndex(s: SparkSession, key: String)(
      build: String => Unit): String =
    idxMemo.computeIfAbsent((s, key), { _ =>
      val dir = idxTmpRoot.resolve(
        key.replaceAll("[^A-Za-z0-9_.-]", "_") + "-" + idxMemo.size).toString
      build(dir)
      dir
    })

  /** The canonical near-dup pipeline (d2 LSH candidates → d3v exact
    * verify, one cached shingle scan feeding both stages) — the
    * single source for every query composing it (d3v, p1, d7, d8,
    * p8), so n/bands/threshold can never drift between a proven
    * stage and the composites built on it. */
  private def verifiedPairs(d: DataFrame): DataFrame = {
    // shared via Dedup.share (mode-gated cache/checkpoint/none — see
    // its scaladoc for the measured trade): the shingle scan feeds
    // both the candidate and the verify stage exactly once
    val sh = Dedup.share(
      Dedup.shingleRows(d, col("doc_id"), col("text"), n = 3))
    Dedup.jaccardVerifyFromShingles(sh,
      Dedup.minhashCandidatesFromShingles(sh, numHashes = 16, bands = 4),
      threshold = 0.2)
  }

  /** p6's 4:3:2:1 language-mixture resampling (pure integer
    * thresholds, content-hash draws), shared verbatim with p8's
    * mixture stage — the composite must use the SAME arithmetic as
    * the individually-proven p6. Returns the kept rows of `d`. */
  private def mixtureSample(s: SparkSession, d: DataFrame): DataFrame = {
    import s.implicits._
    val w = Seq(("en", 4L), ("de", 3L), ("fr", 2L), ("es", 1L))
      .toDF("lang", "wt")
    // share()d (round-16): counts feeds BOTH the scale aggregate and
    // the threshold projection — unshared, the corpus-wide language
    // count aggregated twice per run (4 cached rows buy back a full
    // pass over d for p6/p8).
    val counts = Dedup.share(
      d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .join(broadcast(w), Seq("lang")))
    val scale = counts.agg(min(expr("n * 1000000 div wt")).as("sc"))
    val thresh = counts.crossJoin(broadcast(scale))
      .select(col("lang"), expr("wt * sc div n").as("thresh"))
    d.join(broadcast(thresh), Seq("lang"))
      .where(pmod(graft.functions.PortableHash.phash(col("text"), 23),
        lit(1000000L)) < col("thresh"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact content dedup via hash-groupBy.
    "d1_exact_dedup" -> ((s, dir) =>
      Dedup.exactDuplicates(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("text_hash"))),

    // MinHash + LSH candidate pairs (16 hashes, 4 bands × 4 rows).
    "d2_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashCandidates(docs(s, dir), col("doc_id"), col("text"),
          n = 3, numHashes = 16, bands = 4)
        .orderBy(col("id_a"), col("id_b"))),

    // d2c: the band join under the HOT-BUCKET STAR ROUTE (round-12,
    // HotKeys composed into LSH): buckets above the cap emit k−1
    // star pairs to their minimum member instead of k·(k−1)/2 —
    // the quadratic-blowup guard for a crawl shard of near-identical
    // boilerplate, with cluster connectivity (and therefore the d7
    // component path) preserved by construction. cap = 2 so the sf
    // corpora exercise BOTH routes; `capped_only` audits every pair
    // that exists only through star routing — no silent caps.
    "d2c_minhash_capped" -> ((s, dir) =>
      Dedup.minhashCandidatesCapped(
          Dedup.shingleRows(docs(s, dir), col("doc_id"), col("text"),
            n = 3),
          numHashes = 16, bands = 4, hotBucketCap = 2)
        .orderBy(col("id_a"), col("id_b"))),

    // Exact pairwise 3-gram Jaccard ≥ 0.2 (ground truth for LSH).
    "d3_ngram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), col("doc_id"), col("text"),
          n = 3, threshold = 0.2)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a"), col("id_b"))),

    // The production near-dup pipeline: LSH candidates verified by
    // exact Jaccard — linear-ish, unlike the quadratic d3 ground
    // truth. One cached shingle scan feeds both stages.
    "d3v_jaccard_verify" -> ((s, dir) =>
      verifiedPairs(docs(s, dir))
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a"), col("id_b"))),

    // d9: asymmetric containment pairs — the quote-inclusion dup
    // report Jaccard structurally misses (short doc embedded in a
    // long one has jaccard ≈ |A|/|B| < any useful threshold, but
    // containment 1.0). The natural corpus only has symmetric mirror
    // dups, so — t7/p4 convention — the query unions in truncated
    // copies of every 10th doc (first ⌈tokens/8⌉, min 3, tokens; ids
    // offset past max so they never collide): pairs d3's jaccard 0.2
    // gate would MISS are present by construction. Stop-gram cap 50
    // bounds the per-gram join fan-out.
    "d9_containment" -> ((s, dir) => {
      val d0 = docs(s, dir).select(col("doc_id"), col("text"))
      val mx = d0.agg((max(col("doc_id")) + 1).as("_mx"))
      val trunc = d0.where(col("doc_id") % 10 === 0)
        .crossJoin(broadcast(mx))
        .select((col("doc_id") + col("_mx")).as("doc_id"),
          array_join(slice(split(col("text"), " "), lit(1),
            greatest(lit(3),
              expr("size(split(text, ' ')) div 8").cast("int"))), " ")
            .as("text"))
      Dedup.containmentPairs(d0.unionByName(trunc), col("doc_id"),
          col("text"), n = 3, threshold = 0.4, maxGramDf = 50L)
        .withColumn("c_a", round(col("c_a"), 6))
        .withColumn("c_b", round(col("c_b"), 6))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // d10: incremental near-dup via the at-rest LSH index — index the
    // even-id half of the corpus, then match the odd-id half against
    // it as a "new ingest batch": per-batch cost scales with the
    // batch, never the corpus. Bucket collisions and the exact
    // verify are fully deterministic, so even this at-rest pipeline
    // has a bit-exact DuckDB oracle (the d3v oracle restricted to
    // cross-side pairs).
    "d10_index_match" -> ((s, dir) => {
      val d = docs(s, dir)
      val path = persistedIndex(s, s"d10|$dir") { p =>
        graft.operators.NearDupIndex.persist(
          d.where(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), n = 3, numHashes = 16, bands = 4,
          path = p)
      }
      // uncapped: the oracle models no bucket cap, and a silent cap
      // kick-in at a larger sf would diverge the gate (d9 bakes its
      // cap INTO the oracle; here the cap is a production knob only)
      graft.operators.NearDupIndex.matchNew(s, path,
          d.where(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
          n = 3, numHashes = 16, bands = 4, threshold = 0.2,
          maxBucketSize = Int.MaxValue)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("new_id"), col("corpus_id"))
    }),

    // d10a: the at-rest index LIFECYCLE — build on the even half,
    // APPEND the (doc_id % 4 = 1) quarter as an accepted ingest
    // batch (new files into the same band/pb partition directories;
    // the s2a/IVF-append story for the near-dup index), then match
    // the (doc_id % 4 = 3) quarter against the UPDATED index: its
    // candidates must surface against original AND appended corpus
    // docs through one pruned read — yesterday's batch is part of
    // today's dedup corpus without re-shingling anything indexed.
    "d10a_index_append" -> ((s, dir) => {
      val d = docs(s, dir)
      val path = persistedIndex(s, s"d10a|$dir") { p =>
        graft.operators.NearDupIndex.persist(
          d.where(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), n = 3, numHashes = 16, bands = 4,
          path = p)
        graft.operators.NearDupIndex.append(
          d.where(col("doc_id") % 4 === 1),
          col("doc_id"), col("text"), n = 3, numHashes = 16, bands = 4,
          path = p)
      }
      graft.operators.NearDupIndex.matchNew(s, path,
          d.where(col("doc_id") % 4 === 3), col("doc_id"), col("text"),
          n = 3, numHashes = 16, bands = 4, threshold = 0.2,
          maxBucketSize = Int.MaxValue)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("new_id"), col("corpus_id"))
    }),

    // d10c: the at-rest index under the HOT-BUCKET STAR ROUTE
    // (round-13, VERDICT r12 ask #3 — d10's `maxBucketSize` was a
    // production knob the gate never saw; the d2c precedent makes
    // the degenerate-ingest story ORACLE-VISIBLE instead of
    // trusted). The corpus is augmented with a planted boilerplate
    // shard — 10 copies of the minimum-id doc's text, ids past max;
    // evens are INDEXED, odds arrive as the ingest batch — whose
    // identical signatures drive every band bucket past cap 2, so
    // each colliding batch doc proposes ONE star pair to the
    // bucket-min corpus id (capped_only = true) while the natural
    // mirror dups still flow through cool buckets (capped_only =
    // false): both routes exercised, the cap rule and audit column
    // replayed in the DuckDB oracle.
    "d10c_index_match_capped" -> ((s, dir) => {
      val d = docs(s, dir)
      val mx = d.agg((max(col("doc_id")) + 1).as("_mx"),
        min(col("doc_id")).as("_mn"))
      val boiler = d.crossJoin(broadcast(mx))
        .where(col("doc_id") === col("_mn"))
        .select(explode(sequence(col("_mx"), col("_mx") + 9))
          .as("doc_id"), col("text"))
      // share()d: the augmented corpus feeds the (memoized) index
      // build AND matchNewCapped's three batch-side consumers
      // (banding, hashed grams, sizes) — without it the scan+union
      // +max subtree re-executes per consumer (the scan-budget rule;
      // matchNew itself deliberately never caches, so the GATE
      // binding owns the materialization)
      val all = Dedup.share(
        d.select(col("doc_id"), col("text")).unionByName(boiler))
      val path = persistedIndex(s, s"d10c|$dir") { p =>
        graft.operators.NearDupIndex.persist(
          all.where(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), n = 3, numHashes = 16, bands = 4,
          path = p)
      }
      graft.operators.NearDupIndex.matchNewCapped(s, path,
          all.where(col("doc_id") % 2 === 1), col("doc_id"), col("text"),
          n = 3, numHashes = 16, bands = 4, threshold = 0.2,
          hotBucketCap = 2, maxBucketSize = Int.MaxValue)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("new_id"), col("corpus_id"))
    }),

    // 60-bit SimHash fingerprints.
    "d4_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("id"))),

    // Embedding-cosine near-duplicate pairs (exact ground truth; the
    // hyperplane-LSH bucket path is the 100 TB variant). Threshold 0.3
    // matches d5v: the driver's random embeddings have no 0.9-cosine
    // pairs, and a 0 = 0 oracle green proves nothing.
    "d5_embed_neardup" -> ((s, dir) =>
      Similarity.embeddingNearDupPairs(emb(s, dir), col("vec_id"),
          col("embedding"), threshold = 0.3)
        .orderBy(col("id_a"), col("id_b"))),

    // The scale path for d5: hyperplane-LSH buckets, exact dense
    // kernel within buckets. The md5-parity signature is portable, so
    // this approximate operator still has a bit-exact oracle.
    "d5v_embed_neardup_lsh" -> ((s, dir) =>
      Similarity.lshNearDupPairs(emb(s, dir), col("vec_id"),
          col("embedding"), threshold = 0.3, dim = 64, nBits = 6)
        .orderBy(col("id_a"), col("id_b"))),

    // Brute-force cosine top-5 for the first 10 vectors.
    "s1_cosine_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(q, e, k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // IVF ANN scale path (rows-only: quantizer quality — hence the
    // result set — depends on Lloyd details; exactness/determinism
    // pinned by IvfSpec against brute force).
    "s2_ivf_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val index = Ivf.build(e, col("vec_id"), col("embedding"), k = 16)
      Ivf.search(index, q, topK = 5, nProbe = 4)
    }),

    // s2p: the SAME search against the at-rest index — Ivf.persist
    // writes the corpus partitioned by cluster id, searchPersisted
    // prunes the scan to the probed cluster directories via a static
    // `cid IN` partition filter (plan shape pinned in IvfPersistSpec,
    // result parity with s2 pinned there too — and visible here as an
    // identical row count).
    "s2p_ivf_persisted" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ivf.searchAt(s, mainIndexPath(s, dir), q, topK = 5, nProbe = 4)
    }),

    // s12: RADIUS search on the same persisted index ([[Ivf
    // .searchRadiusAt]] — FAISS range_search: "everything within τ",
    // the dedup-against-index / recall-sweep companion to s2p's
    // top-k). Same probed-cluster partition pruning and tombstone
    // semantics; no ranking window at all — the τ-cut fuses into the
    // scoring projection as a plain filter.
    "s12_radius_search" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ivf.searchRadiusAt(s, mainIndexPath(s, dir), q, minSim = 0.25,
        nProbe = 4)
    }),

    // s11: FILTERED ANN — the metadata-predicate search a retrieval
    // layer serves constantly ("nearest English docs", "same shard",
    // "newer than"). The label payload rides IN the inverted lists
    // (Ivf.persistWithPayload), so the predicate evaluates inside the
    // probed clusters' parquet scan as a pushed filter — the top-k is
    // exact over the eligible subset (pre-filtering), not the
    // recall-losing oversample-then-post-filter shape, and there is
    // no corpus-wide metadata join at query time.
    "s11_filtered_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ivf.searchAt(s, filteredIndexPath(s, dir), q, topK = 5, nProbe = 4,
        corpusFilter = col("label") < 3)
    }),

    // s6: IVF×PQ composed — coarse pruning over compressed codes plus
    // exact re-rank, the production ANN shape (rows-only like s2/s4;
    // IvfPqSpec pins PQ-parity when unpruned, recall, and the
    // persisted pruned-scan plan).
    // s2a: the incremental-index lifecycle in one query — persist an
    // IVF index over half the corpus, APPEND the other half with the
    // existing quantizer (no retrain, batch-proportional cost), then
    // search the union from the path alone. Rows-only (quantizer-
    // dependent result set); union coverage, probe-all exactness and
    // old-files-untouched are pinned in IndexAppendSpec.
    "s2a_ivf_append" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ivf.searchAt(s, appendIndexPath(s, dir), q, topK = 5, nProbe = 4)
    }),

    "s6_ivfpq_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      // build+persist once per JVM; the measured path is loadIndex +
      // pruned ADC + exact re-rank — the deployment serving shape
      // (quantizers deterministic, so results equal the in-memory
      // build's, as IvfPqSpec pins)
      IvfPq.searchRerank(IvfPq.loadIndex(s, ivfPqIndexPath(s, dir)), e, q,
        topK = 5, candK = 50, nProbe = 4)
    }),

    // s7: SemDeDup — semantic near-duplicate pruning via k-means
    // clusters + within-cluster cosine domination (rows-only: the
    // kept set depends on the quantizer; the keep-rule properties —
    // kept independence, dropped-has-earlier-neighbor, determinism —
    // are pinned in SemDedupSpec). tau matches d5's 0.3: the driver's
    // random embeddings have no 0.9-cosine pairs, and an all-kept
    // report would prove nothing.
    "s7_semdedup" -> ((s, dir) =>
      graft.operators.SemDedup.report(emb(s, dir), col("vec_id"),
          col("embedding"), kClusters = 16, tau = 0.3)
        .orderBy(col("vec_id"))),

    // p1: the end-to-end corpus-curation pipeline — what a training-
    // data run actually executes: quality gate ∧ language match, keep
    // only exact-dup canonicals (min doc_id per content hash), then
    // drop the higher id of every LSH-verified near-dup pair. Pure
    // composition of t1/t2/d1/d2+d3v — every stage individually
    // oracle-proven, and the composite has its own oracle.
    "p1_corpus_curation" -> ((s, dir) => {
      val d = docs(s, dir)
      val scored = d.select(col("doc_id"), col("lang"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.langGuess(col("text")).as("lang_guess"))
      val base = scored.where(col("quality") >= 0.3 &&
        col("lang_guess") === col("lang"))
      val canon = Dedup.exactDuplicates(d, col("doc_id"), col("text"))
        .select(col("canonical_id").as("doc_id"))
      val nearLosers = verifiedPairs(d)
        .select(col("id_b").as("doc_id")).distinct()
      base
        .join(canon, Seq("doc_id"), "left_semi")
        .join(nearLosers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // Per-document text statistics + quality score + fingerprint.
    "t1_text_stats" -> ((s, dir) =>
      docs(s, dir).select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextFunctions.subwordCount(col("text")).cast("long").as("n_subwords"),
          round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
          round(TextFunctions.stopwordRatio(col("text")), 6).as("stopword_ratio"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.docFingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),

    // Marker-word language guess vs the labelled lang column.
    "t2_lang_guess" -> ((s, dir) =>
      docs(s, dir).select(
          col("doc_id"), col("lang"),
          TextFunctions.langGuess(col("text")).as("lang_guess"))
        .orderBy(col("doc_id"))),

    // t4: per-token document frequency — the TF-IDF building block.
    // Skew-safe shape: per-document array_distinct dedups tokens
    // BEFORE the explode (each doc contributes one row per token),
    // and the count is map-side combinable — a Zipf-hot token like
    // "the" reduces to one partial row per partition before the
    // shuffle. The naive groupBy(tok).agg(countDistinct(doc_id)) over
    // raw occurrences would instead funnel every occurrence of a hot
    // token into one reducer's distinct set.
    "t4_doc_frequency" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("tok"))),

    // Position-sensitive polynomial rolling-hash fingerprint.
    "t3_rolling_fp" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          TextFunctions.rollingFingerprint(col("toks")).as("roll_fp"))
        .orderBy(col("doc_id"))),

    // p2: deterministic train/val/test assignment — content-hash
    // bucketing, NOT rng sampling: reproducible across runs/engines,
    // stable under re-partitioning, and duplicate texts land in the
    // same split (no train/eval leakage through copies). 60-bit
    // portable hash mod 100 → 80/10/10.
    "p2_split_assign" -> ((s, dir) =>
      docs(s, dir).select(
          col("doc_id"),
          when(graft.functions.PortableHash.phash(col("text"), 7) % 100 < 80,
            "train")
            .when(graft.functions.PortableHash.phash(col("text"), 7) % 100 < 90,
              "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))),

    // p3: balanced per-language subsample — corpus balancing without
    // RNG: rank docs inside each language by the portable content hash
    // (a deterministic "random" order) and keep the first k. Same
    // result on any engine, any partitioning, any run.
    "p3_balanced_sample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(graft.functions.PortableHash.phash(col("text"), 11),
          col("doc_id"))
      docs(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 25)
        .select(col("lang"), col("doc_id"), col("rn").cast("long").as("rn"))
        .orderBy(col("lang"), col("rn"))
    }),

    // p4: train/eval contamination report — test-split docs whose
    // exact content also appears in the train split. The corpus is the
    // documents table unioned with a re-idified copy of every 5th doc
    // (modeling scraped mirror content — the same text under two ids;
    // mirror ids offset by max(doc_id)+1 so they can NEVER collide
    // with genuine ids at any corpus size), split by the NAIVE
    // id-hash (splitting by doc_id leaks copies across splits, which
    // is the failure mode this report detects). p2's content-hash
    // split makes this report empty by construction, which is exactly
    // why p2 is the default. The near-dup variant is the same shape
    // over d2/d3v candidates.
    "p4_contamination" -> ((s, dir) => {
      val withSplit = contaminationSplit(s, dir)
      val trainHashes = withSplit.where(col("split") === "train")
        .select(col("h")).distinct()
      withSplit.where(col("split") === "test")
        .join(trainHashes, Seq("h"), "left_semi")
        .select(col("doc_id"), col("h").as("text_hash"))
        .orderBy(col("doc_id"))
    }),

    // p4b: the SAME contamination report through the 100 TB shape — a
    // driver-held Bloom sketch of the train-hash set prefilters the
    // test-split scan BEFORE the exact semi-join confirm. No false
    // negatives (bloom guarantee), false positives removed by the
    // confirm, so the output — and the oracle — is bit-identical to
    // p4. At scale the semi-join's shuffle sees only candidate rows
    // instead of the full test split; this is Spark's own
    // InjectRuntimeFilter shape made explicit and deterministic
    // (equality with p4 also spec-pinned in BloomSpec).
    "p4b_contamination_bloom" -> ((s, dir) => {
      val withSplit = contaminationSplit(s, dir)
      // localCheckpointed: the sketch aggregation materializes it,
      // the semi-join confirm reuses it, and the blocks self-reclaim
      // (no cache entry outliving the query)
      val trainHashes = withSplit.where(col("split") === "train")
        .select(col("h")).distinct().localCheckpoint(false)
      // sized for the sf0.1 train-hash set (~50k keys): 128 KiB of
      // bits → fpp ~2e-4, and the plan literal stays small. At real
      // scale, size numBits to the key-set estimate — the confirm
      // join keeps the output exact regardless.
      val bf = graft.functions.Bloom.sketch(trainHashes, col("h"),
        expectedItems = 1L << 17, numBits = 1L << 20)
      withSplit.where(col("split") === "test")
        .where(graft.functions.Bloom.mightContain(bf, col("h")))
        .join(trainHashes, Seq("h"), "left_semi")
        .select(col("doc_id"), col("h").as("text_hash"))
        .orderBy(col("doc_id"))
    }),

    // p4c: the contamination report a third time, through the
    // PORTABLE bloom operator (round-11 ask #6: sk10's build/probe
    // lifted to operators/Bloom and composed into the p4 semi-join).
    // Unlike p4b's driver-held native sketch (which needs an action
    // to build), the filter here is a ≤⌈m/64⌉-row packed-word frame
    // broadcast into a fully LAZY plan — the probe is a map-side
    // codegen predicate (two hashes + a mask test), zero shuffle
    // before the exact confirm. No false negatives (bloom guarantee)
    // + exact confirm ⇒ output bit-identical to p4, same oracle.
    "p4c_contamination_portable" -> ((s, dir) => {
      import graft.operators.Bloom
      val withSplit = contaminationSplit(s, dir)
      val trainHashes = withSplit.where(col("split") === "train")
        .select(col("h")).distinct().localCheckpoint(false)
      // m = 2^20 bits (16 KiB packed) on ~50k keys at the sf0.1
      // gate: ~10% load, fp ≈ 1% — the confirm join keeps the output
      // exact at ANY fp rate, m only tunes how much the shuffle sees.
      // One operator call off the shared trainHashes checkpoint
      // (round-12, VERDICT r11 "what's wrong" #2 — no more piecewise
      // bits/wordMap/mightContain assembly here); the same frame then
      // feeds the exact confirm.
      Bloom.prefilter(withSplit.where(col("split") === "test"),
          col("h"), trainHashes, col("h"), m = 1 << 20, k = 2)
        .join(trainHashes, Seq("h"), "left_semi")
        .select(col("doc_id"), col("h").as("text_hash"))
        .orderBy(col("doc_id"))
    }),

    // p9: per-source document cap (the RefinedWeb/CCNet "domain cap"
    // curation rule — no single source may dominate the corpus): keep
    // the `cap` highest-quality documents per source, quality ties
    // broken by doc_id. The rank<=cap filter over the window triggers
    // Spark's WindowGroupLimit: each map task keeps only its local
    // top-cap rows per source BEFORE the exchange (plan shape pinned
    // in PlanSpec), so at 100 TB a mega-domain ships ~cap rows per
    // task, not its whole partition, and skew never materializes.
    "p9_source_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id"))
      docs(s, dir)
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 15)
        .select(col("source"), col("doc_id"), col("quality"),
          col("rn").cast("long").as("rn"))
        .orderBy(col("source"), col("rn"))
    }),

    // p10: curriculum ordering — exact global quality rank and the
    // rank-derived training shard, WITHOUT the single-task
    // `row_number() OVER (ORDER BY ...)` window (quantile-bucketed
    // rank + metadata-sized prefix offsets; ranks are exact for any
    // bucket boundaries, so the oracle is the plain global window).
    "p10_curriculum" -> ((s, dir) => {
      val scored = docs(s, dir).select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      graft.operators.Rank.globalRowNumber(scored, col("quality"),
          col("doc_id"), nBuckets = 32, descending = true)
        .withColumn("shard", pmod(col("rank") - 1, lit(8L)))
        .select(col("doc_id"), col("quality"), col("rank"), col("shard"))
        .orderBy(col("rank"))
    }),

    // p11: quality-weighted importance sampling — keep each doc with
    // probability equal to its quality score, decided by a
    // deterministic content-hash draw (the CCNet/RefinedWeb
    // "soft quality filter": low-quality docs survive at reduced
    // rate instead of a hard cutoff, preserving distribution tails).
    // RNG-free → reproducible shards and a bit-exact oracle; pure
    // per-row projection at scale.
    "p11_importance_sample" -> ((s, dir) => {
      // explicit floor(+0.5): Spark's double→long cast truncates,
      // DuckDB's rounds — the repo's fixed-point cents convention
      val q6 = floor(TextFunctions.qualityScore(col("text")) * 1000000L
        + 0.5).cast("long")
      val draw = pmod(graft.functions.PortableHash.phash(col("text"), 31),
        lit(1000000L))
      docs(s, dir)
        .withColumn("q6", q6).withColumn("draw", draw)
        .where(col("draw") < col("q6"))
        .select(col("doc_id"), col("q6"), col("draw"))
        .orderBy(col("doc_id"))
    }),

    // t5: per-language corpus statistics — doc counts, exact vocabulary
    // size, mean document length. The distinct-vocabulary count dedups
    // (lang, tok) per document BEFORE the global distinct (two-stage
    // shape, same skew rationale as t4); at 100 TB the drop-in
    // replacement is approx_count_distinct (HLL sketch, merge-combinable,
    // no distinct shuffle) — pinned against this exact version in
    // OperatorSpec.
    "t5_vocab_stats" -> ((s, dir) => {
      val d = docs(s, dir)
      val vocab = d
        .select(col("lang"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("_n"))
        .groupBy(col("lang")).agg(count(lit(1)).as("vocab"))
      val stats = d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(size(split(col("text"), " "))), 6).as("avg_tokens"))
      stats.join(vocab, Seq("lang")).orderBy(col("lang"))
    }),

    // t10: corpus heavy hitters — the exact top-20 tokens by total
    // occurrences (boilerplate/stop-token audit). Plans a parallel
    // TakeOrderedAndProject over a map-side-combinable token count —
    // no global sort. The Count-Min-Sketch drop-in (estimate within
    // eps·N of these exact counts, never below) is pinned in
    // OperatorSpec, completing the sketch family: HLL (t5),
    // Bloom (p4b), CMS (here).
    "t10_heavy_hitters" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20)),

    // t6: Gopher-style hard-filter report — the rule-by-rule audit a
    // curation run reads before committing to thresholds.
    "t6_gopher_filter" -> ((s, dir) =>
      TextFunctions.gopherReport(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))),

    // d6: cross-corpus boilerplate (repeated n-gram spans): grams in
    // ≥5 distinct docs are boilerplate; per-doc coverage report.
    // Thresholds tuned to the driver corpus so the keep flag actually
    // discriminates (339 docs carry hot grams, a few exceed 10%
    // coverage) — a green over an all-true column proves nothing.
    "d6_boilerplate" -> ((s, dir) =>
      Dedup.boilerplateReport(docs(s, dir), col("doc_id"), col("text"),
          n = 3, minDf = 5L, maxHotFrac = 0.1)
        .orderBy(col("doc_id"))),

    // d4v: SimHash near-dup pairs via banding — pigeonhole gives
    // recall 1.0 for hamming ≤ bands−1 (unlike MinHash banding, the
    // guarantee is exact); verification is one codegen'd
    // bit_count(xor) on 64-bit fingerprints.
    "d4v_simhash_neardup" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(
          Dedup.simhash(docs(s, dir), col("doc_id"), col("text")),
          maxHamming = 1)
        .orderBy(col("id_a"), col("id_b"))),

    // d4vc: d4v's chunk-bucket join under the hot-bucket star route
    // (round-12 — the d2c idiom on SimHash banding, where the sf
    // corpora carry REAL mega-buckets: ~150 docs share degenerate
    // chunks at sf0.01). Hamming verification still applies to every
    // candidate (precision untouched); the pigeonhole recall
    // guarantee narrows only inside hot buckets, audited per pair by
    // `capped_only`.
    "d4vc_simhash_capped" -> ((s, dir) =>
      Dedup.simhashNearDupPairsCapped(
          Dedup.simhash(docs(s, dir), col("doc_id"), col("text")),
          maxHamming = 1, hotBucketCap = 32)
        .orderBy(col("id_a"), col("id_b"))),

    // d7: near-dup CLUSTERS — connected components over the verified
    // pair list (a~b, b~c collapse to one canonical, not two
    // independent drops). Min-label propagation; oracle is a DuckDB
    // recursive CTE over the identical pair list.
    "d7_dedup_clusters" -> ((s, dir) => {
      val pairs = verifiedPairs(docs(s, dir))
      Dedup.connectedComponents(pairs.select(col("id_a"), col("id_b")))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
        .orderBy(col("doc_id"))
    }),

    // d8: quality-aware canonical selection — within each near-dup
    // cluster (d7 components) keep the HIGHEST-quality copy, not the
    // smallest id: what a curation run actually wants when mirrors
    // differ in cleanliness. Ties break to the smaller id. One
    // doc-partitioned window over the (tiny) clustered subset.
    // d18: per-doc CURATION LINEAGE — the audit trail that answers
    // "why did doc X disappear?" across the dedup ladder in its
    // production order: (1) exact duplicates drop to their min-id
    // copy; (2) among exact survivors, near-dup cluster members drop
    // to the cluster canonical (d8's quality-then-id rule); (3)
    // canonicals and untouched docs keep, labeled apart. Every drop
    // row names its peer (what it was deduped INTO) — the lineage a
    // takedown/provenance request actually needs, where d1/d7/d8
    // each answer only their own stage. Exact dups are injected by
    // construction (re-keyed copies of every 10th doc — the d11
    // convention; the organic corpus has none and a 0-row class
    // proves nothing); near-dup pairs are the organic d3v ones,
    // RESTRICTED to exact-survivors so the ladder composes rather
    // than double-reports. Scale shape: stage 1 is one md5 groupBy;
    // stage 2 reuses the shared shingle scan + banded candidates +
    // CC on the verified pairs (the d7/d8 kernels); the final
    // assembly is two id-keyed joins.
    "d18_curation_lineage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val d = base.unionByName(
        base.where(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val ex = d.select(col("doc_id"), md5(col("text")).as("h"))
      val withEx = Dedup.share(ex.join(
        ex.groupBy(col("h")).agg(min(col("doc_id")).as("canon_ex")),
        Seq("h")).select(col("doc_id"), col("canon_ex")))
      val surv = withEx.where(col("doc_id") === col("canon_ex"))
        .select(col("doc_id"))
      val pairs = verifiedPairs(d)
        .join(surv.select(col("doc_id").as("id_a")), Seq("id_a"),
          "left_semi")
        .join(surv.select(col("doc_id").as("id_b")), Seq("id_b"),
          "left_semi")
      val clusters = Dedup
        .connectedComponents(pairs.select(col("id_a"), col("id_b")))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      val scored = clusters.join(
        d.select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("q")), Seq("doc_id"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("q").desc, col("doc_id"))
      val ranked = Dedup.share(scored.withColumn("rn", row_number().over(w)))
      val nd = ranked.join(
        ranked.where(col("rn") === 1)
          .select(col("cluster_id"), col("doc_id").as("canon_nd")),
        Seq("cluster_id"))
      d.select(col("doc_id"))
        .join(withEx, Seq("doc_id"))
        .join(nd.select(col("doc_id"), col("cluster_id"), col("canon_nd")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") =!= col("canon_ex"), "drop_exact")
            .when(col("canon_nd").isNotNull &&
              col("doc_id") =!= col("canon_nd"), "drop_neardup")
            .when(col("canon_nd").isNotNull, "keep_canonical")
            .otherwise("keep_unique").as("status"),
          when(col("doc_id") =!= col("canon_ex"), col("canon_ex"))
            .when(col("canon_nd").isNotNull &&
              col("doc_id") =!= col("canon_nd"), col("canon_nd"))
            .as("peer_id"),
          col("cluster_id"))
        .orderBy(col("doc_id"))
    }),

    "d8_cluster_canonicals" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val pairs = verifiedPairs(d)
      val clusters = Dedup
        .connectedComponents(pairs.select(col("id_a"), col("id_b")))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      val scored = clusters.join(
        d.select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality")),
        Seq("doc_id"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id"))
      scored
        .withColumn("rn", row_number().over(w))
        .select(col("cluster_id"), col("doc_id"), col("quality"),
          (col("rn") === 1).as("canonical"))
        .orderBy(col("cluster_id"), col("doc_id"))
    }),

    // t9: self-trained unigram surprisal — the cheap "perplexity"
    // quality signal: score docs by the mean -ln p(token) under the
    // corpus's own unigram distribution. Two-pass model-then-score
    // shape; per-token surprisal goes FIXED-POINT (floor·1e6) before
    // any summation so doc scores are engine-exact integer sums, not
    // order-dependent float accumulations. Skew-safe: per-doc token
    // counts pre-aggregate before the frequency join (t4's rationale),
    // so a Zipf-hot token joins once per containing doc, not once per
    // occurrence.
    "t9_unigram_surprisal" -> ((s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val perDoc = tok.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
      // model from perDoc, not raw occurrences: the occurrence rows
      // shuffle once (d6's two-exchange rationale) and the freq
      // groupBy consumes perDoc's partitioning. NOT share()d: the
      // round-8 A/B (0.68 s unshared vs 0.81 s shared, sf0.1 solo)
      // showed AQE's exchange reuse already covers this exact shape —
      // both consumers sit directly on pd's exchange — so the cache
      // materialization is pure overhead here, unlike the
      // p13/d11-class shapes where a join intervenes.
      val freq = perDoc.groupBy(col("tok")).agg(sum(col("cnt")).as("n_tok"))
      val totalN = freq.agg(sum(col("n_tok")).as("n_total"))
      perDoc.join(freq, "tok").crossJoin(broadcast(totalN))
        .select(col("doc_id"), col("cnt"),
          (col("cnt") * floor(-log(col("n_tok").cast("double") /
            col("n_total")) * 1000000.0d)).as("sv"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"), sum(col("sv")).as("_ssum"))
        .select(col("doc_id"), col("n_tokens"),
          microMean6("_ssum", "n_tokens").as("mean_surprisal"))
        .orderBy(col("doc_id"))
    }),

    // p13: DSIR importance weights (Xie et al. 2023) — score every
    // doc by how target-like its hashed-unigram distribution is:
    // per-bucket add-one log-ratios ln(p_target/p_raw) over 4096
    // portable-hash buckets, doc weight = fixed-point integer sum of
    // its buckets' ratios, and the top fifth by exact global rank is
    // `selected` — data selection for a target domain without a
    // trained classifier. Scale shape: one shuffle to per-doc bucket
    // counts which feed BOTH distributions and the scoring join; the
    // 4096-row ratio table and the corpus totals broadcast; the rank
    // is p10's distributed exact rank, no single-task window.
    "p13_dsir_weights" -> ((s, dir) => {
      val bN = 4096
      // target membership folds to a boolean BEFORE the bucket-count
      // shuffle: source is functionally dependent on doc_id, so
      // keying the groupBy on (doc_id, b) alone (with max(tgt)
      // recovering membership) ships narrower shuffle rows than a
      // (doc_id, source, b) key — the same counts, minus a string
      // per row at 100 TB.
      val tok = docs(s, dir).select(col("doc_id"),
          col("source").isin("src0", "src1").as("tgt"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), col("tgt"),
          (graft.functions.PortableHash.phash(col("tok"), 13) % bN).as("b"))
      // pd feeds THREE branches (rawB, tgtB, the scoring join) and
      // AQE's runtime exchange reuse only dedupes part of them —
      // unshared, the tokenize+explode executes per branch. share()
      // materializes the per-doc bucket counts once (rows bounded by
      // n_docs × min(tokens/doc, 4096), far smaller than the token
      // stream).
      val pd = graft.operators.Dedup.share(
        tok.groupBy(col("doc_id"), col("b"))
          .agg(count(lit(1)).as("cnt"), max(col("tgt")).as("tgt")))
      val rawB = pd.groupBy(col("b")).agg(sum(col("cnt")).as("rc"))
      val tgtB = pd.where(col("tgt"))
        .groupBy(col("b")).agg(sum(col("cnt")).as("tc"))
      val totals = rawB.agg(sum(col("rc")).as("nr"))
        .crossJoin(tgtB.agg(sum(col("tc")).as("nt")))
      val lr = rawB.join(tgtB, Seq("b"), "left")
        .crossJoin(broadcast(totals))
        .select(col("b"), floor(log(
          ((coalesce(col("tc"), lit(0L)) + 1).cast("double") /
            (col("nt") + bN)) /
          ((col("rc") + 1).cast("double") / (col("nr") + bN)))
          * 1000000.0d).as("lr"))
      // perDoc is consumed by the rank's two passes plus the nd
      // count — share it too (n_docs rows, tiny)
      val perDoc = graft.operators.Dedup.share(
        pd.join(broadcast(lr), Seq("b"))
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_tokens"),
            sum(col("cnt") * col("lr")).as("_w")))
      val nd = perDoc.agg(count(lit(1)).as("nd"))
      graft.operators.Rank
        .globalRowNumber(perDoc, col("_w"), col("doc_id"), descending = true)
        .crossJoin(broadcast(nd))
        .select(col("doc_id"), col("n_tokens"),
          microMean6("_w", "n_tokens").as("mean_log_ratio"),
          col("rank"),
          (col("rank") <= floor(col("nd") / 5)).as("selected"))
        .orderBy(col("doc_id"))
    }),

    // d11: exact-substring duplication report (the Lee et al. 2022
    // "Deduplicating Training Data" shape, hash-approximated): every
    // 20-token window rolls to an md5 hash; a window whose hash
    // occurs at ≥2 (doc, start) sites anywhere in the corpus is a
    // duplicated span, and each doc reports its duplicated-window
    // count and token coverage. Corpus is by-construction
    // contaminated (re-idified copies of every 5th doc, the p4/p7
    // pattern) so copies score coverage 1.0 and organic docs ~0.
    // Scale shape: only (doc_id, start, hash) rows past the window
    // expression — the text itself never shuffles; the duplicate set
    // is one map-side-combinable groupBy on the 16-byte hash; the
    // coverage explode is bounded by dup-window count × w, not corpus
    // size.
    "d11_substring_dedup" -> ((s, dir) => {
      val w = 20
      val d0 = docs(s, dir).select(col("doc_id"), col("text"))
      val mx = d0.agg((max(col("doc_id")) + 1).as("_mx"))
      val d = d0.unionByName(
        d0.where(col("doc_id") % 5 === 0).crossJoin(broadcast(mx))
          .select((col("doc_id") + col("_mx")).as("doc_id"), col("text")))
      val t = d.select(col("doc_id"), split(col("text"), " ").as("t"))
        .where(size(col("t")) >= w)
      // wins (the md5-per-window explode, the query's dominant cost)
      // feeds BOTH the dup-hash aggregation and the dup join, and dup
      // feeds BOTH coverage and counts — share() each so the window
      // hashing runs once, not per consumer branch (the p13 lesson:
      // AQE exchange reuse does not cover these shapes)
      val wins = Dedup.share(
        t.select(col("doc_id"), size(col("t")).as("n_tokens"),
          posexplode(transform(
            sequence(lit(1), size(col("t")) - (w - 1)),
            i => md5(array_join(slice(col("t"), i, lit(w)), " ")))))
        .select(col("doc_id"), col("n_tokens"),
          (col("pos") + 1).as("start"), col("col").as("h")))
      val dupH = wins.groupBy(col("h")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 2).select(col("h"))
      val dup = Dedup.share(wins.join(dupH, Seq("h")))
      val cover = dup
        .select(col("doc_id"),
          explode(sequence(col("start"), col("start") + (w - 1))).as("p"))
        .groupBy(col("doc_id"))
        .agg(count_distinct(col("p")).as("dup_tokens"))
      val dupCnt = dup.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_dup_windows"))
      t.select(col("doc_id"), size(col("t")).as("n_tokens"),
          (size(col("t")) - (w - 1)).cast("long").as("n_windows"))
        .join(dupCnt, Seq("doc_id"), "left")
        .join(cover, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("n_windows"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            col("n_tokens"), 6).as("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    // d13: the REMOVAL half of Lee et al. exact-substring dedup (d11
    // is the report): every token covered by a duplicated 20-token
    // window is stripped and the survivors rejoin — the aggressive
    // remove-every-occurrence variant (keep-one-copy semantics live
    // in d7/d8's cluster canonicals). Same contaminated corpus and
    // dup-window derivation as d11, so the two queries adjudicate the
    // same spans. Scale shape: the rewrite is MAP-SIDE — only the
    // per-doc covered-position sets (bounded by dup-window count, not
    // corpus size) aggregate and join back; the text itself never
    // shuffles, and the index-aware filter HOF costs O(tokens·|cov|)
    // per doc (bounded by doc length²; a token-explode anti-join is
    // the constant-work-per-token alternative when docs are huge —
    // it shuffles every token once).
    "d13_substring_removal" -> ((s, dir) => {
      val w = 20
      val d0 = docs(s, dir).select(col("doc_id"), col("text"))
      val mx = d0.agg((max(col("doc_id")) + 1).as("_mx"))
      val d = d0.unionByName(
        d0.where(col("doc_id") % 5 === 0).crossJoin(broadcast(mx))
          .select((col("doc_id") + col("_mx")).as("doc_id"), col("text")))
      val t = d.select(col("doc_id"), split(col("text"), " ").as("t"))
      // share the window-hash explode: it feeds the dup-hash agg AND
      // the coverage join (the d11/p13 multi-consumer lesson)
      val wins = Dedup.share(t.where(size(col("t")) >= w)
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(1), size(col("t")) - (w - 1)),
            i => md5(array_join(slice(col("t"), i, lit(w)), " ")))))
        .select(col("doc_id"), (col("pos") + 1).as("start"),
          col("col").as("h")))
      val dupH = wins.groupBy(col("h")).agg(count(lit(1)).as("n"))
        .where(col("n") >= 2).select(col("h"))
      val covA = wins.join(dupH, Seq("h"))
        .select(col("doc_id"),
          explode(sequence(col("start"), col("start") + (w - 1))).as("p"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("p"))).as("cov"))
      t.join(covA, Seq("doc_id"), "left")
        .withColumn("cov", coalesce(col("cov"), array().cast("array<int>")))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          (size(col("t")) - size(col("cov"))).cast("long").as("n_kept"),
          array_join(filter(col("t"),
            (tok, i) => !array_contains(col("cov"), i + 1)), " ")
            .as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // d14: PASSAGE-level exact dedup — d1's content-hash dedup at
    // p14's chunk granularity: the repeated-boilerplate / shared-
    // passage detector that document-level hashing structurally
    // misses (two distinct docs quoting the same 32-token block).
    // Same contaminated corpus as d11/d13 so duplicated passages
    // exist by construction. Scale shape: the chunker is one
    // generator per doc (md5 + offsets ship, never text), then ONE
    // map-side-combinable groupBy on chunk_hash — the d1 plan over a
    // w/stride-bounded row multiple of the corpus.
    "d14_chunk_dedup" -> ((s, dir) => {
      val d0 = docs(s, dir).select(col("doc_id"), col("text"))
      val mx = d0.agg((max(col("doc_id")) + 1).as("_mx"))
      val d = d0.unionByName(
        d0.where(col("doc_id") % 5 === 0).crossJoin(broadcast(mx))
          .select((col("doc_id") + col("_mx")).as("doc_id"), col("text")))
      graft.operators.Chunk.tokenWindows(d, col("doc_id"), col("text"),
          w = 32, stride = 24)
        .groupBy(col("chunk_hash"))
        .agg(count(lit(1)).as("n_copies"),
          count_distinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("canonical_doc"),
          min(col("tok_start")).as("min_tok_start"))
        .where(col("n_copies") >= 2)
        .orderBy(col("chunk_hash"))
    }),

    // t16: TF-IDF keyword extraction — per-doc top-5 terms by
    // tf·idf, the tagging/routing primitive (t4 is the DF table;
    // this closes the loop into ranked keywords). idf goes
    // fixed-point (floor(1e6·ln(N/df))) so each term score is an
    // exact BIGINT product and ranks are engine-exact. Scale shape:
    // one shuffle to per-(doc,term) counts feeding BOTH the df
    // re-aggregation and the scoring join (t4's rationale); N rides
    // a 1-row broadcast; the per-doc top-5 prunes via
    // WindowGroupLimit.
    "t16_tfidf_keywords" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val pd = Dedup.share(docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
      val df_ = pd.groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_fp").desc, col("term"))
      pd.join(df_, Seq("term"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          (col("tf") * floor(log(col("n_docs").cast("double") /
            col("df")) * 1000000.0d).cast("long")).as("score_fp"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 5)
        .select(col("doc_id"), col("rank"), col("term"), col("score_fp"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // p22: span-level cross-split DECONTAMINATION — the directional
    // report an eval-protection pass publishes: for every TEST doc,
    // how many of its tokens sit inside a 20-token window that also
    // appears in ANY train doc (p4 flags whole-doc hash leaks, p7
    // n-gram-sample overlap; this is the Lee-et-al span machinery of
    // d11 aimed across the split boundary — partial quotes and
    // templated fragments that doc-level hashing misses). Same
    // contaminated corpus + split hash as p4, so leaks exist by
    // construction. Scale shape: only (split, start, 16-B hash) rows
    // shuffle, never text; the train-side DISTINCT hash set joins the
    // test side on the hash — at 100 TB that is the d11 plan with a
    // split filter on each side.
    "p22_span_decontamination" -> ((s, dir) => {
      val w = 20
      val d0 = docs(s, dir).select(col("doc_id"), col("text"))
      val mx = d0.agg((max(col("doc_id")) + 1).as("_mx"))
      val d = d0.unionByName(
        d0.where(col("doc_id") % 5 === 0).crossJoin(broadcast(mx))
          .select((col("doc_id") + col("_mx")).as("doc_id"), col("text")))
      val bucket = graft.functions.PortableHash
        .phash(col("doc_id").cast("string"), 7) % 100
      val t = d.withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test"))
        .select(col("doc_id"), col("split"), split(col("text"), " ").as("t"))
      // shared: the window-hash explode feeds the train-hash distinct
      // AND the test-side coverage join (the d11/p13 lesson)
      val wins = Dedup.share(t.where(size(col("t")) >= w)
        .select(col("doc_id"), col("split"),
          posexplode(transform(
            sequence(lit(1), size(col("t")) - (w - 1)),
            i => md5(array_join(slice(col("t"), i, lit(w)), " ")))))
        .select(col("doc_id"), col("split"),
          (col("pos") + 1).as("start"), col("col").as("h")))
      val trainH = wins.where(col("split") === "train")
        .select(col("h")).distinct()
      val cov = wins.where(col("split") === "test")
        .join(trainH, Seq("h"))
        .select(col("doc_id"),
          explode(sequence(col("start"), col("start") + (w - 1))).as("p"))
        .groupBy(col("doc_id"))
        .agg(count_distinct(col("p")).as("leaked"))
      t.where(col("split") === "test")
        .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("leaked"), lit(0L)).as("leaked_tokens"),
          round(coalesce(col("leaked"), lit(0L)).cast("double") /
            col("n_tokens"), 6).as("leak_frac"))
        .orderBy(col("doc_id"))
    }),

    // t11: self-trained add-one-smoothed bigram LM surprisal — the
    // CCNet-style "perplexity against an LM" quality score, one model
    // class up from t9's unigram. Same scale shape: per-doc bigram
    // counts shuffle once and feed BOTH the model aggregation and the
    // scoring join (no raw-occurrence re-shuffle); vocab size rides a
    // 1-row broadcast; surprisal goes fixed-point (floor(-ln p·1e6))
    // before the integer sum so doc scores are engine-exact.
    "t11_bigram_surprisal" -> ((s, dir) => {
      val t = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("t"))
      val bg = t.where(size(col("t")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .select(col("doc_id"), col("p.w1"), col("p.w2"))
      // NOT share()d: round-8 A/B measured flat (1.33 s both ways at
      // sf0.1 solo) — as in t9, the model aggregations consume pd's
      // exchange directly and AQE reuses it
      val pd = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt"))
      val m12 = pd.groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("n12"))
      val m1 = m12.groupBy(col("w1")).agg(sum(col("n12")).as("n1"))
      val voc = t.select(explode(col("t")).as("tok")).distinct()
        .agg(count(lit(1)).as("v"))
      pd.join(m12, Seq("w1", "w2")).join(m1, Seq("w1"))
        .crossJoin(broadcast(voc))
        .select(col("doc_id"), col("cnt"),
          (col("cnt") * floor(-log((col("n12") + lit(1)).cast("double") /
            (col("n1") + col("v"))) * 1000000.0d)).as("sv"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_bigrams"), sum(col("sv")).as("_s"))
        .select(col("doc_id"), col("n_bigrams"),
          microMean6("_s", "n_bigrams").as("mean_surprisal"))
        .orderBy(col("doc_id"))
    }),

    // p14: overlapping token-window chunking ([[Chunk.tokenWindows]]
    // — the RAG / sequence-prep primitive). W=32 / stride=24 sized to
    // the 10-99-token synthetic docs; the operator guarantees full
    // token coverage with no fully-redundant trailing chunk, and
    // ships md5 fingerprints + offsets, never chunk text. Scale
    // shape: one generator per doc, no join, no shuffle past the
    // scan.
    "p14_chunk_windows" -> ((s, dir) => {
      graft.operators.Chunk.tokenWindows(docs(s, dir),
          col("doc_id"), col("text"), w = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // t12: BPE merge-pair statistics ([[Bpe.mergePairs]] — tokenizer
    // training's corpus-scale step). Scale shape: occurrences
    // collapse to the distinct-word vocabulary BEFORE pairs explode,
    // so a Zipf-hot word contributes its pairs once under an integer
    // weight; deterministic top-64 (ties on pair asc).
    "t12_bpe_merges" -> ((s, dir) =>
      graft.operators.Bpe.mergePairs(docs(s, dir), col("text"), topK = 64)),

    // p15: margin-based bitext mining (Artetxe & Schwenk 2019) over
    // the en→de language split ([[Similarity.bitextMarginPairs]]).
    // Ratio margin = cos / mean(k-NN avg cos both directions), k=4;
    // fixed-point cosines make the directional sums engine-exact.
    // Scale shape: brute-force kernel here (query side broadcast);
    // the margin arithmetic consumes any ANN candidate generator.
    "p15_bitext_margin" -> ((s, dir) => {
      val lang = docs(s, dir).select(col("doc_id"), col("lang"))
      val e = emb(s, dir)
        .join(lang, col("vec_id") === col("doc_id")).drop("doc_id")
      Similarity.bitextMarginPairs(
          e.where(col("lang") === "en")
            .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
          e.where(col("lang") === "de")
            .select(col("vec_id"), col("embedding")),
          k = 4, threshold = 1.05)
        .orderBy(col("qid"))
    }),

    // d12: blocked edit-distance fuzzy matching
    // ([[Dedup.blockedEditPairs]] — the entity-resolution kernel).
    // Corpus is by-construction contaminated (every 10th doc
    // re-idified with title token 5 replaced, the p4/d11 injection
    // pattern) so mutated copies land in the same first-3-token block
    // at levenshtein ≈ 6 while the 64-word vocab contributes organic
    // exact-title collisions at 0. Scale shape: equi-join on the
    // block key, levenshtein only inside ≤maxBlock blocks.
    "d12_fuzzy_pairs" -> ((s, dir) => {
      val d0 = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("t"))
      val mx = d0.agg((max(col("doc_id")) + 1).as("_mx"))
      val orig = d0.select(col("doc_id"),
        array_join(slice(col("t"), 1, 8), " ").as("title"))
      val mut = d0.where(col("doc_id") % 10 === 0).crossJoin(broadcast(mx))
        .select((col("doc_id") + col("_mx")).as("doc_id"),
          array_join(concat(slice(col("t"), 1, 4), array(lit("MUTANT")),
            slice(col("t"), 6, 3)), " ").as("title"))
      Dedup.blockedEditPairs(orig.unionByName(mut),
          col("doc_id"), col("title"),
          array_join(slice(split(col("title"), " "), 1, 3), " "),
          maxDist = 10, maxBlock = 100)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // p7: n-gram-level eval contamination (the GPT-3/Llama
    // decontamination method): for each test-split doc, the fraction
    // of its distinct 5-grams that appear anywhere in the train
    // split. p4 catches exact copies; this catches PARTIAL leakage
    // (near-dups, quoted spans). Same by-construction corpus as p4
    // (id-split over a union with re-idified copies) so the report is
    // non-vacuous: exact copies score 1.0, near-dup spans fractional.
    // Scale shape: grams dedup per (doc, split) before any join, the
    // train side collapses to a distinct hash set, and the probe is a
    // hash join on 60-bit longs — no text ships past the explode.
    "p7_ngram_overlap" -> ((s, dir) => {
      val d0 = docs(s, dir).select(col("doc_id"), col("text"))
      val mx = d0.agg((max(col("doc_id")) + 1).as("_mx"))
      val d = d0.unionByName(
        d0.where(col("doc_id") % 5 === 0).crossJoin(broadcast(mx))
          .select((col("doc_id") + col("_mx")).as("doc_id"), col("text")))
      val bucket = graft.functions.PortableHash
        .phash(col("doc_id").cast("string"), 7) % 100
      val withSplit = d.select(col("doc_id"), col("text"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
      // shared: the gram explode+distinct feeds the train-hash set
      // AND the test scoring side (the d11/p13 lesson)
      val grams = Dedup.share(withSplit
        .select(col("doc_id"), col("split"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("split"),
          explode(Dedup.shingles(col("toks"), 5)).as("g"))
        .select(col("doc_id"), col("split"),
          graft.functions.PortableHash.phash(col("g"), 0).as("h"))
        .distinct())
      val trainGrams = grams.where(col("split") === "train")
        .select(col("h")).distinct().withColumn("_hit", lit(1L))
      grams.where(col("split") === "test")
        .join(trainGrams, Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
        .withColumn("overlap_frac",
          round(col("n_hit").cast("double") / col("n_grams"), 6))
        .withColumn("contaminated", col("overlap_frac") >= 0.5)
        .orderBy(col("doc_id"))
    }),

    // p8: the full pretraining-data pipeline as ONE oracle-checked
    // query — RefinedWeb-shaped: Gopher hard filters ∧ repetition
    // filters → exact-dup canonicals → near-dup CLUSTER canonicals
    // (d7 components over the verified pairs: keep each cluster's
    // min id — pairwise loser-dropping would keep both ends of a
    // transitive chain like 1~3, 2~3; p1 documents that simpler
    // policy) → mixture resample to 4:3:2:1 language weights
    // (computed over the SURVIVORS, as a real run would) → pack the
    // kept docs into 512-token training sequences. Every stage is an
    // individually oracle-proven operator (t6, t8, d1, d2+d3v+d7,
    // p6, p5); this pins their COMPOSITION, including the stage
    // order dependencies (mixture thresholds depend on filter+dedup
    // output, packing offsets depend on the mixture's keep set).
    "p8_pretrain_pipeline" -> ((s, dir) => {
      val d = docs(s, dir)
      val gopherKeep = TextFunctions.gopherReport(d, col("doc_id"), col("text"))
        .where(col("keep")).select(col("doc_id"))
      val repKeep = TextFunctions.repetitionReport(d, col("doc_id"), col("text"))
        .where(col("keep")).select(col("doc_id"))
      val canon = Dedup.exactDuplicates(d, col("doc_id"), col("text"))
        .select(col("canonical_id").as("doc_id"))
      val pairs = verifiedPairs(d)
      val nearLosers = Dedup
        .connectedComponents(pairs.select(col("id_a"), col("id_b")))
        .where(col("id") =!= col("label"))
        .select(col("id").as("doc_id"))
      // materialize the stage boundaries: survivors feed the mixture
      // counts AND the keep scan, mixed feeds both packReport windows
      // and the final lang join — unmaterialized, the whole
      // filter+dedup subtree (LSH verify included) re-executes per
      // consumer. At 100 TB the equivalent is materializing each
      // stage to parquet between jobs, which a real pipeline does
      // anyway. Lazy localCheckpoint (not cache) so the blocks
      // self-reclaim after the query's references drop.
      val survivors = d
        .join(gopherKeep, Seq("doc_id"), "left_semi")
        .join(repKeep, Seq("doc_id"), "left_semi")
        .join(canon, Seq("doc_id"), "left_semi")
        .join(nearLosers, Seq("doc_id"), "left_anti")
        .localCheckpoint(false)
      val mixed = mixtureSample(s, survivors)
        .select(col("doc_id"), col("lang"), col("text"))
        .localCheckpoint(false)
      Pack.packReport(mixed, col("doc_id"),
          size(split(col("text"), " ")), budget = 512L)
        .withColumnRenamed("id", "doc_id")
        .join(mixed.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("offset"), col("seq_first"), col("seq_last"))
        .orderBy(col("doc_id"))
    }),

    // s4: product-quantization ANN (rows-only like s2: codeword means
    // are FP-order dependent, so no SQL oracle; recall + determinism
    // pinned in PqSpec). Corpus vectors compress 16× (256 B → 16
    // codes); scoring is per-query LUT lookups, no vector math per
    // candidate.
    "s4_pq_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Pq.searchAt(s, pqIndexPath(s, dir), q, topK = 5)
    }),

    // s5: two-stage retrieval — PQ codes select 50 candidates, exact
    // float cosine re-ranks to the final top-5 (rows-only like
    // s2/s4; recall-vs-single-stage pinned in PqSpec).
    "s5_pq_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Pq.searchRerank(Pq.loadIndex(s, pqIndexPath(s, dir)), e, q,
        topK = 5, candK = 50)
    }),

    // p5: GPT-style sequence packing — concatenate docs in a
    // deterministic hash order, cut 512-token training sequences,
    // report each doc's offset and sequence span. The global prefix
    // sum is distributed (bucketed two-pass — see Pack's scaladoc);
    // no single-task global window.
    "p5_pack_sequences" -> ((s, dir) =>
      Pack.packReport(docs(s, dir), col("doc_id"),
          size(split(col("text"), " ")), budget = 512L)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))),

    // p21: tokenizer-aware sequence packing — p5's packer fed by
    // t15's BPE token counts instead of whitespace counts: the
    // actual "cut 512-TOKENIZER-token training sequences" prep step
    // (whitespace counts under-budget a subword tokenizer by the
    // tokens-per-word ratio). Pure composition of the two proven
    // stages: the word-join count from t15 flows into packReport's
    // distributed prefix sum; the oracle replays BOTH — merges from
    // the dump, then the same bucketed two-pass cumsum.
    "p21_bpe_pack" -> ((s, dir) => {
      val p = bpeModelPath(s, dir)
      val vocab = s.read.parquet(s"$p/vocab")
        .select(col("word"), size(col("toks")).as("ns"))
      val counts = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .where(length(col("word")) >= 1) // t15's empty-word contract
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
        .join(vocab, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt") * col("ns")).as("n_bpe"))
      Pack.packReport(counts, col("doc_id"), col("n_bpe"), budget = 512L)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // p5b: the packing manifest a trainer consumes — one row per
    // 512-token training sequence with its document membership
    // (straddling docs appear in every sequence they touch). Derived
    // entirely from p5's report by exploding each doc's sequence
    // span; the groupBy is map-side combinable on seq_id.
    "p5b_pack_manifest" -> ((s, dir) =>
      Pack.packReport(docs(s, dir), col("doc_id"),
          size(split(col("text"), " ")), budget = 512L)
        // zero-token docs have seq_last < seq_first (no sequences);
        // sequence() would DESCEND for them, inventing membership
        .where(col("seq_last") >= col("seq_first"))
        .select(col("id").as("doc_id"), col("n_tokens"),
          explode(sequence(col("seq_first"), col("seq_last"))).as("seq_id"))
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("seq_id"))),

    // t7: PII scrub report over a corpus with deterministically
    // injected emails/IPs (the driver corpus has none — same
    // by-construction pattern as p4; a 0-hit green proves nothing).
    // The injected address is MIXED-CASE on purpose: it pins the
    // (?i) in EmailPattern — a case-sensitive scrub would leave it
    // in the text and flip n_emails/clean_hash/pii_free.
    "t7_pii_scrub" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact User"), col("doc_id").cast("string"),
              lit("@Example.COM"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" host 10."), (col("doc_id") % 256).cast("string"),
              lit(".0.1"))).otherwise(lit(""))).as("text"))
      d.select(col("doc_id"),
          TextFunctions.emailCount(col("text")).as("n_emails"),
          TextFunctions.ipCount(col("text")).as("n_ips"),
          md5(TextFunctions.scrubPii(col("text"))).as("clean_hash"))
        .withColumn("pii_free",
          col("n_emails") === 0 && col("n_ips") === 0)
        .orderBy(col("doc_id"))
    }),

    // t8: within-doc repetition report (Gopher repetition rules).
    // Thresholds tuned on the driver corpus so every rule
    // discriminates (240/188/33 individual violations, 102/500 kept).
    "t8_repetition" -> ((s, dir) =>
      TextFunctions.repetitionReport(docs(s, dir), col("doc_id"), col("text"))
        .orderBy(col("doc_id"))),

    // p6: mixture resampling toward target language weights
    // (en:de:fr:es = 4:3:2:1) — the binding language keeps ~everything
    // and the rest downsample by deterministic content-hash threshold.
    // Pure integer arithmetic end-to-end (no FP rate), so the keep set
    // is bit-exact on any engine; langs outside the target mixture
    // (zh here) drop via the inner weight join. All stats stay
    // distributed: counts groupBy → 4-row broadcast, no collect.
    "p6_mixture_sample" -> ((s, dir) =>
      mixtureSample(s, docs(s, dir))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // s3: int8-quantized brute-force top-k — integer dot products are
    // exact on every engine, so unlike s1/s2 the SCORES themselves
    // oracle-check bit-for-bit, not just the ranking.
    "s3_quantized_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.quantizedTopK(q, e,
        Similarity.maxAbsScales(e, col("embedding")), k = 5)
    }),

    // p12: hard-negative mining for contrastive training — for each
    // query doc, the most cosine-similar corpus members from a
    // DIFFERENT source (same-source pairs are trivial positives).
    // The source restriction rides INSIDE the broadcast join, so
    // ineligible pairs never reach the similarity math.
    "p12_hard_negatives" -> ((s, dir) => {
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      val e = emb(s, dir)
        .join(src, col("vec_id") === col("doc_id")).drop("doc_id")
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("source").as("qsource"))
      Similarity.bruteForceTopK(q, e, k = 5,
        pairFilter = col("qsource") =!= col("source"))
    }),

    // s8: BM25 lexical retrieval — the term-frequency half of the
    // retrieval stack. Served from the memoized persisted index (the
    // deployment steady state); the oracle recomputes the full
    // postings/idf/score pipeline from the documents table in SQL.
    "s8_bm25_topk" -> ((s, dir) =>
      Bm25.searchAt(s, bm25IndexPath(s, dir), bm25Queries(s, dir),
        topK = 5)),

    // s9: hybrid retrieval — reciprocal-rank fusion (k=60) of the
    // BM25 top-50 and the cosine top-50 over the SAME query ids
    // (documents and embeddings are row-aligned). Each branch is an
    // independently oracle-checked operator; the fusion is a
    // full-outer join on rank positions, so scores are exact
    // rationals and the hash check is tight.
    "s9_hybrid_rrf" -> ((s, dir) => {
      val e = emb(s, dir)
      val qv = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val lex = Bm25
        .searchAt(s, bm25IndexPath(s, dir), bm25Queries(s, dir), topK = 50)
        .select(col("qid"), col("doc_id"), col("rank").as("lrank"))
      val sem = Similarity
        .bruteForceTopK(qv, e, k = 50, excludeSelf = false)
        .select(col("qid"), col("vec_id").as("doc_id"),
          col("rank").as("srank"))
      lex.join(sem, Seq("qid", "doc_id"), "full_outer")
        .select(col("qid"), col("doc_id"),
          round(
            coalesce(lit(1.0) / (lit(60) + col("lrank")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("srank")), lit(0.0)),
            8).as("rrf"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("qid"))
            .orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
        .where(col("rank") <= 5)
        .orderBy(col("qid"), col("rank"))
    }),

    // p16: temperature-T=2 language resampling (mT5 §3.1) — the
    // mixture policy between p6's fixed integer ratios and natural
    // frequency: expected kept share ∝ sqrt(p_lang), low-resource
    // languages upweighted. sqrt and division are IEEE
    // correctly-rounded (unlike pow, ~1 ulp), so the per-language
    // floor(1e6·rate) thresholds — hence the hash-draw keep set — are
    // bit-exact across engines; the operator special-cases T=2 onto
    // sqrt for exactly this reason.
    "p16_temperature_mix" -> ((s, dir) =>
      Mixture.temperatureSample(docs(s, dir), col("lang"),
          graft.functions.PortableHash.phash(col("text"), 31))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // p17: leakage-safe split assignment — d7's near-dup clusters
    // pinned to ONE split by hashing the cluster ROOT (min-label),
    // not the member doc: a train/test boundary can never cut through
    // a duplicate cluster (the contamination p4 detects after the
    // fact, prevented structurally here). Unclustered docs root at
    // themselves; 80/10/10 over the portable root hash. Composes the
    // proven d7 components + p2 split mechanics unchanged.
    "p17_leakage_safe_split" -> ((s, dir) => {
      val d = docs(s, dir)
      val clusters = Dedup.connectedComponents(
          verifiedPairs(d).select(col("id_a"), col("id_b")))
        .select(col("id").as("doc_id"), col("label").as("group_id"))
      val rootHash = graft.functions.PortableHash.phash(
        col("group_id").cast("string"), 13)
      d.select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("group_id"), col("doc_id")).as("group_id"))
        .withColumn("split",
          when(rootHash % 100 < 80, "train")
            .when(rootHash % 100 < 90, "val")
            .otherwise("test"))
        .orderBy(col("doc_id"))
    }),

    // s14: kNN JOIN — the query side is the WHOLE embeddings table
    // ([[Ivf.knnJoinAt]]: "for every vector, its 3 nearest stored
    // neighbors" — the new-crawl-vs-base-corpus campaign). The serve
    // shape inverts: probe rows project on the big side, the cid
    // match is a plain shuffle equi-join (never a broadcast of a
    // corpus-sized probe table), AQE de-skews hot clusters.
    "s14_knn_join" -> ((s, dir) => {
      val q = emb(s, dir)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ivf.knnJoinAt(s, mainIndexPath(s, dir), q, topK = 3, nProbe = 2)
    }),

    // s13: radius search on the COMPRESSED tier ([[IvfPq
    // .searchRadiusAt]] — s12's range_search over 8–16-byte codes:
    // the τ-cut applies to the ADC inner-product estimate, the coarse
    // sweep whose survivors an exact re-rank confirms). Same probed
    // dump as s6; no ranking window — the cut fuses into the ADC
    // projection.
    "s13_radius_adc" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      IvfPq.searchRadiusAt(s, ivfPqIndexPath(s, dir), q,
        minScore = 0.22, nProbe = 4)
    }),

    // s10: MMR-diversified retrieval — greedy λ=0.5 maximal marginal
    // relevance over the s1 cosine top-10, selecting 5: retrieved
    // training-context batches stay diverse instead of collapsing
    // onto near-dups (the retrieval-side complement of d5/s7). The
    // oracle replays the greedy selection as a DuckDB recursive CTE
    // over the identical rounded similarity tables — selection order,
    // ties and marginal scores check bit-for-bit.
    "s10_mmr_rerank" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cands = Similarity.bruteForceTopK(q, e, k = 10)
        .select(col("qid"), col("vec_id"), col("sim"))
      val cv = cands.select(col("qid"), col("vec_id"))
        .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .withColumn("_n", Similarity.norm(col("embedding")))
      val ps = cv.as("a").join(cv.as("b"),
          col("a.qid") === col("b.qid") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.qid").as("qid"), col("a.vec_id").as("id_a"),
          col("b.vec_id").as("id_b"),
          round(Similarity.cosineWithNorms(col("a.embedding"),
            col("b.embedding"), col("a._n"), col("b._n")), 5).as("psim"))
      Mmr.rerank(cands, ps, selectK = 5, lambda = 0.5)
    }),

    // p20: in-engine trained logistic-regression probe over the
    // embedding column ([[LinearProbe]] — t13's Naive Bayes in
    // embedding space: domain/quality gating by linear probe, no ML
    // runtime). Each GD step is ONE distributed aggregation with
    // fixed-point gradient sums (partition-order-invariant training);
    // scoring is a codegen'd dot against the literal learned weights
    // — multiply/add only, so the oracle reproduces scores BIT-EXACT
    // from the dumped weight vector (stronger than the ln parity
    // floor: no transcendentals anywhere in the scored path).
    "p20_linear_probe" -> ((s, dir) => {
      val p = probeWeightsPath(s, dir)
      val w = s.read.parquet(p).orderBy(col("i"))
        .collect().map(_.getDouble(1))
      graft.operators.LinearProbe.score(emb(s, dir), col("vec_id"),
          col("embedding"), pmod(col("label"), lit(2)), w)
        .select(col("id").as("vec_id"), col("target"), col("score_fp"),
          col("pred"), col("correct"))
        .orderBy(col("vec_id"))
    }),

    // t13: in-engine trained Naive Bayes language-ID — the
    // fastText-class "train a cheap model ON the corpus, score the
    // corpus" loop with no ML runtime (training is counting, scoring
    // is a join). Add-one smoothed multinomial over words, fixed-point
    // log-likelihoods (the t9/t11 discipline) so every per-(doc,lang)
    // posterior is an exact BIGINT sum — the full train+classify
    // composition hash-checks against a from-scratch SQL re-training.
    // Complements t2's heuristic marker-list lang-ID with a LEARNED
    // classifier whose accuracy is itself a gate-visible output.
    "t13_nb_langid" -> ((s, dir) =>
      NaiveBayes.selfClassify(docs(s, dir), col("doc_id"), col("lang"),
          col("text"))
        .select(col("id").as("doc_id"), col("label").as("lang"),
          col("pred_label").as("pred_lang"), col("correct"),
          col("score_fp"))
        .orderBy(col("doc_id"))),

    // t14: corpus drift monitor ([[Drift.unigramKl]] — per-source KL
    // divergence of the unigram distribution against the whole-corpus
    // reference, the admit-or-investigate check for a new ingest
    // slice). No smoothing needed by construction (corpus ⊇ slice);
    // per-token terms go fixed-point before the BIGINT sum. Scale
    // shape: one shuffle to (slice,tok) counts which feed BOTH the
    // corpus re-aggregation and the scoring join; output cardinality
    // is |slices|.
    "t14_unigram_drift" -> ((s, dir) =>
      Drift.unigramKl(docs(s, dir), col("source"), col("text"))
        .select(col("slice").as("source"), col("n_tokens"), col("kl_nats"))
        .orderBy(col("source"))),

    // t15: full BPE tokenizer train+encode ([[Bpe.train]] — t12 is
    // the count step; this is the whole Sennrich-et-al loop run
    // IN-ENGINE, then the corpus re-encoded under the learned
    // subword vocabulary). Every count runs over the distinct-word
    // segmentation (never raw occurrences), each argmax collects one
    // row (bounded metadata), the merge application is a per-row
    // array fold, and loop state localCheckpoints per round. The
    // gate encodes via a word-level join against the trained vocab
    // segmentation; the oracle INDEPENDENTLY replays the dumped
    // merge table over the corpus vocabulary (recursive CTE, one
    // fold per rank) — the training argmax itself is spec-pinned on
    // a closed-form corpus (BpeSpec).
    "t15_bpe_encode" -> ((s, dir) => {
      val p = bpeModelPath(s, dir)
      val vocab = s.read.parquet(s"$p/vocab")
        .select(col("word"), size(col("toks")).as("ns"))
      // empty words (doubled/leading/trailing spaces) are not words:
      // excluded here AND in the oracle's tokc/w CTEs, and absent
      // from the trained vocab (train's length >= 1 filter) — all
      // three layers must agree or the word join silently drops rows
      val pd = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .where(length(col("word")) >= 1)
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      pd.join(vocab, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * col("ns")).as("n_bpe_tokens"))
        .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
          round(col("n_bpe_tokens").cast("double") / col("n_words"), 6)
            .as("tokens_per_word"))
        .orderBy(col("doc_id"))
    }),

    // p19: token-budget corpus assembly — the "give me exactly B
    // tokens per domain, best first" cut a pretraining mix is
    // actually built from (p9 caps DOCUMENT counts; budgets are
    // TOKEN counts): rank each source's docs by quality, take the
    // greedy prefix whose cumulative token count fits the budget.
    // Scale shape: one shuffle partitions by source; the cumulative
    // sum is a running-frame window inside each source partition.
    // A mega-source skews its partition — the p5b remedy (per-chunk
    // partial sums + broadcast prefix offsets) applies verbatim when
    // a single domain outgrows an executor; at gate scale the plain
    // window is the honest plan.
    "p19_token_budget" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 600L
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select(col("source"), col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .where(col("cum_tokens") <= budget)
        .orderBy(col("source"), col("cum_tokens"))
    }),

    // t17: vocabulary-growth curve (the Heaps-law corpus-health
    // readout: does vocabulary keep growing with new docs, or has
    // the crawl gone stale/duplicative?). All-integer derivation —
    // each token's FIRST-occurrence doc (one map-side-combinable
    // min), docs and first-occurrences bucketed into id-range
    // deciles, cumulative sums over the 10-row decile spine (a
    // bounded global window, the Rank.scala class) — so the oracle
    // is exact with no parity floor. Scale shape: one shuffle to
    // per-token minima; everything after is ≤ 10 rows.
    "t17_vocab_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val mx = d.agg((max(col("doc_id")) + 1).as("_mx"))
      val docDec = d.crossJoin(broadcast(mx))
        .select((expr("(doc_id * 10) div _mx") + 1).as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("docs_new"))
      val vocDec = d
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) >= 1)
        .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
        .crossJoin(broadcast(mx))
        .select((expr("(first_doc * 10) div _mx") + 1).as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("vocab_new"))
      val spine = s.range(1, 11).select(col("id").as("decile"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine
        .join(docDec, Seq("decile"), "left")
        .join(vocDec, Seq("decile"), "left")
        .select(col("decile"),
          coalesce(col("docs_new"), lit(0L)).as("docs_new"),
          coalesce(col("vocab_new"), lit(0L)).as("vocab_new"))
        .withColumn("docs_seen", sum(col("docs_new")).over(w))
        .withColumn("vocab_size", sum(col("vocab_new")).over(w))
        .select(col("decile"), col("docs_seen"), col("vocab_new"),
          col("vocab_size"))
        .orderBy(col("decile"))
    }),

    // p18: dataset-card audit report — the per-source corpus summary
    // a curation run publishes alongside the data (docs, tokens,
    // chars, language spread, dominant language, exact-dup ratio).
    // Scale shape: two map-side-combinable aggregations over one scan
    // class (the per-source rollup and the per-(source,lang) census
    // for the mode), joined at |sources| cardinality via broadcast;
    // the dup ratio rides count(DISTINCT md5) inside the same rollup
    // (Spark plans distinct-agg as an expand, still one pass).
    "p18_dataset_card" -> ((s, dir) => {
      val d = docs(s, dir)
      val base = d.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(md5(col("text"))).as("n_uniq"))
      val lc = d.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("c").desc, col("lang"))
      val top = lc.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(col("source"), col("lang").as("top_lang"))
      base.join(broadcast(top), Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("n_docs"), 6)
            .as("avg_doc_tokens"),
          col("n_chars"), col("n_langs"), col("top_lang"),
          round(lit(1.0d) - col("n_uniq").cast("double") / col("n_docs"), 6)
            .as("exact_dup_ratio"))
        .orderBy(col("source"))
    }),

    // t18: PMI collocations — pointwise mutual information over
    // adjacent word bigrams (Church & Hanks 1990), the standard
    // phrase-mining readout: pmi = ln(p(w1,w2)/(p(w1)·p(w2))),
    // fixed-point (floor·1e6, the t9/t11/p13 ln discipline) so both
    // engines rank identically. Scale shape: bigrams come from ONE
    // posexplode of the token array (no self-join on position), pair
    // counts pre-aggregate map-side before the two unigram joins
    // (both shuffle equi-joins on a token key — vocab-sized sides,
    // never forced broadcast), corpus totals ride a 1-row broadcast,
    // and the min-support cut (n_pair ≥ 5) shrinks the pair table
    // BEFORE any join. Top-32 is a TakeOrdered, not a global window.
    "t18_pmi_collocations" -> ((s, dir) => {
      val d = docs(s, dir).select(split(col("text"), " ").as("t"))
      val tot = d.agg(sum(size(col("t"))).as("n_uni"),
        sum(size(col("t")) - 1).as("n_big"))
      val uni = d.select(explode(col("t")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
      val bc = d
        .select(posexplode(col("t")).as(Seq("i", "w1")), col("t"))
        .select(col("w1"), try_element_at(col("t"), col("i") + 2).as("w2"))
        .where(col("w2").isNotNull)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
        .where(col("n_pair") >= 5)
      bc.join(uni.select(col("tok").as("w1"), col("cu").as("cu1")), Seq("w1"))
        .join(uni.select(col("tok").as("w2"), col("cu").as("cu2")), Seq("w2"))
        .crossJoin(broadcast(tot))
        // multiplication stays left-assoc double on BOTH engines so
        // the ln argument is bit-identical cross-engine
        .select(col("w1"), col("w2"), col("n_pair"),
          floor(log(col("n_pair").cast("double") * col("n_uni") * col("n_uni") /
            (col("n_big").cast("double") * col("cu1") * col("cu2"))) * 1000000.0d)
            .as("pmi_fx"))
        .orderBy(col("pmi_fx").desc, col("w1"), col("w2"))
        .limit(32)
    }),

    // t19: Zipf rank–frequency fit — least-squares slope of
    // ln(freq) on ln(rank) over the top-1000 tokens plus r², the
    // corpus-health twin of t17's Heaps curve (natural corpora fit
    // slope ≈ −1; synthetic/templated corpora flatten). All five
    // regression sums run in EXACT integer arithmetic over the
    // fixed-point logs (decimal(38,0) here ≡ HUGEINT in the oracle —
    // the products reach ~1e20, past BIGINT), and only the final
    // slope/r² divisions drop to double, so cross-engine parity holds
    // to the shared ln floor. Scale shape: one token-frequency
    // aggregation, the top-1000 cut via Rank.globalRowNumber (t10's
    // distributed exact rank — no single-task window), then a 1-row
    // aggregate.
    "t19_zipf_slope" -> ((s, dir) => {
      val freq = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      val top = graft.operators.Rank
        .globalRowNumber(freq, col("freq"), col("tok"), descending = true)
        .where(col("rank") <= 1000)
      val pts = top.select(
        floor(log(col("rank").cast("double")) * 1000000.0d)
          .cast("decimal(38,0)").as("x"),
        floor(log(col("freq").cast("double")) * 1000000.0d)
          .cast("decimal(38,0)").as("y"))
      val a = pts.agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      a.select(
        col("n").cast("long").as("n_ranks"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
          .as("r2"))
    }),

    // s15: ANN recall@k evaluation — the index-quality readout every
    // production retrieval deployment publishes: per query, how many
    // of the EXACT cosine top-5 (s1's brute-force kernel) the served
    // IVF index (s2p's persisted path, nProbe=4) actually returned.
    // Composition of two independently-proven kernels; the oracle
    // recomputes both sides (full brute force from `embeddings`, IVF
    // from the dumped assignment) and joins them the same way. Scale
    // shape: recall evaluation runs over a SAMPLED probe set by
    // construction (here vec_id < 10) — the exact side is only ever
    // brute-forced for the sample, never the corpus, so the eval cost
    // is |sample|·|corpus| ADC-free dot products regardless of index
    // size; the hit-join is |sample|·k rows.
    "s15_recall_eval" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val exact = Similarity.bruteForceTopK(q, e, k = 5)
        .select(col("qid"), col("vec_id"))
      val approx = Ivf.searchAt(s, mainIndexPath(s, dir), q,
          topK = 5, nProbe = 4)
        .select(col("qid"), col("vec_id"), lit(1L).as("_hit"))
      exact.join(approx, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_exact"), count(col("_hit")).as("n_hit"))
        .select(col("qid"), col("n_exact"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_exact"), 5).as("recall"))
        .orderBy(col("qid"))
    }),

    // t20: token burstiness — the Fisher dispersion (variance-to-mean
    // ratio) of each token's per-document count, over tokens in ≥10
    // docs: VMR ≈ 1 is Poisson scatter (function words), VMR ≫ 1 is
    // topical clumping (content words), and a corpus whose whole
    // vocabulary sits at VMR ≈ 1 is template noise (the t17/t19
    // corpus-health family). Zeros are counted: over all D docs,
    // VMR = (D·Σc² − (Σc)²)/(D·Σc) — numerator and denominator stay
    // EXACT integers (decimal(38,0) ≡ HUGEINT; Σc² reaches ~1e18 at
    // petabyte scale) and only the final division drops to double, so
    // there is no ln in this one at all — parity is exact, not
    // ulp-bounded. Scale shape: one (doc,tok) pre-aggregation (t9's
    // two-exchange rationale), one per-token rollup, D rides a 1-row
    // broadcast; top-64 is a TakeOrdered.
    "t20_burstiness" -> ((s, dir) => {
      val d = docs(s, dir)
      val nd = d.agg(count(lit(1)).cast("decimal(38,0)").as("n_docs"))
      val pd = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      val per = pd.groupBy(col("tok")).agg(
          count(lit(1)).as("df"),
          sum(col("c")).as("tf"),
          sum(col("c").cast("decimal(38,0)") * col("c")).as("q"))
        .where(col("df") >= 10)
      per.crossJoin(broadcast(nd))
        .select(col("tok"), col("df"), col("tf"),
          round((col("n_docs") * col("q") -
              col("tf").cast("decimal(38,0)") * col("tf")).cast("double") /
            (col("n_docs") * col("tf").cast("decimal(38,0)")).cast("double"),
            6).as("burstiness"))
        .orderBy(col("burstiness").desc, col("tok"))
        .limit(64)
    }),

    // s16: the nProbe→recall TUNING CURVE — s15 swept across probe
    // budgets {1,2,4,16}: micro-averaged recall@5 of the persisted
    // IVF index vs the exact top-5, per budget. nProbe=16 probes all
    // k=16 clusters, so the curve provably ends at recall 1.0 (spec-
    // pinned along with monotonicity) — this is the query an operator
    // runs to CHOOSE nProbe for a latency target. Scale shape: the
    // exact side is brute-forced once over the probe SAMPLE; the
    // budgets share ONE scoring pass ([[Ivf.searchSweepAt]] — every
    // (query, candidate) cosine computed once against the max-budget
    // probe set, smaller budgets are a probe_rank filter + re-rank);
    // the recall join ships |sample|·k id pairs per budget.
    "s16_nprobe_curve" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val exact = Similarity.bruteForceTopK(q, e, k = 5)
        .select(col("qid"), col("vec_id"))
      val served = Ivf.searchSweepAt(s, mainIndexPath(s, dir), q,
          topK = 5, budgets = Seq(1, 2, 4, 16))
        .select(col("n_probe"), col("qid"), col("vec_id"))
      val hits = exact.join(served, Seq("qid", "vec_id"))
        .groupBy(col("n_probe")).agg(count(lit(1)).as("n_hit"))
      val tot = exact.agg(count(lit(1)).as("_nex"),
        countDistinct(col("qid")).as("_nq"))
      val spine = s.range(1, 17)
        .where(col("id").isin(1L, 2L, 4L, 16L)).select(col("id").as("n_probe"))
      spine.join(hits, Seq("n_probe"), "left")
        .crossJoin(broadcast(tot))
        .select(col("n_probe"), col("_nq").as("n_queries"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("_nex"),
            5).as("mean_recall"))
        .orderBy(col("n_probe"))
    }),

    // s17: per-cluster centroid drift of the append-lifecycle index
    // ([[Ivf.centroidDrift]] — the REBUILD TRIGGER): s2a's index was
    // trained on the even half and grew by appending the odd half
    // with the frozen quantizer, which is exactly the regime where
    // member means walk away from stored centroids and recall decays
    // silently. drift = 1 − cos(Σ members, centroid), all integer /
    // decimal(38,0) arithmetic until the final rounded quotient; the
    // trigger is RELATIVE (drift > 1.25 × the cluster-median drift —
    // absolute drift shrinks as clusters fill, so a fixed cut is
    // scale-dependent; "worse than typical" is not). Completes the
    // index lifecycle: build → persist → append → compact →
    // tombstone → THIS (when to retrain) → rebuild.
    "s17_centroid_drift" -> ((s, dir) =>
      graft.operators.Ivf.centroidDrift(s, appendIndexPath(s, dir),
          medianMultiple = 1.25)
        .orderBy(col("cid"))),

    // s18: ACT on s17's trigger (round-14, VERDICT r13 ask #5 — the
    // missing repair step of the index lifecycle): re-train only the
    // flagged clusters' centroids (exact fixed-point member means),
    // reassign only their members across the updated codebook, and
    // persist the repaired layout — never a full rebuild. Runs on a
    // PRIVATE copy of the same drift-planted build+append index the
    // s17 oracle dump describes, so the oracle replays the entire
    // repair (trigger → repaired codebook → argmax reassignment →
    // membership checksum) from the pre-repair dump. Recall
    // restoration is spec-pinned (ReindexSpec) — the gate row pins
    // the reassignment itself. Scale shape: repair cost follows the
    // FLAGGED membership plus one (id, cid) audit scan; the audit is
    // k rows of index metadata, persisted beside the index.
    "s18_reindex_flagged" -> ((s, dir) => {
      val path = persistedIndex(s, s"s18|$dir") { p =>
        val e = emb(s, dir)
        val index = Ivf.build(e.where(col("vec_id") % 2 === 0),
          col("vec_id"), col("embedding"), k = 16)
        Ivf.persist(index, p)
        index.assigned.unpersist(blocking = false)
        Ivf.appendPersisted(s, p, e.where(col("vec_id") % 2 === 1),
          col("vec_id"), col("embedding"))
        graft.operators.IndexMaintenance.reindexFlagged(s, p,
          medianMultiple = 1.25)
        ()
      }
      s.read.parquet(path.stripSuffix("/") + "__reindex_audit")
        .orderBy(col("cid"))
    }),

    // s19: FULL quantizer rebuild with serving continuity (round-15,
    // VERDICT r14 ask #1 — what s18's local repair measurably cannot
    // do: the fresh-build recall floor is quantizer capacity, so the
    // s17 flag ultimately schedules a retrain). Shadow-build a fresh
    // index beside the live one while appends keep landing (a
    // deterministic mid-build batch arrives through the coordination
    // seam), catch-up-replay those appends under the NEW quantizer,
    // then swap via the staged-rename discipline. The gate row is
    // the rebuild audit: per-cluster membership counts, id checksums
    // and the snapshot/replay split — the oracle re-derives ALL of
    // it from the dumped post-swap quantizer by re-assigning the
    // full corpus (original + re-crawled ids) with the same argmax
    // cosine, so any row misplaced by the build, the replay or the
    // swap flips a checksum. Recall restoration + crash states are
    // RebuildSpec-pinned.
    "s19_rebuild" -> ((s, dir) => {
      val path = rebuiltIndexPath(s, dir)
      s.read.parquet(path.stripSuffix("/") + "__rebuild_audit")
        .orderBy(col("cid"))
    }),

    // g1: PageRank centrality over the corpus kNN graph — the graph-
    // side quality signal crawl curation publishes (a harmonic-
    // centrality analog): vectors that many other vectors name among
    // their nearest neighbors concentrate rank; isolated or
    // peripheral ones settle at the damping base. The graph IS s14's
    // kNN join (IVF-pruned, never all-pairs), so edge construction
    // inherits the serve path's 100 TB shape; the 8 fixed-point
    // supersteps are [[PageRank.ranksPpm]] — one shuffle join + one
    // aggregation each, integer ppm mass end to end, which is what
    // lets the oracle replay every iteration bit-for-bit (unrolled
    // CTE chain over the same dumped index + probes).
    "g1_knn_pagerank" -> ((s, dir) =>
      graft.operators.PageRank.ranksPpm(
          emb(s, dir).select(col("vec_id").as("id")),
          knnEdges(s, dir), iterations = 8)
        .orderBy(col("id"))),

    // g2: label-propagation communities over the same kNN graph —
    // WHICH topic/near-dup island each vector belongs to (the
    // cluster-id a mixture/dedup policy keys on), where g1 says how
    // CENTRAL it is. Five synchronous votes, most-frequent-neighbor-
    // label with ties to the smallest label — fully deterministic,
    // so the oracle replays every round as an unrolled CTE chain
    // (count + row_number votes over the same undirected edge set).
    // [[LabelProp.communities]] holds the scale shape (one shuffle
    // join + per-node top-1 per round, checkpointed state).
    "g2_label_propagation" -> ((s, dir) =>
      graft.operators.LabelProp.communities(
          emb(s, dir).select(col("vec_id").as("id")),
          knnEdges(s, dir), iterations = 5)
        .orderBy(col("id"))),

    // g3: exact per-node triangle counts over the kNN graph — the
    // local-density signal (a vector in many triangles sits in a
    // tightly knit near-dup/topic core; triangle-free nodes are
    // periphery). Canonical ordered-wedge closure: each triangle
    // i<j<k found once by two equi-joins ([[LabelProp.triangles]] —
    // wedge set |V|·k², never |V|²), credited to all three corners.
    "g3_triangle_count" -> ((s, dir) =>
      graft.operators.LabelProp.triangles(
          emb(s, dir).select(col("vec_id").as("id")),
          knnEdges(s, dir))
        .orderBy(col("id"))),

    // p23: dataset SNAPSHOT DIFF — the versioning readout published
    // between two corpus releases: per change class
    // (added/removed/changed/unchanged), document count and net token
    // delta. Snapshot B derives deterministically from the corpus
    // (p4's augmented-corpus convention): every 7th doc deleted,
    // every surviving 5th edited (one marker token appended), every
    // 11th re-crawled past max(doc_id). Scale shape: ONE full-outer
    // sort-merge join on doc_id — the comparison ships (id, 16-byte
    // md5, token count), never text; with both releases bucketed on
    // doc_id (Sinks.writeBucketed) the diff plans with ZERO
    // exchanges.
    "p23_snapshot_diff" -> ((s, dir) => {
      val a = docs(s, dir).select(col("doc_id"), col("text"))
      val mx = a.agg((max(col("doc_id")) + 1).as("_mx"))
      val b = a.where(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(a.where(col("doc_id") % 11 === 0)
          .crossJoin(broadcast(mx))
          .select((col("doc_id") + col("_mx")).as("doc_id"), col("text")))
      val fa = a.select(col("doc_id"), md5(col("text")).as("ha"),
        size(split(col("text"), " ")).as("ta"))
      val fb = b.select(col("doc_id"), md5(col("text")).as("hb"),
        size(split(col("text"), " ")).as("tb"))
      fa.join(fb, Seq("doc_id"), "full_outer")
        .select(
          when(col("ha").isNull, "added")
            .when(col("hb").isNull, "removed")
            .when(col("ha") =!= col("hb"), "changed")
            .otherwise("unchanged").as("status"),
          coalesce(col("ta"), lit(0)).as("ta"),
          coalesce(col("tb"), lit(0)).as("tb"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tb") - col("ta")).as("token_delta"))
        .orderBy(col("status"))
    }),

    // p24: fair-share token-budget allocation across sources by
    // water-filling — the classic "give every source an equal share
    // θ, capped at what it actually has" solve of
    // Σ min(avail_s, θ) = B (here B = 60% of corpus tokens, so the
    // cap binds). The equal-share counterpart to p16's temperature
    // mix: temperature sampling reweights proportionally, water-
    // filling EQUALIZES — small sources are taken whole, the
    // remaining budget splits evenly over the big ones (the data-
    // constrained recipe when upsampling caps are per-source). The
    // closed form needs no iteration: sort sources by avail asc;
    // source k is fully taken iff avail_k ≤ (B − cum_{<k})/(n−k+1)
    // (monotone in k), and θ = (B − Σ taken)/(n − #taken). All
    // inputs to the divisions are exact integers < 2^53, so the IEEE
    // quotients — and thus every comparison — are identical across
    // engines. Scale shape: per-source totals are one map-side-
    // combinable agg; the solve runs on the |sources|-row aggregate
    // (a single-partition window over metadata-sized input).
    "p24_budget_waterfill" -> ((s, dir) =>
      graft.operators.WaterFill.allocate(
          docs(s, dir).groupBy(col("source"))
            .agg(sum(size(split(col("text"), " ")).cast("long"))
              .as("avail_tokens")),
          col("source"), col("avail_tokens"), budgetFrac = 0.6d)
        .select(col("key").as("source"),
          col("avail").as("avail_tokens"), col("taken"),
          col("alloc_tokens"), col("take_frac"))
        .orderBy(col("source"))),

    // t22: quality-score CALIBRATION — does t1's quality score
    // actually separate the corpus? Docs bucket by score decile;
    // each bucket reports size, mean token length and the exact-dup
    // rate (1 − distinct-hash share): a score that tracks nothing
    // (flat mean_tokens, flat dup_rate across buckets) is a useless
    // filter knob, and this is the query that shows it BEFORE p1/p11
    // gate a petabyte run on that score. One map-side-combinable
    // aggregation (the distinct-agg plans as an expand, still one
    // pass); ≤10 output rows.
    // t21: lexical diversity — per-doc type-token ratio and Guiraud's
    // root TTR (types/√tokens, the length-corrected variant; √ is
    // IEEE-correctly-rounded in BOTH engines, so unlike an ln-based
    // index — Herdan's C — the score is bit-exact cross-engine, the
    // t19/t20 fixed-point lesson applied by PICKING the right
    // statistic). Low diversity flags boilerplate/keyword-stuffed
    // docs that length or stopword gates miss; it complements t22's
    // calibration as a per-doc quality feature. Scale shape: a PURE
    // PROJECTION — types and tokens both come from one
    // size(array_distinct(split)) expression chain, zero shuffles,
    // zero joins; the whole corpus streams through codegen once.
    // (Round 8: fills the formerly-vacant t21 slot in the text-ops
    // numbering.)
    "t21_lexical_diversity" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("n_types"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") / col("n_tokens"), 6)
            .as("ttr"),
          round(col("n_types").cast("double") /
            sqrt(col("n_tokens").cast("double")), 6).as("root_ttr"))
        .orderBy(col("doc_id"))),

    // t25: pairwise language affinity — for every language pair, the
    // cosine between their unigram COUNT vectors and the Jaccard of
    // their vocabularies: the distributional complement to t23's
    // classifier confusion (t23 asks "does the model mix them up",
    // this asks "how much do they actually share"), and the readout
    // behind cross-lingual dedup/contamination expectations. By
    // construction transcendental-free (unlike a KL form): the three
    // reductions are integer Σ ca·cb, Σ ca², Σ cb² in decimal(38,0),
    // so cross-engine exactness needs no fixed-point ln machinery.
    // Scale shape: one shuffle to (lang, tok) counts (cardinality
    // |langs|·|vocab|), a tok-keyed self-join bounded by the same,
    // per-lang norms/vocab sizes ride a |langs|-row broadcast. At
    // unbounded web vocabulary, swap tok for a hashed bucket (p13's
    // technique) for fixed cardinality.
    "t25_lang_affinity" -> ((s, dir) => {
      val lc = Dedup.share(docs(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("cnt")))
      val norms = lc.groupBy(col("lang"))
        .agg(sum((col("cnt").cast("decimal(38,0)") * col("cnt")))
          .as("nsq"), count(lit(1)).as("vsz"))
      val pairs = lc.select(col("lang").as("lang_a"), col("tok"),
          col("cnt").as("ca"))
        .join(lc.select(col("lang").as("lang_b"), col("tok"),
          col("cnt").as("cb")), Seq("tok"))
        .where(col("lang_a") < col("lang_b"))
        .groupBy(col("lang_a"), col("lang_b"))
        .agg(count(lit(1)).as("shared_toks"),
          sum((col("ca").cast("decimal(38,0)") * col("cb"))).as("dot"))
      pairs
        .join(broadcast(norms.select(col("lang").as("lang_a"),
          col("nsq").as("na"), col("vsz").as("va"))), Seq("lang_a"))
        .join(broadcast(norms.select(col("lang").as("lang_b"),
          col("nsq").as("nb"), col("vsz").as("vb"))), Seq("lang_b"))
        .select(col("lang_a"), col("lang_b"), col("shared_toks"),
          round(col("shared_toks").cast("double") /
            (col("va") + col("vb") - col("shared_toks")), 6)
            .as("vocab_jaccard"),
          round(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) *
              sqrt(col("nb").cast("double"))), 6).as("cosine"))
        .orderBy(col("lang_a"), col("lang_b"))
    }),

    // t24: per-doc n-gram novelty — the fraction of a document's
    // DISTINCT 3-grams that occur in no other document (corpus
    // df = 1). The memorization-risk / templatedness readout: a
    // near-zero score means the doc is assembled from phrases the
    // corpus repeats everywhere (boilerplate, spins), a high score
    // means unique content worth keeping. Complements the d-series
    // (which FINDS duplicate pairs) with a per-doc scalar that needs
    // no pairing. Scale shape: grams ship as 60-bit portable hashes
    // (never strings), (doc, gram) dedups in one shuffle, df is a
    // map-side-combinable re-count, and the df table joins back by
    // hash — nothing quadratic, same kernel family as t4/t16. The
    // trailing left join keeps gram-less docs (< 3 tokens) in the
    // output with novelty NULL.
    "t24_ngram_novelty" -> ((s, dir) => {
      val d = docs(s, dir)
      val sh2 = Dedup.share(
        Dedup.shingleRows(d, col("doc_id"), col("text"), n = 3)
          .select(col("id").as("doc_id"),
            graft.functions.PortableHash.phash(col("sh"), 0).as("h"))
          .distinct())
      val dfc = sh2.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val per = sh2.join(dfc, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, lit(1L)).otherwise(lit(0L)))
            .as("n_novel"))
      d.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          round(col("n_novel").cast("double") / col("n_grams"), 6)
            .as("novelty"))
        .orderBy(col("doc_id"))
    }),

    "t22_quality_calibration" -> ((s, dir) => {
      val d = docs(s, dir).select(
        least(floor(TextFunctions.qualityScore(col("text")) * 10), lit(9.0))
          .cast("long").as("q_bucket"),
        TextFunctions.tokenCount(col("text")).cast("long").as("nt"),
        md5(col("text")).as("h"))
      d.groupBy(col("q_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("nt")).cast("double") / count(lit(1)), 6)
            .as("mean_tokens"),
          round(lit(1.0d) -
            countDistinct(col("h")).cast("double") / count(lit(1)), 6)
            .as("dup_rate"))
        .orderBy(col("q_bucket"))
    }),

    // d16: dedup THRESHOLD sweep — s16's tuning-curve idea for the
    // Jaccard knob: per candidate threshold 0.2..0.9 (×10 as
    // integers), how many verified pairs survive and how many
    // distinct docs they touch — the "what would this threshold
    // delete" readout an operator reads before committing a corpus
    // pass. Built on the SAME LSH-verified kernel as d3v/p1/d7 (one
    // shared shingle scan; the sweep floor is the verify threshold
    // 0.2, so every swept cut is a filter over already-verified
    // pairs — an 8-way explode of 24-byte pair rows, no rescan).
    // d17: snapshot near-dup CLASSIFICATION — p23 diffs releases by
    // exact content hash; this splits its 'changed' class by 3-gram
    // Jaccard between the old and new text into 'edited' (small
    // delta, j ≥ 0.3 — version bumps, typo fixes, appended footers)
    // vs 'rewritten' (the doc was effectively replaced) — the
    // release-hygiene readout that decides whether a changed doc
    // keeps its dedup-cluster membership and split assignment (p17
    // pins splits to cluster roots; a REWRITTEN doc needs re-rooting,
    // an EDITED one does not). The v2 snapshot extends p23's
    // construction with a rewrite class (word-order reversal — near-
    // zero 3-gram overlap by construction) so both classes exist.
    // Scale shape: the hash-diff prefilter bounds everything to the
    // CHANGED set (never the corpus); grams hash to 64-bit longs
    // before any join; both gram sides come off one shared changed
    // frame (the round-8 share rule: joins intervene).
    "d17_snapshot_neardup_diff" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      val a = docs(s, dir).select(col("doc_id"), col("text"))
      val b = a.where(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .when(col("doc_id") % 13 === 1,
              concat_ws(" ", reverse(split(col("text"), " "))))
            .otherwise(col("text")).as("text"))
      val changed = Dedup.share(
        a.select(col("doc_id"), col("text").as("ta"))
          .join(b.select(col("doc_id"), col("text").as("tb")),
            Seq("doc_id"))
          .where(md5(col("ta")) =!= md5(col("tb"))))
      def grams(t: org.apache.spark.sql.Column) =
        Dedup.shingles(split(t, " "), 3)
      val ga = Dedup.share(changed.select(col("doc_id"),
        explode(grams(col("ta"))).as("g"))
        .select(col("doc_id"), phash(col("g"), 0).as("h")).distinct())
      val gb = Dedup.share(changed.select(col("doc_id"),
        explode(grams(col("tb"))).as("g"))
        .select(col("doc_id"), phash(col("g"), 0).as("h")).distinct())
      val na = ga.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
      val nb = gb.groupBy(col("doc_id")).agg(count(lit(1)).as("n_b"))
      val inter = ga.join(gb, Seq("doc_id", "h"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("common"))
      val j = col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common"))
      na.join(nb, Seq("doc_id"))
        .join(inter, Seq("doc_id"), "left")
        .withColumn("common", coalesce(col("common"), lit(0L)))
        .select(col("doc_id"), col("n_a"), col("n_b"), col("common"),
          round(j, 6).as("jaccard"),
          when(j >= 0.3, "edited").otherwise("rewritten").as("status"))
        .orderBy(col("doc_id"))
    }),

    "d16_threshold_sweep" -> ((s, dir) => {
      // share()d (round-15): the threshold-exploded frame feeds BOTH
      // the pair-count and the distinct-doc branches — unshared, each
      // re-executed the whole candidate+verify join tail
      val pairs = Dedup.share(verifiedPairs(docs(s, dir)))
      val e = pairs.select(col("id_a"), col("id_b"), col("jaccard"),
          explode(typedlit((2 to 9).map(_.toLong))).as("threshold_x10"))
        .where(col("jaccard") >=
          col("threshold_x10").cast("double") / 10.0d)
      val np = e.groupBy(col("threshold_x10"))
        .agg(count(lit(1)).as("n_pairs"))
      val nd = e.select(col("threshold_x10"),
          explode(array(col("id_a"), col("id_b"))).as("d"))
        .groupBy(col("threshold_x10"))
        .agg(countDistinct(col("d")).as("n_docs"))
      s.range(2, 10).select(col("id").as("threshold_x10"))
        .join(np, Seq("threshold_x10"), "left")
        .join(nd, Seq("threshold_x10"), "left")
        .select(col("threshold_x10"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"))
        .orderBy(col("threshold_x10"))
    }),

    // t23: language-ID CONFUSION MATRIX — t2's marker-based guesser
    // evaluated against the declared `lang` label: per (declared,
    // guessed) cell, count and row share. The third member of the
    // operator-eval family (s15/s16 for the ANN index, d15 for the
    // MinHash estimator, this for the classifier): a curation run
    // routes docs by t2's guess, and this is the query that says how
    // often that routing is wrong, per language. Two map-side
    // aggregations over one scan class; the |langs|-row totals
    // broadcast; ≤ |langs|·(|langs|+1) output rows.
    "t23_langid_confusion" -> ((s, dir) => {
      val g = docs(s, dir).select(col("lang"),
        TextFunctions.langGuess(col("text")).as("guess"))
      val cell = g.groupBy(col("lang"), col("guess"))
        .agg(count(lit(1)).as("n"))
      val tot = g.groupBy(col("lang")).agg(count(lit(1)).as("_t"))
      cell.join(broadcast(tot), Seq("lang"))
        .select(col("lang"), col("guess"), col("n"),
          round(col("n").cast("double") / col("_t"), 6).as("share"))
        .orderBy(col("lang"), col("guess"))
    }),

    // d15: MinHash ESTIMATOR-QUALITY profile — s15's eval idea aimed
    // at the dedup stack: for every d2 LSH candidate pair, the
    // 16-hash signature agreement (est = matches/16) against the
    // exact shingle Jaccard, aggregated per exact-Jaccard decile:
    // (bucket, n_pairs, mean_est, mean_abs_err). This is the query
    // that justifies numHashes/bands before a petabyte dedup run.
    // Everything pre-division is INTEGER: per-pair error goes
    // fixed-point via |est16·∪ − 16·∩|·1e6 div (16·∪) — integer
    // division, so the per-pair terms and their sums are
    // engine-exact; only the two final means divide in double. Scale
    // shape: one shared shingle scan feeds signatures, candidates
    // AND the exact-intersection join (the d3v convention — cost
    // Σ per-bucket pairs, never n²); 8-byte hashes shuffle, never
    // text.
    "d15_minhash_error" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      val sh = Dedup.share(Dedup.shingleRows(
        docs(s, dir), col("doc_id"), col("text"), n = 3))
      // round-15 shares: cands feeds the estimate AND exact-intersect
      // branches, sig both signature sides, shd three consumers (two
      // co legs + sizes) — unshared, each reference re-executed its
      // pipeline tail
      val cands = Dedup.share(Dedup.minhashCandidatesFromShingles(sh,
        numHashes = 16, bands = 4))
      val sig = Dedup.share(Dedup.minhashMinColumns(sh, 16))
      val sigA = sig.select(col("id").as("id_a") +:
        (0 until 16).map(k => col(s"mh$k").as(s"a$k")): _*)
      val sigB = sig.select(col("id").as("id_b") +:
        (0 until 16).map(k => col(s"mh$k").as(s"b$k")): _*)
      val est = cands.join(sigA, Seq("id_a")).join(sigB, Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (0 until 16).map(k =>
            when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
            .reduce(_ + _).as("est16"))
      val shd = Dedup.share(
        sh.select(col("id"), phash(col("sh"), 0).as("h")).distinct())
      val sizes = shd.groupBy("id").agg(count(lit(1)).as("n_sh"))
      val co = cands
        .join(shd.as("ca"), col("id_a") === col("ca.id"))
        .join(shd.as("cb"),
          col("id_b") === col("cb.id") && col("ca.h") === col("cb.h"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("inter"))
      est.join(co, Seq("id_a", "id_b"), "left")
        .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")),
          Seq("id_a"))
        .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")),
          Seq("id_b"))
        .select(col("est16"), coalesce(col("inter"), lit(0L)).as("inter"),
          (col("na") + col("nb") - coalesce(col("inter"), lit(0L))).as("un"))
        .select(expr("(10 * inter) div un").as("j_bucket"), col("est16"),
          expr("abs(est16 * un - 16 * inter) * 1000000 div (16 * un)")
            .as("err_fx"))
        .groupBy(col("j_bucket"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("est16")).as("_se"),
          sum(col("err_fx")).as("_sf"))
        .select(col("j_bucket"), col("n_pairs"),
          round(col("_se").cast("double") / (col("n_pairs") * 16), 6)
            .as("mean_est"),
          round(col("_sf").cast("double") / col("n_pairs") / 1000000.0d, 6)
            .as("mean_abs_err"))
        .orderBy(col("j_bucket"))
    }),

    // sk1: count-min-sketch heavy hitters over the token stream — the
    // bounded-memory frequency sketch (Cormode-Muthukrishnan): d=4
    // hash rows × w=1024 buckets of counters, estimate(tok) = min
    // over rows of its bucket counter (always ≥ the true count; the
    // overestimate is what the `exact` column audits). This promotes
    // the CMS that OperatorSpec pins as t10's drop-in to a first-
    // class oracle-checked query — t10 is the exact top-20 twin this
    // sketch approximates. Scale shape:
    // the counter table is ≤ d·w = 4096 rows built by ONE map-side-
    // combinable groupBy over (row, bucket) — at 100 TB it is the
    // only state that exists if the exact column is dropped; the
    // estimate pass joins distinct tokens against the BROADCAST
    // counter table (a map-side lookup, no shuffle), and top-k is
    // TakeOrdered. Hashes are portable (md5-derived) so DuckDB
    // rebuilds the identical sketch bit-for-bit.
    "sk1_cms_topk" -> ((s, dir) => {
      import graft.functions.PortableHash.phashCol
      val depth = 4; val width = 1024
      val rows = array((0 until depth).map(lit): _*)
      // Round-15 rewrite: the counters derive from the exact per-token
      // counts the DECLARED query computes anyway — Σ count(tok) per
      // (row, bucket) is bit-identical to counting occurrences per
      // bucket, so the d·|occurrences| md5 row-hash pass and its
      // 4-way explode of the full token stream collapse to d·|vocab|,
      // and the token stream loses its cache (its only consumer left
      // is the one map-side-combinable count groupBy). The bucketed
      // vocab frame is share()d: it feeds both the counter build and
      // the estimate join. At 100 TB WITHOUT the exact twin, counters
      // build straight off occurrences map-side exactly as before —
      // this reuse exists because the declared query carries `exact`.
      val toks = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val exactCnt = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      val bucketed = Dedup.share(exactCnt
        .select(col("tok"), col("exact"), explode(rows).as("r"))
        .select(col("tok"), col("exact"), col("r"),
          (phashCol(col("tok"), col("r")) % width).as("b")))
      val counters = bucketed.groupBy(col("r"), col("b"))
        .agg(sum(col("exact")).as("c"))
      bucketed
        .join(broadcast(counters), Seq("r", "b"))
        .groupBy(col("tok"), col("exact"))
        .agg(min(col("c")).as("est"))
        .select(col("tok"), col("est"), col("exact"))
        .orderBy(col("est").desc, col("tok"))
        .limit(20)
    }),

    // t26: per-doc repetition profile — the Gopher-family (Rae et al.
    // 2021) repetition quality signals, adapted token-level to this
    // corpus (no line structure exists to measure duplicate-line
    // fractions): modal 2-gram and 3-gram share of gram positions,
    // and the fraction of 5-gram positions belonging to grams that
    // repeat within the doc. All parts-per-million integer ratios of
    // integer counts — hash-exact across engines, no floats until
    // the final (deterministic, both-engines-IEEE) ppm division.
    // Scale shape: three map-only gram scans (grams ship as 60-bit
    // hashes, the t24 discipline), each collapsing map-side to
    // per-doc counters keyed by doc_id — no joins until the tiny
    // per-doc aggregate rows; docs shorter than n grams surface with
    // NULL metrics via the left joins.
    "t26_repetition_profile" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      // ONE corpus scan (round-15): the token arrays split once and
      // share() — the three gram passes and the n_tok projection all
      // explode off the cached arrays instead of four scan+split
      // passes over the corpus text
      val tk = Dedup.share(docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks")))
      def gramCnt(n: Int): DataFrame =
        tk.select(col("doc_id"),
            explode(Dedup.shingles(col("toks"), n)).as("sh"))
          .select(col("doc_id"), phash(col("sh"), n).as("h"))
          .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
      val p2 = gramCnt(2).groupBy(col("doc_id"))
        .agg(max(col("c")).as("max2"), sum(col("c")).as("ng2"))
      val p3 = gramCnt(3).groupBy(col("doc_id"))
        .agg(max(col("c")).as("max3"), sum(col("c")).as("ng3"))
      val p5 = gramCnt(5).groupBy(col("doc_id"))
        .agg(sum(when(col("c") > 1, col("c")).otherwise(lit(0L)))
          .as("dup5"), sum(col("c")).as("n5"))
      tk.select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tok"))
        .join(p2, Seq("doc_id"), "left")
        .join(p3, Seq("doc_id"), "left")
        .join(p5, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"),
          floor(col("max2") * 1000000L / col("ng2")).as("top2_ppm"),
          floor(col("max3") * 1000000L / col("ng3")).as("top3_ppm"),
          floor(col("dup5") * 1000000L / col("n5")).as("dup5_ppm"))
        .orderBy(col("doc_id"))
    }),

    // p25: the composed ADMISSION gate — Gopher (Rae et al. 2021)
    // applies TWO rule families before a doc enters the corpus: the
    // scalar rules t6 already reports (word count, word length,
    // symbol ratio, stopwords) and the repetition rules t6 lacks.
    // This composes t6's `keep` (reusing gopherReport, so the two
    // can never drift) with the modal-2-gram repetition rule on
    // t26's gram kernel (under 20% of gram positions, integer
    // cross-multiplied — no division), yielding the final per-doc
    // admit decision with both constituent flags visible. Scale
    // shape: gopherReport is pure scan-projection work; the gram
    // side is one map-side-combinable scan collapsing to per-doc
    // (max, count); one doc-keyed left join assembles.
    "p25_gopher_gate" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      // share()d: the projected corpus feeds BOTH the 2-shingle
      // repetition pass and the gopher text walk (round-16 — the
      // t26 one-scan rule; two full corpus scans → one)
      val d = Dedup.share(docs(s, dir).select(col("doc_id"), col("text")))
      val g2 = Dedup.shingleRows(d, col("doc_id"), col("text"), 2)
        .select(col("id").as("doc_id"), phash(col("sh"), 2).as("h"))
        .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("max2"), sum(col("c")).as("ng2"))
      TextFunctions.gopherReport(d, col("doc_id"), col("text"))
        .select(col("doc_id"), col("keep"))
        .join(g2, Seq("doc_id"), "left")
        .select(col("doc_id"), col("keep"),
          (col("ng2").isNull || col("max2") * 5L < col("ng2"))
            .as("r_repetition"))
        .withColumn("admit", col("keep") && col("r_repetition"))
        .orderBy(col("doc_id"))
    }),

    // t27: FORCAST readability — the one standard readability formula
    // with NO sentence term (grade = 20 − 15·mono/W, mono = share of
    // single-syllable words per 150-word sample), which is exactly
    // right for this corpus: the documents contain zero sentence
    // punctuation (max [.!?] count across both scale factors is 0),
    // so Flesch/LIX-family sentence denominators would degenerate to
    // 1 for every doc. Syllables are the standard vowel-group
    // heuristic ([aeiouy]+ runs); the grade is exact fixed-point —
    // 20e6 − (15e6·mono div W), positive operands so floor-div and
    // trunc-div coincide across engines — plus the LIX long-word
    // numerator (≥7 chars) as a ppm. Scale shape: ONE codegen byte
    // walk per document ([[ForcastShapeExpr]]) — no explode, no
    // shuffle, no join; the round-8 formulation (explode → per-token
    // regexp_extract_all → groupBy doc_id) paid a regex per token
    // and a corpus-sized shuffle for the same three counters, which
    // at 100 TB made this the corpus bottleneck.
    // ForcastShapeEquivalenceSpec pins new ≡ old on the fixture
    // corpus plus edge cases; wordless docs keep their NULL counters
    // (the left-join visibility the old shape had).
    "t27_forcast_readability" -> ((s, dir) => {
      val d = docs(s, dir)
      d.select(col("doc_id"),
          graft.functions.ForcastShape.shape(col("text")).as("fs"))
        .select(col("doc_id"),
          when(col("fs")(0) > 0L, col("fs")(0)).as("n_words"),
          when(col("fs")(0) > 0L, col("fs")(1)).as("n_mono"),
          when(col("fs")(0) > 0L, col("fs")(2)).as("n_long"))
        .select(col("doc_id"), col("n_words"), col("n_mono"), col("n_long"),
          expr("20000000L - ((15000000L * n_mono) div n_words)")
            .as("forcast_grade_micro"),
          expr("(1000000L * n_long) div n_words").as("longword_ppm"))
        .withColumn("band",
          when(col("forcast_grade_micro").isNull,
            lit(null).cast("string"))
          .when(col("forcast_grade_micro") < 10000000L, lit("easy"))
          .when(col("forcast_grade_micro") < 12000000L, lit("medium"))
          .otherwise(lit("hard")))
        .orderBy(col("doc_id"))
    }),

    // t29: Good–Turing frequency spectrum (Good 1953) over 3-GRAM
    // types — the unseen-mass estimate beside t17's vocabulary
    // growth, applied where Good–Turing classically lives: n-gram
    // language-model smoothing (the unigram vocabulary here is a
    // closed 31-type set per language, so its low-r spectrum is
    // empty by construction — the TRIGRAM spectrum has thousands of
    // singletons). Per language: N_r = number of trigram types
    // occurring exactly r times, the smoothed count r* =
    // (r+1)·N_{r+1}/N_r in exact micro fixed-point, and the
    // leave-one-out unseen-trigram probability p₀ = N₁/N in exact
    // ppm — the statistic that says how much of the language's
    // trigram inventory the corpus has NOT seen yet (the practical
    // stop/keep-crawling signal for a data-acquisition loop). Grams
    // ship as 60-bit portable hashes (the t24/t26 discipline —
    // never text; both engines hash identically, so even a
    // collision is engine-identical). All integer: both engines
    // rebuild every cell bit-for-bit. Scale shape: ONE map-side-
    // combinable (lang, gram) count shuffle, then the spectrum
    // groupBy and the r→r+1 self-join run on the ≤|langs|·max_count
    // spectrum frame — metadata-sized by construction.
    "t29_good_turing" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      val grams = Dedup.shingleRows(docs(s, dir), col("lang"),
          col("text"), 3)
        .select(col("id").as("lang"), phash(col("sh"), 3).as("g"))
      // shared: three consumers sit across joins (spectrum a/b sides,
      // p0) — without share() the corpus-sized gram-count shuffle
      // re-executes per side (the p13/d11 multi-consumer lesson); the
      // cached frame is (lang, hash, c) — never text
      val cnt = Dedup.share(grams.groupBy(col("lang"), col("g"))
        .agg(count(lit(1)).as("c")))
      val spec = cnt.groupBy(col("lang"), col("c").as("r"))
        .agg(count(lit(1)).as("n_types"))
      val tot = cnt.groupBy(col("lang")).agg(sum(col("c")).as("n_tokens"))
      val p0 = spec.where(col("r") === 1)
        .join(tot, Seq("lang"))
        .select(col("lang"),
          expr("(1000000L * n_types) div n_tokens").as("p0_ppm"))
      spec.as("a")
        .join(spec.as("b"),
          col("a.lang") === col("b.lang") && col("b.r") === col("a.r") + 1,
          "left")
        .select(col("a.lang").as("lang"), col("a.r").as("r"),
          col("a.n_types").as("n_types"),
          expr("(1000000L * (a.r + 1) * coalesce(b.n_types, 0L)) div a.n_types")
            .as("r_star_micro"))
        .where(col("r") <= 8)
        .join(p0, Seq("lang"), "left")
        .select(col("lang"), col("r"), col("n_types"),
          col("r_star_micro"), col("p0_ppm"))
        .orderBy(col("lang"), col("r"))
    }),

    // t30: MATTR (Covington & McFall 2010) — moving-average
    // type-token ratio at window w=25, the length-INDEPENDENT
    // lexical-diversity measure beside t21's root TTR (plain TTR
    // falls with document length by construction; averaging the TTR
    // of every w-token window removes that artifact, which is why
    // MATTR is the diversity score corpus-quality work reports).
    // Exact fixed-point: Σ over windows of |distinct(window)|, then
    // mattr_ppm = 10⁶·Σ div (w·n_windows); docs shorter than w keep
    // NULL diversity columns (no window exists — visible, not
    // silently dropped). Scale shape: one codegen byte walk per doc
    // ([[graft.functions.Mattr]], round-10 — prev-occurrence
    // counting replaces the O(w²)-per-token distinct-slice ladder;
    // VERDICT r9 ask #2) — no explode, no shuffle, no join; cost is
    // O(tokens) per doc, linear in the corpus at any w.
    "t30_mattr" -> ((s, dir) => {
      val w = 25
      docs(s, dir)
        .withColumn("mw", graft.functions.Mattr.mattrWindow(col("text"), w))
        .select(col("doc_id"),
          col("mw")(0).as("n_tokens"),
          when(col("mw")(0) >= w, col("mw")(0) - (w - 1))
            .as("n_windows"),
          when(col("mw")(0) >= w,
            expr(s"(1000000L * mw[1]) div ($w * (mw[0] - ${w - 1}))"))
            .as("mattr_ppm"))
        .orderBy(col("doc_id"))
    }),

    // t31: Heaps'-law VOCABULARY GROWTH — t29's companion readout
    // (t29 answers "how much unseen mass remains"; t31 answers "how
    // fast is the inventory still growing as the corpus grows" — the
    // other half of the keep-crawling decision, and the curve whose
    // flattening is what crawl-dedup actually buys). The corpus is
    // checkpointed at ten doc_id-decile prefixes; per prefix: total
    // trigram occurrences, distinct trigram types whose FIRST
    // occurrence falls inside the prefix, and the type/occurrence
    // ratio in exact ppm. Trigrams (not words: the synthetic vocab
    // is 31 words — degenerate; the trigram inventory grows
    // sub-linearly like real text) ship as 60-bit hashes, the
    // t24/t26/t29 discipline. Scale shape: ONE corpus-sized gram
    // shuffle feeding both the (gram → min doc) first-occurrence
    // aggregate and the per-doc occurrence counts (Dedup.share — the
    // t29 multi-consumer lesson); each gram/doc then maps to its
    // decile in CLOSED FORM (k = ceil(10·(id+1)/n) — no range join,
    // no 10× fan-out), and everything after the two groupBys is a
    // ≤10-row frame (the cumulative window is metadata-sized by
    // construction). The 1-row doc-count frame rides broadcast
    // crossJoins.
    "t31_heaps_growth" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val nd = d.agg((max(col("doc_id")) + 1L).as("nd"))
      val grams = Dedup.share(
        Dedup.shingleRows(d, col("doc_id"), col("text"), 3)
          .select(col("id").as("doc_id"), phash(col("sh"), 3).as("g")))
      val dv = grams.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
        .crossJoin(broadcast(nd))
        .select(expr("(10L * (first_doc + 1) + nd - 1) div nd").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("dv"))
      val dc = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(nd))
        .select(expr("(10L * (doc_id + 1) + nd - 1) div nd").as("k"),
          col("c"))
        .groupBy(col("k")).agg(sum(col("c")).as("dc"))
      val ks = s.range(1, 11).toDF("k").crossJoin(broadcast(nd))
        .select(col("k"), expr("(nd * k) div 10 - 1").as("max_doc_id"))
      // 10-row cumulative window — metadata-sized by construction
      val w = Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ks.join(dv, Seq("k"), "left").join(dc, Seq("k"), "left")
        .select(col("k"), col("max_doc_id"),
          sum(coalesce(col("dc"), lit(0L))).over(w).as("n_grams"),
          sum(coalesce(col("dv"), lit(0L))).over(w).as("vocab"))
        .select(col("k"), col("max_doc_id"), col("n_grams"), col("vocab"),
          when(col("n_grams") > 0,
            expr("(1000000L * vocab) div n_grams")).as("ttr_ppm"))
        .orderBy(col("k"))
    }),

    // t32: per-document n-gram NOVELTY — t31's curve read at the
    // document grain (t31 says how fast the inventory grows; t32 says
    // WHICH documents grow it — the crawl-ordering / acquisition-
    // priority signal: a doc whose grams the corpus has already seen
    // buys nothing, one full of first occurrences is the data worth
    // keeping). A gram occurrence is novel iff its type's FIRST
    // corpus occurrence (min doc_id) is this document; per doc:
    // occurrences, novel occurrences, exact ppm share. Docs too short
    // to produce a gram keep visible NULL columns. Scale shape: the
    // shared t29/t31 gram shuffle feeds the (gram → min doc) first-
    // occurrence aggregate; novelty is then ONE hash-keyed equi-join
    // of the gram rows back onto that frame (fixed-size 60-bit keys,
    // never text) and a map-side-combinable per-doc count — no
    // window, no cartesian, no per-doc state.
    "t32_doc_novelty" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      val d = docs(s, dir)
      val grams = Dedup.share(
        Dedup.shingleRows(d, col("doc_id"), col("text"), 3)
          .select(col("id").as("doc_id"), phash(col("sh"), 3).as("g")))
      val fo = grams.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
      val per = grams.join(fo, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
      d.select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          when(col("n_grams") > 0,
            expr("(1000000L * n_novel) div n_grams")).as("novelty_ppm"))
        .orderBy(col("doc_id"))
    }),

    // t33: SOURCE-overlap matrix — the inter-source duplication audit
    // a dedup plan starts from (which source pairs share inventory —
    // the mirror-site / re-crawl / syndication signal that decides
    // which pairs to near-dup against each other FIRST, and the
    // between-sources complement of t32's within-corpus novelty).
    // Distinct trigram types per source; for every intersecting
    // ordered pair: |∩|, Jaccard, and containment |∩|/min — the
    // mm15 shape at the source grain. Scale shape: ONE distinct
    // (source, gram-hash) shuffle shared across its three consumers;
    // pairs materialize only through shared grams (equi-join on the
    // hash), and per-gram fan-out is bounded by the source count —
    // the pair frame is ≤ S² rows, metadata-sized at any corpus
    // size.
    "t33_source_overlap" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      import graft.operators.HotKeys
      val sh = Dedup.share(
        Dedup.shingleRows(docs(s, dir), col("source"), col("text"), 3)
          .select(col("id").as("source"), phash(col("sh"), 3).as("g"))
          .distinct())
      // hot-gram cap (round-11, HotKeys scaladoc): a boilerplate
      // trigram present in > 64 sources identifies nothing and would
      // fan in quadratically through the pair join — dropped from
      // both the intersection and the per-source sizes, with the
      // per-source dropped count as the n_capped_* audit columns.
      // Mirrored in the oracle.
      val hot = HotKeys.hot(sh, cap = 64, "g")
      val capped = sh.join(broadcast(hot.select(col("g"))), Seq("g"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_capped"))
      val kept = HotKeys.drop(sh, hot, "g")
      val sizes = kept.groupBy(col("source")).agg(count(lit(1)).as("n"))
        .join(capped, Seq("source"), "left")
        .select(col("source"), col("n"),
          coalesce(col("n_capped"), lit(0L)).as("n_capped"))
      val pairs = kept.as("a").join(kept.as("b"),
          col("a.g") === col("b.g") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("shared"))
      pairs
        .join(sizes.select(col("source").as("source_a"),
          col("n").as("n_a"), col("n_capped").as("n_capped_a")),
          Seq("source_a"))
        .join(sizes.select(col("source").as("source_b"),
          col("n").as("n_b"), col("n_capped").as("n_capped_b")),
          Seq("source_b"))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          col("shared"),
          expr("(1000000L * shared) div (n_a + n_b - shared)")
            .as("jaccard_ppm"),
          expr("(1000000L * shared) div least(n_a, n_b)")
            .as("containment_ppm"),
          col("n_capped_a"), col("n_capped_b"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // sk6: AMS F₂ sketch (Alon–Matias–Szegedy 1996) — the second
    // frequency moment of the token distribution, the classic
    // join-size / self-join-cardinality / skew estimator: each of 16
    // sketch rows keeps ONE counter X_r = Σ_tok c_tok·s_r(tok) with
    // s_r ∈ {−1,+1} a portable md5-derived sign, and X_r² is an
    // unbiased estimate of F₂ = Σ c². Exact-integer end to end, so
    // DuckDB rebuilds every counter bit-for-bit; the exact F₂ rides
    // the same per-token count frame for an in-row error readout.
    // Scale shape: ONE map-side-combinable token count shuffle, then
    // a single-row aggregate computing all 16 signed sums plus the
    // exact moment in one pass — the sketch state is 16 longs, which
    // is the whole point: at 100 TB the exact column is dropped and
    // the 16 counters are all that exists.
    "sk6_ams_f2" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      val R = 16
      val toks = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val cnt = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val aggCols = (0 until R).map { r =>
        sum(col("c") * (phash(col("tok"), r) % 2 * 2 - 1)).as(s"x$r")
      } :+ sum(col("c") * col("c")).as("exact_f2")
      cnt.agg(aggCols.head, aggCols.tail: _*)
        .select(col("exact_f2"),
          posexplode(array((0 until R).map(r => col(s"x$r")): _*)))
        .select(col("pos").as("r"), col("col").as("x"),
          (col("col") * col("col")).as("est"), col("exact_f2"))
        .orderBy(col("r"))
    }),

    // t28: RAKE keyword extraction (Rose et al. 2010) — co-occurrence
    // keyword mining, the complement to t16's TF-IDF: stopwords
    // DELIMIT candidate phrases (phrase id = running stopword count,
    // an engine-portable integer), a word scores deg/freq over the
    // phrases it occurs in (deg = Σ lengths of containing phrases),
    // and a phrase scores the sum of its member word scores — all
    // exact ppm fixed-point, top-3 phrases per doc. The stopword
    // list is t1's, so the two text surfaces share one vocabulary of
    // "function words". Scale shape: everything is keyed by doc_id —
    // the phrase window, both groupBys and both joins partition on
    // the document, so no global window/sort exists anywhere and a
    // hot document bounds its own task, never the stage.
    "t28_rake_keywords" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val stop = Seq("the", "a", "an", "of", "and", "or", "to", "in",
        "is", "on", "for", "with")
      val toks = docs(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .withColumn("is_stop",
          col("tok").isin(stop: _*) || length(col("tok")) === 0)
      val wPhr = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      // share()d (round-16, VERDICT r15 #6 — the t26 treatment): ph
      // feeds pl AND occ, pl feeds occ AND the final ptext join, occ
      // feeds ws AND ps — unshared, the corpus scan + posexplode +
      // phrase window executed FIVE times through those references
      // (plan: 5 'Scan parquet documents' mentions → 1).
      val ph = Dedup.share(toks.withColumn("phrase_id",
          sum(when(col("is_stop"), 1L).otherwise(0L)).over(wPhr))
        .where(!col("is_stop"))
        .select(col("doc_id"), col("pos"), col("tok"), col("phrase_id")))
      val pl = Dedup.share(ph.groupBy(col("doc_id"), col("phrase_id"))
        .agg(count(lit(1)).as("plen"),
          array_join(expr("transform(array_sort(" +
            "collect_list(struct(pos, tok))), x -> x.tok)"), " ")
            .as("ptext")))
      val occ = Dedup.share(ph.join(pl.select(col("doc_id"),
        col("phrase_id"), col("plen")), Seq("doc_id", "phrase_id")))
      val ws = occ.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .withColumn("wscore_ppm", expr("(1000000L * deg) div freq"))
        .select(col("doc_id"), col("tok"), col("wscore_ppm"))
      val ps = occ.join(ws, Seq("doc_id", "tok"))
        .groupBy(col("doc_id"), col("phrase_id"))
        .agg(sum(col("wscore_ppm")).as("score_ppm"))
      val pd = ps.join(pl.select(col("doc_id"), col("phrase_id"),
          col("ptext")), Seq("doc_id", "phrase_id"))
        .groupBy(col("doc_id"), col("ptext").as("phrase"))
        .agg(max(col("score_ppm")).as("score_ppm"),
          count(lit(1)).as("n_occur"))
      val wRank = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_ppm").desc, col("phrase"))
      pd.withColumn("rank", row_number().over(wRank))
        .where(col("rank") <= 3)
        .select(col("doc_id"), col("phrase"), col("score_ppm"),
          col("n_occur"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // g4: connected components over the kNN graph — the REACHABILITY
    // partition beside g2's community vote (g2 answers "which island
    // votes you in"; g4 answers "what can you reach at all" — the
    // partition dedup/split policies actually key on, and the same
    // label d7/d8/p17 use on the near-dup pair graph, here exposed
    // over the shared IVF-pruned kNN edges). Spark side runs
    // [[Dedup.connectedComponents]] — min-label propagation to TRUE
    // convergence (throws rather than returning non-minimal labels);
    // the oracle replays hash-to-min WITH pointer jumping (label :=
    // min(label, neighbor labels, label-of-label)) for 8 unrolled
    // rounds — doubling reach covers any diameter ≤ 2⁸ = 256, far
    // past this kNN graph's (500 vectors at the sf0.01 gate, 5000 at
    // the sf0.1 bench — both empirically diameter ≪ 100), and extra
    // rounds past fixpoint are no-ops, so bounded unrolling equals
    // true convergence; a component whose diameter ever exceeded 256
    // would diverge the oracle from Spark's run-to-convergence and
    // show as a red hash, never a wrong green. Component size rides
    // along (the mixture/cap policies consume it).
    "g4_connected_components" -> ((s, dir) => {
      val und = knnEdges(s, dir).where(col("src") =!= col("dst"))
      val cc = graft.operators.Dedup.connectedComponents(
        und.select(col("src").as("id_a"), col("dst").as("id_b")))
      val nodes = emb(s, dir).select(col("vec_id").as("id"))
      val lbl = nodes.join(cc, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id"))
          .as("component"))
      val sizes = lbl.groupBy(col("component"))
        .agg(count(lit(1)).as("csize"))
      lbl.join(sizes, Seq("component"))
        .select(col("id"), col("component"), col("csize"))
        .orderBy(col("id"))
    }),

    // g5: k-core peel (k=2, 8 bounded rounds) over the MUTUAL-kNN
    // graph — the density screen beside g2 (which island) and g4
    // (what's reachable): an edge survives only if BOTH endpoints
    // rank each other in their top-3 (the standard robustification
    // that makes kNN graphs clusterable — one-sided links to hubs
    // drop out), and a node is in the core iff it survives 8
    // synchronous rounds of sub-2-degree peeling — the
    // hub-vs-periphery signal a curation run uses to pick
    // representative documents from dense embedding regions. The raw
    // top-3 graph is degree-regular by construction (every k-core of
    // it is all-or-nothing — measured: k=3 keeps all 500 nodes, k=4
    // keeps none); mutuality is what creates the degree gradient
    // (0..3) that makes coreness informative. Rounds are BOUNDED on
    // BOTH sides by design — [[LabelProp.kCore]]'s scaladoc has the
    // full rationale (peel depth is data-unbounded; both engines
    // compute the identical 8-round survivor set at any depth, so
    // parity never rests on a convergence assumption); the oracle
    // replays the same 8 rounds MATERIALIZED (the g4 discipline:
    // each round references the previous survivor set twice).
    // in_core + within-survivor-set degree per node.
    "g5_kcore" -> ((s, dir) => {
      // checkpoint BEFORE the self-join: the kNN pipeline would
      // otherwise be planned four times over (mutual's two sides ×
      // undirect's union), and Catalyst's size-stats products over
      // the duplicated join tree blow up into minutes of BigInteger
      // arithmetic at sf0.1 — the flat RDD makes the self-join plan
      // trivial and executes the IVF search exactly once
      val e0 = knnEdges(s, dir).where(col("src") =!= col("dst"))
        .localCheckpoint(true)
      val mutual = e0.as("e").join(e0.as("r"),
          col("e.src") === col("r.dst") && col("e.dst") === col("r.src"),
          "left_semi")
        .select(col("src"), col("dst"))
      graft.operators.LabelProp.kCore(
          emb(s, dir).select(col("vec_id").as("id")), mutual, k = 2)
        .orderBy(col("id"))
    }),

    // d19: CHUNK-level near-dup NN — boilerplate detection below the
    // document grain (repeated license headers / navigation blocks /
    // quoted passages survive doc-level dedup and still leak into
    // training data; the chunk is the grain a pretraining curation
    // run actually dedups at). Every doc splits into fixed 32-char
    // chunks, each chunk gets a 64-bit portable fingerprint (two
    // seeded 32-bit phash halves — engine-exact, so DuckDB rebuilds
    // every bit), and each chunk reads its hamming-nearest other
    // chunk through [[graft.operators.HammingNN]]. The corpus is
    // ≥4.9k chunks at EVERY scale — above the 4096 pairwise limit —
    // so this is the query that keeps the banded production branch
    // (16-bit×4 band candidates, pigeonhole-exact ≤3 bits)
    // gate-visible end to end (VERDICT r9 ask #4: the gate's media
    // corpora are 6–13 blobs and always take the pairwise fast
    // path); duplicated chunks exist in the corpus by construction
    // (max ×6 at sf0.01, ×24 at sf0.1), so nn_hamming = 0 hits are
    // load-bearing, and the LEFT join keeps band-isolated chunks
    // visible as NULL-NN rows (the HammingNN caller contract).
    // Scale shape: per-doc O(len) chunking, corpus-sized band
    // shuffle (4 rows/key), candidates only pay XOR/popcount —
    // never all-pairs.
    "d19_chunk_nn" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      val cw = 32
      // the chunk key is a PACKED LONG (doc_id·2³² + chunk index) for
      // the band shuffle and the NN min-struct tie-break — half the
      // key width of the round-10 "doc#ci" string, and the tie vote
      // is a long compare instead of a string compare. The readable
      // "doc#ci" form is a final projection only. Bound: doc_id <
      // 2³², ci < 2³² (a 32-byte chunk index never reaches it; a
      // >4G-document corpus would move to a struct key). The NN ties
      // therefore break in (doc_id, ci) NUMERIC order — mirrored in
      // the oracle's ORDER BY pk.
      val hashed = docs(s, dir).where(length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          explode(expr(s"sequence(0L, (length(text) - 1) div $cw)"))
            .as("ci"))
        .select(
          (shiftleft(col("doc_id").cast("long"), 32) + col("ci")).as("pk"),
          expr(s"substr(text, cast(ci * $cw + 1 AS int), $cw)").as("chunk"))
        .select(col("pk"),
          phash(col("chunk"), 1).bitwiseAND(lit(4294967295L)).as("hi"),
          phash(col("chunk"), 2).bitwiseAND(lit(4294967295L)).as("lo"))
      val nn = graft.operators.HammingNN.nearest(hashed, "pk", "hi", "lo")
      def ckOf(c: Column) = concat(
        shiftrightunsigned(c, 32).cast("string"), lit("#"),
        c.bitwiseAND(lit(4294967295L)).cast("string"))
      hashed.join(nn, Seq("pk"), "left")
        .select(ckOf(col("pk")).as("ck"), col("hi"), col("lo"),
          when(col("nn_pk").isNotNull, ckOf(col("nn_pk"))).as("nn_ck"),
          col("nn_hamming"))
        .orderBy(col("ck"))
    }),

    // sk7: sketch-based JOIN-SIZE estimation — the AMS inner-product
    // property (the theorem that made F₂ sketches a query-planner
    // tool): for two relations' key-frequency vectors, E[X_r(A) ·
    // X_r(B)] = Σ_k fA(k)·fB(k), which IS the equi-join output
    // cardinality. Here the two relations are the lexicographically
    // first and last document sources, keys are tokens, and the
    // exact join size rides the same count frame for the error
    // readout. Scale shape: ONE map-side-combinable (tok → cA, cB)
    // shuffle, then a single-row reduce computing all 32 signed
    // sums plus the exact product-sum — at 100 TB each side keeps
    // 16 longs and the join size of two corpora is estimated
    // without ever joining them (the whole point).
    "sk7_join_size_est" -> ((s, dir) => {
      import graft.functions.PortableHash.phash
      val R = 16
      val d = docs(s, dir)
      val bounds = d.agg(min(col("source")).as("sa"),
        max(col("source")).as("sb"))
      val toks = d.crossJoin(broadcast(bounds))
        .where(col("source") === col("sa") ||
          col("source") === col("sb"))
        .select((col("source") === col("sa")).as("in_a"),
          explode(split(col("text"), " ")).as("tok"))
        .where(length(col("tok")) > 0)
      val cnt = toks.groupBy(col("tok")).agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))
      val aggs = (0 until R).flatMap { r =>
        val sgn = phash(col("tok"), r) % 2 * 2 - 1
        Seq(sum(col("ca") * sgn).as(s"xa$r"),
          sum(col("cb") * sgn).as(s"xb$r"))
      } :+ sum(col("ca") * col("cb")).as("exact_join")
      cnt.agg(aggs.head, aggs.tail: _*)
        .select(col("exact_join"),
          array((0 until R).map(r => col(s"xa$r")): _*).as("xa"),
          array((0 until R).map(r => col(s"xb$r")): _*).as("xb"))
        .select(col("exact_join"),
          posexplode(arrays_zip(col("xa"), col("xb"))))
        .select(col("pos").as("r"),
          col("col.xa").as("xa"), col("col.xb").as("xb"),
          (col("col.xa") * col("col.xb")).as("est"),
          col("exact_join"))
        .orderBy(col("r"))
    })
  )

  /** s8/s9's query set: the leading 8 tokens of the first 5 docs. */
  /** The g-family's shared graph: s14's IVF-pruned kNN join (k=3,
    * nProbe=2) as a directed edge list — graph construction inherits
    * the serve path's pruning instead of an all-pairs build. */
  private def knnEdges(s: SparkSession, dir: String): DataFrame = {
    val q = emb(s, dir).select(col("vec_id").as("qid"),
      col("embedding").as("qvec"))
    Ivf.knnJoinAt(s, mainIndexPath(s, dir), q, topK = 3, nProbe = 2)
      .select(col("qid").as("src"), col("vec_id").as("dst"))
  }

  private def bm25Queries(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).where(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"))

  /** The memoized persisted BM25 index (s8/s9's). */
  private def bm25IndexPath(s: SparkSession, dir: String): String =
    persistedIndex(s, s"s8|$dir") { p =>
      Bm25.persist(
        Bm25.build(docs(s, dir), col("doc_id"), col("text")), p)
    }

  // DuckDB-side portable hash of expression e with seed s:
  private def dkHash(e: String, s: String): String =
    s"('0x' || substr(md5($e || '#' || ($s)), 1, 15))::BIGINT"

  // DuckDB quality formula — the single source, interpolated into both
  // the t1 and p1 oracles (t1's green hash is what proves its parity
  // with TextFunctions.qualityScore).
  private val dkQuality =
    """round(least(length(text)::DOUBLE / 500.0, 1.0)
      |    * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE / length(text))
      |    * least((len(list_filter(string_split(text, ' '),
      |        tk -> list_contains(['the','a','an','of','and','or','to','in','is','on','for','with'], tk)))::DOUBLE
      |        / len(string_split(text, ' '))) * 5.0, 1.0), 6)""".stripMargin

  private val dkLangMarkers =
    """('en', ['the','and','of','to','is']),
      |    ('de', ['der','und','die','das','ist']),
      |    ('fr', ['le','la','et','les','est']),
      |    ('es', ['el','los','que','es','y'])""".stripMargin

  // shingles with duplicates (dedup happens downstream where needed —
  // min-based MinHash is duplicate-insensitive)
  private val shingleCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i))""".stripMargin

  // Full BM25 recomputation (Okapi, Lucene idf, k1=1.2 b=0.75) ending
  // in bm25_scored(qid, doc_id, score) — shared by s8 and s9 so the
  // fused oracle can never drift from the standalone one. Query set:
  // the leading 8 tokens of docs 0-4, distinct terms.
  private val bm25Cte =
    """bt AS (
      |  SELECT doc_id, term FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |    FROM documents)
      |  WHERE length(term) > 0),
      |bdl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM bt GROUP BY 1),
      |bpost AS (
      |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      |  FROM bt GROUP BY 1, 2),
      |bstats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM bdl),
      |bidf AS (
      |  SELECT term, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf FROM (
      |    SELECT term, count(*) AS df FROM bpost GROUP BY 1), bstats),
      |bq AS (
      |  SELECT DISTINCT doc_id AS qid, term FROM (
      |    SELECT doc_id, unnest(list_slice(string_split(text, ' '), 1, 8)) AS term
      |    FROM documents WHERE doc_id < 5)
      |  WHERE length(term) > 0),
      |bcontrib AS (
      |  SELECT bq.qid, p.doc_id,
      |    i.idf * (p.tf * 2.2) /
      |      (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS c
      |  FROM bq
      |  JOIN bpost p ON bq.term = p.term
      |  JOIN bidf i ON bq.term = i.term
      |  JOIN bdl d ON p.doc_id = d.doc_id, bstats s),
      |bm25_scored AS (
      |  SELECT qid, doc_id, round(sum(c), 5) AS score
      |  FROM bcontrib GROUP BY 1, 2)""".stripMargin

  // The p4/p4b corpus: documents plus a re-idified mirror of every
  // 5th doc (ids offset past max so they never collide), split by the
  // NAIVE id hash — the cross-split leak these reports detect.
  // Shared so the exact and bloom-prefiltered variants can never
  // drift apart on the input they analyze.
  private def contaminationSplit(s: SparkSession, dir: String): DataFrame = {
    val d0 = docs(s, dir).select(col("doc_id"), col("text"))
    val mx = d0.agg((max(col("doc_id")) + 1).as("_mx"))
    val d = d0.unionByName(
      d0.where(col("doc_id") % 5 === 0).crossJoin(broadcast(mx))
        .select((col("doc_id") + col("_mx")).as("doc_id"), col("text")))
    val bucket = graft.functions.PortableHash
      .phash(col("doc_id").cast("string"), 7) % 100
    // shared: every caller (p4, p4b) consumes this frame on BOTH its
    // train and test sides, and the rows are narrow (id, hash, split
    // — no text) — one corpus pass instead of one per consumer
    Dedup.share(d.select(col("doc_id"), md5(col("text")).as("h"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split")))
  }

  /** Dump the ANN oracle base (round-6): the IVF assignments + probe
    * sets of the two persisted gate indexes, written as parquet under
    * Verify's out dir. The oracle SQL below recomputes the pruned
    * cosine top-k (s2/s2p/s2a) and the SemDeDup domination rule (s7)
    * over these dumps in DuckDB — the quantizer training stays
    * spec-pinned (deterministic, IvfSpec/SemDedupSpec), the scoring /
    * ranking / keep-rule layer becomes hash-checked, the same split
    * the ADS-B oracles use. Reuses the memoized index paths, so the
    * dump IS the index the queries serve from. */
  def writeOracleBase(spark: SparkSession, dir: String,
      sfDir: String): Unit = {
    def w(df: DataFrame, n: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$n")
    val e = emb(spark, sfDir)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val main = mainIndexPath(spark, sfDir)
    w(spark.read.parquet(main).select(col("id"), col("vec"), col("cid")),
      "ivf_main")
    w(Ivf.probes(Ivf.loadCodebook(spark, main), q, 4), "ivf_main_probes")
    // s16: the FULL probe order (all 16 clusters) — a probe_rank ≤ n
    // filter over this one dump reproduces the probe set of every
    // nProbe ≤ 16, so the oracle can replay the whole recall curve.
    w(Ivf.probesRanked(Ivf.loadCodebook(spark, main), q, 16),
      "ivf_main_probes_ranked")
    // s14: the corpus-wide probe set (every vector, nProbe=2) — the
    // kNN-join oracle recomputes the pruned search from the same
    // probes the shuffle join used.
    w(Ivf.probes(Ivf.loadCodebook(spark, main),
      e.select(col("vec_id").as("qid"), col("embedding").as("qvec")), 2),
      "ivf_knn_probes")
    val app = appendIndexPath(spark, sfDir)
    w(spark.read.parquet(app).select(col("id"), col("vec"), col("cid")),
      "ivf_append")
    w(Ivf.probes(Ivf.loadCodebook(spark, app), q, 4), "ivf_append_probes")
    // s17: the append index's stored centroids — the drift oracle
    // recomputes 1 − cos(Σ members, centroid) over dump + sidecar.
    w(Ivf.quantizerDf(spark, app), "ivf_append_quantizer")
    // s19: the REBUILT index's swapped-in quantizer — the rebuild
    // oracle re-assigns the whole corpus (original + re-crawled ids,
    // both derived from the embeddings table, never from a dump) with
    // it and re-derives the audit's counts/checksums/replay split.
    w(Ivf.quantizerDf(spark, rebuiltIndexPath(spark, sfDir)),
      "ivf_rebuilt_quantizer")
    // s11: the payload-carrying index — label rides in the dump so the
    // oracle applies the same pre-filter the scan does.
    val flt = filteredIndexPath(spark, sfDir)
    w(spark.read.parquet(flt)
      .select(col("id"), col("vec"), col("cid"), col("label")),
      "ivf_filtered")
    w(Ivf.probes(Ivf.loadCodebook(spark, flt), q, 4), "ivf_filtered_probes")
    // s4/s5: the memoized persisted PQ index — the exact files the
    // queries serve from.
    val pqp = pqIndexPath(spark, sfDir)
    w(spark.read.parquet(pqp).select(col("id"), col("codes")),
      "pq_codes")
    w(codebooksDf(spark, Pq.loadIndex(spark, pqp).codebooks),
      "pq_codebooks")
    // s6: coded clusters, probe set and PQ codebooks of the memoized
    // persisted IVF-PQ index — the exact files the query serves from.
    val s6 = ivfPqIndexPath(spark, sfDir)
    val idx = IvfPq.loadIndex(spark, s6)
    w(spark.read.parquet(s6).select(col("id"), col("cid"), col("codes")),
      "ivfpq_codes")
    w(Ivf.probes(idx.coarse, q, 4), "ivfpq_probes")
    w(codebooksDf(spark, idx.codebooks), "ivfpq_codebooks")
    // t15: the trained merge table — the oracle replays it over the
    // corpus vocabulary from scratch (recursive CTE), so only the
    // merges are dumped, never the segmentation it is checking.
    w(spark.read.parquet(s"${bpeModelPath(spark, sfDir)}/merges"),
      "bpe_merges")
    // p20: the trained probe weights — the oracle re-scores every
    // embedding from them (bit-exact: multiply/add only).
    w(spark.read.parquet(probeWeightsPath(spark, sfDir)),
      "probe_weights")
  }

  private def codebooksDf(spark: SparkSession,
      codebooks: IndexedSeq[Array[(Int, Array[Float], Double)]]): DataFrame = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.map { case (code, cv, _) => (j, code, cv) }
    }.toDF("sub", "code", "cv")
  }

  /** The memoized full-corpus IVF index (s2p's; s2 rebuilds the same
    * deterministic index in memory, s7 the same quantizer). */
  private def mainIndexPath(s: SparkSession, dir: String): String =
    persistedIndex(s, s"s2p|$dir") { p =>
      val index = Ivf.build(emb(s, dir), col("vec_id"), col("embedding"),
        k = 16)
      Ivf.persist(index, p)
      index.assigned.unpersist(blocking = false)
    }

  /** The memoized persisted plain-PQ index (s4/s5's). */
  private def pqIndexPath(s: SparkSession, dir: String): String =
    persistedIndex(s, s"s4|$dir") { p =>
      val index = Pq.build(emb(s, dir), col("vec_id"), col("embedding"),
        dim = 64, m = 16, k = 16, iters = 3)
      Pq.persist(index, p)
      index.coded.unpersist(blocking = false)
    }

  /** The memoized persisted IVF-PQ index (s6's). */
  private def ivfPqIndexPath(s: SparkSession, dir: String): String =
    persistedIndex(s, s"s6|$dir") { p =>
      val index = IvfPq.build(emb(s, dir), col("vec_id"), col("embedding"),
        dim = 64, kCoarse = 16, m = 16, k = 16, iters = 3)
      IvfPq.persist(index, p)
      index.coded.unpersist(blocking = false)
    }

  /** The memoized trained BPE model (t15's): 30 merges trained on the
    * corpus, persisted as merges + final vocab segmentation. */
  private def bpeModelPath(s: SparkSession, dir: String): String =
    persistedIndex(s, s"t15|$dir") { p =>
      val m = Bpe.train(docs(s, dir), col("text"), nMerges = 30)
      m.merges.coalesce(1).write.mode("overwrite").parquet(s"$p/merges")
      m.vocab.coalesce(1).write.mode("overwrite").parquet(s"$p/vocab")
      m.vocab.unpersist(blocking = false)
    }

  /** The memoized trained logistic-regression probe (p20's): 15
    * full-batch GD steps over the embeddings, target = label parity;
    * persisted as 65 (i, w) rows (64 weights + bias). */
  private def probeWeightsPath(s: SparkSession, dir: String): String =
    persistedIndex(s, s"p20|$dir") { p =>
      import s.implicits._
      val w = graft.operators.LinearProbe.train(emb(s, dir),
        col("embedding"), pmod(col("label"), lit(2)),
        dim = 64, iters = 15, step = 2.0)
      w.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("i", "w")
        .coalesce(1).write.mode("overwrite").parquet(p)
    }

  /** The memoized payload-carrying IVF index (s11's filtered search):
    * the same deterministic quantizer as s2p's, persisted with the
    * `label` metadata column co-located in the inverted lists. */
  private def filteredIndexPath(s: SparkSession, dir: String): String =
    persistedIndex(s, s"s11|$dir") { p =>
      val e = emb(s, dir)
      val index = Ivf.build(e, col("vec_id"), col("embedding"), k = 16)
      Ivf.persistWithPayload(index,
        e.select(col("vec_id").as("id"), col("label")), p)
      index.assigned.unpersist(blocking = false)
    }

  /** The memoized half-built-half-appended index (s2a's lifecycle). */
  private def appendIndexPath(s: SparkSession, dir: String): String =
    persistedIndex(s, s"s2a|$dir") { p =>
      val e = emb(s, dir)
      val index = Ivf.build(e.where(col("vec_id") % 2 === 0),
        col("vec_id"), col("embedding"), k = 16)
      Ivf.persist(index, p)
      index.assigned.unpersist(blocking = false)
      Ivf.appendPersisted(s, p, e.where(col("vec_id") % 2 === 1),
        col("vec_id"), col("embedding"))
    }

  /** The memoized REBUILT index (s19's lifecycle close, round-15):
    * the same drift-planted build+append instance as s18's, then a
    * full [[graft.operators.IndexMaintenance.rebuildPersisted]] with
    * a deterministic mid-build append — every 5th vector re-ingested
    * past max(vec_id) ("re-crawled duplicates", p23's convention) —
    * landing on the LIVE index through the `onShadowBuilt` seam, so
    * the gate row exercises the catch-up replay, not just the swap.
    * The rebuilt quantizer is the oracle's base dump; the audit at
    * `__rebuild_audit` is the gate row. */
  private def rebuiltIndexPath(s: SparkSession, dir: String): String =
    persistedIndex(s, s"s19|$dir") { p =>
      val e = emb(s, dir)
      val index = Ivf.build(e.where(col("vec_id") % 2 === 0),
        col("vec_id"), col("embedding"), k = 16)
      Ivf.persist(index, p)
      index.assigned.unpersist(blocking = false)
      Ivf.appendPersisted(s, p, e.where(col("vec_id") % 2 === 1),
        col("vec_id"), col("embedding"))
      val mx = e.agg(max(col("vec_id")).as("m")).head().getLong(0) + 1
      graft.operators.IndexMaintenance.rebuildPersisted(s, p, k = 16,
        onShadowBuilt = () =>
          Ivf.appendPersisted(s, p,
            e.where(col("vec_id") % 5 === 2)
              .select((col("vec_id") + mx).as("id"),
                col("embedding").as("vec")),
            col("id"), col("vec")))
      ()
    }

  private def tbl(n: String) = s"read_parquet('__BASE__/$n/*.parquet')"

  /** The s17 drift replay as a reusable CTE block (round-14 — shared
    * by the s17 gate row and s18's repair replay so the trigger rule
    * cannot drift): over the dumped append index + quantizer, ends in
    * `m (cid, id, vec)`, `me (cid, j, e)`, `c (cid, cvec)`,
    * `d (cid, n_members, drift)` and `med (md)`. */
  private def driftCtes: String =
    s"""m AS (
      |  SELECT cid, id, vec FROM ${tbl("ivf_append")}),
      |me AS (
      |  SELECT cid, j, CAST(floor(vec[j] * 10000000.0) AS BIGINT) AS e
      |  FROM m, UNNEST(range(1, len(vec) + 1)) AS u(j)),
      |sums AS (
      |  SELECT cid, j, count(*) AS n, CAST(sum(e) AS BIGINT) AS s
      |  FROM me GROUP BY 1, 2),
      |c AS (
      |  SELECT cid, cvec FROM ${tbl("ivf_append_quantizer")}),
      |ce AS (
      |  SELECT cid, j, CAST(floor(cvec[j] * 10000000.0) AS BIGINT) AS c6
      |  FROM c, UNNEST(range(1, len(cvec) + 1)) AS u(j)),
      |agg AS (
      |  SELECT cid, CAST(max(n) AS BIGINT) AS n_members,
      |    sum(CAST(s AS HUGEINT) * c6) AS num,
      |    sum(CAST(s AS HUGEINT) * s) AS na,
      |    sum(CAST(c6 AS HUGEINT) * c6) AS nb
      |  FROM sums JOIN ce USING (cid, j) GROUP BY 1),
      |d AS (
      |  SELECT cid, n_members,
      |    CASE WHEN na = 0 OR nb = 0 THEN NULL
      |      ELSE round(1.0 - CAST(num AS DOUBLE) /
      |        (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
      |      END AS drift
      |  FROM agg),
      |med AS (SELECT quantile_cont(drift, 0.5) AS md FROM d)""".stripMargin

  /** Shared t15/p21 oracle prefix (one definition so the two replays
    * can never drift): re-apply the dumped merge table over the
    * corpus vocabulary — a recursive CTE with one left-to-right
    * non-overlapping `list_reduce` fold per rank ("last token == a
    * and next == b" collapses to ab) — ending in `seg` (word →
    * subword count) and `tokc` (per-(doc, word) counts). Empty words
    * from repeated spaces are excluded in BOTH CTEs, matching the
    * engine's length >= 1 filter and the trained vocab's. */
  private def bpeReplaySql: String =
    s"""WITH RECURSIVE w AS (
       |  SELECT DISTINCT u.word FROM (
       |    SELECT string_split(text, ' ') AS t FROM documents),
       |    UNNEST(t) AS u(word)
       |  WHERE length(u.word) > 0),
       |mm AS (SELECT CAST(rank AS INTEGER) AS rank, a, b
       |  FROM ${tbl("bpe_merges")}),
       |mx AS (SELECT coalesce(max(rank), 0) AS mr FROM mm),
       |rec AS (
       |  SELECT word, array_to_string(string_split(word, ''), ' ') AS enc,
       |    0 AS r
       |  FROM w
       |  UNION ALL
       |  SELECT rec.word,
       |    list_reduce(string_split(rec.enc, ' '),
       |      (acc, x) -> CASE
       |        WHEN x = mm.b AND regexp_extract(acc, '[^ ]*$$') = mm.a
       |        THEN regexp_replace(acc, '[^ ]*$$', mm.a || mm.b)
       |        ELSE acc || ' ' || x END) AS enc,
       |    rec.r + 1 AS r
       |  FROM rec JOIN mm ON mm.rank = rec.r + 1),
       |seg AS (
       |  SELECT word, len(string_split(enc, ' ')) AS ns
       |  FROM rec, mx WHERE r = mx.mr),
       |tokc AS (
       |  SELECT doc_id, u.word, count(*) AS cnt FROM (
       |    SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |    UNNEST(t) AS u(word)
       |  WHERE length(u.word) > 0
       |  GROUP BY 1, 2)""".stripMargin

  /** Pruned IVF cosine top-5 recomputed in SQL from an assignment +
    * probe dump — the s1 oracle's arithmetic restricted to the probe
    * join (ascending-index accumulation matches the codegen'd dot). */
  /** The CTE chain through `ranked` — shared by [[ivfTopkSql]] and
    * the g1 oracle (which consumes the ranked pairs as a GRAPH rather
    * than a result set). */
  private def ivfTopkCtes(assigned: String, probes: String,
      extraCols: String = "", extraWhere: String = ""): String =
    s"""a AS (SELECT id, vec, cid$extraCols FROM ${tbl(assigned)}),
       |p AS (SELECT qid, qvec, cid FROM ${tbl(probes)}),
       |pairs AS (
       |  SELECT p.qid, a.id AS vec_id, p.qvec AS qe, a.vec AS ve
       |  FROM a JOIN p USING (cid) WHERE a.id <> p.qid$extraWhere),
       |comp AS (
       |  SELECT qid, vec_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
       |  FROM pairs),
       |sims AS (SELECT qid, vec_id,
       |  round(dot / (sqrt(nq) * sqrt(nv)), 5) AS sim FROM comp),
       |ranked AS (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
       |      AS rank
       |  FROM sims)""".stripMargin

  private def ivfTopkSql(assigned: String, probes: String,
      extraCols: String = "", extraWhere: String = "",
      topK: Int = 5): String =
    s"""WITH ${ivfTopkCtes(assigned, probes, extraCols, extraWhere)}
       |SELECT qid, vec_id, sim, rank FROM ranked
       |WHERE rank <= $topK ORDER BY qid, rank""".stripMargin

  /** ADC score fragment: Σⱼ qⱼ·codewordⱼ,codes[j] with the SAME
    * ascending j then ascending i accumulation as `Pq.adcScore` over
    * `Pq.lutCols` (m=16 subspaces, dsub=4, k=16 codes; `cvs` is the
    * flat (sub, code)-ordered codeword list, codes are 0-based). */
  private def adcExpr(qe: String, codes: String, cvs: String): String =
    s"""list_sum(list_transform(range(0, 16), j ->
       |      list_sum(list_transform(range(1, 5), i ->
       |        CAST($qe[j*4 + i] AS DOUBLE) *
       |        CAST($cvs[j*16 + $codes[j+1] + 1][i] AS DOUBLE)))))""".stripMargin

  /** Exact-cosine re-rank suffix over a `cand (qid, vec_id)` CTE —
    * `Similarity.rerankExact` in SQL (s1's arithmetic, top-`topK`). */
  private def rerankSql(topK: Int): String =
    s"""rr AS (
       |  SELECT cd.qid, cd.vec_id, q.qe, e.embedding AS ve
       |  FROM cand cd JOIN qq q USING (qid)
       |  JOIN embeddings e ON e.vec_id = cd.vec_id),
       |comp AS (
       |  SELECT qid, vec_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
       |  FROM rr),
       |sims AS (SELECT qid, vec_id,
       |  round(dot / (sqrt(nq) * sqrt(nv)), 5) AS sim FROM comp),
       |rranked AS (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
       |      AS rank
       |  FROM sims)
       |SELECT qid, vec_id, sim, rank FROM rranked
       |WHERE rank <= $topK ORDER BY qid, rank""".stripMargin

  private val qqCte: String =
    "qq AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings " +
      "WHERE vec_id < 10)"

  // Shared by p4 and p4b: the bloom variant is output-identical by
  // construction, and sharing the string makes that contract explicit.
  private val p4OracleSql =
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
      |    text FROM documents
      |  WHERE doc_id % 5 = 0),
      |sp AS (
      |  SELECT doc_id, md5(text) AS text_hash,
      |    CASE WHEN ${dkHash("CAST(doc_id AS VARCHAR)", "7")} % 100 < 80 THEN 'train'
      |         WHEN ${dkHash("CAST(doc_id AS VARCHAR)", "7")} % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM corpus)
      |SELECT t.doc_id, t.text_hash
      |FROM sp t
      |WHERE t.split = 'test' AND EXISTS (
      |  SELECT 1 FROM sp tr
      |  WHERE tr.split = 'train' AND tr.text_hash = t.text_hash)
      |ORDER BY t.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // Pruned IVF search over the dumped assignment + probes: the
    // scoring, pruning-by-probe and top-k layers are recomputed in
    // SQL; the Lloyd training behind the dump stays spec-pinned.
    "s2_ivf_topk" -> ivfTopkSql("ivf_main", "ivf_main_probes"),
    "s2p_ivf_persisted" -> ivfTopkSql("ivf_main", "ivf_main_probes"),

    // s14: the same pruned-search recomputation as s2p, over the
    // dumped corpus-wide probe set and k=3.
    "s14_knn_join" -> ivfTopkSql("ivf_main", "ivf_knn_probes", topK = 3),

    // g1: s14's ranked kNN pairs consumed as a GRAPH, then the eight
    // fixed-point PageRank supersteps UNROLLED as a CTE chain — every
    // iteration's integer ppm mass replayed exactly (floor-divide by
    // out-degree, damped floor-divide by 100, 150000 base).
    "g1_knn_pagerank" -> {
      val iters = (1 to 8).map { i =>
        s"""r$i AS (
           |  SELECT n.id,
           |    CAST(150000 + floor(85 * coalesce(s.in_sum, 0) / 100)
           |      AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS id,
           |      sum(CAST(floor(r.r / e.deg) AS BIGINT)) AS in_sum
           |    FROM edges e JOIN r${i - 1} r ON e.src = r.id
           |    GROUP BY 1) s ON n.id = s.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${ivfTopkCtes("ivf_main", "ivf_knn_probes")},
         |edges0 AS (
         |  SELECT qid AS src, vec_id AS dst FROM ranked WHERE rank <= 3),
         |deg AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg
         |  FROM edges0 GROUP BY 1),
         |edges AS (
         |  SELECT e.src, e.dst, d.deg FROM edges0 e JOIN deg d USING (src)),
         |nodes AS (SELECT vec_id AS id FROM embeddings),
         |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |$iters
         |SELECT id, r AS rank_ppm FROM r8 ORDER BY id""".stripMargin
    },

    // g2: five synchronous LPA votes unrolled — per round, neighbor
    // label counts + the (votes desc, label asc) top-1 window over
    // the same undirected dedup'd edge set, isolated nodes keeping
    // their label via the left join.
    "g2_label_propagation" -> {
      val rounds = (1 to 5).map { i =>
        s"""v$i AS (
           |  SELECT id, lbl AS new_lbl FROM (
           |    SELECT e.dst AS id, l.lbl, count(*) AS votes,
           |      row_number() OVER (PARTITION BY e.dst
           |        ORDER BY count(*) DESC, l.lbl) AS rn
           |    FROM und e JOIN l${i - 1} l ON e.src = l.id
           |    GROUP BY e.dst, l.lbl) WHERE rn = 1),
           |l$i AS (
           |  SELECT l.id, coalesce(v.new_lbl, l.lbl) AS lbl
           |  FROM l${i - 1} l LEFT JOIN v$i v USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH ${ivfTopkCtes("ivf_main", "ivf_knn_probes")},
         |edges0 AS (
         |  SELECT qid AS src, vec_id AS dst FROM ranked WHERE rank <= 3),
         |und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges0 WHERE src <> dst
         |    UNION ALL
         |    SELECT dst AS src, src AS dst FROM edges0 WHERE src <> dst)),
         |nodes AS (SELECT vec_id AS id FROM embeddings),
         |l0 AS (SELECT id, id AS lbl FROM nodes),
         |$rounds
         |SELECT id, lbl AS community FROM l5 ORDER BY id""".stripMargin
    },

    // g3: ordered-wedge triangle closure — i<j<k once each via two
    // equi-joins over the src<dst edge representatives, credit
    // union'd to the three corners, zeros via the node left join.
    "g3_triangle_count" ->
      s"""WITH ${ivfTopkCtes("ivf_main", "ivf_knn_probes")},
         |edges0 AS (
         |  SELECT qid AS src, vec_id AS dst FROM ranked WHERE rank <= 3),
         |und AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges0 WHERE src <> dst
         |    UNION ALL
         |    SELECT dst AS src, src AS dst FROM edges0 WHERE src <> dst)),
         |ord AS (SELECT src, dst FROM und WHERE src < dst),
         |tris AS (
         |  SELECT w.i, w.j, w.k FROM (
         |    SELECT a.src AS i, a.dst AS j, b.dst AS k
         |    FROM ord a JOIN ord b ON a.dst = b.src) w
         |  JOIN ord c ON w.i = c.src AND w.k = c.dst),
         |credit AS (
         |  SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM (
         |    SELECT i AS id FROM tris
         |    UNION ALL SELECT j FROM tris
         |    UNION ALL SELECT k FROM tris)
         |  GROUP BY 1),
         |nodes AS (SELECT vec_id AS id FROM embeddings)
         |SELECT n.id, coalesce(c.triangles, 0) AS triangles
         |FROM nodes n LEFT JOIN credit c ON n.id = c.id
         |ORDER BY n.id""".stripMargin,

    // s12: the top-k oracle's sims CTEs with the τ filter in place of
    // the rank window — same dump, same 5-digit rounding discipline.
    "s12_radius_search" ->
      s"""WITH a AS (SELECT id, vec, cid FROM ${tbl("ivf_main")}),
         |p AS (SELECT qid, qvec, cid FROM ${tbl("ivf_main_probes")}),
         |pairs AS (
         |  SELECT p.qid, a.id AS vec_id, p.qvec AS qe, a.vec AS ve
         |  FROM a JOIN p USING (cid) WHERE a.id <> p.qid),
         |comp AS (
         |  SELECT qid, vec_id,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
         |  FROM pairs),
         |sims AS (SELECT qid, vec_id,
         |  round(dot / (sqrt(nq) * sqrt(nv)), 5) AS sim FROM comp)
         |SELECT qid, vec_id, sim FROM sims WHERE sim >= 0.25
         |ORDER BY qid, sim DESC, vec_id""".stripMargin,
    "s11_filtered_ivf" -> ivfTopkSql("ivf_filtered", "ivf_filtered_probes",
      ", label", " AND a.label < 3"),
    "s2a_ivf_append" -> ivfTopkSql("ivf_append", "ivf_append_probes"),

    // ADC recomputed in SQL from the dumped codes + codebooks: s4 is
    // the full-corpus LUT-sum top-5, s5 adds the exact-cosine re-rank
    // over ADC's top-50, s6 restricts ADC to the probed clusters of
    // the persisted IVF-PQ index then re-ranks. Codebook training
    // stays spec-pinned (PqSpec/IvfPqSpec determinism).
    "s4_pq_topk" ->
      s"""WITH $qqCte,
         |cbl AS (SELECT list(cv ORDER BY sub, code) AS cvs
         |  FROM ${tbl("pq_codebooks")}),
         |scored AS (
         |  SELECT q.qid, c.id AS vec_id,
         |    round(${adcExpr("q.qe", "c.codes", "l.cvs")}, 5) AS score
         |  FROM ${tbl("pq_codes")} c, qq q, cbl l
         |  WHERE c.id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, score,
         |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id)
         |      AS rank
         |  FROM scored)
         |SELECT qid, vec_id, score, rank FROM ranked
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "s5_pq_rerank" ->
      s"""WITH $qqCte,
         |cbl AS (SELECT list(cv ORDER BY sub, code) AS cvs
         |  FROM ${tbl("pq_codebooks")}),
         |scored AS (
         |  SELECT q.qid, c.id AS vec_id,
         |    round(${adcExpr("q.qe", "c.codes", "l.cvs")}, 5) AS score
         |  FROM ${tbl("pq_codes")} c, qq q, cbl l
         |  WHERE c.id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, score,
         |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id)
         |      AS rank
         |  FROM scored),
         |cand AS (SELECT qid, vec_id FROM ranked WHERE rank <= 50),
         |${rerankSql(5)}""".stripMargin,

    "s6_ivfpq_topk" ->
      s"""WITH $qqCte,
         |cbl AS (SELECT list(cv ORDER BY sub, code) AS cvs
         |  FROM ${tbl("ivfpq_codebooks")}),
         |scored AS (
         |  SELECT pr.qid, c.id AS vec_id,
         |    round(${adcExpr("q.qe", "c.codes", "l.cvs")}, 5) AS score
         |  FROM ${tbl("ivfpq_codes")} c
         |  JOIN ${tbl("ivfpq_probes")} pr ON c.cid = pr.cid
         |  JOIN qq q ON q.qid = pr.qid, cbl l
         |  WHERE c.id <> pr.qid),
         |ranked AS (
         |  SELECT qid, vec_id, score,
         |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id)
         |      AS rank
         |  FROM scored),
         |cand AS (SELECT qid, vec_id FROM ranked WHERE rank <= 50),
         |${rerankSql(5)}""".stripMargin,

    // s13: s6's ADC scoring with the τ filter in place of the rank
    // window + rerank — the raw compressed-tier radius primitive.
    "s13_radius_adc" ->
      s"""WITH $qqCte,
         |cbl AS (SELECT list(cv ORDER BY sub, code) AS cvs
         |  FROM ${tbl("ivfpq_codebooks")}),
         |scored AS (
         |  SELECT pr.qid, c.id AS vec_id,
         |    round(${adcExpr("q.qe", "c.codes", "l.cvs")}, 5) AS score
         |  FROM ${tbl("ivfpq_codes")} c
         |  JOIN ${tbl("ivfpq_probes")} pr ON c.cid = pr.cid
         |  JOIN qq q ON q.qid = pr.qid, cbl l
         |  WHERE c.id <> pr.qid)
         |SELECT qid, vec_id, score FROM scored WHERE score >= 0.22
         |ORDER BY qid, score DESC, vec_id""".stripMargin,

    // SemDeDup keep rule over the same dumped assignment: dominated =
    // has ANY lower-id raw-cosine ≥ τ neighbor in its cluster (the
    // zero-norm NaN guard becomes an explicit nv > 0 predicate).
    "s7_semdedup" ->
      s"""WITH a AS (SELECT id, vec, cid FROM ${tbl("ivf_main")}),
         |n AS (SELECT id, cid, vec,
         |  sqrt(list_sum(list_transform(range(1, 65),
         |    i -> CAST(vec[i] AS DOUBLE) * CAST(vec[i] AS DOUBLE)))) AS nv
         |  FROM a),
         |dom AS (
         |  SELECT DISTINCT b.id
         |  FROM n a JOIN n b ON a.cid = b.cid AND a.id < b.id
         |  WHERE a.nv > 0 AND b.nv > 0
         |    AND (list_sum(list_transform(range(1, 65),
         |      i -> CAST(a.vec[i] AS DOUBLE) * CAST(b.vec[i] AS DOUBLE)))
         |      / (a.nv * b.nv)) >= 0.3)
         |SELECT n.id AS vec_id, n.cid AS cid, (d.id IS NULL) AS kept
         |FROM n LEFT JOIN dom d ON n.id = d.id
         |ORDER BY vec_id""".stripMargin,

    "d1_exact_dedup" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,

    "d2_minhash_lsh" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH $shingleCte,
        |sh2 AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mh
        |  FROM sh2, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM bands a JOIN bands b
        |  ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin
    },

    // the star route replayed: buckets above the cap pair every
    // member with the bucket MIN only; bool_and over all producing
    // buckets = the capped_only audit
    "d2c_minhash_capped" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH $shingleCte,
        |sh2 AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mh
        |  FROM sh2, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |bcnt AS (
        |  SELECT b, bucket, list(doc_id ORDER BY doc_id) AS ids,
        |    count(*) AS k
        |  FROM bands GROUP BY 1, 2 HAVING count(*) > 1),
        |pr AS (
        |  SELECT k > 2 AS capped, u.l AS id_a, v.r AS id_b
        |  FROM bcnt,
        |    UNNEST(CASE WHEN k > 2 THEN [ids[1]] ELSE ids END) AS u(l),
        |    UNNEST(ids) AS v(r)
        |  WHERE u.l < v.r)
        |SELECT id_a, id_b, bool_and(capped) AS capped_only
        |FROM pr GROUP BY 1, 2
        |ORDER BY id_a, id_b""".stripMargin
    },

    "d3_ngram_jaccard" ->
      s"""WITH $shingleCte,
        |sh2 AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh2 GROUP BY 1),
        |co AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh2 a JOIN sh2 b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(common::DOUBLE / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
        |FROM co
        |JOIN sizes sa ON id_a = sa.doc_id
        |JOIN sizes sb ON id_b = sb.doc_id
        |WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,

    "d9_containment" ->
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
        |    array_to_string(list_slice(string_split(text, ' '), 1,
        |      greatest(3, len(string_split(text, ' ')) // 8)), ' ') AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
        |sh2 AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh2 GROUP BY 1),
        |flt AS (
        |  SELECT sh2.doc_id, sh2.h FROM sh2
        |  JOIN (SELECT h FROM sh2 GROUP BY h
        |        HAVING count(*) <= 50) cold USING (h)),
        |co AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM flt a JOIN flt b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, common,
        |  round(common::DOUBLE / sa.n_sh, 6) AS c_a,
        |  round(common::DOUBLE / sb.n_sh, 6) AS c_b
        |FROM co
        |JOIN sizes sa ON id_a = sa.doc_id
        |JOIN sizes sb ON id_b = sb.doc_id
        |WHERE common::DOUBLE / sa.n_sh >= 0.4
        |   OR common::DOUBLE / sb.n_sh >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "d3v_jaccard_verify" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH $shingleCte,
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.id_a, c.id_b, count(*) AS common
        |  FROM cand c
        |  JOIN shd a ON c.id_a = a.doc_id
        |  JOIN shd b ON c.id_b = b.doc_id AND a.h = b.h
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(common::DOUBLE / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
        |FROM co
        |JOIN sizes sa ON id_a = sa.doc_id
        |JOIN sizes sb ON id_b = sb.doc_id
        |WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin
    },

    "d10_index_match" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH $shingleCte,
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
        |  FROM bands c JOIN bands n
        |    ON c.b = n.b AND c.bucket = n.bucket
        |  WHERE c.doc_id % 2 = 0 AND n.doc_id % 2 = 1),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.new_id, c.corpus_id, count(*) AS common
        |  FROM cand c
        |  JOIN shd x ON c.new_id = x.doc_id
        |  JOIN shd y ON c.corpus_id = y.doc_id AND x.h = y.h
        |  GROUP BY 1, 2)
        |SELECT new_id, corpus_id,
        |  round(common::DOUBLE / (sn.n_sh + sc.n_sh - common), 6) AS jaccard
        |FROM co
        |JOIN sizes sn ON new_id = sn.doc_id
        |JOIN sizes sc ON corpus_id = sc.doc_id
        |WHERE common::DOUBLE / (sn.n_sh + sc.n_sh - common) >= 0.2
        |ORDER BY new_id, corpus_id""".stripMargin
    },

    // d10a: identical replay to d10 with the corpus predicate
    // covering the ORIGINAL build plus the appended quarter — the
    // engine's append must be indistinguishable from having built
    // the bigger index in one shot
    "d10a_index_append" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH $shingleCte,
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
        |  FROM bands c JOIN bands n
        |    ON c.b = n.b AND c.bucket = n.bucket
        |  WHERE (c.doc_id % 2 = 0 OR c.doc_id % 4 = 1)
        |    AND n.doc_id % 4 = 3),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.new_id, c.corpus_id, count(*) AS common
        |  FROM cand c
        |  JOIN shd x ON c.new_id = x.doc_id
        |  JOIN shd y ON c.corpus_id = y.doc_id AND x.h = y.h
        |  GROUP BY 1, 2)
        |SELECT new_id, corpus_id,
        |  round(common::DOUBLE / (sn.n_sh + sc.n_sh - common), 6) AS jaccard
        |FROM co
        |JOIN sizes sn ON new_id = sn.doc_id
        |JOIN sizes sc ON corpus_id = sc.doc_id
        |WHERE common::DOUBLE / (sn.n_sh + sc.n_sh - common) >= 0.2
        |ORDER BY new_id, corpus_id""".stripMargin
    },

    // the at-rest star route replayed: the boilerplate shard joins
    // the corpus, index buckets above cap 2 propose only their MIN
    // corpus id per colliding batch doc, bool_and over proposing
    // buckets = the capped_only audit
    "d10c_index_match_capped" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH corpus0 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT (SELECT max(doc_id) + 1 FROM documents) + u.k AS doc_id,
        |    (SELECT text FROM documents ORDER BY doc_id LIMIT 1) AS text
        |  FROM UNNEST(range(0, 10)) AS u(k)),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus0),
        |sh AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cb AS (
        |  SELECT b, bucket, count(*) AS k, min(doc_id) AS min_cid
        |  FROM bands WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |cand0 AS (
        |  SELECT n.doc_id AS new_id, c.doc_id AS corpus_id,
        |    false AS capped
        |  FROM bands n
        |  JOIN cb ON n.b = cb.b AND n.bucket = cb.bucket AND cb.k <= 2
        |  JOIN bands c ON c.b = cb.b AND c.bucket = cb.bucket
        |    AND c.doc_id % 2 = 0
        |  WHERE n.doc_id % 2 = 1
        |  UNION ALL
        |  SELECT n.doc_id AS new_id, cb.min_cid AS corpus_id,
        |    true AS capped
        |  FROM bands n
        |  JOIN cb ON n.b = cb.b AND n.bucket = cb.bucket AND cb.k > 2
        |  WHERE n.doc_id % 2 = 1),
        |cand AS (
        |  SELECT new_id, corpus_id, bool_and(capped) AS capped_only
        |  FROM cand0 GROUP BY 1, 2),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.new_id, c.corpus_id, c.capped_only, count(*) AS common
        |  FROM cand c
        |  JOIN shd x ON c.new_id = x.doc_id
        |  JOIN shd y ON c.corpus_id = y.doc_id AND x.h = y.h
        |  GROUP BY 1, 2, 3)
        |SELECT new_id, corpus_id,
        |  round(common::DOUBLE / (sn.n_sh + sc.n_sh - common), 6) AS jaccard,
        |  capped_only
        |FROM co
        |JOIN sizes sn ON new_id = sn.doc_id
        |JOIN sizes sc ON corpus_id = sc.doc_id
        |WHERE common::DOUBLE / (sn.n_sh + sc.n_sh - common) >= 0.2
        |ORDER BY new_id, corpus_id""".stripMargin
    },

    "d4_simhash" ->
      s"""WITH tok AS (
        |  SELECT DISTINCT doc_id, u.t AS tok
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)),
        |h AS (SELECT doc_id, ${dkHash("tok", "0")} AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, r.i AS bit,
        |    CASE WHEN (h >> r.i) & 1 = 1 THEN 1 ELSE -1 END AS w
        |  FROM h, UNNEST(range(0, 60)) AS r(i)),
        |agg AS (SELECT doc_id, bit, sum(w) AS s FROM bits GROUP BY 1, 2)
        |SELECT doc_id AS id,
        |  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
        |    AS simhash
        |FROM agg GROUP BY 1 ORDER BY id""".stripMargin,

    "d5_embed_neardup" ->
      """WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |comp AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(a.vec[i] AS DOUBLE) * CAST(b.vec[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(a.vec[i] AS DOUBLE) * CAST(a.vec[i] AS DOUBLE))) AS na,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(b.vec[i] AS DOUBLE) * CAST(b.vec[i] AS DOUBLE))) AS nb
        |  FROM v a JOIN v b ON a.id < b.id)
        |SELECT id_a, id_b, round(dot / (sqrt(na) * sqrt(nb)), 5) AS sim
        |FROM comp
        |WHERE round(dot / (sqrt(na) * sqrt(nb)), 5) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "d5v_embed_neardup_lsh" ->
      """WITH v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
        |bits AS (
        |  SELECT id, b.i AS i,
        |    CASE WHEN list_sum(list_transform(range(1, 65),
        |      d -> CAST(vec[d] AS DOUBLE) *
        |        (CASE WHEN ('0x'||substr(md5(CAST(d-1 AS VARCHAR)||'#'||CAST(b.i AS VARCHAR)),1,15))::BIGINT % 2 = 0
        |              THEN 1.0 ELSE -1.0 END))) >= 0
        |    THEN (1::BIGINT << b.i) ELSE 0 END AS bit
        |  FROM v, (SELECT unnest(range(0, 6)) AS i) AS b(i)),
        |buck AS (SELECT id, CAST(sum(bit) AS BIGINT) AS bucket FROM bits GROUP BY 1),
        |vb AS (SELECT v.id, v.vec, buck.bucket FROM v JOIN buck USING (id)),
        |comp AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(a.vec[i] AS DOUBLE) * CAST(b.vec[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(a.vec[i] AS DOUBLE) * CAST(a.vec[i] AS DOUBLE))) AS na,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(b.vec[i] AS DOUBLE) * CAST(b.vec[i] AS DOUBLE))) AS nb
        |  FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.id < b.id)
        |SELECT id_a, id_b, round(dot / (sqrt(na) * sqrt(nb)), 5) AS sim
        |FROM comp
        |WHERE round(dot / (sqrt(na) * sqrt(nb)), 5) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "t3_rolling_fp" -> {
      val powRows = graft.functions.TextFunctions.rollPowers(128)
        .zipWithIndex.map { case (p, i) => s"(${i + 1}, $p)" }.mkString(", ")
      s"""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |terms AS (
        |  SELECT doc_id,
        |    ((('0x' || substr(md5(t[u.i]), 1, 8))::BIGINT % 2147483647)
        |      * pw.p) % 4294967291 AS term
        |  FROM toks, UNNEST(range(1, least(len(t), 128) + 1)) AS u(i)
        |  JOIN (VALUES $powRows) AS pw(i, p) ON pw.i = u.i)
        |SELECT doc_id, CAST(sum(term) % 4294967291 AS BIGINT) AS roll_fp
        |FROM terms GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    "s1_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q.qid, e.vec_id, q.qe, e.embedding AS ve
        |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
        |comp AS (
        |  SELECT qid, vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
        |  FROM pairs),
        |sims AS (SELECT qid, vec_id, round(dot / (sqrt(nq) * sqrt(nv)), 5) AS sim FROM comp),
        |ranked AS (
        |  SELECT qid, vec_id, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        |  FROM sims)
        |SELECT qid, vec_id, sim, rank FROM ranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "p12_hard_negatives" ->
      """WITH src AS (SELECT doc_id, source FROM documents),
        |q AS (
        |  SELECT e.vec_id AS qid, e.embedding AS qe, s.source AS qsource
        |  FROM embeddings e JOIN src s ON e.vec_id = s.doc_id
        |  WHERE e.vec_id < 5),
        |pairs AS (
        |  SELECT q.qid, e.vec_id, q.qe, e.embedding AS ve
        |  FROM embeddings e JOIN src s ON e.vec_id = s.doc_id, q
        |  WHERE e.vec_id <> q.qid AND s.source <> q.qsource),
        |comp AS (
        |  SELECT qid, vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
        |  FROM pairs),
        |sims AS (SELECT qid, vec_id, round(dot / (sqrt(nq) * sqrt(nv)), 5) AS sim FROM comp),
        |ranked AS (
        |  SELECT qid, vec_id, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        |  FROM sims)
        |SELECT qid, vec_id, sim, rank FROM ranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "s8_bm25_topk" ->
      s"""WITH $bm25Cte,
        |ranked AS (
        |  SELECT qid, doc_id, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
        |  FROM bm25_scored)
        |SELECT qid, doc_id, score, rank FROM ranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "s9_hybrid_rrf" ->
      s"""WITH $bm25Cte,
        |lex AS (
        |  SELECT qid, doc_id, rank AS lrank FROM (
        |    SELECT qid, doc_id,
        |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
        |    FROM bm25_scored)
        |  WHERE rank <= 50),
        |cq AS (
        |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
        |comp AS (
        |  SELECT cq.qid, e.vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(cq.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(cq.qe[i] AS DOUBLE) * CAST(cq.qe[i] AS DOUBLE))) AS nq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS nv
        |  FROM embeddings e, cq),
        |sem AS (
        |  SELECT qid, vec_id AS doc_id, rank AS srank FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY round(dot / (sqrt(nq) * sqrt(nv)), 5) DESC, vec_id) AS rank
        |    FROM comp)
        |  WHERE rank <= 50),
        |fused AS (
        |  SELECT coalesce(l.qid, s.qid) AS qid,
        |    coalesce(l.doc_id, s.doc_id) AS doc_id,
        |    round(coalesce(1.0 / (60 + l.lrank), 0) +
        |          coalesce(1.0 / (60 + s.srank), 0), 8) AS rrf
        |  FROM lex l FULL JOIN sem s
        |    ON l.qid = s.qid AND l.doc_id = s.doc_id),
        |rranked AS (
        |  SELECT qid, doc_id, rrf,
        |    row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rank
        |  FROM fused)
        |SELECT qid, doc_id, rrf, rank FROM rranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "t1_text_stats" ->
      s"""SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
        |    AS BIGINT) AS n_subwords,
        |  round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
        |    / length(text), 6) AS punct_ratio,
        |  round(len(list_filter(string_split(text, ' '),
        |      tk -> list_contains(['the','a','an','of','and','or','to','in','is','on','for','with'], tk)))::DOUBLE
        |    / len(string_split(text, ' ')), 6) AS stopword_ratio,
        |  $dkQuality AS quality,
        |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p1_corpus_curation" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH $shingleCte,
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.id_a, c.id_b, count(*) AS common
        |  FROM cand c
        |  JOIN shd a ON c.id_a = a.doc_id
        |  JOIN shd b ON c.id_b = b.doc_id AND a.h = b.h
        |  GROUP BY 1, 2),
        |near AS (
        |  SELECT DISTINCT id_b AS doc_id
        |  FROM co
        |  JOIN sizes sa ON id_a = sa.doc_id
        |  JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.2),
        |canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |lgs AS (
        |  SELECT doc_id, m.l AS cand,
        |    len(list_filter(string_split(text, ' '), tk -> list_contains(m.w, tk))) AS score
        |  FROM documents, (VALUES
        |    $dkLangMarkers) AS m(l, w)),
        |lgb AS (
        |  SELECT doc_id, cand, score, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
        |  FROM lgs),
        |lg AS (
        |  SELECT doc_id, CASE WHEN score > 0 THEN cand ELSE 'und' END AS lang_guess
        |  FROM lgb WHERE rn = 1),
        |q AS (
        |  SELECT doc_id, lang,
        |  $dkQuality AS quality
        |  FROM documents)
        |SELECT q.doc_id, q.quality
        |FROM q JOIN lg USING (doc_id)
        |WHERE q.quality >= 0.3 AND lg.lang_guess = q.lang
        |  AND q.doc_id IN (SELECT doc_id FROM canon)
        |  AND q.doc_id NOT IN (SELECT doc_id FROM near)
        |ORDER BY q.doc_id""".stripMargin
    },

    "p3_balanced_sample" ->
      s"""WITH ranked AS (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY ${dkHash("text", "11")}, doc_id) AS BIGINT) AS rn
        |  FROM documents)
        |SELECT lang, doc_id, rn FROM ranked
        |WHERE rn <= 25 ORDER BY lang, rn""".stripMargin,

    "p4_contamination" -> p4OracleSql,

    // p4b computes the SAME report (bloom prefilter + exact confirm ≡
    // exact semi-join — no false negatives, FPs confirmed away), so it
    // shares p4's oracle verbatim.
    "p4b_contamination_bloom" -> p4OracleSql,
    // p4c: the portable-bloom prefilter is also output-invisible
    // (no false negatives + exact confirm) — same oracle as p4/p4b
    "p4c_contamination_portable" -> p4OracleSql,

    "p11_importance_sample" ->
      s"""WITH q AS (
        |  SELECT doc_id,
        |    CAST(floor($dkQuality * 1000000 + 0.5) AS BIGINT) AS q6,
        |    ${dkHash("text", "31")} % 1000000 AS draw
        |  FROM documents)
        |SELECT doc_id, q6, draw FROM q
        |WHERE draw < q6 ORDER BY doc_id""".stripMargin,

    "p10_curriculum" ->
      s"""WITH q AS (
        |  SELECT doc_id, $dkQuality AS quality FROM documents)
        |SELECT doc_id, quality,
        |  CAST(row_number() OVER (ORDER BY quality DESC, doc_id)
        |    AS BIGINT) AS rank,
        |  CAST((row_number() OVER (ORDER BY quality DESC, doc_id) - 1) % 8
        |    AS BIGINT) AS shard
        |FROM q ORDER BY rank""".stripMargin,

    "p9_source_cap" ->
      s"""WITH q AS (
        |  SELECT source, doc_id, $dkQuality AS quality FROM documents),
        |ranked AS (
        |  SELECT source, doc_id, quality,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rn
        |  FROM q)
        |SELECT source, doc_id, quality, rn FROM ranked
        |WHERE rn <= 15 ORDER BY source, rn""".stripMargin,

    "p2_split_assign" ->
      s"""SELECT doc_id,
        |  CASE WHEN ${dkHash("text", "7")} % 100 < 80 THEN 'train'
        |       WHEN ${dkHash("text", "7")} % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t10_heavy_hitters" ->
      """SELECT u.t AS tok, count(*) AS n
        |FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
        |GROUP BY 1 ORDER BY n DESC, tok LIMIT 20""".stripMargin,

    "t5_vocab_stats" ->
      """WITH tok AS (
        |  SELECT DISTINCT lang, u.t AS tok
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)),
        |voc AS (SELECT lang, count(*) AS vocab FROM tok GROUP BY 1),
        |st AS (
        |  SELECT lang, count(*) AS n_docs,
        |    round(avg(len(string_split(text, ' '))), 6) AS avg_tokens
        |  FROM documents GROUP BY 1)
        |SELECT st.lang, st.n_docs, st.avg_tokens, voc.vocab
        |FROM st JOIN voc USING (lang) ORDER BY st.lang""".stripMargin,

    "t4_doc_frequency" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, u.t AS tok
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(t))
        |SELECT tok, count(*) AS doc_freq
        |FROM tok GROUP BY 1 ORDER BY tok""".stripMargin,

    "t2_lang_guess" ->
      s"""WITH sc AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |scores AS (
        |  SELECT doc_id, lang, m.l AS cand,
        |    len(list_filter(t, tk -> list_contains(m.w, tk))) AS score
        |  FROM sc, (VALUES
        |    $dkLangMarkers) AS m(l, w)),
        |best AS (
        |  SELECT doc_id, lang, cand, score, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
        |  FROM scores)
        |SELECT doc_id, lang,
        |  CASE WHEN score > 0 THEN cand ELSE 'und' END AS lang_guess
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "t6_gopher_filter" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
        |      / len(string_split(text, ' ')) AS awl,
        |    (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
        |      / length(text) AS sym,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      tk -> list_contains(['the','a','an','of','and','or','to','in','is','on','for','with'], tk)))
        |      AS BIGINT) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_words,
        |  round(awl, 6) AS avg_word_len,
        |  round(sym, 6) AS symbol_ratio,
        |  n_stop,
        |  (n_words >= 3 AND n_words <= 256) AS ok_words,
        |  (awl >= 2.0 AND awl <= 12.0) AS ok_wordlen,
        |  (sym <= 0.2) AS ok_symbols,
        |  (n_stop >= 1) AS ok_stopwords,
        |  ((n_words >= 3 AND n_words <= 256) AND (awl >= 2.0 AND awl <= 12.0)
        |    AND (sym <= 0.2) AND (n_stop >= 1)) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "d6_boilerplate" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, ${dkHash("array_to_string(toks[i:i+2], ' ')", "0")} AS gh
        |  FROM t, UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
        |  WHERE len(toks) >= 3),
        |pdg AS (SELECT doc_id, gh, count(*) AS occ FROM g GROUP BY 1, 2),
        |gdf AS (SELECT gh, count(*) AS df FROM pdg GROUP BY 1),
        |per AS (
        |  SELECT doc_id,
        |    CAST(sum(occ) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN df >= 5 THEN occ ELSE 0 END) AS BIGINT) AS n_hot
        |  FROM pdg JOIN gdf USING (gh) GROUP BY 1)
        |SELECT doc_id, n_grams, n_hot,
        |  round(n_hot::DOUBLE / n_grams, 6) AS hot_frac,
        |  (n_hot::DOUBLE / n_grams <= 0.1) AS keep
        |FROM per ORDER BY doc_id""".stripMargin,

    "d4v_simhash_neardup" ->
      s"""WITH tok AS (
        |  SELECT DISTINCT doc_id, u.t AS tok
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)),
        |h AS (SELECT doc_id, ${dkHash("tok", "0")} AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, r.i AS bit,
        |    CASE WHEN (h >> r.i) & 1 = 1 THEN 1 ELSE -1 END AS w
        |  FROM h, UNNEST(range(0, 60)) AS r(i)),
        |agg AS (SELECT doc_id, bit, sum(w) AS s FROM bits GROUP BY 1, 2),
        |sh2 AS (
        |  SELECT doc_id AS id,
        |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
        |      AS simhash
        |  FROM agg GROUP BY 1),
        |banded AS (
        |  SELECT id, simhash, b.i AS band,
        |    (simhash >> (b.i * 15)) & 32767 AS chunk
        |  FROM sh2, UNNEST(range(0, 4)) AS b(i)),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.simhash AS sa, b.simhash AS sb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.chunk = b.chunk AND a.id < b.id)
        |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // d4v's banding with the star route on chunk buckets above 32
    // members (the sf corpora's real degenerate-chunk mega-buckets),
    // hamming verify unchanged, capped_only = bool_and over every
    // producing bucket
    "d4vc_simhash_capped" ->
      s"""WITH tok AS (
        |  SELECT DISTINCT doc_id, u.t AS tok
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)),
        |h AS (SELECT doc_id, ${dkHash("tok", "0")} AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, r.i AS bit,
        |    CASE WHEN (h >> r.i) & 1 = 1 THEN 1 ELSE -1 END AS w
        |  FROM h, UNNEST(range(0, 60)) AS r(i)),
        |agg AS (SELECT doc_id, bit, sum(w) AS s FROM bits GROUP BY 1, 2),
        |sh2 AS (
        |  SELECT doc_id AS id,
        |    CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
        |      AS simhash
        |  FROM agg GROUP BY 1),
        |banded AS (
        |  SELECT id, simhash, b.i AS band,
        |    (simhash >> (b.i * 15)) & 32767 AS chunk
        |  FROM sh2, UNNEST(range(0, 4)) AS b(i)),
        |bcnt AS (
        |  SELECT band, chunk, list(id ORDER BY id) AS ids, count(*) AS k
        |  FROM banded GROUP BY 1, 2 HAVING count(*) > 1),
        |pr AS (
        |  SELECT k > 32 AS capped, u.l AS id_a, v.r AS id_b
        |  FROM bcnt,
        |    UNNEST(CASE WHEN k > 32 THEN [ids[1]] ELSE ids END) AS u(l),
        |    UNNEST(ids) AS v(r)
        |  WHERE u.l < v.r),
        |pairs AS (
        |  SELECT id_a, id_b, bool_and(capped) AS capped_only
        |  FROM pr GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b,
        |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming,
        |  p.capped_only
        |FROM pairs p
        |JOIN sh2 x ON p.id_a = x.id
        |JOIN sh2 y ON p.id_b = y.id
        |WHERE bit_count(xor(x.simhash, y.simhash)) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    "d7_dedup_clusters" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH RECURSIVE $shingleCte,
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.id_a, c.id_b, count(*) AS common
        |  FROM cand c
        |  JOIN shd a ON c.id_a = a.doc_id
        |  JOIN shd b ON c.id_b = b.doc_id AND a.h = b.h
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM co
        |  JOIN sizes sa ON id_a = sa.doc_id
        |  JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.2),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id)
        |SELECT id AS doc_id, min(r) AS cluster_id
        |FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // d18: the d8 chain over the copy-augmented corpus, with the
    // exact-dup stage ahead of it and the near-dup stage restricted
    // to exact survivors — the same ladder, replayed end to end.
    "d18_curation_lineage" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        |sh AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
        |ex AS (SELECT doc_id, md5(text) AS h FROM corpus),
        |exc AS (SELECT h, min(doc_id) AS canon_ex FROM ex GROUP BY 1),
        |wex AS (SELECT doc_id, canon_ex FROM ex JOIN exc USING (h)),
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.id_a, c.id_b, count(*) AS common
        |  FROM cand c
        |  JOIN shd a ON c.id_a = a.doc_id
        |  JOIN shd b ON c.id_b = b.doc_id AND a.h = b.h
        |  GROUP BY 1, 2),
        |pairsv AS (
        |  SELECT id_a, id_b
        |  FROM co
        |  JOIN sizes sa ON id_a = sa.doc_id
        |  JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.2),
        |pairss AS (
        |  SELECT id_a, id_b FROM pairsv
        |  WHERE id_a IN (SELECT doc_id FROM wex WHERE doc_id = canon_ex)
        |    AND id_b IN (SELECT doc_id FROM wex WHERE doc_id = canon_ex)),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairss
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM pairss),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
        |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
        |q AS (SELECT doc_id, $dkQuality AS quality FROM corpus),
        |ranked AS (
        |  SELECT cl.cluster_id, cl.doc_id, q.quality,
        |    row_number() OVER (PARTITION BY cl.cluster_id
        |      ORDER BY q.quality DESC, cl.doc_id) AS rn
        |  FROM cl JOIN q USING (doc_id)),
        |canon AS (SELECT cluster_id, doc_id AS canon_nd FROM ranked
        |  WHERE rn = 1),
        |nd AS (
        |  SELECT ranked.doc_id, ranked.cluster_id, canon.canon_nd
        |  FROM ranked JOIN canon USING (cluster_id))
        |SELECT c.doc_id,
        |  CASE WHEN c.doc_id <> wex.canon_ex THEN 'drop_exact'
        |    WHEN nd.canon_nd IS NOT NULL AND c.doc_id <> nd.canon_nd
        |      THEN 'drop_neardup'
        |    WHEN nd.canon_nd IS NOT NULL THEN 'keep_canonical'
        |    ELSE 'keep_unique' END AS status,
        |  CASE WHEN c.doc_id <> wex.canon_ex THEN wex.canon_ex
        |    WHEN nd.canon_nd IS NOT NULL AND c.doc_id <> nd.canon_nd
        |      THEN nd.canon_nd END AS peer_id,
        |  nd.cluster_id
        |FROM corpus c JOIN wex USING (doc_id) LEFT JOIN nd USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin
    },

    "d8_cluster_canonicals" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH RECURSIVE $shingleCte,
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.id_a, c.id_b, count(*) AS common
        |  FROM cand c
        |  JOIN shd a ON c.id_a = a.doc_id
        |  JOIN shd b ON c.id_b = b.doc_id AND a.h = b.h
        |  GROUP BY 1, 2),
        |pairsv AS (
        |  SELECT id_a, id_b
        |  FROM co
        |  JOIN sizes sa ON id_a = sa.doc_id
        |  JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.2),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairsv
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM pairsv),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
        |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
        |q AS (SELECT doc_id, $dkQuality AS quality FROM documents),
        |ranked AS (
        |  SELECT cl.cluster_id, cl.doc_id, q.quality,
        |    row_number() OVER (PARTITION BY cl.cluster_id
        |      ORDER BY q.quality DESC, cl.doc_id) AS rn
        |  FROM cl JOIN q USING (doc_id))
        |SELECT cluster_id, doc_id, quality, (rn = 1) AS canonical
        |FROM ranked ORDER BY cluster_id, doc_id""".stripMargin
    },

    "t9_unigram_surprisal" ->
      s"""WITH tok AS (
        |  SELECT doc_id, u.t AS tok
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)),
        |pd AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |f AS (SELECT tok, count(*) AS n_tok FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS n_total FROM tok),
        |s AS (
        |  SELECT doc_id, cnt,
        |    cnt * CAST(floor(-ln(n_tok::DOUBLE / n_total) * 1000000) AS BIGINT)
        |      AS sv
        |  FROM pd JOIN f USING (tok), n),
        |a AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    CAST(sum(sv) AS BIGINT) AS ssum
        |  FROM s GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  ${microMean6Sql("ssum", "n_tokens")} AS mean_surprisal
        |FROM a ORDER BY doc_id""".stripMargin,

    "p13_dsir_weights" ->
      s"""WITH tok AS (
        |  SELECT doc_id, source,
        |    ${dkHash("u.t", "'13'")} % 4096 AS b
        |  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)),
        |pd AS (
        |  SELECT doc_id, source, b, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY 1, 2, 3),
        |rawb AS (SELECT b, sum(cnt) AS rc FROM pd GROUP BY 1),
        |tgtb AS (
        |  SELECT b, sum(cnt) AS tc FROM pd
        |  WHERE source IN ('src0', 'src1') GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT sum(rc) FROM rawb) AS nr,
        |         (SELECT sum(tc) FROM tgtb) AS nt),
        |lr AS (
        |  SELECT rawb.b, CAST(floor(ln(
        |      ((coalesce(tc, 0) + 1)::DOUBLE / (nt + 4096)) /
        |      ((rc + 1)::DOUBLE / (nr + 4096))) * 1000000) AS BIGINT) AS lr
        |  FROM rawb LEFT JOIN tgtb ON rawb.b = tgtb.b, tot),
        |perdoc AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    CAST(sum(cnt * lr) AS BIGINT) AS w
        |  FROM pd JOIN lr ON pd.b = lr.b GROUP BY 1),
        |nd AS (SELECT count(*) AS nd FROM perdoc),
        |ranked AS (
        |  SELECT doc_id, n_tokens, w,
        |    row_number() OVER (ORDER BY w DESC, doc_id) AS rank
        |  FROM perdoc)
        |SELECT doc_id, n_tokens,
        |  ${microMean6Sql("w", "n_tokens")} AS mean_log_ratio,
        |  rank, rank <= nd.nd // 5 AS selected
        |FROM ranked, nd ORDER BY doc_id""".stripMargin,

    "d11_substring_dedup" ->
      """WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + mx.m, text FROM documents, mx WHERE doc_id % 5 = 0),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM base
        |  WHERE len(string_split(text, ' ')) >= 20),
        |wins AS (
        |  SELECT doc_id, i AS start,
        |    md5(array_to_string(t[i:i+19], ' ')) AS h
        |  FROM toks, UNNEST(range(1, len(t) - 18)) AS u(i)),
        |duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
        |dup AS (SELECT w.doc_id, w.start FROM wins w JOIN duph USING (h)),
        |cover AS (
        |  SELECT doc_id, CAST(count(DISTINCT u.p) AS BIGINT) AS dup_tokens
        |  FROM dup, UNNEST(range(start, start + 20)) AS u(p)
        |  GROUP BY doc_id),
        |cnt AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
        |  FROM dup GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(len(t.t) - 19 AS BIGINT) AS n_windows,
        |  coalesce(c.n_dup_windows, 0) AS n_dup_windows,
        |  coalesce(v.dup_tokens, 0) AS dup_tokens,
        |  round(coalesce(v.dup_tokens, 0)::DOUBLE / len(t.t), 6) AS dup_frac
        |FROM toks t
        |LEFT JOIN cnt c ON t.doc_id = c.doc_id
        |LEFT JOIN cover v ON t.doc_id = v.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "d13_substring_removal" ->
      """WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + mx.m, text FROM documents, mx WHERE doc_id % 5 = 0),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM base),
        |wins AS (
        |  SELECT doc_id, i AS start,
        |    md5(array_to_string(t[i:i+19], ' ')) AS h
        |  FROM toks, UNNEST(range(1, len(t) - 18)) AS u(i)
        |  WHERE len(t) >= 20),
        |duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
        |dup AS (SELECT w.doc_id, w.start FROM wins w JOIN duph USING (h)),
        |cov AS (
        |  SELECT doc_id, list_sort(list(DISTINCT u.p)) AS cov
        |  FROM dup, UNNEST(range(start, start + 20)) AS u(p)
        |  GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(len(t.t) - coalesce(len(c.cov), 0) AS BIGINT) AS n_kept,
        |  coalesce(array_to_string(list_filter(t.t,
        |    (x, i) -> NOT list_contains(coalesce(c.cov, []), i)), ' '), '')
        |    AS clean_text
        |FROM toks t LEFT JOIN cov c USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "t11_bigram_surprisal" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM toks, UNNEST(range(1, len(t))) AS u(i)),
        |pd AS (
        |  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt
        |  FROM bg GROUP BY 1, 2, 3),
        |m12 AS (SELECT w1, w2, sum(cnt) AS n12 FROM pd GROUP BY 1, 2),
        |m1 AS (SELECT w1, sum(n12) AS n1 FROM m12 GROUP BY 1),
        |voc AS (
        |  SELECT count(DISTINCT u.tok) AS v
        |  FROM toks, UNNEST(t) AS u(tok)),
        |s AS (
        |  SELECT pd.doc_id, pd.cnt,
        |    pd.cnt * CAST(floor(-ln((m12.n12 + 1)::DOUBLE / (m1.n1 + voc.v))
        |      * 1000000) AS BIGINT) AS sv
        |  FROM pd
        |  JOIN m12 ON pd.w1 = m12.w1 AND pd.w2 = m12.w2
        |  JOIN m1 ON pd.w1 = m1.w1, voc),
        |a AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |    CAST(sum(sv) AS BIGINT) AS ssum
        |  FROM s GROUP BY 1)
        |SELECT doc_id, n_bigrams,
        |  ${microMean6Sql("ssum", "n_bigrams")} AS mean_surprisal
        |FROM a ORDER BY doc_id""".stripMargin,

    "p14_chunk_windows" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |b AS (
        |  SELECT doc_id, t, len(t) AS n,
        |    ((greatest(1, len(t) - 8) - 1) // 24) + 1 AS nc
        |  FROM toks),
        |c AS (
        |  SELECT doc_id, t, n, nc, u.k AS chunk_id, 1 + 24 * u.k AS st
        |  FROM b, UNNEST(range(0, nc)) AS u(k))
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_tokens,
        |  CAST(nc AS BIGINT) AS n_chunks,
        |  CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(st AS BIGINT) AS tok_start,
        |  CAST(least(32, n - st + 1) AS BIGINT) AS chunk_tokens,
        |  md5(array_to_string(t[st:st+31], ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "t12_bpe_merges" ->
      """WITH w AS (
        |  SELECT u.word FROM (
        |    SELECT string_split(text, ' ') AS t FROM documents),
        |    UNNEST(t) AS u(word)
        |  WHERE len(u.word) >= 2),
        |wc AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w GROUP BY 1),
        |p AS (
        |  SELECT word, freq, word[i:i+1] AS pair
        |  FROM wc, UNNEST(range(1, len(word))) AS u(i))
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS n,
        |  CAST(count(DISTINCT word) AS BIGINT) AS n_words
        |FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 64""".stripMargin,

    "p15_bitext_margin" ->
      """WITH l AS (SELECT doc_id, lang FROM documents),
        |e AS (SELECT em.vec_id, em.embedding, l.lang
        |      FROM embeddings em JOIN l ON em.vec_id = l.doc_id),
        |q AS (SELECT vec_id AS qid, embedding AS qe FROM e WHERE lang = 'en'),
        |c AS (SELECT vec_id, embedding AS ve FROM e WHERE lang = 'de'),
        |comp AS (
        |  SELECT q.qid, c.vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
        |  FROM q, c),
        |sims AS (
        |  SELECT qid, vec_id,
        |    CAST(floor(dot / (sqrt(nq) * sqrt(nv)) * 1000000) AS BIGINT) AS s6
        |  FROM comp),
        |rk AS (
        |  SELECT qid, vec_id, s6,
        |    row_number() OVER (PARTITION BY qid ORDER BY s6 DESC, vec_id) AS rf,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY s6 DESC, qid) AS rb
        |  FROM sims),
        |fa AS (SELECT qid, sum(s6) AS sf FROM rk WHERE rf <= 4 GROUP BY 1),
        |ba AS (SELECT vec_id, sum(s6) AS sb FROM rk WHERE rb <= 4 GROUP BY 1)
        |SELECT r.qid, r.vec_id,
        |  round(r.s6 / 1000000.0, 6) AS sim,
        |  round((r.s6 * 8)::DOUBLE / (f.sf + b.sb), 6) AS margin,
        |  round((r.s6 * 8)::DOUBLE / (f.sf + b.sb), 6) >= 1.05 AS accepted
        |FROM rk r JOIN fa f ON r.qid = f.qid JOIN ba b ON r.vec_id = b.vec_id
        |WHERE r.rf = 1 AND f.sf + b.sb > 0
        |ORDER BY r.qid""".stripMargin,

    "d12_fuzzy_pairs" ->
      """WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |base AS (
        |  SELECT doc_id, array_to_string(t[1:8], ' ') AS title FROM t0
        |  UNION ALL
        |  SELECT doc_id + mx.m,
        |    array_to_string(t[1:4] || ['MUTANT'] || t[6:8], ' ')
        |  FROM t0, mx WHERE doc_id % 10 = 0),
        |tb AS (
        |  SELECT doc_id, title,
        |    array_to_string(string_split(title, ' ')[1:3], ' ') AS blk
        |  FROM base),
        |ok AS (SELECT blk FROM tb GROUP BY blk HAVING count(*) <= 100),
        |f AS (SELECT tb.* FROM tb JOIN ok USING (blk))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
        |FROM f a JOIN f b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.title, b.title) <= 10
        |ORDER BY id_a, id_b""".stripMargin,

    "p8_pretrain_pipeline" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH RECURSIVE $shingleCte,
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.id_a, c.id_b, count(*) AS common
        |  FROM cand c
        |  JOIN shd a ON c.id_a = a.doc_id
        |  JOIN shd b ON c.id_b = b.doc_id AND a.h = b.h
        |  GROUP BY 1, 2),
        |pairsv AS (
        |  SELECT id_a, id_b
        |  FROM co
        |  JOIN sizes sa ON id_a = sa.doc_id
        |  JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.2),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairsv
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM pairsv),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
        |near AS (
        |  SELECT id AS doc_id FROM (
        |    SELECT id, min(r) AS m FROM reach GROUP BY 1)
        |  WHERE id <> m),
        |canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |gf AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS nw,
        |    (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
        |      / len(string_split(text, ' ')) AS awl,
        |    (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
        |      / length(text) AS sym,
        |    len(list_filter(string_split(text, ' '),
        |      tk -> list_contains(['the','a','an','of','and','or','to','in','is','on','for','with'], tk)))
        |      AS nstop
        |  FROM documents),
        |gk AS (
        |  SELECT doc_id FROM gf
        |  WHERE nw BETWEEN 3 AND 256 AND awl >= 2.0 AND awl <= 12.0
        |    AND sym <= 0.2 AND nstop >= 1),
        |tt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |rtok AS (SELECT doc_id, u.t AS tok FROM tt, UNNEST(tk) AS u(t)),
        |rpt AS (SELECT doc_id, tok, count(*) AS cnt FROM rtok GROUP BY 1, 2),
        |ra1 AS (SELECT doc_id, sum(cnt) AS n, count(*) AS nd, max(cnt) AS tc
        |  FROM rpt GROUP BY 1),
        |rbg AS (
        |  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS b
        |  FROM tt, UNNEST(range(1, len(tk))) AS u(i) WHERE len(tk) >= 2),
        |rpb AS (SELECT doc_id, b, count(*) AS cnt FROM rbg GROUP BY 1, 2),
        |ra2 AS (SELECT doc_id, sum(cnt) AS nb, max(cnt) AS tb FROM rpb GROUP BY 1),
        |rk AS (
        |  SELECT ra1.doc_id FROM ra1 LEFT JOIN ra2 ON ra1.doc_id = ra2.doc_id
        |  WHERE round(1.0 - nd::DOUBLE / n, 6) <= 0.55
        |    AND round(tc::DOUBLE / n, 6) <= 0.10
        |    AND coalesce(round(tb::DOUBLE / nb, 6), 0.0) <= 0.08),
        |surv AS (
        |  SELECT d.doc_id, d.lang, d.text FROM documents d
        |  JOIN gk USING (doc_id) JOIN rk USING (doc_id)
        |  WHERE d.doc_id IN (SELECT doc_id FROM canon)
        |    AND d.doc_id NOT IN (SELECT doc_id FROM near)),
        |w(lang, wt) AS (VALUES ('en', 4), ('de', 3), ('fr', 2), ('es', 1)),
        |cnts AS (SELECT lang, count(*) AS n FROM surv GROUP BY 1),
        |jj AS (SELECT cnts.lang, n, wt FROM cnts JOIN w USING (lang)),
        |scl AS (SELECT min(n * 1000000 // wt) AS sc FROM jj),
        |th AS (SELECT lang, (wt * sc) // n AS thresh FROM jj, scl),
        |mixed AS (
        |  SELECT surv.doc_id, surv.lang, surv.text
        |  FROM surv JOIN th USING (lang)
        |  WHERE ${dkHash("text", "23")} % 1000000 < thresh),
        |pk AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ${dkHash("CAST(doc_id AS VARCHAR)", "13")} AS k
        |  FROM mixed),
        |pb2 AS (SELECT doc_id, lang, n_tokens, k, k % 8 AS bk FROM pk),
        |pc AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY bk, k, doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS "offset"
        |  FROM pb2)
        |SELECT doc_id, lang, n_tokens, "offset",
        |  CAST("offset" // 512 AS BIGINT) AS seq_first,
        |  CAST(("offset" + n_tokens - 1) // 512 AS BIGINT) AS seq_last
        |FROM pc ORDER BY doc_id""".stripMargin
    },

    "p7_ngram_overlap" ->
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
        |    text FROM documents
        |  WHERE doc_id % 5 = 0),
        |sp AS (
        |  SELECT doc_id, text,
        |    CASE WHEN ${dkHash("CAST(doc_id AS VARCHAR)", "7")} % 100 < 80 THEN 'train'
        |         WHEN ${dkHash("CAST(doc_id AS VARCHAR)", "7")} % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM corpus),
        |toks AS (SELECT doc_id, split, string_split(text, ' ') AS t FROM sp),
        |g AS (
        |  SELECT DISTINCT doc_id, split,
        |    ${dkHash("t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]", "0")} AS h
        |  FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i)
        |  WHERE len(t) >= 5),
        |tr AS (SELECT DISTINCT h FROM g WHERE split = 'train'),
        |te AS (
        |  SELECT doc_id, count(*) AS n_grams,
        |    CAST(sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hit
        |  FROM g LEFT JOIN tr USING (h)
        |  WHERE split = 'test' GROUP BY 1)
        |SELECT doc_id, n_grams, n_hit,
        |  round(n_hit::DOUBLE / n_grams, 6) AS overlap_frac,
        |  (round(n_hit::DOUBLE / n_grams, 6) >= 0.5) AS contaminated
        |FROM te ORDER BY doc_id""".stripMargin,

    "p5_pack_sequences" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ${dkHash("CAST(doc_id AS VARCHAR)", "13")} AS k
        |  FROM documents),
        |b AS (SELECT doc_id, n_tokens, k, k % 8 AS bk FROM d),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY bk, k, doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS "offset"
        |  FROM b)
        |SELECT doc_id, n_tokens, "offset",
        |  CAST("offset" // 512 AS BIGINT) AS seq_first,
        |  CAST(("offset" + n_tokens - 1) // 512 AS BIGINT) AS seq_last,
        |  CAST(("offset" + n_tokens - 1) // 512 - "offset" // 512 + 1
        |    AS BIGINT) AS n_seqs
        |FROM c ORDER BY doc_id""".stripMargin,

    "p21_bpe_pack" ->
      s"""$bpeReplaySql,
        |d AS (
        |  SELECT doc_id, CAST(sum(cnt * ns) AS BIGINT) AS n_tokens,
        |    ${dkHash("CAST(doc_id AS VARCHAR)", "13")} AS k
        |  FROM tokc JOIN seg USING (word) GROUP BY doc_id),
        |b AS (SELECT doc_id, n_tokens, k, k % 8 AS bk FROM d),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY bk, k, doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS "offset"
        |  FROM b)
        |SELECT doc_id, n_tokens, "offset",
        |  CAST("offset" // 512 AS BIGINT) AS seq_first,
        |  CAST(("offset" + n_tokens - 1) // 512 AS BIGINT) AS seq_last,
        |  CAST(("offset" + n_tokens - 1) // 512 - "offset" // 512 + 1
        |    AS BIGINT) AS n_seqs
        |FROM c ORDER BY doc_id""".stripMargin,

    "p5b_pack_manifest" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ${dkHash("CAST(doc_id AS VARCHAR)", "13")} AS k
        |  FROM documents),
        |b AS (SELECT doc_id, n_tokens, k, k % 8 AS bk FROM d),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY bk, k, doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS "offset"
        |  FROM b),
        |spans AS (
        |  SELECT doc_id,
        |    CAST("offset" // 512 AS BIGINT) AS sf,
        |    CAST(("offset" + n_tokens - 1) // 512 AS BIGINT) AS sl
        |  FROM c),
        |member AS (
        |  SELECT doc_id, CAST(u.s AS BIGINT) AS seq_id
        |  FROM spans, UNNEST(generate_series(sf, sl)) AS u(s))
        |SELECT seq_id, count(*) AS n_docs,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM member GROUP BY 1 ORDER BY seq_id""".stripMargin,

    "t7_pii_scrub" ->
      """WITH d AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN ' contact User' || CAST(doc_id AS VARCHAR) || '@Example.COM'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0
        |      THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
        |      ELSE '' END AS text
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |    CAST(len(regexp_extract_all(text,
        |      '(?i)\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ips,
        |    md5(regexp_replace(regexp_replace(text,
        |      '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '(?i)\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g')) AS clean_hash
        |  FROM d)
        |SELECT doc_id, n_emails, n_ips, clean_hash,
        |  (n_emails = 0 AND n_ips = 0) AS pii_free
        |FROM r ORDER BY doc_id""".stripMargin,

    "t8_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, u.t AS tok FROM t, UNNEST(toks) AS u(t)),
        |pt AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |a1 AS (
        |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct
        |  FROM pt GROUP BY 1),
        |tp AS (
        |  SELECT doc_id, tok AS top_tok, cnt AS top_cnt,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rn
        |  FROM pt),
        |bg AS (
        |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS b
        |  FROM t, UNNEST(range(1, len(toks))) AS u(i)
        |  WHERE len(toks) >= 2),
        |pb AS (SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |a2 AS (SELECT doc_id, sum(cnt) AS n_bg, max(cnt) AS top_bg
        |  FROM pb GROUP BY 1),
        |f AS (
        |  SELECT a1.doc_id, a1.n_tokens, a1.n_distinct,
        |    round(1.0 - n_distinct::DOUBLE / n_tokens, 6) AS dup_frac,
        |    tp.top_tok,
        |    round(top_cnt::DOUBLE / n_tokens, 6) AS top_tok_frac,
        |    coalesce(round(top_bg::DOUBLE / n_bg, 6), 0.0) AS top_bigram_frac
        |  FROM a1 JOIN tp ON a1.doc_id = tp.doc_id AND tp.rn = 1
        |  LEFT JOIN a2 ON a1.doc_id = a2.doc_id)
        |SELECT doc_id, n_tokens, n_distinct, dup_frac, top_tok,
        |  top_tok_frac, top_bigram_frac,
        |  (dup_frac <= 0.55 AND top_tok_frac <= 0.10
        |    AND top_bigram_frac <= 0.08) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "p6_mixture_sample" ->
      s"""WITH w(lang, wt) AS (VALUES ('en', 4), ('de', 3), ('fr', 2), ('es', 1)),
        |c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |j AS (SELECT c.lang, n, wt FROM c JOIN w USING (lang)),
        |s AS (SELECT min(n * 1000000 // wt) AS sc FROM j),
        |t AS (SELECT lang, (wt * sc) // n AS thresh FROM j, s)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN t USING (lang)
        |WHERE ${dkHash("text", "23")} % 1000000 < thresh
        |ORDER BY doc_id""".stripMargin,

    "s3_quantized_topk" ->
      """WITH s AS (
        |  SELECT u.i AS dim, max(abs(CAST(embedding[u.i] AS DOUBLE))) AS mx
        |  FROM embeddings, UNNEST(generate_series(1, 64)) AS u(i)
        |  GROUP BY 1),
        |sc AS (SELECT list(mx ORDER BY dim) AS scales FROM s),
        |quant AS (
        |  SELECT vec_id, list_transform(generate_series(1, 64),
        |    i -> CASE WHEN sc.scales[i] = 0 THEN 0
        |      ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) / sc.scales[i] * 127) AS BIGINT) END) AS qv
        |  FROM embeddings, sc),
        |q AS (SELECT vec_id AS qid, qv AS qq FROM quant WHERE vec_id < 10),
        |dots AS (
        |  SELECT q.qid, v.vec_id,
        |    list_sum(list_transform(range(1, 65), i -> q.qq[i] * v.qv[i])) AS qdot
        |  FROM quant v, q WHERE v.vec_id <> q.qid),
        |ranked AS (
        |  SELECT qid, vec_id, CAST(qdot AS BIGINT) AS qdot,
        |    row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, vec_id) AS rank
        |  FROM dots)
        |SELECT qid, vec_id, qdot, rank FROM ranked
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "p16_temperature_mix" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |m AS (SELECT min(n) AS nmin FROM c),
        |t AS (SELECT lang,
        |  CAST(floor(1000000.0 * sqrt(CAST(nmin AS DOUBLE) / n)) AS BIGINT) AS thresh
        |  FROM c, m)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN t USING (lang)
        |WHERE ${dkHash("text", "31")} % 1000000 < thresh
        |ORDER BY doc_id""".stripMargin,

    "p17_leakage_safe_split" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      val rootHash =
        dkHash("CAST(coalesce(cl.group_id, d.doc_id) AS VARCHAR)", "13")
      s"""WITH RECURSIVE $shingleCte,
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.id_a, c.id_b, count(*) AS common
        |  FROM cand c
        |  JOIN shd a ON c.id_a = a.doc_id
        |  JOIN shd b ON c.id_b = b.doc_id AND a.h = b.h
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM co
        |  JOIN sizes sa ON id_a = sa.doc_id
        |  JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.2),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM pairs),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.id),
        |cl AS (SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(cl.group_id, d.doc_id) AS group_id,
        |  CASE WHEN $rootHash % 100 < 80 THEN 'train'
        |       WHEN $rootHash % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents d LEFT JOIN cl USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin
    },

    "s10_mmr_rerank" -> {
      // the marginal score, recomputed per candidate row `v` against
      // the selected list `r.sel` (λ=0.5; sims are the 5-digit-rounded
      // tables, so the doubles are bit-identical to Spark's)
      def mscore(v: String) =
        s"(0.5 * $v.sim - 0.5 * list_max(list_transform(r.sel, " +
          s"s -> $v.psl[list_position($v.idl, s)])))"
      s"""WITH RECURSIVE q AS (
        |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |pairs0 AS (
        |  SELECT q.qid, e.vec_id, q.qe, e.embedding AS ve
        |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
        |comp AS (
        |  SELECT qid, vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
        |  FROM pairs0),
        |sims AS (SELECT qid, vec_id, round(dot / (sqrt(nq) * sqrt(nv)), 5) AS sim FROM comp),
        |cand AS (
        |  SELECT qid, vec_id, sim FROM (
        |    SELECT qid, vec_id, sim,
        |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        |    FROM sims) WHERE rank <= 10),
        |ce AS (
        |  SELECT c.qid, c.vec_id, c.sim, e.embedding AS ve
        |  FROM cand c JOIN embeddings e USING (vec_id)),
        |pp AS (
        |  SELECT a.qid, a.vec_id AS ia, b.vec_id AS ib,
        |    round(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(a.ve[i] AS DOUBLE) * CAST(b.ve[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |          i -> CAST(a.ve[i] AS DOUBLE) * CAST(a.ve[i] AS DOUBLE))))
        |        * sqrt(list_sum(list_transform(range(1, 65),
        |          i -> CAST(b.ve[i] AS DOUBLE) * CAST(b.ve[i] AS DOUBLE)))))
        |      , 5) AS ps
        |  FROM ce a JOIN ce b ON a.qid = b.qid),
        |ids AS (SELECT qid, list(vec_id ORDER BY vec_id) AS idl FROM cand GROUP BY qid),
        |pm AS (SELECT qid, ia AS vec_id, list(ps ORDER BY ib) AS psl FROM pp GROUP BY qid, ia),
        |cc AS (
        |  SELECT c.qid, c.vec_id, c.sim, pm.psl, ids.idl
        |  FROM cand c JOIN pm USING (qid, vec_id) JOIN ids USING (qid)),
        |rec(qid, it, sel, pick, score) AS (
        |  SELECT qid, 1, [vec_id], vec_id, sim FROM (
        |    SELECT qid, vec_id, sim,
        |      row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
        |    FROM cand) WHERE rn = 1
        |  UNION ALL
        |  SELECT r.qid, r.it + 1, list_append(r.sel, c.vec_id), c.vec_id,
        |    ${mscore("c")}
        |  FROM rec r JOIN cc c
        |    ON c.qid = r.qid AND NOT list_contains(r.sel, c.vec_id)
        |  WHERE r.it < 5 AND NOT EXISTS (
        |    SELECT 1 FROM cc c2
        |    WHERE c2.qid = r.qid AND NOT list_contains(r.sel, c2.vec_id)
        |      AND (${mscore("c2")} > ${mscore("c")}
        |        OR (${mscore("c2")} = ${mscore("c")}
        |          AND c2.vec_id < c.vec_id))))
        |SELECT qid, pick AS vec_id, CAST(it AS BIGINT) AS mmr_rank,
        |  round(score, 6) AS mmr_score
        |FROM rec ORDER BY qid, mmr_rank""".stripMargin
    },

    "p20_linear_probe" ->
      s"""WITH wl AS (
        |  SELECT list(w ORDER BY i) AS wv
        |  FROM ${tbl("probe_weights")} WHERE i < 64),
        |wb AS (SELECT w AS b FROM ${tbl("probe_weights")} WHERE i = 64),
        |sc AS (
        |  SELECT vec_id, CAST(label % 2 AS BIGINT) AS target,
        |    CAST(floor((list_sum(list_transform(range(1, 65),
        |      j -> CAST(embedding[j] AS DOUBLE) * wv[j])) + b) * 1000000)
        |      AS BIGINT) AS score_fp
        |  FROM embeddings, wl, wb)
        |SELECT vec_id, target, score_fp,
        |  CAST(score_fp >= 0 AS BIGINT) AS pred,
        |  CAST(score_fp >= 0 AS BIGINT) = target AS correct
        |FROM sc ORDER BY vec_id""".stripMargin,

    "t13_nb_langid" ->
      """WITH base AS (SELECT doc_id AS id, lang AS label, text FROM documents),
        |tok AS (
        |  SELECT id, label, u.t AS tok
        |  FROM base, UNNEST(string_split(text, ' ')) AS u(t)),
        |pd AS (SELECT id, label, tok, count(*) AS cnt FROM tok GROUP BY 1, 2, 3),
        |ctk AS (SELECT label, tok, CAST(sum(cnt) AS BIGINT) AS ct
        |  FROM pd GROUP BY 1, 2),
        |ctt AS (SELECT label, CAST(sum(ct) AS BIGINT) AS tot FROM ctk GROUP BY 1),
        |voc AS (SELECT count(DISTINCT tok) AS v FROM ctk),
        |pri AS (
        |  SELECT label,
        |    CAST(floor(ln(nd::DOUBLE / nd_total) * 1000000) AS BIGINT)
        |      AS prior_fp
        |  FROM (SELECT label, count(*) AS nd FROM base GROUP BY 1),
        |    (SELECT count(*) AS nd_total FROM base)),
        |ls AS (SELECT label, tot, v,
        |  CAST(floor(ln(1.0 / (tot + v)) * 1000000) AS BIGINT) AS default_fp
        |  FROM ctt, voc),
        |sc AS (
        |  SELECT p.id, l.label,
        |    CAST(sum(p.cnt * coalesce(
        |      CAST(floor(ln((c.ct + 1)::DOUBLE / (l.tot + l.v)) * 1000000)
        |        AS BIGINT),
        |      l.default_fp)) AS BIGINT) AS llsum
        |  FROM (SELECT id, tok, cnt FROM pd) p
        |  CROSS JOIN ls l
        |  LEFT JOIN ctk c ON c.label = l.label AND c.tok = p.tok
        |  GROUP BY 1, 2),
        |fin AS (
        |  SELECT sc.id, sc.label, sc.llsum + pri.prior_fp AS score_fp
        |  FROM sc JOIN pri USING (label)),
        |pred AS (
        |  SELECT id, label AS pred_lang, score_fp FROM (
        |    SELECT id, label, score_fp,
        |      row_number() OVER (PARTITION BY id ORDER BY score_fp DESC, label)
        |        AS rn
        |    FROM fin) WHERE rn = 1)
        |SELECT b.id AS doc_id, b.label AS lang, p.pred_lang,
        |  b.label = p.pred_lang AS correct, p.score_fp
        |FROM base b JOIN pred p ON b.id = p.id
        |ORDER BY doc_id""".stripMargin,

    "d14_chunk_dedup" ->
      """WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + mx.m, text FROM documents, mx WHERE doc_id % 5 = 0),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM base),
        |b AS (
        |  SELECT doc_id, t, len(t) AS n,
        |    ((greatest(1, len(t) - 8) - 1) // 24) + 1 AS nc
        |  FROM toks),
        |c AS (
        |  SELECT doc_id, 1 + 24 * u.k AS st,
        |    md5(array_to_string(t[(1 + 24 * u.k):(1 + 24 * u.k) + 31], ' '))
        |      AS chunk_hash
        |  FROM b, UNNEST(range(0, nc)) AS u(k))
        |SELECT chunk_hash, count(*) AS n_copies,
        |  count(DISTINCT doc_id) AS n_docs,
        |  min(doc_id) AS canonical_doc,
        |  CAST(min(st) AS BIGINT) AS min_tok_start
        |FROM c GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY chunk_hash""".stripMargin,

    "t16_tfidf_keywords" ->
      """WITH pd AS (
        |  SELECT doc_id, u.term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |    UNNEST(t) AS u(term)
        |  GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM pd GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT pd.doc_id, pd.term,
        |    pd.tf * CAST(floor(ln(n.n_docs::DOUBLE / df.df) * 1000000)
        |      AS BIGINT) AS score_fp
        |  FROM pd JOIN df USING (term), n),
        |ranked AS (
        |  SELECT doc_id, term, score_fp,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score_fp DESC, term) AS rank
        |  FROM sc)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score_fp
        |FROM ranked WHERE rank <= 5
        |ORDER BY doc_id, rank""".stripMargin,

    "p22_span_decontamination" ->
      s"""WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + mx.m, text FROM documents, mx WHERE doc_id % 5 = 0),
        |sp AS (
        |  SELECT doc_id, text,
        |    CASE WHEN ${dkHash("CAST(doc_id AS VARCHAR)", "7")} % 100 < 80
        |      THEN 'train'
        |      WHEN ${dkHash("CAST(doc_id AS VARCHAR)", "7")} % 100 < 90
        |      THEN 'val' ELSE 'test' END AS split
        |  FROM base),
        |toks AS (SELECT doc_id, split, string_split(text, ' ') AS t FROM sp),
        |wtoks AS (SELECT doc_id, split, t FROM toks WHERE len(t) >= 20),
        |wins AS (
        |  SELECT doc_id, split, i AS start,
        |    md5(array_to_string(t[i:i+19], ' ')) AS h
        |  FROM wtoks, UNNEST(range(1, len(t) - 18)) AS u(i)),
        |trainh AS (SELECT DISTINCT h FROM wins WHERE split = 'train'),
        |cov AS (
        |  SELECT w.doc_id, count(DISTINCT u.p) AS leaked
        |  FROM wins w JOIN trainh USING (h),
        |    UNNEST(range(w.start, w.start + 20)) AS u(p)
        |  WHERE w.split = 'test' GROUP BY 1),
        |td AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens
        |  FROM toks WHERE split = 'test')
        |SELECT td.doc_id, n_tokens,
        |  CAST(coalesce(cov.leaked, 0) AS BIGINT) AS leaked_tokens,
        |  round(coalesce(cov.leaked, 0)::DOUBLE / n_tokens, 6) AS leak_frac
        |FROM td LEFT JOIN cov USING (doc_id) ORDER BY doc_id""".stripMargin,

    "t14_unigram_drift" ->
      """WITH tok AS (
        |  SELECT slice, u.tok FROM (
        |    SELECT source AS slice, string_split(text, ' ') AS t
        |    FROM documents), UNNEST(t) AS u(tok)),
        |st AS (
        |  SELECT slice, tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY 1, 2),
        |stot AS (SELECT slice, CAST(sum(cnt) AS BIGINT) AS tot
        |  FROM st GROUP BY 1),
        |gtok AS (SELECT tok, CAST(sum(cnt) AS BIGINT) AS gcnt
        |  FROM st GROUP BY 1),
        |gtot AS (SELECT CAST(sum(tot) AS BIGINT) AS gtot FROM stot),
        |terms AS (
        |  SELECT st.slice, stot.tot,
        |    st.cnt * CAST(floor(ln(
        |      (st.cnt::DOUBLE * gtot.gtot::DOUBLE) /
        |      (gtok.gcnt::DOUBLE * stot.tot::DOUBLE)) * 1000000) AS BIGINT)
        |      AS term_fp
        |  FROM st JOIN gtok USING (tok) JOIN stot USING (slice), gtot)
        |SELECT slice AS source, tot AS n_tokens,
        |  round(CAST(sum(term_fp) AS BIGINT)::DOUBLE / 1000000 / tot, 6)
        |    AS kl_nats
        |FROM terms GROUP BY 1, tot ORDER BY 1""".stripMargin,

    // The merge REPLAY is the oracle's own: a recursive CTE applies
    // the dumped merge table rank by rank to the corpus vocabulary,
    // each step a left-to-right non-overlapping fold (list_reduce
    // over a space-joined encoding; "last token == a and next == b"
    // collapses to ab). Only the learned merges come from the dump —
    // the segmentation under test is recomputed from scratch.
    "t15_bpe_encode" ->
      s"""$bpeReplaySql
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
        |  CAST(sum(cnt * ns) AS BIGINT) AS n_bpe_tokens,
        |  round(sum(cnt * ns)::DOUBLE / sum(cnt), 6) AS tokens_per_word
        |FROM tokc JOIN seg USING (word)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "p19_token_budget" ->
      s"""WITH q AS (
        |  SELECT source, doc_id, $dkQuality AS quality,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, quality, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM q)
        |SELECT source, doc_id, quality, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= 600
        |ORDER BY source, cum_tokens""".stripMargin,

    "t17_vocab_growth" ->
      """WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |dd AS (
        |  SELECT (doc_id * 10) // m + 1 AS decile, count(*) AS docs_new
        |  FROM documents, mx GROUP BY 1),
        |fo AS (
        |  SELECT u.tok, min(doc_id) AS first_doc
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |    UNNEST(t) AS u(tok)
        |  WHERE length(u.tok) > 0
        |  GROUP BY 1),
        |vd AS (
        |  SELECT (first_doc * 10) // m + 1 AS decile, count(*) AS vocab_new
        |  FROM fo, mx GROUP BY 1),
        |sp AS (SELECT u.d AS decile FROM UNNEST(range(1, 11)) AS u(d)),
        |j AS (
        |  SELECT sp.decile,
        |    coalesce(dd.docs_new, 0) AS docs_new,
        |    coalesce(vd.vocab_new, 0) AS vocab_new
        |  FROM sp LEFT JOIN dd USING (decile) LEFT JOIN vd USING (decile))
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(sum(docs_new) OVER (ORDER BY decile
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS docs_seen,
        |  CAST(vocab_new AS BIGINT) AS vocab_new,
        |  CAST(sum(vocab_new) OVER (ORDER BY decile
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
        |FROM j ORDER BY decile""".stripMargin,

    // t29: the trigram spectrum, smoothed counts and unseen mass
    // rebuilt from scratch — (lang, gram-hash) counts →
    // count-of-counts → the exact r→r+1 self-join and integer
    // fixed-point divisions (// == div on positive operands); the
    // gram hash is the same md5-derived 60-bit portable hash
    // (seed 3 = the gram order, the t26 convention).
    "t29_good_turing" ->
      s"""WITH toks AS (
        |  SELECT lang, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT lang, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
        |tc AS (
        |  SELECT lang, ${dkHash("s", "3")} AS g,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM sh GROUP BY 1, 2),
        |spec AS (
        |  SELECT lang, c AS r, CAST(count(*) AS BIGINT) AS n_types
        |  FROM tc GROUP BY 1, 2),
        |tot AS (
        |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens
        |  FROM tc GROUP BY 1),
        |p0 AS (
        |  SELECT s.lang,
        |    CAST((1000000 * s.n_types) // t.n_tokens AS BIGINT) AS p0_ppm
        |  FROM spec s JOIN tot t USING (lang) WHERE s.r = 1)
        |SELECT a.lang, a.r, a.n_types,
        |  CAST((1000000 * (a.r + 1) * coalesce(b.n_types, 0)) // a.n_types
        |    AS BIGINT) AS r_star_micro,
        |  p.p0_ppm
        |FROM spec a
        |LEFT JOIN spec b ON a.lang = b.lang AND b.r = a.r + 1
        |LEFT JOIN p0 p ON a.lang = p.lang
        |WHERE a.r <= 8
        |ORDER BY a.lang, a.r""".stripMargin,

    // t30: the same windowed distinct-count fold over DuckDB's list
    // machinery — list_slice is 1-based inclusive [begin, end], so
    // (i+1, i+25) mirrors Spark's slice(toks, i+1, 25).
    "t30_mattr" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> length(x) > 0)
        |      AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(toks) >= 25 THEN
        |      CAST(list_sum(list_transform(range(0, len(toks) - 24),
        |        i -> len(list_distinct(list_slice(toks, i + 1, i + 25)))))
        |        AS BIGINT) END AS sum_distinct
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CASE WHEN n_tokens >= 25 THEN n_tokens - 24 END AS n_windows,
        |  CASE WHEN n_tokens >= 25 THEN
        |    (1000000 * sum_distinct) // (25 * (n_tokens - 24)) END
        |    AS mattr_ppm
        |FROM m ORDER BY doc_id""".stripMargin,

    // t31: the same trigram inventory (t29's shingle construction and
    // hash seed), decile mapping in the same closed form, cumulative
    // prefix sums over the 10-row frame.
    "t31_heaps_growth" ->
      s"""WITH nd AS (SELECT max(doc_id) + 1 AS nd FROM documents),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
        |g AS (SELECT doc_id, ${dkHash("s", "3")} AS g FROM sh),
        |dv AS (
        |  SELECT (10 * (first_doc + 1) + n.nd - 1) // n.nd AS k,
        |    count(*) AS dv
        |  FROM (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1), nd n
        |  GROUP BY 1),
        |dc AS (
        |  SELECT (10 * (doc_id + 1) + n.nd - 1) // n.nd AS k,
        |    count(*) AS dc
        |  FROM g, nd n GROUP BY 1),
        |ks AS (
        |  SELECT u.k AS k, (n.nd * u.k) // 10 - 1 AS max_doc_id
        |  FROM UNNEST(range(1, 11)) AS u(k), nd n),
        |cum AS (
        |  SELECT k, max_doc_id,
        |    sum(coalesce(dc.dc, 0)) OVER (ORDER BY k) AS n_grams,
        |    sum(coalesce(dv.dv, 0)) OVER (ORDER BY k) AS vocab
        |  FROM ks LEFT JOIN dv USING (k) LEFT JOIN dc USING (k))
        |SELECT CAST(k AS BIGINT) AS k,
        |  CAST(max_doc_id AS BIGINT) AS max_doc_id,
        |  CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(vocab AS BIGINT) AS vocab,
        |  CASE WHEN n_grams > 0 THEN
        |    CAST((1000000 * vocab) // n_grams AS BIGINT) END AS ttr_ppm
        |FROM cum ORDER BY k""".stripMargin,

    // t32: same gram construction/hash; novelty = first_doc == doc_id.
    "t32_doc_novelty" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
        |g AS (SELECT doc_id, ${dkHash("s", "3")} AS g FROM sh),
        |fo AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1),
        |per AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_novel
        |  FROM g JOIN fo USING (g) GROUP BY 1)
        |SELECT d.doc_id, per.n_grams, per.n_novel,
        |  CASE WHEN per.n_grams > 0 THEN
        |    CAST((1000000 * per.n_novel) // per.n_grams AS BIGINT) END
        |    AS novelty_ppm
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // t33: distinct gram types per source, pair overlap through the
    // shared-gram join (the mm15 replay at the source grain).
    "t33_source_overlap" ->
      s"""WITH toks AS (
        |  SELECT source, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT source,
        |    ${dkHash("t[i] || ' ' || t[i+1] || ' ' || t[i+2]", "3")} AS g
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
        |hot AS (
        |  SELECT g FROM sh GROUP BY g HAVING count(*) > 64),
        |kept AS (
        |  SELECT * FROM sh ANTI JOIN hot USING (g)),
        |capn AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_capped
        |  FROM sh SEMI JOIN hot USING (g) GROUP BY source),
        |sizes AS (
        |  SELECT k.source, CAST(count(*) AS BIGINT) AS n,
        |    coalesce(any_value(c.n_capped), 0) AS n_capped
        |  FROM kept k LEFT JOIN capn c ON k.source = c.source
        |  GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(count(*) AS BIGINT) AS shared
        |  FROM kept a JOIN kept b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT p.source_a, p.source_b, x.n AS n_a, y.n AS n_b, p.shared,
        |  CAST((1000000 * p.shared) // (x.n + y.n - p.shared) AS BIGINT)
        |    AS jaccard_ppm,
        |  CAST((1000000 * p.shared) // least(x.n, y.n) AS BIGINT)
        |    AS containment_ppm,
        |  x.n_capped AS n_capped_a, y.n_capped AS n_capped_b
        |FROM pairs p
        |JOIN sizes x ON p.source_a = x.source
        |JOIN sizes y ON p.source_b = y.source
        |ORDER BY p.source_a, p.source_b""".stripMargin,

    "p18_dataset_card" ->
      """WITH b AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |    count(DISTINCT lang) AS n_langs,
        |    count(DISTINCT md5(text)) AS n_uniq
        |  FROM documents GROUP BY 1),
        |lc AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
        |top AS (
        |  SELECT source, lang AS top_lang FROM (
        |    SELECT source, lang,
        |      row_number() OVER (PARTITION BY source ORDER BY c DESC, lang)
        |        AS rn
        |    FROM lc) WHERE rn = 1)
        |SELECT b.source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
        |  round(n_tokens::DOUBLE / n_docs, 6) AS avg_doc_tokens,
        |  n_chars, CAST(n_langs AS BIGINT) AS n_langs, top_lang,
        |  round(1 - n_uniq::DOUBLE / n_docs, 6) AS exact_dup_ratio
        |FROM b JOIN top USING (source) ORDER BY source""".stripMargin,

    "t18_pmi_collocations" ->
      """WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
        |tot AS (
        |  SELECT CAST(sum(len(t)) AS BIGINT) AS n_uni,
        |    CAST(sum(len(t) - 1) AS BIGINT) AS n_big FROM d),
        |u AS (
        |  SELECT w.tok, CAST(count(*) AS BIGINT) AS cu
        |  FROM d, UNNEST(t) AS w(tok) GROUP BY 1),
        |b AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM d, UNNEST(range(1, len(t))) AS r(i)),
        |bc AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
        |  FROM b GROUP BY 1, 2 HAVING count(*) >= 5),
        |p AS (
        |  SELECT w1, w2, n_pair,
        |    CAST(floor(ln(
        |      CAST(n_pair AS DOUBLE) * n_uni * n_uni /
        |        (CAST(n_big AS DOUBLE) * u1.cu * u2.cu)) * 1000000) AS BIGINT)
        |      AS pmi_fx
        |  FROM bc JOIN u u1 ON bc.w1 = u1.tok
        |    JOIN u u2 ON bc.w2 = u2.tok, tot)
        |SELECT w1, w2, n_pair, pmi_fx FROM p
        |ORDER BY pmi_fx DESC, w1, w2 LIMIT 32""".stripMargin,

    "t19_zipf_slope" ->
      """WITH f AS (
        |  SELECT w.tok, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT string_split(text, ' ') AS t FROM documents),
        |    UNNEST(t) AS w(tok)
        |  GROUP BY 1),
        |r AS (
        |  SELECT freq, rk FROM (
        |    SELECT freq, row_number() OVER (ORDER BY freq DESC, tok) AS rk
        |    FROM f) WHERE rk <= 1000),
        |p AS (
        |  SELECT
        |    CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000) AS HUGEINT) AS x,
        |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000) AS HUGEINT) AS y
        |  FROM r),
        |a AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x*x) AS HUGEINT) AS sxx,
        |    CAST(sum(y*y) AS HUGEINT) AS syy,
        |    CAST(sum(x*y) AS HUGEINT) AS sxy
        |  FROM p)
        |SELECT CAST(n AS BIGINT) AS n_ranks,
        |  round(CAST(n*sxy - sx*sy AS DOUBLE) /
        |    CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope,
        |  round(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE) /
        |    (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6)
        |    AS r2
        |FROM a""".stripMargin,

    "s15_recall_eval" ->
      s"""WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
        |  WHERE vec_id < 10),
        |epairs AS (
        |  SELECT q.qid, e.vec_id, q.qe, e.embedding AS ve
        |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
        |ecomp AS (
        |  SELECT qid, vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
        |  FROM epairs),
        |eranked AS (
        |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |    ORDER BY round(dot / (sqrt(nq) * sqrt(nv)), 5) DESC, vec_id) AS rk
        |  FROM ecomp),
        |ex AS (SELECT qid, vec_id FROM eranked WHERE rk <= 5),
        |a AS (SELECT id, vec, cid FROM ${tbl("ivf_main")}),
        |pr AS (SELECT qid, qvec, cid FROM ${tbl("ivf_main_probes")}),
        |ipairs AS (
        |  SELECT pr.qid, a.id AS vec_id, pr.qvec AS qe, a.vec AS ve
        |  FROM a JOIN pr USING (cid) WHERE a.id <> pr.qid),
        |icomp AS (
        |  SELECT qid, vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
        |  FROM ipairs),
        |iranked AS (
        |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |    ORDER BY round(dot / (sqrt(nq) * sqrt(nv)), 5) DESC, vec_id) AS rk
        |  FROM icomp),
        |iv AS (SELECT qid, vec_id FROM iranked WHERE rk <= 5)
        |SELECT ex.qid, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(count(iv.vec_id) AS BIGINT) AS n_hit,
        |  round(CAST(count(iv.vec_id) AS DOUBLE) / count(*), 5) AS recall
        |FROM ex LEFT JOIN iv
        |  ON ex.qid = iv.qid AND ex.vec_id = iv.vec_id
        |GROUP BY 1 ORDER BY ex.qid""".stripMargin,

    "t20_burstiness" ->
      """WITH nd AS (SELECT CAST(count(*) AS HUGEINT) AS n_docs FROM documents),
        |pd AS (
        |  SELECT doc_id, w.tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |    UNNEST(t) AS w(tok)
        |  GROUP BY 1, 2),
        |per AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(c) AS BIGINT) AS tf,
        |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
        |  FROM pd GROUP BY 1 HAVING count(*) >= 10)
        |SELECT tok, df, tf,
        |  round(CAST(n_docs * q - CAST(tf AS HUGEINT) * tf AS DOUBLE) /
        |    CAST(n_docs * tf AS DOUBLE), 6) AS burstiness
        |FROM per, nd ORDER BY burstiness DESC, tok LIMIT 64""".stripMargin,

    // s17: the oracle recomputes the fixed-point member sums and the
    // decimal cosine from the index dump + quantizer sidecar dump;
    // HUGEINT plays decimal(38,0). The drift CTE block is shared with
    // s18's repair replay (round-14 — one definition of the trigger).
    "s17_centroid_drift" ->
      s"""WITH $driftCtes
        |SELECT c.cid, CAST(coalesce(n_members, 0) AS BIGINT) AS n_members,
        |  drift, coalesce(drift > 1.25 * md, false) AS rebuild
        |FROM c LEFT JOIN d USING (cid) CROSS JOIN med
        |ORDER BY c.cid""".stripMargin,

    // s18: the flagged-cluster REPAIR replayed end to end from the
    // pre-repair dump: the s17 trigger selects the flagged set, the
    // repaired centroids are the exact fixed-point floor means
    // (float(⌊Σ⌊x·1e7⌋/n⌋/1e7) — integer until the final two IEEE
    // ops, so both engines build the identical codebook), and the
    // reassignment is the same double cosine argmax the engine's
    // assign kernel runs (sequential dot, ties to the smallest cid,
    // NaN-as-max — DuckDB orders NaN greatest). sum_ids_after is the
    // membership checksum: any vector landing differently flips it.
    "s18_reindex_flagged" ->
      s"""WITH $driftCtes,
        |flag AS (
        |  SELECT d.cid FROM d CROSS JOIN med
        |  WHERE coalesce(d.drift > 1.25 * med.md, false)),
        |mm AS (
        |  SELECT id, vec, cid AS old_cid FROM m
        |  WHERE cid IN (SELECT cid FROM flag)),
        |repj AS (
        |  SELECT cid, j,
        |    CAST(floor(CAST(sum(e) AS DOUBLE) / count(*)) AS BIGINT) AS c7
        |  FROM me WHERE cid IN (SELECT cid FROM flag) GROUP BY 1, 2),
        |repv AS (
        |  SELECT cid,
        |    list(CAST(CAST(c7 AS DOUBLE) / 10000000.0 AS FLOAT)
        |      ORDER BY j) AS cvec
        |  FROM repj GROUP BY 1),
        |newq AS (
        |  SELECT c.cid, coalesce(r.cvec, c.cvec) AS cvec
        |  FROM c LEFT JOIN repv r USING (cid)),
        |sims AS (
        |  SELECT mm.id, mm.old_cid, q.cid,
        |    list_sum(list_transform(range(1, len(mm.vec) + 1), j ->
        |      CAST(mm.vec[j] AS DOUBLE) * CAST(q.cvec[j] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(range(1, len(mm.vec) + 1), j ->
        |      CAST(mm.vec[j] AS DOUBLE) * CAST(mm.vec[j] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(range(1, len(q.cvec) + 1), j ->
        |      CAST(q.cvec[j] AS DOUBLE) * CAST(q.cvec[j] AS DOUBLE)))))
        |      AS sim
        |  FROM mm, newq q),
        |best AS (
        |  SELECT id, old_cid, cid AS new_cid FROM (
        |    SELECT id, old_cid, cid,
        |      row_number() OVER (PARTITION BY id
        |        ORDER BY sim DESC, cid) AS rn
        |    FROM sims) WHERE rn = 1),
        |post AS (
        |  SELECT cid, id FROM m
        |  WHERE cid NOT IN (SELECT cid FROM flag)
        |  UNION ALL SELECT new_cid AS cid, id FROM best),
        |prec AS (
        |  SELECT cid, CAST(count(*) AS BIGINT) AS n_before
        |  FROM m GROUP BY 1),
        |pstats AS (
        |  SELECT cid, CAST(count(*) AS BIGINT) AS n_after,
        |    CAST(sum(id) AS BIGINT) AS sum_ids_after
        |  FROM post GROUP BY 1),
        |mvout AS (
        |  SELECT old_cid AS cid, CAST(count(*) AS BIGINT) AS n FROM best
        |  WHERE new_cid <> old_cid GROUP BY 1),
        |mvin AS (
        |  SELECT new_cid AS cid, CAST(count(*) AS BIGINT) AS n FROM best
        |  WHERE new_cid <> old_cid GROUP BY 1)
        |SELECT CAST(c.cid AS BIGINT) AS cid,
        |  c.cid IN (SELECT cid FROM flag) AS flagged,
        |  coalesce(p.n_before, 0) AS n_before,
        |  coalesce(s.n_after, 0) AS n_after,
        |  coalesce(o.n, 0) AS n_moved_out,
        |  coalesce(i.n, 0) AS n_moved_in,
        |  coalesce(s.sum_ids_after, 0) AS sum_ids_after
        |FROM c
        |LEFT JOIN prec p USING (cid)
        |LEFT JOIN pstats s USING (cid)
        |LEFT JOIN mvout o USING (cid)
        |LEFT JOIN mvin i USING (cid)
        |ORDER BY cid""".stripMargin,

    // s19: re-derive the whole rebuild audit from the swapped-in
    // quantizer dump — corpus = every embedding plus the re-crawled
    // batch (vec_id % 5 = 2, shifted past max id; derived from the
    // embeddings table, not from any dump), each row re-assigned by
    // the exact argmax-cosine double sequence the engine uses, then
    // per-cluster counts / id checksums / snapshot-vs-replay split.
    "s19_rebuild" ->
      s"""WITH q AS (SELECT cid, cvec FROM ${tbl("ivf_rebuilt_quantizer")}),
        |mx AS (SELECT max(vec_id) + 1 AS m FROM embeddings),
        |corpus AS (
        |  SELECT vec_id AS id, embedding AS vec, false AS replayed
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + mx.m AS id, embedding AS vec, true AS replayed
        |  FROM embeddings, mx WHERE vec_id % 5 = 2),
        |sims AS (
        |  SELECT c.id, c.replayed, q.cid,
        |    list_sum(list_transform(range(1, len(c.vec) + 1), j ->
        |      CAST(c.vec[j] AS DOUBLE) * CAST(q.cvec[j] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(range(1, len(c.vec) + 1), j ->
        |      CAST(c.vec[j] AS DOUBLE) * CAST(c.vec[j] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(range(1, len(q.cvec) + 1), j ->
        |      CAST(q.cvec[j] AS DOUBLE) * CAST(q.cvec[j] AS DOUBLE)))))
        |      AS sim
        |  FROM corpus c, q),
        |best AS (
        |  SELECT id, replayed, cid FROM (
        |    SELECT id, replayed, cid,
        |      row_number() OVER (PARTITION BY id
        |        ORDER BY sim DESC, cid) AS rn
        |    FROM sims) WHERE rn = 1),
        |stats AS (
        |  SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(sum(id) AS BIGINT) AS sum_ids,
        |    CAST(sum(CASE WHEN replayed THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_from_snapshot,
        |    CAST(sum(CASE WHEN replayed THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_from_replay
        |  FROM best GROUP BY 1)
        |SELECT CAST(q.cid AS BIGINT) AS cid,
        |  coalesce(s.n_members, 0) AS n_members,
        |  coalesce(s.sum_ids, 0) AS sum_ids,
        |  coalesce(s.n_from_snapshot, 0) AS n_from_snapshot,
        |  coalesce(s.n_from_replay, 0) AS n_from_replay
        |FROM q LEFT JOIN stats s USING (cid)
        |ORDER BY cid""".stripMargin,

    "s16_nprobe_curve" ->
      s"""WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
        |  WHERE vec_id < 10),
        |epairs AS (
        |  SELECT q.qid, e.vec_id, q.qe, e.embedding AS ve
        |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
        |ecomp AS (
        |  SELECT qid, vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
        |  FROM epairs),
        |eranked AS (
        |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |    ORDER BY round(dot / (sqrt(nq) * sqrt(nv)), 5) DESC, vec_id) AS rk
        |  FROM ecomp),
        |ex AS (SELECT qid, vec_id FROM eranked WHERE rk <= 5),
        |np AS (SELECT CAST(u.n AS BIGINT) AS n_probe
        |       FROM UNNEST([1, 2, 4, 16]) AS u(n)),
        |a AS (SELECT id, vec, cid FROM ${tbl("ivf_main")}),
        |pr AS (SELECT qid, qvec, probe_rank, cid
        |       FROM ${tbl("ivf_main_probes_ranked")}),
        |prn AS (
        |  SELECT np.n_probe, pr.qid, pr.qvec, pr.cid
        |  FROM pr, np WHERE pr.probe_rank <= np.n_probe),
        |ipairs AS (
        |  SELECT prn.n_probe, prn.qid, a.id AS vec_id, prn.qvec AS qe,
        |    a.vec AS ve
        |  FROM a JOIN prn USING (cid) WHERE a.id <> prn.qid),
        |icomp AS (
        |  SELECT n_probe, qid, vec_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(ve[i] AS DOUBLE) * CAST(ve[i] AS DOUBLE))) AS nv
        |  FROM ipairs),
        |iranked AS (
        |  SELECT n_probe, qid, vec_id,
        |    row_number() OVER (PARTITION BY n_probe, qid
        |      ORDER BY round(dot / (sqrt(nq) * sqrt(nv)), 5) DESC, vec_id)
        |      AS rk
        |  FROM icomp),
        |iv AS (SELECT n_probe, qid, vec_id FROM iranked WHERE rk <= 5),
        |hits AS (
        |  SELECT iv.n_probe, CAST(count(*) AS BIGINT) AS n_hit
        |  FROM ex JOIN iv ON ex.qid = iv.qid AND ex.vec_id = iv.vec_id
        |  GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nex,
        |    CAST(count(DISTINCT qid) AS BIGINT) AS nq FROM ex)
        |SELECT np.n_probe, tot.nq AS n_queries,
        |  coalesce(hits.n_hit, 0) AS n_hit,
        |  round(CAST(coalesce(hits.n_hit, 0) AS DOUBLE) / tot.nex, 5)
        |    AS mean_recall
        |FROM np LEFT JOIN hits USING (n_probe), tot
        |ORDER BY np.n_probe""".stripMargin,

    "p23_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, text FROM documents),
        |mx AS (SELECT max(doc_id) + 1 AS m FROM a),
        |b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM a WHERE doc_id % 7 <> 3
        |  UNION ALL
        |  SELECT doc_id + m AS doc_id, text FROM a, mx
        |  WHERE doc_id % 11 = 0),
        |fa AS (SELECT doc_id, md5(text) AS ha,
        |  len(string_split(text, ' ')) AS ta FROM a),
        |fb AS (SELECT doc_id, md5(text) AS hb,
        |  len(string_split(text, ' ')) AS tb FROM b),
        |j AS (
        |  SELECT CASE WHEN ha IS NULL THEN 'added'
        |    WHEN hb IS NULL THEN 'removed'
        |    WHEN ha <> hb THEN 'changed'
        |    ELSE 'unchanged' END AS status,
        |    coalesce(ta, 0) AS ta, coalesce(tb, 0) AS tb
        |  FROM fa FULL OUTER JOIN fb USING (doc_id))
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tb - ta) AS BIGINT) AS token_delta
        |FROM j GROUP BY 1 ORDER BY status""".stripMargin,

    // p24: the same sorted-prefix closed form; every division's
    // operands are exact integers so the IEEE quotients agree.
    "p24_budget_waterfill" ->
      """WITH src AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |      AS avail_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(avail_tokens) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM src),
        |rk AS (
        |  SELECT source, avail_tokens, t, n,
        |    CAST(floor(CAST(t AS DOUBLE) * 0.6) AS BIGINT) AS budget,
        |    CAST(row_number() OVER (ORDER BY avail_tokens, source)
        |      AS BIGINT) AS rn,
        |    CAST(coalesce(sum(avail_tokens) OVER (
        |      ORDER BY avail_tokens, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_prev
        |  FROM src CROSS JOIN tot),
        |tk AS (
        |  SELECT *, avail_tokens <=
        |    CAST(budget - cum_prev AS DOUBLE) / (n - rn + 1) AS taken
        |  FROM rk),
        |lvl AS (
        |  SELECT
        |    CAST(sum(CASE WHEN taken THEN avail_tokens ELSE 0 END)
        |      AS BIGINT) AS cum_taken,
        |    CAST(sum(CASE WHEN taken THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_taken
        |  FROM tk)
        |SELECT source, avail_tokens, taken,
        |  round(CASE WHEN taken THEN CAST(avail_tokens AS DOUBLE)
        |    ELSE CAST(budget - cum_taken AS DOUBLE) / (n - n_taken)
        |    END, 6) AS alloc_tokens,
        |  round(CASE WHEN taken THEN 1.0
        |    ELSE (CAST(budget - cum_taken AS DOUBLE) / (n - n_taken))
        |      / avail_tokens END, 6) AS take_frac
        |FROM tk CROSS JOIN lvl
        |ORDER BY source""".stripMargin,

    "d17_snapshot_neardup_diff" ->
      s"""WITH a AS (SELECT doc_id, text FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |         WHEN doc_id % 13 = 1 THEN
        |           array_to_string(list_reverse(string_split(text, ' ')), ' ')
        |         ELSE text END AS text
        |  FROM a WHERE doc_id % 7 <> 3),
        |ch AS (
        |  SELECT a.doc_id, a.text AS ta, b.text AS tb
        |  FROM a JOIN b USING (doc_id)
        |  WHERE md5(a.text) <> md5(b.text)),
        |tka AS (SELECT doc_id, string_split(ta, ' ') AS t FROM ch),
        |tkb AS (SELECT doc_id, string_split(tb, ' ') AS t FROM ch),
        |sha AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM tka, UNNEST(range(1, len(t) - 1)) AS u(i)),
        |shb AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |  FROM tkb, UNNEST(range(1, len(t) - 1)) AS u(i)),
        |ga AS (SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sha),
        |gb AS (SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM shb),
        |na AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_a
        |  FROM ga GROUP BY 1),
        |nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_b
        |  FROM gb GROUP BY 1),
        |co AS (SELECT ga.doc_id, CAST(count(*) AS BIGINT) AS common
        |  FROM ga JOIN gb ON ga.doc_id = gb.doc_id AND ga.h = gb.h
        |  GROUP BY 1)
        |SELECT na.doc_id, n_a, n_b,
        |  CAST(coalesce(common, 0) AS BIGINT) AS common,
        |  round(coalesce(common, 0)::DOUBLE /
        |    (n_a + n_b - coalesce(common, 0)), 6) AS jaccard,
        |  CASE WHEN coalesce(common, 0)::DOUBLE /
        |      (n_a + n_b - coalesce(common, 0)) >= 0.3
        |    THEN 'edited' ELSE 'rewritten' END AS status
        |FROM na JOIN nb USING (doc_id) LEFT JOIN co USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "d16_threshold_sweep" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH $shingleCte,
        |mh AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mhv
        |  FROM mh, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mhv AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |shd AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT c.id_a, c.id_b, count(*) AS common
        |  FROM cand c
        |  JOIN shd a ON c.id_a = a.doc_id
        |  JOIN shd b ON c.id_b = b.doc_id AND a.h = b.h
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_a, id_b,
        |    common::DOUBLE / (sa.n_sh + sb.n_sh - common) AS jac
        |  FROM co
        |  JOIN sizes sa ON id_a = sa.doc_id
        |  JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE common::DOUBLE / (sa.n_sh + sb.n_sh - common) >= 0.2),
        |th AS (SELECT CAST(u.t AS BIGINT) AS threshold_x10
        |       FROM UNNEST(range(2, 10)) AS u(t)),
        |e AS (
        |  SELECT th.threshold_x10, id_a, id_b FROM j, th
        |  WHERE jac >= th.threshold_x10 / 10.0),
        |np AS (
        |  SELECT threshold_x10, CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM e GROUP BY 1),
        |nd AS (
        |  SELECT threshold_x10, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
        |  FROM (SELECT threshold_x10, unnest([id_a, id_b]) AS d FROM e)
        |  GROUP BY 1)
        |SELECT th.threshold_x10,
        |  coalesce(np.n_pairs, 0) AS n_pairs,
        |  coalesce(nd.n_docs, 0) AS n_docs
        |FROM th LEFT JOIN np USING (threshold_x10)
        |LEFT JOIN nd USING (threshold_x10)
        |ORDER BY th.threshold_x10""".stripMargin
    },

    "t23_langid_confusion" ->
      s"""WITH sc AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |scores AS (
        |  SELECT doc_id, lang, m.l AS cand,
        |    len(list_filter(t, tk -> list_contains(m.w, tk))) AS score
        |  FROM sc, (VALUES
        |    $dkLangMarkers) AS m(l, w)),
        |best AS (
        |  SELECT doc_id, lang, cand, score, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
        |  FROM scores),
        |g AS (
        |  SELECT lang, CASE WHEN score > 0 THEN cand ELSE 'und' END AS guess
        |  FROM best WHERE rn = 1),
        |cell AS (
        |  SELECT lang, guess, CAST(count(*) AS BIGINT) AS n
        |  FROM g GROUP BY 1, 2),
        |tot AS (SELECT lang, count(*) AS t FROM g GROUP BY 1)
        |SELECT cell.lang, guess, n, round(CAST(n AS DOUBLE) / t, 6) AS share
        |FROM cell JOIN tot ON cell.lang = tot.lang
        |ORDER BY cell.lang, guess""".stripMargin,

    "t21_lexical_diversity" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |    AS n_types,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / len(string_split(text, ' ')), 6) AS ttr,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / sqrt(CAST(len(string_split(text, ' ')) AS DOUBLE)), 6)
        |    AS root_ttr
        |FROM documents ORDER BY doc_id""".stripMargin,

    // t25: the same counts → self-join → decimal reductions; HUGEINT
    // plays decimal(38,0) and the only doubles are the final rounded
    // quotients.
    "t25_lang_affinity" ->
      """WITH lc AS (
        |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |norms AS (
        |  SELECT lang, sum(CAST(cnt AS HUGEINT) * cnt) AS nsq,
        |    CAST(count(*) AS BIGINT) AS vsz
        |  FROM lc GROUP BY 1),
        |pairs AS (
        |  SELECT a.lang AS lang_a, b.lang AS lang_b,
        |    CAST(count(*) AS BIGINT) AS shared_toks,
        |    sum(CAST(a.cnt AS HUGEINT) * b.cnt) AS dot
        |  FROM lc a JOIN lc b ON a.tok = b.tok AND a.lang < b.lang
        |  GROUP BY 1, 2)
        |SELECT lang_a, lang_b, shared_toks,
        |  round(CAST(shared_toks AS DOUBLE) /
        |    (na.vsz + nb.vsz - shared_toks), 6) AS vocab_jaccard,
        |  round(CAST(dot AS DOUBLE) /
        |    (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))),
        |    6) AS cosine
        |FROM pairs
        |JOIN norms na ON lang_a = na.lang
        |JOIN norms nb ON lang_b = nb.lang
        |ORDER BY lang_a, lang_b""".stripMargin,

    // t24: same distinct-(doc, gram-hash) → df → join-back chain over
    // the shared shingle CTE; the 60-bit hash is the d3 convention so
    // any collision merges identically on both engines.
    "t24_ngram_novelty" ->
      s"""WITH $shingleCte,
        |sh2 AS (
        |  SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |dfc AS (SELECT h, count(*) AS df FROM sh2 GROUP BY 1),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_novel
        |  FROM sh2 JOIN dfc USING (h) GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
        |  round(CAST(n_novel AS DOUBLE) / n_grams, 6) AS novelty
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "t22_quality_calibration" ->
      s"""WITH q AS (
        |  SELECT least(floor($dkQuality * 10), 9)::BIGINT AS q_bucket,
        |    len(string_split(text, ' '))::BIGINT AS nt,
        |    md5(text) AS h
        |  FROM documents)
        |SELECT q_bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(nt) AS DOUBLE) / count(*), 6) AS mean_tokens,
        |  round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 6)
        |    AS dup_rate
        |FROM q GROUP BY 1 ORDER BY q_bucket""".stripMargin,

    "d15_minhash_error" -> {
      val coeffRows = (0 until 16).map { k =>
        val (a, b) = graft.functions.PortableHash.minhashCoeffs(k)
        s"($k, $a, $b)"
      }.mkString(", ")
      s"""WITH $shingleCte,
        |sh2 AS (
        |  SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h0 FROM sh),
        |sig AS (
        |  SELECT doc_id, m.i AS i, min((m.a * h0 + m.b) % 4294967291) AS mh
        |  FROM sh2, (VALUES $coeffRows) AS m(i, a, b)
        |  GROUP BY doc_id, m.i),
        |bands AS (
        |  SELECT doc_id, i // 4 AS b,
        |    ${dkHash("string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)", "-1")} AS bucket
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |est AS (
        |  SELECT c.id_a, c.id_b,
        |    CAST(count(CASE WHEN sa.mh = sb.mh THEN 1 END) AS BIGINT) AS est16
        |  FROM cand c
        |  JOIN sig sa ON sa.doc_id = c.id_a
        |  JOIN sig sb ON sb.doc_id = c.id_b AND sa.i = sb.i
        |  GROUP BY 1, 2),
        |shd AS (SELECT DISTINCT doc_id, ${dkHash("s", "0")} AS h FROM sh),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY 1),
        |co AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM shd a JOIN shd b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT e.est16, coalesce(co.inter, 0) AS inter,
        |    sa.n_sh + sb.n_sh - coalesce(co.inter, 0) AS un
        |  FROM est e
        |  LEFT JOIN co ON e.id_a = co.id_a AND e.id_b = co.id_b
        |  JOIN sizes sa ON e.id_a = sa.doc_id
        |  JOIN sizes sb ON e.id_b = sb.doc_id),
        |m AS (
        |  SELECT (10 * inter) // un AS j_bucket, est16,
        |    abs(est16 * un - 16 * inter) * 1000000 // (16 * un) AS err_fx
        |  FROM pairs)
        |SELECT CAST(j_bucket AS BIGINT) AS j_bucket,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(est16) AS DOUBLE) / (count(*) * 16), 6) AS mean_est,
        |  round(CAST(sum(err_fx) AS DOUBLE) / count(*) / 1000000, 6)
        |    AS mean_abs_err
        |FROM m GROUP BY 1 ORDER BY j_bucket""".stripMargin
    },

    // sk1: the identical CMS rebuilt in SQL — same portable hashes,
    // same d=4 × w=1024 counter table, same min-over-rows estimate.
    "sk1_cms_topk" ->
      s"""WITH t AS (
        |  SELECT tok FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE length(tok) > 0),
        |rows_ AS (SELECT unnest(range(0, 4)) AS r),
        |counters AS (
        |  SELECT r, ${dkHash("tok", "r")} % 1024 AS b, count(*) AS c
        |  FROM t, rows_ GROUP BY 1, 2),
        |exact_ AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS exact FROM t GROUP BY 1),
        |probes AS (
        |  SELECT tok, exact, r, ${dkHash("tok", "r")} % 1024 AS b
        |  FROM exact_, rows_)
        |SELECT p.tok, CAST(min(c.c) AS BIGINT) AS est, p.exact
        |FROM probes p JOIN counters c ON p.r = c.r AND p.b = c.b
        |GROUP BY p.tok, p.exact
        |ORDER BY est DESC, tok LIMIT 20""".stripMargin,

    // t27: the same vowel-group syllable heuristic and exact
    // fixed-point FORCAST arithmetic, independently over DuckDB's
    // regexp engine (RE2 vs Java — the pattern is simple enough that
    // they agree byte-for-byte).
    "t27_forcast_readability" ->
      s"""WITH w AS (
        |  SELECT doc_id, tok,
        |    len(regexp_extract_all(lower(tok), '[aeiouy]+')) AS nv
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  WHERE length(tok) > 0),
        |a AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(CASE WHEN nv = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_mono,
        |    CAST(sum(CASE WHEN length(tok) >= 7 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_long
        |  FROM w GROUP BY 1)
        |SELECT d.doc_id, n_words, n_mono, n_long,
        |  CAST(20000000 - ((15000000 * n_mono) // n_words) AS BIGINT)
        |    AS forcast_grade_micro,
        |  CAST((1000000 * n_long) // n_words AS BIGINT) AS longword_ppm,
        |  CASE WHEN n_words IS NULL THEN NULL
        |    WHEN 20000000 - ((15000000 * n_mono) // n_words) < 10000000
        |      THEN 'easy'
        |    WHEN 20000000 - ((15000000 * n_mono) // n_words) < 12000000
        |      THEN 'medium'
        |    ELSE 'hard' END AS band
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // sk6: every signed counter rebuilt bit-for-bit from the md5 sign
    // hash over the same per-token counts.
    "sk6_ams_f2" ->
      s"""WITH t AS (
        |  SELECT tok FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE length(tok) > 0),
        |cnt AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
        |xr AS (
        |  SELECT u.r, sum(c * ((${dkHash("tok", "u.r")} % 2) * 2 - 1)) AS x
        |  FROM cnt, UNNEST(range(0, 16)) AS u(r) GROUP BY 1),
        |ex AS (SELECT sum(c * c) AS exact_f2 FROM cnt)
        |SELECT CAST(r AS INTEGER) AS r, CAST(x AS BIGINT) AS x,
        |  CAST(x * x AS BIGINT) AS est, CAST(exact_f2 AS BIGINT) AS exact_f2
        |FROM xr, ex ORDER BY r""".stripMargin,

    // t28: the full RAKE chain replayed — running-stopword-count
    // phrase ids, deg/freq word scores, phrase-score sums, top-3 —
    // over DuckDB's window/group machinery.
    "t28_rake_keywords" ->
      s"""WITH tk AS (
        |  SELECT doc_id, u.i AS pos, t[u.i] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t
        |        FROM documents),
        |    UNNEST(range(1, len(t) + 1)) AS u(i)),
        |st AS (
        |  SELECT doc_id, pos, tok,
        |    (list_contains(['the','a','an','of','and','or','to','in',
        |      'is','on','for','with'], tok) OR length(tok) = 0)
        |      AS is_stop
        |  FROM tk),
        |ph AS (
        |  SELECT doc_id, pos, tok, is_stop,
        |    sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
        |  FROM st),
        |w AS (SELECT doc_id, pos, tok, phrase_id FROM ph
        |  WHERE NOT is_stop),
        |pl AS (
        |  SELECT doc_id, phrase_id, count(*) AS plen,
        |    string_agg(tok, ' ' ORDER BY pos) AS ptext
        |  FROM w GROUP BY 1, 2),
        |occ AS (
        |  SELECT w.doc_id, w.tok, w.phrase_id, pl.plen
        |  FROM w JOIN pl USING (doc_id, phrase_id)),
        |ws AS (
        |  SELECT doc_id, tok,
        |    (1000000 * sum(plen)) // count(*) AS wscore_ppm
        |  FROM occ GROUP BY 1, 2),
        |ps AS (
        |  SELECT o.doc_id, o.phrase_id, sum(ws.wscore_ppm) AS score_ppm
        |  FROM occ o JOIN ws ON o.doc_id = ws.doc_id AND o.tok = ws.tok
        |  GROUP BY 1, 2),
        |pd AS (
        |  SELECT ps.doc_id, pl.ptext AS phrase,
        |    max(ps.score_ppm) AS score_ppm, count(*) AS n_occur
        |  FROM ps JOIN pl USING (doc_id, phrase_id)
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT doc_id, phrase, CAST(score_ppm AS BIGINT) AS score_ppm,
        |    CAST(n_occur AS BIGINT) AS n_occur,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score_ppm DESC, phrase) AS rank
        |  FROM pd)
        |SELECT doc_id, phrase, score_ppm, n_occur, rank
        |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // g4: hash-to-min with pointer jumping, 8 unrolled rounds —
    // label := min(label, neighbor labels, label-of-label); doubling
    // reach covers any diameter ≤ 2^8 (far past this kNN graph's),
    // and extra rounds past the fixpoint are identity, so bounded
    // unrolling equals Spark's run-to-convergence result. Each round
    // references the previous one THREE times, so the round CTEs are
    // MATERIALIZED — DuckDB otherwise inlines the chain into a 3^n
    // expression tree and the query never plans.
    "g4_connected_components" -> {
      val rounds = (1 to 8).map { i =>
        s"""m$i AS MATERIALIZED (
           |  SELECT e.dst AS id, min(c.cmp) AS nb
           |  FROM und e JOIN c${i - 1} c ON e.src = c.id GROUP BY 1),
           |c$i AS MATERIALIZED (
           |  SELECT c.id,
           |    least(least(c.cmp, coalesce(m.nb, c.cmp)), p.cmp) AS cmp
           |  FROM c${i - 1} c
           |  LEFT JOIN m$i m USING (id)
           |  JOIN c${i - 1} p ON p.id = c.cmp)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${ivfTopkCtes("ivf_main", "ivf_knn_probes")},
         |edges0 AS (
         |  SELECT qid AS src, vec_id AS dst FROM ranked WHERE rank <= 3),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM edges0 WHERE src <> dst
         |    UNION ALL
         |    SELECT dst AS src, src AS dst FROM edges0 WHERE src <> dst)),
         |nodes AS (SELECT vec_id AS id FROM embeddings),
         |c0 AS MATERIALIZED (SELECT id, id AS cmp FROM nodes),
         |$rounds,
         |sizes AS (SELECT cmp, count(*) AS csize FROM c8 GROUP BY 1)
         |SELECT c.id, CAST(c.cmp AS BIGINT) AS component,
         |  CAST(s.csize AS BIGINT) AS csize
         |FROM c8 c JOIN sizes s USING (cmp) ORDER BY c.id""".stripMargin
    },

    // g5: the mutual edge filter (both directions present in the
    // directed top-3 list) then EXACTLY the 8 peel rounds the Spark
    // side runs — survivors_i = nodes whose degree within the
    // survivors_{i-1}-induced subgraph is ≥ 2. Each round references
    // the previous survivor set TWICE (both join endpoints), so the
    // round CTEs are MATERIALIZED (the g4 lesson). Bounded-round
    // parity: both engines compute the same quantity at any peel
    // depth (LabelProp.kCore's scaladoc), so the round counts here
    // and in the Spark binding must move TOGETHER.
    "g5_kcore" -> {
      val rounds = (1 to 8).map { i =>
        s"""s$i AS MATERIALIZED (
           |  SELECT d.id FROM (
           |    SELECT e.src AS id, count(*) AS dg
           |    FROM und e
           |    JOIN s${i - 1} a ON e.src = a.id
           |    JOIN s${i - 1} b ON e.dst = b.id
           |    GROUP BY 1) d
           |  WHERE d.dg >= 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${ivfTopkCtes("ivf_main", "ivf_knn_probes")},
         |edges0 AS (
         |  SELECT qid AS src, vec_id AS dst FROM ranked
         |  WHERE rank <= 3 AND qid <> vec_id),
         |mut AS (
         |  SELECT e.src, e.dst FROM edges0 e
         |  JOIN edges0 r ON e.src = r.dst AND e.dst = r.src),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM mut
         |    UNION ALL
         |    SELECT dst AS src, src AS dst FROM mut)),
         |nodes AS (SELECT vec_id AS id FROM embeddings),
         |s0 AS MATERIALIZED (SELECT id FROM nodes),
         |$rounds,
         |cdeg AS (
         |  SELECT e.src AS id, CAST(count(*) AS BIGINT) AS core_deg
         |  FROM und e
         |  JOIN s8 a ON e.src = a.id
         |  JOIN s8 b ON e.dst = b.id
         |  GROUP BY 1)
         |SELECT n.id, (c.core_deg IS NOT NULL) AS in_core, c.core_deg
         |FROM nodes n LEFT JOIN cdeg c ON n.id = c.id
         |ORDER BY n.id""".stripMargin
    },

    // d19: the oracle replays the band buckets themselves (16-bit ×4
    // over the two seeded 32-bit phash halves), pairs within any
    // shared bucket, xor/bit_count hamming, top-1 by (hamming, other),
    // LEFT join so band-isolated chunks keep NULL-NN rows.
    "d19_chunk_nn" ->
      s"""WITH d AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) > 0),
        |chunks AS (
        |  SELECT (doc_id << 32) + ci AS pk,
        |    substr(text, CAST(ci * 32 + 1 AS INT), 32) AS chunk
        |  FROM d, UNNEST(range(0, (length(text) - 1) // 32 + 1)) AS u(ci)),
        |h AS MATERIALIZED (
        |  SELECT pk, ${dkHash("chunk", "1")} & 4294967295 AS hi,
        |    ${dkHash("chunk", "2")} & 4294967295 AS lo
        |  FROM chunks),
        |bands AS MATERIALIZED (
        |  SELECT pk, hi, lo, b.band,
        |    CASE b.band WHEN 0 THEN lo & 65535
        |      WHEN 1 THEN (lo >> 16) & 65535
        |      WHEN 2 THEN hi & 65535
        |      ELSE (hi >> 16) & 65535 END AS bv
        |  FROM h, UNNEST(range(0, 4)) AS b(band)),
        |hot AS (
        |  SELECT band, bv FROM bands GROUP BY 1, 2
        |  HAVING count(*) > 4096),
        |b2 AS (
        |  SELECT * FROM bands ANTI JOIN hot USING (band, bv)),
        |cand AS (
        |  SELECT DISTINCT a.pk AS pk,
        |    CAST(bit_count(xor(a.hi, b.hi)) +
        |         bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming,
        |    b.pk AS other
        |  FROM b2 a JOIN b2 b
        |    ON a.band = b.band AND a.bv = b.bv AND a.pk <> b.pk),
        |nn AS (
        |  SELECT pk, other AS nn_pk, hamming AS nn_hamming
        |  FROM (SELECT pk, hamming, other, row_number() OVER (
        |          PARTITION BY pk ORDER BY hamming, other) AS rn
        |        FROM cand) t
        |  WHERE rn = 1)
        |SELECT (h.pk >> 32)::VARCHAR || '#' ||
        |    (h.pk & 4294967295)::VARCHAR AS ck,
        |  h.hi, h.lo,
        |  CASE WHEN nn.nn_pk IS NOT NULL THEN (nn.nn_pk >> 32)::VARCHAR
        |    || '#' || (nn.nn_pk & 4294967295)::VARCHAR END AS nn_ck,
        |  nn.nn_hamming
        |FROM h LEFT JOIN nn USING (pk) ORDER BY ck""".stripMargin,

    // sk7: both signed-counter vectors and the exact product-sum
    // rebuilt from the same (tok → cA, cB) counts.
    "sk7_join_size_est" ->
      s"""WITH bounds AS (
        |  SELECT min(source) AS sa, max(source) AS sb FROM documents),
        |tk AS (
        |  SELECT (d.source = b.sa) AS in_a, tok
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) d, bounds b
        |  WHERE (d.source = b.sa OR d.source = b.sb)
        |    AND length(tok) > 0),
        |cnt AS (
        |  SELECT tok,
        |    sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS cb
        |  FROM tk GROUP BY 1),
        |xr AS (
        |  SELECT u.r,
        |    sum(ca * ((${dkHash("tok", "u.r")} % 2) * 2 - 1)) AS xa,
        |    sum(cb * ((${dkHash("tok", "u.r")} % 2) * 2 - 1)) AS xb
        |  FROM cnt, UNNEST(range(0, 16)) AS u(r) GROUP BY 1),
        |ex AS (SELECT sum(ca * cb) AS exact_join FROM cnt)
        |SELECT CAST(r AS INTEGER) AS r, CAST(xa AS BIGINT) AS xa,
        |  CAST(xb AS BIGINT) AS xb, CAST(xa * xb AS BIGINT) AS est,
        |  CAST(exact_join AS BIGINT) AS exact_join
        |FROM xr, ex ORDER BY r""".stripMargin,

    // t26: gram positions i run 1..len-n+1; seeds are the gram order
    // n (matching phash(sh, n) on the Spark side).
    "t26_repetition_profile" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c2 AS (
        |  SELECT doc_id, ${dkHash("t[i] || ' ' || t[i+1]", "2")} AS h,
        |    count(*) AS c
        |  FROM toks, UNNEST(range(1, len(t))) AS u(i) GROUP BY 1, 2),
        |p2 AS (
        |  SELECT doc_id, max(c) AS max2, sum(c) AS ng2 FROM c2 GROUP BY 1),
        |c3 AS (
        |  SELECT doc_id,
        |    ${dkHash("t[i] || ' ' || t[i+1] || ' ' || t[i+2]", "3")} AS h,
        |    count(*) AS c
        |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) GROUP BY 1, 2),
        |p3 AS (
        |  SELECT doc_id, max(c) AS max3, sum(c) AS ng3 FROM c3 GROUP BY 1),
        |c5 AS (
        |  SELECT doc_id,
        |    ${dkHash(
             "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]",
             "5")} AS h,
        |    count(*) AS c
        |  FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i) GROUP BY 1, 2),
        |p5 AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup5,
        |    sum(c) AS n5
        |  FROM c5 GROUP BY 1)
        |SELECT d.doc_id,
        |  len(string_split(text, ' '))::BIGINT AS n_tok,
        |  CAST(floor(max2 * 1000000 / ng2) AS BIGINT) AS top2_ppm,
        |  CAST(floor(max3 * 1000000 / ng3) AS BIGINT) AS top3_ppm,
        |  CAST(floor(dup5 * 1000000 / n5) AS BIGINT) AS dup5_ppm
        |FROM documents d
        |LEFT JOIN p2 USING (doc_id)
        |LEFT JOIN p3 USING (doc_id)
        |LEFT JOIN p5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // p25: t6's keep rule (the identical SQL as the t6 oracle,
    // collapsed to the boolean) AND the modal-2-gram repetition cut.
    "p25_gopher_gate" ->
      s"""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c2 AS (
        |  SELECT doc_id, ${dkHash("t[i] || ' ' || t[i+1]", "2")} AS h,
        |    count(*) AS c
        |  FROM toks, UNNEST(range(1, len(t))) AS u(i) GROUP BY 1, 2),
        |p2 AS (
        |  SELECT doc_id, max(c) AS max2, sum(c) AS ng2 FROM c2 GROUP BY 1),
        |f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
        |      / len(string_split(text, ' ')) AS awl,
        |    (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
        |      / length(text) AS sym,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      tk -> list_contains(['the','a','an','of','and','or','to','in','is','on','for','with'], tk)))
        |      AS BIGINT) AS n_stop
        |  FROM documents),
        |k AS (
        |  SELECT doc_id,
        |    ((n_words >= 3 AND n_words <= 256)
        |      AND (awl >= 2.0 AND awl <= 12.0)
        |      AND (sym <= 0.2) AND (n_stop >= 1)) AS keep
        |  FROM f)
        |SELECT k.doc_id, k.keep,
        |  (ng2 IS NULL OR max2 * 5 < ng2) AS r_repetition,
        |  (k.keep AND (ng2 IS NULL OR max2 * 5 < ng2)) AS admit
        |FROM k LEFT JOIN p2 USING (doc_id)
        |ORDER BY doc_id""".stripMargin
  )
}
