package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Physical-plan pins: the scale-critical plan shapes must not
  * silently regress. These assert on the planned (not executed)
  * physical plan at sf0.001. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("qc top-10 is a parallel TakeOrderedAndProject, not a global window sort") {
    val p = plan("qc_top_customers")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("event details assigns ids without a global no-partition window") {
    // hash-derived surrogate ids: the only total order left is the
    // final presentation sort — a row_number() Window with no
    // PARTITION BY would be a single-task bottleneck at 100 TB.
    val p = plan("adsb_event_details")
    assert(!p.contains("Window ["), s"no-partition window in:\n$p")
    assert(!p.contains("row_number()"), s"row_number window in:\n$p")
  }

  test("IVF search plans without a cartesian product") {
    val p = plan("s2_ivf_topk")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("WindowGroupLimit")) // top-k prune active
  }

  test("day-slice scan pushes the time range into the parquet source") {
    val p = plan("q4_day_slice")
    // the raw ns long (file column `ts`) carries the range to the scan
    assert(p.contains("GreaterThanOrEqual(ts,"))
    assert(p.contains("LessThan(ts,"))
  }

  test("gap-fill histogram joins the tiny spine by broadcast") {
    val p = plan("q1_events_histogram")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("histogram scans are pre-ranged: the UTC superset reaches the parquet source") {
    // the histogram's own range predicate sits on the derived bin
    // time (exactness-only, can't push) — the bindings compose with
    // Tables.eventsRanged so the physical ts column carries a range
    // to the scan (tz variant: ±1-day-widened superset, q5 style)
    for (q <- Seq("q1_events_histogram", "q2_histogram_tz")) {
      val p = plan(q)
      assert(p.contains("GreaterThanOrEqual(ts,"), s"$q scan unpruned:\n$p")
      assert(p.contains("LessThan(ts,"), s"$q scan unpruned:\n$p")
    }
  }

  test("enrichment joins broadcast the dimension side") {
    assert(plan("q11_expr_enrich").contains("BroadcastHashJoin"))
    assert(plan("qb_revenue_by_nation").contains("BroadcastHashJoin"))
  }

  test("minhash LSH candidates plan at most three exchanges") {
    // columnar min-table: groupBy(id) + groupBy(band, bucket) +
    // the final candidate distinct — banding itself must stay a
    // projection (the old per-seed-row shape needed a fourth).
    val p = plan("d2_minhash_lsh")
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(p).length
    assert(exchanges <= 3, s"$exchanges exchanges:\n$p")
  }

  test("star-routed band joins keep d2's exchange budget") {
    // round-12: the hot-bucket star route is a projection inside the
    // existing bucket pipeline (when/array_min/explode) and the pair
    // distinct-with-audit is one hash aggregate (never a join back
    // to the buckets) — so each capped variant must plan EXACTLY the
    // exchange count of its uncapped twin, with no product joins
    def exchanges(q: String): Int =
      "Exchange hashpartitioning".r.findAllMatchIn(plan(q)).length
    for ((capped, plain) <- Seq(
        "d2c_minhash_capped" -> "d2_minhash_lsh",
        "d4vc_simhash_capped" -> "d4v_simhash_neardup")) {
      val (c, u) = (exchanges(capped), exchanges(plain))
      assert(c === u, s"$capped: $c exchanges vs $plain's $u")
      val p = plan(capped)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), capped)
    }
  }

  test("the video frame lattice is joinless per-blob projection work") {
    // round-12: the demuxed lattice (walk + per-frame arrays) must
    // stay a scan-side projection — a future change that sneaks a
    // join or a hash shuffle into the per-blob path would turn the
    // 100 TB story (row count = blob count, no exchange before
    // consumers aggregate) into a shuffle of raw media bytes
    val p = graft.queries.AdsbQueries.videoFrameSums(spark)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
  }

  test("mm19's band join keys are packed longs, never strings") {
    // round-13 (VERDICT r12 ask #5): the frame-NN key is mid·2³² +
    // frame_idx — at real frame counts a model#frame STRING key
    // would bloat the band exchange 3-4× vs the 8-byte packed idiom
    import org.apache.spark.sql.types.{LongType, StringType}
    val hashed = graft.queries.AdsbQueries.mm19Hashed(spark)
    assert(hashed.schema("key").dataType === LongType)
    // force the banded path (pairwiseLimit = 0) and pin the exchange:
    // every hash partitioning key feeding the band join must be
    // non-string — the dictionary decode join stays broadcast-side
    val p = HammingNN.nearest(hashed, "key", "ahash_hi", "ahash_lo",
        pairwiseLimit = 0)
      .queryExecution.executedPlan
    val stringParts = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
        e.outputPartitioning
          .asInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
          .expressions.filter(_.dataType == StringType)
    }.flatten
    assert(stringParts.isEmpty,
      s"string keys in band exchange: $stringParts")
  }

  test("mm20's medoid join is a keyed equi-join, never a product") {
    // round-13: the pair stage must stay keyed on (model, shot) — a
    // product here would silently turn the Σ shot_size² bound into
    // n². (mm21's NN legitimately plans the HammingNN pairwise BNLJ
    // at fixture scale, so its guard is the scan-budget tripwire +
    // mm19's packed-key pin over the shared readout.)
    val p = plan("mm20_shot_medoids")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("mm22's pair legs are inverted-index equi-joins, never products") {
    // round-14: container pairs must materialize ONLY through shared
    // signatures — a product join here is the all-pairs shape the
    // verdict table exists to avoid at corpus scale. (The hash-equal
    // signature join keys on (h1, h2); the sizes joins are
    // metadata-grade.)
    val p = plan("mm22_container_dup")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("media plans contain no unpartitioned window at all") {
    // round-15 (VERDICT r14 #3 done criterion): the catalog
    // dictionaries were the one single-partition window idiom left in
    // the media family — now distributed (Rank.globalRowNumber) and
    // memoized behind a localCheckpoint, so every media consumer plan
    // must be free of Exchange-SinglePartition windows entirely; the
    // per-model windows (segmentation, shot detection) all carry a
    // partitionSpec.
    Seq("mm8_frame_sample", "mm15_video_neardup", "mm19_frame_phash",
      "mm20_shot_medoids", "mm21_segment_neardup", "mm22_container_dup",
      "mm23_signal_inventory").foreach { q =>
      val exec = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      val global = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty,
        s"$q plans ${global.size} unpartitioned window(s):\n" +
          global.mkString("\n"))
    }
  }

  test("headline aggregations stay inside whole-stage codegen") {
    // AQE's wrapper hides codegen annotation in the plan string; the
    // non-adaptive physical plan marks codegen stages with "*(n)".
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try
      for (q <- Seq("qa_pricing_summary", "q1_events_histogram",
          "t1_text_stats", "d2_minhash_lsh"))
        assert(plan(q).contains("*("), q)
    finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("sequence packing joins its bucket offsets by broadcast") {
    // the distributed prefix sum: per-bucket running sums join the
    // metadata-sized bucket-base table via broadcast — a sort-merge
    // join here would mean the offsets table got mis-sized
    val p = plan("p5_pack_sequences")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), s"SMJ in packReport:\n$p")
  }

  test("mixture sampling broadcasts the per-language thresholds") {
    val p = plan("p6_mixture_sample")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("PQ search prunes its top-k window") {
    assert(plan("s4_pq_topk").contains("WindowGroupLimit"))
  }

  test("PQ ADC expressions plan inside whole-stage codegen spans") {
    // VERDICT r6 #2: the old k-literal LUT/argmin chains blew janino's
    // 64 KB limit and the ADC stage silently ran interpreted. The
    // codebook-loop expressions must appear, and every plan line
    // carrying one must sit in a codegen'd (`*(n)`) operator.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("s4_pq_topk", "s6_ivfpq_topk")) {
        val p = plan(q)
        assert(p.contains("codebook_"), s"$q lost the codebook exprs:\n$p")
        val bad = p.linesIterator
          .filter(_.contains("codebook_")).filterNot(_.contains("*("))
          // the probe explode is a Generate node — Spark never fuses
          // Generate into whole-stage codegen; it runs once per
          // (broadcast-side) QUERY row, not per corpus row, so it is
          // not an ADC hot-path concern
          .filterNot(_.contains("Generate "))
          .toList
        assert(bad.isEmpty,
          s"$q codebook exprs outside codegen:\n${bad.mkString("\n")}")
      }
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("t10 heavy hitters plans a parallel top-k, not a global sort") {
    assert(plan("t10_heavy_hitters").contains("TakeOrderedAndProject"))
  }

  test("p9 source cap prunes map-side via WindowGroupLimit") {
    // rank<=cap over the per-source window must push a partial top-k
    // below the exchange: a mega-source then ships ~cap rows per map
    // task instead of its whole partition.
    val p = plan("p9_source_cap")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("p4b bloom prefilter sits in the scan stage, before the join") {
    val p = plan("p4b_contamination_bloom")
    assert(p.contains("might_contain"), s"no bloom probe in:\n$p")
    assert(p.contains("LeftSemi"), s"no semi join in:\n$p")
    spark.catalog.clearCache() // p4b caches its train-hash set
  }

  test("feature/label windows are user-partitioned, never global") {
    // qn's backward and qo's forward windows must carry the user
    // partition — an unpartitioned variant would funnel the whole
    // event table through one task
    Seq("qn_pit_features", "qo_conversion_labels").foreach { n =>
      val p = plan(n)
      assert(!p.contains("Exchange SinglePartition"),
        s"$n has a single-partition exchange:\n$p")
    }
  }

  test("t16 keyword top-5 prunes map-side via WindowGroupLimit") {
    val p = plan("t16_tfidf_keywords")
    assert(p.contains("WindowGroupLimit"), p)
    spark.catalog.clearCache() // t16 shares its (doc,term) counts
  }

  test("p19/p20 windows and scoring stay partitioned, never global") {
    // p19's cumulative token sum rides the per-source partition;
    // p20's scoring is a pure projection — neither may funnel the
    // table through one task
    Seq("p19_token_budget", "p20_linear_probe").foreach { n =>
      val p = plan(n)
      assert(!p.contains("Exchange SinglePartition"),
        s"$n funnels through one task:\n$p")
    }
  }

  test("qq anomaly joins its stats by broadcast with no window anywhere") {
    val p = plan("qq_value_anomaly")
    assert(p.contains("BroadcastHashJoin"), s"stats not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("Window ["))
  }

  test("t18/t20 corpus-stat top-k are parallel TakeOrdered, not global sorts") {
    assert(plan("t18_pmi_collocations").contains("TakeOrderedAndProject"))
    assert(plan("t20_burstiness").contains("TakeOrderedAndProject"))
  }

  test("qr engagement plans with aggregations only, no window") {
    val p = plan("qr_active_users")
    assert(!p.contains("Window ["), s"window in:\n$p")
  }

  test("p23 snapshot diff is one full-outer join on the id, no cartesian") {
    val p = plan("p23_snapshot_diff")
    assert(p.contains("FullOuter"), s"full outer missing:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("qy/qz transition+CUSUM windows are keyed; their tiny sides broadcast") {
    val qy = plan("qy_markov_transitions")
    // the lead() window partitions by user — never a global window
    assert(qy.contains("Window"), qy)
    assert(!qy.contains("Window [") ||
      qy.contains("partitionBy") || qy.contains("user_id"), qy)
    // row totals (≤|types| rows) join back by broadcast, not shuffle
    assert(qy.contains("BroadcastHashJoin"), s"qy totals not broadcast:\n$qy")
    val qz = plan("qz_cusum_changepoint")
    assert(qz.contains("BroadcastHashJoin"), s"qz stats not broadcast:\n$qz")
  }

  test("t24 novelty ships gram hashes, never gram strings, through its joins") {
    val p = plan("t24_ngram_novelty")
    // every exchange keys on the 60-bit hash or the doc id — a
    // hashpartitioning on the raw shingle string would shuffle ~15×
    // the bytes
    assert(!p.contains("hashpartitioning(sh#"),
      s"gram STRINGS shuffle in t24:\n$p")
    assert(p.contains("hashpartitioning(h#") ||
      p.contains("hashpartitioning(doc_id#"), p)
  }

  test("t25 affinity broadcasts the per-language norms") {
    val p = plan("t25_lang_affinity")
    assert(p.contains("BroadcastHashJoin"), s"t25 norms not broadcast:\n$p")
  }

  test("s17 drift reduces to metadata size before any join; median broadcasts") {
    val p = plan("s17_centroid_drift")
    // the (cid, dim) partial agg must sit below the quantizer join,
    // and the 1-row median rides a broadcast nested loop, never a
    // shuffled cross
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"s17 median not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sk1 CMS probes join the counter table by broadcast; top-k is TakeOrdered") {
    val p = plan("sk1_cms_topk")
    // the ≤4096-row counter table must broadcast (a shuffle join here
    // would shuffle every distinct token 4×), and the final top-20 is
    // a parallel TakeOrdered, never a global sort
    assert(p.contains("BroadcastHashJoin"), s"sk1 counters not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"sk1 top-k is a sort:\n$p")
  }

  test("sk2 KMV rank window is keyed by event_type, never global") {
    val p = plan("sk2_kmv_distinct")
    assert(p.contains("windowspecdefinition(event_type"),
      s"sk2 rank window not keyed by event_type:\n$p")
  }

  test("t26/p25 ship gram hashes, never gram strings, into their aggregations") {
    for (q <- Seq("t26_repetition_profile", "p25_gopher_gate")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning(sh#"),
        s"gram STRINGS shuffle in $q:\n$p")
      assert(p.contains("hashpartitioning(h#") ||
        p.contains("hashpartitioning(doc_id#"), p)
    }
  }

  test("sk3 HLL sketch is pure aggregation — no rank window anywhere") {
    // the mergeability claim: register-max then harmonic sum are both
    // map-side-combinable groupBys; a window (sk2's shape) would mean
    // per-group sorted state and no partial merge
    val p = plan("sk3_hll_distinct")
    assert(!p.contains("windowspecdefinition"), s"window in sk3:\n$p")
  }

  test("g1 PageRank's final plan is O(1)-depth over checkpointed state") {
    // each superstep localCheckpoints, so the presented frame must be
    // a flat scan of the last superstep's materialization — 8 chained
    // joins here would mean the checkpoint discipline regressed and
    // plan depth grows with iteration count
    val p = plan("g1_knn_pagerank")
    assert(p.contains("ExistingRDD"), s"g1 not checkpoint-backed:\n$p")
    assert(!p.contains("Join"), s"g1 plan re-derives supersteps:\n$p")
  }

  test("mm9 image stats is a pure scan-projection — no join anywhere") {
    // the admission-gate claim: at 100 TB this must be a map over the
    // binary column; any join/window here means the stats kernel
    // stopped being a projection
    val p = plan("mm9_image_stats")
    assert(!p.contains("Join"), s"join in mm9:\n$p")
    assert(!p.contains("windowspecdefinition"), s"window in mm9:\n$p")
  }

  test("t29 Good-Turing: one corpus shuffle, spectrum layer join-bounded") {
    // the (lang, gram-hash) count is the only corpus-sized shuffle;
    // the r->r+1 self-join and the p0 join run on the count-of-counts
    // frame. Grams must ship hashed (the t24 discipline) and no
    // cartesian may appear.
    val p = plan("t29_good_turing")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("windowspecdefinition"), s"window in t29:\n$p")
  }

  test("g5 k-core round state is co-partitioned, no cartesian") {
    val p = plan("g5_kcore")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("mm12 keyframes: per-video window only, argmax without row_number") {
    // the running shot id is the one window (keyed by model — a
    // video's frames are one key group); the keyframe pick must stay
    // a partial-aggregable min(struct), never a per-shot row_number
    // sort, and no join may touch the blob lattice
    val p = plan("mm12_keyframes")
    assert(!p.contains("row_number()"), s"row_number in mm12:\n$p")
    assert(!p.contains("Join"), s"join in mm12:\n$p")
  }

  test("sk9 window-HLL estimates run on the register table, window-free") {
    // one corpus-sized (day, bucket) sketch shuffle; the trailing-
    // window merge is the days x days range join over register rows —
    // no SQL window function anywhere, no cartesian on the corpus
    // side (the tiny days x daily range join plans as BNL over
    // metadata-sized frames, which is fine — what must never appear
    // is a window or a corpus-side nested loop)
    val p = plan("sk9_hll_window")
    assert(!p.contains("windowspecdefinition"), s"window in sk9:\n$p")
  }

  test("t27 readability is a joinless zero-exchange projection") {
    // round 9: the forcast_shape codegen byte walk replaced the
    // explode → per-token regex → groupBy(doc_id) pipeline, so the
    // whole query is scan → project → sort — any join, window or
    // hash exchange means the single-pass kernel regressed back to
    // a shuffle shape
    val p = plan("t27_forcast_readability")
    assert(p.contains("forcast_shape"), s"kernel missing from t27:\n$p")
    assert(!p.contains("Join"), s"join in t27:\n$p")
    assert(!p.contains("windowspecdefinition"), s"window in t27:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(p).length
    assert(exchanges == 0, s"$exchanges exchanges in t27:\n$p")
  }

  test("sk6 AMS sketch reduces to one row with no join and no window") {
    // all 16 signed counters and the exact moment compute in a single
    // aggregate over the token counts — the 16-longs-of-state claim
    val p = plan("sk6_ams_f2")
    assert(!p.contains("Join"), s"join in sk6:\n$p")
    assert(!p.contains("windowspecdefinition"), s"window in sk6:\n$p")
  }

  test("mm10 shot boundaries is per-blob map work — no join anywhere") {
    val p = plan("mm10_shot_boundaries")
    assert(!p.contains("Join"), s"join in mm10:\n$p")
    assert(!p.contains("windowspecdefinition"), s"window in mm10:\n$p")
  }

  test("t28 RAKE stays doc-partitioned — no single-partition funnel") {
    // the phrase window, the rank window, both groupBys and both
    // joins all key on doc_id; a single-partition exchange would
    // mean one of them lost its partitioning
    val p = plan("t28_rake_keywords")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange in t28:\n$p")
    assert(p.contains("WindowGroupLimit"), s"top-3 unpruned in t28:\n$p")
  }

  test("g4 components read checkpointed CC state, not re-derived rounds") {
    // Dedup.connectedComponents localCheckpoints every round; the
    // presented plan must scan that materialization (g1 discipline) —
    // chained per-round joins here would mean plan depth grows with
    // the iteration count
    val p = plan("g4_connected_components")
    assert(p.contains("ExistingRDD"), s"g4 not checkpoint-backed:\n$p")
  }

  test("sk7 join-size sketch: broadcast bounds, no cartesian, no window") {
    // the source-bounds attach must be a broadcast (1-row side); the
    // sketch itself is one token-count shuffle + a single-row reduce
    val p = plan("sk7_join_size_est")
    assert(!p.contains("CartesianProduct"), s"cartesian in sk7:\n$p")
    assert(!p.contains("windowspecdefinition"), s"window in sk7:\n$p")
    assert(p.contains("Broadcast"), s"bounds not broadcast in sk7:\n$p")
  }

  test("sk8 HLL merge is pure aggregation — register-max, no window") {
    // the mergeability path must stay map-side-combinable groupBys
    // exactly like sk3; a window would break the partial-merge claim
    val p = plan("sk8_hll_merge")
    assert(!p.contains("windowspecdefinition"), s"window in sk8:\n$p")
  }

  test("mm11 silence gate is per-blob map work — no join anywhere") {
    val p = plan("mm11_audio_silence")
    assert(!p.contains("Join"), s"join in mm11:\n$p")
    assert(!p.contains("windowspecdefinition"), s"window in mm11:\n$p")
  }

  test("t31/t32: the only non-equi shape is the broadcast 1-row frame") {
    // the doc-count frame rides broadcast crossJoins (the sanctioned
    // metadata pattern); the gram layer itself must stay equi-joined
    for (q <- Seq("t31_heaps_growth", "t32_doc_novelty")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      assert(!p.contains("SortMergeJoin(condition"), s"$q non-equi SMJ")
    }
  }

  test("sk10: the position-set probe joins by broadcast, never SMJ") {
    val p = plan("sk10_bloom_membership")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), "bits/build should broadcast")
    assert(!p.contains("SortMergeJoin"),
      s"sketch-sized sides must not sort-merge:\n$p")
  }

  test("mm14 WAV header parse is a joinless scan projection") {
    val p = plan("mm14_wav_header")
    assert(!p.contains("Join"), s"join in mm14:\n$p")
    assert(!p.contains("windowspecdefinition"), s"window in mm14:\n$p")
  }

  test("mm15 video near-dup pairs only through the signature equi-join") {
    val p = plan("mm15_video_neardup")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("no query plans an unintended cartesian product") {
    // qd: deliberate 1×1 cross of two single-row aggregates.
    // s1: brute-force top-k broadcasts the query side into a
    //     non-equi join by design (the corpus scans once).
    val intended = Set("qd_semi_anti", "s1_cosine_topk")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(intended)
      .flatMap { n =>
        val p = plan(n)
        if (p.contains("CartesianProduct")) Some(s"$n: CartesianProduct")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
