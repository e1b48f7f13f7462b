package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98)
  * re-ranking: from a per-query candidate pool, iteratively select the
  * item maximizing λ·rel(q,c) − (1−λ)·max_{s∈selected} sim(c,s) — the
  * standard diversified-retrieval shape a training-data pipeline uses
  * to keep retrieved context batches from collapsing onto near-dups.
  *
  * Spark realization: MMR is inherently sequential in the SELECTION
  * dimension (pick i+1 depends on picks 1..i) but embarrassingly
  * parallel across QUERIES — so the loop runs as `selectK` bounded
  * declarative rounds over (queries × ≤topN)-row frames: each round
  * one equi-join against the selected set, a per-candidate max, and a
  * per-query window argmax. Cost scales with the QUERY BATCH
  * (topN + selectK·topN² rows per query), never the corpus; the
  * corpus-sized work happened upstream in the candidate generator
  * (s1 brute force, or any ANN index — the operator only sees
  * candidate frames). Each round eagerly localCheckpoints the
  * selected set (the [[Dedup.connectedComponents]] convention): plan
  * depth stays O(1) and the candidate generator is never re-executed
  * by the loop's growing lineage; the remaining set is derived per
  * round from the checkpointed inputs (c0 anti selected) rather than
  * carrying its own materialization.
  *
  * Engine-exactness: rel/pair similarities arrive ROUNDED (5 digits)
  * from the candidate builder; the marginal score is then a fixed
  * sequence of IEEE double ops on identical inputs, so ordering —
  * ties broken by smaller id — and the emitted `mmr_score` are
  * bit-reproducible (the same argument the s1 oracle rests on).
  */
object Mmr {

  /** Re-rank `cands` = (qid, vec_id, sim) using pairwise candidate
    * similarities `pairSims` = (qid, id_a, id_b, psim) — which must
    * cover BOTH directions of every unordered candidate pair per qid.
    * Returns (qid, vec_id, mmr_rank 1..selectK, mmr_score): rank 1 is
    * the pure-relevance argmax (score = sim), later ranks carry the
    * marginal score λ·sim − (1−λ)·max-sim-to-selected, rounded to
    * `roundDigits`. Queries with fewer than `selectK` candidates
    * yield as many ranks as they have. */
  def rerank(cands: DataFrame, pairSims: DataFrame, selectK: Int,
      lambda: Double = 0.5, roundDigits: Int = 6): DataFrame = {
    require(selectK >= 1, s"selectK $selectK < 1")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda $lambda outside [0,1]")
    // Round-16 (VERDICT r15 #1): both loop inputs re-pin to a
    // DATA-SIZE-driven hash(qid) partition count when the inherited
    // layout is more than 2× finer than the data warrants
    // ([[Parts.pin]]) — a candidate generator that hands over
    // core-count-fine micro-partitions no longer makes every
    // selection round schedule that many tasks, while the common
    // already-coarse case pays no extra materialization job (the
    // frames are query-batch-bounded by contract).
    val c0 = Parts.pin(
      cands.select(col("qid"), col("vec_id"), col("sim"))
        .localCheckpoint(true), // bounded: |queries|·topN rows
      col("qid"))
    val ps = Parts.pin(
      pairSims.select(col("qid"), col("id_a"), col("id_b"), col("psim"))
        .localCheckpoint(true), // bounded: |queries|·topN²
      col("qid"))
    val wFirst = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    var selected = c0
      .withColumn("_rn", row_number().over(wFirst)).where(col("_rn") === 1)
      .select(col("qid"), col("vec_id"), lit(1L).as("mmr_rank"),
        round(col("sim"), roundDigits).as("mmr_score"))
      .localCheckpoint(true)
    for (it <- 2 to selectK) {
      // remaining is DERIVED per round (round-15): c0 anti the
      // cumulative selected set — by induction identical to the
      // incrementally-maintained frame this replaces, but both inputs
      // are already-checkpointed RDDs, so the anti-join folds into
      // the round's one job instead of paying its own
      // materialization job per round (2 checkpoints/round → 1).
      val remaining = c0.join(selected.select(col("qid"), col("vec_id")),
        Seq("qid", "vec_id"), "left_anti")
      val psR = ps.select(col("qid").as("_pqid"), col("id_a"),
        col("id_b"), col("psim"))
      val mx = remaining
        .join(selected.select(col("qid"), col("vec_id").as("_sel")), Seq("qid"))
        .join(psR, col("_pqid") === col("qid") &&
          col("id_a") === col("vec_id") && col("id_b") === col("_sel"),
          "left")
        // inner semantics with a loud hole-check: a missing pair row
        // would silently skew max(); psim is non-null by the both-
        // directions contract, so any null here is caller error
        .groupBy(col("qid"), col("vec_id"))
        .agg(first(col("sim")).as("sim"), max(col("psim")).as("_mx"),
          count(lit(1)).as("_nsel"), count(col("psim")).as("_nps"))
      val scored = mx
        .withColumn("_mx",
          when(col("_nsel") =!= col("_nps"),
            raise_error(format_string(
              "MMR pairSims is missing pairs for qid=%d cand=%d",
              col("qid"), col("vec_id"))))
            .otherwise(col("_mx")))
        .withColumn("_score",
          lit(lambda) * col("sim") - lit(1.0 - lambda) * col("_mx"))
      val wPick = Window.partitionBy(col("qid"))
        .orderBy(col("_score").desc, col("vec_id"))
      val pick = scored
        .withColumn("_rn", row_number().over(wPick)).where(col("_rn") === 1)
        .select(col("qid"), col("vec_id"), lit(it.toLong).as("mmr_rank"),
          round(col("_score"), roundDigits).as("mmr_score"))
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    selected.orderBy(col("qid"), col("mmr_rank"))
  }
}
