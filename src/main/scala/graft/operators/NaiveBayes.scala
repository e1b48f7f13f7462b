package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine trained multinomial Naive Bayes text classifier — the
  * fastText-class "train a cheap model ON the corpus, score the
  * corpus" loop a curation pipeline runs for language-ID or quality
  * gating, with no ML runtime: training is counting, scoring is a
  * join, and both stay fully distributed.
  *
  * Arithmetic discipline (the proven t9/t11 convention): every
  * log-likelihood goes FIXED-POINT — `floor(1e6 · ln(p))` — before
  * any summation, so per-(doc,label) scores are exact BIGINT sums
  * (partition-order-invariant, bit-reproducible by a SQL oracle),
  * never float accumulations.
  *
  * Scale shape: one shuffle to per-(doc,tok) counts, which feed BOTH
  * the class-conditional model aggregation and the scoring join (a
  * Zipf-hot token joins once per containing doc, not per occurrence —
  * t4's rationale); the per-label totals/priors/vocab ride 1-row and
  * |labels|-row broadcasts; the (label × vocab) likelihood table is
  * NOT broadcast — the scoring join is a plain tok equi-join, so the
  * model can exceed driver memory at corpus scale. The score fan-out
  * is |labels|× the per-doc-token rows (bounded, |labels| is small
  * by construction). The argmax is a per-doc window over |labels|
  * rows, pruned by WindowGroupLimit.
  */
object NaiveBayes {

  /** Train on `docs`' own `labelCol` (add-one smoothing over the
    * corpus vocabulary) and classify every doc. Returns one row per
    * doc: (id, label, pred_label, correct, score_fp) where score_fp
    * is the predicted class's fixed-point log-posterior (prior +
    * Σ cnt·loglik, in 1e-6 units); ties break to the smallest label.
    * Self-classification accuracy read: `avg(correct)` — at scale,
    * train on a labeled slice and score the rest by splitting the
    * input beforehand (the operator only assumes `labelCol` is
    * present on the TRAINING rows it counts). */
  def selfClassify(docs: DataFrame, idCol: Column, labelCol: Column,
      textCol: Column): DataFrame = {
    val base = docs.select(idCol.as("id"), labelCol.as("label"),
      textCol.as("text"))
    val tok = base.select(col("id"), col("label"),
      explode(split(col("text"), " ")).as("tok"))
    // perDoc feeds the class-count aggregation AND the scoring join;
    // classTok feeds totals, vocab AND the scoring join — share()
    // both so the tokenize+count pipeline runs once, not per branch
    // (AQE exchange reuse does not cover these shapes; the p13/d11
    // lesson)
    val perDoc = Dedup.share(
      tok.groupBy(col("id"), col("label"), col("tok"))
        .agg(count(lit(1)).as("cnt")))
    // class-conditional counts from perDoc, not raw occurrences
    val classTok = Dedup.share(perDoc.groupBy(col("label"), col("tok"))
      .agg(sum(col("cnt")).as("ct")))
    val classTot = classTok.groupBy(col("label"))
      .agg(sum(col("ct")).as("tot"))
    val vocab = classTok.select(col("tok")).distinct()
      .agg(count(lit(1)).as("v"))
    val priors = base.groupBy(col("label")).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("nd_total"))))
      .select(col("label"),
        floor(log(col("nd").cast("double") / col("nd_total")) * 1000000.0d)
          .cast("long").as("prior_fp"))
    // per-label smoothing denominator + the unseen-token default
    val labelStats = classTot.crossJoin(broadcast(vocab))
      .select(col("label"), col("tot"), col("v"),
        floor(log(lit(1.0d) / (col("tot") + col("v")).cast("double")) *
          1000000.0d).cast("long").as("default_fp"))
    // score every (doc, label): per-doc tok counts × all labels,
    // left-joined against the class-conditional counts
    val scored = perDoc.select(col("id"), col("tok"), col("cnt"))
      .crossJoin(broadcast(labelStats.select(col("label").as("_l"),
        col("tot"), col("v"), col("default_fp"))))
      .join(classTok.select(col("label").as("_cl"), col("tok").as("_ct"),
          col("ct")),
        col("_l") === col("_cl") && col("tok") === col("_ct"), "left")
      .select(col("id"), col("_l").as("label"),
        (col("cnt") * coalesce(
          floor(log((col("ct") + 1).cast("double") /
            (col("tot") + col("v")).cast("double")) * 1000000.0d)
            .cast("long"),
          col("default_fp"))).as("sv"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("sv")).as("llsum"))
      .join(broadcast(priors), Seq("label"))
      .select(col("id"), col("label"),
        (col("llsum") + col("prior_fp")).as("score_fp"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score_fp").desc, col("label"))
    val pred = scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("id"), col("label").as("pred_label"), col("score_fp"))
    base.select(col("id"), col("label"))
      .join(pred, Seq("id"))
      .select(col("id"), col("label"), col("pred_label"),
        (col("label") === col("pred_label")).as("correct"), col("score_fp"))
  }
}
