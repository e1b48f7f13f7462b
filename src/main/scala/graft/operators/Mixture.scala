package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixture/resampling policies beyond fixed integer ratios
  * (those are the p6 shape, `DocQueries.mixtureSample`).
  *
  * Temperature sampling is the multilingual-pretraining standard
  * (mT5/XLM-R style): with group share p_g, sample groups
  * proportional to p_g^(1/T) — T=1 is natural frequency, T→∞ is
  * uniform. Realized as a deterministic per-group KEEP RATE
  * r_g = (n_min/n_g)^(1-1/T) (the smallest group keeps 100%, the
  * expected kept count per group is then ∝ p_g^(1/T)), applied by
  * portable content-hash threshold — no RNG, bit-reproducible across
  * engines, runs and partitionings, and duplicate texts always land
  * together.
  *
  * Scale shape: one map-side-combinable groupBy for the counts
  * (|groups| rows), a 1-row min, the |groups|-row rate table
  * broadcast into a map-side filter — the corpus is scanned once and
  * never shuffled.
  */
object Mixture {

  /** Kept rows of `docs` under temperature-`t` resampling over
    * `groupCol`. `hashCol` must be a 60-bit portable hash column
    * (e.g. `PortableHash.phash(col("text"), seed)`).
    *
    * Engine-exactness: at the default T=2 the rate is
    * `sqrt(n_min/n_g)` — sqrt and division are IEEE
    * correctly-rounded in every engine, so `floor(1e6·rate)` is
    * bit-identical and the keep set has an exact SQL oracle. Other
    * temperatures go through `pow`, which libms only guarantee to
    * ~1 ulp — fine in production, but a cross-engine oracle on a
    * threshold boundary could flip; keep gate queries on T=2. */
  def temperatureSample(docs: DataFrame, groupCol: Column,
      hashCol: Column, temperature: Double = 2.0,
      scale: Long = 1000000L): DataFrame = {
    require(temperature >= 1.0, s"temperature $temperature < 1")
    val counts = docs.groupBy(groupCol.as("_grp"))
      .agg(count(lit(1)).as("_n"))
    val nmin = counts.agg(min(col("_n")).as("_nmin"))
    val frac = col("_nmin").cast("double") / col("_n")
    val alpha = 1.0 - 1.0 / temperature
    val rate =
      if (temperature == 2.0) sqrt(frac) // correctly-rounded path
      else pow(frac, lit(alpha))
    val thresh = counts.crossJoin(broadcast(nmin))
      .select(col("_grp"),
        floor(lit(scale.toDouble) * rate).cast("long").as("_thresh"))
    // null-safe join: groupBy above counts a NULL group like any
    // other, so the join must match it too — with plain ===, NULL
    // rows would inflate n_min (collapsing every group's rate) while
    // themselves silently vanishing from the output
    docs.join(broadcast(thresh), groupCol <=> col("_grp"))
      .where(pmod(hashCol, lit(scale)) < col("_thresh"))
      .drop("_grp", "_thresh")
  }
}
