package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key capping for inverted-index / band-bucket equi-joins — the
  * d9 stop-gram idiom (`Dedup.containmentPairs`' `maxGramDf`) lifted
  * to a shared operator (round-11 verdict ask #2).
  *
  * The signature joins (mm15 frame signatures, t33 source trigrams,
  * HammingNN band buckets) materialize pairs ONLY through shared key
  * values — linear until one degenerate value dominates (an all-zero
  * frame, a whitespace chunk, a boilerplate gram: all real at crawl
  * scale), at which point that single key fans in quadratically and
  * owns the stage. The cap drops rows whose key value occurs in more
  * than `cap` rows, mirroring the analysis contract of stop-words: a
  * value shared by everything identifies nothing, so its pairs carry
  * no near-dup signal — only cost.
  *
  * Scale shape: one map-side-combinable count over the (already
  * materialized) key frame, then a broadcast ANTI join against the
  * hot list — which is tiny BY CONSTRUCTION (a key is hot only above
  * `cap` occurrences, so there are at most `n/cap` hot values). No
  * extra corpus shuffle; the probe side never exchanges.
  *
  * Callers surface what was capped rather than hiding it (the
  * no-silent-caps rule): mm15/t33 carry `n_capped_*` audit columns
  * counting each group's dropped keys, and HammingNN's fully-capped
  * keys surface as NULL-NN rows through its LEFT-join caller
  * contract. Every gate query's cap is mirrored in its DuckDB oracle
  * (the d9 rule: a cap the oracle does not model is a silent
  * divergence waiting for the sf where it first fires).
  */
object HotKeys {

  /** The hot-key audit frame: distinct key tuples occurring in more
    * than `cap` rows of `df`, with their counts as `n_rows`. Tiny by
    * construction (≤ rows/cap values) — safe to broadcast. */
  def hot(df: DataFrame, cap: Long, keys: String*): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > cap)

  /** `df` minus all rows whose key tuple is hot (occurs > `cap`
    * times). Pass a pre-computed [[hot]] frame when the caller also
    * audits it; otherwise it is derived here. */
  def drop(df: DataFrame, cap: Long, keys: String*): DataFrame =
    drop(df, hot(df, cap, keys: _*), keys: _*)

  def drop(df: DataFrame, hotKeys: DataFrame, keys: String*): DataFrame =
    df.join(broadcast(hotKeys.select(keys.map(col): _*)),
      keys.toSeq, "left_anti")
}
