package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-pair statistics — the first step of byte-pair-encoding
  * tokenizer training (Sennrich et al. 2016): count every adjacent
  * symbol pair across the corpus, weighted by word frequency, and
  * rank the merge candidates. A full BPE trainer iterates
  * count → merge-top-pair → recount; the COUNT step is the
  * corpus-scale part (the merge itself touches only the vocabulary),
  * so that is what the engine distributes.
  *
  * Scale design (100 TB corpus): occurrences collapse to the DISTINCT
  * word vocabulary first (one map-side-combinable groupBy — Zipf
  * makes the vocabulary tiny relative to the token stream), then
  * pairs explode from the VOCABULARY, never from raw occurrences: a
  * word seen a billion times contributes its pairs once, carried by
  * an integer weight. Pair rows are 2-char strings + longs — no text
  * amplification past the word collapse.
  */
object Bpe {

  /** Top `topK` adjacent character pairs: `pair`, `n` (occurrences
    * across the corpus, weighted by word frequency — a pair occurring
    * twice in one word counts twice), `n_words` (distinct words
    * containing the pair). Ties break on `pair` ascending, so the
    * cut at `topK` is deterministic. Words shorter than 2 characters
    * have no pairs and drop out naturally. */
  def mergePairs(docs: DataFrame, textCol: Column, topK: Int): DataFrame = {
    require(topK > 0, s"need topK > 0, got $topK")
    val wc = docs
      .select(explode(split(textCol, " ")).as("word"))
      .where(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    wc
      .select(col("word"), col("freq"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("n"),
        count_distinct(col("word")).as("n_words"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }
}
