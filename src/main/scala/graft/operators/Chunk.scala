package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the RAG / pretraining
  * sequence-prep primitive: fixed `w`-token windows every `stride`
  * tokens over each document's whitespace tokens.
  *
  * Window starts are `1, 1+stride, 1+2·stride, …` up to
  * `max(1, n − (w − stride))`, which guarantees BOTH invariants a
  * chunker needs:
  *  - coverage: the last start is ≥ `n − w + 1`, so every token of
  *    every document lands in at least one chunk;
  *  - progress: every start is ≤ `n − (w − stride)`, so every chunk
  *    contains at least `w − stride + 1` tokens not seen by the
  *    previous chunk — no fully-redundant trailing chunk is emitted.
  *
  * Scale design (100 TB corpus): chunks ship as md5 fingerprints +
  * `(doc_id, tok_start)` offsets, NEVER as materialized text — the
  * chunk table is what downstream embeds, joins and dedups on, and
  * re-slicing text from the source by offset at point of use is
  * cheaper than shuffling duplicated text (a `stride < w` chunker
  * that shipped text would amplify the corpus by `w/stride`×). The
  * whole operator is one generator expression per document — no join,
  * no shuffle past the scan; output order is the caller's concern.
  *
  * Beyond-reference training-data layer (SURVEY §2.5); the reference
  * engine has no document model at all.
  */
object Chunk {

  /** One row per (document, window): `doc_id`, `n_tokens`,
    * `n_chunks`, `chunk_id` (0-based), `tok_start` (1-based),
    * `chunk_tokens` (= `w` except a clipped final window) and
    * `chunk_hash` (md5 of the space-joined window). */
  def tokenWindows(docs: DataFrame, idCol: Column, textCol: Column,
      w: Int, stride: Int): DataFrame = {
    require(w > 0 && stride > 0 && stride <= w,
      s"need 0 < stride <= w, got w=$w stride=$stride")
    val base = docs
      .select(idCol.as("doc_id"), split(textCol, " ").as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("n"),
        sequence(lit(1),
          greatest(lit(1), size(col("t")) - (w - stride)),
          lit(stride)).as("starts"))
    base
      .select(col("doc_id"), col("t"), col("n"),
        size(col("starts")).as("nc"), posexplode(col("starts")))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        col("nc").cast("long").as("n_chunks"),
        col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("tok_start"),
        least(lit(w), col("n") - col("col") + 1).cast("long")
          .as("chunk_tokens"),
        md5(array_join(slice(col("t"), col("col"), lit(w)), " "))
          .as("chunk_hash"))
  }
}
