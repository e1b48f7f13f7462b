package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hamming nearest-neighbor over 64-bit [hi, lo] fingerprints — the
  * shared NN readout behind the perceptual-hash queries (mm3 aHash,
  * mm6 dHash, mm7 audio fingerprint).
  *
  * Scale contract (round-9: the last unconditional all-pairs shape in
  * the repo, now routed): corpora at or below `pairwiseLimit` rows
  * pay the exact all-pairs join (tiny inputs — the fixture corpora
  * are 6–10 blobs — where an LSH index is pure overhead and the NN
  * must be exact at any distance); anything larger goes through the
  * mm4-style band-bucket candidate join: the 64-bit hash splits into
  * four 16-bit bands, keys sharing any band bucket become candidates,
  * and only candidates pay the XOR/popcount verify. By pigeonhole,
  * any pair within hamming ≤ 3 shares at least one band, so on the
  * banded path the reported neighbor is exact whenever the true NN is
  * within 3 bits (the near-dup regime this readout feeds) and
  * candidate-best otherwise; keys whose hash shares no band with any
  * other key yield no row — at 100 TB "nearest unrelated blob" is
  * not a meaningful (or computable) question, near-dup detection is.
  * CALLER CONTRACT (round-10, the ADVICE r9 visibility fix): join the
  * readout back with a LEFT join — band-isolated keys then surface as
  * NULL nn_/nn_hamming rows instead of silently vanishing from the
  * result above `pairwiseLimit` (mm3/mm6/mm7/d19 all do).
  *
  * Top-1 per key is a partial-aggregable `min(struct(hamming, other))`
  * — same (distance asc, key asc) deterministic vote as a
  * row_number window, without the full window sort; band-duplicate
  * candidate pairs (a pair can share several bands) need no distinct,
  * the min is duplicate-insensitive.
  */
object HammingNN {

  /** `(key, nn_<key>, nn_hamming)` — each key's hamming-nearest other
    * key, ties to the smallest key. `hashed` must carry one row per
    * key with 64-bit halves in `hi`/`lo`.
    *
    * `maxBucket` (banded path only) is the [[HotKeys]] cap on one
    * band bucket's population: a degenerate hash shared by more than
    * `maxBucket` keys (all-zero frames, whitespace chunks) would fan
    * in quadratically inside its bucket, so its buckets are dropped
    * from candidate generation — those keys' pairs carry no near-dup
    * signal (everything matches everything) and a key ALL of whose
    * buckets are capped surfaces as a NULL-NN row through the
    * LEFT-join caller contract, which is the audit. Gate callers
    * mirror the cap in their oracle SQL (d19).
    */
  def nearest(hashed: DataFrame, key: String, hi: String, lo: String,
      pairwiseLimit: Long = 4096, maxBucket: Long = 4096,
      crossGroup: Option[String] = None): DataFrame = {
    // EAGER localCheckpoint before the routing count (round-11, the
    // ADVICE r10 pin-leak fix): the upstream hash pipeline (BMP pixel
    // walk / PCM fingerprint parse) runs exactly ONCE — the count and
    // both self-join sides read the checkpointed (key + 16 B)/row
    // blocks. Unlike the round-10 persist(), this registers NO
    // cache-catalog entry a resident service would have to clearCache
    // away: the blocks are RDD-scoped and the ContextCleaner reclaims
    // them when the returned (lazy) readout frame is dropped. The
    // readout itself stays lazy, so the caller's single action is the
    // only execution of the band join + aggregate.
    val base = hashed.select(
      (Seq(col(key).as("__k"), col(hi).as("__hi"), col(lo).as("__lo")) ++
        crossGroup.map(g => col(g).as("__g"))): _*)
      .localCheckpoint(true)
    // cross-group mode (round-12, mm19): the NN must come from a
    // DIFFERENT group (another video's frames) — filtering the
    // readout after the min would be wrong (the global NN may be an
    // adjacent same-group frame), so the restriction rides the pair
    // join itself on both routing shapes
    def ok = crossGroup.map(_ => col("a.__g") =!= col("b.__g"))
      .getOrElse(col("a.__k") =!= col("b.__k"))
    def ham = (bit_count(col("a.__hi").bitwiseXOR(col("b.__hi"))) +
      bit_count(col("a.__lo").bitwiseXOR(col("b.__lo"))))
      .cast("long").as("hamming")
    // one cheap driver-side count decides the join shape — the same
    // adaptive-threshold discipline as Similarity's blocked fallback
    val pairs =
      if (base.count() <= pairwiseLimit)
        // explicit broadcast: the count just PROVED this side fits
        // (≤ pairwiseLimit rows of key + 16 B), so the all-pairs
        // join must plan as a broadcast nested loop regardless of
        // what size the optimizer estimates for the checkpointed
        // upstream (a CartesianProduct here would shuffle-split both
        // sides for a join the branch exists to keep trivially small)
        base.as("a").join(broadcast(base.as("b")),
            col("a.__k") =!= col("b.__k") && ok)
          .select(col("a.__k").as("__k"), col("b.__k").as("other"), ham)
      else {
        val bands = base.select((Seq(col("__k"), col("__hi"), col("__lo")) ++
          crossGroup.map(_ => col("__g")) :+
          posexplode(array(
            col("__lo").bitwiseAND(lit(0xFFFFL)),
            shiftrightunsigned(col("__lo"), 16).bitwiseAND(lit(0xFFFFL)),
            col("__hi").bitwiseAND(lit(0xFFFFL)),
            shiftrightunsigned(col("__hi"), 16).bitwiseAND(lit(0xFFFFL))))): _*)
          .select((Seq(col("__k"), col("__hi"), col("__lo")) ++
            crossGroup.map(_ => col("__g")) ++
            Seq(col("pos").as("band"), col("col").as("bv"))): _*)
        // hot-bucket cap: one count over the 4-rows-per-key band
        // frame, then a broadcast anti-join (HotKeys scaladoc for why
        // the hot list is tiny by construction)
        val capped = HotKeys.drop(bands, maxBucket, "band", "bv")
        capped.as("a").join(capped.as("b"),
            col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
              col("a.__k") =!= col("b.__k") && ok)
          .select(col("a.__k").as("__k"), col("b.__k").as("other"), ham)
      }
    pairs.groupBy(col("__k"))
      .agg(min(struct(col("hamming").as("hamming"), col("other").as("other")))
        .as("t"))
      .select(col("__k").as(key), col("t.other").as(s"nn_$key"),
        col("t.hamming").as("nn_hamming"))
  }
}
