package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the routed hamming-NN readout (round-9: the mm3/mm6/mm7
  * all-pairs joins normalized onto [[HammingNN]]):
  *  - at/below the pairwise threshold the result is the exact
  *    window-formulation NN (distance asc, key asc ties);
  *  - above it, the band-bucket path returns the SAME neighbor for
  *    every key whose true NN is within hamming ≤ 3 (the pigeonhole
  *    guarantee over four 16-bit bands);
  *  - the banded plan contains no cartesian / nested-loop join — the
  *    scale shape that makes the readout runnable on a real corpus.
  */
class HammingNNSpec extends SparkSpec {
  import spark.implicits._

  // planted geometry: (k0, k1) hamming 3 (near-dup pair), k2 equal to
  // k3 (hamming 0), k4..k7 far from everything (any shared band they
  // do hit — k4's lo reuses k2's 0x5555 at pos 3 — only adds a
  // far-candidate row, which the generic assertions cover)
  private val rows = Seq(
    ("k0", 0x1234567812345678L, 0x0F0F0F0F0F0F0F0FL),
    ("k1", 0x1234567812345679L, 0x0F0F0F0F0F0F0F0CL), // 1+2 bits off k0
    ("k2", 0x00000000AAAAAAAAL, 0x5555555500000000L),
    ("k3", 0x00000000AAAAAAAAL, 0x5555555500000000L),
    ("k4", 0x1111222233334444L, 0x5555666677778888L),
    ("k5", 0x9999AAAABBBBCCCCL, 0xDDDDEEEE00FF1122L),
    ("k6", 0x0123456789ABCDEFL, 0xFEDCBA9876543210L),
    ("k7", 0x2468ACE013579BDFL, 0x8642FDB97531ECA0L))

  private def df = rows.toDF("k", "hi", "lo")

  test("pairwise path matches the window formulation it replaced") {
    import org.apache.spark.sql.expressions.Window
    val hashed = df
    val pairs = hashed.as("a").join(hashed.as("b"),
        col("a.k") =!= col("b.k"))
      .select(col("a.k").as("k"), col("b.k").as("other"),
        (bit_count(col("a.hi").bitwiseXOR(col("b.hi"))) +
          bit_count(col("a.lo").bitwiseXOR(col("b.lo"))))
          .cast("long").as("hamming"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("hamming"), col("other"))
    val legacy = pairs.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("k"), col("other").as("nn_k"),
        col("hamming").as("nn_hamming"))
      .orderBy("k").collect().toSeq
    val routed = HammingNN.nearest(df, "k", "hi", "lo")
      .orderBy("k").collect().toSeq
    assert(routed == legacy)
  }

  test("banded path agrees with pairwise for every near-dup (hamming <= 3)") {
    val exact = HammingNN.nearest(df, "k", "hi", "lo",
        pairwiseLimit = Long.MaxValue)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val banded = HammingNN.nearest(df, "k", "hi", "lo", pairwiseLimit = 0)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val nearKeys = exact.filter(_._2._2 <= 3).keySet
    assert(nearKeys == Set("k0", "k1", "k2", "k3")) // geometry sanity
    nearKeys.foreach { k => assert(banded.get(k).contains(exact(k)), k) }
    // far-NN keys may legitimately be absent from the banded result;
    // any row it DOES return must be a real candidate-best pair
    banded.foreach { case (k, (o, h)) =>
      assert(h >= exact(k)._2, s"$k: banded $h better than exact?")
      assert(rows.exists(_._1 == o))
    }
  }

  test("banded plan has no cartesian / nested-loop join") {
    val p = HammingNN.nearest(df, "k", "hi", "lo", pairwiseLimit = 0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
