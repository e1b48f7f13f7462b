package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** operators/Bloom — the portable (oracle-replayable) bloom lifted
  * from sk10 (round-11 verdict ask #6): bit-exact build, no false
  * negatives, empty-filter semantics, and the p4c composition that
  * keeps the prefilter output-invisible behind the exact confirm. */
class PortableBloomSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("no false negatives; empty filter matches nothing") {
    val keys = (0 until 200).map(i => s"key$i").toDF("k")
    val wm = Bloom.wordMap(Bloom.bits(keys, col("k"), m = 512, k = 2))
    val probes = ((0 until 200).map(i => s"key$i") ++
      (0 until 500).map(i => s"other$i")).toDF("k")
      .crossJoin(broadcast(wm))
    val pass = probes
      .where(Bloom.mightContain(col("k"), col("__bloom"), 512, 2))
      .select("k").as[String].collect().toSet
    // every built key passes (the bloom guarantee)
    (0 until 200).foreach(i => assert(pass(s"key$i"), s"key$i"))
    // and the filter prunes (m=512 on 200 keys: far from saturated)
    assert(pass.size < 700)

    val empty = Bloom.wordMap(Bloom.bits(
      keys.where(lit(false)), col("k"), m = 512, k = 2))
    val none = probes.drop("__bloom").crossJoin(broadcast(empty))
      .where(Bloom.mightContain(col("k"), col("__bloom"), 512, 2))
    assert(none.count() === 0)
  }

  test("wordMap packs exactly the bits frame's positions") {
    val keys = (0 until 50).map(i => s"v$i").toDF("k")
    val bits = Bloom.bits(keys, col("k"), m = 256, k = 3)
    val positions = bits.as[Long].collect().toSet
    val words = Bloom.wordMap(bits)
      .select(explode(col("__bloom"))).as[(Long, Long)].collect().toMap
    val unpacked = words.flatMap { case (w, bs) =>
      (0 until 64).filter(b => (bs & (1L << b)) != 0).map(w * 64 + _)
    }.toSet
    assert(unpacked === positions)
  }

  test("p4c portable prefilter + confirm ≡ p4 exact semi-join") {
    val p4 = graft.SparkEntry.queries("p4_contamination")(spark, sf)
    val p4c = graft.SparkEntry.queries("p4c_contamination_portable")(
      spark, sf)
    assert(p4c.collect().toSeq === p4.collect().toSeq)
    spark.catalog.clearCache()
  }

  test("p4c probe is map-side: no shuffle between scan and prefilter") {
    val df = graft.SparkEntry.queries("p4c_contamination_portable")(
      spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the packed-word filter rides a broadcast, never a sort-merge
    // exchange of probe rows
    assert(!p.contains("SortMergeJoin("), p.take(2000))
    spark.catalog.clearCache()
  }
}
