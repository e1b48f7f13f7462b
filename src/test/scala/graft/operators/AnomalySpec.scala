package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized cross-check of the integer z² outlier predicate against
  * a naive sequential reference, plus the invariances the integer
  * form is supposed to buy: partition-count independence and exact
  * agreement on the 2σ boundary.
  */
class AnomalySpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new Random(11)

  // 3 groups × ~300 points: normal-ish bulk plus injected spikes
  private val rows: Seq[(String, Double)] =
    for {
      g <- Seq("a", "b", "c")
      i <- 1 to 300
    } yield {
      val bulk = 50.0 + rnd.nextGaussian() * 5.0
      val v = if (i % 97 == 0) bulk * 20 else bulk
      (g, math.max(0.01, (v * 100).round / 100.0))
    }

  private def referenceFlags(data: Seq[(String, Double)]): Set[(String, Long)] = {
    // the same arithmetic, sequentially, in BigInt — no Spark, no
    // decimal type, no partitioning
    data.groupBy(_._1).toSeq.flatMap { case (g, vs) =>
      val cents = vs.map(v => BigInt(math.floor(v._2 * 100 + 0.5).toLong))
      val n = BigInt(cents.size)
      val s = cents.sum
      val q = cents.map(c => c * c).sum
      cents.zipWithIndex.collect {
        case (c, i) if (n * c - s).pow(2) > 4 * (n * q - s * s) =>
          (g, i.toLong)
      }
    }.toSet
  }

  test("flag matches the sequential BigInt reference on random data") {
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (g, i.toLong, v) }
      .toDF("event_type", "idx", "value")
    val stats = Anomaly.referenceStats(df, col("event_type"), col("value"))
    val got = Anomaly.flag(df, stats).where(col("is_anomaly"))
      .select(col("event_type"), col("idx")).as[(String, Long)]
      .collect().toSet
    // idx is global; rebuild the reference keyed the same way
    val perGroupIdx = rows.zipWithIndex.groupBy(_._1._1)
      .map { case (g, xs) => g -> xs.map(_._2.toLong) }
    val want = referenceFlags(rows).map { case (g, i) =>
      (g, perGroupIdx(g)(i.toInt))
    }
    assert(got === want)
    assert(got.nonEmpty, "spikes must be flagged for the test to bite")
  }

  test("flags are invariant to partitioning") {
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (g, i.toLong, v) }
      .toDF("event_type", "idx", "value")
    def flagsOf(parts: Int): Set[Long] = {
      val d = df.repartition(parts)
      Anomaly.flag(d, Anomaly.referenceStats(d, col("event_type"),
          col("value")))
        .where(col("is_anomaly")).select(col("idx")).as[Long]
        .collect().toSet
    }
    assert(flagsOf(1) === flagsOf(7))
    assert(flagsOf(7) === flagsOf(32))
  }

  test("fail-closed ladder: poison magnitude, unknown group, NULL value") {
    val ref = Seq(("a", 10.0), ("a", 10.5), ("a", 9.5), ("a", 10.2))
      .toDF("event_type", "value")
    val stats = Anomaly.referenceStats(ref, col("event_type"),
      col("value"))
    val probe = Seq(
      ("a", Some(1.0e15)),   // beyond MaxAbsValue: cents would saturate
      ("a", Some(-1.0e15)),  // negative poison, same gate
      ("zz", Some(10.0)),    // group absent from stats: admitted
      ("zz", Some(1.0e15)),  // poison beats unknown-group admission
      ("a", None),           // NULL value: admitted (oracle CASE WHEN)
      ("a", Some(10.1)))     // ordinary in-band row: admitted
      .toDF("event_type", "value")
    val got = Anomaly.flag(probe, stats)
      .select(col("event_type"), col("value"), col("is_anomaly"))
      .as[(String, Option[Double], Boolean)].collect().toSet
    assert(got === Set(
      ("a", Some(1.0e15), true), ("a", Some(-1.0e15), true),
      ("zz", Some(10.0), false), ("zz", Some(1.0e15), true),
      ("a", None, false), ("a", Some(10.1), false)))
  }

  test("flag honors custom type/value column names symmetrically") {
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (g, i.toLong, v) }
      .toDF("kind", "idx", "amount")
    val stats = Anomaly.referenceStats(df, col("kind"), col("amount"))
    val got = Anomaly.flag(df, stats, typeName = "kind",
        valueCol = col("amount"))
      .where(col("is_anomaly")).select(col("idx")).as[Long]
      .collect().toSet
    // stats' key column is always emitted as event_type, whatever the
    // input column was called — the canonical run renames df to match
    val canonical = Anomaly.flag(
        df.withColumnRenamed("kind", "event_type")
          .withColumnRenamed("amount", "value"),
        stats)
      .where(col("is_anomaly")).select(col("idx")).as[Long]
      .collect().toSet
    assert(got === canonical)
    assert(got.nonEmpty)
  }
}
