package graft.adsb

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end replay of the reference's 2,069-line real capture
  * (`src/tests/adsb_message_stream.txt`) through parse → sessionize →
  * event detection — SURVEY.md §7.2's minimum slice. */
class ReplaySpec extends SparkSpec {

  private lazy val out =
    AdsbPipeline.replayFixture(spark, "adsb_message_stream.txt").cache()

  test("replay yields flights, positions and no orphan kinds") {
    val kinds = out.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.getOrElse("flight", 0L) > 0)
    assert(kinds.getOrElse("position", 0L) > 0)
    assert(kinds.keySet.subsetOf(Set("flight", "position", "landing", "takeoff")))
  }

  test("every position belongs to an emitted flight session") {
    val f = AdsbPipeline.flights(out).select("hexident", "session_start")
    val p = AdsbPipeline.positions(out).select("hexident", "session_start")
    assert(p.join(f, Seq("hexident", "session_start"), "left_anti").count() === 0)
  }

  test("flight first_seen <= last_seen and session keys unique") {
    val f = AdsbPipeline.flights(out)
    assert(f.where(col("first_seen") > col("last_seen")).count() === 0)
    assert(f.groupBy("hexident", "session_start").count()
      .where(col("count") > 1).count() === 0)
  }

  test("positions carry reference schema incl. always-null verticalrate/track") {
    // models.py:52-60 declares them; Flight.update never assigns them.
    val p = AdsbPipeline.positions(out)
    assert(p.columns.toSeq === Seq("hexident", "session_start", "time",
      "lon", "lat", "alt_m", "onground", "verticalrate", "track"))
    assert(p.where(col("verticalrate").isNotNull ||
      col("track").isNotNull).count() === 0)
  }

  test("deterministic across runs (same counts)") {
    val again = AdsbPipeline.replayFixture(spark, "adsb_message_stream.txt")
    assert(again.count() === out.count())
  }

  test("arrival-order mode equals event-time replay on monotone capture") {
    val arr = AdsbPipeline.process(
      graft.adsb.Sbs.messages(
        graft.adsb.Sbs.fixtureLines(spark, "adsb_message_stream.txt")),
      arrivalOrder = true)
    assert(arr.toDF().exceptAll(out.toDF()).count() === 0)
    assert(out.toDF().exceptAll(arr.toDF()).count() === 0)
  }
}
