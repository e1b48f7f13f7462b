package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.adsb.{AdsbPipeline, Sbs}
import graft.operators.Histogram

/** The ADS-B domain pipeline replayed over the reference's own 2,069
  * message capture (bundled fixture). These are rows-only checks for
  * the driver (no SQL oracle can express the stateful pipeline); exact
  * semantics are pinned by the ScalaTest suite instead.
  */
object AdsbQueries {

  private def out(s: SparkSession) =
    AdsbPipeline.replayFixture(s, "adsb_message_stream.txt").cache()

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "adsb_parse" -> ((s, _) =>
      Sbs.parse(Sbs.fixtureLines(s, "adsb_message_stream.txt"))
        .orderBy(col("seq"))),

    "adsb_flights" -> ((s, _) =>
      AdsbPipeline.flights(out(s))
        .orderBy(col("hexident"), col("session_start"))),

    "adsb_positions" -> ((s, _) =>
      AdsbPipeline.positions(out(s))
        .orderBy(col("hexident"), col("time"))),

    "adsb_events" -> ((s, _) =>
      AdsbPipeline.events(out(s)).orderBy(col("time"))),

    // Q2 over the pipeline's own output: landings histogram binned in
    // Europe/Paris — the reference's flagship analytics shape fed by
    // its own ingest (SURVEY.md §7.2 end-to-end slice).
    "adsb_landings_histogram" -> ((s, _) => {
      val landings = AdsbPipeline.events(out(s))
        .where(col("kind") === "landing")
      Histogram.eventsHistogram(landings, col("time"),
        unix_micros(col("time").cast("timestamp")),
        "2019-10-20 00:00:00", "2019-10-20 23:00:00", "hour",
        Some("Europe/Paris"))
    })
  )

  val oracles: Map[String, String] = Map.empty
}
