package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.adsb.{AdsbPipeline, Meta, Sbs}
import graft.operators.{Histogram, Multimodal}

/** The ADS-B domain pipeline replayed over the reference's own 2,069
  * message capture (bundled fixture). These are rows-only checks for
  * the driver (no SQL oracle can express the stateful pipeline); exact
  * semantics are pinned by the ScalaTest suite instead.
  */
object AdsbQueries {

  // One cached replay per session: five queries read it, and Bench
  // runs them all in one JVM — re-parsing per query would quintuple
  // the fixture cost.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      org.apache.spark.sql.Dataset[graft.adsb.FlightStateMachine.Out]]()

  private def out(s: SparkSession) =
    memo.computeIfAbsent(s,
      _ => AdsbPipeline.replayFixture(s, "adsb_message_stream.txt").cache())

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
    // its own ingest (SURVEY.md §7.2 end-to-end slice). The call is
    // the reference idiom landings_histogram(date, date, 'hour'):
    // a day-granularity `ends` whose final day the +23 h spine
    // extension covers (create_public_schema.sql:189).
    "adsb_landings_histogram" -> ((s, _) => {
      val landings = AdsbPipeline.events(out(s))
        .where(col("kind") === "landing")
      Histogram.eventsHistogram(landings, col("time"),
        unix_micros(col("time").cast("timestamp")),
        "2019-10-20 00:00:00", "2019-10-20 00:00:00", "hour",
        Some("Europe/Paris"))
    }),

    // T7: per-flight transmission-type census (pivot 1..8).
    "adsb_type_census" -> ((s, _) =>
      Sbs.parse(Sbs.fixtureLines(s, "adsb_message_stream.txt"))
        .groupBy(col("hexident"))
        .pivot("transmission_type", (1 to 8).map(Int.box).toSeq)
        .count()
        .orderBy(col("hexident"))),

    // Q11: flights ⟕ airlines (expression equi-join on
    // substring(callsign,1,3) = icao) ⟕ countries — the
    // landings_on_details shape with the real openflights dims.
    "adsb_flight_details" -> ((s, _) => {
      val flights = AdsbPipeline.flights(out(s))
      val airlines = Meta.loadAirlines(s)
      val countries = Meta.loadCountries(s)
      flights
        .join(broadcast(airlines),
          substring(flights("callsign"), 1, 3) === airlines("icao"), "left")
        .join(broadcast(countries),
          airlines("country") === countries("name"), "left")
        .select(flights("hexident"), flights("session_start"),
          flights("callsign"),
          airlines("name").as("airline"), airlines("country"),
          countries("code").as("country_code"),
          flights("first_seen"), flights("last_seen"))
        .orderBy(flights("hexident"), flights("session_start"))
    }),

    // Q14: GeoJSON metadata views over the seed airport/runway geometry.
    "meta_airports_geojson" -> ((s, _) => Meta.airportsGeoJson(s)),
    "meta_runways_geojson" -> ((s, _) => Meta.runwaysGeoJson(s)),

    // S5 + multimodal: silhouette BMP blobs → typed metadata +
    // stubbed feature vector (plumbing real, decode deterministic).
    // The embedding is emitted as a fixed-precision comma-joined string:
    // the driver's rows-only check sorts result columns with pandas,
    // which cannot hash array cells (observed TypeError in round 1).
    "mm_media_features" -> ((s, _) => {
      val bin = Meta.loadAircraftSilhouettes(s, Meta.silhouettesDir())
      Multimodal.withFakeMetadata(bin, col("silhouette"))
        .withColumn("embedding", Multimodal.fakeEmbedding(col("silhouette")))
        .select(col("model"), col("length"), col("media_type"),
          col("width"), col("height"),
          array_join(transform(col("embedding"),
            e => format_string("%.6f", e)), ",").as("embedding"))
        .orderBy(col("model"))
    })
  )

  val oracles: Map[String, String] = Map.empty
}
