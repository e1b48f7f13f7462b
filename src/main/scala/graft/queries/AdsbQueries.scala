package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.adsb.{AdsbPipeline, Meta, Sbs}
import graft.adsb.FlightStateMachine.Out
import org.apache.spark.sql.Dataset
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

  // The reference capture spans 1.65 s with zero onground flips, so
  // its events output is structurally empty (correct, oracle-pinned).
  // The golden fixture replays the reference's own landing sequences
  // (src/tests/__init__.py:19-30) plus a takeoff so the event path is
  // exercised end-to-end with non-empty output in the driver gate.
  private val goldenMemo =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      org.apache.spark.sql.Dataset[graft.adsb.FlightStateMachine.Out]]()

  private def goldenOut(s: SparkSession) =
    goldenMemo.computeIfAbsent(s,
      _ => AdsbPipeline.replayFixture(s, "adsb_golden_landings.txt").cache())

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

    "adsb_events_golden" -> ((s, _) =>
      AdsbPipeline.events(goldenOut(s))
        .orderBy(col("time"), col("hexident"))),

    "adsb_event_details_golden" -> ((s, _) =>
      eventDetails(goldenOut(s), Meta.loadAirlines(s), Meta.loadCountries(s))),

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

    // Q8 on the domain's own data: the reference's flight_path(id) —
    // ST_MakeLine(ST_Force2D(coordinates) ORDER BY time) per flight
    // session (create_public_schema.sql:207-218), emitted as GeoJSON.
    "adsb_flight_paths" -> ((s, _) =>
      graft.operators.Paths.pathGeoJson(
        AdsbPipeline.positions(out(s)),
        concat_ws("/", col("hexident"), col("session_start")),
        col("time"), concat_ws(",", col("lon"), col("lat")),
        col("lon"), col("lat"), precision = 6)
        .orderBy(col("key"))),

    // Q11 event-side composite: the reference's GraphQL workhorse
    // landings_on_details/takeoffs_on_details event type.
    "adsb_event_details" -> ((s, _) =>
      eventDetails(out(s), Meta.loadAirlines(s), Meta.loadCountries(s))),

    // Q14: GeoJSON metadata views over the seed airport/runway geometry
    // and the WKB-seeded range rings.
    "meta_airports_geojson" -> ((s, _) => Meta.airportsGeoJson(s)),
    "meta_runways_geojson" -> ((s, _) => Meta.runwaysGeoJson(s)),
    "meta_range_rings_geojson" -> ((s, _) => Meta.rangeRingsGeoJson(s)),

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
    }),

    // mm2: the full multimodal retrieval composition — media blobs →
    // batched per-partition decode (the mapInPandas-analog with a
    // deterministic stub decoder) → embedding column → cosine top-k
    // among the media themselves. This is the pipeline shape a real
    // image-dedup / visual-search run has; only the decoder body is
    // stubbed (no media libs in the sandbox), every Spark stage —
    // batch boundaries, schema contract, null-blob tolerance, the
    // similarity join — is real. Rows-only (stub-derived scores).
    "mm2_media_similarity" -> ((s, _) => {
      val bin = Meta.loadAircraftSilhouettes(s, Meta.silhouettesDir())
      val emb = Multimodal.decodeEmbedBatched(bin, col("model"),
          col("silhouette"), dim = 8, batchSize = 4)
        .select(col("key"),
          col("embedding").cast("array<float>").as("embedding"))
      val q = emb.select(col("key").as("qid"),
        col("embedding").as("qvec"))
      graft.operators.Similarity.bruteForceTopK(
          q, emb.withColumnRenamed("key", "vec_id"), k = 3)
        .orderBy(col("qid"), col("rank"))
    })
  )

  val oracles: Map[String, String] = Map.empty

  /** The reference's `event` composite type
    * (`create_graphql_functions.sql:3-15`): landing/takeoff events
    * joined to their flight (inner) then airlines ⟕ countries,
    * producing (id, flight_id, callsign, airline, country,
    * country_code, first_seen, last_seen, time, runway) exactly as
    * `landings_on_details`/`takeoffs_on_details` (`:30-95`) do.
    *
    * The reference's serial ids are surrogate join keys, not
    * semantics (SURVEY §1.3) — here they are derived DETERMINISTICALLY
    * from the natural keys (`xxhash64` of (hexident, session_start)
    * for flights, plus (time, kind) for events): no global
    * no-partition window assigning row_numbers, so the id assignment
    * is embarrassingly parallel at any scale. The only total order is
    * the final presentation sort by event time. */
  def eventDetails(out: Dataset[Out], airlines: DataFrame,
      countries: DataFrame): DataFrame = {
    // events and flights share the `out` lineage — alias both sides so
    // Spark's ambiguous-self-join detection sees qualified columns.
    val flights = AdsbPipeline.flights(out)
      .withColumn("flight_id",
        xxhash64(col("hexident"), col("session_start"))).as("f")
    val events = AdsbPipeline.events(out)
      .withColumn("id",
        xxhash64(col("hexident"), col("session_start"), col("time"),
          col("kind"))).as("e")
    events
      .join(flights, col("e.hexident") === col("f.hexident") &&
        col("e.session_start") === col("f.session_start"))
      .join(broadcast(airlines.as("a")),
        substring(col("f.callsign"), 1, 3) === col("a.icao"), "left")
      .join(broadcast(countries.as("c")),
        col("a.country") === col("c.name"), "left")
      .select(col("e.id"), col("f.flight_id"), col("f.callsign"),
        col("a.name").as("airline"), col("a.country"),
        col("c.code").as("country_code"),
        col("f.first_seen"), col("f.last_seen"),
        col("e.time"), col("e.runway"))
      .orderBy(col("time"), col("id"))
  }
}
