package graft.adsb

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.adsb.FlightStateMachine.Out

/** Batch replay of the reference's streaming ingest (SURVEY.md §3.1):
  * parse → filter/admission → per-hexident event-time sessionization →
  * positions + flights + runway-attributed landing/takeoff events.
  *
  * Spark shape: one `groupByKey(hexident)` shuffle; each group is
  * sorted in memory (per-aircraft message counts are bounded by session
  * activity, not table size) and folded through
  * [[FlightStateMachine]] — the same transition function the streaming
  * operator uses, so batch and streaming agree by construction.
  */
object AdsbPipeline {

  private[graft] def orderKey(m: AdsbMsg): (Long, Long) =
    (FlightStateMachine.micros(m.gen_date_time), m.seq)

  /** Full tagged output of the pipeline.
    *
    * `arrivalOrder = true` folds messages in arrival (seq) order — the
    * reference's exact live behavior, which never reorders
    * (`adsb_logger.py:40-66`, T12). The default event-time order is
    * the deterministic replay semantics (identical when the input is
    * time-monotone, as real captures are). */
  def process(
      msgs: Dataset[AdsbMsg],
      below: Int = FlightStateMachine.AltitudeBelow,
      above: Int = FlightStateMachine.AltitudeAbove,
      arrivalOrder: Boolean = false): Dataset[Out] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    msgs.groupByKey(_.hexident).flatMapGroups { (_, it) =>
      val sorted =
        if (arrivalOrder) it.toArray.sortBy(_.seq)
        else it.toArray.sortBy(orderKey)
      FlightStateMachine.processSorted(sorted.iterator, below, above)
    }
  }

  /** `flights` table (`create_public_schema.sql:539-549` analog). */
  def flights(out: Dataset[Out]): DataFrame =
    out.where(col("kind") === "flight")
      .select(col("hexident"), col("session_start"),
        col("first_seen"), col("last_seen"), col("callsign"),
        col("n_positions"), lit("unknown").as("intention"))

  /** `positions` table (`create_public_schema.sql:606-617` analog);
    * the PointZ geometry is the (lon, lat, alt_m) triple. */
  def positions(out: Dataset[Out]): DataFrame =
    out.where(col("kind") === "position")
      .select(col("hexident"), col("session_start"), col("time"),
        col("lon"), col("lat"), col("alt_m"), col("onground"))

  /** `landings` ∪ `takeoffs` rows with attributed runway. */
  def events(out: Dataset[Out]): DataFrame =
    out.where(col("kind") === "landing" || col("kind") === "takeoff")
      .select(col("kind"), col("hexident"), col("session_start"),
        col("time"), col("runway"))

  /** End-to-end replay of a fixture corpus. */
  def replayFixture(spark: SparkSession, name: String,
      below: Int = 100000): Dataset[Out] =
    process(Sbs.messages(Sbs.fixtureLines(spark, name)), below = below)
}
