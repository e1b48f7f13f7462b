package graft.adsb

import scala.math.{atan2, toDegrees}

/** Minimal planar geometry matching the semantics the reference uses
  * from shapely: polygon-contains (strict interior), heading tolerance,
  * and two-point track interpolation.
  *
  * Reference: dump1090-postgis `src/dump1090_postgis/airports.py:44-67`
  * (point_in / same_heading), `src/dump1090_postgis/shared.py:5-50`
  * (feet2m / angle2compass / interpolate_track).
  */
object Geometry {

  final case class Pt(x: Double, y: Double)

  val FeetToM = 0.3048
  val GndAltitudeM = 0.0
  val DirectionTolDeg = 20.0

  def feet2m(ft: Double): Double = FeetToM * ft

  /** Mathematical angle → compass direction, `shared.py:31-33`. */
  def angle2compass(deg: Double): Double = {
    val r = (450.0 - deg) % 360.0
    if (r < 0) r + 360.0 else r
  }

  /** Heading from two chronological positions via atan2 on planar
    * lon/lat deltas → compass (`shared.py:36-50`). */
  def interpolateTrack(x1: Double, y1: Double, x2: Double, y2: Double): Double =
    angle2compass(toDegrees(atan2(y2 - y1, x2 - x1)))

  /** Ray-casting point-in-polygon; boundary points are excluded like
    * shapely's `contains` (strict interior) for the generic-position
    * points the pipeline sees (`airports.py:49`). */
  def contains(poly: IndexedSeq[Pt], p: Pt): Boolean = {
    var inside = false
    var i = 0
    val n = poly.length
    var j = n - 1
    while (i < n) {
      val a = poly(i); val b = poly(j)
      if ((a.y > p.y) != (b.y > p.y) &&
          p.x < (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** `same_heading` with inclusive ±tol (`airports.py:51-67`), on the
    * CIRCLE: direction 10 vs heading 355 is 15° apart, not 345 — a
    * plain abs difference would silently unattribute (and drop)
    * events on runways whose ±tol band straddles north. Latent for
    * the shipped NTE runways (30/210) but load-bearing for any
    * runway numbered near 36/00. */
  def sameHeading(direction: Double, heading: Double,
      tol: Double = DirectionTolDeg): Boolean = {
    val d = ((direction - heading) % 360.0).abs
    math.min(d, 360.0 - d) <= tol
  }
}

/** Runway / airport models + the NTE (LFRS) seed instances.
  * Data from `src/dump1090_postgis/airports.py:129-164` (also present
  * as DB rows in `database/sql/create_meta_schema.sql:242-268`).
  */
object Airports {
  import Geometry._

  final case class Runway(name: String, refLon: Double, refLat: Double,
      refAltitudeM: Double, direction: Double, bbox: IndexedSeq[Pt],
      lengthM: Double) {
    def pointIn(p: Pt): Boolean = contains(bbox, p)
  }

  final case class Airport(icao: String, iata: String, lon: Double,
      lat: Double, altitudeM: Double, bbox: IndexedSeq[Pt],
      runways: Seq[Runway]) {

    def pointIn(p: Pt): Boolean = contains(bbox, p)

    /** Runway attribution with airport-bbox fallback, preserving the
      * first-match-in-declaration-order semantics
      * (`airports.py:90-125`). */
    def getRunway(p: Pt, heading: Double): Option[Runway] =
      runways.find(r => r.pointIn(p) && sameHeading(r.direction, heading))
        .orElse(runways.find(r => pointIn(p) && sameHeading(r.direction, heading)))
  }

  private val nteStrip = IndexedSeq(
    Pt(-1.619792, 47.141703), Pt(-1.603446, 47.163170),
    Pt(-1.602936, 47.162999), Pt(-1.619280, 47.141525))

  val NteRunway03: Runway =
    Runway("03", -1.617302, 47.144537, 27, 30, nteStrip, 2900)
  val NteRunway21: Runway =
    Runway("21", -1.605619, 47.159876, 27, 210, nteStrip, 2900)

  // Bug-compatible with the reference: airports.py:150 passes
  // (47.156944, -1.607778) into (lon, lat) positions — lat/lon
  // swapped. Harmless there and here (the airport point is only a
  // label; all containment math uses the bbox), and reproduced
  // verbatim for parity.
  val Nte: Airport = Airport("LFRS", "NTE", 47.156944, -1.607778, 27,
    IndexedSeq(
      Pt(-1.621437, 47.142339), Pt(-1.603608, 47.165234),
      Pt(-1.596542, 47.162784), Pt(-1.600891, 47.153871),
      Pt(-1.617134, 47.140760)),
    Seq(NteRunway03, NteRunway21))

  val Known: Seq[Airport] = Seq(Nte)

  /** First matching runway across known airports (`flights.py:155-187`:
    * the manager stops at the first airport that attributes one). */
  def attribute(lon: Double, lat: Double, heading: Double): Option[String] = {
    val p = Pt(lon, lat)
    Known.iterator.flatMap(_.getRunway(p, heading)).map(_.name).nextOption()
  }
}
