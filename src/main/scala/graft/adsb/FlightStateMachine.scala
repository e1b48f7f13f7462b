package graft.adsb

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import scala.collection.mutable.ArrayBuffer

/** The per-aircraft flight state machine — the one genuinely bespoke
  * piece of the rebuild (SURVEY.md §7.3). Encodes, in event time:
  *
  *  - admission: a new session opens only on MSG type 2, or type 3
  *    passing the altitude filter (`flights.py:92-93`); other message
  *    types for unknown aircraft are dropped;
  *  - session expiry: a gap > `maxAgeSec` since `last_seen` closes the
  *    session (`flights.py:18,111-117` — the reference prunes on wall
  *    clock; replay here uses the event-time equivalent);
  *  - per-type field projection `MSG_FIELDS` (`models.py:161-190`);
  *    `last_seen` updates from ANY message type;
  *  - position append: MSG3 with lon∧lat∧alt (altitude feet→m), MSG2
  *    with lon∧lat at GND altitude 0 m (`models.py:194-214`);
  *  - onground edge detection (`models.py:218-228`) with the 2 s
  *    debounce where every candidate — suppressed or not — resets the
  *    clock (`models.py:256-270`). The reference initializes the
  *    debounce clock with wall-clock `now()` at flight creation
  *    (`models.py:121`); replay uses the session's first message time
  *    (event-time determinism, noted divergence);
  *  - runway attribution from the interpolated track of the last two
  *    positions (`models.py:134-140`, `airports.py:90-125`); events
  *    with no runway match are dropped (`flights.py:155-187`).
  *
  * Used by both the batch sessionizer (sort + fold per hexident) and
  * the Structured Streaming `flatMapGroupsWithState` operator, so batch
  * and streaming agree by construction.
  */
object FlightStateMachine {

  val MaxAgeSec = 300L
  val DebounceSec = 2.0
  val AltitudeBelow = 100000
  val AltitudeAbove = -1000

  /** Serializable per-session state (encoder-friendly for streaming). */
  final case class State(
      hexident: String,
      firstSeen: LocalDateTime,
      var lastSeen: LocalDateTime,
      var callsign: Option[String],
      var onground: Option[Boolean],
      var lastEvent: LocalDateTime,
      // last two positions for track interpolation: (lon, lat)
      var prevLon: Option[Double], var prevLat: Option[Double],
      var lastLon: Option[Double], var lastLat: Option[Double],
      var nPositions: Long)

  /** Tagged union output row. kind ∈ flight | position | landing | takeoff. */
  final case class Out(
      kind: String,
      hexident: String,
      session_start: LocalDateTime,
      time: LocalDateTime,
      first_seen: Option[LocalDateTime],
      last_seen: Option[LocalDateTime],
      callsign: Option[String],
      n_positions: Option[Long],
      lon: Option[Double],
      lat: Option[Double],
      alt_m: Option[Double],
      onground: Option[Boolean],
      runway: Option[String])

  private def micros(a: LocalDateTime, b: LocalDateTime): Long =
    ChronoUnit.MICROS.between(b, a)

  def admissible(m: AdsbMsg, below: Int, above: Int): Boolean =
    m.transmission_type == 2 ||
      (m.transmission_type == 3 &&
        m.altitude.exists(a => a < below && a > above))

  def newState(m: AdsbMsg): State =
    State(m.hexident, m.gen_date_time, m.gen_date_time, None, None,
      m.gen_date_time, None, None, None, None, 0L)

  /** Close a session → flight summary row (`models.py:176-181`). */
  def flightRow(st: State): Out =
    Out("flight", st.hexident, st.firstSeen, st.lastSeen,
      Some(st.firstSeen), Some(st.lastSeen), st.callsign,
      Some(st.nPositions), None, None, None, None, None)

  /** Apply one admitted message; returns emitted positions/events. */
  def update(st: State, m: AdsbMsg, outs: ArrayBuffer[Out]): Unit = {
    st.lastSeen = m.gen_date_time
    // MSG1 sets callsign unconditionally (an empty one nulls it out,
    // matching setattr of None in models.py:186-188).
    if (m.transmission_type == 1) st.callsign = m.callsign

    val coords: Option[(Double, Double, Double, Option[Boolean])] =
      m.transmission_type match {
        case 3 if m.longitude.isDefined && m.latitude.isDefined &&
          m.altitude.isDefined =>
          Some((m.longitude.get, m.latitude.get,
            Geometry.feet2m(m.altitude.get.toDouble), m.onground))
        case 2 if m.longitude.isDefined && m.latitude.isDefined =>
          Some((m.longitude.get, m.latitude.get, Geometry.GndAltitudeM,
            m.onground))
        case _ => None
      }

    coords.foreach { case (lon, lat, altM, og) =>
      st.prevLon = st.lastLon; st.prevLat = st.lastLat
      st.lastLon = Some(lon); st.lastLat = Some(lat)
      st.nPositions += 1
      outs += Out("position", st.hexident, st.firstSeen, m.gen_date_time,
        None, None, None, None, Some(lon), Some(lat), Some(altM), og, None)

      // update_onground (models.py:218-228): only position appends flip.
      (st.onground, og) match {
        case (None, v) => st.onground = v
        case (Some(prev), v) if !v.contains(prev) =>
          st.onground = v
          val kind = if (prev) "takeoff" else "landing"
          // debounce (models.py:256-270): every candidate resets clock
          val valid =
            micros(m.gen_date_time, st.lastEvent) > (DebounceSec * 1e6).toLong
          st.lastEvent = m.gen_date_time
          if (valid) {
            val heading = for {
              px <- st.prevLon; py <- st.prevLat
              lx <- st.lastLon; ly <- st.lastLat
            } yield Geometry.interpolateTrack(px, py, lx, ly)
            val runway = heading.flatMap(h => Airports.attribute(lon, lat, h))
            runway.foreach { rw =>
              outs += Out(kind, st.hexident, st.firstSeen, m.gen_date_time,
                None, None, None, None, Some(lon), Some(lat), Some(altM),
                og, Some(rw))
            }
          }
        case _ => ()
      }
    }
  }

  /** Fold a chronologically sorted message iterator for one hexident
    * into output rows (batch path). */
  def processSorted(
      msgs: Iterator[AdsbMsg],
      below: Int = AltitudeBelow,
      above: Int = AltitudeAbove): Iterator[Out] = {
    val outs = ArrayBuffer.empty[Out]
    var st: State = null
    msgs.foreach { m =>
      if (st != null &&
          micros(m.gen_date_time, st.lastSeen) > MaxAgeSec * 1000000L) {
        outs += flightRow(st)
        st = null
      }
      if (st == null) {
        if (admissible(m, below, above)) {
          st = newState(m)
          update(st, m, outs)
        } // else: dropped — unknown aircraft, inadmissible type
      } else {
        update(st, m, outs)
      }
    }
    if (st != null) outs += flightRow(st)
    outs.iterator
  }
}
