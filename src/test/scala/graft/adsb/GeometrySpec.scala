package graft.adsb

import org.scalatest.funsuite.AnyFunSuite

import graft.adsb.Geometry._
import graft.adsb.Airports._

/** Ports of the reference's geometry suite
  * (`src/tests/test_airports.py:8-79`, `src/tests/test_shared.py`). */
class GeometrySpec extends AnyFunSuite {

  private val onRunway = Pt(-1.61046, 47.15356)
  private val onAirportOffRunway = Pt(-1.61046, 47.154)
  private val outsideAirport = Pt(-1.8, 48.0)

  test("point on runway is inside both runway bboxes") {
    assert(NteRunway03.pointIn(onRunway))
    assert(NteRunway21.pointIn(onRunway))
  }

  test("same_heading exact and ±20° inclusive boundary") {
    assert(sameHeading(30, 30))
    assert(sameHeading(210, 210))
    assert(sameHeading(30, 50)); assert(sameHeading(30, 10))
    assert(sameHeading(210, 230)); assert(sameHeading(210, 190))
    assert(!sameHeading(30, 51)); assert(!sameHeading(30, 9))
    assert(!sameHeading(210, 231)); assert(!sameHeading(210, 189))
  }

  test("inverse runway rejected") {
    assert(!sameHeading(NteRunway03.direction, 210))
    assert(!sameHeading(NteRunway21.direction, 30))
  }

  test("runway attribution on-runway by heading") {
    assert(Nte.getRunway(onRunway, 30).map(_.name).contains("03"))
    assert(Nte.getRunway(onRunway, 210).map(_.name).contains("21"))
    assert(Nte.getRunway(onRunway, 51).isEmpty ||
      !Nte.getRunway(onRunway, 51).map(_.name).contains("03"))
    assert(Nte.getRunway(onRunway, 90).isEmpty)
  }

  test("airport-bbox fallback attribution off-runway") {
    assert(Nte.pointIn(onAirportOffRunway))
    assert(!NteRunway03.pointIn(onAirportOffRunway))
    assert(Nte.getRunway(onAirportOffRunway, 30).map(_.name).contains("03"))
    assert(Nte.getRunway(onAirportOffRunway, 210).map(_.name).contains("21"))
    assert(Nte.getRunway(onAirportOffRunway, 180).isEmpty)
    assert(Nte.getRunway(onAirportOffRunway, 330).isEmpty)
  }

  test("outside airport never attributes") {
    assert(Nte.getRunway(outsideAirport, 30).isEmpty)
    assert(Nte.getRunway(outsideAirport, 210).isEmpty)
  }

  test("interpolate_track cardinal goldens (test_shared.py:18-21)") {
    assert(interpolateTrack(0, 0, -1, 0) === 270.0)
    assert(interpolateTrack(0, 0, 0, 1) === 0.0)
    assert(interpolateTrack(0, 0, -1, -1) === 225.0)
  }

  test("angle2compass identities (test_shared.py:11-16)") {
    assert(angle2compass(0) === 90.0)
    assert(angle2compass(45) === 45.0)
    assert(angle2compass(180) === 270.0)
    assert(angle2compass(-180) === 270.0)
    assert(angle2compass(91) === 359.0)
  }

  test("feet2m") { assert(feet2m(1000) === 304.8) }
}
