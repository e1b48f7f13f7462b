package graft.adsb

import graft.SparkSpec

/** Parser behavior pinned against the reference's fixture corpora
  * (`src/tests/adsb_messages_ok.txt` / `_faulty.txt`) and cast rules
  * (`adsb_parser.py:176-291`). */
class SbsParserSpec extends SparkSpec {

  private lazy val ok =
    Sbs.parse(Sbs.fixtureLines(spark, "adsb_messages_ok.txt"))
      .orderBy("seq").collect()

  test("ok corpus: 18-field MSG6 lines fail the 22-length check") {
    // 5 lines, 2 are short MSG6 → 3 parse
    assert(ok.length === 3)
    assert(ok.map(_.getInt(1)).toSeq === Seq(3, 1, 2))
  }

  test("MSG3 fields cast correctly, empty → null") {
    val m = ok(0)
    assert(m.getString(4) === "40757F")
    assert(m.getTimestamp(6) ===
      java.sql.Timestamp.valueOf("2019-10-20 11:33:40.311"))
    assert(m.isNullAt(8))                         // callsign empty → null
    assert(m.getInt(9) === 5000)                  // altitude
    assert(m.isNullAt(10))                        // speed empty → null
    assert(m.getDouble(12) === 46.65470)          // latitude
    assert(m.getDouble(13) === -2.77776)          // longitude
    assert(m.getBoolean(19) === false)            // onground '0' → false
  }

  test("MSG1 carries callsign; MSG2 onground -1 → true") {
    assert(ok(1).getString(8) === "TEST123")
    assert(ok(2).getBoolean(19) === true)
  }

  test("faulty corpus: negative altitudes accepted, short lines dropped") {
    val f = Sbs.parse(Sbs.fixtureLines(spark, "adsb_messages_faulty.txt"))
      .orderBy("seq").collect()
    // All 3 lines have 22 fields? Only those that do survive; negative
    // altitudes parse (T12: the reference accepts them).
    assert(f.forall(r => !r.isNullAt(9)))
    assert(f.map(_.getInt(9)).toSet.subsetOf(Set(-25, -1000)))
  }

  test("altitude filter P4: strict null rejection and open bounds") {
    import org.apache.spark.sql.functions.col
    val df = Sbs.parse(Sbs.fixtureLines(spark, "adsb_messages_ok.txt"))
    val kept = df.where(Sbs.altitudeFilter(col("altitude"), below = 10000))
      .collect()
    assert(kept.length === 1) // only the MSG3 with altitude 5000
  }

  test("full stream corpus parses every line (2070, no trailing newline)") {
    val n = Sbs.parse(Sbs.fixtureLines(spark, "adsb_message_stream.txt")).count()
    assert(n === 2070)
  }

  test("P5 full filter surface: conjunction of enabled sub-tests") {
    import org.apache.spark.sql.functions.col
    val df = Sbs.parse(Sbs.fixtureLines(spark, "adsb_messages_ok.txt"))
    // altitude band + onground=false keeps only the airborne MSG3
    val f1 = Sbs.MessageFilter(below = 10000, onground = Some(false))
    assert(df.where(f1.filter(df)).count() === 1)
    // radius around the MSG3 position keeps it; a far reference drops it
    val near = Sbs.MessageFilter(below = 10000,
      radiusM = Some(50000), refLon = -2.77776, refLat = 46.65470)
    assert(df.where(near.filter(df)).count() === 1)
    val far = Sbs.MessageFilter(below = 10000,
      radiusM = Some(1000), refLon = 0.0, refLat = 0.0)
    assert(df.where(far.filter(df)).count() === 0)
    // non-strict mode admits NULL-field rows for the tested predicate
    val lax = Sbs.MessageFilter(strict = false)
    assert(df.where(lax.filter(df)).count() === 3)
  }
}
