package graft

/** Schema-drift tripwire: every registered query must ANALYZE against
  * the CURRENT on-disk testdata schema. Round 6 lost 25 gate queries
  * to a driver-side regeneration that flipped `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) after the builder's last
  * commit — this sweep catches that class of break locally before a
  * round's gate does.
  *
  * Honesty note on "analysis": most queries only plan here, but the
  * index-backed ones (s2p/s2a/s4-s6/s8/s11/d10) build-and-persist
  * their memoized index at CONSTRUCTION time, and the iterative ones
  * (p17/s10, via eager checkpoints; d7/d8's CC loop) execute their
  * driver loops — so this spec runs at sf0.001 minutes-scale, not
  * seconds, and a runtime failure inside those builders surfaces here
  * as a query failure (still the right tripwire, just not pure
  * analysis for them).
  *
  * (PlanSpec's cartesian sweep also plans every query, but this spec
  * names the broken query AND its error directly, and stays green/red
  * independently of any plan-shape assertion.)
  */
class AnalysisSmokeSpec extends SparkSpec {

  test("all registered queries analyze against current testdata schema") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, dir).queryExecution.analyzed
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").linesIterator
                .take(2).mkString(" "))
        } finally spark.catalog.clearCache()
    }
    assert(bad.isEmpty, s"${bad.size} queries fail analysis:\n" +
      bad.mkString("\n"))
  }

  test("oracleSql covers every query (and nothing else)") {
    // the driver's gate only checks queries that appear in BOTH maps;
    // a queries entry without oracle SQL silently downgrades to a
    // rows-only check, and a dangling oracle entry FAILs as missing.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle entries without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${q -- o}")
  }
}
