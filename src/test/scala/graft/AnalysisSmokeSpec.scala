package graft

/** Fast schema-drift tripwire: every registered query must ANALYZE
  * against the CURRENT on-disk testdata schema. Round 6 lost 25 gate
  * queries to a driver-side regeneration that flipped `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) after the builder's last
  * commit — an analysis pass over all queries catches that class of
  * break locally in seconds, without executing anything.
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
