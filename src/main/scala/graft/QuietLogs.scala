package graft

/** One home for the driver-main log scoping (round-11 review: the
  * same stanza was pasted into Bench, BenchSlope AND Verify — a
  * missed copy on the next logger reintroduces the captured-log-tail
  * truncation these suppressions exist to prevent).
  *
  * The driver parses the LAST line of the captured sbt output, so
  * anything that WARNs per query × per run threatens the JSON tail
  * window. Three known offenders, each scoped (never a global level
  * change):
  *  - window: "No Partition Defined" — every global window in the
  *    repo is provably bounded (metadata-sized inputs);
  *  - CacheManager: "already cached" — benign re-registration when a
  *    bench pair re-runs the same plan;
  *  - rdd.RDD: "locally checkpointed … cannot be recomputed after
  *    unpersisting" — the round-11 deterministic reclamation of
  *    checkpointed frames is exactly that unpersist, by design. The
  *    single emitting CLASS, not the whole rdd package (round-12,
  *    ADVICE r11 #3): a package-wide ERROR would also hide unrelated
  *    RDD-layer warnings (block replication/eviction) in every
  *    driver run.
  */
object QuietLogs {
  def apply(): Unit = {
    Seq("org.apache.spark.sql.execution.window",
      "org.apache.spark.sql.execution.CacheManager",
      "org.apache.spark.rdd.RDD").foreach(
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        _, org.apache.logging.log4j.Level.ERROR))
  }
}
