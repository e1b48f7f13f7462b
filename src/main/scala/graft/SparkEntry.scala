package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{AdsbQueries, DocQueries, EventQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus
  * the training-data-pipeline extensions) to a DataFrame-returning
  * function over the driver's parquet tables; `oracleSql` carries the
  * DuckDB-equivalent SQL with identical column names and ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_events_histogram")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.defs ++ TpchQueries.defs ++ TpchQueries.extraDefs ++
      DocQueries.defs ++ AdsbQueries.defs

  def oracleSql: Map[String, String] =
    EventQueries.oracles ++ TpchQueries.oracles ++ DocQueries.oracles ++
      AdsbQueries.oracles
}
