package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse-analytics headliners over the TPC-H-ish tables: the
  * grouped-aggregate / multi-way-join / top-k shapes the engine must
  * execute well at 100 TB. Broadcast hints go on genuinely small dims
  * (region, nation); fact-fact joins shuffle on their keys with partial
  * aggregation pushed below the exchange by Catalyst.
  *
  * Double-typed aggregates are rounded on both sides — summation order
  * differs between engines and the last ulp would flip the hash.
  */
object TpchQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing summary (TPC-H Q1 shape): single-pass grouped aggregate.
    "qa_pricing_summary" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Revenue by nation (TPC-H Q5 shape): fact⋈fact shuffle join plus
    // broadcast dims, grouped revenue.
    "qb_revenue_by_nation" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("r_name"), col("n_name"))
    }),

    // Top-k customers by revenue: join + agg + window top-k (the Q6
    // row_number pattern on a warehouse shape).
    "qc_top_customers" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val rev = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      val w = Window.orderBy(col("revenue").desc, col("o_custkey"))
      rev.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 10)
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("rank"), col("o_custkey").as("custkey"), col("c_name"),
          col("revenue"))
        .orderBy(col("rank"))
    })
  )

  val oracles: Map[String, String] = Map(
    "qa_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "qb_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY r_name, n_name
        |ORDER BY revenue DESC, r_name, n_name""".stripMargin,

    "qc_top_customers" ->
      """WITH rev AS (
        |  SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, revenue,
        |    row_number() OVER (ORDER BY revenue DESC, o_custkey) AS rank
        |  FROM rev)
        |SELECT rank, o_custkey AS custkey, c_name, revenue
        |FROM ranked JOIN customer ON o_custkey = c_custkey
        |WHERE rank <= 10 ORDER BY rank""".stripMargin
  )
}
