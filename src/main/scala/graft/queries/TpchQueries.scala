package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import org.apache.spark.sql.Column

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

  // Money math runs in integer cents: per-row floor(x·100+0.5) is
  // engine-deterministic, and integer sums are order-independent —
  // double sums round differently across engines at half-cent
  // boundaries (observed on the running-total query).
  private def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast("long")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing summary (TPC-H Q1 shape): single-pass grouped aggregate.
    "qa_pricing_summary" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_price_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax")))).as("sum_charge_c"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty",
          round(col("sum_qty_c") / 100.0 / col("count_order"), 6))
        .withColumn("avg_price",
          round(col("sum_base_price_c") / 100.0 / col("count_order"), 6))
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
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("r_name"), col("n_name"))
    }),

    // Top-k customers by revenue: join + agg + window top-k (the Q6
    // row_number pattern on a warehouse shape).
    "qc_top_customers" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      // Aggregate below the join: collapse lineitem to one row per
      // order BEFORE joining orders (Catalyst doesn't push aggregates
      // through joins itself). The join input shrinks from every
      // lineitem row to |orders| rows; integer-cents sums are
      // associative and order-independent, so the regrouped total is
      // bit-identical.
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("order_cents"))
      val rev = perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("order_cents")).as("revenue_cents"))
      // Top-10 via orderBy+limit → TakeOrderedAndProject (parallel
      // partial top-k on every partition, no global single-task window
      // sort). The rank window then runs on the 10 surviving rows only.
      val top10 = rev
        .orderBy(col("revenue_cents").desc, col("o_custkey"))
        .limit(10)
      // Rank the 10 surviving rows in one window partition. The key
      // must be constant-valued yet non-foldable (a literal is folded
      // away, reverting to an empty spec and the WindowExec all-to-one
      // warning): custkey % 1 is always 0 but survives the optimizer.
      val w = Window.partitionBy(pmod(col("o_custkey"), lit(1)))
        .orderBy(col("revenue_cents").desc, col("o_custkey"))
      top10.withColumn("rank", row_number().over(w).cast("long"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("rank"), col("o_custkey").as("custkey"), col("c_name"),
          col("revenue_cents"))
        .orderBy(col("rank"))
    })
  )

  val extraDefs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Semi/anti join surface: customers with 1996 orders vs customers
    // with no orders at all (EXISTS / NOT EXISTS shapes).
    "qd_semi_anti" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val o96 = o.where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val active = c.join(o96, c("c_custkey") === o96("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_active"))
      val inactive = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_inactive"))
      active.crossJoin(inactive)
    }),

    // Skew-hardened fact join: revenue by order priority through an
    // explicitly salted lineitem ⋈ orders (each orderkey spread over 4
    // reducer buckets, orders replicated per salt). The oracle is the
    // PLAIN equi-join — salting must be invisible in the result.
    "qf_salted_join" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("item_cents"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.SkewJoin.saltedJoin(li, o,
          bigKey = "l_orderkey", otherKey = "o_orderkey", salts = 4)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("item_cents")).as("revenue_cents"))
        .orderBy(col("o_orderpriority"))
    }),

    // Hierarchical totals in one pass: ROLLUP (region → nation → grand
    // total) — one shuffle, the subtotal rows come from Spark's
    // Expand, not repeated scans. NULL grouping columns are mapped to
    // sentinel labels so the oracle compares cleanly.
    "qh_rollup_revenue" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("revenue_cents"))
        .orderBy(col("region"), col("nation"))
    }),

    // qg: CUBE — all four grouping combinations in one Expand pass
    // (qh covers the ROLLUP hierarchy; CUBE adds the cross
    // subtotals). Revenue in integer cents so subtotal sums are
    // order-independent and engine-exact.
    "qg_cube_orders" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .cube(col("o_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .select(
          coalesce(col("o_year").cast("string"), lit("ALL")).as("o_year"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total_cents"))
        .orderBy(col("o_year"), col("priority"))
    }),

    // Set operations beyond UNION: INTERSECT / EXCEPT (distinct
    // semantics) over customer key sets from two order years.
    "qi_setops" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      def custs(y: Int) = o.where(
          col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
            col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val both = custs(1996).intersect(custs(1997))
        .agg(count(lit(1)).as("n")).select(lit("both").as("side"), col("n"))
      val only96 = custs(1996).except(custs(1997))
        .agg(count(lit(1)).as("n")).select(lit("only_1996").as("side"), col("n"))
      val only97 = custs(1997).except(custs(1996))
        .agg(count(lit(1)).as("n")).select(lit("only_1997").as("side"), col("n"))
      both.unionByName(only96).unionByName(only97).orderBy(col("side"))
    }),

    // Distribution statistics: exact interpolated percentiles (both
    // engines use linear interpolation on the sorted values, so the
    // rounded quantiles hash-match). The 100 TB caller flips
    // `exact = false` on the SAME API for the sketch-mergeable
    // approx_percentile plan (Percentiles.perGroup; equivalence
    // within tolerance pinned in OperatorSpec).
    "ql_percentiles" -> ((s, dir) =>
      graft.operators.Percentiles.perGroup(
        Tables.load(s, dir, "lineitem"), col("l_returnflag"),
        col("l_extendedprice"), Seq(0.5, 0.95), exact = true)),

    // Running cumulative revenue by ship date. Money is summed as
    // integer cents (per-row floor(x·100+0.5)) — double sums round
    // differently across engines at half-cent boundaries when the
    // accumulation order differs, integer sums never do.
    "qe_running_total" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val daily = li
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.withColumn("cum_cents", sum(col("revenue_cents")).over(w))
        .orderBy(col("day"))
    })
  )

  val oracles: Map[String, String] = Map(
    "qd_semi_anti" ->
      """SELECT
        |  (SELECT count(*) FROM customer WHERE EXISTS (
        |     SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |       AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |       AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')) AS n_active,
        |  (SELECT count(*) FROM customer WHERE NOT EXISTS (
        |     SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_inactive""".stripMargin,

    "qh_rollup_revenue" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "qg_cube_orders" ->
      """SELECT
        |  coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS o_year,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM orders
        |GROUP BY CUBE (year(o_orderdate), o_orderpriority)
        |ORDER BY o_year, priority""".stripMargin,

    "qi_setops" ->
      """WITH c96 AS (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |c97 AS (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT 'both' AS side,
        |  (SELECT count(*) FROM (SELECT o_custkey FROM c96 INTERSECT SELECT o_custkey FROM c97)) AS n
        |UNION ALL
        |SELECT 'only_1996',
        |  (SELECT count(*) FROM (SELECT o_custkey FROM c96 EXCEPT SELECT o_custkey FROM c97))
        |UNION ALL
        |SELECT 'only_1997',
        |  (SELECT count(*) FROM (SELECT o_custkey FROM c97 EXCEPT SELECT o_custkey FROM c96))
        |ORDER BY side""".stripMargin,

    "ql_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "qf_salted_join" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "qe_running_total" ->
      """WITH daily AS (
        |  SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
        |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |           AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT day, revenue_cents,
        |  CAST(sum(revenue_cents) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |FROM daily ORDER BY day""".stripMargin,
    "qa_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |  count(*) AS count_order,
        |  round(CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "qb_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY r_name, n_name
        |ORDER BY revenue_cents DESC, r_name, n_name""".stripMargin,

    "qc_top_customers" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, revenue_cents,
        |    row_number() OVER (ORDER BY revenue_cents DESC, o_custkey) AS rank
        |  FROM rev)
        |SELECT rank, o_custkey AS custkey, c_name, revenue_cents
        |FROM ranked JOIN customer ON o_custkey = c_custkey
        |WHERE rank <= 10 ORDER BY rank""".stripMargin
  )
}
