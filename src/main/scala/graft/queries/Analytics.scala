package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Relational/analytic query surface (SURVEY §2.2–§2.7 plus the generic
  * operator families the reference delegates to its warehouses).
  *
  * Oracle-parity rules (the driver hash-compares against DuckDB):
  *  - Every multi-row float aggregation goes through DECIMAL(18,4) so the
  *    sum is exact and order-independent, then the final value is cast to
  *    DOUBLE (deterministic round-to-nearest in both engines). A raw
  *    `sum(double)` differs between engines in the low bits because
  *    addition order differs.
  *  - Timestamp outputs are cast to DATE or formatted strings: Spark and
  *    DuckDB disagree on timezone-awareness of raw timestamp columns.
  *  - Aggregate/computed columns are aliased identically here and in the
  *    oracle SQL (driver sorts columns by name before hashing).
  */
object Analytics {

  /** Exact, order-independent sum of a double column: decimal-widen then
    * final cast back to double. DECIMAL(18,4) recovers the true ≤4-decimal
    * lattice value of 2-decimal×2-decimal products despite double noise. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)
  private def davg(c: Column, n: Column): Column = (sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / n)

  // --- Q1: pricing summary (scan → filter → hash agg, map-side partial) ---
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity"), count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- Q3: shipping priority (broadcast dim join → agg → top-k) ---
  def q3TopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp_ntz"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
    // customer SCALES with SF, so no hard broadcast hint — AQE picks
    // broadcast at small scale by size and a shuffle join at 100 TB;
    // orders⋈lineitem shuffles on the shared key only once.
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3TopOrdersSql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00' AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // --- Q5-style: multi-way join through the star schema ---
  def q5RegionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.load(spark, sfDir, "region")
    val nation = Tables.load(spark, sfDir, "nation")
    val cust = Tables.load(spark, sfDir, "customer")
    val ord = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    val supp = Tables.load(spark, sfDir, "supplier")
    // region/nation are FIXED-cardinality (5/25 rows) → safe hard
    // broadcast at any scale. supplier/customer scale with SF, so they
    // carry no hint: AQE broadcasts them while they fit and falls back
    // to shuffle joins at 100 TB. The only unavoidable big shuffle is
    // lineitem⋈orders on orderkey.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q5RegionRevenueSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem, orders, supplier, customer, nation, region
      |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey AND o_custkey = c_custkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND c_nationkey = s_nationkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // --- Q6: single-predicate-band filter + scalar aggregate ---
  def q6Forecast(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1995-01-01").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6ForecastSql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // --- Q10-style: returned-items customer ranking (join + agg + top-k) ---
  def q10Returned(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val ord = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem").filter(col("l_returnflag") === "R")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey")) // scales with SF: AQE decides
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedSql: String =
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem, orders, customer
      |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // --- Q18-style: HAVING over a grouped subquery, then join back ---
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).as("qty_dec"))
      .filter(col("qty_dec") > 300)
      .select(col("l_orderkey"), col("qty_dec").cast(DoubleType).as("total_qty"))
    // `big`'s cardinality is a fixed FRACTION of orders (HAVING > 300),
    // so it still scales with SF — no hard hint, AQE sizes the join.
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  val q18LargeOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, CAST(qty_dec AS DOUBLE) AS total_qty
      |FROM orders JOIN (
      |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty_dec
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 300
      |) ON o_orderkey = l_orderkey
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  // --- semi / anti joins (J1/J2's matched / not-matched legs, generalized) ---
  def semiJoinCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val ord = Tables.load(spark, sfDir, "orders").filter(col("o_totalprice") > 200000)
    cust.join(ord.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val semiJoinCustomersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      |ORDER BY c_custkey""".stripMargin

  /** Customers with no recent order. The date filter keeps the result
    * non-empty at every sf (an unfiltered anti-join is 0 rows — every
    * customer has SOME order — and a 0-row hash check proves nothing). */
  def antiJoinCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val recent = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01"))
    cust.join(recent.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val antiJoinCustomersSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderdate >= '2000-01-01')
      |ORDER BY c_custkey""".stripMargin

  // --- set ops on row data (SURVEY §2.7: reference has none; ours do) ---
  def setOpsOrderkeys(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val shipped = li.filter(col("l_returnflag") === "R").select(col("l_orderkey").as("okey"))
    val open = ord.filter(col("o_orderstatus") === "O").select(col("o_orderkey").as("okey"))
    shipped.intersect(open).union(
        li.filter(col("l_quantity") > 49).select(col("l_orderkey").as("okey"))
          .except(ord.select(col("o_orderkey").as("okey"))))
      .distinct()
      .orderBy(col("okey"))
  }

  val setOpsOrderkeysSql: String =
    """SELECT DISTINCT okey FROM (
      |  SELECT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'R'
      |  INTERSECT
      |  SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'O'
      |  UNION
      |  (SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity > 49
      |   EXCEPT
      |   SELECT o_orderkey AS okey FROM orders)
      |) ORDER BY okey""".stripMargin

  // --- rollup (grouping-set family) ---
  def rollupRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val rollupRevenueSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // --- arbitrary grouping sets (completes rollup/cube) ---
  // Explicit GROUPING SETS where the wanted combinations are neither a
  // prefix chain (rollup) nor the full power set (cube): per-flag
  // totals, per-status totals, and the grand total — but NOT the
  // (flag, status) cross. One Expand over one scan, like the other two.
  def groupingSetsRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  val groupingSetsRevenueSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // --- exact distinct aggregation ---
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    cust.groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val distinctCountsSql: String =
    """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n_customers
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --- window: running total per customer (frame spec beyond the
  //     reference's lone row_number; SURVEY §2.5) ---
  def windowRunningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast(DoubleType).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val windowRunningTotalSql: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // --- window: top-3 events per user by recency (rank + filter) ---
  def windowTopEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    // ts is the raw ns epoch (long) — identical to the oracle's epoch_ns.
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("event_id"), col("event_type"), col("rn"))
      .orderBy(col("user_id"), col("rn"))
  }

  val windowTopEventsSql: String =
    """SELECT user_id, event_id, event_type, rn FROM (
      |  SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  // --- events: tumbling-hour aggregation (streaming M8 analog in batch) ---
  // `events.ts` arrives as an ns-epoch long (see GraftSession); the hour
  // bucket is derived via µs → timestamp → formatted string.
  // --- Q14-style: promo revenue share (lineitem ⋈ part) ---
  def q14Promo(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1995-10-01").cast("timestamp_ntz"))
    // part scales with SF → no hard broadcast hint, AQE sizes the join
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          dsum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(0.0)) /
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("promo_share_pct"),
        count(lit(1)).as("n_items"))
  }
  val q14PromoSql: String =
    """SELECT
      |  100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
      |            THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
      |        / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
      |    AS promo_share_pct,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin

  // --- Q17-style: correlated scalar-aggregate subquery, decorrelated ---
  // "revenue of small-quantity orders": lineitems under 20% of their
  // part's average quantity. Written as the decorrelated plan Catalyst
  // would produce anyway — per-part averages via ONE hash-agg joined
  // back on partkey — so the subquery never re-executes per row.
  def q17SmallQty(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part").filter(col("p_brand") === "Brand#1")
    val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_cut"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"), count(lit(1)).as("n_items"))
  }
  val q17SmallQtySql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  // --- AS-OF join: latest order per customer at each event time ---
  // Spark has no ASOF JOIN; the Spark-first plan is union + running
  // last-non-null window: ONE shuffle on the key, never an
  // events×orders join explosion — state rows and probe rows interleave
  // on the time axis and each probe reads the most recent state at or
  // before its timestamp. DuckDB's native ASOF LEFT JOIN is the oracle.
  def asofLatestOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("t_us")) // ns→µs, integer div (/ would round through double)
    // one order image per (customer, date), deterministic via max orderkey
    val o1 = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
      .select(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t_us"),
        col("m.o_orderkey").as("o_orderkey"), col("m.o_totalprice").as("o_totalprice"))
    val tagged = o1
      .select(col("user_id"), col("t_us"), lit(0).as("typ"),
        col("o_orderkey"), col("o_totalprice"), lit(null).cast("long").as("event_id"))
      .unionByName(ev.select(col("user_id"), col("t_us"), lit(1).as("typ"),
        lit(null).cast("long").as("o_orderkey"), lit(null).cast("double").as("o_totalprice"),
        col("event_id")))
    // state (typ 0) sorts before probes (typ 1) at equal time → the
    // as-of comparison is inclusive, matching ASOF's ts >= o_orderdate
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("typ"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_price", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("typ") === 1)
      .select(col("event_id"), col("user_id"),
        col("asof_orderkey").as("o_orderkey"), col("asof_price").as("o_totalprice"))
      .orderBy(col("event_id"))
  }
  val asofLatestOrderSql: String =
    """WITH o1 AS (
      |  SELECT o_custkey, o_orderdate,
      |    arg_max(o_orderkey, o_orderkey) AS o_orderkey,
      |    arg_max(o_totalprice, o_orderkey) AS o_totalprice
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, o1.o_orderkey, o1.o_totalprice
      |FROM events e ASOF LEFT JOIN o1
      |  ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** CUBE over the same keys as the rollup — all four grouping sets. */
  def cubeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }
  val cubeRevenueSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price, count(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** M8 sliding window: 1 h windows every 30 min — each event lands in
    * two overlapping windows (Spark's `window()` generate-explode). */
  def eventsSlidingHour(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.groupBy(
        window(expr("timestamp_micros(ts div 1000)"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))
  }
  val eventsSlidingHourSql: String =
    """SELECT strftime(ws, '%Y-%m-%d %H:%M') AS win_start, event_type,
      |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT event_type, value,
      |    unnest([to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800),
      |            to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - 1800)]) AS ws
      |  FROM events)
      |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  def eventsTumblingHour(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.groupBy(expr("date_format(timestamp_micros(ts div 1000), 'yyyy-MM-dd HH')").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  val eventsTumblingHourSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
      |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // --- events: sessionization via gap detection (lag + cumulative flag) ---
  def eventsSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    // ts is the raw ns epoch (long): gap arithmetic is exact int64 in both
    // engines (oracle uses epoch_ns).
    val ev = Tables.load(spark, sfDir, "events")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withGap = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") - col("prev_ts") > 1800L * 1000000000L, 1).otherwise(0))
    withGap
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val eventsSessionizeSql: String =
    """SELECT user_id, session_id, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      |FROM (
      |  SELECT user_id, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id, value,
      |      CASE WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) IS NULL
      |        OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) > 1800000000000
      |      THEN 1 ELSE 0 END AS new_session
      |    FROM events))
      |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // --- events: session-scoped transition matrix ------------------------
  // The Markov view of user behavior: (previous event type → next event
  // type) counts with the same 30-minute inactivity boundary as
  // `events_sessionize`, so a transition never spans a session break.
  // The product-analytics twin of the funnel — the funnel asks "did the
  // prescribed path happen", this reports which paths ACTUALLY happen
  // and with what probability. Scale shape: ONE lag window partitioned
  // by user (per-partition cardinality = that user's events — the
  // sessionize precedent, with the same hot-user caveat), collapsed
  // straight into a |types|²-row hash agg; the row-probability join is
  // over that bounded matrix. Integer outputs (p_e6 by integer division
  // of exact counts).
  def eventsTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_type").isNotNull &&
        col("ts") - col("prev_ts") <= 1800L * 1000000000L)
      .select(col("prev_type").as("from_type"), col("event_type").as("to_type"))
    transitionMatrix(pairs)
  }

  /** `(from_type, to_type)` pair frame → the `(n, p_e6)` matrix — shared
    * by the batch query and the continuous face
    * ([[graft.streaming.StreamTransitions]]), so the two can never
    * disagree on the count/probability arithmetic. */
  private[graft] def transitionMatrix(pairs: DataFrame): DataFrame = {
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    counts.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000L div tot").as("p_e6"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val eventsTransitionsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type, epoch_ns(ts) AS tns, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_type,
      |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_tns
      |  FROM events),
      |t AS (
      |  SELECT prev_type AS from_type, event_type AS to_type FROM s
      |  WHERE prev_type IS NOT NULL AND tns - prev_tns <= 1800000000000),
      |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM t GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n,
      |  CAST(c.n * 1000000 // t2.tot AS BIGINT) AS p_e6
      |FROM c JOIN tot t2 USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // --- events: volume-anomaly detection (drift monitoring) -------------
  // The pipeline-ops question "did last night's ingest break?": per
  // (event_type, hour) counts, each hour z-scored against its trailing
  // 24 hourly buckets. Scale shape: the raw log collapses to type×hour
  // rows in ONE hash agg — the window functions then run over that
  // BOUNDED aggregate (types × hours), never over the event log, so the
  // sort-within-partition behind the window is O(hours) per type.
  // Cross-engine float parity: the windowed quantities are exact sums —
  // n and Σn as longs, Σn² as DECIMAL(38,0) so the square can never
  // wrap a BIGINT at scale (Spark would wrap silently, DuckDB would
  // error: either way the parity claim dies) — and mean/variance/z are
  // then ONE fixed shared arithmetic chain over those integers
  // (var = (Σn² − Σn·Σn/c)/(c−1), z = (n − mean)/sqrt(var)), so the
  // hash compare certifies the z-scores themselves. Warm-up hours
  // (fewer than 12 trailing buckets) and zero-variance windows emit
  // z = NULL and never flag. The bucketing expression and the z chain
  // live in the shared helpers below because [[graft.streaming
  // .StreamAnomaly]] trains its baseline and scores its windows with
  // the SAME code — stream and batch cannot desynchronize.
  private val AnomTrail = 24 // trailing window, hourly buckets
  private[graft] val AnomMinBuckets = 12 // minimum history before scoring
  private[graft] val AnomZ = 3.0

  /** ns-epoch `ts` → 'yyyy-MM-dd HH' UTC bucket (oracle mirror:
    * strftime of date_trunc('hour')). */
  private[graft] def hourBucket: Column =
    expr("date_format(timestamp_micros(ts div 1000), 'yyyy-MM-dd HH')")

  /** `n²` as DECIMAL(38,0) — exact and unwrappable at any count. */
  private[graft] def nSquared(n: Column): Column =
    n.cast(DecimalType(19, 0)) * n.cast(DecimalType(19, 0))

  /** The guarded z chain over integer moments: NULL below
    * [[AnomMinBuckets]] history or at zero variance. Shared verbatim by
    * the batch query and the streaming scorer. */
  private[graft] def anomalyZ(n: Column, cnt: Column, s: Column, sq: Column): Column = {
    val mean = s.cast("double") / cnt
    val varr = (sq.cast("double") - s.cast("double") * s / cnt) / (cnt - 1)
    when(cnt >= AnomMinBuckets && varr > 0, (n - mean) / sqrt(varr))
  }

  /** NULL-safe flag: |z| > [[AnomZ]], never true for unscored rows. */
  private[graft] def anomalyFlag(z: Column): Column =
    coalesce(abs(z) > AnomZ, lit(false))

  def eventsAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val hourly = ev
      .groupBy(hourBucket.as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-AnomTrail, -1)
    val stats = hourly
      .withColumn("w_cnt", count(col("n")).over(w))
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn("w_sumsq", sum(nSquared(col("n"))).over(w))
    stats
      .withColumn("z", anomalyZ(col("n"), col("w_cnt"), col("w_sum"), col("w_sumsq")))
      .select(col("event_type"), col("hour"), col("n"),
        round(col("z"), 6).as("z"),
        anomalyFlag(col("z")).as("is_anomaly"))
      .orderBy(col("event_type"), col("hour"))
  }

  val eventsAnomalySql: String =
    s"""WITH hourly AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, hour, n,
      |    count(n) OVER w AS w_cnt,
      |    sum(n) OVER w AS w_sum,
      |    sum(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))) OVER w AS w_sumsq
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
      |    ROWS BETWEEN $AnomTrail PRECEDING AND 1 PRECEDING)),
      |scored AS (
      |  SELECT event_type, hour, n,
      |    CASE WHEN w_cnt >= $AnomMinBuckets
      |           AND (CAST(w_sumsq AS DOUBLE) - CAST(w_sum AS DOUBLE) * w_sum / w_cnt) / (w_cnt - 1) > 0
      |      THEN (n - CAST(w_sum AS DOUBLE) / w_cnt) /
      |        sqrt((CAST(w_sumsq AS DOUBLE) - CAST(w_sum AS DOUBLE) * w_sum / w_cnt) / (w_cnt - 1))
      |      ELSE NULL END AS z
      |  FROM stats)
      |SELECT event_type, hour, n, round(z, 6) AS z,
      |  coalesce(abs(z) > $AnomZ, false) AS is_anomaly
      |FROM scored ORDER BY event_type, hour""".stripMargin

  // --- Q4-style: EXISTS decorrelated to a left-semi join ---------------
  // "orders in a quarter having at least one returned item, counted by
  // priority". The correlated EXISTS is a left-semi join on orderkey:
  // lineitem is pre-filtered to returned rows BEFORE the join (the
  // filter prunes ~75% of the probe side at the scan), the semi join
  // needs no dedup of the right side, and the date filter on orders is
  // a parquet pushdown. One shuffle on orderkey, then a tiny hash agg.
  def q4Priority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
    val returned = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
    ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- Q16-style: NOT IN decorrelated to a left-anti join --------------
  // "distinct suppliers per (brand, type), excluding delinquent
  // suppliers". The NOT-IN subquery (finite, non-null right side) is a
  // left-anti join whose build side is tiny (suppliers with negative
  // balance) → AQE broadcasts it; count(DISTINCT) plans as one expand +
  // two-level hash agg — no per-group sort anywhere.
  def q16PartsSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part").filter(col("p_type") =!= "PROMO")
    val delinquent = Tables.load(spark, sfDir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    li.join(delinquent, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
  }

  val q16PartsSupplierSql: String =
    """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type
      |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin

  // --- Q19-style: disjunctive join predicates --------------------------
  // OR-of-ANDs spanning both join sides. Catalyst extracts the
  // per-table residues (p_brand IN (...) to the part scan, quantity
  // range to the lineitem scan) so both scans prune BEFORE the join —
  // the query is the classic test that disjunctions don't defeat
  // pushdown. Part scales with SF: no broadcast hint, AQE decides.
  def q19Disjunctive(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) && col("l_quantity").between(10, 35)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(20, 50) && col("l_quantity").between(20, 50))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19DisjunctiveSql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  // --- Q21-style: double-correlated EXISTS / NOT EXISTS ----------------
  // "suppliers solely to blame for a returned item in multi-supplier
  // orders". The textbook form is two correlated subqueries per
  // lineitem row (EXISTS another supplier in the order; NOT EXISTS
  // another supplier with a returned item); both decorrelate into ONE
  // per-order aggregation — distinct suppliers, distinct suppliers with
  // returns, and (when unique) that supplier — so lineitem is read and
  // shuffled exactly once, on orderkey. `max(CASE …)` is safe because
  // the r_supp = 1 filter guarantees uniqueness.
  def q21BlameSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val supp = Tables.load(spark, sfDir, "supplier")
    // two-level aggregation instead of two countDistincts: a multi-
    // distinct agg plans an Expand that triples lineitem before the
    // shuffle; collapsing to (order, supplier) grain first gives two
    // plain hash aggs, both map-side partial, no row multiplication.
    val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("returned"))
    val profile = perSupp.groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("returned")).as("r_supp"),
        max(when(col("returned") === 1, col("l_suppkey"))).as("blamed"))
      .filter(col("n_supp") >= 2 && col("r_supp") === 1)
    profile.groupBy(col("blamed"))
      .agg(count(lit(1)).as("numwait"))
      .join(supp, col("blamed") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q21BlameSupplierSql: String =
    """WITH prof AS (
      |  SELECT l_orderkey,
      |    count(DISTINCT l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS r_supp,
      |    max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS blamed
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT s_name, count(*) AS numwait
      |FROM prof JOIN supplier ON blamed = s_suppkey
      |WHERE n_supp >= 2 AND r_supp = 1
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  // --- Q7-style: bilateral volume between two nations ------------------
  // lineitem joins BOTH dimension paths (supplier→nation and
  // customer→nation via orders) with a cross-pair predicate. nation is
  // fixed-cardinality → two hard broadcasts; the pair filter reduces at
  // the join, the year bucket groups shipping volume. The one big
  // shuffle is lineitem⋈orders on orderkey, everything else rides it.
  def q7NationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
    val supp = Tables.load(spark, sfDir, "supplier")
    val nation = Tables.load(spark, sfDir, "nation")
    val n1 = broadcast(nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation").isin("NATION_1", "NATION_2") &&
        col("cust_nation").isin("NATION_1", "NATION_2") &&
        col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7NationVolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_1', 'NATION_2') AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // --- Q8-style: market share via conditional aggregation --------------
  // share = sum(revenue WHERE supplier is the target nation) /
  // sum(revenue), per year — the conditional-numerator pattern (same as
  // Q14's promo share) over the full star join; one grouped aggregate,
  // no second pass over the fact table.
  def q8MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val supp = Tables.load(spark, sfDir, "supplier")
    val part = Tables.load(spark, sfDir, "part").filter(col("p_type") === "PROMO")
    val nation = Tables.load(spark, sfDir, "nation")
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((dsum(when(col("n_name") === "NATION_3", vol).otherwise(lit(0.0))) /
        dsum(vol)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(sum(CAST(CASE WHEN n_name = 'NATION_3'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_type = 'PROMO'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- Q22-style: scalar subquery + anti join --------------------------
  // "rich customers gone idle": balance above the positive-balance
  // average (scalar aggregate, broadcast as a 1-row cross join — never
  // collected to the driver) with no orders since 2000 (anti join whose
  // right side prunes at the orders scan). The threshold is computed
  // decimal-exact then cast to double, so the `>` compare is the same
  // IEEE compare in both engines. Grouped by nation (fixed cardinality
  // → hard broadcast).
  def q22IdleRich(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val nation = Tables.load(spark, sfDir, "nation")
    val recent = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
      .select(col("o_custkey"))
    val threshold = cust.filter(col("c_acctbal") > 0)
      .agg(davg(col("c_acctbal"), count(lit(1))).as("avg_bal"))
    cust.crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val q22IdleRichSql: String =
    """WITH threshold AS (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT n_name, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
      |FROM customer, threshold, nation
      |WHERE c_acctbal > avg_bal AND c_nationkey = n_nationkey
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --- JSON property extraction + aggregation --------------------------
  // Semi-structured ops over the events `props` JSON column:
  // `get_json_object` is codegen'd per-row extraction (no UDF), the agg
  // is an ordinary hash agg. Oracle note: DuckDB's sum(BIGINT) returns
  // HUGEINT which pandas renders float64 — CAST to BIGINT (the
  // events_sessionize lesson, VERDICT r2 #1).
  def eventsPropsAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val k = get_json_object(col("props"), "$.k").cast("long")
    ev.select(col("event_type"), k.as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("n_distinct_k"),
        sum(col("k")).as("sum_k"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  val eventsPropsAggSql: String =
    """SELECT event_type, count(*) AS n, count(DISTINCT k) AS n_distinct_k,
      |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |WHERE k IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- exact percentiles per group -------------------------------------
  // Spark's `percentile` and DuckDB's `quantile_cont` share the same
  // definition (linear interpolation at rank (n-1)*q over the sorted
  // group), so the oracle can hash-check EXACT percentiles; the output
  // is rounded to 6 decimals only to absorb last-ulp interpolation
  // noise. Exact percentile is a sort-based aggregate — fine per group;
  // for 100 TB global quantiles you'd reach for approx_percentile
  // (t-digest), which has no cross-engine-identical oracle.
  def eventsPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  val eventsPercentilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.95), 6) AS p95,
      |  round(quantile_cont(value, 0.99), 6) AS p99,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- winsorized per-type stats: robust means under outliers ----------
  // The mean every ops dashboard should show: clamp each type's values
  // to its own [p05, p95] before averaging, so a single corrupted
  // ingest row can't move the metric. Two passes by necessity (the cuts
  // are a distribution property): a |types|-row percentile agg that
  // BROADCASTS back onto one counting scan. Parity: the interpolated
  // percentile is the eventsPercentiles-proven round(,6) chain; the
  // winsorized sum routes through DECIMAL(18,4) (float sum order would
  // differ), and the final divide+round is one mirrored chain.
  def eventsWinsorize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.load(spark, sfDir, "events").select(col("event_type"), col("value"))
    val cuts = ev.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.05)"), 6).as("lo"),
        round(expr("percentile(value, 0.95)"), 6).as("hi"))
    ev.join(broadcast(cuts), Seq("event_type"))
      .select(col("event_type"), col("lo"), col("hi"), col("value"),
        least(greatest(col("value"), col("lo")), col("hi"))
          .cast(DecimalType(18, 4)).as("w"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        round(sum(col("w")).cast("double") / count(lit(1)), 6).as("wmean"))
      .select(col("event_type"), col("n"), col("n_lo"), col("n_hi"),
        col("lo"), col("hi"), col("wmean"))
      .orderBy(col("event_type"))
  }

  val eventsWinsorizeSql: String =
    """WITH cuts AS (
      |  SELECT event_type, round(quantile_cont(value, 0.05), 6) AS lo,
      |         round(quantile_cont(value, 0.95), 6) AS hi
      |  FROM events GROUP BY 1)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |  CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |  min(lo) AS lo, min(hi) AS hi,
      |  round(CAST(sum(CAST(least(greatest(value, lo), hi) AS DECIMAL(18,4))) AS DOUBLE)
      |    / count(*), 6) AS wmean
      |FROM events JOIN cuts USING (event_type)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- Q9-style: product-type profit by nation and year ----------------
  // The testdata has no partsupp, so supply cost is p_retailprice ×
  // quantity (same shape: a per-part attribute priced into the fact
  // row). One pass over the star join, decimal-exact profit sum. The
  // p_name filter prunes part BEFORE the join; AQE broadcasts the
  // filtered part side while it fits.
  def q9ProfitByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val supp = Tables.load(spark, sfDir, "supplier")
    val part = Tables.load(spark, sfDir, "part").filter(col("p_name").contains("red"))
    val nation = Tables.load(spark, sfDir, "nation")
    val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      col("p_retailprice") * col("l_quantity")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(profit).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProfitByNationSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |      - p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // --- Q12-style: shipping-delay conditional counts --------------------
  // Late/on-time split per order priority: one lineitem⋈orders shuffle
  // on orderkey, then CASE-conditional counts in a single hash agg (the
  // Q8/Q14 conditional-numerator pattern applied to counts). Oracle
  // note: DuckDB sum(int) is HUGEINT → CAST AS BIGINT both sides.
  def q12ShipDelay(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(late, 1L).otherwise(0L)).as("late_count"),
        sum(when(late, 0L).otherwise(1L)).as("ontime_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q12ShipDelaySql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
      |  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 0 ELSE 1 END) AS BIGINT) AS ontime_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- Q13-style: customer order-count distribution --------------------
  // The one outer-join-shaped aggregate in the suite: customers with
  // ZERO orders must survive (left join, count(o_orderkey) skips nulls)
  // — a semi/inner join would silently drop the c_count=0 bucket. Two
  // hash aggs: per-customer count (shuffle on custkey — at 100 TB this
  // is the natural partitioning of both sides), then the tiny histogram.
  def q13OrderDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer")
    val ord = Tables.load(spark, sfDir, "orders")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13OrderDistributionSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --- Q15-style: top supplier by quarterly revenue --------------------
  // The classic view + scalar-max pattern, decorrelated: the per-supplier
  // revenue aggregate is computed ONCE, its max is a 1-row broadcast
  // joined back on equality (exact: both sides are the same decimal-sum
  // double). No window over a single global partition, no second scan of
  // lineitem.
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val supp = Tables.load(spark, sfDir, "supplier")
    // cached: the view is read twice (max + equality probe) and without
    // the cache Spark re-derives BOTH subtrees from the fact table — two
    // full lineitem scans at 100 TB. Cached it is one scan plus a
    // supplier-sized (one row per supplier) in-memory relation.
    val rev = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1998-04-01").cast("timestamp_ntz"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
      .cache()
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // --- Q2-style: min-cost supplier per part (correlated min → argmin join) ---
  // The testdata has no partsupp; the supply-cost analog is the cheapest
  // observed line price per (part, supplier) — a pure `min`, so the
  // equality probe against the per-part minimum is exact (no float
  // accumulation). The textbook correlated scalar subquery
  // (`cost = (SELECT min(cost) … WHERE same part AND region)`)
  // decorrelates into one per-part aggregate broadcast-joined back on
  // (partkey, cost): lineitem is scanned once, the pair-grain relation
  // is cached (read by both the min agg and the probe), and ties keep
  // every argmin row, exactly like TPC-H Q2.
  def q2MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_size") <= 10 && col("p_type") === "LARGE")
    val nation = Tables.load(spark, sfDir, "nation")
    val region = Tables.load(spark, sfDir, "region").filter(col("r_name") === "EUROPE")
    // nation⋈region: fixed cardinality → hard broadcast; supplier scales
    // with SF → AQE decides its join side.
    val eu = Tables.load(spark, sfDir, "supplier")
      .join(broadcast(nation.join(region, col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    // pre-filter the big side BEFORE the aggregation (guide §3.2): the
    // part predicate is selective, and per-part minima are per-key, so
    // dropping non-matching partkeys up front cannot change any kept
    // row — the planner broadcasts the semi-join side while it is
    // small and falls back to a shuffle semi-join at scale
    val psEu = li
      .join(part.select(col("p_partkey").as("l_partkey")), Seq("l_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("cost"))
      .join(eu, col("l_suppkey") === col("s_suppkey"))
      .cache() // read twice: per-part min + argmin probe — one lineitem scan, not two
    val best = psEu.groupBy(col("l_partkey").as("bp")).agg(min(col("cost")).as("min_cost"))
    psEu
      .join(best, col("l_partkey") === col("bp") && col("cost") === col("min_cost"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("s_acctbal"), col("cost").as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
  }

  val q2MinCostSupplierSql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      |  FROM lineitem GROUP BY 1, 2),
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |best AS (
      |  SELECT l_partkey AS bp, min(cost) AS min_cost
      |  FROM ps JOIN eu ON l_suppkey = s_suppkey GROUP BY 1)
      |SELECT p_partkey, p_name, s_name, n_name, s_acctbal, cost AS supply_cost
      |FROM part
      |JOIN ps ON l_partkey = p_partkey
      |JOIN eu ON l_suppkey = s_suppkey
      |JOIN best ON bp = p_partkey AND cost = min_cost
      |WHERE p_size <= 10 AND p_type = 'LARGE'
      |ORDER BY s_acctbal DESC, p_partkey, s_name""".stripMargin

  // --- Q11-style: parts above a fraction of total regional value -------
  // The HAVING-vs-global-scalar-subquery pattern. Per-part values stay
  // DECIMAL through BOTH the group sums and the grand total (decimal
  // addition is exact and order-independent, so the total computed from
  // the cached per-part aggregate equals the oracle's bit-for-bit);
  // only the final compare/output cast to double. One fact scan: the
  // per-part aggregate is cached and the 1-row total is broadcast back.
  def q11ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val nation = Tables.load(spark, sfDir, "nation")
    val region = Tables.load(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    val asia = Tables.load(spark, sfDir, "supplier")
      .join(broadcast(nation.join(region, col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = li.join(asia, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 4))).as("pv"))
      .cache() // read twice: grand mean + threshold filter
    // threshold = 1.4× the MEAN part value — scale-invariant (TPC-H's
    // fixed fraction of the total empties out as part count grows),
    // still the same decorrelated shape: exact decimal total, one
    // deterministic divide+multiply, 1-row broadcast back.
    val thresh = value
      .agg((sum(col("pv")).cast(DoubleType) / count(lit(1)) * lit(1.4)).as("thresh"))
    value.crossJoin(broadcast(thresh))
      .filter(col("pv").cast(DoubleType) > col("thresh"))
      .select(col("l_partkey").as("p_partkey"), col("pv").cast(DoubleType).as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  val q11ImportantPartsSql: String =
    """WITH val AS (
      |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS pv
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA' GROUP BY 1),
      |tot AS (SELECT CAST(sum(pv) AS DOUBLE) / count(*) * 1.4 AS thresh FROM val)
      |SELECT l_partkey AS p_partkey, CAST(pv AS DOUBLE) AS part_value
      |FROM val, tot WHERE CAST(pv AS DOUBLE) > thresh
      |ORDER BY part_value DESC, p_partkey""".stripMargin

  // --- Q20-style: suppliers of growing parts (nested IN → two semi joins) ---
  // The double-nested-IN shape of TPC-H Q20: an inner correlated
  // aggregate over the fact table gated by a part-name filter, whose
  // surviving supplier set semi-joins the supplier dimension. The part
  // filter semi-joins lineitem FIRST (AQE broadcasts the filtered part
  // keys), the year-conditional sums collapse the fact to (supplier,
  // part) grain in one shuffle, and the final `IN` is a left-semi join
  // against the distinct supplier set — no correlated re-execution
  // anywhere. Decimal sums make the 2× growth compare exact.
  def q20GrowthSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val redParts = Tables.load(spark, sfDir, "part")
      .filter(col("p_name").contains("red")).select(col("p_partkey"))
    val nation = Tables.load(spark, sfDir, "nation")
    val region = Tables.load(spark, sfDir, "region").filter(col("r_name") === "EUROPE")
    val q = (y: Int) => sum(when(year(col("l_shipdate")) === y,
      col("l_quantity").cast(DecimalType(18, 4))).otherwise(lit(0).cast(DecimalType(18, 4))))
    val grown = li.join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(q(1999).as("q99"), q(1998).as("q98"))
      .filter(col("q99").cast(DoubleType) > lit(2.0) * col("q98").cast(DoubleType) &&
        col("q98") > 0)
      .select(col("l_suppkey")).distinct()
    Tables.load(spark, sfDir, "supplier")
      .join(broadcast(nation.join(region, col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(grown, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  val q20GrowthSuppliersSql: String =
    """WITH growth AS (
      |  SELECT l_suppkey, l_partkey,
      |    sum(CASE WHEN year(l_shipdate)=1999 THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE 0 END) AS q99,
      |    sum(CASE WHEN year(l_shipdate)=1998 THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE 0 END) AS q98
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
      |  GROUP BY 1, 2
      |  HAVING CAST(q99 AS DOUBLE) > 2.0 * CAST(q98 AS DOUBLE) AND q98 > 0)
      |SELECT s_suppkey, s_name FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE' AND s_suppkey IN (SELECT l_suppkey FROM growth)
      |ORDER BY s_suppkey""".stripMargin

  // --- range join: events attributed to incident windows ---------------
  // Point-in-interval with NO equi key — the shape Spark would plan as
  // a BroadcastNestedLoopJoin (O(points × ranges)). RangeJoin bins the
  // time axis (1 h bins over 6 h windows), so the plan is a plain hash
  // join on the bin id with the exact bounds as a residual filter.
  // Windows are event-anchored (every 499th event opens a 6 h window),
  // which keeps BOTH sides in the raw ns-long domain — no timestamp
  // conversion anywhere on the Spark side; the oracle mirrors with
  // native ns timestamps and an INTERVAL bound (both exact).
  private val RangeAnchorMod = 499
  private val RangeWindowNs = 6L * 3600L * 1000000000L
  private val RangeBinNs = 3600L * 1000000000L

  def rangeJoinEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val points = ev.select(col("event_id"), col("ts"), col("value"))
    val ranges = ev.filter(col("event_id") % RangeAnchorMod === 0)
      .select(col("event_id").as("range_id"), col("ts").as("start_ns"),
        (col("ts") + lit(RangeWindowNs)).as("end_ns"))
    graft.merge.RangeJoin
      .pointInInterval(points, ranges, "ts", "start_ns", "end_ns", RangeBinNs)
      .groupBy(col("range_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("range_id"))
  }

  val rangeJoinEventsSql: String =
    s"""WITH ranges AS (
      |  SELECT event_id AS range_id, ts AS s, ts + INTERVAL 6 HOUR AS e
      |  FROM events WHERE event_id % $RangeAnchorMod = 0)
      |SELECT range_id, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM ranges JOIN events ev ON ev.ts >= s AND ev.ts <= e
      |GROUP BY range_id ORDER BY range_id""".stripMargin

  // --- plain pushdown scan (S1 analog): projection+filter reach parquet ---
  def snapshotScan(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val snapshotScanSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 100000 ORDER BY o_orderkey""".stripMargin

  // --- events: ordered funnel (view → click → purchase) -----------------
  // The canonical product-analytics shape: how far does each user get
  // through an ORDERED step sequence? The scalable formulation is one
  // hash-agg per step — step n's earliest qualifying time is
  // min(ts | ts > t_{n-1}) — with user-keyed equi-joins between steps,
  // so nothing ever sorts per user or windows over the event log
  // (the naive per-user ORDER BY ts scan shuffles the whole log into
  // per-user sorted state; this shuffles one row per user per step).
  // Step times are int64 MICROSECOND epochs on both sides (`ts div
  // 1000` here, `epoch_us` in the oracle): DuckDB holds TIMESTAMP_NS
  // parquet values at µs resolution, so comparing at ns would let the
  // engines disagree inside a microsecond.
  def eventsFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
    def step(typ: String, after: Option[DataFrame], tcol: String): DataFrame = {
      val base = ev.filter(col("event_type") === typ)
      val scoped = after match {
        case Some(prev) =>
          val pcol = prev.columns.last
          base.join(prev, Seq("user_id")).filter(col("tus") > col(pcol))
        case None => base
      }
      scoped.groupBy(col("user_id")).agg(min(col("tus")).as(tcol))
    }
    // each step frame is |users|-sized (bounded, « the log) and read
    // twice — by the next step AND the final join; uncached, t1's
    // subtree re-evaluates inside t2 and t3 (7 log scans instead of 4)
    val t1 = step("view", None, "t_view").cache()
    val t2 = step("click", Some(t1), "t_click").cache()
    val t3 = step("purchase", Some(t2), "t_purchase")
    ev.select(col("user_id")).distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2.select(col("user_id"), col("t_click")), Seq("user_id"), "left")
      .join(t3.select(col("user_id"), col("t_purchase")), Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0).cast("int").as("stage"),
        col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy(col("user_id"))
  }

  val eventsFunnelSql: String =
    """WITH t1 AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
      |  FROM events e JOIN t1 ON e.user_id = t1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t_view GROUP BY 1),
      |t3 AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
      |  FROM events e JOIN t2 ON e.user_id = t2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t_click GROUP BY 1)
      |SELECT u.user_id,
      |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
      |            WHEN t_click IS NOT NULL THEN 2
      |            WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage,
      |  t_view, t_click, t_purchase
      |FROM (SELECT DISTINCT user_id FROM events) u
      |LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
      |LEFT JOIN t3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  // --- events: cohort retention ----------------------------------------
  // Users grouped by first-seen day; how many of each cohort come back
  // on day offset d? All int64 day arithmetic on the µs epoch — µs, not
  // ns, for the same cross-engine resolution reason as eventsFunnel (an
  // event within 1 µs of midnight must land in the same day in both
  // engines). Scale: first-day and (user, day) distinct are two
  // hash-aggs co-partitioned on user_id, then one bounded
  // (cohort, offset) agg — linear, no windows, no self-join of the log.
  private val DayUs = 86400L * 1000000L

  def eventsRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val firstDay = ev.groupBy(col("user_id"))
      .agg(min(expr(s"(ts div 1000) div $DayUs")).as("cohort_day"))
    val activeDays = ev.select(col("user_id"), expr(s"(ts div 1000) div $DayUs").as("day")).distinct()
    activeDays.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val eventsRetentionSql: String =
    s"""WITH days AS (
      |  SELECT user_id, epoch_us(ts) // $DayUs AS day FROM events),
      |first AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1),
      |active AS (SELECT DISTINCT user_id, day FROM days)
      |SELECT cohort_day, day - cohort_day AS day_offset,
      |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
      |FROM active a JOIN first f ON a.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin

  // --- hot-key skew report: the salting decision's input ----------------
  // Before a 100 TB join or agg is salted, someone has to MEASURE the
  // skew — this is that report: the 20 hottest keys with their traffic
  // share. Per-key counts are one hash agg; the top-20 goes through the
  // bounded partial-merge TopKAgg (≤ k rows per partition through the
  // exchange — a global ORDER BY over per-key counts would sort |keys|
  // rows to find 20), and the share divide is one exact long→double op.
  private val SkewTopN = 20

  def eventsKeySkew(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TopKAgg
    val topk = udaf(new TopKAgg(SkewTopN))
    val counts = Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      // feeds the total AND the top-k — one events scan. Eager
      // localCheckpoint, not cache: the blocks are context-cleaned when
      // the frame goes unreferenced, so repeated Verify/Bench
      // invocations don't accumulate storage memory
      .localCheckpoint(true)
    val tot = counts.agg(sum(col("n")).as("total"))
    counts
      .agg(topk(col("n").cast("double"), col("user_id")).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "p")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("user_id"), col("p.sim").cast("long").as("n_events"))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("user_id"), col("n_events"),
        round(col("n_events").cast("double") / col("total").cast("double"), 6).as("share"))
      .orderBy(col("rank"))
  }

  val eventsKeySkewSql: String =
    s"""WITH counts AS (
      |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
      |tot AS (SELECT sum(n) AS total FROM counts),
      |ranked AS (
      |  SELECT user_id, n,
      |    row_number() OVER (ORDER BY n DESC, user_id) AS rank
      |  FROM counts)
      |SELECT CAST(rank AS INT) AS rank, user_id, CAST(n AS BIGINT) AS n_events,
      |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
      |FROM ranked CROSS JOIN tot
      |WHERE rank <= $SkewTopN ORDER BY rank""".stripMargin

  // --- top movers: volume shift between time halves ---------------------
  // The ops question after every deploy: which event types changed
  // volume? Split the observed time range at its midpoint ((min+max)
  // div 2 on exact ns-epoch longs — no timestamp arithmetic to drift
  // cross-engine), count each type per half in ONE conditional-counter
  // hash agg, rank by absolute delta through a TakeOrdered. The bounds
  // scan is column-pruned (ts only) and broadcasts one row.
  private val MoversTopN = 10

  def eventsTopMovers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val bounds = ev.agg(min(col("ts")).as("tmin"), max(col("ts")).as("tmax"))
    ev.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        (col("ts") <= expr("(tmin + tmax) div 2")).cast("long").as("h1"))
      .groupBy(col("event_type"))
      .agg(sum(col("h1")).as("n_first"), sum(lit(1L) - col("h1")).as("n_second"))
      .select(col("event_type"), col("n_first"), col("n_second"),
        (col("n_second") - col("n_first")).as("delta"))
      .orderBy(abs(col("n_second") - col("n_first")).desc, col("event_type"))
      .limit(MoversTopN)
  }

  val eventsTopMoversSql: String =
    s"""WITH b AS (
      |  SELECT min(epoch_ns(ts)) AS tmin, max(epoch_ns(ts)) AS tmax FROM events),
      |c AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN epoch_ns(ts) <= (tmin + tmax) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
      |    CAST(sum(CASE WHEN epoch_ns(ts) <= (tmin + tmax) // 2 THEN 0 ELSE 1 END) AS BIGINT) AS n_second
      |  FROM events CROSS JOIN b GROUP BY 1)
      |SELECT event_type, n_first, n_second, n_second - n_first AS delta
      |FROM c ORDER BY abs(n_second - n_first) DESC, event_type
      |LIMIT $MoversTopN""".stripMargin

  // --- pivot / unpivot -------------------------------------------------
  // The relational PIVOT with an EXPLICIT value list — the only form
  // that scales: Spark's inferred-values pivot needs a driver-side
  // distinct pass first, and a warehouse report has a fixed column
  // contract anyway. Under the hood this is ONE hash aggregation with a
  // conditional counter per pivoted value (adding a column adds a
  // counter, not a pass), so the plan is a single scan + single agg.
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def eventsPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .count()
      .na.fill(0L, EventTypes)
      .select(col("user_id") +: EventTypes.map(t => col(t).as(s"n_$t")): _*)
      .orderBy(col("user_id"))

  val eventsPivotSql: String =
    s"""SELECT user_id,
      |${EventTypes.map(t => s"  count(*) FILTER (WHERE event_type = '$t') AS n_$t").mkString(",\n")}
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** The inverse face: melt the pivoted report back to long form with
    * Spark's native `unpivot` (keeps the zero cells an aggregate would
    * drop — the difference between a report and a group-by). Same
    * single-scan plan; `unpivot` is a per-row expand, no shuffle added
    * beyond the pivot's own agg. */
  def eventsUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    eventsPivot(spark, sfDir)
      .unpivot(Array(col("user_id")),
        EventTypes.map(t => col(s"n_$t")).toArray, "event_type", "n_events")
      .withColumn("event_type", expr("substring(event_type, 3)"))
      .orderBy(col("user_id"), col("event_type"))

  val eventsUnpivotSql: String =
    s"""WITH pivoted AS ($eventsPivotSql),
      |melted AS (
      |${EventTypes.map(t =>
        s"  SELECT user_id, '$t' AS event_type, n_$t AS n_events FROM pivoted")
        .mkString("\n  UNION ALL\n")}
      |)
      |SELECT user_id, event_type, CAST(n_events AS BIGINT) AS n_events
      |FROM melted ORDER BY user_id, event_type""".stripMargin
}
