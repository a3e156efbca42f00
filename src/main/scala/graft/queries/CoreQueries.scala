package graft.queries

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One query per generated-SQL operator row of SURVEY §2.B (the data
  * plane the engine must execute natively), each with an ANSI-SQL
  * DuckDB oracle (SparkEntry.oracleSql).
  *
  * Conventions for oracle parity:
  *  - every computed column is aliased identically on both sides;
  *  - float aggregates are ROUND()ed (Spark's partial-agg summation
  *    order differs from DuckDB's sequential sum at the 1e-10 level);
  *  - computed integers are cast to BIGINT on both sides;
  *  - deterministic ORDER BY on unique key columns;
  *  - rolled-up NULL group keys are COALESCEd to a sentinel (Spark and
  *    DuckDB default NULL sort order differ).
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  import org.apache.spark.sql.Column

  /** Money sums go through DECIMAL: the fixture's money columns are
    * exact 2-decimal values, so decimal accumulation is EXACT and
    * engine-independent — double accumulation differs from DuckDB's in
    * the last ulps and at sf0.1 that difference crosses ROUND(x, 4)
    * boundaries (observed on sums ~6e9).
    */
  private[queries] def moneySum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Σ price·(1−discount) in exact decimal arithmetic. */
  private[queries] def discPriceSum(price: Column, disc: Column): Column =
    sum(price.cast("decimal(18,2)") * (lit(1) - disc.cast("decimal(4,2)")))
      .cast("double")

  /** B1+B2+B3: scan with range filter + projection; the predicate and
    * 4-column read schema must reach the parquet scan (verified in
    * PlanSpec).
    */
  def scanFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit(Date.valueOf("1996-01-01")) &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val scanFilterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date,
      |       ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
      |FROM lineitem
      |WHERE l_shipdate < DATE '1996-01-01' AND l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** B4 (agg) over the full table — TPC-H Q1 shape: grouped sums /
    * averages / counts with map-side partial aggregation.
    */
  def aggPricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(moneySum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(discPriceSum(col("l_extendedprice"), col("l_discount")), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val aggPricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |       ROUND(SUM(l_quantity), 4) AS sum_qty,
      |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_base_price,
      |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS sum_disc_price,
      |       ROUND(AVG(l_quantity), 4) AS avg_qty,
      |       ROUND(AVG(l_discount), 4) AS avg_disc,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** B4+B5: the boundary probe — per-source MIN/MAX unioned then
    * re-aggregated, exactly the reference's batched probe shape
    * (`helpers.sql:19-31`).
    */
  def minmaxBoundaryProbe(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .agg(min(col("o_orderdate")).as("min_ts"), max(col("o_orderdate")).as("max_ts"))
    val l = Tables.lineitem(spark, dir)
      .agg(min(col("l_shipdate")).as("min_ts"), max(col("l_shipdate")).as("max_ts"))
    o.unionAll(l)
      .agg(min(col("min_ts")).cast("date").as("start_date"),
        max(col("max_ts")).cast("date").as("stop_date"))
  }

  val minmaxBoundaryProbeSql: String =
    """SELECT CAST(MIN(min_ts) AS DATE) AS start_date,
      |       CAST(MAX(max_ts) AS DATE) AS stop_date
      |FROM (
      |  SELECT MIN(o_orderdate) AS min_ts, MAX(o_orderdate) AS max_ts FROM orders
      |  UNION ALL
      |  SELECT MIN(l_shipdate), MAX(l_shipdate) FROM lineitem
      |)""".stripMargin

  /** B17 joins, broadcast flavor: revenue by nation through the
    * supplier dimension chain — both dims broadcast (verified in
    * PlanSpec), so the only shuffle is the final small aggregation.
    */
  def joinBroadcastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(discPriceSum(col("l_extendedprice"), col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))

  val joinBroadcastRevenueSql: String =
    """SELECT n_name,
      |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS revenue,
      |       COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** B17 joins, shuffle flavor: fact-to-fact lineitem ⋈ orders on the
    * shared key (sort-merge / shuffled-hash at scale, AQE decides).
    */
  def joinOrdersPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        round(moneySum(col("l_extendedprice")), 4).as("total_price"))
      .orderBy(col("o_orderpriority"))

  val joinOrdersPrioritySql: String =
    """SELECT o_orderpriority,
      |       COUNT(DISTINCT o_orderkey) AS n_orders,
      |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** B13-adjacent semi join: EXISTS rewritten to left_semi. */
  def semiJoinBigQuantity(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).filter(col("l_quantity") >= 49)
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("o_totalprice"))
      .orderBy(col("o_orderkey"))

  val semiJoinBigQuantitySql: String =
    """SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      |ORDER BY o_orderkey""".stripMargin

  /** B13 anti join: NOT EXISTS rewritten to left_anti — the upsert
    * delete path's join shape. (Filter on the right side keeps the
    * result non-empty: customers who never placed a large order.)
    */
  def antiJoinCustomersNoOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 250000).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val antiJoinCustomersNoOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      |ORDER BY c_custkey""".stripMargin

  /** B17 window functions — advertised loop-body capability
    * (`README.md:23-25`): per-supplier ordered row_number + running sum.
    */
  def windowRunningShipments(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_qty",
        round(sum(col("l_quantity")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
      .filter(col("rn") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("rn"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val windowRunningShipmentsSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      |       ROUND(SUM(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
      |         AS running_qty
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      |QUALIFY rn <= 5
      |ORDER BY l_suppkey, rn""".stripMargin

  /** B6 scalar date functions: DATEADD / DATEDIFF / CAST / least-style
    * clamping — the macro-generated date arithmetic surface.
    */
  def dateScalars(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus_30d"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus_2m"),
        add_months(col("o_orderdate").cast("date"), 12).as("plus_1y"),
        datediff(lit(Date.valueOf("1998-01-01")), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_98"))
      .orderBy(col("o_orderkey"))

  val dateScalarsSql: String =
    """SELECT o_orderkey,
      |       CAST(o_orderdate AS DATE) AS order_date,
      |       CAST(o_orderdate AS DATE) + 30 AS plus_30d,
      |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
      |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 12 MONTH AS DATE) AS plus_1y,
      |       CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT)
      |         AS days_to_98
      |FROM orders WHERE o_orderkey <= 1000
      |ORDER BY o_orderkey""".stripMargin

  /** B7 conditional scalars: LEAST / GREATEST / COALESCE / NULLIF. */
  def conditionalScalars(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        least(col("p_size"), lit(25)).cast("long").as("size_capped"),
        round(greatest(col("p_retailprice"), lit(1000.0)), 4).as("price_floor"),
        coalesce(nullif(col("p_brand"), lit("Brand#33")), lit("OTHER")).as("brand_masked"))
      .orderBy(col("p_partkey"))

  val conditionalScalarsSql: String =
    """SELECT p_partkey,
      |       CAST(LEAST(p_size, 25) AS BIGINT) AS size_capped,
      |       ROUND(GREATEST(p_retailprice, 1000.0), 4) AS price_floor,
      |       COALESCE(NULLIF(p_brand, 'Brand#33'), 'OTHER') AS brand_masked
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** B8 CTE + set operations (UNION / INTERSECT / EXCEPT) over derived
    * key sets.
    */
  def cteSetOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val big  = orders.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val u = big.union(urgent).distinct().agg(count(lit(1)).as("n")).withColumn("op", lit("union"))
    val i = big.intersect(urgent).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
    val e = big.except(urgent).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
    u.unionAll(i).unionAll(e).select(col("op"), col("n")).orderBy(col("op"))
  }

  val cteSetOpsSql: String =
    """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
      |     urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT DISTINCT o_custkey FROM (SELECT * FROM big UNION SELECT * FROM urgent))
      |UNION ALL
      |SELECT 'intersect', COUNT(*) FROM (SELECT * FROM big INTERSECT SELECT * FROM urgent)
      |UNION ALL
      |SELECT 'except', COUNT(*) FROM (SELECT * FROM big EXCEPT SELECT * FROM urgent)
      |ORDER BY op""".stripMargin

  /** Beyond-reference: ROLLUP grouping sets (north-star §7.8). */
  def rollupQuantities(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  val rollupQuantitiesSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Sort + limit (top-k): TakeOrderedAndProject at the physical level. */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val topKOrdersSql: String =
    """SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin

  /** JSON extraction from the events.props column (north-star §7.8). */
  def jsonExtractEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))

  val jsonExtractEventsSql: String =
    """SELECT event_type,
      |       COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k, ROUND(AVG(k), 4) AS avg_k
      |FROM (SELECT event_type,
      |             CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** The flagship one-shot model: per-day per-type event aggregation
    * (the loop body of the materialization, run over the whole range).
    */
  def eventsDailyAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(moneySum(col("value")), 4).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day"), col("event_type"))

  val eventsDailyAggSql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |       COUNT(*) AS n_events,
      |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value,
      |       COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  /** Full CUBE over order priority × status — all four grouping sets,
    * where ROLLUP (q12) covers only the hierarchical prefix sets.
    * Spark lowers cube to a single Expand + hash aggregate: one scan,
    * map-side partials for every grouping set — no per-set re-scan.
    * Neither grouping column is nullable in the data, so COALESCE
    * sentinels identify the subtotal rows unambiguously.
    */
  def cubeOrderStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(moneySum(col("o_totalprice")), 4).as("total_price"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total_price"))
      .orderBy(col("priority"), col("status"))

  val cubeOrderStatsSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |       COALESCE(o_orderstatus, 'ALL') AS status,
      |       COUNT(*) AS n,
      |       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Long-to-wide pivot: per-day event counts, one column per event
    * type. The value list is EXPLICIT, so Spark plans a single
    * aggregate with map-side partials (an unlisted-values pivot needs
    * a distinct-values pre-pass, a second scan a 100 TB stream cannot
    * afford). Missing (day, type) combinations surface as 0, matching
    * the oracle's COUNT(*) FILTER.
    */
  def pivotEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.events(spark, dir)
      .groupBy(col("ts").cast("date").as("day"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    eventTypes.foldLeft(wide)((d, t) => d.withColumnRenamed(t, s"n_$t"))
      .na.fill(0L, eventTypes.map("n_" + _))
      .orderBy(col("day"))
  }

  val pivotEventCountsSql: String =
    """SELECT CAST(ts AS DATE) AS day,
      |       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
      |       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
      |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      |       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
      |FROM events
      |GROUP BY 1
      |ORDER BY day""".stripMargin
}
