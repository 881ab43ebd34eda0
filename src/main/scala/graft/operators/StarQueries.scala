package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** The batch analytics catalog over the star schema.
  *
  * Every query shape from the reference EDA surface
  * (/root/reference/spark_eda.py — see SURVEY.md §2.1) is re-expressed
  * here against the TPC-H-ish tables, plus the star-schema joins the
  * reference never had (SURVEY.md §2.2 "Joins").
  *
  * == Cross-engine determinism conventions ==
  * The driver hash-compares our parquet output against DuckDB running
  * [[graft.SparkEntry.oracleSql]]. Doubles summed in parallel are
  * order-dependent, so every money/quantity aggregate:
  *   1. casts each row value to DECIMAL(18,4) (unambiguous — source data
  *      has ≤2 decimal digits, derived products ≤4),
  *   2. SUMs in decimal (exact, associative → partition-order-proof),
  *   3. casts the final scalar to DOUBLE (single correctly-rounded
  *      conversion, identical in JVM BigDecimal and DuckDB).
  * Averages are explicit sum/count with one IEEE double division.
  * Every query ends in a total ORDER BY (unique tiebreaker) so LIMITs
  * are deterministic.
  *
  * == Scale posture (100 TB) ==
  * All plans are declarative DataFrame chains: filters/projections reach
  * the parquet scan (PushedFilters/ReadSchema), aggregates get
  * partial+final HashAggregate, dimension joins are broadcast
  * (region/nation/supplier/part are small by star-schema construction),
  * fact-fact joins (lineitem⋈orders) are shuffle joins on the join key
  * that AQE can re-plan. No driver-side loops, no collect() mid-plan.
  */
object StarQueries {

  private val D = DecimalType(18, 4)

  /** Exact decimal sum surfaced as double — see determinism notes. */
  private def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** avg = exact-decimal sum / count, one double division. */
  private def davg(c: Column): Column =
    sum(c.cast(D)).cast(DoubleType) / count(c).cast(DoubleType)

  /** DuckDB text for the same decimal-sum convention. */
  private def sqlDsum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,4))) AS DOUBLE)"
  private def sqlDavg(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT($e) AS DOUBLE)"

  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val sqlRevenue = "l_extendedprice * (1.0 - l_discount)"

  // ---------------------------------------------------------------------------
  // Q1-shape: pricing summary (scan → filter → groupBy agg → order)
  // Reference shape: spark_eda.py:70-90 (genre revenue); TPC-H Q1 flavor.
  // Plan: parquet scan w/ pushed filter → partial HashAggregate →
  // exchange(32) → final HashAggregate → sort. Two stages at any scale.
  // ---------------------------------------------------------------------------
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(revenue).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  ${sqlDsum(sqlRevenue)} AS sum_disc_price,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_extendedprice")} AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------------
  // Q1-analog: revenue by part type, top 15 (explode-genre analog via dim join)
  // part is a dimension → broadcast hash join, no shuffle of lineitem.
  // ---------------------------------------------------------------------------
  def q02PartTypeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(
        dsum(revenue).as("total_revenue"),
        count(lit(1)).as("game_count"))
      .orderBy(col("total_revenue").desc, col("p_type"))
      .limit(15)

  val q02Sql: String =
    s"""SELECT p_type,
       |  ${sqlDsum(sqlRevenue)} AS total_revenue,
       |  COUNT(*) AS game_count
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_type
       |ORDER BY total_revenue DESC, p_type
       |LIMIT 15""".stripMargin

  // ---------------------------------------------------------------------------
  // Q2-analog: supplier metrics (developer metrics shape: groupBy key w/o
  // explode, three aggregates, top-15). Broadcast dim join.
  // ---------------------------------------------------------------------------
  def q03SupplierMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(
        dsum(revenue).as("total_revenue"),
        dsum(col("l_quantity")).as("total_quantity"),
        count(lit(1)).as("line_count"))
      .orderBy(col("total_revenue").desc, col("s_name"))
      .limit(15)

  val q03Sql: String =
    s"""SELECT s_name,
       |  ${sqlDsum(sqlRevenue)} AS total_revenue,
       |  ${sqlDsum("l_quantity")} AS total_quantity,
       |  COUNT(*) AS line_count
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_name
       |ORDER BY total_revenue DESC, s_name
       |LIMIT 15""".stripMargin

  // ---------------------------------------------------------------------------
  // Q3-analog: yearly trend (substring-year → filter range → agg → order asc;
  // reference did the avg driver-side, spark_eda.py:147 — here it's in-plan).
  // ---------------------------------------------------------------------------
  def q04YearlyTrend(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")))
      .filter(col("order_year").between(1995, 2000))
      .groupBy(col("order_year"))
      .agg(
        dsum(col("o_totalprice")).as("total_revenue"),
        davg(col("o_totalprice")).as("avg_price"),
        count(lit(1)).as("order_count"))
      .orderBy(col("order_year"))

  val q04Sql: String =
    s"""SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
       |  ${sqlDsum("o_totalprice")} AS total_revenue,
       |  ${sqlDavg("o_totalprice")} AS avg_price,
       |  COUNT(*) AS order_count
       |FROM orders
       |WHERE YEAR(o_orderdate) BETWEEN 1995 AND 2000
       |GROUP BY 1
       |ORDER BY order_year""".stripMargin

  // ---------------------------------------------------------------------------
  // Q4-analog: when-chain price buckets → avg + count, lexicographic order
  // (the reference sorts bucket LABELS, spark_eda.py:175 — kept).
  // ---------------------------------------------------------------------------
  private def priceBucket: Column =
    when(col("o_totalprice") < 100000, "a_under_100k")
      .when(col("o_totalprice") < 200000, "b_100k_200k")
      .when(col("o_totalprice") < 300000, "c_200k_300k")
      .when(col("o_totalprice") < 400000, "d_300k_400k")
      .otherwise("e_400k_plus")

  private val sqlPriceBucket =
    """CASE WHEN o_totalprice < 100000 THEN 'a_under_100k'
      |     WHEN o_totalprice < 200000 THEN 'b_100k_200k'
      |     WHEN o_totalprice < 300000 THEN 'c_200k_300k'
      |     WHEN o_totalprice < 400000 THEN 'd_300k_400k'
      |     ELSE 'e_400k_plus' END""".stripMargin

  def q05PriceBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_totalprice").isNotNull)
      .withColumn("price_range", priceBucket)
      .groupBy(col("price_range"))
      .agg(
        davg(col("o_totalprice")).as("avg_price"),
        count(lit(1)).as("order_count"))
      .orderBy(col("price_range"))

  val q05Sql: String =
    s"""SELECT $sqlPriceBucket AS price_range,
       |  ${sqlDavg("o_totalprice")} AS avg_price,
       |  COUNT(*) AS order_count
       |FROM orders
       |WHERE o_totalprice IS NOT NULL
       |GROUP BY 1
       |ORDER BY price_range""".stripMargin

  // ---------------------------------------------------------------------------
  // Q5/Q6-analog: top supplier by revenue, then its top-10 lines.
  // Reference pulls the winner to the driver (spark_eda.py:214) — here the
  // "winner" is a rank-1 filter so the whole thing stays one distributed plan.
  // ---------------------------------------------------------------------------
  def q06TopSupplierHits(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .withColumn("line_revenue", revenue)
    val bySupp = li.groupBy(col("s_name"))
      .agg(dsum(col("line_revenue")).as("total_revenue"))
    val top = bySupp
      .withColumn("rk", row_number().over(
        Window.orderBy(col("total_revenue").desc, col("s_name"))))
      .filter(col("rk") === 1)
      .select(col("s_name").as("top_name"))
    li.join(broadcast(top), col("s_name") === col("top_name"))
      .select(
        col("s_name"),
        col("l_orderkey"), col("l_linenumber"),
        col("line_revenue").cast(D).cast(DoubleType).as("line_revenue"),
        col("l_quantity"))
      .orderBy(col("line_revenue").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)
  }

  val q06Sql: String =
    s"""WITH li AS (
       |  SELECT s_name, l_orderkey, l_linenumber, l_quantity,
       |         CAST(CAST($sqlRevenue AS DECIMAL(18,4)) AS DOUBLE) AS line_revenue
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
       |top AS (
       |  SELECT s_name AS top_name
       |  FROM li GROUP BY s_name
       |  ORDER BY ${sqlDsum("line_revenue")} DESC, s_name LIMIT 1)
       |SELECT s_name, l_orderkey, l_linenumber, line_revenue, l_quantity
       |FROM li JOIN top ON s_name = top_name
       |ORDER BY line_revenue DESC, l_orderkey, l_linenumber
       |LIMIT 10""".stripMargin

  /** name → query for [[graft.SparkEntry]]. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> q01PricingSummary _,
    "q02_parttype_revenue" -> q02PartTypeRevenue _,
    "q03_supplier_metrics" -> q03SupplierMetrics _,
    "q04_yearly_trend"     -> q04YearlyTrend _,
    "q05_price_buckets"    -> q05PriceBuckets _,
    "q06_top_supplier_hits" -> q06TopSupplierHits _,
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary"  -> q01Sql,
    "q02_parttype_revenue" -> q02Sql,
    "q03_supplier_metrics" -> q03Sql,
    "q04_yearly_trend"     -> q04Sql,
    "q05_price_buckets"    -> q05Sql,
    "q06_top_supplier_hits" -> q06Sql,
  )
}
