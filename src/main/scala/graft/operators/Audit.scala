package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** Data-quality constraint audit — the Deequ/expectations shape every
  * production pipeline runs before publishing a table: completeness,
  * uniqueness, value-range compliance, pattern compliance, freshness,
  * and referential integrity, each reported as (check, metric, passed).
  *
  * Scale posture (100 TB): ALL scalar constraints are fused into ONE
  * aggregate over ONE scan of the fact table — the naive
  * one-scan-per-check layout (what ad-hoc audit scripts do) re-reads
  * the table once per constraint, which at 100 TB turns a nightly
  * gate into a day-long job. The only second pass is referential
  * integrity, which genuinely needs the dimension side: it joins
  * against the distinct key set (broadcast-sized for real dimensions)
  * and also collapses to a single counting aggregate. The long-format
  * report is built by exploding the one aggregate row — no extra jobs,
  * no driver-side loops.
  */
object Audit {

  /** One constraint: an aggregate producing the metric (as double) and
    * a predicate over that metric deciding pass/fail. */
  final case class Check(name: String, metric: Column, passed: Column => Column)

  /** Run all checks in ONE aggregate pass over `df`, returning the
    * long-format report (check, metric, passed) ordered by check. */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val agg = df.agg(checks.head.metric.cast(DoubleType).as(checks.head.name),
      checks.tail.map(c => c.metric.cast(DoubleType).as(c.name)): _*)
    report(agg, checks)
  }

  /** Explode a one-row frame of named metric columns into the report. */
  private[operators] def report(aggRow: DataFrame, checks: Seq[Check]): DataFrame =
    aggRow
      .select(explode(array(checks.map { c =>
        struct(lit(c.name).as("check"), col(c.name).as("metric"),
          c.passed(col(c.name)).as("passed"))
      }: _*)).as("r"))
      .select(col("r.check"), col("r.metric"), col("r.passed"))

  /** The fraction of rows satisfying `cond` (1.0 = full compliance).
    * Exact integer counts divided once at the end — engine-stable. */
  def compliance(cond: Column): Column =
    count(when(cond, lit(1))).cast(DoubleType) /
      count(lit(1)).cast(DoubleType)

  // ---------------------------------------------------------------------------
  // Gate query
  // ---------------------------------------------------------------------------

  private val priorityPattern = "^[1-5]-[A-Z ]+$"

  /** w03 — the audit suite over `orders`: eight single-scan constraints
    * plus referential integrity of o_custkey against `customer`. Every
    * metric is either an integer-count ratio or a min/max passthrough,
    * so the doubles are bit-identical across engines and the gate
    * hash-matches the full report including the pass verdicts. */
  def w03QualityAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val scalarChecks = Seq(
      Check("completeness_o_orderdate",
        count(col("o_orderdate")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), _ === 1.0),
      Check("compliance_price_range",
        compliance(col("o_totalprice") > 0 && col("o_totalprice") <= 1000000.0),
        _ === 1.0),
      Check("compliance_priority_pattern",
        compliance(regexp_like(col("o_orderpriority"), lit(priorityPattern))),
        _ === 1.0),
      Check("freshness_orderdate_window",
        compliance(year(col("o_orderdate")).between(1992, 1998)), _ === 1.0),
      Check("max_totalprice", max(col("o_totalprice")), _ <= 1000000.0),
      Check("min_totalprice", min(col("o_totalprice")), _ > 0.0),
      Check("row_count", count(lit(1)), _ > 0.0),
      Check("uniqueness_o_orderkey",
        count_distinct(col("o_orderkey")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), _ === 1.0))
    val scalarReport = runChecks(orders, scalarChecks)

    // referential integrity: the one check that needs the dimension
    // side — distinct keys are dimension-sized, so the join broadcasts
    val custKeys = Tables.customer(spark, dir)
      .select(col("c_custkey")).distinct()
    val riCheck = Check("referential_o_custkey",
      count(col("c_custkey")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType), _ === 1.0)
    val riReport = runChecks(
      orders.join(broadcast(custKeys),
        col("o_custkey") === col("c_custkey"), "left_outer"),
      Seq(riCheck))

    scalarReport.unionByName(riReport).orderBy(col("check"))
  }

  val w03Sql: String =
    s"""WITH m AS (
       |  SELECT
       |    CAST(COUNT(o_orderdate) AS DOUBLE) / COUNT(*)
       |      AS completeness_o_orderdate,
       |    CAST(COUNT(*) FILTER (WHERE o_totalprice > 0
       |      AND o_totalprice <= 1000000.0) AS DOUBLE) / COUNT(*)
       |      AS compliance_price_range,
       |    CAST(COUNT(*) FILTER (WHERE regexp_matches(o_orderpriority,
       |      '$priorityPattern')) AS DOUBLE) / COUNT(*)
       |      AS compliance_priority_pattern,
       |    CAST(COUNT(*) FILTER (WHERE year(o_orderdate) BETWEEN 1992
       |      AND 1998) AS DOUBLE) / COUNT(*) AS freshness_orderdate_window,
       |    CAST(MAX(o_totalprice) AS DOUBLE) AS max_totalprice,
       |    CAST(MIN(o_totalprice) AS DOUBLE) AS min_totalprice,
       |    CAST(COUNT(*) AS DOUBLE) AS row_count,
       |    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*)
       |      AS uniqueness_o_orderkey
       |  FROM orders),
       |ri AS (
       |  SELECT CAST(COUNT(c.c_custkey) AS DOUBLE) / COUNT(*)
       |    AS referential_o_custkey
       |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
       |    ON o.o_custkey = c.c_custkey),
       |rep AS (
       |  SELECT 'completeness_o_orderdate' AS "check",
       |         completeness_o_orderdate AS metric,
       |         completeness_o_orderdate = 1.0 AS passed FROM m
       |  UNION ALL SELECT 'compliance_price_range', compliance_price_range,
       |         compliance_price_range = 1.0 FROM m
       |  UNION ALL SELECT 'compliance_priority_pattern',
       |         compliance_priority_pattern,
       |         compliance_priority_pattern = 1.0 FROM m
       |  UNION ALL SELECT 'freshness_orderdate_window',
       |         freshness_orderdate_window,
       |         freshness_orderdate_window = 1.0 FROM m
       |  UNION ALL SELECT 'max_totalprice', max_totalprice,
       |         max_totalprice <= 1000000.0 FROM m
       |  UNION ALL SELECT 'min_totalprice', min_totalprice,
       |         min_totalprice > 0.0 FROM m
       |  UNION ALL SELECT 'row_count', row_count, row_count > 0.0 FROM m
       |  UNION ALL SELECT 'uniqueness_o_orderkey', uniqueness_o_orderkey,
       |         uniqueness_o_orderkey = 1.0 FROM m
       |  UNION ALL SELECT 'referential_o_custkey', referential_o_custkey,
       |         referential_o_custkey = 1.0 FROM ri)
       |SELECT * FROM rep ORDER BY "check"""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w03_quality_audit" -> w03QualityAudit _)

  val oracles: Map[String, String] = Map(
    "w03_quality_audit" -> w03Sql)
}
