package graft

import org.apache.spark.sql.functions._

import graft.operators.Audit
import graft.operators.Audit.Check

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("runChecks fuses every constraint into one scan") {
    val orders = Tables.orders(spark, sf)
    val rep = Audit.runChecks(orders, Seq(
      Check("row_count", count(lit(1)), _ > 0.0),
      Check("completeness", count($"o_orderdate").cast("double") /
        count(lit(1)).cast("double"), _ === 1.0),
      Check("uniqueness", count_distinct($"o_orderkey").cast("double") /
        count(lit(1)).cast("double"), _ === 1.0)))
    val plan = rep.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"three constraints must share ONE scan, plan was:\n$plan")
    val rows = rep.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(rows.map(_._1) == Seq("row_count", "completeness", "uniqueness"))
    assert(rows.forall(_._3), s"all three hold on the fixture: $rows")
    assert(rows.find(_._1 == "row_count").get._2 == 1500.0)
  }

  test("w03 report carries both verdicts and scans each table once per pass") {
    val rep = Audit.w03QualityAudit(spark, sf)
    val plan = rep.queryExecution.executedPlan.toString
    // one orders scan for the 8 scalar checks, one orders + one
    // customer scan for referential integrity — never one per check
    assert("Scan parquet".r.findAllIn(plan).size == 3,
      s"audit must be 3 scans total, plan was:\n$plan")
    val rows = rep.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(rows.size == 9 && rows.map(_._1) == rows.map(_._1).sorted)
    // the freshness window check genuinely fails on this fixture —
    // the report must carry the false verdict, not just passes
    val fresh = rows.find(_._1 == "freshness_orderdate_window").get
    assert(!fresh._3 && fresh._2 < 1.0, s"expected a failing check: $fresh")
    assert(rows.find(_._1 == "referential_o_custkey").get._3)
    assert(rows.find(_._1 == "uniqueness_o_orderkey").get._3)
  }

  test("referential check trips on a dangling key") {
    val facts = Seq((1L, 10L), (2L, 11L), (3L, 99L)).toDF("k", "fk")
    val dim = Seq(10L, 11L).toDF("c_custkey")
    val rep = Audit.runChecks(
      facts.join(broadcast(dim), $"fk" === $"c_custkey", "left_outer"),
      Seq(Check("referential", count($"c_custkey").cast("double") /
        count(lit(1)).cast("double"), _ === 1.0)))
    val r = rep.collect()(0)
    assert(r.getDouble(1) == 2.0 / 3.0 && !r.getBoolean(2))
  }
}
