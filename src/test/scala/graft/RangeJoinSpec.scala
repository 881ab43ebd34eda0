package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fixtures = {
    val ev = Tables.events(spark, sf)
      .select($"ts", $"user_id", $"value")
    // overlapping 90-minute windows anchored on observed data, so
    // matches are guaranteed and intervals straddle band boundaries
    val t0 = ev.agg(min($"ts")).head().getTimestamp(0).toInstant
    val ivs = (0 until 8).map { i =>
      val s = java.sql.Timestamp.from(t0.plusSeconds(i * 3600L))
      val e = java.sql.Timestamp.from(t0.plusSeconds(i * 3600L + 5400L))
      (i, s, e)
    }.toDF("iv_id", "w_start", "w_end")
    (ev, ivs)
  }

  test("banded range join equals the nested-loop join exactly") {
    val (ev, ivs) = fixtures
    val banded = RangeJoin.banded(ev, $"ts", ivs, $"w_start", $"w_end",
      bandMicros = 3600L * 1000000L)
    val loop = ev.join(ivs, $"ts" >= $"w_start" && $"ts" < $"w_end")
    assert(banded.count() > 0, "fixture must produce matches")
    assert(digest(banded) == digest(loop.select(banded.columns.map(col): _*)))
  }

  test("banded plan is an equi-join on the band, not a nested loop") {
    val (ev, ivs) = fixtures
    val banded = RangeJoin.banded(ev, $"ts", ivs, $"w_start", $"w_end",
      bandMicros = 3600L * 1000000L)
    // AQE wraps the tree in AdaptiveSparkPlanExec — inspect the plan text
    val bandedPlan = banded.queryExecution.executedPlan.toString
    assert(!bandedPlan.contains("NestedLoopJoin"),
      "banded rewrite must not plan a nested-loop join")
    // the naive predicate-only join DOES nested-loop — the thing we avoid
    val naive = ev.join(ivs, $"ts" >= $"w_start" && $"ts" < $"w_end")
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoopJoin"),
      s"control: the keyless join should plan BNLJ, got:\n$naivePlan")
  }

  test("a pair straddling bands is matched exactly once") {
    // interval [00:30, 02:30) overlaps bands 0,1,2 with 1h bands; an
    // event at 01:15 sits in band 1 only — one match row, not three
    val iv = Seq((1, ts("2026-01-01 00:30:00"), ts("2026-01-01 02:30:00")))
      .toDF("iv_id", "w_start", "w_end")
    val pt = Seq(Tuple1(ts("2026-01-01 01:15:00"))).toDF("ts")
    val out = RangeJoin.banded(pt, $"ts", iv, $"w_start", $"w_end",
      bandMicros = 3600L * 1000000L)
    assert(out.count() == 1)
    // boundary semantics: start inclusive, end exclusive
    val edge = Seq(Tuple1(ts("2026-01-01 00:30:00")),
      Tuple1(ts("2026-01-01 02:30:00"))).toDF("ts")
    val edgeOut = RangeJoin.banded(edge, $"ts", iv, $"w_start", $"w_end",
      bandMicros = 3600L * 1000000L)
    assert(edgeOut.count() == 1, "start is inclusive, end exclusive")
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
