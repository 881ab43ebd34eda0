package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest prior match, inclusive ties, null before first right row") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),  // before any right → null
      (2L, 10L, ts("2024-01-01 00:00:10")),  // tie with right @10 → matches it
      (3L, 10L, ts("2024-01-01 00:00:20")),  // after 10 and 15 → matches 15
      (4L, 99L, ts("2024-01-01 00:00:30"))   // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:10"), 100.0),
      (10L, ts("2024-01-01 00:00:15"), 200.0)
    ).toDF("user_id", "ts", "value")

    val out = AsOf.join(left, right, "user_id", "ts", Seq("value"))
      .orderBy("event_id")
      .select($"event_id", $"asof_value")
      .as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, None), (2L, Some(100.0)), (3L, Some(200.0)), (4L, None)))
  }

  test("a NULL value on the matched right row stays NULL (no torn pair)") {
    val left = Seq((1L, 7L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 10:00:00"), Some(5.0)),
      (7L, ts("2024-01-01 11:00:00"), None: Option[Double])
    ).toDF("user_id", "ts", "value")
    val row = AsOf.join(left, right, "user_id", "ts", Seq("value"))
      .select($"asof_ts", $"asof_value")
      .as[(Timestamp, Option[Double])].head()
    assert(row._1 == ts("2024-01-01 11:00:00"),
      "must match the LATEST prior row")
    assert(row._2.isEmpty,
      "its NULL value must not be filled from an older row")
  }

  test("joinNearest: closer side wins, backward wins ties, nulls only when keyless") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:12")),  // 2s after @10, 8s before @20 → before
      (2L, 10L, ts("2024-01-01 00:00:19")),  // 9s after @10, 1s before @20 → after
      (3L, 10L, ts("2024-01-01 00:00:15")),  // equidistant (5s) → backward wins
      (4L, 10L, ts("2024-01-01 00:00:20")),  // simultaneous right → before, 0s
      (5L, 10L, ts("2024-01-01 00:00:05")),  // before any right → after
      (6L, 99L, ts("2024-01-01 00:00:05"))   // key without right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:10"), 100.0),
      (10L, ts("2024-01-01 00:00:20"), 200.0)
    ).toDF("user_id", "ts", "value")
    val out = AsOf.joinNearest(left, right, "user_id", "ts", Seq("value"))
      .orderBy("event_id")
      .select($"event_id", $"direction", $"asof_value")
      .as[(Long, Option[String], Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, Some("before"), Some(100.0)),
      (2L, Some("after"), Some(200.0)),
      (3L, Some("before"), Some(100.0)),
      (4L, Some("before"), Some(200.0)),
      (5L, Some("after"), Some(100.0)),
      (6L, None, None)), out.toString)
  }

  test("joinBroadcast: custom physical operator, identical semantics to the composed join") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (2L, 10L, ts("2024-01-01 00:00:10")),
      (3L, 10L, ts("2024-01-01 00:00:20")),
      (4L, 99L, ts("2024-01-01 00:00:30"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:10"), Some(100.0)),
      (10L, ts("2024-01-01 00:00:15"), None: Option[Double])
    ).toDF("user_id", "ts", "value")
    val out = AsOf.joinBroadcast(left, right, "user_id", "ts", Seq("value"))
    // really the custom exec — not a silent fallback to something else
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastAsOfJoin"), out.queryExecution.executedPlan.toString)
    val rows = out.orderBy("event_id")
      .select($"event_id", $"asof_ts", $"asof_value")
      .as[(Long, Option[Timestamp], Option[Double])].collect().toSeq
    assert(rows == Seq(
      (1L, None, None),                                    // before any right
      (2L, Some(ts("2024-01-01 00:00:10")), Some(100.0)),  // inclusive tie
      (3L, Some(ts("2024-01-01 00:00:15")), None),         // latest prior, null stays null
      (4L, None, None)), rows.toString)                    // keyless
    // row-for-row identical to the composed operator on the same input
    val composed = AsOf.join(left, right, "user_id", "ts", Seq("value"))
    assert(out.exceptAll(composed).count() == 0 &&
      composed.exceptAll(out).count() == 0)
  }

  test("joinBroadcast equals the composed join on the events corpus") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val a = AsOf.joinBroadcast(clicks, purchases, "user_id", "ts", Seq("value"))
    val b = AsOf.join(clicks, purchases, "user_id", "ts", Seq("value"))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "the two execution strategies must agree on every row")
  }

  test("asof join carries every left column through unchanged") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:00:10"), "extra"))
      .toDF("event_id", "user_id", "ts", "tag")
    val right = Seq((5L, ts("2024-01-01 00:00:01"), 7.0))
      .toDF("user_id", "ts", "value")
    val row = AsOf.join(left, right, "user_id", "ts", Seq("value"))
      .select("event_id", "tag", "asof_value")
      .as[(Long, String, Double)].head()
    assert(row == ((1L, "extra", 7.0)))
  }
}
