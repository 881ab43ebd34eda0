package graft

import org.apache.spark.sql.functions._

import graft.operators.EventQueries

class EventQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("v01: tumbling window counts sum to the table count") {
    val total = EventQueries.v01TumblingCounts(spark, sf)
      .agg(sum("event_count")).as[Long].head()
    assert(total == Tables.events(spark, sf).count())
  }

  test("v01: tumbling window starts are 10-minute aligned") {
    // "yyyy-MM-dd HH:m0:00" — minute ends in 0, seconds are 00
    val misaligned = EventQueries.v01TumblingCounts(spark, sf)
      .filter(!$"window_start".rlike("^.{14}[0-5]0:00$"))
      .count()
    assert(misaligned == 0, "tumbling starts must be 10-min aligned")
  }

  test("v02: sessions partition each user's events; gaps within a session < 30min") {
    val sess = EventQueries.v02Sessions(spark, sf)
    // duration of an n-event session is bounded by (n-1) * gap
    val bad = sess.filter($"duration_sec" > ($"event_count" - 1) * 1800.0).count()
    assert(bad == 0, "a session cannot span more than (n-1) max gaps")
    val nonPositive = sess.filter($"event_count" <= 0 || $"duration_sec" < 0).count()
    assert(nonPositive == 0)
  }

  test("v19: offset-0 retention is exactly 1.0 and counts never grow") {
    val rows = graft.operators.EventQueries.v19RetentionCohorts(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { cohort =>
      val byOff = cohort.sortBy(_._2)
      // week 0 = the cohort definition itself: everyone is active
      assert(byOff.head._2 == 0L && byOff.head._3 == byOff.head._4)
      assert(byOff.head._5 == 1.0)
      cohort.foreach { case (_, off, n, size, r) =>
        assert(off >= 0 && n <= size && r <= 1.0 && r > 0.0)
      }
    }
  }

  test("v20: funnel counts are monotone and genuinely shaped") {
    val rows = graft.operators.EventQueries.v20OrderedFunnel(spark, sf)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq ==
      Seq("signup", "view", "click", "purchase"))
    rows.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(b <= a); case _ =>
    }
    // the 3-day window must actually bite: not everyone converts
    assert(rows.last._3 < rows.head._3)
  }

  test("v21: rows sum to events-minus-users, probabilities sum to 1 per prev") {
    val rows = graft.operators.EventQueries.v21TransitionMatrix(spark, sf)
      .as[(String, String, Long, Double)].collect()
    val ev = Tables.events(spark, sf)
    // each user's first event has no predecessor
    assert(rows.map(_._3).sum ==
      ev.count() - ev.select("user_id").distinct().count())
    rows.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-3)
    }
  }

  test("v22: variants partition the user base; stats are internally consistent") {
    val r = graft.operators.EventQueries.v22ExperimentLift(spark, sf)
    val row = r.collect()(0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val nA = row.getAs[Long]("n_a"); val nB = row.getAs[Long]("n_b")
    val cA = row.getAs[Long]("conv_a"); val cB = row.getAs[Long]("conv_b")
    assert(nA + nB == users)
    assert(cA <= nA && cB <= nB)
    // rounded rates agree with the raw integer ratios
    assert(math.abs(row.getAs[Double]("cvr_a_r") - cA.toDouble / nA) < 1e-6)
    assert(math.abs(row.getAs[Double]("cvr_b_r") - cB.toDouble / nB) < 1e-6)
    // z carries the lift's sign whenever it is defined
    Option(row.getAs[Double]("z_r")).foreach { z =>
      assert(z.sign == row.getAs[Double]("lift_r").sign ||
        row.getAs[Double]("lift_r") == 0.0)
    }
  }

  test("v03: deduped counts never exceed raw per-type counts") {
    val raw = Tables.events(spark, sf)
      .groupBy($"event_type").agg(count(lit(1)).as("raw_count"))
    val bad = EventQueries.v03MinuteDedupCounts(spark, sf)
      .join(raw, "event_type")
      .filter($"deduped_count" > $"raw_count").count()
    assert(bad == 0)
  }

  test("v04: sliding windows double-count each event exactly twice") {
    val total = EventQueries.v04SlidingCounts(spark, sf)
      .agg(sum("event_count")).as[Long].head()
    // limit(2000) may truncate at larger SF; sf0.001 has few windows, so
    // the invariant holds exactly: every event is in 2 of the 5-min slides
    val windows = EventQueries.v04SlidingCounts(spark, sf).count()
    if (windows < 2000)
      assert(total == 2 * Tables.events(spark, sf).count())
  }

  test("v25: hourly counts roll up to the table; spike flag matches its integer form") {
    val r = EventQueries.v25SpikeWindows(spark, sf)
    assert(r.agg(sum("event_count")).as[Long].head() ==
      Tables.events(spark, sf).count())
    assert(r.filter($"trail_n" < 0 || $"trail_n" > 6).count() == 0,
      "trailing frame is at most six observed hours")
    val inconsistent = r.filter($"is_spike" =!=
      ($"trail_n" === 6 && $"event_count" * 3 > $"trail_sum")).count()
    assert(inconsistent == 0, "spike flag must equal 3·count > trail_sum at full frames")
  }

  test("v26: paths are 3 event types from the corpus domain, ranked by support") {
    val types = Tables.events(spark, sf)
      .select($"event_type").distinct().as[String].collect().toSet
    val rows = EventQueries.v26SessionPaths(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { case (path, n, nUsers) =>
      val steps = path.split(">")
      assert(steps.length == 3 && steps.forall(types.contains), path)
      assert(n >= nUsers && nUsers >= 1, s"$path: n=$n users=$nUsers")
    }
    assert(rows.map(_._2).sameElements(rows.map(_._2).sorted.reverse),
      "support must be non-increasing")
  }
}
