package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Keyless range join — point-in-interval matching with NO equi-key.
  * Spark plans `l JOIN r ON l.ts BETWEEN r.start AND r.end` as a
  * broadcast/cartesian nested-loop (every left row probes every
  * interval — O(n·m), the classic scale cliff once the interval side
  * outgrows a broadcast). The banded rewrite turns it into a plain
  * shuffle EQUI-join:
  *
  *   - each point belongs to exactly ONE time band
  *     (`floor(ts / bandWidth)`);
  *   - each interval is exploded to EVERY band it overlaps;
  *   - equi-join on the band id, then apply the exact range predicate.
  *
  * A (point, interval) pair can meet in at most one band — the point's
  * — so no dedup is needed and the result is exactly the nested-loop
  * result. Cost: |intervals| × (avg interval length / bandWidth) extra
  * interval rows, against a shuffle join that partitions, prunes, and
  * AQE-balances like any other — pick `bandWidth` near the typical
  * interval length (the same trick as the composed as-of join in
  * [[AsOf]], generalized to overlapping intervals).
  */
object RangeJoin {

  /** Inner-join `points` (with timestamp `ts`) to `intervals` rows
    * whose `[start, end)` half-open window contains it. Band width in
    * microseconds. Column name collisions between the two sides follow
    * normal join rules — alias beforehand. */
  def banded(points: DataFrame, ts: Column,
             intervals: DataFrame, start: Column, end: Column,
             bandMicros: Long): DataFrame = {
    require(bandMicros > 0, "bandMicros must be positive")
    val p = points.withColumn("__band",
      floor(unix_micros(ts).cast(LongType) / bandMicros))
    // end is exclusive: the last overlapped band is floor((end-1µs)/w).
    // Drop empty/reversed intervals first — sequence(a, b) counts DOWN
    // when a > b, so a dirty end<=start row would explode one junk row
    // per band of the reversed gap (invisible in results behind the
    // exact predicate, but paid for in the join).
    val iv = intervals
      .filter(end > start)
      .withColumn("__band",
        explode(sequence(
          floor(unix_micros(start).cast(LongType) / bandMicros),
          floor((unix_micros(end).cast(LongType) - 1L) / bandMicros))))
    p.join(iv, Seq("__band"))
      .filter(ts >= start && ts < end)
      .drop("__band")
  }

  // ---------------------------------------------------------------------------
  // v11 — traffic stats for the busiest promo windows: top-5 3-hour
  // windows by click volume, then EVERY event landing in each window
  // via the banded range join (the windows overlap, so this is a true
  // interval join, not an as-of). The DuckDB oracle recomputes it with
  // a plain BETWEEN nested-loop join — banding must be invisible.
  // ---------------------------------------------------------------------------
  def v11BusyWindowStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DecimalSums.dsum
    val ev = Tables.events(spark, dir)
    val busy = ev.filter(col("event_type") === "click")
      .groupBy(date_trunc("hour", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("clicks"))
      .orderBy(col("clicks").desc, col("w_start"))
      .limit(5)
      .select(col("w_start"),
        (col("w_start") + expr("INTERVAL 3 HOURS")).as("w_end"))
    banded(ev.select(col("ts"), col("user_id"), col("value")), col("ts"),
        busy, col("w_start"), col("w_end"), bandMicros = 3600L * 1000000L)
      .groupBy(col("w_start"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("total_value"))
      .orderBy(col("w_start"))
  }

  val v11Sql: String = {
    import graft.functions.DecimalSums.sqlDsum
    s"""WITH hourly AS (
       |  SELECT date_trunc('hour', ts) AS w_start, COUNT(*) AS clicks
       |  FROM events WHERE event_type = 'click' GROUP BY 1),
       |busy AS (
       |  SELECT w_start, w_start + INTERVAL 3 HOUR AS w_end
       |  FROM hourly ORDER BY clicks DESC, w_start LIMIT 5)
       |SELECT w_start,
       |  COUNT(*) AS n_events,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  ${sqlDsum("value")} AS total_value
       |FROM events e JOIN busy b
       |  ON e.ts >= b.w_start AND e.ts < b.w_end
       |GROUP BY w_start
       |ORDER BY w_start""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v11_busy_window_stats" -> v11BusyWindowStats _,
  )

  val oracles: Map[String, String] = Map(
    "v11_busy_window_stats" -> v11Sql,
  )
}
