package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** As-of (point-in-time) join — for each left row, the most recent
  * right row with `right.ts <= left.ts` per key. Spark has no native
  * operator for this; per the preference order (SURVEY.md §7.3), it is
  * COMPOSED from built-ins rather than given a custom SparkStrategy,
  * because the composition already produces the optimal physical
  * shape:
  *
  *   union(tagged left, tagged right) → one shuffle on key →
  *   one sort (ts, side) → running last(right value, ignoreNulls)
  *
  * — exactly the partition-and-merge a bespoke as-of SortMergeJoin
  * exec would perform, with AQE/skew handling inherited for free. A
  * custom LogicalPlan+Strategy would only pay off for broadcast-able
  * right sides with per-row binary search.
  *
  * Tie semantics: equal timestamps match (the right row sorts before
  * the left at the same ts) — identical to DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`, which the v05 gate verifies
  * cross-engine. The right side must be unique per (key, ts);
  * pre-aggregate it otherwise.
  */
object AsOf {

  /** Left as-of join. Output: every left column, plus `asof_ts` (the
    * matched right timestamp) and `asof_<c>` for each requested right
    * value column — all null when no right row precedes the left row.
    *
    * The carried right row travels as ONE struct filled by a single
    * running last(): filling each column independently would let a
    * NULL value on the matched row be "filled through" by a stale
    * value from an older row — a torn (asof_ts, asof_value) pair that
    * DuckDB's ASOF JOIN never produces. */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val packed = struct(
      (col(ts).as("rts") +: rightVals.map(c => col(c).as(c))): _*)

    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.schema(ts).copy(name = "rts") +:
            rightVals.map(c => right.schema(c)))))
    val r0 = right
      .withColumn("__side", lit(0))
      .withColumn("__r", packed)
      .select(col(key), col(ts), col("__side"), col("__r"))
    val r = leftCols.filterNot(c => c == key || c == ts).foldLeft(r0) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (leftCols :+ "__side") :+ "__r"
    val unioned = l.select(cols.map(col): _*)
      .unionByName(r.select(cols.map(col): _*))

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col("__asof.rts").as("asof_ts")) ++
        rightVals.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** NEAREST as-of join — for each left row, the temporally closest
    * right row per key in EITHER direction (backward wins a distance
    * tie; "backward" admits simultaneous rows, "forward" is strict —
    * the two directions partition the right timeline). Same
    * single-shuffle union shape as [[join]], with BOTH carried rows
    * computed in one window pass: a running `last` over the preceding
    * frame and a running `first(ignoreNulls)` over the following
    * frame of the same (ts, side) sort — no second shuffle, no second
    * sort. Output: every left column, `near_ts`, `direction`
    * ('before'/'after', null when the key has no right rows), and
    * `asof_<c>` for the requested right columns. */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
                  ts: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val packed = struct(
      (col(ts).as("rts") +: rightVals.map(c => col(c).as(c))): _*)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.schema(ts).copy(name = "rts") +:
            rightVals.map(c => right.schema(c)))))
    val r0 = right
      .withColumn("__side", lit(0))
      .withColumn("__r", packed)
      .select(col(key), col(ts), col("__side"), col("__r"))
    val r = leftCols.filterNot(c => c == key || c == ts).foldLeft(r0) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (leftCols :+ "__side") :+ "__r"
    val unioned = l.select(cols.map(col): _*)
      .unionByName(r.select(cols.map(col): _*))

    val ord = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // a right row at the left row's exact ts sorts BEFORE it (side 0),
    // so it lands in the backward frame and never in the forward one
    val filled = unioned
      .withColumn("__back", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__fwd", first(col("__r"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    val db = unix_micros(col(ts)) - unix_micros(col("__back.rts"))
    val df_ = unix_micros(col("__fwd.rts")) - unix_micros(col(ts))
    val takeBack = col("__fwd").isNull ||
      (col("__back").isNotNull && db <= df_)
    val near = when(takeBack, col("__back")).otherwise(col("__fwd"))
    filled
      .withColumn("__near", near)
      .withColumn("direction",
        when(col("__back").isNull && col("__fwd").isNull,
          lit(null).cast("string"))
          .when(takeBack, lit("before")).otherwise(lit("after")))
      .select((leftCols.map(col) :+ col("__near.rts").as("near_ts")
        :+ col("direction")) ++
        rightVals.map(c => col(s"__near.$c").as(s"asof_$c")): _*)
  }

  /** As-of join through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsOfJoin.BroadcastAsOfJoinExec]]) — same output
    * contract as [[join]], different execution regime: the right side
    * is collected + broadcast as a per-key sorted index and every left
    * row answers with a binary search. No shuffle, no sort, no window
    * state; use when the right side is dimension-sized and the left is
    * the fact stream. Requires the session to carry
    * [[graft.GraftExtensions]] (the planner strategy). */
  def joinBroadcast(left: DataFrame, right: DataFrame, key: String,
                    ts: String, rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val la = left.queryExecution.analyzed
    val ra = right.queryExecution.analyzed
    def rattr(n: String) = ra.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"right side lacks column $n"))
    val asofOut =
      AttributeReference("asof_ts", rattr(ts).dataType, nullable = true)() +:
        rightVals.map(c =>
          AttributeReference(s"asof_$c", rattr(c).dataType, nullable = true)())
    org.apache.spark.sql.GraftSqlBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoin.AsOfJoinPlan(key, ts, rightVals, asofOut, la, ra))
  }

  // ---------------------------------------------------------------------------
  // Gate query
  // ---------------------------------------------------------------------------

  private val D = DecimalType(18, 4)

  /** v05 — per click, the user's most recent prior (or simultaneous)
    * purchase: lag seconds + purchase value. Cross-engine oracle uses
    * DuckDB's native ASOF JOIN against this composed implementation. */
  def v05AsofPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    AsOf.join(clicks, purchases, key = "user_id", ts = "ts",
        rightVals = Seq("value"))
      .select(
        col("event_id"), col("user_id"),
        ((unix_micros(col("ts")) - unix_micros(col("asof_ts")))
          .cast(DoubleType) / 1e6).as("secs_since_purchase"),
        col("asof_value").cast(D).cast(DoubleType).as("purchase_value"))
      .orderBy(col("event_id"))
      .limit(2000)
  }

  val v05Sql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id,
      |  CAST(epoch_us(c.ts) - epoch_us(p.ts) AS DOUBLE) / 1e6
      |    AS secs_since_purchase,
      |  CAST(CAST(p.value AS DECIMAL(18,4)) AS DOUBLE) AS purchase_value
      |FROM clicks c ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id
      |LIMIT 2000""".stripMargin

  // ---------------------------------------------------------------------------
  // v10 — FORWARD as-of: for every signup, the user's FIRST subsequent
  // purchase (time-to-convert — the activation metric v05's backward
  // direction can't answer). Inner-join matches aggregate to the
  // earliest (ts, event_id) struct per signup — a lexicographic min,
  // fully order-proof — then a left join restores never-converting
  // signups with nulls. One shuffle per side on user_id; at 100 TB
  // bound the forward horizon in the join predicate the way v07 does.
  // ---------------------------------------------------------------------------
  def v10TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("signup_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"),
        col("event_id").as("pid"))
    val firstConv = signups
      .join(purchases,
        col("user_id") === col("p_user") && col("pts") >= col("signup_ts"))
      .groupBy(col("signup_id"))
      .agg(min(struct(col("pts"), col("pid"))).as("fp"))
      .select(col("signup_id"), col("fp.pts").as("first_pts"),
        col("fp.pid").as("first_purchase_id"))
    signups.join(firstConv, Seq("signup_id"), "left")
      .select(
        col("signup_id"), col("user_id"),
        col("first_purchase_id"),
        ((unix_micros(col("first_pts")) - unix_micros(col("signup_ts")))
          .cast(DoubleType) / 1e6).as("secs_to_convert"))
      .orderBy(col("signup_id"))
      .limit(2000)
  }

  val v10Sql: String =
    """WITH signups AS (
      |  SELECT event_id AS signup_id, user_id, ts AS signup_ts
      |  FROM events WHERE event_type = 'signup'),
      |purchases AS (
      |  SELECT user_id AS p_user, ts AS pts, event_id AS pid
      |  FROM events WHERE event_type = 'purchase'),
      |conv AS (
      |  SELECT signup_id, pts AS first_pts, pid AS first_purchase_id
      |  FROM (
      |    SELECT s.signup_id, p.pts, p.pid,
      |      row_number() OVER (PARTITION BY s.signup_id
      |                         ORDER BY p.pts, p.pid) AS rk
      |    FROM signups s JOIN purchases p
      |      ON s.user_id = p.p_user AND p.pts >= s.signup_ts)
      |  WHERE rk = 1)
      |SELECT s.signup_id, s.user_id, c.first_purchase_id,
      |  CAST(epoch_us(c.first_pts) - epoch_us(s.signup_ts) AS DOUBLE) / 1e6
      |    AS secs_to_convert
      |FROM signups s LEFT JOIN conv c USING (signup_id)
      |ORDER BY signup_id
      |LIMIT 2000""".stripMargin

  /** v27 — per click, the temporally NEAREST purchase by the same user
    * in either direction (the event-alignment primitive: attribute a
    * click to its closest purchase, signed). DuckDB replays it as two
    * chained native ASOF joins (>= backward, strict < forward) and the
    * same integer-µs distance comparison, so the tie rule and both
    * directions are pinned cross-engine. */
  def v27NearestPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    AsOf.joinNearest(clicks, purchases, key = "user_id", ts = "ts",
        rightVals = Seq("value"))
      .select(
        col("event_id"), col("user_id"), col("direction"),
        ((unix_micros(col("near_ts")) - unix_micros(col("ts")))
          .cast(DoubleType) / 1e6).as("delta_secs"),
        col("asof_value").cast(D).cast(DoubleType).as("purchase_value"))
      .orderBy(col("event_id"))
      .limit(2000)
  }

  val v27Sql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT c.event_id, c.user_id, c.ts,
      |         pb.ts AS bts, pb.value AS bval,
      |         pf.ts AS fts, pf.value AS fval
      |  FROM clicks c
      |  ASOF LEFT JOIN purchases pb
      |    ON c.user_id = pb.user_id AND c.ts >= pb.ts
      |  ASOF LEFT JOIN purchases pf
      |    ON c.user_id = pf.user_id AND c.ts < pf.ts),
      |picked AS (
      |  SELECT event_id, user_id, ts, bts, bval, fts, fval,
      |    (fts IS NULL OR (bts IS NOT NULL AND
      |       epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts)))
      |      AS take_back
      |  FROM j)
      |SELECT event_id, user_id,
      |  CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
      |       WHEN take_back THEN 'before' ELSE 'after' END AS direction,
      |  CASE WHEN take_back
      |       THEN CAST(epoch_us(bts) - epoch_us(ts) AS DOUBLE) / 1e6
      |       ELSE CAST(epoch_us(fts) - epoch_us(ts) AS DOUBLE) / 1e6
      |  END AS delta_secs,
      |  CASE WHEN take_back THEN CAST(CAST(bval AS DECIMAL(18,4)) AS DOUBLE)
      |       ELSE CAST(CAST(fval AS DECIMAL(18,4)) AS DOUBLE)
      |  END AS purchase_value
      |FROM picked
      |ORDER BY event_id
      |LIMIT 2000""".stripMargin

  /** v29 — v05's exact query executed through the custom broadcast
    * as-of PHYSICAL operator instead of the composed shuffle shape,
    * hash-gated against the SAME DuckDB ASOF oracle: two execution
    * strategies, one semantics. (AsOfSpec pins that the plan really
    * contains BroadcastAsOfJoinExec — this gate must not silently fall
    * back to the composed form.) */
  def v29AsofBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    joinBroadcast(clicks, purchases, key = "user_id", ts = "ts",
        rightVals = Seq("value"))
      .select(
        col("event_id"), col("user_id"),
        ((unix_micros(col("ts")) - unix_micros(col("asof_ts")))
          .cast(DoubleType) / 1e6).as("secs_since_purchase"),
        col("asof_value").cast(D).cast(DoubleType).as("purchase_value"))
      .orderBy(col("event_id"))
      .limit(2000)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v05_asof_purchase" -> v05AsofPurchase _,
    "v10_time_to_convert" -> v10TimeToConvert _,
    "v27_nearest_purchase" -> v27NearestPurchase _,
    "v29_asof_broadcast" -> v29AsofBroadcast _,
  )

  val oracles: Map[String, String] = Map(
    "v05_asof_purchase" -> v05Sql,
    "v10_time_to_convert" -> v10Sql,
    "v27_nearest_purchase" -> v27Sql,
    "v29_asof_broadcast" -> v05Sql, // same semantics, different physical operator
  )
}
