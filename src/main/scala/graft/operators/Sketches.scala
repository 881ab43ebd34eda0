package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

import graft.Tables

/** Sketch-backed operators — the two structures that change what is
  * FEASIBLE at 100 TB rather than just faster:
  *
  *  - '''Bloom-filter join pruning''' (q29): when a fact⋈dim join keeps
  *    only a selective slice of the dim side, the expensive part is
  *    shuffling the entire fact table just to drop most of it at the
  *    join. A bloom filter built over the build-side keys and applied
  *    to the fact side BEFORE its exchange eliminates the non-matching
  *    rows pre-shuffle — the same rewrite Spark's own
  *    InjectRuntimeFilter performs when its heuristics fire, exposed
  *    here as a deterministic operator (the optimizer's version
  *    activates only under size/selectivity thresholds that a library
  *    caller cannot rely on). Exactness is preserved by construction:
  *    blooms have no false negatives, and the real join removes the
  *    false positives, so the gate hash-compares against the plain-join
  *    oracle.
  *
  *  - '''Mergeable HLL sketches''' (q30): COUNT(DISTINCT) does not
  *    re-aggregate — month-level exact distincts cannot be combined into a
  *    year-level distinct, so at 100 TB every rollup level costs a full
  *    re-shuffle of raw keys. DataSketches HLL (Spark's `hll_sketch_agg`
  *    family) is associative: per-group sketches are built in one pass,
  *    stored bytes, and UNIONED upward (`hll_union_agg`) without
  *    touching raw data again — the standing pattern for distinct-user
  *    metrics over a partitioned warehouse. HLL register-max updates
  *    are order-independent, so results are deterministic under any
  *    partitioning (ScalaTest pins the estimate against exact
  *    distincts; the gate is rows-only — DuckDB's approx engine is a
  *    different implementation).
  *
  *  - '''Mergeable quantile summaries''' (q40): quantiles are holistic
  *    — a month's exact p90 cannot be combined into a year's — so the
  *    rollup needs a mergeable summary. [[graft.functions.QuantileSketch]]
  *    is the deterministic one (KLL's randomized compaction would break
  *    the width-sweep determinism pins): exact below its distinct-value
  *    capacity, fixed-grid above it, merge-order-invariant either way.
  */
object Sketches {

  // ---------------------------------------------------------------------------
  // bloom-filter runtime join pruning
  // ---------------------------------------------------------------------------

  /** Serialized bloom filter over `xxhash64(key)` of `small`, built
    * DISTRIBUTED (partial blooms OR-merged by the aggregate) and
    * collected to the driver — the same shape Spark's runtime filter
    * produces via a scalar subquery; a few hundred KB for a
    * million-key build side at the default 3% FPP. */
  def buildBloom(small: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftSqlBridge.expression(xxhash64(key)), expectedItems)
      .toAggregateExpression()
    small.select(GraftSqlBridge.column(agg).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership predicate against a serialized bloom — Spark's own
    * codegen'd `BloomFilterMightContain`, keyed by the same xxhash64 the
    * build side used. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftSqlBridge.expression(xxhash64(key))))

  /** `big` reduced to rows whose `bigKey` might match a `smallKey` of
    * `small` — the prune-then-join building block. CONSTRUCTION runs
    * two small jobs on the build side (count + bloom build); the big
    * side stays lazy. */
  def bloomPrune(big: DataFrame, bigKey: Column,
                 small: DataFrame, smallKey: Column): DataFrame = {
    // xxhash64 is type-sensitive (hash of INT 5 ≠ hash of BIGINT 5):
    // mismatched key types would make build and probe hashes disagree —
    // silent FALSE NEGATIVES, i.e. true matches pruned before the join.
    // Integral keys are widened to bigint on BOTH sides; any other type
    // pair must already match.
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val bigType = big.select(bigKey).schema.head.dataType
    val smallType = small.select(smallKey).schema.head.dataType
    val (bk, sk) =
      if (integral(bigType) && integral(smallType))
        (bigKey.cast(LongType), smallKey.cast(LongType))
      else {
        require(bigType == smallType,
          s"bloomPrune keys must share a data type (xxhash64 is " +
            s"type-sensitive); got $bigType vs $smallType")
        (bigKey, smallKey)
      }
    // sizing from the actual build side: a pushed-filter count costs a
    // metadata-cheap scan of the small side and keeps the FPP honest at
    // any SF (a hardcoded estimate collapses to all-pass or over-sizes)
    val n = math.max(small.select(sk).count(), 64L)
    val bloom = buildBloom(small, sk, n)
    big.filter(mightContain(bloom, bk))
  }

  // ---------------------------------------------------------------------------
  // q29 — bloom-pruned selective fact⋈dim join: urgent-1997 order revenue
  // by month. The bloom removes ~94% of lineitem rows before the join
  // exchange (1 of 5 priorities × 1 of 7 years); the oracle is the plain
  // join — pruning must be invisible in the result.
  // ---------------------------------------------------------------------------
  def q29BloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DecimalSums.dsum
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate")) === 1997)
      .select(col("o_orderkey"), col("o_orderdate"))
    val pruned = bloomPrune(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      col("l_orderkey"), urgent, col("o_orderkey"))
    pruned
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(month(col("o_orderdate")).as("order_month"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("order_month"))
  }

  val q29Sql: String = {
    import graft.functions.DecimalSums.sqlDsum
    s"""SELECT CAST(MONTH(o_orderdate) AS INT) AS order_month,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS total_revenue,
       |  COUNT(*) AS line_count
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT' AND YEAR(o_orderdate) = 1997
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q30 — HLL distinct-customer rollup: monthly sketches built in one
  // pass over orders, merged upward to yearly estimates WITHOUT
  // re-reading raw keys — the re-aggregation exact COUNT(DISTINCT)
  // cannot do. Rows-only gate (estimates are implementation-specific);
  // SketchesSpec pins the estimates against exact distincts.
  // ---------------------------------------------------------------------------
  def q30HllDistinctRollup(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .select(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        col("o_custkey"))
      .groupBy(col("order_year"), col("order_month"))
      .agg(
        hll_sketch_agg(col("o_custkey")).as("sk"),
        count(lit(1)).as("orders"))
    monthly
      .groupBy(col("order_year"))
      .agg(
        count(lit(1)).as("months"),
        sum(col("orders")).as("orders"),
        hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("est_unique_customers"))
      .orderBy(col("order_year"))
  }

  // ---------------------------------------------------------------------------
  // q39 — distinct-set ALGEBRA via theta sketches: per return-flag part
  // populations compared pairwise (|A|, |B|, |A∪B|, |A∩B|, |A\B|) from
  // ONE sketch per flag — the audience-overlap question HLL cannot
  // answer (HLL unions but never intersects). At 100 TB each flag's
  // sketch is built in one partial-aggregated pass and the pairwise
  // algebra runs on 3 sketch blobs, never re-reading raw keys.
  //
  // Gate: hash-matched against exact DuckDB set counts — sound because
  // at the gate SF the per-flag part populations (~2k) sit below the
  // sketch's 2^12 nominal entries, where a theta sketch is EXACT by
  // construction (no sampling has started; estimate == retained count).
  // At bench SF (20k parts) the sketch estimates — still deterministic
  // (hash-ordered retention, no RNG), which SketchesSpec pins within
  // theta's published error envelope against exact distincts.
  // ---------------------------------------------------------------------------
  def q39ThetaFlagOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sk = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"), col("l_partkey"))
      .groupBy(col("flag"))
      .agg(expr(s"theta_sketch_agg(l_partkey, $thetaLgK)").as("sk"))
    sk.as("a").join(sk.as("b"), col("a.flag") < col("b.flag"))
      .select(
        col("a.flag").as("flag_a"), col("b.flag").as("flag_b"),
        expr("CAST(theta_sketch_estimate(a.sk) AS BIGINT)").as("n_a"),
        expr("CAST(theta_sketch_estimate(b.sk) AS BIGINT)").as("n_b"),
        expr("CAST(theta_sketch_estimate(theta_union(a.sk, b.sk)) AS BIGINT)")
          .as("n_union"),
        expr("CAST(theta_sketch_estimate(theta_intersection(a.sk, b.sk)) AS BIGINT)")
          .as("n_inter"),
        expr("CAST(theta_sketch_estimate(theta_difference(a.sk, b.sk)) AS BIGINT)")
          .as("n_diff"))
      .orderBy(col("flag_a"), col("flag_b"))
  }

  /** Exact set algebra over the same flag → part populations. */
  val q39Sql: String =
    """WITH fp AS (
      |  SELECT DISTINCT l_returnflag AS flag, l_partkey AS p FROM lineitem),
      |c AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS n FROM fp GROUP BY 1),
      |i AS (
      |  SELECT x.flag AS fa, y.flag AS fb, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM fp x JOIN fp y ON x.p = y.p AND x.flag < y.flag
      |  GROUP BY 1, 2)
      |SELECT ca.flag AS flag_a, cb.flag AS flag_b,
      |  ca.n AS n_a, cb.n AS n_b,
      |  ca.n + cb.n - COALESCE(i.n, 0) AS n_union,
      |  COALESCE(i.n, 0) AS n_inter,
      |  ca.n - COALESCE(i.n, 0) AS n_diff
      |FROM c ca JOIN c cb ON ca.flag < cb.flag
      |LEFT JOIN i ON i.fa = ca.flag AND i.fb = cb.flag
      |ORDER BY flag_a, flag_b""".stripMargin

  // ---------------------------------------------------------------------------
  // q40 — deterministic mergeable QUANTILE rollup: per-month price
  // summaries built in one pass over orders, merged upward to yearly
  // price quantiles WITHOUT re-reading raw values — the holistic
  // statistic (exact percentile needs every value) made re-aggregable,
  // completing the sketch family (q30 distincts, q39 set algebra).
  // KLL would do this too but its randomized compaction breaks
  // partitioning-invariance; graft.functions.QuantileSketch is
  // deterministic by construction: EXACT below its distinct-value
  // capacity (q39's theta precedent — the gate SF sits below it, so
  // the gate hash-matches DuckDB's exact r-th-smallest), fixed-grid
  // histogram above it (deterministic, merge-order-invariant;
  // value error ≤ binWidth, pinned in QuantileSketchSpec).
  // ---------------------------------------------------------------------------
  // single owner of the q40 sketch dials and the q39 theta lgK — the
  // estimation-mode suite (ScalingBench) derives its capacity/bin-width
  // labels from THESE, so a dial change can't silently desynchronize
  // the suite's exact-vs-estimation mode labels
  private[graft] val (qsCap, qsLo, qsHi, qsBins) = (4096, 0.0, 512000.0, 8192)
  private[graft] val thetaLgK = 12
  private[graft] def qsBinWidth: Double = (qsHi - qsLo) / qsBins

  def q40QuantileRollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.QuantileSketch
    val build = udaf(QuantileSketch.buildAgg(qsCap, qsLo, qsHi, qsBins))
    val merge = udaf(QuantileSketch.mergeAgg(qsCap, qsLo, qsHi, qsBins))
    val qq = udf((b: Array[Byte], q: Double) =>
      QuantileSketch.quantile(b, q, qsLo, qsHi))
    val monthly = Tables.orders(spark, dir)
      .select(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        col("o_totalprice"))
      .groupBy(col("order_year"), col("order_month"))
      .agg(build(col("o_totalprice")).as("sk"), count(lit(1)).as("orders"))
    monthly
      .groupBy(col("order_year"))
      .agg(merge(col("sk")).as("sk"), sum(col("orders")).as("n_orders"))
      .select(
        col("order_year"), col("n_orders"),
        qq(col("sk"), lit(0.25)).as("p25_price"),
        qq(col("sk"), lit(0.5)).as("p50_price"),
        qq(col("sk"), lit(0.75)).as("p75_price"),
        qq(col("sk"), lit(0.9)).as("p90_price"))
      .orderBy(col("order_year"))
  }

  /** Exact r-th-smallest (r = ⌈q·n⌉) per year — the sketch's own
    * quantile rule, so the hash gate is sound exactly while every
    * year's distinct price count sits below the sketch capacity
    * (true at gate SF: ≤ 2.4k distinct vs cap 4096). Ties in the
    * ROW_NUMBER order are harmless: any permutation of equal values
    * puts the same VALUE at rank r. */
  val q40Sql: String =
    """WITH o AS (
      |  SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
      |         o_totalprice AS v,
      |         ROW_NUMBER() OVER (PARTITION BY YEAR(o_orderdate)
      |                            ORDER BY o_totalprice) AS rn,
      |         COUNT(*) OVER (PARTITION BY YEAR(o_orderdate)) AS n
      |  FROM orders)
      |SELECT order_year,
      |  CAST(MAX(n) AS BIGINT) AS n_orders,
      |  MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN v END) AS p25_price,
      |  MAX(CASE WHEN rn = CAST(CEIL(0.5  * n) AS BIGINT) THEN v END) AS p50_price,
      |  MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN v END) AS p75_price,
      |  MAX(CASE WHEN rn = CAST(CEIL(0.9  * n) AS BIGINT) THEN v END) AS p90_price
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_bloom_pruned_join"    -> q29BloomPrunedJoin _,
    "q30_hll_distinct_rollup"  -> q30HllDistinctRollup _,
    "q39_theta_flag_overlap"   -> q39ThetaFlagOverlap _,
    "q40_quantile_rollup"      -> q40QuantileRollup _,
  )

  val oracles: Map[String, String] = Map(
    "q29_bloom_pruned_join" -> q29Sql,
    "q39_theta_flag_overlap" -> q39Sql,
    "q40_quantile_rollup" -> q40Sql,
  )
}
