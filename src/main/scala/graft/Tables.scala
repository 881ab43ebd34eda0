package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provisioned star schema
  * (`/root/testdata/sf*`, see TESTDATA.md). One parquet file per table.
  *
  * At 100 TB these would be partitioned/bucketed datasets; the loader
  * stays the same (`spark.read.parquet(dir)`) — partition pruning and
  * filter pushdown are handled by the parquet source, so every query in
  * [[graft.operators.StarQueries]] scans only what it projects.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"))

  /** Driver fixture generators have shipped timestamps in three parquet
    * encodings across rounds: TIMESTAMP(MICROS, adjustedToUTC) → Spark
    * TimestampType; TIMESTAMP(MICROS, not adjusted) → TIMESTAMP_NTZ;
    * TIMESTAMP(NANOS) → rejected unless read as long (see [[events]]).
    * Every downstream consumer (`unix_micros`, typed `Timestamp`
    * encoders, window/as-of arithmetic) expects TimestampType, so fold
    * any NTZ column to it here. The session timezone is pinned to UTC
    * ([[GraftSession]]), which makes the cast value-preserving: the
    * wall-clock fields are reinterpreted as the same UTC instant DuckDB
    * reads from the file. */
  private def normalizeTimestamps(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4's vectorized
    * reader rejects. Read it as a nanos long (legacy conf) and convert to
    * a proper TimestampType column — the corpus has exact-microsecond
    * values, so ns→µs is lossless.
    *
    * KNOWN SESSION-WIDE EFFECT: the `nanosAsLong` conf stays set for
    * the session. It cannot be save/restored here because the returned
    * DataFrame is lazy — the scan consults the conf at execution, after
    * this method returned. It only alters reads of TIMESTAMP(NANOS)
    * parquet (the events table is the sole such source in this system);
    * a session that must read other nanos sources as timestamps should
    * load events first and flip the conf back after materializing. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral DIV — double division would lose precision on epoch-ns
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Hash-repartition `df` on `by` across the session's configured
    * shuffle width — the round-15 fix for compute-dense pipelines whose
    * parallelism would otherwise be inherited from the INPUT layout.
    *
    * Two layout pathologies motivate it (guide §2.5/§6): (a) a
    * single-row-group parquet file is unsplittable, so a scan of it is
    * ONE task and everything pipelined on top (shingle explodes,
    * all-pairs cosine scoring, wedge enumeration) runs on one core of
    * the whole cluster; (b) AQE's partition coalescing sizes
    * post-shuffle partitions by their INPUT bytes, so a small frame
    * feeding a high-fan-out join/generate is coalesced to one partition
    * and the fan-out work serializes. An explicit numPartitions pins
    * the width (AQE never coalesces user-specified repartitioning), and
    * `spark.sql.shuffle.partitions` is the ONE deployment-tracked width
    * knob ([[GraftSession]]) — cores locally, thousands on a cluster —
    * so the spread scales with the deployment instead of hardcoding a
    * local constant. Hash partitioning on an explicit key keeps the
    * assignment deterministic under task retry (a keyless round-robin
    * repartition pays a per-partition sort and rides on input order).
    * Results are partitioning-invariant by the engine's determinism
    * conventions (DeterminismSpec) — this changes plan shape only. */
  def spread(df: DataFrame, by: org.apache.spark.sql.Column*): DataFrame = {
    require(by.nonEmpty, "spread needs an explicit deterministic key")
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, by: _*)
  }

  /** [[spread]] ONLY when the frame's actual scan layout is narrower
    * than half the configured shuffle width — the input-layout-adaptive
    * form for heavy aggregations DIRECTLY over a base-table scan.
    * At deployment scale the fact table arrives as thousands of
    * splits, the condition is false, and this is the identity: the
    * partial aggregation stays map-side on the scan and no raw-row
    * shuffle is ever added (repartitioning a 100 TB scan before its
    * partial agg would be a full extra pass). On a narrow layout (the
    * gate fixtures are single-row-group files — unsplittable, one task
    * per scan) it pays one narrow exchange of the pruned columns to buy
    * the full width for the per-row work. Column pruning pushes the
    * projection below the repartition, so only consumed columns move. */
  def spreadIfNarrow(df: DataFrame, by: org.apache.spark.sql.Column*): DataFrame = {
    val w = df.sparkSession.sessionState.conf.numShufflePartitions
    if (2 * df.rdd.getNumPartitions >= w) df else spread(df, by: _*)
  }
}
