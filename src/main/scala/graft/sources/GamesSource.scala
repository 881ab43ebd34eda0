package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's games table: ingest + a deterministic star-schema
  * derivation.
  *
  * The original `data/games_cleaned.csv` is a missing blob
  * (/root/reference/.MISSING_LARGE_BLOBS:1-2), so the games-shaped
  * surface runs against two inputs:
  *  1. [[readCsv]] — the production CSV path with the reference's read
  *     options (header, escape='"'; /root/reference/spark_eda.py:42)
  *     hardened with an explicit schema + PERMISSIVE corrupt-row
  *     capture (SURVEY.md §1.6) — exercised by the checked-in quirk
  *     fixture in ScalaTest.
  *  2. [[deriveFromPart]] — a games-shaped table computed from the
  *     driver's `part` table by one shared-dialect SQL text that DuckDB
  *     evaluates verbatim, making every games query oracle-checkable.
  *     The derivation plants every §1/§7.4 quirk: list-literal string
  *     columns, multi-valued rows, a `['Ltd.']` pseudo-developer,
  *     free/boundary prices on an exact quarter-dollar grid (so float
  *     revenue stays ≤4 decimal digits — see the determinism note),
  *     NULL owners/genres, empty genre lists, malformed ('999-06-15'),
  *     empty and NULL release dates, and years outside [2000, 2024].
  */
object GamesSource {

  /** Explicit ingest schema (reference infers it; SURVEY.md §1.2). */
  val schema: StructType = StructType(Seq(
    StructField("AppID", IntegerType),
    StructField("Name", StringType),
    StructField("release_date", StringType),
    StructField("clean_price", StringType),  // cast in clean() — Q0 order
    StructField("avg_owners", StringType),
    StructField("Developers", StringType),
    StructField("Genres", StringType),
    StructField("_corrupt_record", StringType)))

  /** CSV reader with the reference's options + production hardening. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", true)
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .csv(path)

  /** Q0 clean/derive step (/root/reference/spark_eda.py:45-49): price →
    * float, owners → int, revenue = price × owners in FLOAT32 (§1.5).
    * The owners cast to float is explicit because Spark 4's ANSI
    * coercion promotes float×int to double; the reference ran non-ANSI
    * 3.5 where the product is a float32 multiply (tightest common
    * type), and that float rounding is part of its published numbers.
    * Owners < 2²⁴ in all fixtures, so the cast itself is lossless. */
  def clean(df: DataFrame): DataFrame =
    df.withColumn("clean_price", col("clean_price").cast(FloatType))
      .withColumn("avg_owners", col("avg_owners").cast(IntegerType))
      .withColumn("revenue",
        col("clean_price") * col("avg_owners").cast(FloatType))

  /** Shared-dialect derivation SQL — runs verbatim in Spark SQL and
    * DuckDB (doubled-quote escapes, `right`, `split_part`, `||` only).
    *
    * Determinism of float revenue across engines: prices sit on an
    * exact quarter grid (k/4, k<239 — representable exactly in
    * float32), owners < 2²⁴ (exact in float32), so float32
    * multiplication rounds the exact product once; every representable
    * result has ≤4 decimal digits, making the DECIMAL(18,4) aggregate
    * cast exact (no half-way rounding disagreements between engines). */
  val deriveSql: String =
    """SELECT
      |  p_partkey AS AppID,
      |  p_name AS Name,
      |  CASE WHEN p_partkey % 53 = 0 THEN '999-06-15'
      |       WHEN p_partkey % 71 = 0 THEN ''
      |       WHEN p_partkey % 97 = 0 THEN NULL
      |       ELSE (1995 + p_partkey % 35) || '-' ||
      |            right('0' || (1 + p_partkey % 12), 2) || '-' ||
      |            right('0' || (1 + p_partkey % 28), 2)
      |  END AS release_date,
      |  CAST((p_partkey % 239) / 4.0 AS FLOAT) AS clean_price,
      |  CASE WHEN p_partkey % 13 = 0 THEN NULL
      |       ELSE CAST((p_partkey % 500) * 1000 + (p_partkey % 37) * 17 AS INT)
      |  END AS avg_owners,
      |  CASE WHEN p_partkey % 41 = 0 THEN '[''Ltd.'']'
      |       WHEN p_partkey % 5 = 0 THEN '[''' || p_brand || ''', ''' ||
      |            split_part(p_name, ' ', 1) || ' Studios'']'
      |       ELSE '[''' || p_brand || ''']'
      |  END AS Developers,
      |  CASE WHEN p_partkey % 89 = 0 THEN NULL
      |       WHEN p_partkey % 67 = 0 THEN '[]'
      |       WHEN p_partkey % 11 = 0 THEN '[''' || p_type || ''', ''Indie'']'
      |       WHEN p_partkey % 3 = 0 THEN '[''' || p_type || ''', ''' ||
      |            split_part(p_name, ' ', 2) || ''', ''Indie'']'
      |       ELSE '[''' || p_type || ''']'
      |  END AS Genres
      |FROM part""".stripMargin

  /** Oracle-side CTE prefix: `WITH games AS (…)` over the driver's
    * registered `part` view. */
  val oracleCte: String = s"WITH games AS (\n$deriveSql\n)"

  /** Spark-side derived games table + Q0 revenue, reading `part`
    * directly from parquet (no temp-view registration → no name
    * collisions between concurrently-built queries). */
  def deriveFromPart(spark: SparkSession, dir: String): DataFrame = {
    val games = spark.sql(
      deriveSql.replace("FROM part", s"FROM parquet.`$dir/part.parquet`"))
    // float32 multiply — see clean() for why the cast is explicit
    games.withColumn("revenue",
      col("clean_price") * col("avg_owners").cast(FloatType))
  }

  /** Oracle text for the revenue column — CAST to FLOAT normalizes
    * DuckDB's arithmetic to the same float32 rounding Spark performs. */
  val sqlRevenue: String = "CAST(clean_price * avg_owners AS FLOAT)"

  /** The "one pass over the corpus, many queries" usage shape (SURVEY
    * §4): ~20 catalog queries share this frame, so derive it once per
    * (session, dir) and serve the rest from cache — the `df.cache()`
    * the reference's report claims but its code never performs. The
    * cached frame is |part|-sized (input-table cardinality, no fact
    * blow-up); queries that need a cold path can still call
    * [[deriveFromPart]] directly. */
  private val derivedCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def cachedGames(spark: SparkSession, dir: String): DataFrame = {
    // bound the map: entries of stopped sessions are dead weight (their
    // cached blocks died with the session) — evict them on access
    derivedCache.keySet.removeIf { case (s, _) => s.sparkContext.isStopped }
    derivedCache.computeIfAbsent((spark, dir), _ =>
      deriveFromPart(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** Stable on-disk location of the checked-in quirk fixture, so the
    * gate query (Spark) and its oracle (DuckDB) read the SAME file.
    * Per-user directory under `java.io.tmpdir`: concurrent users on a
    * shared host get distinct paths (no collisions, no pre-planted
    * symlink under someone else's control), and the oracle SQL — built
    * once at object init — only needs the path stable within one driver
    * run. */
  val fixtureTmpPath: String = {
    val user = sys.props.getOrElse("user.name", "anon")
      .replaceAll("[^A-Za-z0-9._-]", "_")
    java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-$user", "games_fixture.csv").toString
  }

  /** Materialize the bundled quirk fixture (a classpath resource — the
    * library jar is self-contained) to [[fixtureTmpPath]]. Idempotent;
    * the verify harness calls this explicitly so the oracle never reads
    * a path the Spark side hasn't written. A pre-existing symlink at the
    * target is removed rather than written through. */
  def ensureFixture(): String = {
    val target = java.nio.file.Paths.get(fixtureTmpPath)
    java.nio.file.Files.createDirectories(target.getParent)
    if (java.nio.file.Files.isSymbolicLink(target))
      java.nio.file.Files.delete(target)
    val in = getClass.getResourceAsStream("/games_cleaned.csv")
    require(in != null, "games_cleaned.csv missing from classpath")
    try java.nio.file.Files.copy(in, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    fixtureTmpPath
  }
}
