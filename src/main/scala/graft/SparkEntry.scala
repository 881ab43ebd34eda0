package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the judged operator inventory: each entry is one operator/
  * query-shape from SURVEY.md §2, runnable on any `/root/testdata/sf*`
  * dir. `oracleSql` holds the DuckDB-equivalent SQL for the hash-compare
  * gate (omitted only for ops DuckDB cannot express — those get a
  * rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.StarQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.StarQueries.queries ++
      operators.TextAnalysis.queries ++
      operators.EventQueries.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Media.queries ++
      operators.GameAnalytics.queries ++
      operators.AsOf.queries ++
      operators.Pipeline.queries ++
      operators.Sketches.queries ++
      operators.Layout.queries ++
      operators.RangeJoin.queries ++
      operators.Profile.queries ++
      operators.Audit.queries ++
      operators.Clustering.queries ++
      operators.Graph.queries ++
      sources.Warehouse.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.StarQueries.oracles ++
      operators.TextAnalysis.oracles ++
      operators.EventQueries.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.Media.oracles ++
      operators.GameAnalytics.oracles ++
      operators.AsOf.oracles ++
      operators.Pipeline.oracles ++
      operators.Sketches.oracles ++
      operators.Layout.oracles ++
      operators.RangeJoin.oracles ++
      operators.Profile.oracles ++
      operators.Audit.oracles ++
      operators.Clustering.oracles ++
      operators.Graph.oracles ++
      sources.Warehouse.oracles
}
