package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Partitioned parquet serving layer — the engine's write path
  * (replaces the reference's HBase shell-put sink, stage3.ipynb cell 3;
  * semantics preserved as queryable tables, store swapped for a format
  * Spark scans with pruning).
  *
  * Scale posture:
  *  - `partitionBy` on low-cardinality query predicates (year, kind)
  *    turns those predicates into directory pruning — a year-filtered
  *    scan of a 100 TB table touches only that year's files.
  *  - The pre-write `repartition(partition cols)` routes each
  *    partition's rows to one task → one file per partition instead of
  *    (tasks × partitions) small files, the classic small-file failure
  *    at scale. For very large single partitions add a bucketing
  *    column to the repartition to split output files.
  */
object Warehouse {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write
      .mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed + sorted table write — the co-located-join layout.
    * Two tables bucketed on their join key with the SAME bucket count
    * sort-merge-join with NO exchange on either side (each bucket pair
    * joins file-to-file), which at 100 TB removes the single biggest
    * cost of a recurring fact⋈fact join. Requires the session catalog
    * (bucket metadata lives in the table definition, not the files) —
    * this is the standing-warehouse layout decision, made once at
    * write time and amortized over every subsequent join. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
