package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for aggregations and joins.
  *
  * AQE's skew-join splitting covers joins, but a groupBy whose key
  * distribution has a monster key (one user with 10⁹ events, one
  * shingle in every document) still funnels that key's rows into a
  * single reduce task. Salting splits each key into `buckets`
  * sub-keys, aggregates partially per sub-key (distributing the hot
  * key over `buckets` tasks), then aggregates the partials — the same
  * partial/final decomposition Spark's own HashAggregate does between
  * map and reduce side, lifted one level so the REDUCE side is also
  * spread.
  *
  * Only decomposable aggregates are offered (sum/count/min/max):
  * their merge step is the same function applied to partials. Use
  * AQE + the built-in partial aggregation for everything unskewed —
  * salting costs one extra shuffle and should be reached for only
  * when a key is known (or measured) to be hot.
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of the full row's
    * natural ordering key is NOT required — spreading is the only
    * goal, so a cheap xxhash of a distributing column does it. */
  private def salt(distributeBy: Column, buckets: Int): Column =
    pmod(xxhash64(distributeBy), lit(buckets))

  /** groupBy(keys).agg(sum/count/min/max) with the reduce side spread
    * over `buckets` sub-aggregations per key.
    *
    * `aggs` maps output column name → (aggregate kind, input column),
    * kind ∈ {"sum", "count", "min", "max"}. */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                aggs: Map[String, (String, Column)],
                distributeBy: Column, buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    val partialExprs = aggs.map { case (name, (kind, c)) =>
      (kind match {
        case "sum"   => sum(c)
        case "count" => count(c)
        case "min"   => min(c)
        case "max"   => max(c)
        case other   => throw new IllegalArgumentException(
          s"non-decomposable aggregate: $other")
      }).as(s"__p_$name")
    }.toSeq
    val mergeExprs = aggs.map { case (name, (kind, _)) =>
      (kind match {
        case "sum" | "count" => sum(col(s"__p_$name"))
        case "min"           => min(col(s"__p_$name"))
        case "max"           => max(col(s"__p_$name"))
      }).as(name)
    }.toSeq
    df.withColumn("__salt", salt(distributeBy, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(mergeExprs.head, mergeExprs.tail: _*)
  }

  /** Salted shuffle JOIN for a hot key — the manual fallback where
    * AQE's skew split cannot reach: AQE only re-splits SORT-MERGE join
    * partitions AFTER a stage materializes, so a skewed join feeding a
    * streaming stage, a bucketed-table join (no exchange to split), or
    * an engine pinned to a pre-AQE plan still funnels the hot key into
    * one task.
    *
    * Shape: the BIG side salts each row into `buckets` sub-keys
    * (deterministic hash of `distributeBy` — any column that varies
    * within the hot key); the SMALL side is replicated once per bucket
    * (explode over 0..buckets-1). The join key becomes
    * (key, salt) — the hot key's rows spread over `buckets` tasks, and
    * every big row still meets every matching small row exactly once
    * (it lands in one salt bucket; the small side is present in all of
    * them). Inner joins only: replicated small-side rows make outer
    * semantics ambiguous. Cost: small side shuffles `buckets`× its
    * size — use for a dim-scale right side that is too big (or too
    * mid-stage) to broadcast but dwarfed by the skewed fact. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 distributeBy: Column, buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    val b = big.withColumn("__salt", salt(distributeBy, buckets))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
