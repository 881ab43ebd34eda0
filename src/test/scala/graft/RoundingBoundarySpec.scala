package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.VectorOps

/** Guards the two hash-gated queries whose cross-engine stability rests
  * on PINNED ROUNDING of a double (s08: round(cosine, 9); t11:
  * round(idf, 6)). The pin is sound only while no value in the corpus
  * sits ON a half-boundary at the pinned scale — there, Spark and
  * DuckDB could legitimately disagree by one ulp BEFORE the round and
  * flip the rounded value (and with it a rank and the output hash).
  * This spec measures the distance of every participating value from
  * its nearest x.5 boundary and asserts a margin that is orders of
  * magnitude above cross-engine ulp noise (~1e-16 relative), so a
  * future fixture regeneration that lands a value near a boundary
  * fails HERE with a diagnosis instead of as an opaque hash mismatch
  * in the driver gate. */
class RoundingBoundarySpec extends SparkSpec {

  /** Distance of |v|·10^scale from its nearest half-integer boundary,
    * in units of 10^-scale (0.5 = mid-cell, 0 = exactly on a boundary). */
  private def boundaryDist(v: org.apache.spark.sql.Column, scale: Int) = {
    val scaled = abs(v) * pow(lit(10.0), lit(scale))
    val frac = scaled - floor(scaled)
    abs(frac - lit(0.5))
  }

  test("s08: no rank-relevant cosine sits near a .5e-9 rounding boundary") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"),
        VectorOps.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val c = emb
      .select(col("vec_id").as("neighbor_id"),
        VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    // only the candidates that can reach the emitted depth-20 list are
    // rank-relevant (a one-cell flip moves a value by exactly 1e-9 and
    // can only swap it with the adjacent cell); keep rank ≤ 30 for slack
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val top = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorOps.dot(col("qv"), col("cv")) /
        (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 30)
      .select(col("cosine")).collect().map(_.getDouble(0))
    // exact distance to the nearest x.5e-9 boundary, in cell units —
    // BigDecimal(double) is the exact binary value, so no measurement
    // noise from the scaled double arithmetic
    val half = BigDecimal(1, 1) // 0.5
    val minDist = top.map { v =>
      val scaled = BigDecimal(math.abs(v)) * BigDecimal(10).pow(9)
      val frac = scaled - BigDecimal(scaled.toBigInt)
      (frac - half).abs
    }.min
    // observed corpus floor is ~1e-2 cells over the rank-relevant set;
    // cross-engine fp disagreement is a few ulps ≈ 3e-7 cells — pin
    // three orders of magnitude above it
    assert(minDist > BigDecimal("1e-4"),
      s"a rank-relevant cosine is within $minDist cells of a round-half " +
        "boundary at scale 9")
  }

  test("t11: no idf factor sits near a .5e-6 rounding boundary") {
    val docs = Tables.documents(spark, sf)
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0).distinct()
    val n = docs.count()
    val idf = tokens.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .select((log((lit(n) + 1).cast(DoubleType) / (col("df") + 1).cast(DoubleType))
        + lit(1.0)).as("idf"))
    val minDist = idf.agg(min(boundaryDist(col("idf"), 6))).head().getDouble(0)
    assert(minDist > 1e-3,
      f"an idf is within $minDist%.2e of a round-half boundary at scale 6")
  }
}
