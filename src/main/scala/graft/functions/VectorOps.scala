package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dense-vector column math over `ArrayType` embeddings, built entirely
  * from codegen'd higher-order functions (`zip_with`/`aggregate`) — no
  * UDF serialization on the hot path, and the sequential left-fold makes
  * the arithmetic order deterministic (bit-identical across partitions
  * and engines).
  *
  * Scale note: these run per-row inside WholeStageCodegen; a 64-dim
  * cosine is ~200 flops/row, so the bottleneck at 100 TB is scan + the
  * join strategy around it (see [[graft.operators.Similarity]]), not
  * this arithmetic. If profiling ever shows otherwise the upgrade path
  * is a custom Catalyst Expression with a primitive-array doGenCode.
  */
object VectorOps {

  /** Cast float embeddings to double once, up front. */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  def norm(a: Column): Column = sqrt(norm2(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id: one sign bit
    * per plane packed into a long. Planes are literal arrays so the
    * expression is constant-folded and identical on every executor. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(v, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Deterministic plane set for [[hyperplaneBucket]]. */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }
}
