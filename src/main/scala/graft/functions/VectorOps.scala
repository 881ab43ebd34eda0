package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Dense-vector column math over `ArrayType` embeddings. The hot
  * primitives (dot, norm²) are native Catalyst expressions with
  * primitive-array codegen ([[VectorExprs]]); the composite forms here
  * stay plain Column algebra. Sequential left-to-right accumulation
  * everywhere — bit-identical results across partitions and engines.
  *
  * Scale note: in pair-join plans (near-dup, kNN) these run O(pairs)
  * times, so per-pair cost dominates — precompute norms per SIDE of the
  * join (O(rows)) and keep only the dot product per pair, as
  * [[graft.operators.Similarity]] / [[graft.operators.Dedup]] do.
  */
object VectorOps {

  /** Cast float embeddings to double once, up front. */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Native codegen'd forms (see [[VectorExprs]]) — bit-identical to
    * the higher-order-function forms below (same sequential
    * accumulation order), ~an order of magnitude less per-pair cost. */
  def dot(a: Column, b: Column): Column = VectorExprs.dot(a, b)

  def norm2(a: Column): Column = VectorExprs.norm2(a)

  /** Reference HOF implementations, kept for the equivalence spec. */
  def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def hofNorm2(a: Column): Column =
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
