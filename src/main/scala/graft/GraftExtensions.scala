package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{ArrayExprs, RollingHash, VectorExprs, ZOrderExprs}

/** SQL surface for the library's native Catalyst expressions: installs
  * `vec_dot`, `vec_norm2`, `poly_hash`, and `window_mins` into the
  * session's function registry, so `spark.sql("SELECT vec_dot(a, b)
  * ...")` plans the same codegen'd expression the Column API builds —
  * SQL-only users (notebooks, JDBC) get the custom kernels without
  * touching Scala. Also installs the library's optimizer rules
  * ([[graft.plans.Rewrites]]) into the session's Catalyst batches.
  *
  * Wire-up, either way Spark supports:
  *  - config: `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - builder: `GraftSession.builder(...)` applies it already.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.Rewrites.VecSelfDot)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoin.Strategy)
  }
}

object GraftExtensions {

  private type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def arity(name: String, got: Int, want: String): Nothing =
    throw new IllegalArgumentException(
      s"$name expects $want argument(s), got $got")

  private def desc(name: String, usage: String)(
      builder: PartialFunction[Seq[Expression], Expression]): Description = {
    val checked = (args: Seq[Expression]) =>
      builder.applyOrElse(args,
        (a: Seq[Expression]) => arity(name, a.size, usage))
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.GraftExtensions", name), checked)
  }

  /** Σ aᵢ·bᵢ over two DOUBLE arrays (see [[VectorExprs.DotProduct]]). */
  val vecDot: Description = desc("vec_dot", "2") {
    case Seq(a, b) => VectorExprs.DotProduct(a, b)
  }

  /** Σ aᵢ² (squared L2 norm — see [[VectorExprs.Norm2]]). */
  val vecNorm2: Description = desc("vec_norm2", "1") {
    case Seq(a) => VectorExprs.Norm2(a)
  }

  /** Rolling polynomial hash of a string; optional long seed. */
  val polyHash: Description = desc("poly_hash", "1 or 2") {
    case Seq(t) => RollingHash.PolyHash(t, Literal(RollingHash.defaultSeed))
    case Seq(t, seed) => RollingHash.PolyHash(t, seed)
  }

  /** Winnowing window minima; numBands must be an INT literal because
    * it shapes the output schema at analysis time. */
  val windowMins: Description = desc("window_mins",
      "2 or 3 (3rd an INT literal)") {
    case Seq(t, k) => RollingHash.WindowMins(t, k, 8)
    case Seq(t, k, Literal(bands: Int, IntegerType)) =>
      RollingHash.WindowMins(t, k, bands)
  }

  /** Longest equal-adjacent run in a sorted string array. */
  val arrayMaxRun: Description = desc("array_max_run", "1") {
    case Seq(a) => ArrayExprs.MaxRun(a)
  }

  /** Z-order bit interleave; LAST arg is the per-column bit width as an
    * INT literal (it shapes code generation at analysis time). */
  val interleaveBits: Description = desc("interleave_bits",
      "N cols + INT-literal bit width") {
    case args if args.size >= 2 =>
      args.last match {
        case Literal(b: Int, IntegerType) =>
          ZOrderExprs.InterleaveBits(args.init, b)
        case _ => arity("interleave_bits", args.size,
          "N cols + INT-literal bit width")
      }
  }

  val all: Seq[Description] =
    Seq(vecDot, vecNorm2, polyHash, windowMins, arrayMaxRun, interleaveBits)
}
