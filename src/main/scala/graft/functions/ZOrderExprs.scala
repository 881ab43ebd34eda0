package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Bit-interleaving kernel for Z-order (Morton) data layout — the
  * multi-dimensional clustering key behind file skipping on MORE THAN
  * ONE predicate column. A table sorted linearly on `a` gives min/max
  * file statistics that prune scans filtered on `a` but leaves every
  * file spanning the full range of `b`; sorting on the interleaved key
  * gives every file a narrow range in BOTH dimensions, so predicates on
  * either (or both) columns skip most files. Same layout idea as the
  * public lakehouse Z-order implementations (Delta OSS, Iceberg),
  * expressed as a codegen'd Catalyst expression over pre-bucketed
  * dimension ids.
  */
object ZOrderExprs {

  /** Interleaves the low `bits` bits of N IntegerType bucket ids into
    * one long: output bit `i*N + (N-1-j)` = bit `i` of child `j`, so
    * the FIRST child occupies the higher slot within each bit group
    * (ties broken toward the leading dimension, like a leading sort
    * key). Callers guarantee IntegerType inputs in `[0, 2^bits)` —
    * [[graft.operators.Layout]] produces them; there is deliberately no
    * analyzer-time coercion (same stance as [[VectorExprs]]). Any null
    * input nulls the result. */
  case class InterleaveBits(override val children: Seq[Expression], bits: Int)
      extends Expression {
    require(children.nonEmpty, "interleave_bits needs at least one column")
    require(bits > 0 && bits * children.size <= 63,
      s"bits=$bits × ${children.size} cols must fit in a signed long")

    override def dataType: DataType = LongType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "interleave_bits"

    // validate (not coerce): without this, a BIGINT child would CCE on
    // the interpreted path but silently shift on the codegen path —
    // same query, different outcome depending on which path Catalyst
    // picks (constant folding vs whole-stage codegen)
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      val bad = children.map(_.dataType).filterNot(_ == IntegerType)
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"interleave_bits expects INT bucket ids, got ${bad.mkString(", ")}")
    }

    override def eval(input: InternalRow): Any = {
      val n = children.size
      var z = 0L
      var j = 0
      while (j < n) {
        val v = children(j).eval(input)
        if (v == null) return null
        val c = v.asInstanceOf[Int]
        var i = 0
        while (i < bits) {
          z |= ((c >> i) & 1L) << (i * n + (n - 1 - j))
          i += 1
        }
        j += 1
      }
      z
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = children.size
      val evals = children.map(_.genCode(ctx))
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      // per-child: eval, break out on null, else OR its bits in
      val accum = evals.zipWithIndex.map { case (e, j) =>
        s"""
${e.code}
if (${e.isNull}) { ${ev.isNull} = true; break; }
for (int $i = 0; $i < $bits; $i++) {
  $z |= (((long) ((${e.value} >> $i) & 1)) << ($i * $n + ${n - 1 - j}));
}"""
      }.mkString("\n")
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      ev.copy(code =
        code"""
boolean ${ev.isNull} = false;
long $z = 0L;
do {
$accum
} while (false);
final long ${ev.value} = $z;""")
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }
}
