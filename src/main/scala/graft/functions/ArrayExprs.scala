package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for per-row array scans on the text
  * path — same rationale as [[VectorExprs]]: the `aggregate` HOF forms
  * are correct but interpreted (per-element lambda dispatch outside
  * whole-stage codegen); these loop over `ArrayData` in generated code.
  */
object ArrayExprs {

  /** Longest run of equal adjacent elements in a SORTED string array =
    * the max multiplicity of any element (the t08 repetition kernel).
    * Empty array → 0. A null element → null (HOF parity: equality with
    * null poisons the fold). */
  case class MaxRun(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "array_max_run"
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var best = 0
      var run = 0
      var prev: UTF8String = null
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getUTF8String(i)
        run = if (prev != null && v.equals(prev)) run + 1 else 1
        if (run > best) best = run
        prev = v
        i += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val best = ctx.freshName("best")
        val run = ctx.freshName("run")
        val prev = ctx.freshName("prev")
        val v = ctx.freshName("v")
        s"""
           |final int $n = $x.numElements();
           |int $best = 0;
           |int $run = 0;
           |UTF8String $prev = null;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  final UTF8String $v = $x.getUTF8String($i);
           |  $run = ($prev != null && $v.equals($prev)) ? $run + 1 : 1;
           |  if ($run > $best) $best = $run;
           |  $prev = $v;
           |}
           |${ev.value} = $best;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def maxRun(sortedArr: Column): Column =
    GraftSqlBridge.column(MaxRun(GraftSqlBridge.expression(sortedArr)))
}
