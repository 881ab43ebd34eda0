package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling (Rabin–Karp) document fingerprinting as native Catalyst
  * expressions — the winnowing-style primitive large dedup pipelines
  * use to fingerprint documents without materializing shingle strings.
  *
  * [[RollingHash.PolyHash]] hashes a whole UTF-8 string with the
  * polynomial x·B + byte (mod 2⁶⁴, wrapping — deliberately overflow-
  * friendly, which is why this is an Expression and not SQL arithmetic:
  * ANSI SQL would either reject or widen the wrap).
  * [[RollingHash.WindowMins]] emits the minimum window hash per
  * winnowing band — k-byte windows computed in ONE pass over the bytes
  * with O(1) work per byte (the rolling property: drop the oldest byte
  * with a precomputed Bᵏ⁻¹ term, shift in the new one). Two documents
  * sharing any long run of bytes share window minima, so equality
  * joins on the output find near-duplicates — same join shape as the
  * MinHash path in [[graft.operators.Dedup]], but string-free.
  */
object RollingHash {

  /** Multiplier: odd, large, good avalanche in the low 32 bits. */
  val B = 0x100000001b3L // FNV-64 prime

  /** Whole-string polynomial hash (seeded FNV-1a-shaped). */
  case class PolyHash(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash"

    override def nullSafeEval(s: Any, seed: Any): Any = {
      val bytes = s.asInstanceOf[UTF8String].getBytes
      var h = seed.asInstanceOf[Long]
      var i = 0
      while (i < bytes.length) { h = h * B + (bytes(i) & 0xffL); i += 1 }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (s, seed) => {
        val bytes = ctx.freshName("bytes")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        s"""
           |final byte[] $bytes = $s.getBytes();
           |long $h = $seed;
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  $h = $h * ${B}L + ($bytes[$i] & 0xffL);
           |}
           |${ev.value} = $h;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Per-band minima of k-byte rolling window hashes: each window hash
    * is assigned to band `hash mod numBands` — CONTENT-keyed, so the
    * assignment is shift-invariant (a document embedded at any offset
    * inside another contributes the same (band, hash) pairs; striping
    * by window position would not survive a one-byte prefix).
    * Documents shorter than k yield a single whole-string hash in every
    * band. One pass, O(1) per byte. */
  case class WindowMins(left: Expression, right: Expression, numBands: Int)
      extends BinaryExpression {
    require(numBands > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "rolling_window_mins"

    override def nullSafeEval(s: Any, kAny: Any): Any = {
      val bytes = s.asInstanceOf[UTF8String].getBytes
      val k = kAny.asInstanceOf[Int]
      val mins = Array.fill(numBands)(Long.MaxValue)
      if (bytes.length < k) {
        var h = 0L
        var i = 0
        while (i < bytes.length) { h = h * B + (bytes(i) & 0xffL); i += 1 }
        java.util.Arrays.fill(mins, h)
      } else {
        // B^(k-1) for the rolling drop-term
        var bk = 1L
        var j = 1
        while (j < k) { bk *= B; j += 1 }
        var h = 0L
        var i = 0
        while (i < bytes.length) {
          h = h * B + (bytes(i) & 0xffL)
          if (i >= k) h -= bk * B * (bytes(i - k) & 0xffL)
          if (i >= k - 1) {
            val band = java.lang.Math.floorMod(h, numBands.toLong).toInt
            if (h < mins(band)) mins(band) = h
          }
          i += 1
        }
      }
      new GenericArrayData(mins)
    }

    // the rolling loop is branch-heavy; interpreted eval is already
    // array-primitive, so codegen falls back to it via this call
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (s, kv) => {
        val expr = ctx.addReferenceObj("windowMinsExpr", this)
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
          s" $expr.nullSafeEval($s, $kv);"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // -- Column surface ---------------------------------------------------------

  /** FNV-1a offset basis — the default polynomial seed. */
  val defaultSeed: Long = 0xcbf29ce484222325L

  def polyHash(text: Column, seed: Long = defaultSeed): Column =
    GraftSqlBridge.column(PolyHash(
      GraftSqlBridge.expression(text),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(seed))))

  def windowMins(text: Column, k: Int, numBands: Int = 8): Column =
    GraftSqlBridge.column(WindowMins(
      GraftSqlBridge.expression(text),
      GraftSqlBridge.expression(org.apache.spark.sql.functions.lit(k)),
      numBands))
}
