package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic mergeable quantile summary — the rollup-able quantile
  * family q30's HLL gives distincts (reference workload: the stage-2
  * price/percentile reports, `spark_eda.py:214-233`, re-expressed as a
  * warehouse rollup). KLL was considered and rejected: its randomized
  * compaction breaks partitioning-invariance (DeterminismSpec). This
  * summary is deterministic BY CONSTRUCTION in the theta-sketch style
  * (q39's exact-below-capacity precedent):
  *
  *  - '''exact mode''' while the group's DISTINCT value count stays ≤
  *    `cap`: the state is the full (value → count) map, and any
  *    quantile is the exact r-th smallest element of the multiset.
  *  - '''grid mode''' above `cap`: the state collapses onto a FIXED
  *    a-priori bin grid over [lo, hi) (`bins` equal-width bins;
  *    out-of-range values clamp to the edge bins). The quantile is the
  *    midpoint of the bin the r-th element falls in — rank-exact,
  *    value-error ≤ binWidth (QuantileSketchSpec pins it).
  *
  * Merge-order invariance (what makes the hash gate and the width-sweep
  * pin sound): the final state is a pure function of the input
  * MULTISET, never of partitioning. If the union's distinct count is
  * ≤ cap, every intermediate partial's is too (a subset can't have
  * more distincts), so no collapse happens under ANY merge order and
  * the exact maps just add. If it exceeds cap, whichever merge first
  * sees > cap collapses — and "map every value-count to its fixed bin,
  * add counts" commutes with addition, so collapsing early, late, or
  * piecewise yields the identical grid. Both aggregates are therefore
  * associative + commutative, the property partial aggregation needs.
  *
  * At 100 TB: one pass builds per-partition partials map-side (bounded
  * at ~cap entries or `bins` longs each), the month level stores
  * `sketchBytes`-sized blobs, and every coarser rollup (year, all-time)
  * merges blobs without re-reading raw data — COUNT-style
  * re-aggregation for a holistic statistic.
  */
object QuantileSketch {

  /** Mutable aggregation state: `exact` is the value→count map while in
    * exact mode, null once collapsed onto `grid`. */
  final class QSk(var exact: mutable.HashMap[Double, Long],
                  var grid: Array[Long])

  private final val MAGIC_EXACT: Byte = 0
  private final val MAGIC_GRID: Byte = 1

  private def binOf(v: Double, lo: Double, hi: Double, bins: Int): Int = {
    val raw = ((v - lo) / (hi - lo) * bins).toInt
    math.min(bins - 1, math.max(0, raw))
  }

  private def collapse(s: QSk, lo: Double, hi: Double, bins: Int): Unit =
    if (s.exact != null) {
      if (s.grid == null) s.grid = new Array[Long](bins)
      s.exact.foreach { case (v, c) => s.grid(binOf(v, lo, hi, bins)) += c }
      s.exact = null
    }

  /** Serialized form — sorted pairs for the exact mode so the bytes
    * themselves are canonical, not just the extracted quantiles. */
  def serialize(s: QSk): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    if (s.exact != null) {
      out.writeByte(MAGIC_EXACT)
      out.writeInt(s.exact.size)
      s.exact.toArray.sortBy(_._1).foreach { case (v, c) =>
        out.writeDouble(v); out.writeLong(c)
      }
    } else {
      out.writeByte(MAGIC_GRID)
      out.writeInt(s.grid.length)
      s.grid.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  private def deserializeInto(b: Array[Byte], cap: Int, lo: Double,
                              hi: Double, bins: Int, into: QSk): Unit = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    in.readByte() match {
      case MAGIC_EXACT =>
        val n = in.readInt()
        var i = 0
        while (i < n) {
          val v = in.readDouble(); val c = in.readLong()
          add(into, v, c, cap, lo, hi, bins)
          i += 1
        }
      case MAGIC_GRID =>
        val n = in.readInt()
        require(n == bins, s"grid width mismatch: sketch $n vs agg $bins")
        collapse(into, lo, hi, bins)
        if (into.grid == null) into.grid = new Array[Long](bins)
        var i = 0
        while (i < n) { into.grid(i) += in.readLong(); i += 1 }
    }
  }

  /** Total weight of a serialized sketch. */
  def count(b: Array[Byte]): Long = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    val mode = in.readByte()
    val n = in.readInt()
    var total = 0L
    var i = 0
    while (i < n) {
      if (mode == MAGIC_EXACT) in.readDouble()
      total += in.readLong()
      i += 1
    }
    total
  }

  /** The q-quantile of a serialized sketch: the r-th smallest element
    * (r = ⌈q·n⌉, 1-based — the oracle-mirrorable rule; q = 0 → the
    * minimum). Exact mode returns the element itself; grid mode the
    * midpoint of its bin (value error ≤ binWidth by the clamp). */
  def quantile(b: Array[Byte], q: Double, lo: Double, hi: Double): Double = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    val mode = in.readByte()
    val n = in.readInt()
    val vals = new Array[Double](n)
    val cnts = new Array[Long](n)
    var total = 0L
    var i = 0
    while (i < n) {
      if (mode == MAGIC_EXACT) vals(i) = in.readDouble()
      cnts(i) = in.readLong()
      total += cnts(i)
      i += 1
    }
    if (total == 0L) return Double.NaN
    val r = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    i = 0
    while (i < n) {
      cum += cnts(i)
      if (cum >= r) {
        return if (mode == MAGIC_EXACT) vals(i)
        else lo + (i + 0.5) * ((hi - lo) / n)
      }
      i += 1
    }
    Double.NaN // unreachable: cum ends at total ≥ r
  }

  /** Add one weighted value into `a` (collapsing at > cap). */
  private def add(a: QSk, v: Double, c: Long, cap: Int, lo: Double,
                  hi: Double, bins: Int): Unit =
    if (a.exact != null) {
      a.exact.update(v, a.exact.getOrElse(v, 0L) + c)
      if (a.exact.size > cap) collapse(a, lo, hi, bins)
    } else a.grid(binOf(v, lo, hi, bins)) += c

  /** Fold `b` into `a` — associative + commutative (see class doc). */
  private def mergeInto(a: QSk, b: QSk, cap: Int, lo: Double, hi: Double,
                        bins: Int): QSk = {
    if (b.exact != null)
      b.exact.foreach { case (v, c) => add(a, v, c, cap, lo, hi, bins) }
    else {
      collapse(a, lo, hi, bins)
      if (a.grid == null) a.grid = new Array[Long](bins)
      var i = 0
      while (i < bins) { a.grid(i) += b.grid(i); i += 1 }
    }
    a
  }

  /** values → sketch bytes (the month-level builder). */
  def buildAgg(cap: Int, lo: Double, hi: Double,
               bins: Int): Aggregator[Double, QSk, Array[Byte]] =
    new Aggregator[Double, QSk, Array[Byte]] {
      override def zero: QSk = new QSk(mutable.HashMap.empty, null)
      override def reduce(s: QSk, v: Double): QSk = {
        add(s, v, 1L, cap, lo, hi, bins); s
      }
      override def merge(a: QSk, b: QSk): QSk =
        mergeInto(a, b, cap, lo, hi, bins)
      override def finish(s: QSk): Array[Byte] = serialize(s)
      override def bufferEncoder: Encoder[QSk] = Encoders.kryo[QSk]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** sketch bytes → merged sketch bytes (the year-level rollup —
    * never touches raw values again). */
  def mergeAgg(cap: Int, lo: Double, hi: Double,
               bins: Int): Aggregator[Array[Byte], QSk, Array[Byte]] =
    new Aggregator[Array[Byte], QSk, Array[Byte]] {
      override def zero: QSk = new QSk(mutable.HashMap.empty, null)
      override def reduce(s: QSk, b: Array[Byte]): QSk = {
        deserializeInto(b, cap, lo, hi, bins, s)
        s
      }
      override def merge(a: QSk, b: QSk): QSk =
        mergeInto(a, b, cap, lo, hi, bins)
      override def finish(s: QSk): Array[Byte] = serialize(s)
      override def bufferEncoder: Encoder[QSk] = Encoders.kryo[QSk]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }
}
