package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch

/** Pins for the deterministic mergeable quantile summary behind q40:
  * exact-below-capacity equality with the r-th-smallest rule, the
  * ≤ binWidth error envelope once collapsed, and byte-level
  * partitioning-invariance (the property KLL's randomized compaction
  * would break — why it exists at all). */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val (cap, lo, hi, bins) = (64, 0.0, 1000.0, 100)
  private val binWidth = (hi - lo) / bins

  /** The sketch's own rule, computed naively: r-th smallest, r=⌈q·n⌉. */
  private def exactQ(values: Seq[Double], q: Double): Double = {
    val sorted = values.sorted
    sorted(math.max(1, math.ceil(q * sorted.size).toLong).toInt - 1)
  }

  private def sketchOf(values: Seq[Double], parts: Int): Array[Byte] = {
    val agg = udaf(QuantileSketch.buildAgg(cap, lo, hi, bins))
    values.toDF("v").repartition(parts)
      .agg(agg($"v").as("sk")).head().getAs[Array[Byte]](0)
  }

  test("exact mode: quantiles are the exact r-th smallest, ties included") {
    val values = Seq(5.0, 5.0, 5.0, 1.0, 9.0, 700.0, 700.0, 3.25, 42.0)
    val sk = sketchOf(values, 3)
    assert(QuantileSketch.count(sk) == values.size)
    for (q <- Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0))
      assert(QuantileSketch.quantile(sk, q, lo, hi) == exactQ(values, q),
        s"q=$q")
  }

  test("grid mode: collapsed sketch stays within one bin width of exact") {
    // 500 distinct values >> cap 64 — forced collapse
    val values = (0 until 500).map(i => (i * 997 % 500) * 2.0 + 0.5)
    val sk = sketchOf(values, 7)
    assert(QuantileSketch.count(sk) == values.size)
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = QuantileSketch.quantile(sk, q, lo, hi)
      val exact = exactQ(values, q)
      assert(math.abs(est - exact) <= binWidth,
        s"q=$q: est $est vs exact $exact exceeds binWidth $binWidth")
    }
  }

  test("sketch bytes are partitioning-invariant (exact AND collapsed)") {
    val small = (0 until 50).map(i => (i % 13) * 3.0) // exact mode
    val big = (0 until 300).map(i => i * 3.1)         // collapsed
    for (values <- Seq(small, big))
      assert(sketchOf(values, 1).toSeq == sketchOf(values, 13).toSeq,
        s"bytes diverge across partitionings (n=${values.size})")
  }

  test("mergeAgg over serialized sketches equals one build over the union") {
    val a = (0 until 40).map(_ * 7.0)
    val b = (0 until 200).map(_ * 4.9) // collapses the merged result
    val merge = udaf(QuantileSketch.mergeAgg(cap, lo, hi, bins))
    val merged = Seq(sketchOf(a, 3), sketchOf(b, 5)).toDF("sk")
      .agg(merge($"sk").as("sk")).head().getAs[Array[Byte]](0)
    assert(merged.toSeq == sketchOf(a ++ b, 4).toSeq,
      "rollup-merged sketch must equal the fresh full-corpus sketch")
  }

  test("w08 blob-derived rollup equals the exact recompute (nothing lost in maintenance)") {
    // the sketch-backed maintenance cycle answers from blobs alone —
    // below both capacities that answer must be EXACT, not approximate
    val got = SparkEntry.queries("w08_sketch_rollup")(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    val orders = Tables.orders(spark, sf)
    val maxYear = orders.agg(max(year($"o_orderdate"))).head().getInt(0)
    val updated = orders.select(
      year($"o_orderdate").as("y"),
      when(year($"o_orderdate") === maxYear && $"o_orderkey" % 7 === 0,
        $"o_totalprice" * 2).otherwise($"o_totalprice").as("price"),
      when(year($"o_orderdate") === maxYear && $"o_orderkey" % 7 === 0,
        $"o_custkey" + 1000000L).otherwise($"o_custkey").as("cust"))
      .as[(Int, Double, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (y, n, d, p50, p90) =>
      val rows = updated.filter(_._1 == y)
      assert(n == rows.length, s"year $y count")
      assert(d == rows.map(_._3).distinct.length, s"year $y distincts")
      val prices = rows.map(_._2).toSeq
      assert(p50 == exactQ(prices, 0.5), s"year $y p50")
      assert(p90 == exactQ(prices, 0.9), s"year $y p90")
    }
  }

  test("q40 exact mode holds at gate SF: sketch == oracle rule per year") {
    val got = SparkEntry.queries("q40_quantile_rollup")(spark, sf)
      .select($"order_year", $"n_orders", $"p50_price", $"p90_price")
      .as[(Int, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    val byYear = Tables.orders(spark, sf)
      .select(year($"o_orderdate").as("y"), $"o_totalprice")
      .as[(Int, Double)].collect().groupBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (y, n, p50, p90) =>
      val vs = byYear(y).map(_._2).toSeq
      assert(n == vs.size)
      assert(p50 == exactQ(vs, 0.5), s"year $y p50")
      assert(p90 == exactQ(vs, 0.9), s"year $y p90")
    }
  }
}
