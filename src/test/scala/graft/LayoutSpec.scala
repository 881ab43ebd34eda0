package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.functions.ZOrderExprs.InterleaveBits

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton implementation the codegen kernel must match. */
  private def refZ(vals: Seq[Int], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (j <- 0 until n; i <- 0 until bits)
      z |= ((vals(j) >> i) & 1L) << (i * n + (n - 1 - j))
    z
  }

  test("InterleaveBits matches the reference on random bucket ids") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(256), rnd.nextInt(256)))
    val got = rows.toDF("a", "b")
      .select(Layout.zvalue(Seq($"a", $"b"), 8).as("z"))
      .as[Long].collect().toSeq
    val want = rows.map { case (a, b) => refZ(Seq(a, b), 8) }
    assert(got == want)
  }

  test("InterleaveBits: 3 columns, null propagation, SQL registry form") {
    // 3-col interleave and the codegen path agree with the reference
    val got3 = Seq((5, 3, 7)).toDF("a", "b", "c")
      .select(Layout.zvalue(Seq($"a", $"b", $"c"), 4).as("z"))
      .as[Long].head()
    assert(got3 == refZ(Seq(5, 3, 7), 4))
    // null in any position nulls the key
    val nulls = Seq((Some(1), Option.empty[Int]))
      .toDF("a", "b")
      .select(Layout.zvalue(Seq($"a", $"b"), 8).as("z"))
      .filter($"z".isNull).count()
    assert(nulls == 1)
    // SQL surface plans the same kernel
    Seq((9, 2)).toDF("a", "b").createOrReplaceTempView("zin")
    val sqlZ = spark.sql("SELECT interleave_bits(a, b, 8) AS z FROM zin")
      .as[Long].head()
    assert(sqlZ == refZ(Seq(9, 2), 8))
  }

  test("zvalue orders locality: adjacent cells differ less than distant ones") {
    // monotone sanity: the curve keeps the quadrant structure — all
    // cells of the low-low quadrant sort before any high-high cell
    val lowLow = refZ(Seq(3, 3), 4)
    val highHigh = refZ(Seq(12, 12), 4)
    assert(lowLow < highHigh)
  }

  test("z-ordered files are narrow in BOTH dimensions; linear sort is not") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey")
    // per-file normalized range of a column, given a layout on disk
    def fileRanges(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_layout").toString
      df.write.mode("overwrite").parquet(dir)
      val global = li.agg((max(col(c)) - min(col(c))).cast("double")).head().getDouble(0)
      val meanRange = spark.read.parquet(dir)
        .withColumn("__f", input_file_name())
        .groupBy($"__f")
        .agg(((max(col(c)) - min(col(c))).cast("double") / global).as("r"))
        .agg(avg($"r")).head().getDouble(0)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      meanRange
    }
    val z = Layout.zorderLayout(li, Seq("l_partkey", "l_suppkey"),
      bits = 8, numFiles = 16)
    val linear = li.repartitionByRange(16, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
    // z-order: each of 16 files covers ~1/4 of each dimension's range
    val zP = fileRanges(z, "l_partkey")
    val zS = fileRanges(z, "l_suppkey")
    assert(zP < 0.6 && zS < 0.6,
      f"z-order per-file ranges should be narrow in both dims: p=$zP%.2f s=$zS%.2f")
    // linear: first dim narrow, second dim spans ~everything per file
    val lP = fileRanges(linear, "l_partkey")
    val lS = fileRanges(linear, "l_suppkey")
    assert(lP < 0.3, f"linear sort should be narrow on its sort key: $lP%.2f")
    assert(lS > 0.8, f"linear sort should NOT prune the second dim: $lS%.2f")
    assert(zS < lS / 2,
      f"z-order must beat linear sort on the second dim: $zS%.2f vs $lS%.2f")
  }
}
