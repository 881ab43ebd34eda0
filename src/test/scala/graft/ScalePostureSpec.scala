package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Warehouse

class ScalePostureSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals the plain aggregation on skewed data") {
    // 90% of rows share one hot key
    val skewed = spark.range(20000)
      .select(
        when($"id" % 10 =!= 0, lit(42L)).otherwise($"id" % 50).as("k"),
        ($"id" % 97).as("v"))
    val plain = skewed.groupBy("k")
      .agg(sum($"v").as("total"), count($"v").as("n"),
        min($"v").as("lo"), max($"v").as("hi"))
    val salted = Skew.saltedAgg(skewed, Seq("k"),
      Map("total" -> ("sum", $"v"), "n" -> ("count", $"v"),
        "lo" -> ("min", $"v"), "hi" -> ("max", $"v")),
      distributeBy = $"v", buckets = 8)
    assert(salted.select("k", "total", "n", "lo", "hi")
      .exceptAll(plain.select("k", "total", "n", "lo", "hi")).count() == 0)
    assert(plain.exceptAll(salted.select("k", "total", "n", "lo", "hi")).count() == 0)
  }

  test("saltedAgg rejects non-decomposable aggregates") {
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(spark.range(1).toDF("k"), Seq("k"),
        Map("bad" -> ("avg", col("k"))), col("k"))
    }
  }

  test("partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    try {
      val events = Tables.events(spark, sf)
        .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      Warehouse.writePartitioned(events, dir, Seq("day"))
      val back = Warehouse.read(spark, dir)
      assert(back.count() == events.count())
      // a day-filtered scan must show partition pruning, not a filter
      val oneDay = back.filter($"day" === "2024-01-05")
      val scan = oneDay.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      assert(scan.contains("PartitionFilters: [isnotnull(day"),
        s"day predicate must prune partitions, scan was:\n$scan")
      assert(oneDay.count() ==
        events.filter($"day" === "2024-01-05").count())
      // one file per partition (plus _SUCCESS etc.): no small-file spray
      val dayDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("day="))
      assert(dayDirs.nonEmpty)
      val filesPerDay = dayDirs.map(_.listFiles().count(_.getName.endsWith(".parquet")))
      assert(filesPerDay.forall(_ == 1), s"expected 1 file/partition, got ${filesPerDay.toSeq}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

}
