package graft

import org.apache.spark.sql.functions._

import graft.sources.{GamesCsvSource, GamesSource}

class Dsv2SourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = GamesSource.ensureFixture()

  private def viaDsv2(extra: (String, String)*) = {
    val r = spark.read.format("games-csv")
    extra.foreach { case (k, v) => r.option(k, v) }
    r.load(fixture)
  }

  test("parseLine: quoted commas, doubled quotes, empty fields, short-row rejection") {
    val ok = GamesCsvSource.parseLine(
      "3,\"Comma, The Game\",2020-05-05,5,150000,\"['Foo, Inc.', 'Bar']\",\"['Action']\"")
    assert(ok.toSeq == Seq("3", "Comma, The Game", "2020-05-05", "5",
      "150000", "['Foo, Inc.', 'Bar']", "['Action']"))
    val quotes = GamesCsvSource.parseLine(
      "4,\"Quote \"\"Master\"\"\",2019-03-03,10,10000,\"['Ltd.']\",\"['Indie']\"")
    assert(quotes(1) == "Quote \"Master\"")
    val trailing = GamesCsvSource.parseLine("11,N,2013-03-03,2.5,70000,\"['W']\",")
    assert(trailing.length == 7 && trailing(6) == "")
    assert(GamesCsvSource.parseLine("98,TooFewCols") == null)
  }

  test("connector agrees row-for-row with the builtin PERMISSIVE reader") {
    val builtin = GamesSource.readCsv(spark, fixture).cache()
      .filter($"_corrupt_record".isNull)
      .drop("_corrupt_record")
    val custom = viaDsv2()
    assert(custom.exceptAll(builtin).count() == 0 &&
      builtin.exceptAll(custom).count() == 0,
      "the hand-built parser must reproduce the builtin reader exactly")
  }

  test("byte-range splits: many partitions, same rows, no loss or double-read") {
    val whole = viaDsv2().collect().toSet
    val split = viaDsv2("maxSplitBytes" -> "64")
    assert(split.rdd.getNumPartitions > 1,
      s"64-byte splits must fan out, got ${split.rdd.getNumPartitions}")
    assert(split.collect().toSet == whole,
      "newline-aligned splits must partition the file exactly")
  }

  test("column pruning reaches the scan") {
    val pruned = viaDsv2().select($"Name")
    val scans = pruned.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.output.map(_.name) == Seq("Name")),
      s"scan must emit only the projected column:\n${pruned.queryExecution.executedPlan}")
  }

  test("AppID filters are pushed into the scan and answered correctly") {
    val df = viaDsv2().filter($"AppID" > 10)
    assert(df.queryExecution.executedPlan.toString.contains("GreaterThan"),
      "the pushed filter must appear in the scan description")
    assert(df.select($"AppID").as[Int].collect().sorted.toSeq ==
      Seq(11, 13, 14, 20200))
    // an unsupported filter stays a residual and still works
    assert(viaDsv2().filter($"Name" === "Free Epic").count() == 1)
  }
}
