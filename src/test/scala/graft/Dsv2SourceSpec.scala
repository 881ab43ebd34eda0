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

  test("split boundary landing exactly on a line start loses no rows") {
    // Fixed-width lines whose length divides the split step: every
    // interior boundary lands EXACTLY on a line start. The Hadoop
    // convention (owner of [start,end) also reads the line starting at
    // `end`; next reader unconditionally skips its first line) keeps
    // these rows; an exclusive-both-sides contract loses one row per
    // boundary, silently.
    val dir = java.nio.file.Files.createTempDirectory("graft_fixed")
    val f = dir.resolve("fixed.csv")
    val header = "AppID,Name,release_date,clean_price,avg_owners,Developers,Genres\n"
    val lines = (0 until 100).map(i => f"${100 + i}%d,N$i%03d,2020-01-01,5.0,1000,D,G\n")
    assert(lines.map(_.length).distinct.size == 1, "fixture must be fixed-width")
    val lineLen = lines.head.length
    java.nio.file.Files.write(f, (header + lines.mkString).getBytes("UTF-8"))

    val df = spark.read.format("games-csv")
      .option("maxSplitBytes", (10 * lineLen).toString)
      .load(f.toString)
    assert(df.rdd.getNumPartitions == 10,
      s"expected 10 aligned splits, got ${df.rdd.getNumPartitions}")
    val ids = df.select($"AppID").as[Int].collect().sorted.toSeq
    assert(ids == (100 until 200),
      s"boundary-start lines must be read exactly once; missing: ${(100 until 200).toSet -- ids.toSet}")
  }

  test("multi-byte UTF-8 fields decode identically to the builtin reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_utf8")
    val f = dir.resolve("utf8.csv")
    val content =
      "AppID,Name,release_date,clean_price,avg_owners,Developers,Genres\n" +
        "1,Jeu Décalé,2020-01-01,5,1000,\"['Müller GmbH']\",\"['Ação', '游戏']\"\n" +
        "2,Plain Ascii,2021-02-02,0,2000,\"['Dev']\",\"['Action']\"\n" +
        "3,Ωmega — приключение,2022-03-03,9.99,3000,\"['株式会社']\",\"['ロールプレイング']\"\n"
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))

    val custom = spark.read.format("games-csv").load(f.toString)
      .select($"Name", $"Developers", $"Genres").collect().toSet
    val builtin = spark.read.option("header", "true").csv(f.toString)
      .select($"Name", $"Developers", $"Genres").collect().toSet
    assert(custom == builtin,
      s"UTF-8 decode must match the builtin reader:\n$custom\nvs\n$builtin")
    assert(custom.exists(_.getString(0) == "Ωmega — приключение"))

    // byte-range splits may cut INSIDE a multi-byte sequence: the skip-
    // to-newline is byte-based ('\n' never occurs inside a UTF-8
    // continuation), so tiny splits must still decode every row intact
    val split = spark.read.format("games-csv").option("maxSplitBytes", "16")
      .load(f.toString).select($"Name", $"Developers", $"Genres")
    assert(split.rdd.getNumPartitions > 1)
    assert(split.collect().toSet == builtin)
  }

  test("write path: multi-partition round trip is lossless, including quoting edges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_w")
    val rt = dir.resolve("rt.csv").toString
    val original = viaDsv2()
    original.repartition(4).write.format("games-csv")
      .mode("overwrite").save(rt)
    val back = spark.read.format("games-csv").load(rt)
    assert(back.collect().toSet == original.collect().toSet,
      "write→read must reproduce every row (quoted commas, doubled " +
        "quotes, empty→null) across multiple task part files")
    // the reassembled file still parses under DuckDB's grammar too —
    // proven at the gate (g24 vs g22Sql); here pin the header + row count
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(rt)), "UTF-8").split("\n")
    assert(lines.head == "AppID,Name,release_date,clean_price,avg_owners,Developers,Genres")
    assert(lines.length - 1 == original.count())
  }

  test("write path: overwrite replaces atomically and leaves no staging residue") {
    val dir = java.nio.file.Files.createTempDirectory("graft_w3")
    val t = dir.resolve("t.csv").toString
    viaDsv2().write.format("games-csv").mode("overwrite").save(t)
    val first = spark.read.format("games-csv").load(t).count()
    // second overwrite of an EXISTING destination exercises the
    // move-aside replace (old file renamed aside, restored on failure,
    // deleted with the staging dir on success — never delete-then-rename)
    viaDsv2().filter($"AppID" > 10).write.format("games-csv")
      .mode("overwrite").save(t)
    assert(spark.read.format("games-csv").load(t).count() < first)
    // staging dirs are namespaced per write (queryId) so concurrent
    // writers never share one; every variant must be cleaned up
    val residue = java.nio.file.Files.list(dir).iterator().asInstanceOf[
      java.util.Iterator[java.nio.file.Path]]
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (residue.hasNext) names += residue.next().getFileName.toString
    // (the local FS also leaves Hadoop's .crc checksum twin — not residue)
    assert(!names.exists(n => n.contains("__staging__") || n.contains("__replaced__")),
      s"no staging/aside residue may survive a commit: $names")
  }

  test("write path: append refuses an existing target; schema mismatch fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_w2")
    val t = dir.resolve("t.csv").toString
    viaDsv2().write.format("games-csv").mode("overwrite").save(t)
    intercept[Exception] {
      viaDsv2().write.format("games-csv").mode("append").save(t)
    }
    // missing nullable columns are null-padded by Spark's output
    // resolver (engine semantics, observed); an UNRESOLVABLE column is
    // the loud-failure case
    intercept[Exception] {
      viaDsv2().withColumnRenamed("Name", "Foo").write.format("games-csv")
        .mode("overwrite").save(dir.resolve("u.csv").toString)
    }
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
