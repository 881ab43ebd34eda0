package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.operators.GameAnalytics
import graft.sources.GamesSource

/** Golden quirk-fixture tests (SURVEY.md §5): the checked-in
  * games_cleaned.csv plants every §1.4/§1.5/§7.4 edge case, and these
  * pins are hand-computed — they fail if any bug-compat semantic
  * (explode asymmetry, float32 revenue, when-chain NULL routing,
  * string slicing of malformed dates, CSV escape handling) drifts. */
class GamesSpec extends SparkSpec {
  import spark.implicits._

  private val fixture =
    getClass.getResource("/games_cleaned.csv").getPath

  private def raw = GamesSource.readCsv(spark, fixture)
  private def g: DataFrame = GamesSource.clean(raw).filter($"AppID" =!= 98)

  test("ingest: explicit schema, quoted commas, escaped quotes, corrupt capture") {
    // Spark disallows corrupt-column-only queries on the lazy reader —
    // cache first (the documented pattern)
    val cached = raw.cache()
    try {
      assert(cached.count() == 15)
      val r3 = cached.filter($"AppID" === 3).select("Name").as[String].head()
      assert(r3 == "Comma, The Game", "quoted comma field must survive")
      val r4 = cached.filter($"AppID" === 4).select("Name").as[String].head()
      assert(r4 == "Quote \"Master\"", "doubled-quote escape must survive")
      val corrupt = cached.filter($"_corrupt_record".isNotNull).count()
      assert(corrupt == 1, "short row must land in _corrupt_record")
    } finally cached.unpersist()
  }

  test("clean (Q0): float32 revenue, null propagation, zero owners") {
    val cleaned = g
    assert(cleaned.schema("clean_price").dataType == FloatType)
    assert(cleaned.schema("revenue").dataType == FloatType,
      "revenue must stay float32 (spark_eda.py:45-49 semantics)")
    // null owners → null revenue; zero owners → 0.0 revenue (NOT null)
    assert(cleaned.filter($"AppID" === 9).select($"revenue".isNull).as[Boolean].head())
    assert(cleaned.filter($"AppID" === 7).select($"revenue").as[Float].head() == 0.0f)
    // float32 rounding is part of the contract: 9.99f × 2,000,000
    assert(cleaned.filter($"AppID" === 1).select($"revenue").as[Float].head()
      == 1.998e7f)
  }

  test("g01 quirks: genres explode, zero-revenue rows count, null revenue drops") {
    val out = GameAnalytics.g01(g)
      .as[(String, Double, Long)].collect().map { case (k, v, c) => k -> ((v, c)) }.toMap
    // Action rows: 1, 3, 4, 7(rev 0.0 — counted), 8, 13(rev 0.0), 14;
    // row 9's null revenue is dropped. Hand sum:
    // 19,980,000 + 750,000 + 100,000 + 0 + 375,000 + 0 + 580,000
    assert(out("Action") == (21785000.0, 7L), s"got ${out.get("Action")}")
    // row 10's '[]' cleans to '' and is filtered; row 11's NULL drops
    assert(!out.contains(""))
  }

  test("g02 quirks: developers do NOT explode; multi-dev string is one key") {
    // Options: dev 'Z' has only a null-revenue game → NULL aggregates
    val rows = GameAnalytics.g02(g)
      .as[(String, Option[Double], Option[Long], Long)].collect()
    val top = rows.head
    // Valve: rows 1 + 13 + 14 → 19,980,000 + 0 + 580,000
    assert(top == ("Valve", Some(20560000.0), Some(5080000L), 3L), s"got $top")
    // the multi-dev game groups under the FULL joined string (§1.4)
    assert(rows.exists(_._1 == "Foo, Inc., Bar"))
    assert(!rows.exists(_._1 == "Bar"), "splitting developers would be a regression")
    // ['Ltd.'] pseudo-developer survives as its own key
    assert(rows.exists(_._1 == "Ltd."))
  }

  test("g04 quirks: 免费 bucket, ordered when-chain") {
    val out = GameAnalytics.g04(g)
      .as[(String, Double, Long)].collect().map { case (k, v, c) => k -> ((v, c)) }.toMap
    assert(out("免费") == ((50000.0 + 3000000.0) / 2, 2L))
    // $0-5 holds prices 3, 2.5, 4.99 — exactly-5 goes to $5-10
    assert(out("$0-5") == ((60000.0 + 70000.0 + 0.0) / 3, 3L))
    assert(out("$5-10")._2 == 3L, "prices 5, 9.99, 7.25")
    assert(out("$40+")._2 == 1L, "price exactly 40 falls through to $40+")
  }

  test("g09 quirk: malformed date yields month '6-'") {
    val months = GameAnalytics.g09(g)
      .as[(String, Long)].collect().toMap
    assert(months("6-") == 1L, "substring(999-06-15, 6, 2) must be '6-'")
    assert(!months.contains(""), "empty date must be filtered")
  }

  test("g16 (E1): reverse rowkey anti-hotspot, single-regex clean") {
    val profile = GameAnalytics.g16(g)
    val bowling = profile.filter($"Name" === "Galactic Bowling")
      .select("rowkey").as[String].head()
    assert(bowling == "00202", "stage3.md:110-113 rowkey example")
    val dev3 = profile.filter($"Name" === "Comma, The Game")
      .select("clean_dev").as[String].head()
    assert(dev3 == "Foo, Inc., Bar")
  }

  test("year-range string comparison excludes <2000, >2024 and malformed") {
    val years = GameAnalytics.g03YearlyTrend(spark, sf)
      .select("Year").as[Int].collect()
    assert(years.forall(y => y >= 2000 && y <= 2024))
    // fixture-level: 1999 and 2029 rows excluded
    val fy = GamesSource.clean(raw)
      .select(substring($"release_date", 1, 4).as("Year"))
      .filter($"Year".isNotNull && $"Year" >= "2000" && $"Year" <= "2024")
      .as[String].collect().toSet
    assert(!fy.contains("1999") && !fy.contains("2029") && !fy.contains("999-"))
  }

  test("g21: percentile_approx median lands between the discrete middle elements") {
    // approx_percentile returns an ELEMENT of the group; the exact
    // `percentile` interpolates between the two middle elements on even
    // counts. The operator contract to pin: the approx median sits in
    // [lower-middle, upper-middle], and within that gap of the
    // interpolated exact value.
    val approx = GameAnalytics.g21GenreApproxMedian(spark, sf)
    val base = GameAnalytics.genresExploded(GamesSource.deriveFromPart(spark, sf))
      .filter($"Genre" =!= "" && $"Genre".isNotNull && $"clean_price".isNotNull)
    val bounds = base.groupBy($"Genre")
      .agg(sort_array(collect_list($"clean_price".cast("double"))).as("ps"),
        expr("CAST(percentile(clean_price, 0.5) AS DOUBLE)").as("exact_median"))
      .select($"Genre", $"exact_median",
        element_at($"ps", ((size($"ps") + 1) / 2).cast("int")).as("lo_mid"),
        element_at($"ps", ((size($"ps") / 2) + 1).cast("int")).as("hi_mid"))
    val joined = approx.join(bounds, "Genre")
    assert(joined.count() == approx.count(), "every genre must have an exact twin")
    val bad = joined.filter(
      $"approx_median_price" < $"lo_mid" || $"approx_median_price" > $"hi_mid" ||
        abs($"approx_median_price" - $"exact_median") > ($"hi_mid" - $"lo_mid") + 1e-9)
    assert(bad.isEmpty, s"approx median outside middle-element bounds:\n${bad.collect().mkString("\n")}")
  }

  test("g22 gate shape: corrupt row excluded, quirk rows ingested") {
    val out = GameAnalytics.g22CsvIngest(spark, sf)
    val ids = out.select("AppID").as[Int].collect().toSet
    assert(!ids.contains(98), "corrupt-captured row must not reach the gate output")
    assert(ids.contains(3) && ids.contains(4), "quoted-comma and escaped-quote rows survive")
    assert(out.filter($"AppID" === 9).select($"revenue").isEmpty == false)
  }

  test("g20: deterministic cut plans as TakeOrderedAndProject, not a full sort") {
    val plan = GameAnalytics.g20SampleScatter(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sample cut must be top-K, not a global sort:\n$plan")
  }

  test("catalog queries share one cached base frame (InMemoryRelation in plan)") {
    GamesSource.cachedGames(spark, sf).count()  // materialize
    val plan = GameAnalytics.g01GenreRevenue(spark, sf).queryExecution.optimizedPlan
    val cachedScans = plan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cachedScans.nonEmpty, s"expected cached games scan, plan:\n$plan")
  }

  test("derivation parity smoke: Spark-side games table matches row count of part") {
    val derived = GamesSource.deriveFromPart(spark, sf)
    assert(derived.count() == Tables.part(spark, sf).count())
    // planted quirks present
    assert(derived.filter($"Developers" === "['Ltd.']").count() > 0)
    assert(derived.filter($"release_date" === "999-06-15").count() > 0)
    assert(derived.filter($"Genres".isNull).count() > 0)
    assert(derived.filter($"clean_price" === 0.0f).count() > 0)
  }

  test("g25: put-batch sections, shell grammar, and the cell-3 quirks") {
    val lines = graft.operators.GameAnalytics
      .g25HbasePutBatch(spark, sf)
      .as[(Long, String)].collect()
    assert(lines.map(_._1).toSeq == (1L to 340L),
      "340 contiguous seq numbers: 50×5 profile + 20×2 summary + 50 index")
    val bys = lines.toMap
    // section boundaries carry the right tables/qualifiers
    assert(bys(1L).startsWith("put 'game_profile', '"))
    assert(bys(251L).contains("'summary:game_count'"))
    assert(bys(291L).contains("'product_list:"))
    // shell grammar: exactly 4 quoted operands per put, and no operand
    // may contain an embedded quote EXCEPT genres (the reference quirk:
    // cell 3 strips quotes from name/dev but NOT from clean_genre)
    lines.foreach { case (seq, cmd) =>
      assert(cmd.matches("put '[^']*', '[^']*', '[^']*', '.*'"), s"$seq: $cmd")
      if ((seq - 1) % 5 != 2 || seq > 250)
        assert(cmd.count(_ == '\'') == 8, s"$seq not quote-safe: $cmd")
    }
    // dev rowkeys carry the space->underscore rewrite
    assert(lines.filter(l => l._1 > 250 && l._1 <= 290)
      .forall(!_._2.split("', '")(1).contains(" ")))
    // null owners render as Python's str(None) — what the f-string emits
    assert(lines.exists(l => l._1 <= 250 && l._2.endsWith("'metrics:owners', 'None'")))
  }
}
