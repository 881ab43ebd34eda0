package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.GameAnalytics

/** SURVEY.md §5 property pins: bucket when-chains are TOTAL (every
  * input lands in exactly one bucket — by construction of when/
  * otherwise, but the boundary routing is the part that regresses) and
  * NULL routing is the reference's (NULLs fall through to otherwise). */
class BucketPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val labels =
    Seq("免费", "$0-5", "$5-10", "$10-20", "$20-40", "$40+")

  test("price buckets: total over random prices incl. exact boundaries") {
    val gen = Gen.oneOf(
      Gen.choose(0.0f, 60.0f),
      Gen.oneOf(0.0f, 5.0f, 10.0f, 20.0f, 40.0f, 4.999f, 39.999f))
    val prices = (0 until 200).map(i =>
      gen.apply(Gen.Parameters.default, Seed(i)).get) ++
      Seq(0.0f, 5.0f, 10.0f, 20.0f, 40.0f)
    val df = prices.toDF("clean_price")
      .withColumn("avg_owners", lit(1))
    val out = GameAnalytics.g04(df)
    // every row lands in a known bucket; counts partition the input
    val total = out.agg(sum("game_count")).as[Long].head()
    assert(total == prices.size)
    val badLabel = out.filter(!$"price_category".isin(labels: _*)).count()
    assert(badLabel == 0)
    // boundary routing: exactly-5 is NOT in $0-5 (strict <), 0 is 免费
    val rows = df.select($"clean_price",
      when($"clean_price" === 0, "免费")
        .when($"clean_price" < 5, "$0-5").when($"clean_price" < 10, "$5-10")
        .when($"clean_price" < 20, "$10-20").when($"clean_price" < 40, "$20-40")
        .otherwise("$40+").as("b"))
      .as[(Float, String)].collect().toMap
    assert(rows(5.0f) == "$5-10" && rows(10.0f) == "$10-20" &&
      rows(20.0f) == "$20-40" && rows(40.0f) == "$40+" && rows(0.0f) == "免费")
  }

  test("NULL price routes to $40+ (reference when-chain quirk)") {
    val df = Seq[(Option[Float], Int)]((None, 1), (Some(1.0f), 1))
      .toDF("clean_price", "avg_owners")
    val out = GameAnalytics.g04(df)
      .as[(String, Double, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out("$40+") == 1L, "NULL price must fall through to otherwise")
    assert(out("$0-5") == 1L)
  }

  test("owners ranges: NULL routes to 200万+ (fig 3.3 quirk)") {
    val df = Seq[(Int, Option[Int])]((1, None), (2, Some(5000)))
      .toDF("AppID", "avg_owners")
    val bucketed = df.select(
      when($"avg_owners" < 10000, "0-1万")
        .when($"avg_owners" < 50000, "1-5万")
        .when($"avg_owners" < 150000, "5-15万")
        .when($"avg_owners" < 500000, "15-50万")
        .when($"avg_owners" < 2000000, "50-200万")
        .otherwise("200万+").as("owners_range"))
      .as[String].collect().toSeq
    assert(bucketed.sorted == Seq("0-1万", "200万+"))
  }
}
