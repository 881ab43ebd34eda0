package graft

import org.apache.spark.sql.functions._

import graft.functions.PrioritySample
import graft.model.Game
import graft.sources.GamesSource

class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  test("per-group sample: bounded size, deterministic, partition-order-proof") {
    val byLang = Tables.documents(spark, sf)
      .select($"lang", $"text").as[(String, String)]
    def sample(parts: Int): Map[String, Seq[String]] = byLang
      .repartition(parts)
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(PrioritySample.topK(5).toColumn.name("sample"))
      .collect().toMap
    val a = sample(2)
    val b = sample(13)
    assert(a == b, "sample must not depend on partitioning")
    assert(a.values.forall(_.size == 5))
    // samples come from the group itself
    val enTexts = Tables.documents(spark, sf)
      .filter($"lang" === "en").select("text").as[String].collect().toSet
    assert(a("en").forall(enTexts.contains))
  }

  test("groups smaller than k return the whole group") {
    val tiny = Seq(("a", "x"), ("a", "y"), ("b", "z")).toDS()
    val out = tiny.groupByKey(_._1).mapValues(_._2)
      .agg(PrioritySample.topK(5).toColumn.name("sample"))
      .collect().toMap
    assert(out("a").toSet == Set("x", "y") && out("b") == Seq("z"))
  }

  test("typed Dataset[Game] round-trips the fixture with quirk nulls intact") {
    val fixture = getClass.getResource("/games_cleaned.csv").getPath
    val games = GamesSource.clean(GamesSource.readCsv(spark, fixture))
      .filter($"AppID" =!= 98)
      .drop("_corrupt_record")
      .as[Game]
    val g9 = games.filter(_.AppID == 9).head()
    assert(g9.avg_owners.isEmpty && g9.revenue.isEmpty,
      "null owners must surface as None in the typed core")
    val g1 = games.filter(_.AppID == 1).head()
    assert(g1.revenue.contains(1.998e7f))
    assert(games.count() == 14)
  }
}
