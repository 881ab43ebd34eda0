package graft

/** t1-style smoke over the full judged catalog: every SparkEntry entry
  * runs on sf0.001, returns rows, and is deterministic across reruns
  * (the driver hash-compares against DuckDB, so nondeterminism = fail). */
class CatalogSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a documented rows-only check") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without a query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: non-empty and deterministic") {
      val d1 = digest(fn(spark, sf))
      val cnt = fn(spark, sf).count()
      assert(cnt > 0, s"$name returned 0 rows")
      val d2 = digest(fn(spark, sf))
      assert(d1 == d2, s"$name nondeterministic across reruns")
    }
  }
}
