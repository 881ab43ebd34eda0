package graft

import org.apache.spark.sql.functions._

import graft.functions.{RollingHash, VectorExprs}

/** The SQL function surface must plan the same native expressions the
  * Column API builds — each function is checked against its Column
  * twin, and the arity errors must be loud. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot and vec_norm2 in SQL match the Column API") {
    val sqlRow = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       vec_norm2(array(3.0D, 4.0D)) AS n""".stripMargin)
      .as[(Double, Double)].head()
    assert(sqlRow == ((32.0, 25.0)))
    val colRow = spark.range(1)
      .select(
        VectorExprs.dot(
          array(lit(1.0), lit(2.0), lit(3.0)),
          array(lit(4.0), lit(5.0), lit(6.0))).as("d"),
        VectorExprs.norm2(array(lit(3.0), lit(4.0))).as("n"))
      .as[(Double, Double)].head()
    assert(sqlRow == colRow)
  }

  test("poly_hash in SQL matches the Column API, with and without seed") {
    val viaSql = spark.sql(
      "SELECT poly_hash('abc') AS a, poly_hash('abc', 7L) AS b")
      .as[(Long, Long)].head()
    val viaCol = spark.range(1)
      .select(RollingHash.polyHash(lit("abc")).as("a"),
        RollingHash.polyHash(lit("abc"), 7L).as("b"))
      .as[(Long, Long)].head()
    assert(viaSql == viaCol)
    assert(viaSql._1 != viaSql._2, "seed must change the hash")
  }

  test("window_mins in SQL matches the Column API") {
    val text = "the quick brown fox jumps over the lazy dog"
    val viaSql = spark.sql(s"SELECT window_mins('$text', 8) AS m")
      .as[Seq[Long]].head()
    val viaCol = spark.range(1)
      .select(RollingHash.windowMins(lit(text), 8).as("m"))
      .as[Seq[Long]].head()
    assert(viaSql == viaCol && viaSql.size == 8)
  }

  test("wrong arity fails analysis loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D))").collect()
    }
    assert(e.getMessage.contains("vec_dot"))
  }

  test("optimizer rewrites vec_dot(x, x) to vec_norm2(x), values intact") {
    def kernels(df: org.apache.spark.sql.DataFrame) = {
      val es = df.queryExecution.optimizedPlan
        .flatMap(_.expressions.flatMap(_.collect {
          case e: VectorExprs.Norm2      => "norm2"
          case e: VectorExprs.DotProduct => "dot"
        }))
      (es.count(_ == "norm2"), es.count(_ == "dot"))
    }
    val vecs = spark.range(1, 4)
      .select(array($"id".cast("double"), lit(2.0), ($"id" * 3).cast("double"))
        .as("v"))
    // Column API and SQL surfaces both hit the injected rule
    val viaCol = vecs.select(VectorExprs.dot($"v", $"v").as("d"),
      VectorExprs.norm2($"v").as("n"))
    assert(kernels(viaCol) == ((2, 0)))
    vecs.createOrReplaceTempView("p_vecs")
    val viaSql = spark.sql("SELECT vec_dot(v, v) AS d, vec_norm2(v) AS n FROM p_vecs")
    assert(kernels(viaSql) == ((2, 0)))
    viaSql.as[(Double, Double)].collect().foreach { case (d, n) =>
      assert(d == n)
    }
    // genuinely distinct operands stay a dot product
    val mixed = vecs.select(
      VectorExprs.dot($"v", array(lit(1.0), lit(0.0), lit(1.0))).as("d"))
    assert(kernels(mixed) == ((0, 1)))
  }
}
