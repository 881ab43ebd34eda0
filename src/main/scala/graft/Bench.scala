package graft


/** Benchmark main: one JSON line with per-query wall-clock at
  * `SPARK_GRAFT_SF_DIR`. Two measurement choices that matter:
  *  - an untimed warmup pass at sf0.001 first, so JIT/codegen-cache
  *    warmup isn't billed to whichever query happens to run first;
  *  - the timed action is a noop-sink write, which materializes every
  *    output column (a bare count() lets Catalyst skip computing
  *    projected values — under-measures scan/compute-heavy queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)

    def runOnce(dir: String, name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch { case _: Throwable => false }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup dir: explicit env, else the smallest sibling SF, else the
    // bench dir itself — and report failures rather than silently
    // skipping warmup (an unwarmed first query inflates its number)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", {
      val sibling = new java.io.File(sfDir).getParentFile match {
        case null => sfDir
        case p    => new java.io.File(p, "sf0.001").getPath
      }
      if (new java.io.File(sibling).isDirectory) sibling else sfDir
    })
    // two passes: the second catches code JIT'd only after the first
    // execution (measured on the typed mapPartitions decode path, the
    // one query outside WholeStageCodegen — first timed run was ~2.5×
    // its steady state with a single warmup)
    val warmFailures = (1 to 2).map(_ => names.count(n => !runOnce(warmDir, n))).sum
    if (warmFailures > 0)
      System.err.println(s"[bench] $warmFailures/${2 * names.size} warmup runs failed (dir=$warmDir)")

    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok = runOnce(sfDir, name)
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
