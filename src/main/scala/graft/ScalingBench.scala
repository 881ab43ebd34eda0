package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, ScaleCorpus, TextAnalysis}
import graft.streaming.IngestDedup

/** Scaling-curve harness behind `dev/scaling.md`: times each
  * capped-vs-uncapped operator pair on deterministically up-scaled
  * corpora ([[graft.operators.ScaleCorpus]]) and prints one JSON line
  * per (scale, query) measurement. The claim under test: the capped /
  * banded paths (the declared 100 TB route) grow ~linearly with corpus
  * size while their uncapped exact twins bend quadratic on the
  * boilerplate population the synthesis plants.
  *
  * Usage: `runMain graft.ScalingBench [baseSfDir] [replicas...]`
  * (defaults: `/root/testdata/sf0.01`, scales 1 10 100). Set
  * `SPARK_GRAFT_SCALING_SKIP_UNCAPPED` to a comma-separated scale list
  * to skip the quadratic twins where they stop being affordable —
  * skipped runs print `-1` (the Bench sentinel convention).
  */
object ScalingBench {

  /** Corpus dirs whose s17 index was built by THIS invocation. */
  private val s17Built =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def force(df: DataFrame): Long = {
    // noop datasource: full distributed execution, zero driver pull
    df.write.format("noop").mode("overwrite").save()
    0L
  }

  private def time(fn: => DataFrame): Double = {
    val t0 = System.nanoTime()
    force(fn)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val scales =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100)
    val skipUncapped = sys.env.get("SPARK_GRAFT_SCALING_SKIP_UNCAPPED")
      .map(_.split(",").map(_.trim.toInt).toSet).getOrElse(Set.empty[Int])
    // measure a subset without re-running the whole (expensive) grid
    val only = sys.env.get("SPARK_GRAFT_SCALING_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)

    // (name, capped?, runner). Caps/bands mirror the d08/d11/d13/t15
    // gate parameters; v18 has no uncapped twin — its curve measures
    // the O(batch + candidates) per-batch index join directly.
    val runs: Seq[(String, Boolean, (SparkSession, String) => DataFrame)] = Seq(
      ("d02_jaccard_uncapped", false,
        (s, d) => Dedup.jaccardPairs(Tables.documents(s, d), 0.8)),
      ("d08_jaccard_capped", true,
        (s, d) => Dedup.jaccardPairs(Tables.documents(s, d), 0.8,
          maxShingleFreq = Some(8))),
      ("d03_minhash_uncapped", false,
        (s, d) => Dedup.minhashDedupPairs(Tables.documents(s, d), 0.8)),
      ("d11_minhash_capped", true,
        (s, d) => Dedup.minhashDedupPairs(Tables.documents(s, d), 0.8,
          maxBucketSize = Some(32))),
      ("d12_semantic_exact", false, Dedup.d12SemanticDedup _),
      // round 8 measured the fixed-depth (b = 3 at any N) form OOMing
      // the JVM at x100 — ~N²/8 candidates per band. d13 now scales its
      // plane depth with log₂(N/256) and caps hot buckets, so it sits
      // on the capped side; the x100 row must COMPLETE, that's the claim
      ("d13_semantic_lsh", true, Dedup.d13SemanticDedupLsh _),
      ("d14_semantic_ivf", true, Dedup.d14SemanticDedupIvf _),
      ("t13_decontam_uncapped", false,
        (s, d) => TextAnalysis.decontaminate(Tables.documents(s, d), 5)),
      ("t15_decontam_capped", true,
        (s, d) => TextAnalysis.decontaminate(Tables.documents(s, d), 5,
          maxShingleFreq = Some(8))),
      ("v18_streamed_ingest_dedup", true, IngestDedup.v18StreamedIngestDedup _),
      ("v30_streamed_semantic_dedup", true, IngestDedup.v30StreamedSemanticDedup _),
      // singletons with no quadratic twin — their claim is a ~linear
      // slope: c01's assignment is a projection + constant-size
      // exchange, t17's rounds run over the word-TYPE table (which
      // grows far slower than the corpus), m07's decode+sign is
      // embarrassingly parallel with 16-byte outputs
      ("c01_kmeans_assign", true, operators.Clustering.c01KmeansAssign _),
      ("t17_bpe_merges", true, operators.TextAnalysis.t17BpeMerges _),
      ("m07_image_phash", true, operators.Media.m07ImagePhash _),
      // mutual-kNN graph: the exact all-pairs candidate stage (the s13
      // gate) vs the same mutual filter over IVF candidates with a
      // corpus-scaled cell count (~512 vectors/cell, nprobe 4 → ~2k
      // scored candidates per query REGARDLESS of corpus size). The
      // mutual filter itself is bounded (k·N) either way — the curve
      // isolates the candidate generator.
      ("s13_mutual_exact", false,
        (s, d) => {
          val e = Tables.embeddings(s, d)
          operators.Similarity.mutualKnn(
            operators.Similarity.bruteForceKnn(e, e, 5, roundCosineTo = 9))
        }),
      ("s13_mutual_ivf", true,
        (s, d) => {
          val e = Tables.embeddings(s, d)
          val nlist = math.max(16, (e.count() / 512).toInt)
          operators.Similarity.mutualKnn(
            operators.Similarity.ivfKnn(e, e, 5, nlist = nlist, nprobe = 4))
        }),
      // semantic decontamination (d16): d13's pair stage restricted
      // cross-split — must inherit d13's completes-at-x100 behavior
      // (same generator, strictly smaller downstream)
      ("d16_semantic_decontam", true,
        operators.Dedup.d16SemanticDecontam _),
      // persisted IVF (s17): the build-once/query-many decomposition.
      // The BUILD row pays the corpus-scaled fit + the cell-partitioned
      // write; the SEARCH row is a 20-query batch probing 4 cells each,
      // whose cost should stay ~flat while the corpus grows 100× —
      // that flatness IS the amortization claim. The search REQUIRES
      // its build in the same invocation: __s17_index survives under
      // /tmp/graft_scaling/x$r across runs while ScaleCorpus only
      // rewrites the tables, so a SCALING_ONLY=search run would
      // silently time a stale index against fresh embeddings.
      ("s17_ivf_index_build", true,
        (s, d) => {
          val e = Tables.embeddings(s, d)
          val nlist = math.max(16, (e.count() / 512).toInt)
          operators.Similarity.writeIvfIndex(e, s"$d/__s17_index", nlist)
          s17Built.add(d)
          s.read.parquet(s"$d/__s17_index/cells")
        }),
      ("s17_ivf_index_search", true,
        (s, d) => {
          require(s17Built.contains(d),
            s"s17_ivf_index_search at $d needs s17_ivf_index_build in " +
              "the SAME invocation (include it in SPARK_GRAFT_SCALING_ONLY)")
          import org.apache.spark.sql.functions.col
          val q = Tables.embeddings(s, d).filter(col("vec_id") < 20)
          operators.Similarity.ivfKnnFromIndex(q, s"$d/__s17_index", 5)
        }))

    // Second axis for queries over the TPC-H-shaped tables (the graph
    // family reads orders/lineitem, which ScaleCorpus does not scale):
    // SPARK_GRAFT_SCALING_SF_DIRS=dir1,dir2,... iterates REAL sf dirs
    // (sf0.001 → sf0.01 → sf0.1 spans 100×) and times the graph
    // queries there, skipping the corpus synthesis entirely.
    val sfDirAxis = sys.env.get("SPARK_GRAFT_SCALING_SF_DIRS")
    sfDirAxis.foreach { dirsCsv =>
      val graphRuns: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
        ("x01_pagerank", operators.Graph.x01Pagerank _),
        ("x02_triangles", operators.Graph.x02Triangles _),
        ("x03_bfs_hops", operators.Graph.x03BfsHops _),
        ("x06_star_components", operators.Graph.x06StarComponents _),
        // same rounds as x01 over the bucketed edge table — the curve
        // includes the one-time bucketed write each run pays
        ("x07_pagerank_bucketed", operators.Graph.x07PagerankBucketed _))
      for (dir <- dirsCsv.split(",").map(_.trim).filter(_.nonEmpty)) {
        val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
        val nLines = spark.read.parquet(s"$dir/lineitem.parquet").count()
        for ((name, fn) <- graphRuns if only.forall(_.contains(name))) {
          val sec = try time(fn(spark, dir)) catch {
            case e: Exception =>
              System.err.println(s"[scaling] $name@$dir failed: ${e.getMessage}")
              -1.0
          }
          println(s"""{"sfDir":"$dir","orders":$nOrders,"lineitem":$nLines,""" +
            s""""query":"$name","sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec))}}""")
          System.out.flush()
        }
      }
    }

    for (r <- scales if sfDirAxis.isEmpty) {
      val dir = s"/tmp/graft_scaling/x$r"
      ScaleCorpus.write(base, dir, r, spark)
      val nDocs = Tables.documents(spark, dir).count()
      val nVecs = Tables.embeddings(spark, dir).count()
      for ((name, capped, fn) <- runs if only.forall(_.contains(name))) {
        val sec =
          if (!capped && skipUncapped.contains(r)) -1.0
          else try time(fn(spark, dir)) catch {
            case e: Exception =>
              System.err.println(s"[scaling] $name@x$r failed: ${e.getMessage}")
              -1.0
          }
        println(s"""{"scale":$r,"docs":$nDocs,"vecs":$nVecs,""" +
          s""""query":"$name","capped":$capped,"sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec))}}""")
        System.out.flush()
      }
    }
    spark.stop()
  }
}
