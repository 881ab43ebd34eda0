package graft

import graft.operators.{Dedup, Pipeline}

/** Funnel invariants at fixture scale (the gate hash-pins exact values
  * at sf0.01; these pin the shape wherever it runs). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("p02 funnel: five stages, monotone docs, tokens track docs") {
    val rows = Pipeline.p02PipelineFunnel(spark, sf)
      .as[(Int, String, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    assert(rows.map(_._2).toSeq ==
      Seq("ingest", "scrub", "exact_dedup", "quality_filter", "near_dedup"))
    val docs = rows.map(_._3)
    // doc counts never grow through the funnel (scrub keeps all docs)
    assert(docs.sliding(2).forall { case Array(a, b) => b <= a })
    // scrub removes tokens, never documents
    assert(rows(1)._3 == rows(0)._3 && rows(1)._4 < rows(0)._4)
    // the final corpus is non-empty and lost something on the way
    assert(docs.last > 0 && docs.last < docs.head)
  }

  test("p02 near-dedup drops exactly the cluster non-heads") {
    val quality = {
      // rebuild the quality-survivor set the pipeline filters down to
      import org.apache.spark.sql.functions._
      import graft.operators.TextAnalysis
      TextAnalysis.scrubFrame(Tables.documents(spark, sf))
        .select(col("doc_id"), col("text"),
          size(col("kept")).as("kept_tok"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        .filter(col("q") >= Pipeline.minQuality &&
          col("kept_tok") >= Pipeline.minKeptTokens)
    }
    val pairs = Dedup.jaccardPairs(
      quality.select($"doc_id", $"text"), Pipeline.nearDupThreshold)
    val nonHeads = Dedup.dupClusters(pairs)
      .filter($"node" =!= $"lbl").count()
    val funnel = Pipeline.p02PipelineFunnel(spark, sf)
      .as[(Int, String, Long, Long)].collect()
    assert(funnel(3)._3 - funnel(4)._3 == nonHeads)
  }

  test("p07 shards: bijection, uniform sizes, matches one-partition reference") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val out = Pipeline.p07ShuffleShards(spark, sf)
      .as[(Long, Int, Int)].collect()
    val nDocs = Tables.documents(spark, sf).count()
    // every document assigned exactly once
    assert(out.length == nDocs && out.map(_._1).distinct.length == nDocs)
    // multi-shard shape at fixture scale: 8-doc shards are full except
    // the last, positions are a clean 0..size-1, shard ids contiguous
    val out8 = Pipeline.shuffleShards(Tables.documents(spark, sf), 8L)
      .as[(Long, Int, Int)].collect()
    val byShard = out8.groupBy(_._2)
    val lastShard = byShard.keys.max
    assert(byShard.keys.toSeq.sorted == (0 to lastShard) && lastShard >= 1)
    byShard.foreach { case (sid, rows) =>
      assert(rows.length == 8 || (sid == lastShard && rows.length <= 8))
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length))
    }
    // the two-phase rank reproduces the plain single-partition
    // row_number exactly (the shape CumulativeSpec pins plan-side)
    val ref = Tables.documents(spark, sf)
      .select($"doc_id", Pipeline.shuffleKey($"doc_id").as("k"))
      .withColumn("rn", row_number().over(Window.orderBy($"k", $"doc_id")))
      .select($"doc_id", expr("(rn - 1) div 64").cast("int").as("shard_id"),
        expr("(rn - 1) % 64").cast("int").as("pos_in_shard"))
      .as[(Long, Int, Int)].collect()
    assert(out.toSet == ref.toSet)
  }

  test("p08 stratified split: exact floor(n/10) quota per source, total coverage") {
    import org.apache.spark.sql.functions._
    val out = Pipeline.p08StratifiedSplit(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(out.count() == docs.count(), "every document assigned once")
    val quotas = out.groupBy($"source")
      .agg(count(lit(1)).as("n"),
        count(when($"split" === "val", 1)).as("n_val"))
      .as[(String, Long, Long)].collect()
    assert(quotas.nonEmpty)
    quotas.foreach { case (src, n, nVal) =>
      assert(nVal == n / 10, s"$src: $nVal val of $n docs — quota must be exact")
    }
    // ranks are a clean 1..n permutation within each stratum
    val badRank = out.groupBy($"source")
      .agg(count(lit(1)).as("n"), max($"strat_rank").as("mx"),
        countDistinct($"strat_rank").as("d"))
      .filter($"mx" =!= $"n" || $"d" =!= $"n").count()
    assert(badRank == 0, "strat_rank must be a 1..n permutation per source")
  }

  test("p10: near-dup clusters never straddle splits; singletons match p04") {
    val p10 = Pipeline.p10LeakageSafeSplit(spark, sf)
      .as[(Long, Long, String, Boolean)].collect()
    val p04 = Pipeline.p04HashSplit(spark, sf)
      .as[(Long, Int, String)].collect().map(r => r._1 -> r._3).toMap
    assert(p10.length == p04.size)
    // one split per cluster head — a straddling cluster is the leak
    p10.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._3).distinct.length == 1)
    }
    p10.foreach { case (id, head, split, regrouped) =>
      if (head == id) assert(split == p04(id) && !regrouped)
      // regrouped IS the naive-vs-cluster disagreement, never a third value
      assert(regrouped == (split != p04(id)))
      assert(split == p04(head)) // the head's own split is the cluster's
    }
    // the fixture's dup clusters genuinely exercise the repair path
    assert(p10.exists(r => r._2 != r._1))
  }

  test("p11 curriculum: dense ranks, bins descend, cum_tokens is the exact prefix sum") {
    val rows = Pipeline.p11CurriculumOrder(spark, sf)
      .as[(Long, Int, Int, Long)].collect()
    val n = rows.length
    assert(n > 0 && rows.map(_._3).sorted.toSeq == (1 to n))
    val ordered = rows.sortBy(_._3)
    // bins never increase along the schedule (clean data first)
    ordered.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(b <= a); case _ =>
    }
    // cum_tokens at rank r is the sum of the first r docs' token counts
    val toks = Tables.documents(spark, sf)
      .select($"doc_id",
        graft.operators.TextAnalysis.tokenCount($"text").cast("long"))
      .as[(Long, Long)].collect().toMap
    var run = 0L
    ordered.foreach { case (id, _, _, cum) =>
      run += toks(id); assert(cum == run)
    }
  }

  test("p13 ragCorpus: boilerplate bar, keep-first dedup, per-chunk quality — each mechanism isolated") {
    import org.apache.spark.sql.functions._
    // window 4 / stride 4 (no overlap) so each doc's chunks are its
    // consecutive 4-token groups — hand-checkable
    // q ≈ 0.49 (passes the 0.35 bar — only the doc-frequency bar may
    // drop it); planted in docs 1, 2, 3
    val boiler = "the footer navigation bar"
    val good = "the weather is that of a mild and clear morning in the"
    val digits = "1234 5678 9012 3456"             // digit soup, q ~ 0.2
    val docs = Seq(
      (1L, s"$good $boiler"),
      (2L, s"$good $boiler"),                      // chunk 0 dup of doc 1's
      (3L, s"$boiler"),
      (4L, s"$digits")
    ).toDF("doc_id", "text")
    val out = Pipeline.ragCorpus(docs, 4, 4, maxDocFreq = 2L,
        minQuality = 0.35)
      .select($"doc_id", $"chunk_id").as[(Long, Int)].collect().toSet
    // doc 1: chunks 0,1,2 = good tokens (kept), chunk 3 = boilerplate
    // (3 distinct docs > bar 2 → dropped). doc 2: same text — every
    // kept chunk md5-duplicates doc 1's → keep-first drops them all.
    // doc 3: only the boilerplate chunk → nothing. doc 4: digit soup
    // fails the quality bar.
    assert(out == Set((1L, 0), (1L, 1), (1L, 2)),
      s"expected doc 1's three prose chunks only, got $out")
    // raising the boilerplate bar to 3 re-admits the footer chunk —
    // FIRST occurrence only (doc 1, chunk 3)
    val loose = Pipeline.ragCorpus(docs, 4, 4, maxDocFreq = 3L,
        minQuality = 0.35)
      .select($"doc_id", $"chunk_id").as[(Long, Int)].collect().toSet
    assert(loose == Set((1L, 0), (1L, 1), (1L, 2), (1L, 3)), s"got $loose")
  }

  test("hashMix: rate 1 keeps all, 0 keeps none, 205/256 IS the train split") {
    import org.apache.spark.sql.functions.lit
    val docs = Tables.documents(spark, sf)
    assert(Pipeline.hashMix(docs, lit(1.0)).count() == docs.count())
    assert(Pipeline.hashMix(docs, lit(0.0)).count() == 0)
    // same bucket arithmetic as p04: the 205/256 mix is exactly its
    // train split, pinning mix and split to one shared keep-decision
    val mixed = Pipeline.hashMix(docs, lit(205.0 / 256.0)).select("doc_id")
    val train = Pipeline.p04HashSplit(spark, sf)
      .filter($"split" === "train").select("doc_id")
    assert(mixed.exceptAll(train).count() == 0 &&
      train.exceptAll(mixed).count() == 0)
  }

  test("temperatureRates: (n_min/n_s)^(1-α), rarest keeps all, α=1 natural") {
    import org.apache.spark.sql.functions.col
    // sources: a × 9, b × 1 → p_a/p_b = 9:1, n_min = 1
    val docs = ((0L until 9L).map(i => (i, "a")) :+ (9L, "b"))
      .toDF("doc_id", "source")
    val half = Pipeline.temperatureRates(docs, 0.5)
      .orderBy("source").collect()
    // α = 0.5: rate_a = (1/9)^0.5 = 0.333333 (round-6), rate_b = 1
    assert(half.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(half.map(_.getLong(1)).toSeq == Seq(9L, 1L))
    assert(half.map(_.getDouble(2)).toSeq == Seq(0.333333, 1.0))
    // α = 1 is the natural distribution: every source keeps everything
    val nat = Pipeline.temperatureRates(docs, 1.0).collect()
    assert(nat.forall(_.getDouble(2) == 1.0))
    // α = 0 equalizes expected kept counts: rate_a = 1/9
    val eq = Pipeline.temperatureRates(docs, 0.0)
      .orderBy("source").collect()
    assert(eq.map(_.getDouble(2)).toSeq == Seq(0.111111, 1.0))
  }

  test("p09 per-source keep decisions reuse the one md5 bucket owner") {
    // every kept count must equal a direct hashMix filter at that
    // source's rate — the gate query and the operator share mixKeep
    import org.apache.spark.sql.functions.{broadcast, col}
    val docs = Tables.documents(spark, sf)
    val report = Pipeline.p09TemperatureMix(spark, sf).collect()
    val rates = Pipeline.temperatureRates(docs, 0.5)
    for (r <- report) {
      val kept = Pipeline.hashMix(
        docs.filter($"source" === r.getString(0))
          .join(broadcast(rates), Seq("source")),
        col("temp_rate")).count()
      assert(kept == r.getLong(3),
        s"source ${r.getString(0)}: report ${r.getLong(3)} vs direct $kept")
    }
  }

  test("p12: p10's train corpus minus cross-split contamination, p11-ordered") {
    import org.apache.spark.sql.functions.col
    val p12 = Pipeline.p12PretrainCorpus(spark, sf).localCheckpoint()
    val p10 = Pipeline.p10LeakageSafeSplit(spark, sf).localCheckpoint()
    // membership: every output doc is a p10 TRAIN doc
    assert(p12.join(p10.filter(col("split") =!= "train"), "doc_id").count() == 0,
      "a held-out document leaked into the training corpus")
    // the decontamination stage is LIVE on this corpus: strictly fewer
    // docs than p10's train split (2 contaminated train docs at sf0.01)
    val trainN = p10.filter(col("split") === "train").count()
    val outN = p12.count()
    assert(outN < trainN,
      s"decontamination dropped nothing: $outN of $trainN train docs kept")
    // curriculum shape: dense ranks 1..N, nondecreasing token schedule,
    // bins nonincreasing along the rank order (clean data first)
    val rows = p12.orderBy(col("curriculum_rank"))
      .select(col("curriculum_rank"), col("bin"), col("cum_tokens"))
      .as[(Int, Int, Long)].collect()
    assert(rows.map(_._1).toSeq == (1 to outN.toInt).toSeq, "ranks not dense")
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._3 >= a._3 && b._2 <= a._2
      case _ => true
    }, "token schedule or bin order broken")
    // the 100 TB pair-stage swap (hot-shingle cap in stage 1) is
    // LOSSLESS at gate SF: row-identical output — the d08-vs-d02
    // precedent applied at the pipeline level. At x100 this swap is
    // what keeps p12 off the d02 quadratic curve (dev/scaling.md).
    val capped = Pipeline.p12PretrainCorpusCapped(spark, sf)
    assert(capped.exceptAll(p12).count() == 0 &&
      p12.exceptAll(capped).count() == 0,
      "capped pair-stage p12 diverged from the gate form at gate SF")
  }
}
