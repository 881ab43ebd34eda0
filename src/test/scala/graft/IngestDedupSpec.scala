package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.IngestDedup

/** The streaming ingest dedup: first-wins (min-id) semantics across
  * micro-batch AND restart boundaries, rejected-doc authority,
  * idempotent landings. The gate (v18) separately pins the full-corpus
  * answer against the exact all-pairs DuckDB oracle. */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Drive the real file-source runtime over staged arrival slices;
    * returns kept doc_ids. */
  private def runIngest(batches: Seq[Seq[(Long, String)]]): Set[Long] = {
    val base = java.nio.file.Files.createTempDirectory("graft_v18_spec").toString
    try {
      val (src, out, idx, ckpt) =
        (s"$base/src", s"$base/out", s"$base/idx", s"$base/ckpt")
      def frame(b: Seq[(Long, String)]): DataFrame =
        b.toDF("doc_id", "text")
          .withColumn("lang", lit("en")).withColumn("source", lit("s"))
          .withColumn("n_chars", length($"text").cast("long"))
      // first two slices in run 1, the rest after a restart — every
      // spec exercise crosses both a batch and a checkpoint boundary
      val (before, after) = batches.splitAt(2 min batches.size)
      before.foreach(b => frame(b).coalesce(1).write.mode("append").parquet(src))
      def start() = IngestDedup.dedupingSink(
        IngestDedup.readDocs(spark, src), out, idx, ckpt)
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      after.foreach(b => frame(b).coalesce(1).write.mode("append").parquet(src))
      if (after.nonEmpty) {
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
      }
      spark.read.parquet(out).select($"doc_id").as[Long].collect().toSet
    } finally {
      new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
      ()
    }
  }

  test("first-wins across batches, rejected docs still suppress, uniques survive") {
    // 20-token base; +4-token extensions step the 3-gram Jaccard:
    // d2 vs d1 = 18/22 ≈ 0.82 (≥0.8), d5 vs d2 = 22/26 ≈ 0.85 (≥0.8),
    // d5 vs d1 = 18/26 ≈ 0.69 (<0.8) — a pure chain through a REJECTED doc
    val d1 = (1 to 20).map(i => s"w$i").mkString(" ")
    val d2 = d1 + " " + (21 to 24).map(i => s"w$i").mkString(" ")
    val d5 = d2 + " " + (25 to 28).map(i => s"w$i").mkString(" ")
    val uniqB = (1 to 20).map(i => s"b$i").mkString(" ")
    val uniqC = (1 to 20).map(i => s"c$i").mkString(" ")
    val kept = runIngest(Seq(
      Seq(1L -> d1, 2L -> uniqB),
      Seq(3L -> d2, 4L -> uniqC),       // 3 rejected vs 1 (cross-batch)
      Seq(5L -> d5, 6L -> uniqB)))      // 5 rejected vs REJECTED 3 only
                                        // (0.69 vs kept 1); 6 exact-dups 2
                                        // across batches AND the restart
    assert(kept == Set(1L, 2L, 4L), s"kept $kept")
  }

  test("restarting the MinHash sink with different dials fails loudly") {
    // the v30-class signing-drift guard on the v18 index: stored rows
    // signed under one (numHashes, bandRows, n) must never silently
    // equi-join against a sink running different dials
    val base = java.nio.file.Files.createTempDirectory("graft_v18_meta").toString
    try {
      val (src, out, idx, ckpt) =
        (s"$base/src", s"$base/out", s"$base/idx", s"$base/ckpt")
      Seq(1L -> "a b c d e f g h").toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(src)
      val q1 = IngestDedup.dedupingSink(
        IngestDedup.readDocs(spark, src), out, idx, ckpt)
      try q1.processAllAvailable() finally q1.stop()
      Seq(2L -> "a b c d e f g i").toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(src)
      val q2 = IngestDedup.dedupingSink(
        IngestDedup.readDocs(spark, src), out, idx, s"$base/ckpt2",
        p = Dedup.MinHashParams(numHashes = 64, bandRows = 4))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        try q2.processAllAvailable() finally q2.stop()
      }
      assert(e.getMessage.contains("signed with") ||
        Option(e.getCause).exists(_.getMessage.contains("signed with")))
    } finally {
      new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
      ()
    }
  }

  test("streamed survivors equal the exact batch all-pairs answer on real docs") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val rejected = Dedup.jaccardPairs(docs, 0.8)
      .select($"id_b").as[Long].collect().toSet
    val expected = docs.select($"doc_id").as[Long].collect().toSet -- rejected
    val batches = docs.as[(Long, String)].collect().sortBy(_._1)
      .grouped((docs.count() / 3 + 1).toInt).map(_.toSeq).toSeq
    assert(runIngest(batches) == expected)
  }

  /** Drive the semantic (embedding) sink the same way; returns kept
    * vec_ids. `phase1Planes`/`phase2Planes` force the depth per run
    * (None = the sink's auto mode); `rebucketBetween` runs the offline
    * [[Dedup.rebucketIndex]] batch job while the stream is DOWN —
    * the mid-stream re-bucket scenario. `inspect` sees the index dir
    * after everything lands. */
  private def runSemanticIngest(batches: Seq[Seq[(Long, Seq[Float])]],
                                phase1Planes: Option[Int] = None,
                                phase2Planes: Option[Int] = None,
                                rebucketBetween: Option[Int] = None,
                                betweenPhases: String => Unit = _ => (),
                                inspect: String => Unit = _ => ()): Set[Long] = {
    val base = java.nio.file.Files.createTempDirectory("graft_v30_spec").toString
    try {
      val (src, out, idx, ckpt) =
        (s"$base/src", s"$base/out", s"$base/idx", s"$base/ckpt")
      def frame(b: Seq[(Long, Seq[Float])]): DataFrame =
        b.toDF("vec_id", "embedding").withColumn("label", lit(0))
      val (before, after) = batches.splitAt(2 min batches.size)
      before.foreach(b => frame(b).coalesce(1).write.mode("append").parquet(src))
      def start(planes: Option[Int]) = IngestDedup.semanticDedupingSink(
        IngestDedup.readVecs(spark, src), out, idx, ckpt,
        planesPerBand = planes)
      val q1 = start(phase1Planes)
      try q1.processAllAvailable() finally q1.stop()
      rebucketBetween.foreach(d => Dedup.rebucketIndex(spark, idx, 24, d))
      betweenPhases(idx)
      after.foreach(b => frame(b).coalesce(1).write.mode("append").parquet(src))
      if (after.nonEmpty) {
        val q2 = start(phase2Planes)
        try q2.processAllAvailable() finally q2.stop()
      }
      inspect(idx)
      spark.read.parquet(out).select($"vec_id").as[Long].collect().toSet
    } finally {
      new scala.reflect.io.Directory(new java.io.File(base)).deleteRecursively()
      ()
    }
  }

  test("semantic: first-wins across batches and restart, rejected vectors still suppress") {
    // 2-D chain in the (x,y) plane: cos(v1,v2) = cos 60° = 0.5 ≥ 0.45,
    // cos(v2,v5) = 0.5 ≥ 0.45, cos(v1,v5) = cos 120° = −0.5 < 0.45 — a
    // pure chain through a REJECTED vector. Uniques live in their own
    // dimensions (cosine 0 to everything); 6 exact-dups 2 across
    // batches AND the restart.
    val c60 = math.cos(math.Pi / 3).toFloat; val s60 = math.sin(math.Pi / 3).toFloat
    val v1 = Seq(1f, 0f, 0f, 0f)
    val v2 = Seq(c60, s60, 0f, 0f)
    val v5 = Seq(-c60, s60, 0f, 0f)
    val u1 = Seq(0f, 0f, 1f, 0f)
    val u2 = Seq(0f, 0f, 0f, 1f)
    val kept = runSemanticIngest(Seq(
      Seq(1L -> v1, 2L -> u1),
      Seq(3L -> v2, 4L -> u2),   // 3 rejected vs 1 (cross-batch)
      Seq(5L -> v5, 6L -> u1)))  // 5 rejected vs REJECTED 3 only; 6 dups 2
    assert(kept == Set(1L, 2L, 4L), s"kept $kept")
  }

  test("semantic: streamed survivors equal the exact batch all-pairs answer on real vectors") {
    val emb = Tables.embeddings(spark, sf)
    val rejected = Dedup.embeddingNearDupPairs(emb, 0.45)
      .select($"id_b").as[Long].collect().toSet
    val all = emb.select($"vec_id").as[Long].collect().toSet
    val batches = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .grouped((all.size / 3 + 1)).map(_.toSeq).toSeq
    assert(runSemanticIngest(batches) == all -- rejected)
  }

  test("rebucketIndex re-signs bit-identically to a fresh full-corpus bucketing") {
    val emb = Tables.embeddings(spark, sf)
    val batches = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .grouped((emb.count() / 3 + 1).toInt).map(_.toSeq).toSeq
    runSemanticIngest(batches,
      phase1Planes = Some(3), phase2Planes = Some(3),
      inspect = { idx =>
        Dedup.rebucketIndex(spark, idx, 24, 5)
        val got = spark.read.parquet(s"$idx/buckets")
          .select($"vec_id", $"band", $"bucket", $"batch_id")
          .as[(Long, Int, Long, Long)].collect().toSet
        val vecs = spark.read.parquet(s"$idx/vecs")
        // a re-bucketed index == bucketing the whole seen corpus fresh
        // at the new depth, batch ids intact — WHEN a vector was signed
        // never matters (the discoverability invariance, exercised)
        val want = Dedup.embeddingBucketIndex(
            vecs.select($"vec_id", $"embedding"), 24, 5)
          .join(vecs.select($"vec_id", $"batch_id"), Seq("vec_id"))
          .select($"vec_id", $"band", $"bucket", $"batch_id")
          .as[(Long, Int, Long, Long)].collect().toSet
        assert(got == want)
        assert(IngestDedup.readPlanesMeta(spark, idx).contains((5, 24)))
        // a band-count mismatch must fail loudly, not zero recall on
        // the missing bands
        val e = intercept[IllegalArgumentException] {
          Dedup.rebucketIndex(spark, idx, 32, 5)
        }
        assert(e.getMessage.contains("bands"))
        // idempotent: a second run (the crash-retry path) changes nothing
        Dedup.rebucketIndex(spark, idx, 24, 5)
        val again = spark.read.parquet(s"$idx/buckets")
          .select($"vec_id", $"band", $"bucket", $"batch_id")
          .as[(Long, Int, Long, Long)].collect().toSet
        assert(again == got)
      })
  }

  test("mid-stream re-bucket to a deeper depth preserves the landed survivor set") {
    val emb = Tables.embeddings(spark, sf)
    val rejected = Dedup.embeddingNearDupPairs(emb, 0.45)
      .select($"id_b").as[Long].collect().toSet
    val all = emb.select($"vec_id").as[Long].collect().toSet
    val batches = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .grouped((all.size / 3 + 1)).map(_.toSeq).toSeq
    // phases 1-2 run at the gate depth, the index is re-bucketed to
    // b = 4 while the stream is down, phase 3 buckets its batch at the
    // new depth against the re-signed index — survivors must still be
    // exactly the batch all-pairs answer (discoverability depends on
    // the vectors and planes, never on when the re-bucket happened)
    val kept = runSemanticIngest(batches,
      phase1Planes = Some(3), phase2Planes = Some(4),
      rebucketBetween = Some(4))
    assert(kept == all -- rejected)
  }

  test("auto depth: a corpus crossing the lshPlanesFor boundary re-buckets mid-stream") {
    // 2600 seeded ±1 vectors in dim 256: every pairwise cosine is a
    // 256-term ±1 mean (≥ 0.45 needs a 7σ excursion — none exists under
    // this fixed seed, so everything survives and recall is not in
    // play). Slice 1 stays under the 2048-vector b=3 boundary, slice 2
    // crosses it, so the sink must re-bucket the stored index to
    // lshPlanesFor(2600) = 4 and keep landing — the meta file records
    // the deepening.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 2600).map(i =>
      (i.toLong, Seq.fill(256)(if (rnd.nextBoolean()) 1f else -1f)))
    var metaAfter: Option[(Int, Int)] = None
    val kept = runSemanticIngest(
      Seq(vecs.take(1500), vecs.slice(1500, 2600)),
      inspect = idx => metaAfter = IngestDedup.readPlanesMeta(spark, idx))
    assert(kept == vecs.map(_._1).toSet)
    assert(metaAfter.contains((4, 24)), s"expected auto re-bucket to 4, meta=$metaAfter")
  }

  test("auto mode over a committed index with NO meta re-signs instead of mis-joining") {
    // the legacy-index scenario the round-10 review surfaced: rows are
    // committed but their signing depth is unrecorded (an index written
    // before the meta existed). Resuming in auto mode must re-sign the
    // whole index at the recomputed depth — assuming the rows already
    // match would equi-join essentially nothing and land near-dups as
    // survivors. Simulated by deleting the meta between phases; the
    // 2600-vector corpus makes auto pick want=4 over the stored 3-deep
    // rows, so a mis-join would be visible... except nothing here is a
    // near-dup, so the REAL assertion is the meta and depth landing:
    // phase 2 must complete against the re-signed index and record 4.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 2600).map(i =>
      (i.toLong, Seq.fill(256)(if (rnd.nextBoolean()) 1f else -1f)))
    // plant one exact duplicate pair ACROSS the phases: its discovery
    // requires the phase-2 batch to actually join the stored index
    val dup = vecs :+ (9999L, vecs(100)._2)
    var metaAfter: Option[(Int, Int)] = None
    val kept = runSemanticIngest(
      Seq(dup.take(800), dup.slice(800, 1500), dup.slice(1500, 2601)),
      phase1Planes = Some(3),
      betweenPhases = { idx =>
        val fs = new org.apache.hadoop.fs.Path(idx)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(s"$idx/planes"), false)
      },
      inspect = idx => metaAfter = IngestDedup.readPlanesMeta(spark, idx))
    assert(kept == vecs.map(_._1).toSet,
      "the cross-phase duplicate must be rejected against the re-signed index")
    assert(metaAfter.contains((4, 24)), s"expected re-sign to 4, meta=$metaAfter")
  }

  test("landing the same batch id twice leaves one copy (retry idempotency)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_land").toString
    try {
      val df = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
      IngestDedup.landPartitioned(df, 0L, dir)
      IngestDedup.landPartitioned(df, 0L, dir) // the retry
      IngestDedup.landPartitioned(df, 1L, dir) // a later batch is additive
      assert(spark.read.parquet(dir).count() == 4)
      assert(spark.read.parquet(dir).filter($"batch_id" === 0L).count() == 2)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
      ()
    }
  }
}
