package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.VectorOps

/** Similarity search over the `embeddings` table: exact brute-force
  * cosine top-k (the correctness baseline) and a random-hyperplane
  * LSH-bucketed approximate variant (the scale path).
  *
  * Scale notes (100 TB):
  *  - Brute force is a query⋈corpus cross join: fine when the query set
  *    is small (broadcast the queries, stream the corpus — cost is one
  *    corpus scan per batch of queries). It is the oracle-checkable
  *    exact form.
  *  - The LSH form buckets the corpus once (one narrow shuffle on
  *    bucket id) and joins queries only to their bucket — sub-linear
  *    per query. Recall versus exact top-k is pinned in ScalaTest; at
  *    production scale you'd multi-probe neighboring buckets
  *    (flip-1-bit probes) to trade compute back for recall — the
  *    bucket-id expression makes those probes plain bit-twiddles.
  */
object Similarity {

  /** Exact top-k neighbors (cosine) for each query vector. Norms are
    * computed once per side (O(rows)) so the pair loop pays only the
    * dot product. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    roundCosineTo: Int = -1): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      VectorOps.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    val raw = VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        if (roundCosineTo >= 0) round(raw, roundCosineTo) else raw)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
  }

  /** Corpus with its LSH bucket id attached. The plane dimensionality
    * is probed from the data (one cheap first-row action) — a
    * hardcoded dim on mismatched embeddings would null every dot
    * product and silently funnel ALL rows into bucket 0, turning the
    * sub-linear path into a hidden cross join. */
  def annBuckets(emb: DataFrame, numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val probed = emb.select(size(col("embedding")).as("d"))
      .filter(col("d").isNotNull).head(1)
    val dim = if (probed.isEmpty) 1 else probed(0).getInt(0)
    val planes = VectorOps.randomPlanes(numPlanes, dim, seed)
    emb.select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("bucket", VectorOps.hyperplaneBucket(col("v"), planes))
  }

  /** Approximate top-k: exact ranking restricted to the query's bucket,
    * plus `multiProbe` flip-1-bit neighbor buckets (standard multi-probe
    * LSH: a true neighbor differing on exactly one hyperplane sign is
    * still found). Probing b buckets multiplies candidate volume by ~b
    * while staying sub-linear in the corpus — the recall/compute dial.
    * multiProbe = 0 is single-probe; multiProbe = numPlanes probes every
    * hamming-1 bucket. */
  def annKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             numPlanes: Int = 8, seed: Long = 42L,
             multiProbe: Int = 0): DataFrame = {
    require(multiProbe >= 0 && multiProbe <= numPlanes)
    val qb0 = annBuckets(queries, numPlanes, seed)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    // probe buckets are plain bit-twiddles on the query's own bucket id;
    // the corpus side stays single-bucketed so its shuffle key is unchanged
    val probes = col("bucket") +: (0 until multiProbe).map(i =>
      col("bucket").bitwiseXOR(lit(1L << i)))
    val qb = qb0.select(col("query_id"), col("qv"), col("qn"),
      explode(array(probes: _*)).as("bucket"))
    val cb = annBuckets(corpus, numPlanes, seed)
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("bucket"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    rankCandidates(qb.join(cb, Seq("bucket")), k)
  }

  /** IVF (inverted-file) approximate kNN — the second standard ANN
    * scale path next to LSH ([[annKnn]]), mirroring the public
    * IVF-Flat design: a k-means coarse quantizer (MLlib, seeded)
    * partitions the corpus into `nlist` cells; each query probes its
    * `nprobe` nearest centroids (by the same Euclidean metric k-means
    * assigns with) and exact-ranks only those cells' vectors.
    *
    * Scale notes: the index is built once (at 100 TB, fit the
    * quantizer on a sample — `KMeans.fit` already aggregates
    * per-partition), the corpus is shuffled once on cell id, and each
    * query touches nprobe/nlist of the corpus — the recall/compute
    * dial. `nprobe = nlist` degenerates to exact brute force, which the
    * ScalaTest pin exploits. */
  /** Fit the coarse quantizer and assign every corpus vector to a cell
    * — the index-build step shared by [[ivfKnn]] and the s05 balance
    * diagnostics. Returns (cells: neighbor_id/cv/cn/cell, centroids:
    * cell/centroid/cn2 — nlist rows, broadcast side). */
  private[operators] def ivfIndex(corpus: DataFrame, nlist: Int,
                                  seed: Long): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c0 = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("fv", array_to_vector(col("cv")))
    // fit on ONE partition of a DETERMINISTIC sample: k-means
    // partial-sum merge order is task-completion-dependent, so a
    // distributed fit is not bit-deterministic across runs, and fitting
    // the full corpus single-threaded was the s04/s05 cost driver.
    // Quantizers are trained on a sample in practice anyway
    // (sample-then-fit); id-ordered head keeps the sample — and thus
    // the centroids — identical across partitionings. Only the FIT is
    // sampled and single-partition; assignment and search stay
    // distributed over the full corpus.
    val fitSample = c0.orderBy(col("neighbor_id"))
      .limit(math.max(nlist * 64, 1024)).coalesce(1)
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(fitSample)
    val cells = model.transform(c0)
      .select(col("neighbor_id"), col("cv"), col("cell"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    // centroid table: nlist rows of index metadata — broadcast side,
    // with |c|² precomputed once per centroid
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.toSeq.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq) }.toDF("cell", "centroid")
      .withColumn("cn2", VectorOps.norm2(col("centroid")))
    (cells, centroids)
  }

  /** TWO-LEVEL (hierarchical) centroid fit — the quantizer for cell
    * counts past what any bounded single fit can shape (~10⁵ cells,
    * the documented d14/s04 gap): a coarse k-means over a bounded
    * deterministic sample splits the corpus into ~√nlist groups, then
    * EACH group fits its own ~√nlist sub-centroids as one DISTRIBUTED
    * task (flatMapGroups over a per-group id-sorted bounded sample,
    * running the same deterministic in-task Lloyd the PQ codebooks
    * use). Fit work is spread over k1 parallel tasks of bounded size
    * instead of one driver loop whose cost grows with nlist — and
    * nothing downstream cares: the output is just a (cell, centroid,
    * cn2) table, and assignment/probe/candidate joins are indifferent
    * to which quantizer produced the cell ids.
    *
    * Determinism: coarse fit is a driver-local [[lloydFit]] over an
    * id-ordered bounded sample, coarse assignment argmin tie-broken on
    * cell id, per-group samples id-ranked, [[lloydFit]] iteration
    * order fixed — bit-identical across runs and partitionings
    * (pinned in SimilaritySpec).
    *
    * Empty coarse groups (possible when k1 exceeds the natural cluster
    * count) simply contribute no sub-centroids; cell ids stay unique
    * via the coarse·k2+j numbering. `pts` columns: (id, v). */
  /** Both levels of the two-level fit: the k1-row coarse table, the
    * final cell table carrying its `coarse` parent — so assignment can
    * be HIERARCHICAL (rank k1 coarse centroids, then only the chosen
    * group's k2 subs: N·(k1+k2) scored pairs instead of N·nlist) —
    * and the (id, coarse) assignment the fit already computed over the
    * full corpus, so callers never pay the N·k1 coarse scoring pass a
    * second time. */
  private[operators] final case class TwoLevelIndex(
      coarse: DataFrame, cells: DataFrame, coarseAssign: DataFrame)

  private[operators] def twoLevelCentroids(pts: DataFrame, nlist: Int,
                                           seed: Long): DataFrame =
    twoLevelIndex(pts, nlist, seed).cells.drop("coarse")

  private[operators] def twoLevelIndex(pts: DataFrame, nlist: Int,
                                       seed: Long): TwoLevelIndex = {
    val spark = pts.sparkSession
    import spark.implicits._
    // k1·k2 <= nlist ALWAYS: the cell count must not exceed the nominal
    // nlist, or nprobe = nlist stops being exhaustive and the
    // degenerates-to-exact contract (and its pins) breaks. The min
    // clamp covers nlist = 1 (k1 would floor to 2 and mint 2 cells).
    val k1 = math.min(nlist,
      math.max(2, math.floor(math.sqrt(nlist.toDouble)).toInt))
    val k2 = math.max(1, nlist / k1)
    // coarse fit runs DRIVER-LOCAL on the collected bounded sample
    // (same deterministic [[lloydFit]] the sub-fits and PQ codebooks
    // use): the sample is capped at 16384 rows regardless of corpus
    // size — the established bounded-fit-sample discipline — and an ML
    // KMeans over a coalesce(1) sample was single-threaded anyway
    // while paying one scheduler job PER ITERATION (the measured
    // d14/s04 fit overhead at gate SF; ~15 jobs for 10 iters)
    val coarseSample = pts.orderBy(col("id"))
      .limit(math.min(math.max(k1 * 64, 1024), 16384))
      .select(col("v")).as[Seq[Double]].collect().map(_.toArray)
    val cents = lloydFit(coarseSample, k1, seed)
    val coarseCentroids = cents.toSeq.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toDF("coarse", "ccent")
      .withColumn("ccn2", VectorOps.norm2(col("ccent")))
    // coarse assignment is a PURE PROJECTION (the Clustering.assignCell
    // shape): the k1 centroids are driver-local, so the argmin — same
    // -2·dot + |c|² metric, lowest index on ties via least() over
    // (d, c) structs — runs as a codegen'd column expression over
    // literal centroid arrays instead of the former N×k1 crossJoin +
    // min(struct) shuffle + re-join. |c|² is precomputed to a literal
    // (a norm2 over a literal array is NOT constant-folded — custom
    // expressions aren't foldable — and would re-evaluate per row).
    // NOT checkpointed: each consumer re-runs one scan + k1 dots per
    // row over the caller's (already checkpointed) corpus frame —
    // cheaper at any scale than materializing a second full copy of
    // the corpus WITH its vectors. Very large k1 degrades codegen to
    // interpreted eval but stays shuffle-free.
    val cn2s = cents.map(c => { var s = 0.0; var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }; s })
    val coarseOf: Column =
      if (cents.length == 1) lit(0)
      else least(cents.toSeq.zipWithIndex.map { case (arr, i) =>
        struct(
          (VectorOps.dot(col("v"), array(arr.toSeq.map(lit): _*)) *
            lit(-2.0) + lit(cn2s(i))).as("d"),
          lit(i).as("c"))
      }: _*).getField("c")
    val assigned = pts
      .select(col("id"), col("v"), coarseOf.as("coarse"))
    // bounded per-group sample BEFORE grouping, so no task ever holds a
    // whole coarse group — then one sub-fit task per group
    val wS = Window.partitionBy(col("coarse")).orderBy(col("id"))
    val sample = assigned
      .withColumn("srk", row_number().over(wS))
      .filter(col("srk") <= math.max(k2 * 64, 256))
      .select(col("coarse"), col("id"), col("v"))
    val cells = sample
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (coarse: Int, it: Iterator[(Int, Long, Seq[Double])]) =>
        val grp = it.toArray.sortBy(_._2).map(_._3.toArray)
        val kEff = math.min(k2, grp.length)
        lloydFit(grp, kEff, seed + 1 + coarse).zipWithIndex.iterator
          .map { case (c, j) => (coarse * k2 + j, coarse, c.toSeq) }
      }
      .toDF("cell", "coarse", "centroid")
      .withColumn("cn2", VectorOps.norm2(col("centroid")))
    TwoLevelIndex(coarseCentroids, cells,
      assigned.select(col("id"), col("coarse")))
  }

  /** [[ivfIndex]]'s shape (cells, centroids) built on the two-level
    * quantizer, with HIERARCHICAL assignment: each vector ranks the k1
    * coarse centroids, then only its chosen group's sub-centroids —
    * N·(k1+k2) scored pairs instead of N·nlist, and both argmins are
    * partial-aggregatable `min(struct(dist, id))` (no window sort of a
    * N·nlist frame). The standard multi-level-quantizer trade: a
    * boundary vector may land in a sub-cell that is not its GLOBAL
    * argmin cell — which shifts recall-at-defaults slightly (pinned),
    * and changes NOTHING about the exhaustive-probe==exact contract:
    * probing every cell covers the corpus regardless of which single
    * cell each vector sits in. */
  private[operators] def ivfIndexTwoLevel(corpus: DataFrame, nlist: Int,
                                          seed: Long): (DataFrame, DataFrame) = {
    val c0 = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
    val idx = twoLevelIndex(
      c0.select(col("neighbor_id").as("id"), col("cv").as("v")), nlist, seed)
    val subs = idx.cells.localCheckpoint(true) // assignment + probe ranking
    // the fit already scored every vector against the coarse level —
    // reuse its materialized (id, coarse) instead of recomputing N·k1
    val coarsePick = idx.coarseAssign.withColumnRenamed("id", "neighbor_id")
    val cellPick = c0.join(coarsePick, "neighbor_id")
      .join(broadcast(subs), "coarse")
      .withColumn("cdist",
        VectorOps.dot(col("cv"), col("centroid")) * lit(-2.0) + col("cn2"))
      .groupBy(col("neighbor_id"))
      .agg(min(struct(col("cdist"), col("cell"))).as("m"))
      .select(col("neighbor_id"), col("m.cell").as("cell"))
    val cells = c0.join(cellPick, "neighbor_id")
      .select(col("neighbor_id"), col("cv"), col("cell"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    (cells, subs.drop("coarse"))
  }

  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
             twoLevel: Boolean = false): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist)
    val (cells, centroids) =
      if (twoLevel) ivfIndexTwoLevel(corpus, nlist, seed)
      else ivfIndex(corpus, nlist, seed)
    val q = queries.select(col("vec_id").as("query_id"),
      VectorOps.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    // centroid ranking: argmin over |q|² − 2·q·c + |c|², and |q|² is
    // constant within a query's ranking — rank by (−2·q·c + |c|²)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("d2p",
        VectorOps.dot(col("qv"), col("centroid")) * lit(-2.0) + col("cn2"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2p"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    rankCandidates(probed.join(cells, Seq("cell")), k)
  }

  /** Build the IVF index ONCE into the warehouse (the vector-DB shape
    * [[graft.streaming.IngestDedup]] already proved for the LSH dedup
    * index): the assigned-cells table written PARTITIONED BY cell and
    * the centroid table beside it. Every later query batch loads both
    * and searches WITHOUT re-fitting — the fit cost (and its
    * determinism dials) is paid at index-build time, amortized over
    * every query until the corpus outgrows the quantizer (then
    * re-bucket, the v30 `rebucketIndex` precedent).
    *
    * Partitioning by cell is the point: [[ivfKnnFromIndex]] filters
    * the scan to the batch's probed cells on the PARTITION COLUMN, so
    * only those cells' files are listed and read — at a billion
    * vectors in 4096 cells, a 20-query batch probing 4 cells each
    * touches ≤80 partition directories, not the corpus
    * (`SimilaritySpec` pins the files-read metric). */
  def writeIvfIndex(corpus: DataFrame, indexDir: String, nlist: Int = 16,
                    seed: Long = 42L): Unit = {
    // Torn-rebuild protection (the v30 rebucketIndex meta-last
    // precedent): cells and centroids are two separate overwrites, and
    // a crash between them would pair NEW assignments with OLD
    // centroids — silently wrong neighbors. The commit marker is
    // deleted FIRST and written LAST, so any torn state has no marker
    // and [[ivfKnnFromIndex]] refuses loudly instead of searching it.
    val commit = new java.io.File(s"$indexDir/_graft_ivf_commit")
    if (commit.exists()) commit.delete()
    val (cells, centroids) = ivfIndexTwoLevel(corpus, nlist, seed)
    graft.sources.Warehouse.writePartitioned(cells, s"$indexDir/cells",
      Seq("cell"))
    centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/centroids")
    java.nio.file.Files.write(commit.toPath,
      s"nlist=$nlist seed=$seed".getBytes("UTF-8"))
  }

  /** Search a [[writeIvfIndex]] index: rank the stored centroids per
    * query (broadcast — nlist rows), probe `nprobe` cells through the
    * partition-column equi-join, exact cosine inside. No fit, no
    * corpus scan, bit-identical to [[ivfKnn]] with the same dials
    * (same quantizer output, same probe arithmetic — pinned).
    *
    * Partition pruning is EXPLICIT: the batch's probed-cell set
    * (bounded by nlist — the w09 file-list boundedness argument) is
    * collected and applied as a static IN filter on the partition
    * column, so the cells scan lists only probed cell= directories —
    * guaranteed, metric-pinned in SimilaritySpec. Dynamic partition
    * pruning was tried first and measured a no-op here: under AQE the
    * planted DPP filter degenerated to `dynamicpruningexpression
    * (true)` and the scan read every partition regardless of join
    * build side — right answer, zero pruning. A deterministic
    * metadata-cost filter beats a planner heuristic the operator
    * can't rely on. */
  def ivfKnnFromIndex(queries: DataFrame, indexDir: String, k: Int,
                      nprobe: Int = 4): DataFrame = {
    require(new java.io.File(s"$indexDir/_graft_ivf_commit").exists(),
      s"ivf index at $indexDir has no commit marker — a build crashed " +
        "between the cells and centroids writes (or never ran); " +
        "re-run writeIvfIndex before searching")
    val spark = queries.sparkSession
    val centroids = spark.read.parquet(s"$indexDir/centroids")
    val cells = spark.read.parquet(s"$indexDir/cells")
    val q = queries.select(col("vec_id").as("query_id"),
      VectorOps.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("d2p",
        VectorOps.dot(col("qv"), col("centroid")) * lit(-2.0) + col("cn2"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2p"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
      // materialized once: consumed by the cell-set pull AND the join
      .localCheckpoint(true)
    val probedCells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted // bounded by nlist
    val pruned = cells.filter(col("cell")
      .isin(probedCells.map(Int.box).toIndexedSeq: _*))
    // broadcast the probe frame ONLY when it provably fits: it carries
    // the query VECTORS (|queries|·nprobe rows × dim doubles), so a
    // million-query batch would OOM the driver under an unconditional
    // hint (the kCore size-conditional precedent) — past the envelope
    // the join falls back to a keyed shuffle of the pruned cells
    val probeRows = probed.count() // cheap: checkpointed above
    val hint: DataFrame => DataFrame =
      if (probeRows <= 200000L) broadcast else identity
    rankCandidates(hint(probed).join(pruned, Seq("cell")), k)
  }

  /** Int8 scalar quantization + exact re-rank — the memory/IO scale
    * path orthogonal to bucketing: the corpus is stored and SHUFFLED as
    * `array<tinyint>` (4× smaller than float32, 8× than the double
    * compute form), the coarse ranking runs on the quantized vectors,
    * and only the top `rerankFactor·k` candidates per query pay an
    * exact re-score against the full-precision vectors (fetched by id —
    * the wide doubles never enter the candidate-generation join).
    * Cosine is scale-invariant, so the shared global scale factor
    * cancels and the coarse scores differ from the true ones only by
    * int8 rounding — the re-rank buffer absorbs that (recall vs exact
    * pinned in SimilaritySpec).
    *
    * The global max|x| the scale derives from is a 1-row broadcast
    * (no driver action — the plan stays lazy); at 100 TB you would
    * compute it on a sample once and persist it with the index.
    *
    * NOTE: the coarse stage here is still O(queries × corpus) —
    * quantization cuts bytes per pair, not pair count. It is the
    * oracle-friendly baseline for the quantization semantics; the
    * 100 TB path is [[ivfSqKnn]], which runs the identical int8
    * scoring inside probed IVF cells (sub-linear candidates). */
  def quantized(emb: DataFrame, idAs: String): DataFrame = {
    val v = VectorOps.asDouble(col("embedding"))
    // greatest(…, ε): an all-zero corpus would otherwise scale by ∞ and
    // quantize to NaN→null instead of harmless zeros
    val maxAbs = emb
      .select(array_max(transform(v, x => abs(x))).as("m"))
      .agg(greatest(max(col("m")), lit(1e-30)).as("max_abs"))
    emb.crossJoin(broadcast(maxAbs))
      .select(
        col("vec_id").as(idAs),
        transform(v, x =>
          round(x * (lit(127.0) / col("max_abs"))).cast("tinyint")).as("qvec"))
  }

  def quantizedKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                   rerankFactor: Int = 4): DataFrame = {
    val q8 = quantized(queries, "query_id")
      .select(col("query_id"), VectorOps.asDouble(col("qvec")).as("qv8"))
      .withColumn("qn8", VectorOps.norm(col("qv8")))
    val c8 = quantized(corpus, "neighbor_id")
      .select(col("neighbor_id"), VectorOps.asDouble(col("qvec")).as("cv8"))
      .withColumn("cn8", VectorOps.norm(col("cv8")))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine8").desc, col("neighbor_id"))
    // zero-norm guard: a vector whose components all quantize to 0 has
    // cn8 = 0, and 0/0 = NaN sorts ABOVE every real cosine under desc —
    // unguarded, enough such vectors fill the whole re-rank buffer with
    // garbage for every query. Score them below any true cosine instead.
    val candidates = q8.join(c8, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine8",
        when(col("qn8") === 0.0 || col("cn8") === 0.0, lit(-2.0))
          .otherwise(
            VectorOps.dot(col("qv8"), col("cv8")) / (col("qn8") * col("cn8"))))
      .withColumn("crk", row_number().over(wCoarse))
      .filter(col("crk") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))
    // exact re-rank: true vectors join back by id — candidate-set-sized
    val q = queries.select(col("vec_id").as("query_id"),
      VectorOps.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    rankCandidates(candidates.join(q, Seq("query_id")).join(c, Seq("neighbor_id")), k)
  }

  /** IVF-SQ: int8 scalar quantization INSIDE IVF cells — the
    * composition that fixes [[quantizedKnn]]'s O(queries × corpus)
    * coarse stage. The corpus is partitioned into `nlist` k-means cells
    * once ([[ivfIndex]]); each query probes its `nprobe` nearest
    * centroids; the coarse int8 scoring then runs as a plain equi-join
    * on cell id — candidates are cell-bucketed, never all-pairs — and
    * only the top `rerankFactor·k` survivors per query pay the exact
    * full-precision re-score. This is the IVF-SQ layout of the public
    * inverted-file ANN literature: cells bound the candidates
    * (nprobe/nlist of the corpus per query), quantization bounds the
    * bytes each candidate costs (4× vs float32, 8× vs the double
    * compute form).
    *
    * Quantization scales are per-side 1-row broadcasts; cosine is
    * scale-invariant per vector pair, so independent query/corpus
    * scales cancel exactly and the coarse ranking differs from true
    * cosine only by int8 rounding — absorbed by the re-rank buffer
    * (recall vs exact pinned in SimilaritySpec). */
  def ivfSqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
               nlist: Int = 16, nprobe: Int = 4, rerankFactor: Int = 4,
               seed: Long = 42L): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist)
    val (cells, centroids) = ivfIndex(corpus, nlist, seed)

    def int8(v: Column, maxAbs: Column): Column =
      transform(v, x => round(x * (lit(127.0) / maxAbs)).cast("tinyint"))

    // quantized cell vectors: this is the frame the candidate join
    // shuffles — array<tinyint> payload, keyed by cell
    val cMax = cells
      .select(array_max(transform(col("cv"), x => abs(x))).as("m"))
      .agg(greatest(max(col("m")), lit(1e-30)).as("max_abs"))
    val c8 = cells.crossJoin(broadcast(cMax))
      .select(col("cell"), col("neighbor_id"),
        VectorOps.asDouble(int8(col("cv"), col("max_abs"))).as("cv8"))
      .withColumn("cn8", VectorOps.norm(col("cv8")))

    val q = queries.select(col("vec_id").as("query_id"),
      VectorOps.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val qMax = q
      .select(array_max(transform(col("qv"), x => abs(x))).as("m"))
      .agg(greatest(max(col("m")), lit(1e-30)).as("max_abs"))
    val q8 = q.crossJoin(broadcast(qMax))
      .select(col("query_id"),
        VectorOps.asDouble(int8(col("qv"), col("max_abs"))).as("qv8"))
      .withColumn("qn8", VectorOps.norm(col("qv8")))

    // probe: rank centroids per query (argmin |q−c|² = argmin −2q·c+|c|²,
    // |q|² constant within the query) — nlist-row broadcast, as ivfKnn
    val probed = q.select(col("query_id"), col("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2p",
        VectorOps.dot(col("qv"), col("centroid")) * lit(-2.0) + col("cn2"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2p"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("cell"))

    // coarse stage: equi-join on cell — the int8 scoring only ever sees
    // (query, probed-cell-member) pairs. Zero-norm guard as quantizedKnn.
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine8").desc, col("neighbor_id"))
    val candidates = probed
      .join(q8, Seq("query_id"))
      .join(c8, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine8",
        when(col("qn8") === 0.0 || col("cn8") === 0.0, lit(-2.0))
          .otherwise(
            VectorOps.dot(col("qv8"), col("cv8")) / (col("qn8") * col("cn8"))))
      .withColumn("crk", row_number().over(wCoarse))
      .filter(col("crk") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))

    // exact re-rank: full-precision vectors join back by id —
    // candidate-set-sized, the wide doubles never entered the coarse join
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    rankCandidates(
      candidates.join(q.select(col("query_id"), col("qv"), col("qn")), Seq("query_id"))
        .join(c, Seq("neighbor_id")), k)
  }

  // ---------------------------------------------------------------------------
  // Product quantization (PQ-ADC)
  // ---------------------------------------------------------------------------

  /** Unit-normalize with a zero-norm guard (zero vectors stay zero,
    * instead of going NaN and poisoning every downstream argmin). */
  private def unitize(v: Column, n: Column): Column =
    when(n > 0.0, transform(v, x => x / n)).otherwise(v)

  /** Per-subspace k-means codebooks for product quantization: `m`
    * codebooks of `ksub` centroids, each over a dim/m slice of the
    * UNIT-NORMALIZED vector (so squared-L2 ADC ranks like cosine:
    * ‖a−b‖² = 2 − 2·cos on the unit sphere). The fit follows
    * [[ivfIndex]]'s determinism recipe — id-ordered bounded sample,
    * fixed per-subspace seed, in-driver [[lloydFit]] — so the codebooks
    * (and every code derived from them) are identical across runs and
    * partitionings. Returns codebooks(s)(j) = centroid j of subspace
    * s; subspace width is dim/m. */
  private[operators] def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                                     seed: Long): Array[Array[Array[Double]]] = {
    val probed = corpus.select(size(col("embedding")).as("d"))
      .filter(col("d").isNotNull).head(1)
    val dim = if (probed.isEmpty) m else probed(0).getInt(0)
    require(dim % m == 0, s"dim $dim does not divide into $m subspaces")
    val dsub = dim / m
    // ONE bounded collect of the id-ordered unit-normalized sample; the
    // m per-subspace fits then run as in-driver Lloyd iterations over
    // slices of it. Fitting each subspace as a separate ML KMeans job
    // costed m × ~20 scheduler round-trips on a ≤1024-row frame —
    // measured as ~10 of s09's 12.8 s at sf0.1 — for work that is
    // ~20M flops. The sample stays deliberately bounded (the d14
    // fit-sample lesson: never let the fit grow with the corpus); past
    // ~10⁵ sample rows the deployed form is the distributed fit, as the
    // ivfIndex doc already prescribes.
    val sample: Array[Array[Double]] = corpus
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
      .withColumn("nv", unitize(col("cv"), col("cn")))
      .orderBy(col("vec_id"))
      .limit(math.max(ksub * 64, 1024))
      .select(col("nv")).collect()
      .map(_.getSeq[Double](0).toArray)
    (0 until m).toArray.map { s =>
      lloydFit(sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub)),
        ksub, seed + s)
    }
  }

  /** Deterministic in-driver Lloyd's over a bounded sample: seeded
    * distinct-point init, fixed iterations, argmin ties to the lowest
    * centroid index, an emptied centroid keeps its previous value.
    * Iteration order over the (id-ordered) sample is fixed, so the
    * result is identical across runs and partitionings. */
  private def lloydFit(pts: Array[Array[Double]], k: Int,
                       seed: Long, iters: Int = 10): Array[Array[Double]] = {
    require(pts.nonEmpty, "empty codebook fit sample")
    val dim = pts(0).length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(pts.indices.toVector).take(k)
    val cents = Array.tabulate(k)(i =>
      pts(init(i % init.length)).clone)
    val sums = Array.fill(k)(new Array[Double](dim))
    val cnts = new Array[Long](k)
    for (_ <- 0 until iters) {
      java.util.Arrays.fill(cnts, 0L)
      sums.foreach(java.util.Arrays.fill(_, 0.0))
      pts.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = p(j) - cents(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        cnts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (cnts(c) > 0) {
          var j = 0
          while (j < dim) { cents(c)(j) = sums(c)(j) / cnts(c); j += 1 }
        }
        c += 1
      }
    }
    cents
  }

  /** Distance-to-centroid ranking term for one literal centroid:
    * −2·x·c + ‖c‖² (the ‖x‖² term is constant across a subspace's
    * codes and dropped). Shared by the encode argmin and the query
    * lookup tables, so both sides score against bit-identical
    * expressions. */
  private def pqScore(sub: Column, cj: Array[Double]): Column =
    VectorOps.dot(sub, array(cj.map(lit).toIndexedSeq: _*)) * lit(-2.0) +
      lit(cj.map(x => x * x).sum)

  /** Replace every vector by its `m` codebook codes `__c0..__c{m-1}`
    * (argmin squared distance per subspace, least-index tiebreak via
    * array_position's first-match semantics). Each subvector is
    * materialized through a projection once; the per-code scoring then
    * reads a plain column (the HOF-recompute rule). The output frame
    * is (id, m small ints) — the wide doubles never leave the encode
    * projection, which is the point: this is the frame the pair scan
    * streams. */
  private def pqEncode(emb: DataFrame, idAs: String,
                       cb: Array[Array[Array[Double]]]): DataFrame = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val subs = emb
      .select(col("vec_id").as(idAs),
        VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
      .withColumn("nv", unitize(col("cv"), col("cn")))
      .select((col(idAs) +: (0 until m).map(s =>
        slice(col("nv"), s * dsub + 1, dsub).as(s"__sub$s"))): _*)
    subs.select((col(idAs) +: (0 until m).map { s =>
      val scores = array(cb(s).toIndexedSeq.map(cj =>
        pqScore(col(s"__sub$s"), cj)): _*)
      (array_position(scores, array_min(scores)) - 1)
        .cast("int").as(s"__c$s")
    }): _*)
  }

  /** Per-query ADC lookup tables against shared codebooks:
    * __lut{s}[j] = −2·q_s·c_{s,j} + ‖c_{s,j}‖² (‖q_s‖² is constant
    * within a query's ranking and dropped). Carries qv/qn alongside so
    * the exact re-rank tail can join back without re-deriving them. */
  private def pqLuts(queries: DataFrame,
                     cb: Array[Array[Array[Double]]]): DataFrame = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val q = queries.select(col("vec_id").as("query_id"),
      VectorOps.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
      .withColumn("nv", unitize(col("qv"), col("qn")))
      .select((Seq(col("query_id"), col("qv"), col("qn")) ++
        (0 until m).map(s =>
          slice(col("nv"), s * dsub + 1, dsub).as(s"__sub$s"))): _*)
    q.select(
      (Seq(col("query_id"), col("qv"), col("qn")) ++ (0 until m).map { s =>
        array(cb(s).toIndexedSeq.map(cj =>
          pqScore(col(s"__sub$s"), cj)): _*).as(s"__lut$s")
      }): _*)
  }

  /** The ADC distance: m fixed-order lookups summed — expects the
    * __lut{s} columns from [[pqLuts]] and the __c{s} codes from
    * [[pqEncode]] on the same row. */
  private def adcExpr(m: Int): Column =
    (0 until m).map(s =>
      element_at(col(s"__lut$s"), col(s"__c$s") + 1)).reduce(_ + _)

  /** PQ-ADC kNN: the query stays full precision, every corpus vector
    * is replaced by its m codebook codes, and each scored pair costs m
    * table lookups into the query's per-subspace lookup tables (built
    * once per query against the shared codebooks: lut_s[j] =
    * −2·q_s·c_{s,j} + ‖c_{s,j}‖²). This is [[quantizedKnn]]'s
    * compression story taken further — 64 doubles (512 B) per corpus
    * vector become m=8 ints, a ~64× shrink of the frame the pair loop
    * streams, and the per-pair FLOPs drop from a dim-wide dot to m adds
    * — and like s06 it is an all-pairs scan BY DESIGN: PQ cuts bytes
    * and FLOPs per pair, not pair count. Cell pruning is IVF's job
    * ([[ivfSqKnn]]); composing the two (IVF-PQ) drops this ADC
    * expression into the cell-bucketed candidate join unchanged.
    *
    * The top rerankFactor·k ADC survivors per query pay an exact
    * full-precision cosine re-rank ([[rankCandidates]]), which absorbs
    * quantization error. Recall vs exact at defaults is pinned in
    * SimilaritySpec; rerank depth ≥ corpus degenerates to exact brute
    * force (also pinned). */
  def pqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
            m: Int = 8, ksub: Int = 32, rerankFactor: Int = 8,
            seed: Long = 42L): DataFrame = {
    require(m >= 1 && ksub >= 1 && rerankFactor >= 1)
    val cb = pqCodebooks(corpus, m, ksub, seed)
    val codes = pqEncode(corpus, "neighbor_id", cb)
    val luts = pqLuts(queries, cb)

    // coarse ADC scan: narrow LUT side × narrow code side; the adc sum
    // is a fixed-order chain of m lookups, deterministic per pair
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc"), col("neighbor_id"))
    val candidates = luts
      .select((col("query_id") +: (0 until m).map(s => col(s"__lut$s"))): _*)
      .join(codes, col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adcExpr(m))
      .withColumn("crk", row_number().over(wCoarse))
      .filter(col("crk") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))

    // exact re-rank: full-precision vectors join back by id —
    // candidate-set-sized, as the other ANN tails
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    rankCandidates(
      candidates
        .join(luts.select(col("query_id"), col("qv"), col("qn")), Seq("query_id"))
        .join(c, Seq("neighbor_id")), k)
  }

  /** IVF-PQ: the inverted-file/product-quantization composition the
    * large-scale ANN literature deploys — IVF's k-means cells bound the
    * pair COUNT (each query meets only its nprobe probed cells' members,
    * through a cell equi-join, never all-pairs), PQ's codes bound the
    * pair COST (m lookups over an m-int frame instead of a dim-wide dot
    * over 512 B of doubles). [[ivfSqKnn]] composed cells with int8
    * rows; this swaps the int8 coarse scoring for the ADC expression —
    * which drops into the cell-bucketed candidate join unchanged, as
    * promised at [[pqKnn]]. The codebooks here are global (fit on the
    * unit-normalized corpus, not per-cell residuals): residual PQ buys
    * accuracy when cells are tight, but costs a per-cell codebook
    * broadcast; at these cell counts the exact re-rank buffer absorbs
    * the difference (recall floor pinned in SimilaritySpec).
    *
    * Exhaustive probe (nprobe = nlist) + a corpus-deep re-rank buffer
    * degenerates to exact brute force — pinned, as s07. */
  def ivfPqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
               nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 32,
               rerankFactor: Int = 8, seed: Long = 42L): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist)
    val (cells, centroids) = ivfIndex(corpus, nlist, seed)
    val cb = pqCodebooks(corpus, m, ksub, seed)
    // the candidate-join payload: (cell, id, m codes) — cell keys the
    // shuffle, the codes are all the coarse stage ever reads
    val codes = pqEncode(corpus, "neighbor_id", cb)
      .join(cells.select(col("neighbor_id"), col("cell")), Seq("neighbor_id"))
    val luts = pqLuts(queries, cb)

    // probe: rank centroids per query — nlist-row broadcast, as ivfKnn
    val probed = luts.select(col("query_id"), col("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2p",
        VectorOps.dot(col("qv"), col("centroid")) * lit(-2.0) + col("cn2"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d2p"), col("cell"))))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("cell"))

    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc"), col("neighbor_id"))
    val candidates = probed
      .join(luts.select((col("query_id") +:
        (0 until m).map(s => col(s"__lut$s"))): _*), Seq("query_id"))
      .join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adc", adcExpr(m))
      .withColumn("crk", row_number().over(wCoarse))
      .filter(col("crk") <= k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))

    val c = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    rankCandidates(
      candidates
        .join(luts.select(col("query_id"), col("qv"), col("qn")), Seq("query_id"))
        .join(c, Seq("neighbor_id")), k)
  }

  /** Shared exact-rerank tail of every ANN path: drop self-pairs, score
    * candidates by true cosine, keep the top-k per query under the
    * (cosine desc, neighbor_id) total order. Expects columns
    * query_id/qv/qn on the query side and neighbor_id/cv/cn on the
    * candidate side. */
  private def rankCandidates(cands: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cands.filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
  }

  // ---------------------------------------------------------------------------
  // Hybrid retrieval (lexical + vector, reciprocal-rank fusion)
  // ---------------------------------------------------------------------------

  /** Exact token-set-Jaccard top-k per query document — the lexical
    * side of hybrid retrieval. One distinct (doc, token) posting frame
    * per side, one equi-join on the token (the d02 posting-list shape:
    * sub-quadratic because only docs sharing a token ever meet), one
    * count aggregate, then a per-query rank. Jaccard is an exact
    * integer ratio, so ranks are engine-stable with the neighbor-id
    * tiebreak. At 100 TB the corpus side gets the d08 hot-token cap
    * (drop stopword-grade tokens from the posting join) — recall is
    * unaffected for ranking purposes because a token shared by half
    * the corpus carries no discriminative weight. */
  def tokenJaccardKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    def postings(df: DataFrame, idAs: String) = df
      .select(col("doc_id").as(idAs),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
    def sizes(df: DataFrame, idAs: String, nAs: String) = df
      .select(col("doc_id").as(idAs),
        size(array_distinct(split(col("text"), " "))).as(nAs))
    val inter = postings(queries, "query_id")
      .join(postings(corpus, "neighbor_id"), Seq("tok"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(sizes(queries, "query_id", "qn"), Seq("query_id"))
      .join(sizes(corpus, "neighbor_id", "cn"), Seq("neighbor_id"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("qn") + col("cn") - col("inter")).cast("double"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("jaccard").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
  }

  /** Reciprocal-rank fusion of two (query_id, rk, neighbor_id)
    * rankings: score = Σ 1/(c + rank) over the lists the candidate
    * appears in (the standard RRF constant c = 60). A full-outer join
    * on (query, candidate) keeps single-list candidates; the fused
    * ranks are integer-derived doubles, so the result hash-gates.
    * Scale: both inputs are already top-k-per-query (bounded), so the
    * join and the final rank window touch k·|queries| rows, never the
    * corpus. */
  def rrfFuse(vector: DataFrame, lexical: DataFrame, k: Int,
              c: Int = 60): DataFrame = {
    val v = vector.withColumnRenamed("rk", "vrk")
    val l = lexical.withColumnRenamed("rk", "lrk")
    val fused = v.join(l, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("score",
        coalesce(lit(1.0) / (lit(c) + col("vrk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("lrk")), lit(0.0)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    fused
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
  }

  // ---------------------------------------------------------------------------
  // Gate queries
  // ---------------------------------------------------------------------------

  /** Exact top-5 for the first 20 vectors. Rank-only output: ids are
    * integers, so the hash compare is immune to last-ulp cosine noise. */
  def s01KnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    bruteForceKnn(emb.filter(col("vec_id") < 20), emb, 5)
      .orderBy(col("query_id"), col("rk"))
  }

  val s01Sql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
      |      FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |         list_cosine_similarity(qv, cv) AS cosine
      |  FROM q JOIN c ON query_id <> neighbor_id)
      |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |             ORDER BY cosine DESC, neighbor_id) AS rk
      |      FROM scored) t
      |WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** LSH-bucketed ANN for the same queries (approximate → rows-only
    * gate; recall vs s01 pinned in ScalaTest). Full hamming-1
    * multi-probe: the corpus here is small relative to bucket count, so
    * probing buys recall at negligible candidate cost. */
  def s02KnnAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    annKnn(emb.filter(col("vec_id") < 20), emb, 5, multiProbe = 8)
      .orderBy(col("query_id"), col("rk"))
  }

  /** IVF ANN for the same queries (k-means quantizer is
    * engine-specific → rows-only gate; exhaustive-probe == exact and
    * recall-at-default pinned in SimilaritySpec). Round 9: the gate
    * runs on the TWO-LEVEL quantizer ([[twoLevelCentroids]]) — the
    * form whose fit stays distributed past ~10⁵ cells; probe and
    * rerank plumbing identical by construction. */
  def s04KnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    ivfKnn(emb.filter(col("vec_id") < 20), emb, 5, twoLevel = true)
      .orderBy(col("query_id"), col("rk"))
  }

  /** s17 — the same search as s04, but from a PERSISTED index: built
    * once into a warehouse directory ([[writeIvfIndex]]), then searched
    * with no fit and no corpus scan ([[ivfKnnFromIndex]]) — the
    * build-once/query-many lifecycle every real vector store runs.
    * Rows-only like s04 (the quantizer is engine-specific);
    * SimilaritySpec pins the round trip bit-identical to the in-memory
    * s04 path, full-probe-from-index == exact, and the EXPLICIT
    * probed-cell partition pruning on the files-read METRIC (one probe
    * reads one of 16 partition files — never a plan-string pin; see
    * [[ivfKnnFromIndex]] for why DPP was rejected). */
  def s17KnnIvfPersisted(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_s17").toString
    try {
      val emb = Tables.embeddings(spark, dir)
      writeIvfIndex(emb, base)
      ivfKnnFromIndex(emb.filter(col("vec_id") < 20), base, 5)
        .orderBy(col("query_id"), col("rk"))
        .localCheckpoint() // materialize before the staging is deleted
    } finally {
      val gone = new scala.reflect.io.Directory(new java.io.File(base))
        .deleteRecursively()
      if (!gone) System.err.println(s"[s17] temp dir not fully removed: $base")
    }
  }

  /** Corpus bucket histogram (rows-only; exercises the bucketing shape
    * that the 100 TB path shuffles on). */
  def s03AnnBucketProfile(spark: SparkSession, dir: String): DataFrame =
    annBuckets(Tables.embeddings(spark, dir))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("vec_count"))
      .orderBy(col("bucket"))

  /** s05 — IVF index health: per cell, population and mean
    * centroid-distance (rows-only: the quantizer is engine-specific).
    * The balance numbers are what an operator tunes nlist/nprobe by —
    * one empty or monster cell means the probe budget is mis-spent.
    * Mean distance goes through a decimal cast so the profile stays
    * bit-identical across thread counts (double averaging is
    * partition-order-dependent). */
  def s05IvfCellProfile(spark: SparkSession, dir: String): DataFrame = {
    val (cells, centroids) = ivfIndex(Tables.embeddings(spark, dir), 16, 42L)
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val D8 = DecimalType(18, 8)
    cells.join(broadcast(centroids), Seq("cell"))
      .withColumn("dist",
        sqrt(greatest(
          col("cn") * col("cn") -
            VectorOps.dot(col("cv"), col("centroid")) * lit(2.0) + col("cn2"),
          lit(0.0))))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("vec_count"),
        (sum(col("dist").cast(D8)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("avg_centroid_dist"))
      .orderBy(col("cell"))
  }

  /** s06 — int8-quantized kNN for the same queries (quantization is a
    * lossy engine choice → rows-only gate; recall vs s01 pinned in
    * SimilaritySpec). */
  def s06KnnQuantized(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    quantizedKnn(emb.filter(col("vec_id") < 20), emb, 5)
      .orderBy(col("query_id"), col("rk"))
  }

  /** s07 — IVF-SQ kNN for the same queries (k-means quantizer +
    * int8 rounding are engine-specific → rows-only gate; exhaustive
    * probe + deep re-rank == exact and recall-at-default pinned in
    * SimilaritySpec, along with the cell-bucketed-join plan assert). */
  def s07KnnIvfSq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    ivfSqKnn(emb.filter(col("vec_id") < 20), emb, 5)
      .orderBy(col("query_id"), col("rk"))
  }

  /** s09 — PQ-ADC kNN for the same queries (the codebooks are an
    * engine-specific lossy choice → rows-only gate; exactness under a
    * corpus-deep re-rank and recall at defaults are pinned in
    * SimilaritySpec). */
  def s09KnnPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    pqKnn(emb.filter(col("vec_id") < 20), emb, 5)
      .orderBy(col("query_id"), col("rk"))
  }

  /** s10 — IVF-PQ kNN for the same queries (quantizer + codebooks are
    * engine-specific → rows-only gate; exhaustive-probe + deep-re-rank
    * == exact, recall floor, and the cell-bucketed plan are pinned in
    * SimilaritySpec). */
  def s10KnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    ivfPqKnn(emb.filter(col("vec_id") < 20), emb, 5)
      .orderBy(col("query_id"), col("rk"))
  }

  /** s08 — hybrid retrieval, hash-gated: the s01 query set ranked by
    * BOTH modalities (cosine over `embeddings`, token-set Jaccard over
    * the same ids in `documents` — the fixtures share the 0..499 id
    * domain) and fused by reciprocal rank. Candidate depth 20 per side,
    * final top-5. The vector side ranks on round(cosine, 9) so the
    * rank lists — and therefore the integer-only output — are
    * bit-stable across engines; Jaccard and RRF scores are exact
    * integer ratios already. */
  def s08HybridKnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val docs = Tables.documents(spark, dir)
    val vector = bruteForceKnn(emb.filter(col("vec_id") < 20), emb, 20,
      roundCosineTo = 9)
    val lexical = tokenJaccardKnn(docs.filter(col("doc_id") < 20), docs, 20)
    rrfFuse(vector, lexical, 5)
      .orderBy(col("query_id"), col("rk"))
  }

  val s08Sql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
      |      FROM embeddings),
      |v AS (
      |  SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      |           PARTITION BY query_id
      |           ORDER BY ROUND(list_cosine_similarity(qv, cv), 9) DESC,
      |                    neighbor_id) AS vrk
      |  FROM q JOIN c ON query_id <> neighbor_id
      |  QUALIFY vrk <= 20),
      |qt AS (SELECT DISTINCT doc_id AS query_id,
      |         unnest(string_split(text, ' ')) AS tok
      |       FROM documents WHERE doc_id < 20),
      |ct AS (SELECT DISTINCT doc_id AS neighbor_id,
      |         unnest(string_split(text, ' ')) AS tok
      |       FROM documents),
      |qn AS (SELECT query_id, COUNT(*) AS qn FROM qt GROUP BY query_id),
      |cn AS (SELECT neighbor_id, COUNT(*) AS cn FROM ct GROUP BY neighbor_id),
      |inter AS (
      |  SELECT query_id, neighbor_id, COUNT(*) AS i
      |  FROM qt JOIN ct USING (tok)
      |  WHERE query_id <> neighbor_id
      |  GROUP BY query_id, neighbor_id),
      |l AS (
      |  SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
      |           PARTITION BY query_id
      |           ORDER BY CAST(i AS DOUBLE) / (qn + cn - i) DESC,
      |                    neighbor_id) AS lrk
      |  FROM inter JOIN qn USING (query_id) JOIN cn USING (neighbor_id)
      |  QUALIFY lrk <= 20),
      |fused AS (
      |  SELECT COALESCE(v.query_id, l.query_id) AS query_id,
      |         COALESCE(v.neighbor_id, l.neighbor_id) AS neighbor_id,
      |         COALESCE(CAST(1.0 AS DOUBLE) / (60 + vrk), 0.0)
      |           + COALESCE(CAST(1.0 AS DOUBLE) / (60 + lrk), 0.0) AS score
      |  FROM v FULL OUTER JOIN l
      |    ON v.query_id = l.query_id AND v.neighbor_id = l.neighbor_id)
      |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |             ORDER BY score DESC, neighbor_id) AS rk
      |      FROM fused) t
      |WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** Filtered exact kNN under a categorical predicate: each query
    * searches only corpus vectors sharing its `label` — "vector search
    * within a domain/tenant", the filter shape every production vector
    * store supports. The filter is applied AS THE JOIN KEY, which is
    * the whole scale point: the all-pairs cross of [[bruteForceKnn]]
    * (N·Q pairs) becomes a label-blocked equi-join (Σ_l n_l·q_l pairs)
    * that shuffles both sides on label — with 10 balanced labels
    * that's 10× fewer candidate pairs, and at 100 TB the blocks are
    * the unit of parallelism. No post-filtering of an unfiltered ANN
    * result (which under-fills k when the filter is selective). */
  def sameLabelKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("label"),
      VectorOps.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("label"),
      VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    val scored = q.join(c, Seq("label"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
  }

  /** s12 — filtered search gate: the s01 query set restricted to
    * same-label neighbors; rank-only integer output on round-9 cosine
    * (the s08 bit-stability discipline) → hash-gated. */
  def s12KnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    sameLabelKnn(emb.filter(col("vec_id") < 20), emb, 5)
      .orderBy(col("query_id"), col("rk"))
  }

  val s12Sql: String =
    """WITH q AS (SELECT vec_id AS query_id, label, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS cv
      |      FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |         ROUND(list_cosine_similarity(qv, cv), 9) AS cosine
      |  FROM q JOIN c USING (label)
      |  WHERE query_id <> neighbor_id)
      |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |             ORDER BY cosine DESC, neighbor_id) AS rk
      |      FROM scored) t
      |WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  // -- MMR diversified retrieval ---------------------------------------------

  /** Maximal-marginal-relevance diversified top-k: greedily select
    * argmax λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s) from a bounded
    * relevance pool — the retrieval step that returns k RESULTS, not k
    * near-duplicates of the best result (the dedup-aware flavor of
    * retrieval a curation pipeline wants for eval mining and few-shot
    * selection).
    *
    * Distributed shape: the pool is the [[bruteForceKnn]] join +
    * window (top poolFactor·k per query by relevance — at deployment
    * scale, any of the s02–s10 ANN paths produces the same
    * (query, candidate, rel, vector) frame); the greedy selection then
    * runs per query over ≤ poolFactor·k rows inside one
    * `flatMapGroups` — O(k·pool·dim) work on ~20 rows, no cross-query
    * state, no driver involvement.
    *
    * Determinism pact (what makes s11 HASH-gateable, not rows-only):
    * every arithmetic step is order-fixed — rel comes from the
    * engine-side sequential dot, candidate×selected cosines run
    * sequentially over dims in selection order, the MMR combination is
    * the literal λ·rel − (1−λ)·msim, and every argmax breaks ties by
    * lowest id. DuckDB replays the identical selection as an unrolled
    * per-step CTE chain (anti-join exclusion + MAX-over-selected +
    * struct-min argmax), so the gate pins every pick of every step. */
  def mmrKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             lambdaRel: Double = 0.7, poolFactor: Int = 4): DataFrame = {
    import corpus.sparkSession.implicits._
    val q = queries.select(col("vec_id").as("query_id"),
      VectorOps.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      VectorOps.asDouble(col("embedding")).as("cv"))
      .withColumn("cn", VectorOps.norm(col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("neighbor_id"))
    val pool = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("rel",
        VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k * poolFactor)
      .select(col("query_id"), col("neighbor_id"), col("rel"),
        col("cv"), col("cn"))
    pool.as[(Long, Long, Double, Seq[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // rel-desc/id-asc order fixes the iteration (and thus float
        // accumulation) order regardless of upstream partitioning
        val cand = it.toArray.sortBy(r => (-r._3, r._2))
        val vecs = cand.map(_._4.toArray)
        val chosen = new Array[Boolean](cand.length)
        // msim is the TRUE running max of cos(candidate, selected) —
        // which can be negative; only an EMPTY selected set maps to a
        // zero penalty (the oracle's COALESCE(MAX(...), 0.0)). Seeding
        // at 0.0 would silently floor negative similarities and
        // under-penalize nothing / over-score diverse picks.
        val msim = Array.fill(cand.length)(Double.NegativeInfinity)
        (1 to math.min(k, cand.length)).iterator.map { rank =>
          var best = -1; var bestScore = 0.0; var bestId = Long.MaxValue
          var i = 0
          while (i < cand.length) {
            if (!chosen(i)) {
              val pen = if (msim(i) == Double.NegativeInfinity) 0.0 else msim(i)
              val s = lambdaRel * cand(i)._3 - (1.0 - lambdaRel) * pen
              if (best < 0 || s > bestScore ||
                (s == bestScore && cand(i)._2 < bestId)) {
                best = i; bestScore = s; bestId = cand(i)._2
              }
            }
            i += 1
          }
          chosen(best) = true
          var j = 0
          while (j < cand.length) {
            if (!chosen(j)) {
              var d = 0.0; var t = 0
              val bv = vecs(best)
              while (t < bv.length) { d += vecs(j)(t) * bv(t); t += 1 }
              val cos = d / (cand(j)._5 * cand(best)._5)
              if (cos > msim(j)) msim(j) = cos
            }
            j += 1
          }
          (qid, rank, cand(best)._2, bestScore)
        }
      }
      .toDF("query_id", "mmr_rank", "neighbor_id", "mmr_score")
      .select(col("query_id"), col("mmr_rank"), col("neighbor_id"),
        round(col("mmr_score"), 6).as("mmr_score_r"))
      .orderBy(col("query_id"), col("mmr_rank"))
  }

  /** s11 — MMR top-5 from a 20-deep pool for the s01 query set. */
  def s11KnnMmr(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    mmrKnn(emb.filter(col("vec_id") < 20), emb, 5)
  }

  /** Generated DuckDB twin of s11: sel{i} is the selected set after
    * step i (with vectors riding along for the next step's
    * max-similarity), m{i} scores the not-yet-selected pool rows, and
    * the struct-min picks the (score desc, id asc) argmax.
    * MATERIALIZED per step — the chain re-expands exponentially
    * otherwise (the t17 lesson). */
  val s11Sql: String = {
    val k = 5; val pool = 20
    // (1 - 0.7) in IEEE is 0.30000000000000004, NOT the double nearest
    // 0.3 — the oracle must perform the same subtraction the Scala
    // side's (1.0 - lambdaRel) does, not parse a 0.3 literal
    val lam = "CAST(0.7 AS DOUBLE)"
    val oneMinus = "(CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE))"
    val steps = (1 to k).map { i =>
      val prev = if (i == 1) "sel0" else s"sel${i - 1}"
      s"""m$i AS (
         |  SELECT p.query_id, p.neighbor_id, p.rel,
         |         $lam * p.rel - $oneMinus * COALESCE(MAX(
         |           list_inner_product(p.cv, s.cv) / (p.cn * s.cn)), 0.0)
         |           AS score
         |  FROM (SELECT p0.* FROM pool p0
         |        ANTI JOIN $prev x
         |          ON p0.query_id = x.query_id
         |         AND p0.neighbor_id = x.neighbor_id) p
         |  LEFT JOIN $prev s ON p.query_id = s.query_id
         |  GROUP BY p.query_id, p.neighbor_id, p.rel),
         |pick$i AS (
         |  SELECT query_id,
         |         (MIN({'s': -score, 'id': neighbor_id})).id AS neighbor_id,
         |         -((MIN({'s': -score, 'id': neighbor_id})).s) AS score
         |  FROM m$i GROUP BY query_id),
         |sel$i AS MATERIALIZED (
         |  SELECT * FROM $prev
         |  UNION ALL
         |  SELECT p.query_id, p.neighbor_id, $i AS step, k.score, p.cv, p.cn
         |  FROM pick$i k JOIN pool p
         |    ON k.query_id = p.query_id AND k.neighbor_id = p.neighbor_id)""".stripMargin
    }
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
       |      FROM embeddings),
       |pool AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT q.query_id, c.neighbor_id,
       |           list_inner_product(q.qv, c.cv) /
       |             (sqrt(list_inner_product(q.qv, q.qv)) *
       |              sqrt(list_inner_product(c.cv, c.cv))) AS rel,
       |           c.cv,
       |           sqrt(list_inner_product(c.cv, c.cv)) AS cn,
       |           row_number() OVER (PARTITION BY q.query_id
       |             ORDER BY list_inner_product(q.qv, c.cv) /
       |               (sqrt(list_inner_product(q.qv, q.qv)) *
       |                sqrt(list_inner_product(c.cv, c.cv))) DESC,
       |               c.neighbor_id) AS rk
       |    FROM q JOIN c ON q.query_id <> c.neighbor_id)
       |  WHERE rk <= $pool),
       |sel0 AS (
       |  SELECT query_id, neighbor_id, 0 AS step, rel AS score, cv, cn
       |  FROM pool WHERE 1 = 0),
       |${steps.mkString(",\n")}
       |SELECT query_id, CAST(step AS INT) AS mmr_rank, neighbor_id,
       |       ROUND(score, 6) AS mmr_score_r
       |FROM sel$k
       |ORDER BY query_id, mmr_rank""".stripMargin
  }

  /** Symmetric mutual-kNN pairs from ANY (query_id, rk, neighbor_id)
    * top-k ranking: a pair survives iff each endpoint ranks the other
    * inside ITS OWN top-k — the standard noise filter when turning an
    * asymmetric kNN answer into a graph (a hub that everyone ranks but
    * that ranks nobody back contributes no edges). One self-equi-join
    * of the ranking with its column-swapped image on (src, dst) —
    * both sides are already top-k-per-query (k·N rows), so the join
    * never touches the corpus and the operator composes with any
    * candidate generator: the exact ranking here, the s04 IVF path at
    * 100 TB (same downstream by construction). */
  def mutualKnn(knn: DataFrame): DataFrame = {
    val fwd = knn.select(col("query_id").as("src"),
      col("neighbor_id").as("dst"), col("rk").as("rk_ab"))
    val rev = knn.select(col("neighbor_id").as("src"),
      col("query_id").as("dst"), col("rk").as("rk_ba"))
    fwd.join(rev, Seq("src", "dst"))
      .filter(col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"),
        col("rk_ab"), col("rk_ba"))
  }

  /** s13 — the mutual-kNN graph over the WHOLE corpus (every vector a
    * query, k = 5), hash-gated: integer-only output, ranks built on
    * round(cosine, 9) so the rank lists are bit-stable across engines
    * (the s08 convention; boundary caveat at the top of this file).
    * The exact all-pairs candidate stage is the GATE-ORACLE form, by
    * declaration — the deployment form is s15 (the same mutual filter
    * over IVF candidates, measured 9× faster at x100 in
    * dev/scaling.md); this query exists so s15 has an exact graph to
    * be judged against. */
  def s13MutualKnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    mutualKnn(bruteForceKnn(emb, emb, 5, roundCosineTo = 9))
      .orderBy(col("id_a"), col("id_b"))
  }

  val s13Sql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
      |knn AS (
      |  SELECT a.vec_id AS q, b.vec_id AS n,
      |         ROW_NUMBER() OVER (PARTITION BY a.vec_id
      |           ORDER BY ROUND(list_cosine_similarity(a.ev, b.ev), 9) DESC,
      |                    b.vec_id) AS rk
      |  FROM v a JOIN v b ON a.vec_id <> b.vec_id
      |  QUALIFY rk <= 5)
      |SELECT f.q AS id_a, f.n AS id_b,
      |       CAST(f.rk AS INT) AS rk_ab, CAST(r.rk AS INT) AS rk_ba
      |FROM knn f JOIN knn r ON r.q = f.n AND r.n = f.q
      |WHERE f.q < f.n
      |ORDER BY id_a, id_b""".stripMargin

  /** Negatives per anchor in the s14 gate (mirrored in [[s14Sql]]). */
  val negativesPerAnchor = 3

  /** s14 — contrastive training-pair mining: for every embedding, its
    * nearest neighbor as the POSITIVE and [[negativesPerAnchor]]
    * deterministic pseudo-random NEGATIVES — the (anchor, pos, negs)
    * tuples a contrastive/embedding-training run consumes. Negatives
    * are drawn by ranking candidates on md5(anchor#cand): uniform,
    * engine-stable, seedless (the [[Pipeline.md5Bucket]] discipline
    * applied to PAIRS), excluding the anchor itself and its positive.
    * The gate scores the exact all-pairs candidate set (quadratic by
    * declaration, like s13); at 100 TB the negative pool is a
    * per-anchor hash-bucketed slice and the positive comes from the
    * IVF path — both swaps leave this ranking rule untouched. Output
    * is integer ids + ranks → hash-exact. */
  def s14ContrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // bounded anchor set — the s01/s08/s12 query-set convention; the
    // negative pool is still the WHOLE corpus
    val anchors = emb.filter(col("vec_id") < 200)
    val pos = bruteForceKnn(anchors, emb, 1, roundCosineTo = 9)
      .select(col("query_id").as("anchor_id"), col("neighbor_id").as("pos_id"))
    val cands = anchors.select(col("vec_id").as("anchor_id"))
      .join(emb.select(col("vec_id").as("cand_id")),
        col("anchor_id") =!= col("cand_id"))
      .join(pos, Seq("anchor_id"))
      .filter(col("cand_id") =!= col("pos_id"))
      .withColumn("hk",
        md5(concat(col("anchor_id").cast("string"), lit("#"),
          col("cand_id").cast("string"))))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("hk"), col("cand_id"))
    cands
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= negativesPerAnchor)
      .select(col("anchor_id"), col("pos_id"), col("neg_rank"),
        col("cand_id").as("neg_id"))
      .orderBy(col("anchor_id"), col("neg_rank"))
  }

  val s14Sql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
       |pos AS (
       |  SELECT q AS anchor_id, n AS pos_id FROM (
       |    SELECT a.vec_id AS q, b.vec_id AS n,
       |           ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |             ORDER BY ROUND(list_cosine_similarity(a.ev, b.ev), 9)
       |               DESC, b.vec_id) AS rk
       |    FROM v a JOIN v b ON a.vec_id <> b.vec_id
       |    WHERE a.vec_id < 200)
       |  WHERE rk = 1),
       |cands AS (
       |  SELECT p.anchor_id, p.pos_id, b.vec_id AS cand_id,
       |         md5(CAST(p.anchor_id AS VARCHAR) || '#' ||
       |             CAST(b.vec_id AS VARCHAR)) AS hk
       |  FROM pos p JOIN v b
       |    ON b.vec_id <> p.anchor_id AND b.vec_id <> p.pos_id)
       |SELECT anchor_id, pos_id, CAST(neg_rank AS INT) AS neg_rank,
       |       cand_id AS neg_id
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
       |               ORDER BY hk, cand_id) AS neg_rank
       |      FROM cands) t
       |WHERE neg_rank <= $negativesPerAnchor
       |ORDER BY anchor_id, neg_rank""".stripMargin

  /** s15 — the mutual-kNN graph over the IVF candidate generator: the
    * measured 100 TB form of s13 (dev/scaling.md: 12.7s vs 115.6s exact
    * at x100), now gate-exercised. [[mutualKnn]] composes with any
    * top-k ranking by construction; here it consumes [[ivfKnn]] with a
    * corpus-scaled cell count (~512 vectors/cell) and nprobe 8 — each
    * query scores ~4k candidates REGARDLESS of corpus size. An edge
    * needs BOTH endpoints' rankings right, so edge recall ≈ vertex
    * recall²; nprobe 8 buys ~0.8 edge recall where the scaling run's
    * nprobe 4 sits near 0.5 (measured on the gate corpora) — 2× probe
    * cost, still constant per query, still ~5× faster than exact at
    * x100. Rows-only gate BY DESIGN: IVF's probed top-k can differ
    * from the exact top-k when a true neighbor's cell is outside the
    * probe set, so the edge set is legitimately ≠ s13's (the d14
    * precedent). What IS pinned (SimilaritySpec): edge recall vs the
    * exact s13 graph at defaults, and the machinery dial — nprobe =
    * nlist degenerates to s13's exact edge set. */
  def s15MutualKnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val nlist = math.max(16L, emb.count() / 512L).toInt
    mutualKnn(ivfKnn(emb, emb, 5, nlist = nlist, nprobe = math.min(8, nlist)))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Pool count for the s16 bucketed negative draw (mirrored in
    * [[s16Sql]]): candidates are pooled by md5-bucket mod this, and an
    * anchor draws only from ITS OWN pool. At gate scale 8 pools ≈ 60
    * candidates each; at 100 TB the pool count grows ∝ N so a pool —
    * and with it the per-anchor candidate join — stays constant-size. */
  val s16NegativePools = 8

  /** s16 — contrastive pair mining with the HASH-BUCKETED negative
    * pool: the 100 TB form of s14's negative draw, gate-exercised.
    * s14 ranks every (anchor, candidate) pair in the corpus — an
    * anchors×corpus join whose cost per anchor grows with N. Here the
    * corpus is split into [[s16NegativePools]] deterministic md5 pools
    * ([[Pipeline.md5Bucket]] mod pools — the p04 discipline) and an
    * anchor's negatives come only from its own pool, turning the draw
    * into a bucket EQUI-join with ~N/pools candidates per anchor;
    * growing pools ∝ N holds that constant. The md5(anchor#cand)
    * ranking rule — uniform, engine-stable, seedless — is untouched,
    * and the draw stays exactly as uniform (a hash pool is itself a
    * uniform sample of the corpus). Positives are unchanged from s14
    * (exact top-1; swap in the s15 IVF ranking at scale — same
    * downstream by construction). Fully deterministic and
    * SQL-expressible → HASH-gated, unlike the rows-only d14/s15
    * approximations: the pool restriction changes WHICH negatives are
    * drawn, not whether an oracle can replay the draw. */
  def s16ContrastiveBucketed(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val anchors = emb.filter(col("vec_id") < 200)
    val pos = bruteForceKnn(anchors, emb, 1, roundCosineTo = 9)
      .select(col("query_id").as("anchor_id"), col("neighbor_id").as("pos_id"))
    val pool = pmod(Pipeline.md5Bucket(col("vec_id")), lit(s16NegativePools))
    val cands = anchors
      .select(col("vec_id").as("anchor_id"), pool.as("pool"))
      .join(emb.select(col("vec_id").as("cand_id"), pool.as("pool")),
        Seq("pool"))
      .filter(col("anchor_id") =!= col("cand_id"))
      .join(pos, Seq("anchor_id"))
      .filter(col("cand_id") =!= col("pos_id"))
      .withColumn("hk",
        md5(concat(col("anchor_id").cast("string"), lit("#"),
          col("cand_id").cast("string"))))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("hk"), col("cand_id"))
    cands
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= negativesPerAnchor)
      .select(col("anchor_id"), col("pos_id"), col("neg_rank"),
        col("cand_id").as("neg_id"))
      .orderBy(col("anchor_id"), col("neg_rank"))
  }

  val s16Sql: String = {
    val poolOf = (id: String) =>
      s"(${Pipeline.sqlMd5Bucket(id)} % $s16NegativePools)"
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
       |pos AS (
       |  SELECT q AS anchor_id, n AS pos_id FROM (
       |    SELECT a.vec_id AS q, b.vec_id AS n,
       |           ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |             ORDER BY ROUND(list_cosine_similarity(a.ev, b.ev), 9)
       |               DESC, b.vec_id) AS rk
       |    FROM v a JOIN v b ON a.vec_id <> b.vec_id
       |    WHERE a.vec_id < 200)
       |  WHERE rk = 1),
       |cands AS (
       |  SELECT p.anchor_id, p.pos_id, b.vec_id AS cand_id,
       |         md5(CAST(p.anchor_id AS VARCHAR) || '#' ||
       |             CAST(b.vec_id AS VARCHAR)) AS hk
       |  FROM pos p JOIN v b
       |    ON ${poolOf("b.vec_id")} = ${poolOf("p.anchor_id")}
       |   AND b.vec_id <> p.anchor_id AND b.vec_id <> p.pos_id)
       |SELECT anchor_id, pos_id, CAST(neg_rank AS INT) AS neg_rank,
       |       cand_id AS neg_id
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
       |               ORDER BY hk, cand_id) AS neg_rank
       |      FROM cands) t
       |WHERE neg_rank <= $negativesPerAnchor
       |ORDER BY anchor_id, neg_rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s14_contrastive_pairs" -> s14ContrastivePairs _,
    "s15_mutual_knn_ivf"    -> s15MutualKnnIvf _,
    "s16_contrastive_bucketed" -> s16ContrastiveBucketed _,
    "s13_mutual_knn"        -> s13MutualKnn _,
    "s08_hybrid_knn"        -> s08HybridKnn _,
    "s12_knn_filtered"      -> s12KnnFiltered _,
    "s01_knn_bruteforce"    -> s01KnnBruteForce _,
    "s02_knn_ann"           -> s02KnnAnn _,
    "s03_ann_bucket_profile" -> s03AnnBucketProfile _,
    "s04_knn_ivf"           -> s04KnnIvf _,
    "s17_knn_ivf_persisted" -> s17KnnIvfPersisted _,
    "s05_ivf_cell_profile"  -> s05IvfCellProfile _,
    "s06_knn_quantized"     -> s06KnnQuantized _,
    "s07_knn_ivfsq"         -> s07KnnIvfSq _,
    "s09_knn_pq"            -> s09KnnPq _,
    "s10_knn_ivfpq"         -> s10KnnIvfPq _,
    "s11_knn_mmr"           -> s11KnnMmr _,
  )

  val oracles: Map[String, String] = Map(
    "s14_contrastive_pairs" -> s14Sql,
    "s16_contrastive_bucketed" -> s16Sql,
    "s13_mutual_knn"     -> s13Sql,
    "s01_knn_bruteforce" -> s01Sql,
    "s08_hybrid_knn"     -> s08Sql,
    "s12_knn_filtered"   -> s12Sql,
    "s11_knn_mmr"        -> s11Sql,
  )
}
