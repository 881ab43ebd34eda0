package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables

/** Multimodal (image/audio/video) columns as opaque `binary` payloads
  * with typed metadata — the training-data-pipeline pattern where media
  * bytes ride through Spark untouched and only cheap, schema-declared
  * operations (catalog stats, frame slicing, feature extraction,
  * resize bookkeeping) run distributed.
  *
  * == What is real vs stubbed ==
  * REAL (and tested): the schema contract, the binary column plumbing
  * (slice/length/hash on BinaryType), the partitioning/batching shape
  * (`decodeBatched` — typed mapPartitions in fixed-size batches, the
  * JVM analog of a vectorized Python `mapInPandas` decode), and every
  * aggregate/explode around it.
  * STUBBED: actual codec work. This container has no image/audio
  * libraries, so `FakeCodec.decode` is a DETERMINISTIC FAKE that
  * derives pixel/sample facts from the bytes themselves. A production
  * deployment swaps exactly that one function for javax.imageio /
  * ffmpeg bindings; nothing else changes, because the plumbing only
  * depends on its signature.
  *
  * == Media fixture ==
  * There is no binary table in the driver corpus, so the media table is
  * DERIVED deterministically from `documents` (payload = UTF-8 bytes of
  * `text`, kind cycled by doc_id). Both engines build it identically,
  * which keeps the m01/m02 gates oracle-checkable end to end.
  *
  * Scale notes (100 TB of media):
  *  - Payloads never enter a shuffle here: catalog stats aggregate
  *    scalar facts (length/hash), frame sampling slices within the row,
  *    features reduce bytes → fixed-dim vectors. The only wide exchange
  *    carries 64-double vectors.
  *  - `decodeBatched` repartitions by media_id so decode parallelism is
  *    payload-balanced, then processes fixed-size batches to bound peak
  *    memory per task (batch bytes ≈ batchSize × max payload).
  */
object Media {

  // ---------------------------------------------------------------------------
  // Media catalog (binary + typed metadata)
  // ---------------------------------------------------------------------------

  val kinds = Seq("image", "audio", "video")

  /** Opaque-payload media table derived from documents: binary content
    * plus the typed metadata struct a real ingest would carry. */
  def mediaCatalog(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(kinds.map(lit): _*),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "utf-8").as("content"),
      struct(
        length(encode(col("text"), "utf-8")).as("n_bytes"),
        col("source").as("origin"),
        col("lang").as("lang_hint")).as("meta"))

  // ---------------------------------------------------------------------------
  // Deterministic fake codec (THE stub boundary)
  // ---------------------------------------------------------------------------

  /** Decoded-media facts a real codec would produce. */
  final case class Decoded(media_id: Long, kind: String, width: Int,
                           height: Int, sample_rate: Int, n_frames: Int)

  /** Raw row shape for the typed decode path. */
  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  object FakeCodec {
    /** DETERMINISTIC FAKE decode — stands in for javax.imageio/ffmpeg,
      * which this environment does not have. Derives plausible, fully
      * reproducible "decoded" facts from the payload bytes: a real
      * implementation replaces this body (same signature) and the whole
      * pipeline — batching, partitioning, schema — is unchanged. */
    def decode(m: MediaRow): Decoded = {
      val n = m.content.length
      val h = java.util.Arrays.hashCode(m.content)
      m.kind match {
        case "image" => Decoded(m.media_id, m.kind,
          width = 16 + math.floorMod(h, 1024), height = 16 + math.floorMod(h >> 10, 1024),
          sample_rate = 0, n_frames = 1)
        case "audio" => Decoded(m.media_id, m.kind, 0, 0,
          sample_rate = 8000 + 100 * math.floorMod(h, 441), n_frames = n)
        case _ => Decoded(m.media_id, m.kind,
          width = 320, height = 240, sample_rate = 0,
          n_frames = 1 + n / FrameSize)
      }
    }
  }

  /** Fixed fake frame stride (bytes per "frame" of video payload). */
  val FrameSize = 64

  // ---------------------------------------------------------------------------
  // Batched decode (the mapInPandas-shaped plumbing)
  // ---------------------------------------------------------------------------

  /** Decode in fixed-size batches with payload-balanced partitioning:
    * the structural twin of a Python `mapInPandas(decode_fn, schema)` —
    * an iterator of batches in, an iterator of decoded batches out,
    * nothing materialized beyond one batch per task. */
  def decodeBatched(media: Dataset[MediaRow], numPartitions: Int = 32,
                    batchSize: Int = 256): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media
      .repartition(numPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real codec would amortize per-batch setup (decoder init,
          // native buffers) here — that is why the batch boundary exists
          batch.map(FakeCodec.decode)
        }
      }
  }

  // ---------------------------------------------------------------------------
  // Column-level media ops (pure Spark, no stub involved)
  // ---------------------------------------------------------------------------

  /** Frame offsets 0, FrameSize, 2·FrameSize … for a payload. */
  private def frameOffsets(content: Column): Column =
    sequence(lit(0), length(content) - 1, lit(FrameSize))

  /** One row per sampled frame: (frame_no, byte_off, frame bytes). The
    * slice happens inside the row — payload bytes never shuffle.
    * Empty payloads contribute no frames (sequence(0, -1) would throw;
    * the DuckDB oracle's range(0, 0) is likewise empty). */
  def sampleFrames(media: DataFrame, everyKth: Int = 1): DataFrame =
    media
      .filter(length(col("content")) > 0)
      .select(col("media_id"), col("content"),
        posexplode(frameOffsets(col("content"))).as(Seq("frame_no", "byte_off")))
      .filter(col("frame_no") % everyKth === 0)
      .select(
        col("media_id"), col("frame_no"), col("byte_off"),
        substring(col("content"), col("byte_off") + 1, lit(FrameSize)).as("frame"))

  /** Deterministic fake "resize": a real pipeline would decode, scale,
    * re-encode; the metadata bookkeeping (new dims, new byte count) and
    * payload truncation shape are what the plumbing needs to carry. */
  def resizeTo(media: DataFrame, maxBytes: Int): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      substring(col("content"), 1, maxBytes).as("content"),
      least(length(col("content")), lit(maxBytes)).as("n_bytes"))

  /** Fixed-dim feature vector from payload bytes: seeded xxhash64 per
    * dimension, scaled to [-1, 1] — deterministic across executors, and
    * downstream-compatible with VectorOps/Similarity (cosine, ANN). A
    * real extractor (CLIP etc.) would slot in via decodeBatched. */
  def featureVector(content: Column, dim: Int = 64): Column =
    transform(sequence(lit(1), lit(dim)), i =>
      (xxhash64(content, i) / lit(Long.MaxValue.toDouble)).cast(DoubleType))

  // ---------------------------------------------------------------------------
  // Gate queries
  // ---------------------------------------------------------------------------

  /** m01 — catalog profile per kind: the binary-column bookkeeping
    * (count, bytes, payload checksum) both engines can compute. */
  def m01MediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaCatalog(Tables.documents(spark, dir))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("media_count"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.n_bytes")).as("max_bytes"))
      .orderBy(col("kind"))

  val m01Sql: String =
    """SELECT CASE (doc_id % 3 + 1) WHEN 1 THEN 'image'
      |                             WHEN 2 THEN 'audio'
      |                             ELSE 'video' END AS kind,
      |  COUNT(*) AS media_count,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(MAX(octet_length(encode(text))) AS INTEGER) AS max_bytes
      |FROM documents
      |GROUP BY kind
      |ORDER BY kind""".stripMargin

  /** m02 — frame sampling over video payloads: per-media frame count +
    * md5 of the first frame (proves the byte slicing is identical). */
  def m02FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val video = mediaCatalog(Tables.documents(spark, dir))
      .filter(col("kind") === "video")
    sampleFrames(video)
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("frame_count"),
        sum(length(col("frame"))).as("frame_bytes"),
        max(when(col("frame_no") === 0, md5(col("frame")))).as("first_frame_md5"))
      .orderBy(col("media_id"))
  }

  // DuckDB cannot substring a BLOB; the corpus is all-ASCII (asserted
  // by the oracle itself via the octet_length guard), so VARCHAR
  // slicing is byte-identical and md5 agrees with Spark's md5(binary).
  val m02Sql: String =
    s"""WITH video AS (
       |  SELECT doc_id AS media_id, text AS content
       |  FROM documents WHERE doc_id % 3 + 1 = 3
       |    AND octet_length(encode(text)) = length(text)),
       |frames AS (
       |  SELECT media_id,
       |         CAST(o.o AS INT) AS byte_off,
       |         substring(content, CAST(o.o AS INT) + 1, $FrameSize) AS frame
       |  FROM video
       |  CROSS JOIN LATERAL (SELECT unnest(range(0, length(content),
       |                                          $FrameSize)) AS o) o)
       |SELECT media_id, COUNT(*) AS frame_count,
       |  CAST(SUM(length(frame)) AS BIGINT) AS frame_bytes,
       |  MAX(CASE WHEN byte_off = 0 THEN md5(frame) END) AS first_frame_md5
       |FROM frames
       |GROUP BY media_id
       |ORDER BY media_id""".stripMargin

  /** m03 — batched fake decode profile (engine-specific stub → rows-only
    * gate; determinism + batch-shape invariants pinned in ScalaTest). */
  def m03DecodeProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaCatalog(Tables.documents(spark, dir))
      .select(col("media_id"), col("kind"), col("content"))
      .as[MediaRow]
    decodeBatched(media).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("media_count"),
        sum(col("n_frames")).as("total_frames"),
        avg(col("width").cast(DoubleType)).as("avg_width"))
      .orderBy(col("kind"))
  }

  /** m05 — resize bookkeeping profile: per kind, how many payloads the
    * resize touched, total bytes after, and a payload checksum proving
    * the truncation slices identical bytes in both engines. The ASCII
    * guard mirrors m02's: DuckDB substring is character-based, so the
    * oracle is byte-exact only over single-byte text (the whole corpus,
    * asserted by the guard itself). */
  def m05ResizeProfile(spark: SparkSession, dir: String): DataFrame = {
    val maxBytes = 100
    // same ASCII guard as the m02 oracle (byte length == char length),
    // applied on BOTH sides so the character-based DuckDB substring and
    // the byte-based Spark slice see the same rows
    val asciiDocs = Tables.documents(spark, dir)
      .filter(length(encode(col("text"), "utf-8")) === length(col("text")))
    resizeTo(mediaCatalog(asciiDocs), maxBytes)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("media_count"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(when(col("n_bytes") === maxBytes, 1).otherwise(0)).as("capped_count"),
        max(md5(col("content"))).as("max_md5"))
      .orderBy(col("kind"))
  }

  val m05Sql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |         CASE (doc_id % 3 + 1) WHEN 1 THEN 'image'
      |                               WHEN 2 THEN 'audio'
      |                               ELSE 'video' END AS kind,
      |         text AS content
      |  FROM documents
      |  WHERE octet_length(encode(text)) = length(text)),
      |r AS (SELECT kind, substring(content, 1, 100) AS rc,
      |             CAST(least(length(content), 100) AS INT) AS n_bytes
      |      FROM media)
      |SELECT kind, COUNT(*) AS media_count,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(SUM(CASE WHEN n_bytes = 100 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS capped_count,
      |  MAX(md5(rc)) AS max_md5
      |FROM r
      |GROUP BY kind
      |ORDER BY kind""".stripMargin

  /** m04 — media feature vectors routed into the similarity stack:
    * nearest neighbor per media among the first 50 (rows-only: feature
    * hashing is engine-specific; geometry invariants in ScalaTest). */
  def m04FeatureKnn(spark: SparkSession, dir: String): DataFrame = {
    val feats = mediaCatalog(Tables.documents(spark, dir))
      .filter(col("media_id") < 50)
      .select(col("media_id").as("vec_id"),
        featureVector(col("content")).as("embedding"))
    Similarity.bruteForceKnn(feats, feats, 1)
      .orderBy(col("query_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_stats"    -> m01MediaStats _,
    "m02_frame_sample"   -> m02FrameSample _,
    "m03_decode_profile" -> m03DecodeProfile _,
    "m04_feature_knn"    -> m04FeatureKnn _,
    "m05_resize_profile" -> m05ResizeProfile _,
  )

  val oracles: Map[String, String] = Map(
    "m01_media_stats"  -> m01Sql,
    "m02_frame_sample" -> m02Sql,
    "m05_resize_profile" -> m05Sql,
  )
}
