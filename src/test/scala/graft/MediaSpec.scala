package graft

import org.apache.spark.sql.functions._

import graft.operators.Media
import graft.operators.Media.{FakeCodec, MediaRow}

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def catalog = Media.mediaCatalog(Tables.documents(spark, sf))

  test("mediaCatalog: binary schema contract, total kind partition") {
    val schema = catalog.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val total = catalog.groupBy("kind").count()
      .agg(sum("count")).as[Long].head()
    assert(total == Tables.documents(spark, sf).count())
    val badKind = catalog.filter(!$"kind".isin(Media.kinds: _*)).count()
    assert(badKind == 0)
  }

  test("sampleFrames covers every payload byte exactly once at k=1") {
    val video = catalog.filter($"kind" === "video")
    val frameBytes = Media.sampleFrames(video)
      .agg(sum(length($"frame"))).as[Long].head()
    val payloadBytes = video.agg(sum(length($"content"))).as[Long].head()
    assert(frameBytes == payloadBytes,
      "k=1 frame sampling must tile the payload with no gap/overlap")
  }

  test("sampleFrames: empty payload yields zero frames, not an error") {
    val withEmpty = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array.empty[Byte]))
      .toDF("media_id", "content")
    val frames = Media.sampleFrames(withEmpty)
    assert(frames.filter($"media_id" === 2L).count() == 0)
    assert(frames.filter($"media_id" === 1L).count() == 1)
  }

  test("sampleFrames every 2nd frame keeps only even frame_no") {
    val video = catalog.filter($"kind" === "video").limit(10)
    val odd = Media.sampleFrames(video, everyKth = 2)
      .filter($"frame_no" % 2 =!= 0).count()
    assert(odd == 0)
  }

  test("resizeTo caps payloads and preserves prefixes") {
    val out = Media.resizeTo(catalog, maxBytes = 100)
    assert(out.filter(length($"content") > 100).count() == 0)
    assert(out.filter($"n_bytes" > 100).count() == 0)
    // a payload shorter than the cap is untouched
    val joined = catalog.select($"media_id", length($"content").as("orig"))
      .join(out.select($"media_id", $"n_bytes"), "media_id")
    assert(joined.filter($"orig" <= 100 && $"orig" =!= $"n_bytes").count() == 0)
  }

  test("decodeBatched: one decoded row per media, batch-size independent") {
    val media = catalog.select($"media_id", $"kind", $"content").as[MediaRow]
    val d1 = Media.decodeBatched(media, numPartitions = 7, batchSize = 3).toDF()
    val d2 = Media.decodeBatched(media, numPartitions = 2, batchSize = 500).toDF()
    assert(d1.count() == catalog.count())
    // partitioning/batching must not change results (mapInPandas contract)
    assert(d1.exceptAll(d2).count() == 0 && d2.exceptAll(d1).count() == 0)
  }

  test("FakeCodec is deterministic and kind-consistent") {
    val row = MediaRow(7L, "image", "some payload bytes".getBytes("UTF-8"))
    assert(FakeCodec.decode(row) == FakeCodec.decode(row))
    val img = FakeCodec.decode(row)
    assert(img.width > 0 && img.height > 0 && img.n_frames == 1)
    val vid = FakeCodec.decode(MediaRow(8L, "video",
      Array.fill[Byte](Media.FrameSize * 3 + 1)(42)))
    assert(vid.n_frames == 4, "video frames = 1 + bytes/FrameSize")
  }

  test("featureVector: fixed dim, bounded, deterministic, non-degenerate") {
    val feats = catalog.limit(50)
      .select($"media_id", Media.featureVector($"content").as("f"))
    val bad = feats.filter(size($"f") =!= 64).count()
    assert(bad == 0)
    val outOfRange = feats
      .select(explode($"f").as("x")).filter(abs($"x") > 1.0).count()
    assert(outOfRange == 0)
    assert(digest(feats) == digest(feats))
    // distinct payloads ⇒ distinct vectors (hash quality smoke)
    assert(feats.select($"f").distinct().count() ==
      catalog.limit(50).select($"content").distinct().count())
  }

  test("m04: every media's nearest feature-space neighbor is itself-excluded and ranked 1") {
    val knn = Media.m04FeatureKnn(spark, sf)
    assert(knn.filter($"query_id" === $"neighbor_id").count() == 0)
    assert(knn.filter($"rk" =!= 1).count() == 0)
    assert(knn.count() == 50)
  }
}
