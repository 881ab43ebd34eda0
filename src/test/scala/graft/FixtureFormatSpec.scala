package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Pins [[Tables]] against driver-side fixture-format drift.
  *
  * Fixture generators have shipped `events.ts` in three parquet
  * encodings across rounds: TIMESTAMP(MICROS, adjustedToUTC=true)
  * (Spark TimestampType), TIMESTAMP(MICROS, adjustedToUTC=false)
  * (Spark TIMESTAMP_NTZ — the round-7 regression that analysis-failed
  * every `unix_micros` caller), and TIMESTAMP(NANOS) (readable only as
  * epoch-nanos long under `spark.sql.legacy.parquet.nanosAsLong`).
  * This spec writes the same rows in each form and asserts the loader
  * yields one identical TimestampType frame for all three, so no
  * per-call-site change is ever needed when the driver regenerates.
  */
class FixtureFormatSpec extends SparkSpec {
  import spark.implicits._

  private def stage(write: String => Unit): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fixfmt").toString
    try {
      write(dir)
      val out = Tables.events(spark, dir)
      assert(out.schema("ts").dataType == TimestampType,
        s"loader must normalize to TimestampType, got ${out.schema("ts").dataType}")
      out.localCheckpoint()
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
      ()
    }
  }

  // Exact-microsecond sample rows spanning a day boundary (the corpus shape).
  private lazy val base = Seq(
    (1L, "2024-01-01 00:00:00.000001", 10L, "click", 1.5, "{}"),
    (2L, "2024-01-01 23:59:59.999999", 11L, "purchase", 2.5, "{}"),
    (3L, "2024-03-15 12:30:45.5", 12L, "view", 0.0, "{}"))
    .toDF("event_id", "raw", "user_id", "event_type", "value", "props")
    .withColumn("ts", to_timestamp(col("raw"))).drop("raw")
    .select("event_id", "ts", "user_id", "event_type", "value", "props")

  test("events loader yields one TimestampType frame for all three fixture encodings") {
    // (a) TIMESTAMP(MICROS, adjustedToUTC) — TimestampType round-trip.
    val utc = stage(d => base.write.parquet(s"$d/events.parquet"))

    // (b) TIMESTAMP(MICROS, not adjusted) — written from an NTZ column;
    // the parquet footer records isAdjustedToUTC=false, and reading it
    // back without the loader would give TIMESTAMP_NTZ (round-7 drift).
    val ntz = stage { d =>
      val f = base.withColumn("ts", col("ts").cast(TimestampNTZType))
      assert(f.schema("ts").dataType == TimestampNTZType)
      f.write.parquet(s"$d/events.parquet")
    }

    // (c) TIMESTAMP(NANOS): Spark cannot WRITE nanos parquet, but under
    // the loader's `nanosAsLong` conf a NANOS column reads back as an
    // epoch-nanos LongType column — byte-identical to writing that long
    // directly, which exercises the same LongType normalization arm.
    val nanos = stage { d =>
      val f = base.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      assert(f.schema("ts").dataType == LongType)
      f.write.parquet(s"$d/events.parquet")
    }

    assert(digest(utc) == digest(ntz), "NTZ fixture must decode to the same instants")
    assert(digest(utc) == digest(nanos), "nanos fixture must decode to the same instants")
    assert(utc.count() == 3)
  }

  test("star-schema loaders normalize NTZ timestamp columns too") {
    // orders.o_orderdate / lineitem.l_shipdate drifted to NTZ in the same
    // round-7 regeneration; Tables.apply folds every NTZ column.
    for (t <- Seq("orders", "lineitem", "events")) {
      val df = Tables(spark, sf, t)
      val leftover = df.schema.fields.filter(_.dataType == TimestampNTZType)
      assert(leftover.isEmpty,
        s"$t still exposes NTZ columns: ${leftover.map(_.name).mkString(",")}")
    }
  }
}
