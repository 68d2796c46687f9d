package graft

import java.sql.Timestamp
import java.time.LocalDateTime
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.sources.FixtureLoader

/** The fixture-drift net (r6 verdict item 7): the driver has re-exported
  * the parquet fixtures with a different timestamp encoding once already
  * (TIMESTAMP(NANOS) → timestamp[us]); FixtureLoader must normalize every
  * encoding that has ever been on disk, and the probe test fails with the
  * drifted table/column name the day a NEW encoding appears.
  */
class FixtureLoaderSpec extends SparkSpec {

  private val instant = "2026-03-01 12:34:56.789012"

  test("timestamp[us] NTZ export (current driver encoding) → session-UTC TimestampType") {
    val s = spark; import s.implicits._
    val dir = tmpDir("fx_ntz")
    Seq((1L, LocalDateTime.parse(instant.replace(' ', 'T'))))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType === TimestampNTZType,
      "precondition: Spark should infer NTZ for this fixture")
    val df = FixtureLoader.load(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) === instant)
  }

  test("legacy TIMESTAMP(NANOS) export (surfaces as LongType) → µs-truncated TimestampType") {
    val s = spark; import s.implicits._
    // 2026-03-01 12:34:56.789012345 UTC as epoch nanos; the loader must
    // truncate (not round) to micros, matching DuckDB's ns→µs read.
    val epochMicros = java.time.LocalDateTime
      .parse(instant.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    val nanos = epochMicros.getEpochSecond * 1000000000L +
      epochMicros.getNano + 345L
    val raw = Seq((1L, nanos)).toDF("event_id", "ts")
    val df = FixtureLoader.normalize(raw, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) === instant)
  }

  test("UTC-adjusted TimestampType export is left untouched") {
    val s = spark; import s.implicits._
    val dir = tmpDir("fx_ts")
    Seq((1L, Timestamp.valueOf(instant)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = FixtureLoader.load(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0) === instant)
  }

  test("non-timestamp long columns are NOT reinterpreted as nanos") {
    val s = spark; import s.implicits._
    val raw = Seq((42L, 7L)).toDF("event_id", "user_id")
    val df = FixtureLoader.normalize(raw, "events")
    assert(df.schema("event_id").dataType === LongType)
    assert(df.head().getLong(0) === 42L)
  }

  test("probe: every driver fixture table normalizes cleanly (names drifted column on failure)") {
    val sfDir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)),
      "driver fixtures not present")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) {
      val df = FixtureLoader.load(spark, sfDir, t)
      for (f <- df.schema.fields) {
        assert(f.dataType !== TimestampNTZType,
          s"fixture drift: $t.${f.name} still NTZ after normalize — " +
            "a new driver export encoding needs a FixtureLoader rule")
        if (FixtureLoader.timestampColumns.getOrElse(t, Set.empty)(f.name))
          assert(f.dataType === TimestampType,
            s"fixture drift: $t.${f.name} read as ${f.dataType} — " +
              "a new driver export encoding needs a FixtureLoader rule")
      }
      // the loader must not have broken the read itself
      assert(df.limit(1).count() === 1L, s"fixture $t unreadable/empty")
    }
  }
}
