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

  // ------------------------------------------------------------------
  // Full-schema drift net (r7 verdict item 6): the complete normalized
  // schema of every driver fixture table, column by column. An id-width
  // or embedding-element-type drift in the next driver re-export fails
  // HERE with the table/column name instead of surfacing as an opaque
  // oracle hash mismatch.
  // ------------------------------------------------------------------

  /** Expected post-[[FixtureLoader.normalize]] schema of every fixture
    * table: (column, Spark SQL type) in on-disk order. Timestamps are
    * session-UTC TIMESTAMP whatever the physical encoding. */
  private val expectedSchemas: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "INT", "r_name" -> "STRING"),
    "nation" -> Seq("n_nationkey" -> "INT", "n_name" -> "STRING",
      "n_regionkey" -> "INT"),
    "customer" -> Seq("c_custkey" -> "BIGINT", "c_name" -> "STRING",
      "c_nationkey" -> "INT", "c_acctbal" -> "DOUBLE", "c_mktsegment" -> "STRING"),
    "supplier" -> Seq("s_suppkey" -> "BIGINT", "s_name" -> "STRING",
      "s_nationkey" -> "INT", "s_acctbal" -> "DOUBLE"),
    "part" -> Seq("p_partkey" -> "BIGINT", "p_name" -> "STRING",
      "p_brand" -> "STRING", "p_type" -> "STRING", "p_size" -> "INT",
      "p_retailprice" -> "DOUBLE"),
    "orders" -> Seq("o_orderkey" -> "BIGINT", "o_custkey" -> "BIGINT",
      "o_orderstatus" -> "STRING", "o_totalprice" -> "DOUBLE",
      "o_orderdate" -> "TIMESTAMP", "o_orderpriority" -> "STRING"),
    "lineitem" -> Seq("l_orderkey" -> "BIGINT", "l_partkey" -> "BIGINT",
      "l_suppkey" -> "BIGINT", "l_linenumber" -> "INT", "l_quantity" -> "DOUBLE",
      "l_extendedprice" -> "DOUBLE", "l_discount" -> "DOUBLE", "l_tax" -> "DOUBLE",
      "l_returnflag" -> "STRING", "l_linestatus" -> "STRING",
      "l_shipdate" -> "TIMESTAMP"),
    "events" -> Seq("event_id" -> "BIGINT", "ts" -> "TIMESTAMP",
      "user_id" -> "BIGINT", "event_type" -> "STRING", "value" -> "DOUBLE",
      "props" -> "STRING"),
    "documents" -> Seq("doc_id" -> "BIGINT", "text" -> "STRING",
      "lang" -> "STRING", "source" -> "STRING", "n_chars" -> "BIGINT"),
    "embeddings" -> Seq("vec_id" -> "BIGINT", "embedding" -> "ARRAY<FLOAT>",
      "label" -> "INT"))

  /** Human-readable drift list for one table: one line per missing /
    * unexpected / retyped column, empty when the schema matches exactly. */
  private def schemaDrift(
      table: String,
      actual: org.apache.spark.sql.types.StructType,
      expected: Seq[(String, String)]): Seq[String] = {
    val actualByName = actual.fields.map(f => f.name -> f.dataType.sql).toMap
    val expectedNames = expected.map(_._1).toSet
    val missing = expected.collect {
      case (n, _) if !actualByName.contains(n) => s"$table.$n missing"
    }
    val extra = actual.fields.collect {
      case f if !expectedNames(f.name) => s"$table.${f.name} unexpected (${f.dataType.sql})"
    }
    val retyped = expected.collect {
      case (n, t) if actualByName.contains(n) && actualByName(n) != t =>
        s"$table.$n is ${actualByName(n)}, expected $t"
    }
    missing ++ extra.toSeq ++ retyped
  }

  test("probe: full normalized schema of every fixture table (names drifted table.column)") {
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)),
        "driver fixtures not present")
      val drift = expectedSchemas.flatMap { case (table, expected) =>
        schemaDrift(table, FixtureLoader.load(spark, sfDir, table).schema, expected)
      }
      assert(drift.isEmpty,
        s"fixture schema drift at $sfDir — a driver re-export changed the " +
          s"contract; update FixtureLoader (hash-audited, see its scaladoc) " +
          s"and this spec:\n  ${drift.mkString("\n  ")}")
    }
  }

  test("probe negative: a drifted parquet fails naming the drifted column") {
    val s = spark; import s.implicits._
    val dir = tmpDir("fx_drifted")
    // embeddings re-exported with double elements and an int vec_id — the
    // most likely next drift per FixtureLoader's scaladoc
    Seq((1, Seq(0.1, 0.2), 3L)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val drift = schemaDrift("embeddings",
      FixtureLoader.load(spark, dir, "embeddings").schema,
      expectedSchemas.toMap.apply("embeddings"))
    assert(drift.exists(_.startsWith("embeddings.vec_id is INT")), drift.mkString("; "))
    assert(drift.exists(_.startsWith("embeddings.embedding is ARRAY<DOUBLE>")),
      drift.mkString("; "))
    assert(drift.exists(_.startsWith("embeddings.label is BIGINT")), drift.mkString("; "))
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
