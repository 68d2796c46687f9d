package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-normalizing reader for the driver's parquet fixtures.
  *
  * The driver regenerates the fixture tables between rounds, and the
  * physical encoding of timestamp columns has already drifted once
  * (TIMESTAMP(NANOS) → plain timestamp[us], 2026-08-13). Every fixture
  * read goes through [[load]], which dispatches on the schema that was
  * actually read instead of hard-coding one encoding, so a re-export
  * changes nothing downstream:
  *
  *   - `TIMESTAMP_NTZ` (parquet timestamp[us]/[ms] with
  *     isAdjustedToUTC=false, Spark's default inference) → cast to
  *     session-local [[TimestampType]]. All engine sessions pin
  *     `spark.sql.session.timeZone=UTC`, so the wall-clock instant is
  *     unchanged and string renderings still match the DuckDB oracle's
  *     naive timestamps byte-for-byte.
  *   - `LongType` in a column this table declares as a timestamp
  *     ([[timestampColumns]]) → the legacy TIMESTAMP(NANOS) encoding
  *     surfaced through `spark.sql.legacy.parquet.nanosAsLong`; truncate
  *     nanos → micros, the same truncation DuckDB applies reading ns into
  *     its µs timestamps.
  *   - [[TimestampType]] (isAdjustedToUTC=true exports) → already the
  *     canonical type; untouched.
  *
  * Integer widths and embedding element types are deliberately NOT
  * rewritten: `xxhash64`/`hash` are width-sensitive (Skew, TableStore
  * bucketing), so a blanket int→long cast would silently re-seed every
  * hash-derived salt/bucket. If the driver ever re-exports ids at a new
  * width, add the column here with an explicit, hash-audited rule rather
  * than a global cast.
  */
object FixtureLoader {

  /** Columns whose on-disk encoding is a timestamp, per fixture table.
    * Only these get the LongType→nanos interpretation — any other long
    * column (ids, counts) is a genuine long.
    */
  val timestampColumns: Map[String, Set[String]] = Map(
    "events"   -> Set("ts"),
    "orders"   -> Set("o_orderdate"),
    "lineitem" -> Set("l_shipdate")
  )

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Tolerate legacy TIMESTAMP(NANOS) exports (no-op for µs fixtures).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.read.parquet(s"$dir/$name.parquet"), name)
  }

  /** Normalization split out from the IO so a spec can drive it with
    * hand-written parquet files in every historical encoding. */
  def normalize(raw: DataFrame, table: String): DataFrame = {
    val tsCols = timestampColumns.getOrElse(table, Set.empty)
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case TimestampNTZType =>
          df.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if tsCols(f.name) =>
          df.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
        case _ => df
      }
    }
  }
}
