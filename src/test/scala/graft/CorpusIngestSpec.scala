package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.CorpusIngest

class CorpusIngestSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("streaming ingest gates quality, scrubs PII, and dedups by content") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = CorpusIngest.prepare(input.toDF(), "text", "ts", minTokens = 4)
      .writeStream.format("memory").queryName("ingested")
      .outputMode(OutputMode.Append).start()

    input.addData(
      Doc(1L, ts("2026-01-01 00:00:00"), "a clean document with enough tokens"),
      Doc(2L, ts("2026-01-01 00:00:10"), "too short"), // < 4 tokens → gated
      Doc(3L, ts("2026-01-01 00:00:20"), "contact me at alice@example.org please"))
    query.processAllAvailable()
    // batch 2: same CONTENT as doc 1 under a fresh id (re-crawl) + novel doc
    input.addData(
      Doc(9L, ts("2026-01-01 00:01:00"), "A  Clean document with enough tokens"),
      Doc(4L, ts("2026-01-01 00:01:30"), "a genuinely new arrival with plenty of tokens"))
    query.processAllAvailable()

    val rows = spark.table("ingested").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    query.stop()
    assert(rows.keySet === Set(1L, 3L, 4L)) // 2 gated, 9 deduped by fingerprint
    assert(rows(3L) === "contact me at [EMAIL] please")
  }

  test("docs differing only inside PII spans are NOT conflated by the scrub") {
    // regression: fingerprints must hash the RAW text — after scrubbing,
    // these two distinct form letters become byte-identical
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = CorpusIngest.prepare(input.toDF(), "text", "ts", minTokens = 4)
      .writeStream.format("memory").queryName("pii_distinct")
      .outputMode(OutputMode.Append).start()
    input.addData(
      Doc(1L, ts("2026-01-01 00:00:00"), "contact alice@a.com for offer x"),
      Doc(2L, ts("2026-01-01 00:00:05"), "contact bob@b.com for offer x"))
    query.processAllAvailable()
    val rows = spark.table("pii_distinct").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    query.stop()
    assert(rows.keySet === Set(1L, 2L), "PII-differing docs must both survive")
    assert(rows.values.toSet === Set("contact [EMAIL] for offer x"))
  }
}
