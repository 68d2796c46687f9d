package graft

import org.apache.spark.sql.functions._
import graft.operators.Clean

class CleanSpec extends SparkSpec {

  private def pages() = {
    val s = spark; import s.implicits._
    Seq(
      // 3 good lines → kept
      (1L, "the first real sentence here.\nanother useful line of text.\nand one more to close it out."),
      // only 1 surviving line (others unpunctuated / too short) → dropped
      (2L, "a good line with enough words.\nno terminal punctuation here\nshort one."),
      // lorem ipsum marker → whole page dropped despite good lines
      (3L, "a good line with enough words.\nlorem ipsum dolor sit amet.\nanother fine line right here."),
      // code marker → whole page dropped
      (4L, "a good line with enough words.\nif (x) { return x; }\nanother fine line right here."),
      // unpunctuated soup → zero kept lines
      (5L, "word soup with no punctuation at all just words")
    ).toDF("doc_id", "text")
  }

  test("c4Clean applies line rules and page markers") {
    val out = Clean.c4Clean(pages(), "doc_id", "text",
      minWordsPerLine = 3, minKeptLines = 2)
      .orderBy(col("doc_id")).collect()
    val kept = out.map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(2) === 3)
    assert(byId(2L).getInt(2) === 0, "dropped pages report zero kept lines")
    // dropped pages share the empty-content fingerprint
    val emptyFp = byId(5L).getString(3)
    assert(Seq(2L, 3L, 4L).forall(id => byId(id).getString(3) == emptyFp))
    assert(byId(1L).getString(3) != emptyFp)
  }

  test("line rules: terminal punctuation and word-count thresholds bind exactly") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "one two three.\none two.\nends with bang!\nends with question?\nends with quote\"")
    ).toDF("doc_id", "text")
    val out = Clean.c4Clean(docs, "doc_id", "text",
      minWordsPerLine = 3, minKeptLines = 1).collect().head
    // "one two." has 2 words → dropped; the other four survive
    assert(out.getInt(2) === 4)
  }

  test("NULL text is an empty page: dropped, empty fingerprint, never a NULL row") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, Some("a good line with enough words.\nanother good line of text here.")),
      (2L, None)).toDF("doc_id", "text")
    val out = Clean.c4Clean(docs, "doc_id", "text", minKeptLines = 2)
      .orderBy(col("doc_id")).collect()
    assert(out(0).getBoolean(1))
    assert(!out(1).getBoolean(1) && out(1).getInt(2) === 0)
    assert(out(1).getString(3) != null, "dropped page still fingerprints deterministically")
  }

  test("c4Clean is a narrow plan: no exchange of any kind") {
    val plan = Clean.c4Clean(pages(), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cleaning must stay narrow:\n$plan")
  }

  test("an input that already has a kept/_kept column is not clobbered") {
    val s = spark; import s.implicits._
    // a re-cleaning run: the frame carries columns from a previous pass
    val docs = Seq((1L, "a good line with enough words.\nanother good line of text here.",
      false, "stale")).toDF("doc_id", "text", "kept", "_kept")
    val out = Clean.c4Clean(docs, "doc_id", "text", minKeptLines = 2).collect().head
    assert(out.getBoolean(1), "fresh verdict must come from THIS pass's rules, " +
      "not the input's stale kept column")
    assert(out.getInt(2) === 2)
  }
}
