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

  // ------------------------------------------------------------ htmlToText

  private def extract(html: String, maxLinkDensity: Double = 0.5): (String, Int) = {
    val s = spark; import s.implicits._
    val r = Clean.htmlToText(Seq((1L, html)).toDF("doc_id", "html"),
      "doc_id", "html", maxLinkDensity).collect().head
    (r.getString(1), r.getInt(2))
  }

  test("htmlToText: scripts, styles and comments vanish; block tags break lines") {
    val (text, n) = extract(
      "<html><head><style>p { color: red }</style>" +
        "<script type='text/javascript'>if (a < b) { alert('<p>'); }</script>" +
        "</head><body><h1>Title</h1><p>First para.</p>" +
        "<!-- hidden comment with words --><p>Second para.</p></body></html>")
    assert(text === "Title\nFirst para.\nSecond para.")
    assert(n === 3)
  }

  test("htmlToText: nested inline tags strip, block structure survives") {
    val (text, _) = extract(
      "<p>Some <b>bold <i>and italic</i></b> text.</p><ul><li>item one</li>" +
        "<li>item <em>two</em></li></ul>")
    assert(text === "Some bold and italic text.\nitem one\nitem two")
  }

  test("htmlToText: entities decode, &amp; last (no double-decode)") {
    val (text, _) = extract("<p>A &lt;tag&gt; &quot;quoted&quot; &#39;s&nbsp;&amp; done</p>")
    assert(text === "A <tag> \"quoted\" 's & done")
    // &amp;lt; must decode to the LITERAL '&lt;', not '<'
    val (t2, _) = extract("<p>escaped: &amp;lt;</p>")
    assert(t2 === "escaped: &lt;")
  }

  test("htmlToText: link-density boundary — at the threshold keeps, above drops") {
    // visible 'aaaa bbbb' (9 chars), link text 'aaaa' (4): 4/9 < 0.5 → keep
    val (kept, _) = extract("<p><a href='/x'>aaaa</a> bbbb</p>")
    assert(kept === "aaaa bbbb")
    // all-link line: density 1 → drop; nav bars die the same way
    val (dropped, n) = extract(
      "<p>real content line here</p><p><a href='/m'>click here for more</a></p>" +
        "<div><a href='/'>Home</a> <a href='/a'>About</a></div>")
    assert(dropped === "real content line here" && n === 1)
    // exactly AT the threshold is kept (<=): visible 'abcd efgh' 9, link 4,
    // with maxLinkDensity = 4.0/9 the comparison is equality
    val (atEdge, _) = extract("<p><a>abcd</a> efgh</p>", maxLinkDensity = 4.0 / 9)
    assert(atEdge === "abcd efgh")
  }

  test("htmlToText: <pre>/<param> do not match the p/br block alternates") {
    val (text, n) = extract("<p>before</p><span>pre<pre>kept inline</pre>text</span>")
    // <pre> is not a block break: 'pre kept inline text' stays one line
    assert(n === 2, s"got $n lines: $text")
  }

  test("htmlToText: NULL html and empty pages yield empty text, zero lines") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, Option("<script>x</script>")), (2L, None))
      .toDF("doc_id", "html")
    val out = Clean.htmlToText(docs, "doc_id", "html")
      .orderBy(col("doc_id")).collect()
    assert(out.forall(r => r.getString(1) === "" && r.getInt(2) === 0))
  }

  test("htmlToText composes with c4Clean: stage 0 → stage 1") {
    val s = spark; import s.implicits._
    val docs = Seq((1L,
      "<div><a href='/'>Home</a></div>" +
        "<p>This is a good first sentence.</p>" +
        "<p>And here is another good one.</p>" +
        "<p><a href='/m'>subscribe now</a></p>")).toDF("doc_id", "html")
    val text = Clean.htmlToText(docs, "doc_id", "html")
    val cleaned = Clean.c4Clean(text, "doc_id", "text", minKeptLines = 2)
      .collect().head
    assert(cleaned.getBoolean(1) && cleaned.getInt(2) === 2)
  }

  test("htmlToText is a narrow plan: no exchange of any kind") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "<p>x</p>")).toDF("doc_id", "html")
    val plan = Clean.htmlToText(docs, "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must stay narrow:\n$plan")
  }
}
