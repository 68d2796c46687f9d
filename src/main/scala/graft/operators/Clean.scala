package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic page/line cleaning for web-scraped training corpora.
  *
  * The rule set is C4's (Raffel et al., "Exploring the Limits of Transfer
  * Learning with a Unified Text-to-Text Transformer", JMLR 2020, §2.2):
  * keep only lines that end in terminal punctuation and have enough
  * words; drop entire pages that contain code markers (`{`) or the
  * "lorem ipsum" placeholder; drop pages left with too few surviving
  * lines. The line-level sibling of q64's paragraph dedup — filtering by
  * per-line shape instead of cross-document duplication.
  *
  * Scale shape: everything is a per-row native-function transform
  * (split / filter / array_join / md5) fused into one WholeStageCodegen
  * pass — no explode, no shuffle, no state. At 100 TB this runs at scan
  * speed and the only exchange is whatever the caller adds downstream.
  */
object Clean {

  /** Apply the C4 line + page rules to `textCol`.
    *
    * Output, one row per input document: (id, kept, n_lines_kept,
    * content_fp) where `content_fp` is the md5 of the cleaned text
    * (kept lines re-joined with '\n'; empty string when the page is
    * dropped) — the same fingerprint-not-payload contract as q64.
    *
    * @param minWordsPerLine line survives only with at least this many
    *                        nonempty words (C4 uses 3)
    * @param minKeptLines    page survives only with at least this many
    *                        surviving lines (C4 uses 5 sentences; tuned
    *                        per corpus)
    */
  def c4Clean(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWordsPerLine: Int = 3,
      minKeptLines: Int = 2): DataFrame = {
    require(minWordsPerLine >= 1, "minWordsPerLine must be >= 1")
    require(minKeptLines >= 1, "minKeptLines must be >= 1")
    // NULL text = an empty page: zero lines survive, the page is dropped
    // with the empty-content fingerprint (not a NULL row)
    val text = coalesce(col(textCol), lit(""))
    val keptLines = filter(split(text, "\n"), l =>
      l.rlike("[.!?\"]$") &&
        size(filter(split(l, " "), w => length(w) > 0)) >= minWordsPerLine)
    val pageBad = (instr(lower(text), "lorem ipsum") > 0) || (instr(text, "{") > 0)
    // no withColumn on the caller's frame: an input that already carries
    // a `kept` (or `_kept`) column — plausible on a re-cleaning run —
    // must not be silently overwritten. Everything stays expression-level
    // and only the four output columns are projected.
    val keptArr = when(pageBad, array().cast("array<string>")).otherwise(keptLines)
    val keptFlag = !pageBad && (size(keptArr) >= minKeptLines)
    docs.select(col(idCol),
      keptFlag.as("kept"),
      when(keptFlag, size(keptArr)).otherwise(lit(0)).as("n_lines_kept"),
      md5(when(keptFlag, array_join(keptArr, "\n")).otherwise(lit(""))
        .cast("binary")).as("content_fp"))
  }

  /** HTML → text with public extraction heuristics — pipeline stage 0,
    * upstream of [[c4Clean]]: raw crawl markup in, line-structured visible
    * text out. The rule set is the boilerpipe/jusText family's
    * (Kohlschütter et al., WSDM 2010; Pomikálek 2011) expressed as a
    * deterministic regex chain:
    *
    *  1. drop invisible containers — `<script>`, `<style>`, comments;
    *  2. block-level tags (`p div li h1–h6 tr table ul ol br`) become line
    *     breaks — layout structure survives as '\n';
    *  3. per line, LINK DENSITY = visible-chars-inside-`<a>` over total
    *     visible chars; lines above `maxLinkDensity` are navigation/
    *     boilerplate and drop (the jusText/boilerpipe core signal);
    *  4. remaining tags strip, the five standard entities decode
    *     (`&amp;` LAST — the double-escape rule), whitespace collapses.
    *
    * Scale shape: identical to [[c4Clean]] — per-row native regex/array
    * expressions in one codegen pass, zero exchanges, zero UDFs; at
    * 100 TB this runs at scan speed. The per-line visible text is
    * computed twice (keep-filter + projection) — a CPU-only trade that
    * keeps the whole operator expression-level.
    *
    * @return (idCol, text, n_lines) — cleaned text with one line per
    *         surviving block, empty string when nothing survives */
  def htmlToText(
      docs: DataFrame,
      idCol: String,
      htmlCol: String,
      maxLinkDensity: Double = 0.5): DataFrame = {
    require(maxLinkDensity > 0 && maxLinkDensity <= 1,
      s"maxLinkDensity must be in (0, 1], got $maxLinkDensity")
    val html = coalesce(col(htmlCol), lit(""))
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // open OR close of a block element breaks the line; the (\s[^>]*)?/?>
    // tail keeps <pre>/<param>/... from matching the p/br alternates
    val blocks = regexp_replace(noComment,
      "(?i)</?(p|div|li|h[1-6]|tr|table|ul|ol|br)(\\s[^>]*)?/?>", "\n")
    def decodeEntities(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace(c,
          "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"),
        "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    def visible(l: Column): Column =
      trim(regexp_replace(decodeEntities(
        regexp_replace(l, "<[^>]*>", " ")), "\\s+", " "))
    def linkLen(l: Column): Column =
      length(visible(array_join(
        regexp_extract_all(l, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), " ")))
    val lines = split(blocks, "\n")
    val kept = filter(lines, l =>
      length(visible(l)) > 0 &&
        linkLen(l).cast("double") <= lit(maxLinkDensity) * length(visible(l)))
    docs.select(col(idCol),
      array_join(transform(kept, l => visible(l)), "\n").as("text"),
      size(kept).as("n_lines"))
  }
}
