package graft.operators

import org.apache.spark.sql.DataFrame
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
}
