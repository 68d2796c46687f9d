package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Per-document repetition signals for quality filtering.
  *
  * Heavily-repetitive documents (boilerplate, scraped navigation, generated
  * spam) are the single most common class a pre-training filter drops. The
  * standard signals, following the published Gopher/MassiveText filtering
  * rules (Rae et al. 2021, arXiv:2112.11446 §A1.1):
  *
  *  - `dup_line_frac`        — fraction of lines occurring more than once;
  *  - `dup_line_char_frac`   — fraction of characters inside those lines;
  *  - `top_bigram_char_frac` — fraction of characters covered by the most
  *    frequent word bigram (occurrences × bigram length / doc length).
  *
  * The formulation is deliberately distributed rather than per-row-quadratic:
  * a per-doc in-memory counter would be O(len²) with higher-order array
  * functions, and a giant doc would pin a task. Instead lines/bigrams
  * EXPLODE into narrow `(doc_id, unit)` rows and hash-aggregate — partial
  * combine absorbs the repetition (that's the signal itself!) map-side, the
  * shuffle key includes `doc_id` so a single hot document spreads over the
  * cluster, and every step is replayable in plain SQL.
  *
  * Tie-break for the top bigram: highest count, then lexicographically
  * smallest bigram — deterministic across layouts.
  *
  * Reference scope: the reference's data-quality gate before merge
  * (control_migration_schema_script.sql:374–398) extended to the
  * LLM-filtering surface per SURVEY §2.
  */
object Repetition {

  /** `(idCol, n_lines, dup_line_frac, dup_line_char_frac, top_bigram,
    * top_bigram_char_frac)` per document. Documents with no bigram (< 2
    * tokens) carry a null `top_bigram` and 0.0 fraction; single-line
    * documents have 0.0 line fractions. Fractions are rounded to 6 places
    * (stable across engines). */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), col(textCol).as("_text"))
      .withColumn("_n_chars", length(col("_text")))

    // --- line repetition: explode → count per (doc, line) → roll up.
    // Blank lines (paragraph spacing) are EXCLUDED from the counts — Gopher/
    // MassiveText dup-line stats are computed over non-empty lines, and
    // repeated blank separators would otherwise inflate dup_line_frac. The
    // exclusion is a conditional inside the roll-up (not a filter before it)
    // so a document that is all blank lines still yields its output row.
    val lines = base
      .select(col(idCol), col("_n_chars"),
        explode(split(col("_text"), "\n")).as("_line"))
    val nonBlank = length(col("_line")) > 0
    val lineStats = lines
      .groupBy(col(idCol), col("_n_chars"), col("_line"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol), col("_n_chars")) // _n_chars is per-doc constant
      .agg(
        sum(when(nonBlank, col("_c")).otherwise(lit(0L))).as("_n_lines"),
        sum(when(nonBlank && col("_c") > 1, col("_c")).otherwise(lit(0L)))
          .as("_dup_lines"),
        sum(when(nonBlank && col("_c") > 1, col("_c") * length(col("_line")))
          .otherwise(lit(0L))).as("_dup_chars"))

    // --- top bigram: count per (doc, bigram) → top-1 as an AGGREGATE, not
    // a window: min(struct(-count, bigram)) realizes "count desc, bigram
    // asc" through struct ordering, so the top-1 partial-combines map-side
    // and the second exchange carries one row per (doc, partition) — a
    // row_number window would re-sort every doc's full bigram table.
    val topBigram = base
      .select(col(idCol), explode(TextFunctions.wordShingles(col("_text"), 2)).as("_g"))
      .groupBy(col(idCol), col("_g"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("_c")).as("_nc"), col("_g"))).as("_top"))
      .select(col(idCol), col("_top._g").as("top_bigram"),
        (-col("_top._nc")).as("_top_c"))

    lineStats
      .join(topBigram, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        col("_n_lines").cast("bigint").as("n_lines"),
        when(col("_n_lines") > 0,
          round(col("_dup_lines").cast("double") / col("_n_lines"), 6))
          .otherwise(lit(0.0)).as("dup_line_frac"),
        round(col("_dup_chars").cast("double") /
          greatest(col("_n_chars"), lit(1)).cast("double"), 6)
          .as("dup_line_char_frac"),
        col("top_bigram"),
        coalesce(
          round(col("_top_c") * length(col("top_bigram")).cast("double") /
            greatest(col("_n_chars"), lit(1)), 6),
          lit(0.0)).as("top_bigram_char_frac"))
  }

  /** Corpus minus documents breaching any threshold — the filtering rule
    * applied by MassiveText-style pipelines. */
  def filterRepetitive(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDupLineFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxTopBigramCharFrac: Double = 0.18): DataFrame = {
    val bad = stats(df, idCol, textCol)
      .filter(col("dup_line_frac") > maxDupLineFrac ||
        col("dup_line_char_frac") > maxDupLineCharFrac ||
        col("top_bigram_char_frac") > maxTopBigramCharFrac)
      .select(col(idCol))
    df.join(bad, Seq(idCol), "left_anti")
  }
}
