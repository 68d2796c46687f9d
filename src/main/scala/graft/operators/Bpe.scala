package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding VOCABULARY TRAINER (Sennrich et al. 2016,
  * arXiv 1508.07909) — the real tokenizer behind token budgets, replacing
  * the chars-per-token heuristic ([[TextFunctions.bpeTokenEstimate]]) where
  * an actual vocabulary is warranted.
  *
  * Distribution of work, by data size:
  *  - [[wordFreq]] — the CORPUS-sized step: one distributed aggregation
  *    collapsing the corpus to its distinct-word frequency table (the
  *    classic BPE trick: training never re-reads the corpus, only the
  *    frequency table, which is vocabulary-sized — bounded even at 100 TB
  *    and capped explicitly by `topWords`).
  *  - [[train]] — `nMerges` iterations over the (capped) frequency table:
  *    each iteration is one distributed pair-count aggregation + a
  *    one-row argmax collect (control-plane, like every bounded collect in
  *    this codebase) + a narrow map applying the merge. The table is
  *    re-pinned per iteration so each job reads the previous state, not a
  *    growing replay chain.
  *  - encoding — per-row native expressions
  *    ([[org.apache.spark.sql.graft.BpeTokenCount]]), merges riding inside
  *    the expression like [[org.apache.spark.sql.graft.SetHits]]' word
  *    lists; the corpus is never joined or shuffled to be tokenized.
  *
  * Symbol-state representation (shared with the SQL oracle): a word's
  * symbols are kept as the delimited string `(h)(e)(l)(l)(o)`, and a merge
  * (a, b) is applied as the plain string replace `(a)(b)` → `(ab)`. On
  * this representation non-overlapping left-to-right replace IS the
  * reference implementation's greedy scan (adjacent matches share no
  * characters), so DuckDB's `replace` replays training exactly — no
  * approximation at the gate.
  *
  * Pre-tokenization: lowercase `[a-z]+` runs (punctuation and digits are
  * word boundaries). Tie-break for the argmax: (count DESC, left ASC,
  * right ASC) — total order, so training is deterministic by construction.
  *
  * Reference surface: the reference engine exposes no tokenizer; this is
  * part of the training-data extension mandate (SURVEY §6). */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String)

  /** Distinct-word frequency table of a text corpus: `(word, cnt)`.
    * One shuffle on the word — partial-aggregated map-side first. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** The delimited symbol-state of a word: "hello" → "(h)(e)(l)(l)(o)". */
  private def charSyms(word: org.apache.spark.sql.Column) =
    regexp_replace(word, "(.)", "($1)")

  /** Learn `nMerges` merges from a word-frequency table, highest-frequency
    * pair first. `topWords` caps the trainer's working set (count DESC,
    * word ASC — deterministic): the cap is the explicit scale bound, like
    * the union-find edge cap in [[Dedup]].
    *
    * Returns the merge sequence in rank order. */
  def train(
      wordFreq: DataFrame,
      nMerges: Int,
      topWords: Int = 4096): Seq[Merge] = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val spark = wordFreq.sparkSession
    var words = wordFreq
      .orderBy(col("cnt").desc, col("word").asc).limit(topWords)
      .select(charSyms(col("word")).as("syms"), col("cnt"))
      .cache()
    val merges = Seq.newBuilder[Merge]
    try {
      var rank = 1
      var exhausted = false
      while (rank <= nMerges && !exhausted) {
        // adjacent symbol pairs, weighted by word count — one distributed
        // aggregation per iteration over the vocabulary-sized table
        val arr = split(expr("substring(syms, 2, length(syms) - 2)"), "\\)\\(")
        val pairs = words
          .select(col("cnt"), explode(zip_with(
            slice(arr, lit(1), greatest(size(arr) - 1, lit(0))),
            slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("c"))
        val best = pairs
          .orderBy(col("c").desc, col("a").asc, col("b").asc)
          .limit(1).collect() // 1-row argmax: control-plane
        if (best.isEmpty) exhausted = true
        else {
          val a = best(0).getString(0)
          val b = best(0).getString(1)
          merges += Merge(rank, a, b)
          // apply the merge: the shared-representation string replace;
          // re-pin so the next iteration reads state, not a replay chain
          val next = words
            .withColumn("syms", org.apache.spark.sql.functions.replace(
              col("syms"), lit(s"($a)($b)"), lit(s"(${a + b})")))
            .cache()
          next.count() // materialize before dropping the parent pin
          words.unpersist()
          words = next
          rank += 1
        }
      }
      merges.result()
    } finally words.unpersist()
  }

  /** The merge sequence as a DataFrame `(rank, left, right)` — the
    * persistable vocabulary artifact. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right)).toDF("rank", "left", "right")
  }

  /** Persist a trained vocabulary as a versioned [[TableStore]] table. */
  def save(spark: SparkSession, merges: Seq[Merge], store: TableStore, name: String): Unit =
    store.write(mergesDf(spark, merges), name)

  /** Load a persisted vocabulary in rank order. */
  def load(spark: SparkSession, store: TableStore, name: String): Seq[Merge] =
    store.read(spark, name)
      .orderBy(col("rank"))
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq

  /** Merge list in the shape the native encoder expressions take. */
  def mergePairs(merges: Seq[Merge]): Seq[(String, String)] =
    merges.sortBy(_.rank).map(m => (m.left, m.right))
}
