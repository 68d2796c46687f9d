package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus vocabulary statistics: n-gram frequencies and heavy hitters.
  *
  * Building a tokenizer vocabulary (or auditing corpus composition) needs
  * "count every n-gram across 100 TB, keep the top k". The whole cost model
  * is the one aggregation:
  *
  *  - the explode emits n-gram occurrences as narrow (string) rows and
  *    feeds a hash aggregation with MAP-SIDE PARTIAL COMBINE, so hot
  *    n-grams ("of the") collapse to one partial row per task before the
  *    shuffle — the classic heavy-hitter skew never reaches a reducer;
  *  - top-k is `TakeOrderedAndProject`: each partition ships only its local
  *    top k to the driver (k rows × partitions, never the full vocabulary);
  *  - ties at the boundary break deterministically (count desc, n-gram asc)
  *    so the result is stable across layouts and replayable in SQL.
  *
  * Reference scope: the reference's summary/profiling queries over synced
  * tables (control_migration_schema_script.sql:516–540), extended to corpus
  * vocabulary per SURVEY §2.
  */
object Vocab {

  /** Full n-gram frequency table `(ngram, n_occurrences)` — every
    * occurrence counts (not per-doc distinct). One shuffle, partial-agg
    * combined. */
  def ngramCounts(df: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    df.select(explode(TextFunctions.wordShingles(col(textCol), n)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** The `k` most frequent n-grams, ties broken by n-gram text ascending. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    ngramCounts(df, textCol, n)
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
  }

  /** Per-document mean unigram surprisal — the cheap LM-perplexity quality
    * proxy corpus pipelines filter on (CCNet-style: score docs under a
    * corpus LM, drop the tails): the corpus's add-1-smoothed unigram model
    * `p(t) = (c(t)+1) / (T+V)` scores each document as
    * `Σ tf_d(t)·(−ln p(t)) / Σ tf_d(t)`. High = OOV/gibberish-heavy; very
    * low = boilerplate of the corpus's most common tokens. Docs with no
    * tokens drop out (no distribution to score under).
    *
    * Scale: the corpus tokenizes ONCE into pinned (doc, term, tf) rows
    * feeding both the corpus counts and the scoring join; totals are a
    * broadcast 1-row aggregate (plan stays lazy — no driver count); the
    * scoring join shuffles on `term` with partial aggregation on both
    * sides. Output: `(idCol, n_tokens, surprisal)`. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String)(
      implicit caches: CacheScope): DataFrame = {
    val tf = caches.pin(df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf")))
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val totals = cf.agg(sum(col("cf")).as("_t"), count(lit(1)).as("_v"))
    val nll = cf.crossJoin(broadcast(totals))
      .withColumn("nll", -log((col("cf") + lit(1d)) / (col("_t") + col("_v"))))
      .select(col("term"), col("nll"))
    tf.join(nll, Seq("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        (sum(col("tf") * col("nll")) / sum(col("tf"))).as("surprisal"))
  }

  /** Per-document mean BIGRAM surprisal — the context-aware upgrade of
    * [[unigramSurprisal]] (one more Markov order of the same CCNet-style
    * proxy): the corpus's add-1-smoothed bigram model
    * `p(w|v) = (c(v,w)+1) / (c(v·)+V)` scores each document as the
    * tf-weighted mean `−ln p(w|v)` over its bigram positions. Scrambled
    * token ORDER — which a unigram model cannot see — now scores high;
    * boilerplate word sequences score low. Docs with fewer than two
    * tokens have no bigram to score and drop out.
    *
    * Scale: same shape as the unigram model, one order up — the corpus
    * explodes ONCE into pinned (doc, bigram, bf) rows feeding the corpus
    * counts and the scoring join; history totals `c(v·)` reduce from the
    * bigram counts (never a second text scan); the vocabulary size is a
    * broadcast 1-row aggregate. The model table is one row per DISTINCT
    * corpus bigram — big, but it stays distributed (shuffle join on the
    * bigram), never on the driver. Output: `(idCol, n_bigrams,
    * surprisal)`. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String)(
      implicit caches: CacheScope): DataFrame = {
    val bf = caches.pin(df
      .select(col(idCol), explode(TextFunctions.wordShingles(col(textCol), 2)).as("bg"))
      .groupBy(col(idCol), col("bg"))
      .agg(count(lit(1)).as("bf")))
    val cbg = bf.groupBy(col("bg")).agg(sum(col("bf")).as("cbg"))
      .withColumn("v", split(col("bg"), " ").getItem(0))
    val hist = cbg.groupBy(col("v")).agg(sum(col("cbg")).as("cv"))
    // vocabulary size (distinct unigrams, same filter as the unigram
    // model) as a broadcast 1-row aggregate — the plan stays lazy
    val vocab = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .agg(count_distinct(col("term")).as("_vs"))
    val nll = cbg.join(hist, Seq("v"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll", -log((col("cbg") + lit(1d)) / (col("cv") + col("_vs"))))
      .select(col("bg"), col("nll"))
    bf.join(nll, Seq("bg"))
      .groupBy(col(idCol))
      .agg(sum(col("bf")).as("n_bigrams"),
        (sum(col("bf") * col("nll")) / sum(col("bf"))).as("surprisal"))
  }

  /** Per-document distinctive terms: top `k` unigrams by smoothed TF-IDF
    * (`tf × (ln((N+1)/(df+1)) + 1)`), ties broken by term ascending.
    *
    * Three aggregations, all partial-combined: term frequency per (doc,
    * term); document frequency per term (over the same counted rows — the
    * corpus is tokenized ONCE); a shuffle join on term attaches idf. The
    * final top-k is a window over per-doc partitions — bounded by document
    * length, never a global sort. Output: `(idCol, term, tf, score, rank)`.
    */
  def topTfIdfTerms(df: DataFrame, idCol: String, textCol: String, k: Int)(
      implicit caches: CacheScope): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the (doc, term) counts feed the corpus-size count, the doc-frequency
    // aggregation AND the scoring join — pin so the corpus tokenizes once
    val tf = caches.pin(df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf")))
    // corpus size as a broadcast 1-row aggregate, NOT a driver count():
    // building the plan stays lazy (no Spark job at construction time)
    val nDocs = tf.agg(count_distinct(col(idCol)).as("_n"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        log((col("_n") + lit(1d)) / (col("df") + lit(1d))) + lit(1d))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rank"))
  }
}
