package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Ranked retrieval over the document corpus.
  *
  * BM25 (Robertson & Zaragoza, "The Probabilistic Relevance Framework:
  * BM25 and Beyond", FnTIR 2009) is the standard lexical ranking function
  * — the retrieval side of a decontamination / nearest-neighbour audit
  * pipeline, and the text-search sibling of the embedding ANN family
  * (q18/q29/q30): same "top-k most relevant corpus rows for a probe"
  * contract, scored on terms instead of vectors.
  *
  * Scale shape: because the query-term set is tiny (a handful of
  * literals), per-document term frequencies are computed with a NARROW
  * `size(filter(tokens, = term))` pass — no explode, no (doc, term)
  * shuffle, unlike the full tf-idf matrix of q51 which must materialize
  * every term. Corpus statistics (N, avgdl, per-term document frequency)
  * reduce to ONE row, rejoined by broadcast; the final top-k is a
  * `TakeOrderedAndProject`, which never sorts the full corpus on one
  * node. Net: two narrow passes + a 1-row broadcast + a bounded top-k —
  * no wide shuffle anywhere, at any corpus size.
  */
object Retrieval {

  /** Top-`k` documents for `queryTerms` under BM25.
    *
    * Output: (doc_id, n_match_terms, bm25) ordered by rounded score desc,
    * id asc — rounding BEFORE ordering so the tie-break is identical in
    * any replaying engine.
    *
    * @param queryTerms deduplicated internally; scored in sorted order so
    *                   the floating-point sum replays exactly in SQL
    * @param k1 term-frequency saturation (BM25 default 1.2)
    * @param b  length-normalization strength (BM25 default 0.75)
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = queryTerms.map(_.toLowerCase).distinct.sorted
    def tfCol(t: String) = s"_tf_$t"

    // pass 1 (narrow): doc length + one tf counter per query term
    val toks = filter(TextFunctions.tokens(col(textCol)), t => length(t) > 0)
    val perDoc = terms.foldLeft(
        docs.select(col(idCol).as("doc_id"), toks.as("_toks"))
          .withColumn("_dl", size(col("_toks")))) { (df, term) =>
        df.withColumn(tfCol(term),
          size(filter(col("_toks"), t => t === lit(term))).cast("long"))
      }.drop("_toks")

    // pass 2: corpus stats — ONE row (N, Σdl, df per term), broadcast back.
    // avgdl is derived as exact-long Σdl / N in both engines, never avg(),
    // whose accumulation order is engine-specific.
    val aggs = sum(col("_dl").cast("long")).as("_sum_dl") +:
      terms.map(t => sum(when(col(tfCol(t)) > 0, 1L).otherwise(0L)).as(s"_df_$t"))
    val stats = perDoc.agg(count(lit(1)).as("_n"), aggs: _*)

    val joined = perDoc.crossJoin(broadcast(stats))
    val n = col("_n").cast("double")
    val avgdl = col("_sum_dl").cast("double") / n
    // fixed (sorted-term) summation order: FP addition is not associative,
    // so the oracle must add in the same order — it does, by construction
    val score = terms.map { t =>
      val tf = col(tfCol(t)).cast("double")
      val dfq = col(s"_df_$t").cast("double")
      val idf = log(lit(1.0) + (n - dfq + lit(0.5)) / (dfq + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl") / avgdl))
    }.reduce(_ + _)
    val nMatch = terms.map(t => when(col(tfCol(t)) > 0, 1).otherwise(0))
      .reduce(_ + _)

    joined
      .select(col("doc_id"), nMatch.as("n_match_terms"),
        round(score, 6).as("bm25"))
      .filter(col("n_match_terms") > 0)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }
}
