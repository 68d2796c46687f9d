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
    // per-term work columns are keyed by the term's index in the sorted
    // list, never by the raw term: a term like "v1.0" would otherwise
    // produce a column name that `col(...)` parses as nested-field access
    val termIdx = terms.zipWithIndex.toMap
    def tfCol(t: String) = s"_tf_${termIdx(t)}"
    def dfCol(t: String) = s"_df_${termIdx(t)}"

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
      terms.map(t => sum(when(col(tfCol(t)) > 0, 1L).otherwise(0L)).as(dfCol(t)))
    val stats = perDoc.agg(count(lit(1)).as("_n"), aggs: _*)

    val joined = perDoc.crossJoin(broadcast(stats))
    val n = col("_n").cast("double")
    val avgdl = col("_sum_dl").cast("double") / n
    // fixed (sorted-term) summation order: FP addition is not associative,
    // so the oracle must add in the same order — it does, by construction
    val score = terms.map { t =>
      val tf = col(tfCol(t)).cast("double")
      val dfq = col(dfCol(t)).cast("double")
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

  /** Batch BM25: top-`k` corpus documents for EVERY probe in a probe
    * TABLE — the decontamination-audit shape ([[bm25TopK]]'s stated
    * purpose) run the way a 100 TB audit actually runs it: thousands of
    * benchmark probes scored at once, not one literal term list per
    * invocation. The batch-vs-corpus sibling of
    * [[Dedup.minhashLshPairsAgainst]].
    *
    * Scale shape — an inverted index, built once per call:
    *   1. postings: explode tokens → one `groupBy(doc, term)` shuffle
    *      (the index build — the cost every batch retrieval must pay
    *      once, amortized over all probes; a literal term list never
    *      needs it, which is why [[bm25TopK]] stays narrow).
    *   2. per-term document frequency: a groupBy over postings keyed on
    *      term — vocabulary-sized, broadcast onto the probe terms.
    *   3. probe terms (exploded, deduplicated — tiny) broadcast-join the
    *      postings on term: only postings of probed terms survive, so
    *      the scored volume is Σ_t df(t) over probe terms, never
    *      probes × corpus.
    *   4. per-(probe, doc) score: contributions folded in sorted-term
    *      order over a ≤|probe-terms| collected array (FP addition is
    *      order-sensitive; the oracle replays the same order), then a
    *      [[org.apache.spark.sql.graft.TopKPairs]] partial top-k per
    *      probe — k rows per (probe, partition) reach the final shuffle.
    *
    * `maxDfFrac` is the hot-postings guard (stopword pruning, standard in
    * IR): probe terms appearing in more than that fraction of the corpus
    * are dropped from scoring — their postings lists are the |corpus|-
    * sized skew buckets, and their idf ≈ 0 contributes nothing but cost.
    * Default 1.0 keeps every term.
    *
    * Output: (probe_id, doc_id, n_match_terms, bm25) — per probe, the
    * top-k docs by rounded score desc, doc_id asc (rounding BEFORE
    * ranking, as in [[bm25TopK]]).
    *
    * @param probes one row per probe; `probeTermsCol` is an
    *               `array<string>` of query terms (lower-cased and
    *               deduplicated internally)
    */
  def bm25Against(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeIdCol: String,
      probeTermsCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      maxDfFrac: Double = 1.0)(implicit caches: CacheScope): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")

    // corpus pass: tokens + doc length, then the one (doc, term) shuffle.
    // The postings feed BOTH the per-term df aggregate and the scoring
    // join — pinned (scoped), or the tokenize+explode+aggregate chain
    // runs twice end-to-end.
    val toks = filter(TextFunctions.tokens(col(textCol)), t => length(t) > 0)
    val tokenized = docs.select(col(idCol).as("doc_id"), toks.as("_toks"))
      .withColumn("_dl", size(col("_toks")).cast("long"))
    val postings = caches.pin(tokenized
      .select(col("doc_id"), col("_dl"), explode(col("_toks")).as("term"))
      .groupBy(col("doc_id"), col("_dl"), col("term")) // _dl functional on doc_id
      .agg(count(lit(1)).as("_tf")))
    // corpus stats: ONE row (N, Σdl); df per term: vocabulary-sized
    val stats = tokenized.agg(count(lit(1)).as("_n"),
      sum(col("_dl")).as("_sum_dl"))
    val termDf = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("_df")) // postings are unique per (doc, term)
    bm25ScoreAndTopK(postings, probeTerms(probes, probeIdCol, probeTermsCol,
      termDf, stats, maxDfFrac), k, k1, b)
  }

  /** Probe terms exploded + deduplicated, df/corpus stats attached and
    * the hot-postings guard applied — tiny (≤ probes × terms rows). */
  private[operators] def probeTerms(
      probes: DataFrame,
      probeIdCol: String,
      probeTermsCol: String,
      termDf: DataFrame,
      stats: DataFrame,
      maxDfFrac: Double): DataFrame =
    probes
      .select(col(probeIdCol).as("probe_id"),
        explode(col(probeTermsCol)).as("term"))
      .select(col("probe_id"), lower(col("term")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .join(termDf, Seq("term")) // unseen terms score 0 everywhere — drop
      .crossJoin(broadcast(stats))
      .filter(col("_df").cast("double") <= lit(maxDfFrac) * col("_n").cast("double"))

  /** The shared scoring tail of batch BM25 — steps 3–4 of
    * [[bm25Against]]'s plan, factored so [[PostingsIndex.topK]] serves
    * the IDENTICAL math (and therefore the identical oracle) from
    * committed postings instead of a per-call index build.
    *
    * `postings` is `(doc_id, _dl, term, _tf)`; `probeTerms` is
    * `(probe_id, term, _df, _n, _sum_dl)` — tiny, broadcast onto the
    * postings. */
  private[operators] def bm25ScoreAndTopK(
      postings: DataFrame,
      probeTerms: DataFrame,
      k: Int,
      k1: Double,
      b: Double)(implicit caches: CacheScope): DataFrame = {
    // score contributions: probe terms (broadcast) × their postings
    val n = col("_n").cast("double")
    val avgdl = col("_sum_dl").cast("double") / n
    val tf = col("_tf").cast("double")
    val dfq = col("_df").cast("double")
    val idf = log(lit(1.0) + (n - dfq + lit(0.5)) / (dfq + lit(0.5)))
    val contrib = idf * (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl").cast("double") / avgdl))
    // pinned: consumed by the per-probe top-k AND the n_match rejoin
    val scored = caches.pin(postings.join(broadcast(probeTerms), Seq("term"))
      .select(col("probe_id"), col("doc_id"), col("term"), contrib.as("_c"))
      // fold contributions in sorted-term order (≤ |probe terms| per pair)
      // so the FP sum replays exactly in any engine that can order its sum
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_match_terms"),
        aggregate(sort_array(collect_list(struct(col("term"), col("_c")))),
          lit(0.0), (acc, x) => acc + x.getField("_c")).as("_score"))
      .withColumn("bm25", round(col("_score"), 6)))

    // per-probe top-k: partial buffers combine map-side; only k rows per
    // (probe, partition) reach the last shuffle
    val topk = scored.groupBy(col("probe_id"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs(col("bm25"), col("doc_id"), k).as("_tk"))
      .select(col("probe_id"), explode(col("_tk")).as("_e"))
      .select(col("probe_id"), col("_e.neighbor_id").as("doc_id"))
    // rejoin for n_match_terms: topk is ≤ k·probes rows — broadcast it
    scored.join(broadcast(topk), Seq("probe_id", "doc_id"))
      .select(col("probe_id"), col("doc_id"), col("n_match_terms"), col("bm25"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal
    * rank fusion outperforms Condorcet and individual rank learning
    * methods", SIGIR 2009) of N ranked retrieval legs — the standard
    * hybrid-retrieval combiner, lexical BM25 + embedding ANN being the
    * canonical pair: each leg contributes `1 / (kRrf + rank)` per
    * (probe, doc); a doc missing from a leg simply contributes nothing
    * (no imputed rank), and fused docs rank by the summed score with the
    * engine-wide (score desc, doc_id asc) tie-break.
    *
    * Every leg carries `(probe_id, doc_id, rank)` — rank 1-based within
    * its probe. Contributions fold in LEG ORDER (the
    * [[bm25ScoreAndTopK]] sorted-sum discipline) so the floating-point
    * sum replays exactly in any engine that can order its aggregates —
    * though each addend is a pure function of an integer rank, so the
    * fused doubles are engine-independent to the last bit anyway.
    *
    * Scale shape: the inputs are ALREADY top-k-sized (≤ legs × probes ×
    * k rows — each retriever did its own corpus work); fusion is one
    * hash exchange on (probe_id, doc_id) plus the
    * [[org.apache.spark.sql.graft.TopKPairs]] partial top-k per probe.
    * Nothing here touches the corpus, at any corpus size.
    *
    * Output: (probe_id, doc_id, n_legs, rrf, rrf_rank), `rrf` rounded to
    * 6, ranked on the raw fused score. */
  def rrfFuse(legs: Seq[DataFrame], kRrf: Int = 60, k: Int = 10)(
      implicit caches: CacheScope): DataFrame =
    rrfFuseWeighted(legs.map(_ -> 1.0), kRrf, k)

  /** [[rrfFuse]] with a per-leg weight — the standard production knob
    * (e.g. lexical 0.7 / vector 0.3 when one retriever is trusted more):
    * each leg contributes `w / (kRrf + rank)`. Weight 1.0 on every leg is
    * BIT-IDENTICAL to [[rrfFuse]] (`w / x` with w = 1.0 is the same IEEE
    * division), so the unweighted oracle discipline carries over; any
    * other weights stay engine-replayable for the same reason the
    * unweighted form is — each addend is a pure function of an integer
    * rank and a constant. Zero-weight legs are allowed (they contribute
    * nothing but still count in `n_legs`); negative weights are refused. */
  def rrfFuseWeighted(
      legs: Seq[(DataFrame, Double)], kRrf: Int = 60, k: Int = 10)(
      implicit caches: CacheScope): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    require(kRrf >= 0, s"kRrf must be >= 0, got $kRrf")
    require(k >= 1, s"k must be >= 1, got $k")
    require(legs.forall(_._2 >= 0.0),
      s"leg weights must be >= 0, got ${legs.map(_._2).mkString(",")}")
    val tagged = legs.zipWithIndex.map { case ((df, w), i) =>
      df.select(col("probe_id"), col("doc_id"), lit(i).as("_leg"),
        (lit(w) / (lit(kRrf.toDouble) + col("rank").cast("double"))).as("_c"))
    }.reduce(_ unionByName _)
    // pinned: feeds the per-probe top-k AND the n_legs rejoin
    val fused = caches.pin(tagged
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_legs"),
        aggregate(sort_array(collect_list(struct(col("_leg"), col("_c")))),
          lit(0.0), (acc, x) => acc + x.getField("_c")).as("_rrf")))
    val top = fused.groupBy(col("probe_id"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs(col("_rrf"), col("doc_id"), k).as("_tk"))
      .select(col("probe_id"), posexplode(col("_tk")).as(Seq("_i", "_e")))
      .select(col("probe_id"), col("_e.neighbor_id").as("doc_id"),
        (col("_i") + 1).as("rrf_rank"))
    // rejoin for n_legs + the fused score: top is ≤ k·probes rows
    fused.join(broadcast(top), Seq("probe_id", "doc_id"))
      .select(col("probe_id"), col("doc_id"), col("n_legs"),
        round(col("_rrf"), 6).as("rrf"), col("rrf_rank"))
  }
}
