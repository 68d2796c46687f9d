package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Four families, each designed shuffle-bounded for 100 TB (SURVEY §7.4-6 —
  * never a crossJoin beyond test scale):
  *
  *  - EXACT: hash-groupBy on a content fingerprint — one shuffle on the
  *    md5, map-side partial agg for the counts.
  *  - N-GRAM JACCARD (exact pairs): inverted-index self-join on shingles —
  *    cost is Σ|posting list|², sparse in real corpora; a frequency cap on
  *    pathological shingles bounds skew.
  *  - MINHASH + LSH (approximate pairs): signature → bands → bucket join —
  *    the classic shuffle-bounded near-dup at scale; candidates verified
  *    with exact Jaccard so no false positives survive.
  *  - SIMHASH: 64-bit signature, exact-match grouping or banded Hamming
  *    search.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct fingerprint with the
    * representative (minimum) id and the duplicate count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: keep the lowest-id row per fingerprint. One shuffle with
    * map-side partial min_by — duplicate clusters collapse inside each task
    * before shuffling, so even a pathological million-copy document costs
    * one row per partition. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(fingerprint(col(textCol)).as("_fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_keep"))
      .select(cols.map(c => col(s"_keep.$c").as(c)): _*)
  }

  /** Exact n-gram Jaccard similar pairs (a_id < b_id, jaccard ≥ threshold)
    * via inverted-index join — no crossJoin; complexity is bounded by
    * posting-list sizes. `maxShinglePostings` drops shingles shared by more
    * than that many docs (stopword-like shingles that explode the join and
    * barely affect Jaccard). The default is finite ON PURPOSE: an uncapped
    * posting join is quadratic in the hottest shingle's frequency, which at
    * corpus scale is an OOM, not a slowdown — callers wanting exact
    * semantics opt in with Int.MaxValue. */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShinglePostings: Int = 1000)(implicit caches: CacheScope): DataFrame = {
    // 64-bit hashed shingles: same pair counts as string shingles modulo a
    // ~2⁻⁶⁴ collision chance, with far cheaper shuffle keys.
    val docs = df.select(col(idCol).as("id"), hashedShingleSet(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
    // The posting table is read up to three times (hot-shingle aggregation
    // + both sides of the self-join) — pin it so the corpus is scanned
    // and shingled exactly ONCE, the property that matters when the input
    // is the full training corpus. Lifetime: the [[CacheScope]] in implicit
    // scope (a lazy operator can never unpersist safely itself).
    val posts = caches.pin(
      docs.select(col("id"), col("n_sh"), explode(col("sh")).as("shingle")))
    val filtered =
      if (maxShinglePostings == Int.MaxValue) posts
      else {
        val hot = posts.groupBy("shingle").agg(count(lit(1)).as("c"))
          .filter(col("c") > maxShinglePostings).select("shingle")
        // broadcast anti-join over the cached postings — cheap to evaluate
        // on each self-join side, no second shingle pass
        posts.join(broadcast(hot), Seq("shingle"), "left_anti")
      }
    val a = filtered.alias("a"); val b = filtered.alias("b")
    a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "shared", "jaccard")
  }

  /** CONTAINMENT pairs (Broder, SEQUENCES 1997 §2.1): directed near-dup
    * detection by `|A ∩ B| / |A|` — the asymmetric sibling of
    * [[jaccardPairs]] that Jaccard structurally misses: a short document
    * wholly contained in a much longer one (a quoted article inside a
    * commentary page, a paywall stub of the full text, a chapter inside
    * the book) has tiny Jaccard (the union is the big doc) but
    * containment ≈ 1. Curation pipelines drop or down-weight the
    * contained copy; [[nearDedupKeepBest]] composes directly (alias
    * contained→a_id, container→b_id).
    *
    * Same plan as [[jaccardPairs]] — one pinned shingle-posting pass, the
    * hot-shingle cap, one shingle-equi self-join, one pair-grouped count
    * — the only change is the denominator and that BOTH directions are
    * evaluated (a_id < b_id still; the two directed scores ride one row).
    *
    * @return (a_id, b_id, shared, containment_a_in_b, containment_b_in_a)
    *         for pairs where EITHER direction ≥ threshold */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShinglePostings: Int = 1000)(implicit caches: CacheScope): DataFrame = {
    val docs = df.select(col(idCol).as("id"), hashedShingleSet(col(textCol), n).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)
    val posts = caches.pin(
      docs.select(col("id"), col("n_sh"), explode(col("sh")).as("shingle")))
    val filtered =
      if (maxShinglePostings == Int.MaxValue) posts
      else {
        val hot = posts.groupBy("shingle").agg(count(lit(1)).as("c"))
          .filter(col("c") > maxShinglePostings).select("shingle")
        posts.join(broadcast(hot), Seq("shingle"), "left_anti")
      }
    val a = filtered.alias("a"); val b = filtered.alias("b")
    a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("containment_a_in_b", col("shared").cast("double") / col("na"))
      .withColumn("containment_b_in_a", col("shared").cast("double") / col("nb"))
      .filter(col("containment_a_in_b") >= threshold ||
        col("containment_b_in_a") >= threshold)
      .select("a_id", "b_id", "shared", "containment_a_in_b", "containment_b_in_a")
  }

  /** MinHash-LSH candidate pairs verified by signature-estimated Jaccard.
    *
    * Signature of `numHashes` min-hashes split into `bands` bands; docs
    * colliding on any full band become candidates (shuffle on band hash,
    * never all-pairs). Estimated Jaccard = fraction of agreeing signature
    * positions; pairs below `threshold` are dropped.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes must divide into bands=$bands")
    val rows = numHashes / bands
    val sigs = df
      .select(col(idCol).as("id"),
        minhashSignature(col(textCol), shingleN, numHashes).as("sig"))
      .filter(size(col("sig")) > 0) // docs long enough to shingle
    val allBanded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))).as(Seq("band", "bucket")))
    // Skew guard: a band bucket of B docs yields B² candidate rows; buckets
    // beyond the cap are boilerplate clusters that explode the join while
    // adding no dedup precision — drop them (bounded recall loss, standard
    // LSH practice at scale).
    // The banded signature table is read three times (hot-bucket agg + both
    // sides of the self-join); pin it (scoped by the implicit CacheScope) —
    // at cluster scale you would materialize the signature table anyway
    // before pairing.
    val allBanded0 = caches.pin(allBanded)
    val hot = allBanded0.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("band", "bucket")
    val banded = allBanded0.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val a = banded.alias("a"); val b = banded.alias("b")
    // Estimate INSIDE the bucket join (native agreement count — one
    // compiled loop per candidate; a pair colliding in several bands
    // re-scores identically), then threshold + dedup on narrow
    // (id, id, double) rows: the exchange never carries signature arrays.
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        (org.apache.spark.sql.graft.NativeFunctions
          .long_positions_equal(col("a.sig"), col("b.sig")).cast("double") / numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("a_id", "b_id")
  }

  /** Duplicate clusters: connected components over a near-dup pair list
    * (the output of [[jaccardPairs]] / [[minhashLshPairs]] / embedding
    * near-dup), labelling every involved doc with its cluster
    * representative (the minimum id reachable through pair edges). The
    * standard final step of corpus dedup — keep one doc per cluster.
    *
    * Iterative min-label propagation over DataFrames: each round joins the
    * current labels across the (bidirectional) edge list and keeps the
    * smaller label; converges in O(cluster diameter) rounds. Near-dup
    * clusters are shallow (pairs are mutual near-copies), so the round
    * count stays small even at corpus scale; each round is one
    * shuffle-bounded join on ids, and the input is the PAIR list (tiny
    * relative to the corpus), not the corpus itself.
    *
    * @param pairs columns (a_id, b_id); other columns ignored
    * @return (id, cluster_id) for every doc appearing in at least one pair
    */
  def duplicateClusters(
      pairs: DataFrame,
      maxIterations: Int = 20,
      driverUnionFindThreshold: Long = 1000000L): DataFrame = {
    // one scan of the (possibly expensive) pair plan: each pair explodes
    // into both directions — a union of two selects would execute the
    // upstream join twice
    val edges = pairs.select(explode(array(
        struct(col("a_id").as("src"), col("b_id").as("dst")),
        struct(col("b_id").as("src"), col("a_id").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .cache()
    // Hybrid: the pair list is usually tiny relative to the corpus — below
    // the threshold, collect it and run exact union-find on the driver
    // (micro-seconds, no iterative jobs); above it, fall through to the
    // distributed label-propagation loop.
    val nEdges = edges.count()
    if (nEdges <= driverUnionFindThreshold) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val out = parent.keys.toSeq.sorted.map(id => (id, find(id)))
      edges.unpersist(false)
      return out.toDF("id", "cluster_id")
    }
    // Lineage truncation is load-bearing for EVERY iterative DataFrame
    // loop: each round's plan embeds the previous round's, so without a
    // cut the analyzed tree doubles per iteration and Catalyst analysis
    // alone goes exponential long before any data moves. The Pregel idiom:
    // persist each generation's RDD, wrap it in a fresh DataFrame (the
    // plan restarts at a LogicalRDD), and EAGERLY unpersist the superseded
    // generation once the next one is materialized — no waiting on GC +
    // context-cleaner for ~maxIterations generations of storage blocks.
    val spark = pairs.sparkSession
    def materialize(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, df.schema), rdd)
    }
    var (labels, labelsRdd) = materialize(
      edges.select(col("src").as("id")).distinct()
        .withColumn("cluster_id", col("id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // candidate label per node: min of own label and neighbours' labels
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("cluster_id"))
      val (next, nextRdd) = materialize(
        labels.unionByName(viaNeighbors)
          .groupBy("id").agg(min(col("cluster_id")).as("cluster_id")))
      // FULL count, not limit(1): CollectLimit stops after the first
      // partition with a changed row, which would leave parts of `next`
      // unmaterialized — unpersisting `labels` then forces those partitions
      // to recompute through lineage next iteration. The full aggregate
      // evaluates (and caches) every partition of `next` before the old
      // generation is dropped.
      val changed = next.alias("n")
        .join(labels.alias("o"), Seq("id"))
        .filter(col("n.cluster_id") =!= col("o.cluster_id"))
        .count()
      labelsRdd.unpersist(blocking = false)
      labels = next
      labelsRdd = nextRdd
      converged = changed == 0
      iter += 1
    }
    edges.unpersist(false)
    // the returned frame's backing RDD stays persisted (one generation) —
    // dropped by LRU/GC after the caller consumes it
    labels
  }

  /** End-to-end near-duplicate removal — the operator a corpus pipeline
    * actually calls: near-dup pairs → connected components → keep ONE doc
    * per cluster (the minimum id, every cluster's label) and every unpaired
    * doc. This overload uses EXACT n-gram Jaccard pairs ([[jaccardPairs]]) —
    * right up to the scale where the inverted-index join dominates; beyond
    * that, [[nearDedupApprox]] swaps in the MinHash-LSH pair source with the
    * identical cluster/keeper tail. */
  def nearDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxShinglePostings: Int = 1000)(implicit caches: CacheScope): DataFrame =
    nearDedupFromPairs(df, idCol,
      jaccardPairs(df, idCol, textCol, n, threshold, maxShinglePostings))

  /** [[nearDedup]] with the 100 TB pair source: MinHash-LSH candidates
    * ([[minhashLshPairs]]) instead of the exact inverted-index join. Cost is
    * one signature pass plus a band-bucket join — never quadratic in a hot
    * shingle's posting list. Approximation is inherited from the pair
    * source: pairs are judged by signature-estimated Jaccard, so recall
    * (and, rarely, precision) deviates from [[nearDedup]] by the standard
    * MinHash error bounds; keepers are otherwise computed identically. */
  def nearDedupApprox(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame =
    nearDedupFromPairs(df, idCol,
      minhashLshPairs(df, idCol, textCol, shingleN, numHashes, bands, threshold, maxBucketSize))

  /** Shared keeper tail for any pair source — (a_id, b_id) pairs from
    * [[jaccardPairs]], [[minhashLshPairs]], [[simhashPairs]] or
    * [[Similarity.cosineNearDupPairs]] (aliased to a_id/b_id): cluster,
    * drop every doc that isn't its cluster's minimum id, anti-join the
    * (tiny) drop list so the corpus flows through exactly one narrow pass. */
  def nearDedupFromPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drop = duplicateClusters(pairs)
      .filter(col("id") =!= col("cluster_id")) // keep each cluster's min id
      .select(col("id").as("_drop_id"))
    df.join(drop, df(idCol) === col("_drop_id"), "left_anti")
  }

  /** [[nearDedupFromPairs]] with a QUALITY keeper — keep the BEST copy per
    * cluster, not the minimum id: near-duplicates are rarely identical
    * (truncated mirrors, boilerplate-injected rewraps, paywall stubs of
    * full articles), and min-id keeps whichever happened to be crawled
    * first. Curation pipelines keep the argmax of a quality signal
    * instead — length, quality score, source priority (the keeper choice
    * the RefinedWeb/FineWeb corpus builders apply to near-dup clusters).
    *
    * Keeper per cluster = max `scoreCol`, ties by SMALLER id — so a
    * constant score degrades exactly to [[nearDedupFromPairs]] (spec'd).
    * Docs in no pair are untouched. NaN scores lose to any finite score
    * (the [[org.apache.spark.sql.graft.TopKPairs]] buffer drops NaN); a
    * NULL score never reaches the buffer, so an all-NULL/NaN cluster
    * keeps its min id via the join-back described below.
    *
    * Scale: clusters come from the pair list (tiny vs the corpus); the
    * keeper argmax is a k=1 [[org.apache.spark.sql.graft.TopKPairs]]
    * partial-combining aggregate over cluster-member rows only; the
    * corpus flows through exactly one anti-join against the (tiny) drop
    * list — the [[nearDedupFromPairs]] shape plus one narrow score join. */
  def nearDedupKeepBest(
      df: DataFrame, idCol: String, scoreCol: String, pairs: DataFrame): DataFrame = {
    val clusters = duplicateClusters(pairs)
    val scored = clusters.join(
      df.select(col(idCol).as("id"), col(scoreCol).cast("double").as("_score")),
      Seq("id"))
    val keepers = scored
      .filter(!isnull(col("_score")) && !isnan(col("_score")))
      .groupBy(col("cluster_id"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs(col("_score"), col("id"), 1).as("_tk"))
      .select(col("cluster_id"), col("_tk").getItem(0)
        .getField("neighbor_id").as("_keep_id"))
    // join back on cluster_id: clusters whose every score was NULL/NaN
    // have no keeper row — fall back to the min-id keeper (cluster_id)
    val drop = clusters
      .join(keepers, Seq("cluster_id"), "left")
      .filter(col("id") =!= coalesce(col("_keep_id"), col("cluster_id")))
      .select(col("id").as("_drop_id"))
    df.join(drop, df(idCol) === col("_drop_id"), "left_anti")
  }

  /** Cross-document paragraph dedup — RefinedWeb/FineWeb-style boilerplate
    * removal: a paragraph repeated anywhere in the corpus (cookie banners,
    * nav text, license blocks) survives ONLY at its first occurrence in
    * (doc, position) order; every document reassembles from its remaining
    * paragraphs in order. Paragraphs whose trimmed length is below
    * `minParaChars` are exempt (blank lines and separators are formatting,
    * not boilerplate) — eligibility is a function of the content, so a
    * content group is exempt or deduped as a whole.
    *
    * Scale: one explode (narrow, PINNED — it feeds both the keeper
    * aggregate and the join side, so without the pin the corpus would
    * split and explode twice), one aggregation on paragraph content for
    * the first-occurrence keeper (min-struct, partial-combined map-side —
    * a boilerplate paragraph repeated a billion times collapses per task),
    * one join back on content, one per-doc reassembly aggregation.
    *
    * @return (idCol, n_paras_kept, textCol) — docs that lose every
    *         paragraph keep their row with an empty string */
  def paragraphDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minParaChars: Int = 1)(implicit caches: CacheScope): DataFrame = {
    require(minParaChars >= 1, s"minParaChars must be >= 1, got $minParaChars")
    val paras = caches.pin(df.select(col(idCol).as("_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("_idx", "_para"))))
    val eligible = length(trim(col("_para"))) >= minParaChars
    val keepers = paras.filter(eligible)
      .groupBy(col("_para"))
      .agg(min(struct(col("_id"), col("_idx"))).as("_first"))
      .select(col("_para"),
        col("_first._id").as("_kid"), col("_first._idx").as("_kidx"))
    val kept = paras.join(keepers, Seq("_para"), "left")
      .filter(!eligible || (col("_kid") === col("_id") && col("_kidx") === col("_idx")))
    val rebuilt = kept
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("n_paras_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("_idx"), col("_para")))),
          s => s.getField("_para"))).as("_text"))
    df.select(col(idCol)).distinct()
      .join(rebuilt, col(idCol) === col("_id"), "left")
      .select(col(idCol),
        coalesce(col("n_paras_kept"), lit(0L)).as("n_paras_kept"),
        coalesce(col("_text"), lit("")).as(textCol))
  }

  /** Span-level near-dup pairs via winnowing fingerprints
    * ([[graft.functions.TextFunctions.winnowedFingerprints]]): documents
    * sharing ≥ `minShared` selected k-gram-window minima. Catches verbatim
    * copied RUNS (quotes, boilerplate blocks, license headers) that
    * bag-level Jaccard dilutes away in long documents. Same inverted-index
    * shape as [[jaccardPairs]]: postings on the fingerprint hash, hot
    * fingerprints capped, pair counts aggregated — never all-pairs. */
  def winnowingPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      w: Int = 4,
      minShared: Int = 3,
      maxPostings: Int = 100)(implicit caches: CacheScope): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // postings feed the hot-fingerprint agg plus both join sides — pin
    val posts = caches.pin(df.select(col(idCol).as("id"),
      explode(winnowedFingerprints(col(textCol), k, w)).as("f")))
    val hot = posts.groupBy(col("f")).agg(count(lit(1)).as("c"))
      .filter(col("c") > maxPostings).select("f")
    val cold = posts.join(broadcast(hot), Seq("f"), "left_anti")
    cold.alias("a")
      .join(cold.alias("b"),
        col("a.f") === col("b.f") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ------------------------------------------------ incremental ingestion

  /** Banded MinHash signatures `(id, sig, band, bucket)` — the candidate-
    * generation shape shared by the self-join and cross-corpus paths. */
  private def bandedSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    df.select(col(idCol).as("id"),
        minhashSignature(col(textCol), shingleN, numHashes).as("sig"))
      .filter(size(col("sig")) > 0)
      .select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
          .as(Seq("band", "bucket")))
  }

  /** Cross-corpus MinHash-LSH candidates: `(batch_id, corpus_id,
    * est_jaccard)` for batch docs colliding with a corpus doc in any band.
    * Same mechanics as [[minhashLshPairs]] but the join is batch × corpus
    * (no self-pairs): the batch — typically orders of magnitude smaller
    * than the corpus — only meets corpus rows that share a band bucket.
    * Buckets hot on EITHER side are dropped (the product |A|·|B| explodes
    * on whichever side is dense). */
  def minhashLshPairsAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    require(numHashes % bands == 0, s"numHashes=$numHashes must divide into bands=$bands")
    // both banded tables feed a hot-bucket agg plus the join — pin (scoped)
    val sb = caches.pin(bandedSignatures(batch, idCol, textCol, shingleN, numHashes, bands))
    val sc = caches.pin(bandedSignatures(corpus, idCol, textCol, shingleN, numHashes, bands))
    def hotSide(s: DataFrame) = s.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("band", "bucket")
    val hot = hotSide(sb).union(hotSide(sc)).distinct()
    val coldB = sb.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    val coldC = sc.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    coldB.alias("a")
      .join(coldC.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("batch_id"), col("b.id").as("corpus_id"),
        (org.apache.spark.sql.graft.NativeFunctions
          .long_positions_equal(col("a.sig"), col("b.sig")).cast("double") / numHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("batch_id", "corpus_id")
  }

  /** Incremental ingestion dedup: the batch minus (a) docs whose normalized
    * fingerprint already exists in the corpus, (b) later exact copies
    * within the batch itself (minimum id wins), and (c) docs whose MinHash
    * signature near-matches any corpus doc at `threshold`.
    *
    * This is the operator a continuously-fed corpus actually runs: the
    * 100 TB corpus flows through narrow projections only (fingerprints and
    * banded signatures — in production both would be materialized sketch
    * tables, built once per corpus version), the batch is small, and both
    * drop lists end in semi/anti joins against it. Near-dups WITHIN the
    * batch are out of scope by design — run [[nearDedupApprox]] on the
    * batch first; the two compose. */
  def dedupAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      threshold: Double,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    val fpB = batch.select(col(idCol).as("_bid"), fingerprint(col(textCol)).as("_fp"))
    val fpC = corpus.select(fingerprint(col(textCol)).as("_fp")).distinct()
    val exactKeep = fpB
      .join(fpC, Seq("_fp"), "left_anti")
      .groupBy(col("_fp")).agg(min(col("_bid")).as("_keep_id"))
      .select(col("_keep_id"))
    val nearDrop = minhashLshPairsAgainst(batch, corpus, idCol, textCol,
        shingleN, numHashes, bands, threshold, maxBucketSize)
      .select(col("batch_id").as("_near_drop_id")).distinct()
    batch
      .join(exactKeep, batch(idCol) === col("_keep_id"), "left_semi")
      .join(nearDrop, batch(idCol) === col("_near_drop_id"), "left_anti")
  }

  /** SimHash near-dup pairs within `maxHamming` bits, banded: split the
    * 64-bit signature into `maxHamming + 1` chunks — any pair within the
    * distance budget must agree exactly on ≥1 chunk (pigeonhole), so the
    * join is on (chunk index, chunk value), never all-pairs. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame =
    hammingBandedPairs(
      df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig")),
      maxHamming, maxBucketSize)

  /** The chunk-band pigeonhole pair join over ANY 64-bit signature frame
    * `(id, sig)` — the machinery behind [[simhashPairs]], shared by the
    * perceptual-hash image path ([[Multimodal.dHashes]]) and any future
    * bit-signature family: candidates must agree exactly on ≥1 of the
    * `maxHamming + 1` signature chunks, then verify by exact popcount.
    * Same skew guard as MinHash-LSH (hot buckets capped). */
  def hammingBandedPairs(
      sigs: DataFrame,
      maxHamming: Int,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    // maxHamming=0 would make bitsPer=64 and (1L<<64)-1 == 0 (JVM shifts
    // are mod 64), collapsing every signature into bucket 0 — use an exact
    // groupBy on the signature for hamming 0 instead.
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    // chunk c = bits [c*bitsPer, (c+1)*bitsPer): exact unsigned shift + mask,
    // built with Scala-level chunk indices so the shift amount is a literal.
    val chunkCols = (0 until chunks).map(c =>
      shiftrightunsigned(col("sig"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1)))
    // Read three times (hot-bucket agg + both join sides) — pin, as in
    // minhashLshPairs, instead of recomputing the signature scan per read.
    val allBanded = caches.pin(sigs.select(col("id"), col("sig"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "value"))))
    // Same skew guard as MinHash-LSH: cap candidate-bucket size.
    val hot = allBanded.groupBy(col("chunk"), col("value"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("chunk", "value")
    val banded = allBanded.join(broadcast(hot), Seq("chunk", "value"), "left_anti")
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.value") === col("b.value") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }

  /** The AGAINST face of [[hammingBandedPairs]]: batch signatures vs a
    * separate (typically stored) signature table — the screen an image
    * admission pipeline runs, where the corpus side is a persisted
    * `(id, sig)` projection (64 bits per image, rebuilt never) and only
    * the arriving batch is hashed fresh. Same chunk-band pigeonhole, hot
    * buckets capped on BOTH sides ([[minhashLshPairsAgainst]]'s guard).
    *
    * @return (batch_id, stored_id, hamming ≤ maxHamming) */
  def hammingBandedPairsAgainst(
      batch: DataFrame,
      stored: DataFrame,
      maxHamming: Int,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val chunkCols = (0 until chunks).map(c =>
      shiftrightunsigned(col("sig"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1)))
    def banded(sigs: DataFrame) = caches.pin(sigs.select(col("id"), col("sig"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "value"))))
    val sb = banded(batch)
    val sc = banded(stored)
    def hotSide(s: DataFrame) = s.groupBy(col("chunk"), col("value"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("chunk", "value")
    val hot = hotSide(sb).union(hotSide(sc)).distinct()
    val coldB = sb.join(broadcast(hot), Seq("chunk", "value"), "left_anti")
    val coldC = sc.join(broadcast(hot), Seq("chunk", "value"), "left_anti")
    coldB.alias("a")
      .join(coldC.alias("b"),
        col("a.chunk") === col("b.chunk") && col("a.value") === col("b.value"))
      .select(col("a.id").as("batch_id"), col("b.id").as("stored_id"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("batch_id", "stored_id")
      .filter(col("hamming") <= maxHamming)
  }

  /** VIDEO near-dup by frame-aligned perceptual hashes: over a per-frame
    * signature frame `(id, frame, sig)` — the shape
    * [[Multimodal.sampleFrames]] → decode → [[Multimodal.dHashes]]
    * produces — two videos are near-duplicates when at least
    * `minMatchingFrames` of their sampled frames match within the
    * per-frame hamming budget. Midpoint FRACTIONAL sampling (frame i at
    * (i+1/2)/n of the duration) is what aligns frame i across a re-encode
    * or container remux of the same content regardless of fps, so the
    * frame index joins positionally. Candidates ride the same chunk-band
    * pigeonhole as [[hammingBandedPairs]], with the frame index IN the
    * band key — buckets never mix frames, so the skew cap and the
    * candidate count stay per-frame. The per-pair vote is one
    * count-distinct-frames aggregate: a clip sharing only its intro
    * frames with a longer video stays below the threshold (the directed
    * containment case is [[videoContainmentPairs]]' job, not this one's).
    *
    * @param frameSigs (id, frame, sig) — one 64-bit signature per sampled
    *                  frame; 8 bytes × n frames per video is the entire
    *                  state, so a 100 TB video corpus screens from a
    *                  signature table in the low GBs
    * @return (a_id, b_id, n_matching_frames ≥ minMatchingFrames), a < b */
  def videoNearDupPairs(
      frameSigs: DataFrame,
      maxHamming: Int,
      minMatchingFrames: Int,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    require(minMatchingFrames >= 1, "need a positive frame-match threshold")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val chunkCols = (0 until chunks).map(c =>
      shiftrightunsigned(col("sig"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1)))
    val banded = caches.pin(frameSigs.select(col("id"), col("frame"), col("sig"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "value"))))
    val hot = banded.groupBy(col("frame"), col("chunk"), col("value"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("frame", "chunk", "value")
    val cold = banded.join(broadcast(hot), Seq("frame", "chunk", "value"), "left_anti")
    cold.alias("a")
      .join(cold.alias("b"),
        col("a.frame") === col("b.frame") && col("a.chunk") === col("b.chunk") &&
          col("a.value") === col("b.value") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.frame").as("frame"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("a_id", "b_id", "frame")
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_matching_frames"))
      .filter(col("n_matching_frames") >= minMatchingFrames)
  }

  /** DIRECTED video containment — the clip-inside-a-longer-video case
    * [[videoNearDupPairs]]' symmetric m-of-n vote is spec'd to miss (its
    * scaladoc routes it here): per video pair, the fraction of EACH
    * side's frames that match ANY frame of the other within the hamming
    * budget — [[containmentPairs]]' directed denominator (Broder 1997's
    * |A∩B|/|A|) on the frame-signature family. A 2-frame clip cut from a
    * 6-frame video scores containment 1.0 on the clip side while the
    * symmetric vote sees only 2 matching frames and stays silent.
    *
    * Candidates ride the same chunk-band pigeonhole WITHOUT the frame
    * index in the band key — containment is any-frame-to-any-frame
    * (a clip's frame 0 may be the source's frame 3; positional alignment
    * is exactly what a cut breaks), so buckets mix frames and the hot
    * cap guards the denser join. Both directions land on one (a < b)
    * row; the pair survives when EITHER direction reaches
    * `minContainment`.
    *
    * @param frameSigs (id, frame, sig) — [[videoNearDupPairs]]'s input
    * @return (a_id, b_id, n_frames_a, n_frames_b, containment_a,
    *         containment_b), a < b, greatest(containments) ≥
    *         minContainment */
  def videoContainmentPairs(
      frameSigs: DataFrame,
      maxHamming: Int,
      minContainment: Double,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0, 1], got $minContainment")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val chunkCols = (0 until chunks).map(c =>
      shiftrightunsigned(col("sig"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1)))
    val pinned = caches.pin(frameSigs.select(col("id"), col("frame"), col("sig")))
    val banded = caches.pin(pinned.select(col("id"), col("frame"), col("sig"),
      posexplode(array(chunkCols: _*)).as(Seq("chunk", "value"))))
    val hot = banded.groupBy(col("chunk"), col("value"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("chunk", "value")
    val cold = banded.join(broadcast(hot), Seq("chunk", "value"), "left_anti")
    val matched = cold.alias("a")
      .join(cold.alias("b"),
        col("a.chunk") === col("b.chunk") && col("a.value") === col("b.value") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.frame").as("a_frame"), col("b.frame").as("b_frame"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("a_id", "b_id", "a_frame", "b_frame")
      .filter(col("hamming") <= maxHamming)
    val perPair = matched.groupBy(col("a_id"), col("b_id"))
      .agg(countDistinct(col("a_frame")).as("_ma"),
        countDistinct(col("b_frame")).as("_mb"))
    // per-video frame counts: one small aggregate, broadcast twice
    val counts = pinned.groupBy(col("id"))
      .agg(countDistinct(col("frame")).as("_nf"))
    perPair
      .join(broadcast(counts.select(col("id").as("a_id"), col("_nf").as("n_frames_a"))),
        Seq("a_id"))
      .join(broadcast(counts.select(col("id").as("b_id"), col("_nf").as("n_frames_b"))),
        Seq("b_id"))
      .select(col("a_id"), col("b_id"), col("n_frames_a"), col("n_frames_b"),
        (col("_ma").cast("double") / col("n_frames_a")).as("containment_a"),
        (col("_mb").cast("double") / col("n_frames_b")).as("containment_b"))
      .filter(greatest(col("containment_a"), col("containment_b")) >= minContainment)
  }

  /** The AGAINST face of [[videoContainmentPairs]] — the video admission
    * screen: per (arriving video, stored video), the fraction of the
    * ARRIVAL's frames matching any stored frame within the hamming
    * budget. An arrival contained in the corpus (a re-encode, a cut
    * clip, a perturbed copy) scores ≥ `minContainment` against its
    * source and is rejected by the caller's aggregate; an arrival that
    * merely OVERLAPS (shares an intro) scores its true fraction and
    * admits — new content is never blocked by a shared prefix. Stored
    * state is 8 bytes × n frames per corpus video, never re-decoded;
    * the directed denominator is the ARRIVAL's frame count (rejecting
    * is about what the arrival adds, not what the corpus contains).
    *
    * @param batch  (id, frame, sig) of the arriving videos
    * @param stored (id, frame, sig) of the corpus
    * @return (batch_id, stored_id, n_frames_batch, n_matched,
    *         containment ≥ minContainment) */
  def videoContainmentAgainst(
      batch: DataFrame,
      stored: DataFrame,
      maxHamming: Int,
      minContainment: Double,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0, 1], got $minContainment")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val chunkCols = (0 until chunks).map(c =>
      shiftrightunsigned(col("sig"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1)))
    val batchPinned = caches.pin(batch.select(col("id"), col("frame"), col("sig")))
    def banded(sigs: DataFrame) = caches.pin(
      sigs.select(col("id"), col("frame"), col("sig"),
        posexplode(array(chunkCols: _*)).as(Seq("chunk", "value"))))
    val sb = banded(batchPinned)
    val sc = banded(stored)
    def hotSide(s: DataFrame) = s.groupBy(col("chunk"), col("value"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("chunk", "value")
    val hot = hotSide(sb).union(hotSide(sc)).distinct()
    val coldB = sb.join(broadcast(hot), Seq("chunk", "value"), "left_anti")
    val coldC = sc.join(broadcast(hot), Seq("chunk", "value"), "left_anti")
    val matched = coldB.alias("a")
      .join(coldC.alias("b"),
        col("a.chunk") === col("b.chunk") && col("a.value") === col("b.value"))
      .select(col("a.id").as("batch_id"), col("b.id").as("stored_id"),
        col("a.frame").as("b_frame"), col("b.frame").as("s_frame"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("batch_id", "stored_id", "b_frame", "s_frame")
      .filter(col("hamming") <= maxHamming)
    val perPair = matched.groupBy(col("batch_id"), col("stored_id"))
      .agg(countDistinct(col("b_frame")).as("n_matched"))
    val counts = batchPinned.groupBy(col("id"))
      .agg(countDistinct(col("frame")).as("n_frames_batch"))
    perPair
      .join(broadcast(counts.select(col("id").as("batch_id"),
        col("n_frames_batch"))), Seq("batch_id"))
      .withColumn("containment",
        col("n_matched").cast("double") / col("n_frames_batch"))
      .filter(col("containment") >= minContainment)
      .select(col("batch_id"), col("stored_id"), col("n_frames_batch"),
        col("n_matched"), col("containment"))
  }

  /** BOTH directed containments per (arriving, stored) video pair — the
    * SUPERSEDE screen's evidence ([[videoContainmentAgainst]] computes
    * only the rejection half): `containment_batch` is the fraction of
    * the ARRIVAL's frames matched by the stored video (≥ threshold ⇒
    * the arrival adds nothing — reject), `containment_stored` the
    * fraction of the STORED video's frames matched by the arrival
    * (≥ threshold ⇒ the stored item is SUBSUMED — the full cut a clip
    * was taken from retires the clip, Broder 1997's |A∩B|/|A| applied
    * per side). Pairs where NEITHER direction reaches `minContainment`
    * carry no admission evidence and are dropped.
    *
    * Scale shape: the same frameless chunk-band pigeonhole as
    * [[videoContainmentAgainst]] with per-side hot caps; per-ARRIVAL
    * frame counts broadcast (the batch is small), per-STORED counts are
    * one narrow aggregate equi-joined onto the batch-proportional pair
    * frame — never broadcast, the stored corpus may hold billions of
    * videos.
    *
    * @param batch  (id, frame, sig) of the arriving videos
    * @param stored (id, frame, sig) of the corpus
    * @return (batch_id, stored_id, n_frames_batch, n_frames_stored,
    *         n_matched_batch, n_matched_stored, containment_batch,
    *         containment_stored), greatest(containments) ≥
    *         minContainment */
  def videoContainmentDirected(
      batch: DataFrame,
      stored: DataFrame,
      maxHamming: Int,
      minContainment: Double,
      maxBucketSize: Int = 200)(implicit caches: CacheScope): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 31,
      s"maxHamming must be in [1, 31], got $maxHamming")
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"minContainment must be in (0, 1], got $minContainment")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val chunkCols = (0 until chunks).map(c =>
      shiftrightunsigned(col("sig"), c * bitsPer).bitwiseAND(lit((1L << bitsPer) - 1)))
    val batchPinned = caches.pin(batch.select(col("id"), col("frame"), col("sig")))
    val storedPinned = caches.pin(stored.select(col("id"), col("frame"), col("sig")))
    def banded(sigs: DataFrame) = caches.pin(
      sigs.select(col("id"), col("frame"), col("sig"),
        posexplode(array(chunkCols: _*)).as(Seq("chunk", "value"))))
    val sb = banded(batchPinned)
    val sc = banded(storedPinned)
    def hotSide(s: DataFrame) = s.groupBy(col("chunk"), col("value"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("chunk", "value")
    val hot = hotSide(sb).union(hotSide(sc)).distinct()
    val coldB = sb.join(broadcast(hot), Seq("chunk", "value"), "left_anti")
    val coldC = sc.join(broadcast(hot), Seq("chunk", "value"), "left_anti")
    val matched = coldB.alias("a")
      .join(coldC.alias("b"),
        col("a.chunk") === col("b.chunk") && col("a.value") === col("b.value"))
      .select(col("a.id").as("batch_id"), col("b.id").as("stored_id"),
        col("a.frame").as("b_frame"), col("b.frame").as("s_frame"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("batch_id", "stored_id", "b_frame", "s_frame")
      .filter(col("hamming") <= maxHamming)
    val perPair = matched.groupBy(col("batch_id"), col("stored_id"))
      .agg(countDistinct(col("b_frame")).as("n_matched_batch"),
        countDistinct(col("s_frame")).as("n_matched_stored"))
    val bCounts = batchPinned.groupBy(col("id"))
      .agg(countDistinct(col("frame")).as("n_frames_batch"))
    val sCounts = storedPinned.groupBy(col("id"))
      .agg(countDistinct(col("frame")).as("n_frames_stored"))
    perPair
      .join(broadcast(bCounts.select(col("id").as("batch_id"),
        col("n_frames_batch"))), Seq("batch_id"))
      .join(sCounts.select(col("id").as("stored_id"), col("n_frames_stored")),
        Seq("stored_id"))
      .withColumn("containment_batch",
        col("n_matched_batch").cast("double") / col("n_frames_batch"))
      .withColumn("containment_stored",
        col("n_matched_stored").cast("double") / col("n_frames_stored"))
      .filter(greatest(col("containment_batch"), col("containment_stored"))
        >= minContainment)
      .select(col("batch_id"), col("stored_id"), col("n_frames_batch"),
        col("n_frames_stored"), col("n_matched_batch"), col("n_matched_stored"),
        col("containment_batch"), col("containment_stored"))
  }

  /** EXACT duplicate-SPAN removal (Lee et al. 2021, arXiv 2107.06499): any
    * run of `spanTokens` whitespace-delimited tokens that appears more than
    * once ANYWHERE in the corpus (other documents or elsewhere in the same
    * one) is cut from every occurrence, and each document reassembles from
    * its surviving tokens in order. This is the substring-level member of
    * the dedup family: q64's paragraph dedup needs layout (newlines),
    * winnowing (q53) only REPORTS span sharing — this one edits the text,
    * the form the training-data literature actually applies before LM
    * training.
    *
    * The reference implementation builds a corpus-wide suffix array — a
    * single-machine structure. The distributed formulation: every token
    * position contributes its length-L gram hash; a gram seen twice marks
    * both occurrences; per document, overlapping marked spans merge into
    * islands (classic gaps-and-islands over a per-doc window) and covered
    * tokens are dropped. L-gram marking is EQUIVALENT to the suffix-array
    * rule for runs ≥ L: every length-≥L duplicated run is a chain of
    * duplicated L-grams and is fully covered; no shorter run matches.
    *
    * Scale shape: two pinned corpus-token-sized projections (grams,
    * positions); dup detection is one partial-combined count on the gram
    * hash (a billion-fold boilerplate gram collapses map-side) + an equi
    * join back; islands and reassembly are per-doc windows — one exchange
    * on the doc id, parallel across docs. Nothing is ever all-pairs, and
    * the only state bigger than the corpus is the gram table (×1 row per
    * token).
    *
    * Returns `(idCol, textCol cleaned, n_tok, n_removed)` — one row per
    * input document, empty text when everything was covered. */
  def removeDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int = 50)(implicit caches: CacheScope): DataFrame = {
    require(spanTokens >= 2, s"spanTokens must be >= 2, got $spanTokens")
    val L = spanTokens
    val toks = caches.pin(df.select(col(idCol).as("_id"),
      split(col(textCol), "\\s+").as("_t")))
    // one row per token position that starts a full L-gram; md5 of the
    // space-joined slice is the gram key (and replays verbatim in SQL)
    val grams = caches.pin(toks
      .select(col("_id"), col("_t"), explode(when(size(col("_t")) >= L,
        sequence(lit(0), size(col("_t")) - L)).otherwise(array())).as("_p"))
      .select(col("_id"), col("_p"),
        md5(concat_ws(" ", slice(col("_t"), col("_p") + 1, lit(L)))).as("_g")))
    val dup = grams.groupBy(col("_g")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") > 1).select(col("_g"))
    val hits = grams.join(dup, Seq("_g")).select(col("_id"), col("_p"))
    // gaps-and-islands: a hit starts a new island iff it clears every
    // previous span's end; island id = running count of starts
    val wPrev = Window.partitionBy(col("_id")).orderBy(col("_p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("_id")).orderBy(col("_p"))
    val spans = hits
      .withColumn("_brk", when(col("_p") > max(col("_p") + L).over(wPrev), 1)
        .otherwise(0))
      .withColumn("_gid", sum(col("_brk")).over(wRun))
      .groupBy(col("_id"), col("_gid"))
      .agg(min(col("_p")).as("_a"), (max(col("_p")) + L).as("_z"))
    val positions = toks.select(col("_id"),
      posexplode(col("_t")).as(Seq("_q", "_w")))
    // spans are disjoint per doc, so the left join never duplicates a row
    val marked = positions.join(spans,
      positions("_id") === spans("_id") &&
        col("_q") >= col("_a") && col("_q") < col("_z"), "left")
      .select(positions("_id").as("_id"), col("_q"), col("_w"), col("_a"))
    marked.groupBy(col("_id"))
      .agg(count(lit(1)).as("n_tok"), count(col("_a")).as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("_a").isNull,
            struct(col("_q").as("_q"), col("_w").as("_w"))))),
          s => s.getField("_w"))).as(textCol))
      .select(col("_id").as(idCol), col(textCol), col("n_tok"), col("n_removed"))
  }
}
