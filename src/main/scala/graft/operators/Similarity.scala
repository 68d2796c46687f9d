package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbour search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact top-k by cosine — the correctness baseline.
  *    O(n²·d); ONLY for test scale or for probing a small query set against
  *    a broadcast corpus.
  *  - [[lshTopK]]: random-hyperplane LSH — `tables` independent hash tables
  *    of `bits` sign-bits each; vectors colliding in any table are
  *    candidates, scored exactly, top-k per query. The join is on
  *    (table, bucket) — shuffle-bounded, no crossJoin; recall grows with
  *    `tables`, bucket size shrinks with `bits`. This is the 100 TB path:
  *    at 1000 executors the bucket join partitions by hash like any
  *    aggregation, and skewed buckets split under AQE.
  */
object Similarity {

  /** Hyperplane-LSH operating point derived by [[tuneLsh]].
    *
    * @param bits hyperplanes per table (bucket key width)
    * @param tables independent hash tables
    * @param expectedBucketSize corpusSize / 2^bits — candidate-join density
    * @param expectedRecall 1 − (1 − p^bits)^tables at the tuned similarity
    */
  final case class LshParams(
      bits: Int, tables: Int, expectedBucketSize: Double, expectedRecall: Double)

  /** Derive (bits, tables) from the corpus size and the target operating
    * point, instead of hand-picking worst-case settings.
    *
    * Standard random-hyperplane analysis: a pair at cosine s agrees on one
    * hyperplane with p = 1 − acos(s)/π, collides in a table with p^bits,
    * and is recalled by ANY of T tables with 1 − (1 − p^bits)^T.
    *
    *  - bits: smallest width keeping the expected bucket
    *    (corpusSize / 2^bits) under `targetBucketSize` — candidate volume
    *    per table scales with bucket size, so this bounds join cost;
    *  - tables: fewest tables reaching `targetRecall` for pairs at
    *    `simThreshold`; if that exceeds `maxTables`, bits are walked back
    *    (denser buckets, cheaper per-table recall) until the budget fits —
    *    feasibility beats bucket sparsity.
    *
    * Corpus size can be a cheap upper estimate (file counts, metastore
    * stats); the tuning is logarithmic in it. */
  def tuneLsh(
      corpusSize: Long,
      simThreshold: Double,
      targetRecall: Double = 0.9,
      targetBucketSize: Int = 1000,
      maxTables: Int = 32,
      maxBits: Int = 24): LshParams = {
    require(corpusSize > 0, "corpusSize must be positive")
    require(simThreshold > -1.0 && simThreshold < 1.0,
      s"simThreshold must be in (-1, 1), got $simThreshold")
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall must be in (0, 1), got $targetRecall")
    val p = 1.0 - math.acos(simThreshold) / math.Pi
    def tablesFor(bits: Int): Int = {
      val pBand = math.pow(p, bits)
      if (pBand >= 1.0) 1
      else math.max(1, math.ceil(math.log1p(-targetRecall) / math.log1p(-pBand)).toInt)
    }
    var bits = math.min(maxBits, bitsFor(corpusSize, targetBucketSize))
    while (bits > 1 && tablesFor(bits) > maxTables) bits -= 1
    val tables = math.min(maxTables, tablesFor(bits))
    LshParams(bits, tables,
      corpusSize.toDouble / (1L << bits),
      1.0 - math.pow(1.0 - math.pow(p, bits), tables))
  }

  /** Multiprobe-LSH operating point derived by [[sizedMultiprobe]]. */
  final case class MultiprobeParams(
      bits: Int, tables: Int, nFlips: Int, expectedBucketSize: Double)

  /** Derive a CONSTANT-COST multiprobe operating point from the corpus
    * size alone — the complementary posture to [[tuneLsh]]:
    *
    *  - [[tuneLsh]] holds RECALL at a similarity threshold and lets the
    *    table count grow with `bits` — total candidate volume then grows
    *    super-linearly in n (measured: q30's ×10 slope 1.26 under the
    *    tuned constant-recall point), the unavoidable LSH price of a
    *    fixed-recall guarantee;
    *  - this recipe holds the per-query probe budget constant — `bits`
    *    track the corpus (`expectedBucketSize` pinned near
    *    `targetBucketSize`), tables and flips are fixed, so candidates
    *    per query stay ~`targetBucketSize · tables · (1 + nFlips)` and
    *    TOTAL cost is linear in n, while recall floats downward as the
    *    corpus outgrows the probe budget. That is the posture every
    *    fixed-budget ANN serving path takes ([[ivfTopK]]'s fixed
    *    `nProbe`, multi-probe LSH per Lv et al., VLDB 2007) and the one
    *    that survives 100 TB.
    *
    * Stored state is `tables` signatures per vector; probing widens
    * per-QUERY fan-out only (`nFlips` capped at `bits − 1`, the
    * [[org.apache.spark.sql.graft.HyperplaneProbes]] domain). */
  def sizedMultiprobe(
      corpusSize: Long,
      targetBucketSize: Int = 125,
      tables: Int = 4,
      maxFlips: Int = 2): MultiprobeParams = {
    require(corpusSize > 0, "corpusSize must be positive")
    val bits = math.min(63, bitsFor(corpusSize, targetBucketSize))
    MultiprobeParams(bits, tables, math.min(maxFlips, bits - 1),
      corpusSize.toDouble / (1L << bits))
  }

  /** `max(1, ceil(log2(corpusSize / targetBucketSize)))` computed on
    * integers: for real x > 1, `ceil(log2 x) = ceil(log2 ceil(x))`, and the
    * latter is a leading-zero count — the double-log form could land an ulp
    * above an exact power-of-two ratio and bump bits by one, a
    * platform/libm-sensitive boundary in a value the oracle SQL pins by
    * literal. */
  private def bitsFor(corpusSize: Long, targetBucketSize: Int): Int = {
    val buckets = (corpusSize + targetBucketSize - 1) / targetBucketSize
    if (buckets <= 2) 1
    else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)
  }

  /** Spread a compute-dense small scan across the cores when the file
    * layout gives it fewer partitions (guide §2.5 input skew): signature
    * hashing costs ~tables × bits × d flops per row, so a one-file corpus
    * otherwise hashes on ONE task (measured q30: a single 3.2 s task under
    * 32 idle cores). No-op — and no extra exchange — when the scan is
    * already at least core-parallel, which any corpus-scale file count
    * provides; the repartition is round-robin on a trigger-bounded small
    * input, physical-only (every consumer is partitioning-independent —
    * the same invariance the multi-core oracle runs already prove). */
  private def spreadSmallScan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }

  /** Exact cosine top-k neighbours per vector (self-join, excludes self).
    * Output: (vec_id, neighbor_id, cosine, rank). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    // Precompute the norm once per vector (identical double to computing it
    // per pair), so each of the O(n²) pairs costs one codegen'd dot product.
    val base = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val a = base.alias("a"); val b = base.alias("b")
    val scored = a.join(b, col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
    if (k == 1) {
      // top-1 as an aggregate: partial max_by combines map-side, so only
      // one row per vec_id reaches the shuffle (vs all n−1 scored pairs
      // through a window sort). Tie-break matches the window ordering:
      // struct compares (cosine desc, then −neighbor_id desc = id asc).
      scored
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("neighbor_id"), col("cosine")),
          struct(col("cosine"), -col("neighbor_id"))).as("best"))
        .select(col("vec_id"), col("best.neighbor_id").as("neighbor_id"),
          col("best.cosine").as("cosine"), lit(1).as("rank"))
    } else {
      topKFromScored(scored, k)
    }
  }

  /** Exact cosine top-k of a PROBE batch against a separate corpus — the
    * "against" face of [[bruteForceTopK]]: the self-join scores every
    * corpus pair (O(n²)); a probe batch only needs probes × corpus. The
    * probe frame broadcasts (it is the user-bounded side, the same shape
    * as [[Retrieval.bm25Against]]'s probe-term frame), so the corpus is
    * scanned ONCE and never shuffled; per-probe top-k is the
    * [[topKFromScored]] partial-combining aggregate, so only k rows per
    * (probe, partition) reach the exchange. Self-matches are KEPT —
    * retrieval semantics: a probe's own stored row is a valid answer
    * (the dedup-facing [[bruteForceTopK]] excludes self). For probe
    * batches too large to broadcast, the persisted [[IvfIndex]] /
    * [[PqIndex]] tiers are the scale path; this is the exact baseline
    * they are graded against (RECALL_SNAPSHOT).
    * Output: (vec_id, neighbor_id, cosine, rank) — vec_id is the probe id. */
  def bruteForceTopKAgainst(
      corpus: DataFrame, idCol: String, vecCol: String,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = corpus.select(col(idCol).as("_nid"), toDouble(col(vecCol)).as("_nv"))
      .withColumn("_nnrm", l2Norm(col("_nv")))
    val q = probes.select(col(probeIdCol).as("_qid"), toDouble(col(probeVecCol)).as("_qv"))
      .withColumn("_qnrm", l2Norm(col("_qv")))
    val scored = base.crossJoin(broadcast(q))
      .select(col("_qid").as("vec_id"), col("_nid").as("neighbor_id"),
        (dot(col("_qv"), col("_nv")) / (col("_qnrm") * col("_nnrm"))).as("cosine"))
    topKFromScored(scored, k)
  }

  /** Hard-negative mining for contrastive / embedding-model training data
    * (the miner behind triplet and InfoNCE batches, cf. the in-batch vs
    * mined-negatives discussion in Karpukhin et al., "Dense Passage
    * Retrieval", EMNLP 2020 §5): for each probe, the top-k most-similar
    * corpus vectors with a DIFFERENT label — the negatives hardest to
    * separate — plus `pos_cosine`, the probe's best SAME-label similarity
    * (its strongest positive, self excluded), so a consumer can form
    * (anchor, positive, negative) triplets and margin-filter (a negative
    * with `cosine > pos_cosine` violates the margin outright; "semi-hard"
    * selection is a downstream filter on these two columns).
    *
    * ONE scan of the corpus scores both sides: negatives and the positive
    * ceiling come from the same probe-broadcast crossJoin, split by a
    * label predicate inside the aggregate — `top_k_pairs` over a
    * `when(label mismatch, cosine)` score (its update skips nulls) and a
    * conditional `max` for `pos_cosine` — so the mining pass costs exactly
    * one [[bruteForceTopKAgainst]], not two. Only k buffered pairs + one
    * running max per (probe, partition) reach the exchange.
    *
    * Probes whose label covers the ENTIRE corpus (no possible negative)
    * emit nothing; `pos_cosine` is NULL when the probe's label appears
    * nowhere else (no possible positive). For probe batches too large to
    * broadcast, mine through the [[IvfIndex]] shortlist and re-rank — this
    * is the exact baseline that path is graded against.
    *
    * Output: (vec_id, neighbor_id, cosine, rank, pos_id, pos_cosine) —
    * pos_id is the positive's own id (triplet emission needs the row, not
    * just the ceiling value); rank ≤ k by
    * (cosine desc, neighbor_id asc) within the different-label set. */
  def hardNegatives(
      corpus: DataFrame, idCol: String, vecCol: String, labelCol: String,
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      probeLabelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = corpus.select(col(idCol).as("_nid"), col(labelCol).as("_nlab"),
        toDouble(col(vecCol)).as("_nv"))
      .withColumn("_nnrm", l2Norm(col("_nv")))
    val q = probes.select(col(probeIdCol).as("_qid"), col(probeLabelCol).as("_qlab"),
        toDouble(col(probeVecCol)).as("_qv"))
      .withColumn("_qnrm", l2Norm(col("_qv")))
    val scored = base.crossJoin(broadcast(q))
      .select(col("_qid"), col("_qlab"), col("_nid"), col("_nlab"),
        (dot(col("_qv"), col("_nv")) / (col("_qnrm") * col("_nnrm"))).as("_cos"))
    mineLabeledScored(scored, k)
  }

  /** Shared mining tail of [[hardNegatives]] / [[hardNegativesFromShortlist]]
    * — `scored` carries `(_qid, _qlab, _nid, _nlab, _cos)`: one aggregate
    * splits every candidate by the label predicate (top-k buffer over the
    * mismatches — `top_k_pairs` skips the null-gated matches — and a
    * conditional struct-argmax over the matches, self excluded, carrying
    * the POSITIVE'S ID out so consumers can emit real (anchor, positive,
    * negative) triplets, not just the ceiling value; the negated-id field
    * makes the struct max break cosine ties to the SMALLER id, the
    * engine-wide order). */
  private def mineLabeledScored(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("_qid"))
      .agg(
        org.apache.spark.sql.graft.TopKPairs.top_k_pairs(
          when(col("_nlab") =!= col("_qlab"), col("_cos")), col("_nid"), k).as("_tk"),
        max(when(col("_nlab") === col("_qlab") && col("_nid") =!= col("_qid"),
          struct(col("_cos").as("c"), (-col("_nid")).as("negid")))).as("_pos"))
      .filter(size(col("_tk")) > 0)
      .select(col("_qid").as("vec_id"),
        col("_pos.c").as("pos_cosine"), (-col("_pos.negid")).as("pos_id"),
        posexplode(col("_tk")).as(Seq("_i", "_e")))
      .select(col("vec_id"), col("_e.neighbor_id").as("neighbor_id"),
        col("_e.score").as("cosine"), (col("_i") + 1).as("rank"),
        col("pos_id"), col("pos_cosine"))

  /** [[hardNegatives]] from a PRE-COMPUTED shortlist — the 100 TB mining
    * path: the corpus-scale work happens in whatever produced the
    * shortlist ([[ivfTopK]] cells, [[lshTopK]] buckets, a persisted
    * [[IvfIndex]]/[[PqIndex]] `topK`), and mining is then label joins +
    * the same one-aggregate split over probes × shortlist rows — the
    * corpus itself is never re-scanned. Overfetch the shortlist (k' of
    * 3–5× k) so enough different-label candidates survive the filter.
    *
    * Approximation is inherited, and one-sided per column: `cosine` ranks
    * only candidates the shortlist recalled (a missed true hard negative
    * is absent, never mis-ranked), and `pos_cosine` is a LOWER bound on
    * the true positive ceiling — NULL when the shortlist holds no
    * same-label row at all, which at small k' is common; margin filters
    * must treat NULL as "ceiling unknown", not "no positive exists".
    * [[hardNegatives]] is the exact baseline this path is graded against.
    *
    * `shortlist` carries `(vec_id, neighbor_id, cosine)` (self-pairs
    * tolerated — a self row is same-label, never a negative, and the
    * self-exclusion in the positive max keeps it out of the ceiling);
    * `labels` is the (id → label) side, joined TWICE on the narrow id
    * columns — at corpus scale these are the only exchanges mining adds.
    *
    * Output: (vec_id, neighbor_id, cosine, rank, pos_id, pos_cosine),
    * pos_id the recalled positive's id (NULL with pos_cosine); rank ≤ k by
    * (cosine desc, neighbor_id asc) within the different-label set. */
  def hardNegativesFromShortlist(
      shortlist: DataFrame,
      labels: DataFrame, labelIdCol: String, labelCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lab = labels.select(col(labelIdCol).as("_lid"), col(labelCol).as("_lab"))
    val scored = shortlist
      .select(col("vec_id").as("_qid"), col("neighbor_id").as("_nid"),
        col("cosine").as("_cos"))
      .join(lab.select(col("_lid").as("_qid"), col("_lab").as("_qlab")), Seq("_qid"))
      .join(lab.select(col("_lid").as("_nid"), col("_lab").as("_nlab")), Seq("_nid"))
    mineLabeledScored(scored, k)
  }

  /** TRIPLET SELECTION — the emission step finishing the mining family:
    * [[hardNegatives]] / [[hardNegativesFromShortlist]] rows become
    * (anchor, positive, negative) training triplets under the margin rule
    * (Schroff et al., CVPR 2015; the hard-negative shape of Karpukhin et
    * al., EMNLP 2020): a negative is kept iff
    *
    *   `floor < cosine < pos_cosine − margin`
    *
    * — harder than the floor (not a trivially-distant negative) but at
    * least `margin` below the positive ceiling (the triplet has a
    * nonzero loss gap to learn from).
    *
    * THE NULL-CEILING CONTRACT, encoded here and not in user code:
    * `pos_cosine` NULL means the MINER recalled no positive — for the
    * shortlist path that is "ceiling unknown", NOT "no positive exists"
    * (the corpus may hold one the shortlist missed). By default those
    * anchors are DROPPED — the margin test is unevaluable, and silently
    * keeping them would emit triplets with no positive row. Pass
    * `keepUnknownCeiling = true` to emit their negatives with NULL
    * positive columns instead — the downstream route for re-mining those
    * anchors through the exact miner rather than discarding them.
    *
    * Pure per-row filter + projection over the mined frame — no new
    * exchange at any scale; the mining pass upstream dominates.
    *
    * @return (anchor_id, positive_id, negative_id, pos_cosine,
    *         neg_cosine) */
  def selectTriplets(
      mined: DataFrame,
      margin: Double,
      floor: Double = -1.0,
      keepUnknownCeiling: Boolean = false): DataFrame = {
    require(margin >= 0.0, s"margin must be >= 0, got $margin")
    val known = !isnull(col("pos_cosine"))
    val passKnown = known &&
      col("cosine") < col("pos_cosine") - lit(margin) && col("cosine") > lit(floor)
    val passUnknown = !known && lit(keepUnknownCeiling) && col("cosine") > lit(floor)
    mined.filter(passKnown || passUnknown)
      .select(col("vec_id").as("anchor_id"),
        col("pos_id").as("positive_id"),
        col("neighbor_id").as("negative_id"),
        col("pos_cosine"), col("cosine").as("neg_cosine"))
  }

  /** Per-group top-k via the [[org.apache.spark.sql.graft.TopKPairs]]
    * aggregate: partial top-k buffers combine map-side, so only k rows per
    * (group, partition) reach the shuffle — vs a window sort moving every
    * scored candidate. Same deterministic order as
    * `row_number() over (order by cosine desc, neighbor_id asc)`. */
  /** Exact-cosine re-rank of a `(vec_id, neighbor_id)` shortlist — the
    * refine stage every two-stage (shortlist-and-refine) searcher shares:
    * `q` carries `(vec_id, q_v, q_nrm)`, `corpus` carries `(neighbor_id,
    * n_v, n_nrm)`; both joins are narrow id-equi-joins moving `shortlist`
    * rows per query, never all-pairs. One definition so a tie-break or
    * norm-guard fix can never diverge one serving path from its
    * hash-gated oracle. Returns `(vec_id, neighbor_id, cosine, rank)`,
    * rank ≤ k by (cosine desc, neighbor_id asc). */
  private[operators] def exactRerank(
      short: DataFrame, q: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    short
      .join(q, Seq("vec_id"))
      .join(corpus, Seq("neighbor_id"))
      .withColumn("cosine",
        dot(col("q_v"), col("n_v")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  private[operators] def topKFromScored(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("vec_id"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs(col("cosine"), col("neighbor_id"), k).as("tk"))
      .select(col("vec_id"), posexplode(col("tk")).as(Seq("idx", "e")))
      .select(col("vec_id"), col("e.neighbor_id").as("neighbor_id"),
        col("e.score").as("cosine"), (col("idx") + 1).as("rank"))

  /** LSH-bucketed approximate top-k. Same output schema as brute force.
    * `maxBucketSize` drops pathologically dense buckets (a bucket of B
    * vectors yields B² candidates; dense hyperplane cells are near-parallel
    * crowds that other tables still cover) — the same skew guard the
    * MinHash/SimHash paths apply. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 12,
      tables: Int = 4,
      maxBucketSize: Int = 1000)(implicit caches: CacheScope): DataFrame = {
    val base = spreadSmallScan(
      df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v")))
      .withColumn("nrm", l2Norm(col("v")))
    val bucketCols = (0 until tables).map(t =>
      struct(lit(t).as("t"), hyperplaneSignature(col("v"), bits, seed = s"lsh:$t").as("b")))
    // read three times (hot agg + both join sides) — pin one signature pass;
    // lifetime is the implicit [[CacheScope]] (lazy operators can't unpersist)
    val allBanded = caches.pin(base.select(col("id"), col("v"), col("nrm"),
      explode(array(bucketCols: _*)).as("bucket")))
    val hot = allBanded.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("bucket")
    val banded = allBanded.join(broadcast(hot), Seq("bucket"), "left_anti")
    val a = banded.alias("a"); val b = banded.alias("b")
    // Score INSIDE the bucket join and only then dedup: a pair colliding in
    // several tables is re-scored (cheap, map-side, same value) instead of
    // shuffling both 64-dim vectors through the dedup exchange — the
    // dominant cost at any scale is moving vectors, not multiplying them.
    val scored = a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .dropDuplicates("vec_id", "neighbor_id")
    topKFromScored(scored, k)
  }

  /** MULTIPROBE LSH top-k (Lv et al., VLDB 2007): the corpus is bucketed
    * ONCE per table at its exact signatures, and each QUERY probes its own
    * bucket plus the `nFlips` buckets across its smallest-margin bits —
    * roughly the recall of `(nFlips+1) × tables` single-probe tables for
    * the stored/banded footprint of `tables`. At scale that's the right
    * trade everywhere: the corpus-side banded table is what gets stored,
    * shuffled and joined (the scale cost — see BENCH_sf1's q30 slope);
    * query-side probe rows are transient and narrow. Same md5 weight
    * family as [[lshTopK]], so every probe replays in SQL. */
  def lshTopKMultiprobe(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 12,
      tables: Int = 2,
      nFlips: Int = 3,
      maxBucketSize: Int = 1000)(implicit caches: CacheScope): DataFrame = {
    val base = caches.pin(spreadSmallScan(
      df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v")))
      .withColumn("nrm", l2Norm(col("v"))))
    // corpus side: ONE exact bucket per table — the stored footprint
    val corpusCols = (0 until tables).map(t =>
      struct(lit(t).as("t"), hyperplaneSignature(col("v"), bits, seed = s"lsh:$t").as("b")))
    val corpus = caches.pin(base.select(col("id"), col("v"), col("nrm"),
      explode(array(corpusCols: _*)).as("bucket")))
    val hot = corpus.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("bucket")
    val cold = corpus.join(broadcast(hot), Seq("bucket"), "left_anti")
    // query side: nFlips+1 probe buckets per table, transient rows
    val probeCols = (0 until tables).map(t =>
      struct(lit(t).as("t"),
        hyperplaneProbes(col("v"), bits, seed = s"lsh:$t", nFlips).as("ps")))
    val probes = base.select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_nrm"),
        explode(array(probeCols: _*)).as("tp"))
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("tp.t").as("t"),
        explode(col("tp.ps")).as("b"))
      .select(col("q_id"), col("q_v"), col("q_nrm"),
        struct(col("t"), col("b")).as("bucket"))
    val scored = probes.alias("q")
      .join(cold.alias("c"),
        col("q.bucket") === col("c.bucket") && col("q.q_id") =!= col("c.id"))
      .select(col("q_id").as("vec_id"), col("id").as("neighbor_id"),
        (dot(col("q_v"), col("v")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .dropDuplicates("vec_id", "neighbor_id")
    topKFromScored(scored, k)
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * `nCells` Voronoi cells around deterministically sampled centroids
    * (the `nCells` vectors with the smallest md5(id) — a uniform,
    * reproducible sample that any external SQL engine can recompute, so
    * the whole IVF result is oracle-checkable; no iterative k-means fit
    * needed for a recall baseline), assign every vector to its nearest
    * centroid, then search each query only against its `nProbe` nearest
    * cells.
    *
    * Scale path: centroids are tiny and BROADCAST twice (assignment +
    * probe); the candidate join is an equi-join on cell id — shuffle-
    * bounded like any aggregation, ~nProbe/nCells of the corpus scanned
    * per query instead of all of it. */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4)(implicit caches: graft.operators.CacheScope): DataFrame = {
    // base feeds the centroid sample AND the ranked subtree — pin (the
    // idempotent scope also lets a composed trainer share the same entry)
    val base = caches.pin(df
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v"))))
    val centroids = base
      .withColumn("_h", md5(col("id").cast("string").cast("binary")))
      .orderBy(col("_h")).limit(nCells)
      .select(col("id").as("c_id"), col("v").as("c_v"), col("nrm").as("c_nrm"))
    ivfFromCentroids(base, centroids, k, nProbe)
  }

  /** [[ivfTopK]] over EXTERNAL centroids — e.g. the fitted cells of
    * [[KMeans.fit]] (via [[KMeans.centroidVectors]]) instead of the
    * md5-sampled ones: the trained index. `centroids` must carry
    * `(cell, c_v: array<double>)`. */
  def ivfTopKWithCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      k: Int,
      nProbe: Int)(implicit caches: graft.operators.CacheScope): DataFrame = {
    // identical plan to the trainer's base → the idempotent pin resolves
    // to the SAME cache entry when composed after KMeans.fit
    val base = caches.pin(df
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v"))))
    val cents = centroids
      .select(col("cell").as("c_id"), col("c_v"))
      .withColumn("c_nrm", l2Norm(col("c_v")))
    ivfFromCentroids(base, cents, k, nProbe)
  }

  /** [[ivfTopK]] with an EXPLICIT probe batch: centroid sampling and cell
    * ASSIGNMENT run over the full `df` (the index side is corpus-shaped
    * either way), but only `probes` rows rank cells and score candidates —
    * the mining shape (q116/q120 probe every 23rd vector) pays
    * probe-batch×nProbe candidate work instead of corpus×nProbe. Results
    * for a probe are independent of every other probe, so this is
    * row-identical to [[ivfTopK]] post-filtered to the probe ids (the
    * committed q116 oracle is exactly that chain). `probes` must carry the
    * same id/vec columns; a probe id present in the corpus is excluded
    * from its own neighbor list, as in self-search. */
  def ivfTopKAgainst(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      probes: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4)(implicit caches: graft.operators.CacheScope): DataFrame = {
    val base = caches.pin(df
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v"))))
    val centroids = base
      .withColumn("_h", md5(col("id").cast("string").cast("binary")))
      .orderBy(col("_h")).limit(nCells)
      .select(col("id").as("c_id"), col("v").as("c_v"), col("nrm").as("c_nrm"))
    val probeBase = probes
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    ivfFromCentroids(base, centroids, k, nProbe, Some(probeBase))
  }

  private def ivfFromCentroids(
      base: DataFrame,
      centroids: DataFrame,
      k: Int,
      nProbe: Int,
      probeBase: Option[DataFrame] = None): DataFrame = {
    // zero-norm guard for BOTH entry points: a dead centroid (sampled
    // zero-norm embedding, or a fitted cell that averaged to zero) makes
    // every c_sim NaN; Spark sorts NaN above all finite doubles, so the
    // dead cell would win rank 1 for the entire corpus and the cell join
    // degenerates to corpus². Drop it before ranking.
    val live = centroids.filter(col("c_nrm") > 0)
    // nearest-centroid ranking (1 broadcast-nested-loop over nCells rows);
    // assignment (rank 1) and probing (rank ≤ nProbe) both derive from the
    // SAME ranked subtree, so the window's exchange is computed once and
    // reused across the two join sides (ReuseExchange)
    val assignW = Window.partitionBy(col("id"))
      .orderBy(col("c_sim").desc, col("c_id").asc)
    val ranked = base.crossJoin(broadcast(live))
      .withColumn("c_sim", dot(col("v"), col("c_v")) / (col("nrm") * col("c_nrm")))
      .withColumn("c_rank", row_number().over(assignW))
      .filter(col("c_rank") <= nProbe)
    val assigned = ranked.filter(col("c_rank") === 1)
      .select(col("id"), col("v"), col("nrm"), col("c_id").as("cell"))
    // queries probe their nProbe nearest cells: self-search derives probes
    // from the SAME ranked subtree (the window exchange is computed once
    // and reused — ReuseExchange); an explicit probe batch ranks cells
    // itself, trading that reuse for a probe-batch-sized candidate side
    val probes = probeBase match {
      case None =>
        ranked.select(col("id").as("q_id"), col("v").as("q_v"),
          col("nrm").as("q_nrm"), col("c_id").as("cell"))
      case Some(pb) =>
        pb.crossJoin(broadcast(live))
          .withColumn("c_sim", dot(col("v"), col("c_v")) / (col("nrm") * col("c_nrm")))
          .withColumn("c_rank", row_number().over(assignW))
          .filter(col("c_rank") <= nProbe)
          .select(col("id").as("q_id"), col("v").as("q_v"),
            col("nrm").as("q_nrm"), col("c_id").as("cell"))
    }
    // score before dedup: duplicates (query probing several cells holding
    // the same vector) re-score identically; the dedup exchange then moves
    // (id, id, double) rows, never vectors
    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id").as("vec_id"), col("id").as("neighbor_id"),
        (dot(col("q_v"), col("v")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .dropDuplicates("vec_id", "neighbor_id")
    topKFromScored(scored, k)
  }

  /** Exact embedding near-duplicate pairs: all (a < b) pairs with cosine ≥
    * threshold. O(n²) — the correctness baseline / oracle-checkable path;
    * [[cosineNearDupPairs]] is the LSH-bucketed scale path. */
  def cosinePairsExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
    val a = base.alias("a"); val b = base.alias("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style cell-bounded semantic near-dup pairs: every vector is
    * assigned to its nearest TRAINED cell ([[IvfIndex.assign]] — broadcast
    * centroids, map-side argmax, one narrow pass) and cosine pairs are
    * scored WITHIN cells only — all (a < b) same-cell pairs with cosine ≥
    * threshold. The complement of [[cosineNearDupPairs]]'s random
    * hyperplanes: on CLUSTERED embedding distributions (real corpora),
    * k-means cells track the density structure, so near-dup pairs land in
    * the same cell far more reliably than in a random half-space product,
    * at the cost of missing pairs that straddle a cell boundary (the
    * SemDeDup trade: arxiv.org/abs/2303.09540). Candidate volume is
    * Σ cellᵢ² — bounded by sizing nCells with the corpus (cells ≈ n/nCells
    * vectors); the join is an equi-join on `cell`, shuffle-bounded, and
    * skewed cells split under AQE. */
  def cosineNearDupPairsInCells(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroidVectors: DataFrame,
      threshold: Double): DataFrame = {
    val assigned = IvfIndex.assign(df, idCol, vecCol, centroidVectors)
      .withColumn("nrm", l2Norm(col("v")))
    val a = assigned.alias("a"); val b = assigned.alias("b")
    // score + filter inside the cell join: the output exchange (if any
    // downstream) carries (id, id, double) rows, never vectors
    a.join(b, col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, via the same LSH
    * bucketing (a_id < b_id canonical orientation). `maxBucketSize` is the
    * same dense-bucket skew guard as [[lshTopK]]. */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 10,
      tables: Int = 6,
      maxBucketSize: Int = 1000)(implicit caches: CacheScope): DataFrame = {
    val base = spreadSmallScan(
      df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v")))
      .withColumn("nrm", l2Norm(col("v")))
    val bucketCols = (0 until tables).map(t =>
      struct(lit(t).as("t"), hyperplaneSignature(col("v"), bits, seed = s"ndp:$t").as("b")))
    // same three-read pin as lshTopK — scoped by the implicit CacheScope
    val allBanded = caches.pin(base.select(col("id"), col("v"), col("nrm"),
      explode(array(bucketCols: _*)).as("bucket")))
    val hot = allBanded.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c")).filter(col("c") > maxBucketSize)
      .select("bucket")
    val banded = allBanded.join(broadcast(hot), Seq("bucket"), "left_anti")
    val a = banded.alias("a"); val b = banded.alias("b")
    // score + threshold-filter INSIDE the bucket join, then dedup the
    // surviving narrow rows — the exchange carries (id, id, double), and
    // the threshold prunes most candidates before they ever shuffle
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("a_id", "b_id")
  }
}
