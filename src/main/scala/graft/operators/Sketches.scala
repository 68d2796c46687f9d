package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches for corpus profiling.
  *
  * KMV — k minimum values (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002; the estimator at the core of the theta
  * sketch family) — approximates a group's distinct count from only the k
  * smallest hash values of its members: if the k-th smallest of n uniform
  * hashes lands at fraction R of the hash space, n ≈ (k−1)/R. The sketch
  * is tiny (k longs), mergeable (union = k smallest of the concatenation,
  * exactly what a partial top-k aggregate computes map-side), and — built
  * on the repo's salted-md5 draw instead of a seeded random hash — fully
  * deterministic and SQL-replayable, unlike `approx_count_distinct`'s
  * HLL++, whose merge order is layout-dependent.
  *
  * Scale shape: ONE aggregate exchange, and a genuinely sub-distinct
  * one — raw rows feed a [[org.apache.spark.sql.graft.TopKPairs]]
  * deduplicating partial top-k directly (duplicate hashes are skipped
  * inside the size-k buffer), so at most k hashes per (group, partition)
  * ever reach the shuffle: O(groups · partitions · k) rows, independent
  * of both row count AND distinct count. No distinct pre-pass, no
  * windows, no sort, no driver state.
  */
object Sketches {

  /** Approximate distinct `valueCol` per group via a k-minimum-values
    * sketch over the salted 40-bit md5 draw.
    *
    * Output per group: `n_sketch` (hashes retained, = min(distinct, k))
    * and `est_distinct` — EXACT when the group holds fewer than k
    * distinct hashes (the sketch saw everything), the (k−1)/R estimator
    * otherwise. Both arms replay in SQL; the 0-hash guard (`greatest(hv,
    * 1)`) is mirrored there, so even the pathological all-zero draw is
    * deterministic.
    *
    * @param k sketch size (64 ⇒ ~13% typical relative error)
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    val hv = conv(substring(md5(concat(lit(s"$salt:"),
      col(valueCol).cast("string")).cast("binary")), 1, 10), 16, 10).cast("long")
    // one pass: raw rows straight into a DEDUPLICATING partial top-k —
    // repeated hashes are skipped inside the size-k buffer, so only the
    // k smallest distinct hashes per (group, partition) reach the single
    // aggregate exchange (score = −hash ⇒ highest-score-first keeps
    // ascending hashes). NULL values carry no identity and are excluded,
    // matching count(DISTINCT x) semantics.
    val sk = df
      .filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ hv.as("_hv"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs_distinct(-col("_hv").cast("double"), col("_hv"), k).as("tk"))
    val n = size(col("tk.neighbor_id"))
    val kth = element_at(col("tk.neighbor_id"), n) // largest retained = k-th smallest
    sk.select(groupCols.map(col) :+ n.as("n_sketch") :+
      round(
        when(n < k, n.cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1099511627776.0) / // 2^40
            greatest(kth, lit(1L)).cast("double")),
        4).as("est_distinct"): _*)
  }

  /** Pairwise corpus-overlap estimation from KMV sketches — Jaccard,
    * union and intersection cardinalities for every pair of groups
    * WITHOUT joining the corpora (Beyer et al., "On synopses for
    * distinct-value estimation under multiset operations", SIGMOD 2007):
    * the "how much of crawl B is already in crawl A" question, answered
    * from two k-hash synopses instead of a corpus × corpus join.
    *
    * Per group, the [[kmvDistinct]] sketch (k smallest distinct salted
    * 40-bit draws, one deduplicating partial-top-k pass). Per pair, the
    * coincidence estimator: take the k smallest of the sketch UNION
    * (itself a valid sketch of A ∪ B); the fraction of those present in
    * BOTH sketches estimates J(A, B); the (k−1)/R rule on the union
    * sketch estimates |A ∪ B| (EXACT when it holds fewer than k hashes —
    * then both input sketches were complete); their product estimates
    * |A ∩ B|. Everything is md5-deterministic — the estimates replay
    * bit-for-bit in SQL, the [[kmvDistinct]] contract.
    *
    * Scale: the corpus is scanned ONCE (the sketch aggregate's single
    * exchange carries ≤ k hashes per (group, partition)); pairing is a
    * broadcast self-join of the groups × k synopsis table — G² pair rows
    * of k-length arrays, never corpus-sized. NULL values are excluded
    * (count-DISTINCT semantics), matching [[kmvDistinct]].
    *
    * Output per unordered pair (group_a < group_b): n_a_sketch,
    * n_b_sketch, est_jaccard, est_union, est_intersection.
    *
    * @param k sketch size (256 ⇒ ~6% typical relative error on J·U)
    */
  def kmvOverlap(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val hv = conv(substring(md5(concat(lit(s"$salt:"),
      col(valueCol).cast("string")).cast("binary")), 1, 10), 16, 10).cast("long")
    val sk = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("_g"), hv.as("_hv"))
      .groupBy(col("_g"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs_distinct(-col("_hv").cast("double"), col("_hv"), k)
        .getField("neighbor_id").as("_sk")) // ascending hashes
    overlapFromSynopses(sk, k)
  }

  /** The pairing + coincidence estimator behind [[kmvOverlap]], shared with
    * [[CorpusProfile.overlap]] (which serves the SAME estimates from its
    * committed kmv member rows) — one code object so the ad-hoc and the
    * served path cannot drift. `sk` carries one row per group:
    * `(_g, _sk: array<long>)`, the group's ≤ k smallest distinct draws
    * ascending. */
  private[operators] def overlapFromSynopses(sk: DataFrame, k: Int): DataFrame = {
    val a = sk.select(col("_g").as("group_a"), col("_sk").as("_a"))
    val b = sk.select(col("_g").as("group_b"), col("_sk").as("_b"))
    val u = slice(array_sort(array_union(col("_a"), col("_b"))), 1, k)
    val paired = a.crossJoin(broadcast(b))
      .filter(col("group_a") < col("group_b"))
      .withColumn("_u", u)
      .withColumn("_L", size(col("_u")))
      .withColumn("_both",
        size(array_intersect(array_intersect(col("_u"), col("_a")), col("_b"))))
      .withColumn("_kth", element_at(col("_u"), col("_L")))
    // union < k hashes ⟹ BOTH sketches were complete sets ⟹ exact arm
    val estU = when(col("_L") < k, col("_L").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1099511627776.0) / // 2^40
        greatest(col("_kth"), lit(1L)).cast("double"))
    val estJ = col("_both").cast("double") / col("_L").cast("double")
    paired.select(col("group_a"), col("group_b"),
      size(col("_a")).as("n_a_sketch"), size(col("_b")).as("n_b_sketch"),
      round(estJ, 6).as("est_jaccard"),
      round(estU, 4).as("est_union"),
      round(estJ * estU, 4).as("est_intersection"))
  }

  /** Quantile-bucket assignment WITHOUT a global sort — NTILE's job at
    * 100 TB: `NTILE(n) OVER (ORDER BY value)` funnels the corpus through
    * ONE partition; this instead estimates the n−1 bucket boundaries from
    * the deterministic level sample (one 1-row aggregate), broadcasts
    * them, and assigns buckets in a narrow second pass. Boundaries are
    * order statistics of the survivor sample (`values[ceil(i·m/n)]`,
    * integer arithmetic), so with ≤ b rows the split IS exact NTILE-by-
    * value; above b it is approximate within the sketch's sampling error
    * — but always DETERMINISTIC and SQL-replayable, never a function of
    * partitioning. Ties: a value equal to a boundary falls in the lower
    * bucket (strict `>` on both engines).
    *
    * Output: the input plus `bucket` (1-based, ≤ nBuckets).
    */
  def quantileBuckets(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      nBuckets: Int,
      b: Int = 4096,
      salt: String = "kll"): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val hv = conv(substring(md5(concat(lit(s"$salt:"),
      col(idCol).cast("string")).cast("binary")), 1, 10), 16, 10).cast("long")
    val sk = df
      .filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(hv.as("_hv"), col(valueCol).cast("double").as("_v"))
      .agg(org.apache.spark.sql.graft.LevelSample
        .level_sample(col("_hv"), col("_v"), b).as("ls"))
    val m = size(col("ls.values")).cast("long")
    // boundary i (1..n-1) at sorted-sample index ceil(i*m/n), all integer
    val bounds = sk.select(
      transform(sequence(lit(1), lit(nBuckets - 1)),
        i => element_at(col("ls.values"),
          greatest(floor((i.cast("long") * m + lit(nBuckets - 1).cast("long"))
            / lit(nBuckets.toDouble)).cast("int"), lit(1)))).as("_bounds"))
    // NULL and NaN values carry no rank: both are excluded from boundary
    // estimation above (the filter and LevelSample's NaN skip), so
    // assigning them a bucket would silently file them somewhere — NULL
    // compared below every boundary (old behavior: bucket 1) and NaN,
    // which Spark orders above every double, into the TOP bucket. Both
    // get bucket NULL instead: the row is kept, the non-answer is
    // explicit, and both engines agree (`NTILE` replays mirror it with
    // a CASE).
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col(valueCol).isNull ||
            isnan(col(valueCol).cast("double")), lit(null).cast("int"))
          .otherwise((lit(1) + size(filter(col("_bounds"),
            x => col(valueCol).cast("double") > x))).cast("int")))
      .drop("_bounds")
  }

  /** Heavy-hitter DISCOVERY per group: every value whose frequency is at
    * least `minFrac` of its group's rows, with its EXACT count — the
    * question q100's count–min sketch cannot ask ("what ARE the top
    * terms", vs "how often do these known terms occur") answered without
    * q42's full-vocabulary shuffle.
    *
    * Two passes, both sub-vocabulary:
    *
    *  1. CANDIDATES — one aggregate exchange folding the raw stream into
    *     a per-group [[org.apache.spark.sql.graft.MisraGries]] summary
    *     (k counters, mergeable by pointwise-add-and-truncate, so the
    *     partial aggregate combines map-side like the rest of the sketch
    *     family). The summary's survivor set is merge-order-dependent,
    *     but its GUARANTEE is not: every value with true frequency
    *     > n/(k+1) survives any merge tree. With k + 1 > 1/minFrac,
    *     the candidates are a certain superset of the answer.
    *  2. VERIFY — exact counts of the candidate values only: the
    *     broadcast candidate list filters the stream, so the counting
    *     shuffle carries at most groups × k keys, never the vocabulary.
    *
    * Because pass 2 is exact and pass 1 is a guaranteed superset, the
    * OUTPUT is fully deterministic — independent of partitioning and
    * merge order — and replays in SQL as a plain `GROUP BY ... HAVING
    * count ≥ ceil(minFrac·n)` (the threshold compares in integer
    * basis-point arithmetic on both engines). The summary-content
    * nondeterminism never reaches the result.
    *
    * Output per hitter: (groups..., term, n_occurrences, frequency
    * rounded to 6), one row per (group, value) meeting the threshold.
    *
    * @param minFrac frequency threshold in (0, 1), basis-point resolution
    * @param k       summary size; 0 (default) sizes it to 2/minFrac,
    *                twice the guarantee's minimum
    */
  def heavyHitters(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      minFrac: Double,
      k: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(minFrac > 0.0 && minFrac < 1.0,
      s"minFrac must lie in (0, 1), got $minFrac")
    val p = math.round(minFrac * 10000).toInt
    require(math.abs(minFrac * 10000 - p) < 1e-6,
      s"minFrac $minFrac finer than basis-point resolution")
    val kk = if (k > 0) k else math.max(16, math.ceil(2.0 / minFrac).toInt)
    require((kk + 1) * minFrac > 1.0,
      s"summary size $kk cannot guarantee minFrac=$minFrac hitters " +
        s"(need k + 1 > ${1.0 / minFrac})")
    val rows = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ col(valueCol).cast("string").as("_v"): _*)
    val cand = rows
      .groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.graft.MisraGries
        .misra_gries(col("_v"), kk).as("mg"))
      .select(groupCols.map(col) :+ col("mg.n").as("_n") :+
        explode(col("mg.items")).as("_v"): _*)
    rows
      .join(broadcast(cand), groupCols :+ "_v")
      .groupBy(groupCols.map(col) :+ col("_v"): _*)
      .agg(max(col("_n")).as("_n"), count(lit(1)).as("n_occurrences"))
      // exact threshold in integer arithmetic: cnt >= ceil(p·n/10000)
      .filter(col("n_occurrences") * 10000 >= lit(p.toLong) * col("_n"))
      .select(groupCols.map(col) :+ col("_v").as("term") :+
        col("n_occurrences") :+
        round(col("n_occurrences").cast("double") /
          col("_n").cast("double"), 6).as("frequency"): _*)
  }

  /** Count–min frequency estimates (Cormode & Muthukrishnan, J. Algorithms
    * 2005) for an audit term list, per group — the FREQUENCY member of the
    * sketch family (KMV = distinct, level sample = quantiles): "how often
    * does each of these terms appear per language" without a full
    * per-token aggregate (that is q42's exact job, and at 100 TB its
    * shuffle is the vocabulary; the sketch's is `depth × width` cells).
    *
    * Deterministic by the same discipline as the rest of the family: row
    * hashes are the salted md5 draw — ONE digest per value, its four
    * 32-bit words the per-row draws (see [[cmsBucketArray]]) — so the
    * cells — and therefore every estimate — replay bit-for-bit in SQL.
    * Mergeable: cells are sums, union = cell-wise add (exactly what the
    * partial aggregate computes map-side). Guarantees: estimate ≥ true
    * count always (collisions only ADD); estimate ≤ true + εN with
    * ε = e/width at the usual confidence given depth rows.
    *
    * Scale shape: one narrow ×depth projection of the value stream, then
    * ONE partial-combined aggregate whose distinct key space is
    * `groups × depth × width` (≤ a few thousand rows) — independent of
    * both corpus size and vocabulary; the query side joins the tiny
    * probe×depth frame against the broadcast cells.
    *
    * @param queries plan-time term list to estimate (the audit shape —
    *                a decontamination or tracking list); deduplicated
    * @param depth   hash rows (4 ⇒ wrong-by-more-than-εN prob ~e⁻⁴)
    * @param width   buckets per row (ε = e/width)
    */
  def cmsCounts(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      queries: Seq[String],
      depth: Int = 4,
      width: Int = 1024,
      salt: String = "cms"): DataFrame =
    cmsEstimates(cmsCells(df, groupCols, valueCol, depth, width, salt),
      groupCols, queries, depth, width, salt)

  /** All `depth` bucket draws from ONE md5: the 128-bit digest is four
    * independent 32-bit words, so row r's bucket is hex chars
    * [1+8r, 8] mod width — one hash per value instead of one per (value,
    * row), which was the measured cost of the cells pass (the md5 is the
    * only non-trivial per-token work). */
  private[operators] def cmsBucketArray(
      v: Column, depth: Int, width: Int, salt: String): Column = {
    val h = md5(concat(lit(s"$salt:"), v.cast("string")).cast("binary"))
    array((0 until depth).map(r =>
      pmod(conv(substring(h, 1 + 8 * r, 8), 16, 10).cast("long"),
        lit(width.toLong))): _*)
  }

  /** The CMS cell table (groups..., _r, _b, _c) — groups × depth × width
    * sums, the one aggregate exchange. Cells are mergeable by cell-wise
    * addition, which is what makes the PERSISTED profile's frequency
    * append trivial. */
  private[operators] def cmsCells(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      depth: Int,
      width: Int,
      salt: String): DataFrame = {
    require(depth >= 1 && depth <= 4, s"depth must be in [1,4], got $depth")
    require(width >= 16 && width <= (1 << 30),
      s"width must be in [16, 2^30], got $width")
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ col(valueCol).as("_v"): _*)
      .select(groupCols.map(col) :+
        posexplode(cmsBucketArray(col("_v"), depth, width, salt)): _*)
      .withColumnRenamed("pos", "_r").withColumnRenamed("col", "_b")
      .groupBy(groupCols.map(col) :+ col("_r") :+ col("_b"): _*)
      .agg(count(lit(1)).as("_c"))
  }

  /** Estimates for `queries` from a cell table: min over depth rows of
    * the matching cell (missing cell = 0 ⇒ the term never hashed there ⇒
    * estimate 0, correctly). */
  private[operators] def cmsEstimates(
      cells: DataFrame,
      groupCols: Seq[String],
      queries: Seq[String],
      depth: Int,
      width: Int,
      salt: String): DataFrame = {
    require(queries.nonEmpty, "need at least one query term")
    val spark = cells.sparkSession
    import spark.implicits._
    val probes = queries.distinct.toDF("term")
      .select(col("term"),
        posexplode(cmsBucketArray(col("term"), depth, width, salt)))
      .withColumnRenamed("pos", "_r").withColumnRenamed("col", "_b")
    probes
      .join(cells, Seq("_r", "_b"), "inner")
      .groupBy(groupCols.map(col) :+ col("term"): _*)
      .agg((min(col("_c")) * when(count(lit(1)) === depth, lit(1L))
        .otherwise(lit(0L))).as("est_count"))
  }

  /** Approximate quantiles of `valueCol` per group via the deterministic
    * level sample ([[org.apache.spark.sql.graft.LevelSample]] — KLL's
    * geometric-level space discipline with the salted-md5 draw as the
    * compaction coin, so the whole sketch replays in SQL; see its
    * scaladoc for why the final state is canonical under any
    * partitioning).
    *
    * Output per group: `level` (each survivor stands for 2^level rows —
    * 0 means the quantiles are EXACT), `n_retained`, and one `p<q>`
    * column per requested quantile holding `values[ceil(q*m)]` of the
    * ascending-sorted survivor sample (1-indexed; the same index
    * arithmetic an oracle applies with a window rank).
    *
    * Scale shape: ONE aggregate exchange carrying at most `b` (hash,
    * value) pairs per (group, partition) — no per-group sort of the
    * corpus, no window, no distinct pre-pass; the sort inside eval is
    * over ≤ `b` doubles. `idCol` provides row identity: duplicated
    * values with distinct ids are sampled independently, preserving
    * multiplicity, and NULL id/value rows are excluded.
    *
    * @param qs quantiles in (0, 1), e.g. Seq(0.5, 0.9, 0.99)
    * @param b  sketch buffer (256 ⇒ sample within a 2x band of 128–256,
    *           quantile error ~O(1/sqrt(b)))
    */
  def quantileSketch(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      qs: Seq[Double],
      b: Int = 256,
      salt: String = "kll"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q < 1.0),
      s"quantiles must lie in (0, 1), got $qs")
    val hv = conv(substring(md5(concat(lit(s"$salt:"),
      col(idCol).cast("string")).cast("binary")), 1, 10), 16, 10).cast("long")
    val sk = df
      .filter(col(idCol).isNotNull && col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ hv.as("_hv") :+
        col(valueCol).cast("double").as("_v"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.graft.LevelSample
        .level_sample(col("_hv"), col("_v"), b).as("ls"))
    val m = size(col("ls.values"))
    def qName(q: Double): String =
      "p" + BigDecimal(q * 100).underlying.stripTrailingZeros.toPlainString
        .replace(".", "_")
    val qCols = qs.map { q =>
      // ceil(q*m) computed in INTEGER arithmetic (q at basis-point
      // resolution): ceil(p*m/10000) = (p*m + 9999) div 10000. A double
      // ceil(0.9 * m) can land one off from a DECIMAL engine's (0.9*220
      // is 198.00000000000003 as doubles), which would silently pick the
      // neighboring order statistic.
      val p = math.round(q * 10000).toInt
      require(math.abs(q * 10000 - p) < 1e-6,
        s"quantile $q finer than basis-point resolution")
      val idx = floor((lit(p.toLong) * m.cast("long") + lit(9999L)) / lit(10000.0))
        .cast("int")
      round(element_at(col("ls.values"), greatest(idx, lit(1))), 6).as(qName(q))
    }
    sk.select((groupCols.map(col) :+ col("ls.level").as("level") :+
      m.as("n_retained")) ++ qCols: _*)
  }
}
