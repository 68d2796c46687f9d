package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data assembly.
  *
  * Both operators rank/draw by an md5-derived 40-bit value of the row id,
  * never by `rand()`: runs are reproducible, results are independent of
  * partitioning and task retries (a `rand()` sample changes under AQE
  * re-planning or speculative execution), and any external SQL engine can
  * replay the exact sample — the property every other hash family in this
  * repo exploits for oracle checks.
  */
object Sampling {

  /** 40-bit draw for `id` under `salt` — `CAST('0x' || substring(
    * md5('salt:' || CAST(id AS VARCHAR)), 1, 10) AS BIGINT)` in SQL. */
  private def draw40(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt:"), id.cast("string")).cast("binary")), 1, 10),
      16, 10).cast("long")

  /** Stratified quota sampling: at most `quota` rows per group (stratum),
    * the rows with the smallest salted-md5 draw — a uniform, reproducible
    * choice within each stratum. The per-stratum cap is how corpus mixes
    * bound any one source/language (e.g. "≤ 1M docs per (source, lang)").
    *
    * Scale: selection is a [[org.apache.spark.sql.graft.TopKPairs]]
    * aggregate, NOT a `row_number()` window — partial top-k buffers
    * combine map-side, so only `quota` rows per (group, partition) reach
    * the shuffle instead of the whole corpus sorting inside each stratum.
    * The keeper list (groups × quota ids) then prunes the corpus with one
    * semi join (broadcast when small).
    *
    * @param idCol BIGINT row id (the TopK buffer carries long ids)
    */
  def quotaSample(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      quota: Int,
      salt: String = "qs"): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    require(groupCols.nonEmpty, "need at least one stratum column")
    // negative draw: TopKPairs keeps highest score first → smallest draws,
    // ties on the 40-bit draw broken by id asc on both engine and oracle
    val keep = df
      .select(groupCols.map(col) :+ col(idCol).as("_id"): _*)
      .withColumn("_score", -draw40(col("_id"), salt).cast("double"))
      .groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs(col("_score"), col("_id"), quota).as("tk"))
      .select(explode(col("tk.neighbor_id")).as("_keep_id"))
    df.join(keep, df(idCol) === col("_keep_id"), "left_semi")
  }

  /** Deterministic per-stratum Bernoulli sampling — the source-mixing op:
    * keep a row iff its salted 40-bit draw, as a fraction of 2⁴⁰, falls
    * under its stratum's rate ("80% of web, 50% of books, 10% of the
    * rest"). Fully NARROW — a filter fused into the scan, no shuffle, no
    * driver state — and exact in expectation per stratum.
    *
    * @param rates stratum value → keep-rate in [0, 1]; unlisted strata get
    *              `defaultRate`
    */
  def rateSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      salt: String = "mix"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val frac = draw40(col(idCol), salt).cast("double") / lit(1099511627776.0) // 2^40
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (stratum, r)) => when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(frac < rate)
  }

  /** Deterministic named dataset split ("train"/"val"/"test"…): each row's
    * salted 40-bit draw, as a fraction of 2⁴⁰, lands in the cumulative
    * interval of exactly one split. Fully narrow (a projection fused into
    * the scan), reproducible across runs/layouts, disjoint and exhaustive
    * by construction, and replayable in SQL — the properties `rand()`
    * splits famously lack (a retried task re-draws and a doc lands in
    * both train and test).
    *
    * @param splits ordered (name, fraction); fractions must sum to 1 */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "need non-empty splits with positive fractions")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val frac = draw40(col(idCol), salt).cast("double") / lit(1099511627776.0) // 2^40
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val assign = splits.init.zip(cum.init).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), bound)) =>
        when(frac < bound, lit(name)).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** LEAKAGE-SAFE dataset split: [[assignSplit]] keyed by each row's
    * duplicate-cluster ROOT instead of its own id, so a whole near-dup
    * cluster lands in ONE split. Splitting per-doc leaks: near-duplicates
    * straddle train/test and the eval set scores memorization (the
    * train/test overlap failure documented by Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022 §6.2) —
    * deduplicating is not enough if the split itself can separate a
    * surviving doc from the near-copy that informed it.
    *
    * `pairs` is any near-dup pair list this engine produces
    * ([[Dedup.jaccardPairs]], [[Dedup.minhashLshPairs]], SimHash, the
    * semantic pairs — columns `(a_id, b_id)`); components come from
    * [[Dedup.duplicateClusters]] (min-id root), docs in no pair root
    * themselves. The draw hashes the ROOT id, so adding a split or
    * changing fractions can never tear a cluster apart, and a doc's
    * assignment is stable under corpus growth that doesn't change its
    * cluster root.
    *
    * Scale: the pair plan dominates (banded/bucketed upstream); the split
    * itself adds one left join of the corpus against the (small) clustered
    * subset and a narrow projection — no new corpus shuffle beyond that
    * join's exchange.
    *
    * Output: `df` + `root` + `split`. */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    // `root`/`split` are OUTPUT columns — reject inputs that already carry
    // them (silent overwrite would corrupt the caller's data); the cluster
    // join key is underscore-namespaced so an input `cluster_id` column can
    // never capture the left-join resolution.
    Seq("root", "split").foreach { c =>
      require(!df.columns.contains(c),
        s"leakageSafeSplit emits a '$c' column; input already has one — rename it first")
    }
    val clusters = Dedup.duplicateClusters(pairs)
      .select(col("id").as(idCol), col("cluster_id").as("_lss_cluster_id"))
    val rooted = df.join(clusters, Seq(idCol), "left")
      .withColumn("root", coalesce(col("_lss_cluster_id"), col(idCol)))
      .drop("_lss_cluster_id")
    assignSplit(rooted, "root", splits, salt)
  }

  /** Deterministic global training shuffle: every row gets a stable
    * `(shard, shard_pos)` — shard by the salted draw mod `nShards`,
    * position by the draw's rank within the shard. Reading shards in order
    * replays one fixed uniform permutation of the corpus, independent of
    * input layout; changing `salt` is a fresh epoch permutation.
    *
    * Scale: ONE hash exchange on `shard` plus an intra-shard sort — the
    * data has to move once, because physically shuffling it is the
    * operation. Rank is per-shard (parallel across `nShards` window
    * partitions), never a global single-partition window. Writers persist
    * with `.write.partitionBy("shard")` sorted by `shard_pos`.
    */
  def shardAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String = "shuf"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val d = draw40(col(idCol), salt)
    df.withColumn("shard", pmod(d, lit(nShards.toLong)).cast("int"))
      .withColumn("shard_pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(d, col(idCol))))
  }

  /** Temperature-flattened source mixing — the multilingual-LM sampling
    * rule (stratum share ∝ n_s^α, α ∈ (0, 1]; α = 1 is proportional,
    * smaller α up-weights small strata): derives per-stratum keep rates
    * hitting `targetRows` in expectation,
    * `rate_s = min(1, targetRows · n_s^α / Σ_s n_s^α / n_s)`, and applies
    * them with the same deterministic salted draw as [[rateSample]] — no
    * `rand()`, replayable in SQL, stable under retries/AQE.
    *
    * Scale: one partial-combined count per stratum (strata are few), a
    * 1-row normalizer, and a broadcast join of the tiny rate table back
    * onto the corpus — the corpus itself stays in one narrow filtered
    * pass. Oversubscribed strata cap at rate 1 (the expectation then
    * undershoots `targetRows`; re-run with a larger target if exact totals
    * matter). Rows with a NULL stratum are excluded from both the rate
    * computation and the output — they belong to no mix component (the
    * equi-join could never reach them, and counting them would silently
    * deflate every real stratum's rate). */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      alpha: Double,
      targetRows: Long,
      salt: String = "temp"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
    val z = counts.agg(sum(pow(col("_n"), alpha)).as("_z"))
    val rates = counts.crossJoin(broadcast(z))
      .withColumn("_rate", least(lit(1d),
        lit(targetRows.toDouble) * pow(col("_n"), alpha) / col("_z") / col("_n")))
      .select(col(strataCol), col("_rate"))
    val frac = draw40(col(idCol), salt).cast("double") / lit(1099511627776.0) // 2^40
    df.join(broadcast(rates), Seq(strataCol))
      .filter(frac < col("_rate"))
      .drop("_rate")
      .select(df.columns.map(col): _*) // original column order
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis, "Weighted
    * random sampling with a reservoir", IPL 2006, algorithm A-ES): each row
    * draws u ∈ (0, 1] from the salted-md5 hash and is ranked by
    * ln(u)/weight — the monotone form of the paper's u^(1/w) key — so a
    * row's selection probability is proportional to its weight ("sample
    * documents ∝ token mass"), yet the draw is deterministic, layout-
    * independent, and replayable in SQL like every sampler here.
    *
    * Rows with weight ≤ 0 are excluded (they have no sampling mass and
    * u^(1/w) is undefined there).
    *
    * Scale: identical shape to [[quotaSample]] — the per-stratum top-k is
    * a `TopKPairs` partial aggregate (map-side combined, ≤ k rows per
    * (stratum, partition) reach the shuffle), and the keeper list prunes
    * the corpus with one semi join. Never a window, never a global sort.
    */
  def weightedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "ws"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (draw40(col("_id"), salt).cast("double") + lit(1.0)) /
      lit(1099511627776.0) // (hv+1)/2^40 ∈ (0, 1]
    val key = log(u) / col("_w").cast("double")
    val keep = df
      .select(col(strataCol), col(idCol).as("_id"), col(weightCol).as("_w"))
      .filter(col("_w") > 0)
      .withColumn("_key", key)
      .groupBy(col(strataCol))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs(col("_key"), col("_id"), k).as("tk"))
      .select(explode(col("tk.neighbor_id")).as("_keep_id"))
    df.join(keep, df(idCol) === col("_keep_id"), "left_semi")
  }

  /** Token-budget-capped corpus selection: within each stratum, rank rows
    * by `scoreCol` (desc, id asc on ties) and keep the greedy prefix whose
    * cumulative `weightCol` stays within `budget` — "the best documents
    * from each source, up to N tokens each". This is the budgeted form of
    * [[quotaSample]]: the cap is a weight (token) total instead of a row
    * count, the quality signal decides who fills it.
    *
    * Output adds `cum_weight` (the running total INCLUDING the row) so
    * the consumer can see how full each stratum's budget ran.
    *
    * Scale: a greedy prefix is inherently sequential within a stratum, so
    * this is one hash exchange on the stratum plus a per-stratum sort —
    * the same shape as any windowed rank, parallel across strata, skew
    * bounded by the largest stratum. There is no cheaper formulation that
    * preserves the "best first until the budget closes" semantics; when a
    * row-count cap suffices, [[quotaSample]] avoids the sort entirely.
    */
  def budgetSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      scoreCol: String,
      weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_weight", sum(col(weightCol).cast("long")).over(w))
      .filter(col("cum_weight") <= budget)
  }
}
