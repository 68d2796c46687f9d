package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Diversified top-k re-ranking — Maximal Marginal Relevance (Carbonell &
  * Goldstein, SIGIR 1998): from a per-query CANDIDATE set (an ANN
  * searcher's top-N), greedily select `k` items maximizing
  * `λ·relevance − (1−λ)·max_cosine_to_already_selected`, so the answer
  * set trades pure similarity for coverage. The retrieval counterpart of
  * the dedup family: a near-dup-heavy corpus otherwise fills all of
  * top-k with one semantic cluster (exactly the q54/q61 failure mode,
  * on the serving side).
  *
  * Formulation, deterministic and SQL-replayable end-to-end:
  *
  *  - round 1 picks the highest-relevance candidate (tie: neighbor asc);
  *  - each later round scores every unselected candidate by
  *    `λ·rel − (1−λ)·max(sim to selected)` and picks the max
  *    (tie: neighbor asc) — the oracle unrolls these rounds as CTEs,
  *    the same replay trick as the BPE merge chain;
  *  - pairwise candidate cosine comes from the caller-supplied vector
  *    table, computed once before the loop.
  *
  * Scale shape: everything after candidate generation is bounded by the
  * candidate-set size `N` per query — the pairwise-sim self-join is an
  * equi-join on `vec_id` producing ≤ N² narrow rows per query (N is
  * 8–64 in practice, never the corpus), each greedy round is one
  * max_by aggregate per query over ≤ N rows, and the round count is the
  * constant `k`. No stage ever touches corpus-scale data; the expensive
  * part stays in the ANN searcher that produced the candidates (q60/q87's
  * cell-bounded joins). Rounds iterate as a driver loop over DataFrame
  * ops with the selected set carried as a growing column set — `k` is a
  * small constant, so lineage stays shallow and nothing is collected.
  */
object Diversify {

  /** MMR-select `k` of each query's candidates.
    *
    * @param candidates `(vec_id, neighbor_id, rel)` — per-query candidate
    *                   pool with relevance scores (higher = better), e.g.
    *                   an ANN top-N
    * @param vectors    `(id, v)` — vector lookup for the pairwise
    *                   diversity term (must cover every neighbor_id)
    * @param k          items to select per query
    * @param lambda     relevance weight in [0, 1]: 1 = pure relevance
    *                   (plain top-k), 0 = pure diversity
    * @return `(vec_id, neighbor_id, mmr_score, mmr_rank)` — rank is the
    *         selection round (1-based); round 1's score is its relevance
    */
  /** Restart a bounded loop-invariant frame's plan at a LogicalRDD — the
    * [[Dedup.duplicateClusters]] truncation idiom: the RDD persists
    * (MEMORY_AND_DISK, computed once), and every greedy round's plan
    * references a leaf scan instead of re-embedding the (possibly
    * expensive) upstream searcher chain that produced the candidates.
    * Without the cut, the k=3 declared query's plan carried 67 exchanges
    * and 21 replicated centroid crossjoins — one per round per
    * reference. The frames are bounded by contract (≤ N and ≤ N² rows
    * per query, N the candidate-pool size), so the persisted blocks are
    * kilobytes; the cut registers with the [[CacheScope]] in implicit
    * scope so a long-lived session's release drains it (the
    * SessionSoakSpec contract). */
  private def materialized(df: DataFrame)(implicit caches: CacheScope): DataFrame =
    df.sparkSession.createDataFrame(caches.pinRdd(df.rdd), df.schema)

  def mmr(
      candidates: DataFrame,
      vectors: DataFrame,
      k: Int,
      lambda: Double)(implicit caches: CacheScope): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")

    val cand = materialized(
      candidates.select(col("vec_id"), col("neighbor_id"), col("rel")))

    // pairwise cosine among each query's candidates: equi-join on vec_id,
    // <= N^2 narrow rows per query, computed once for all rounds
    val vn = vectors
      .select(col("id"), toDouble(col("v")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .filter(col("nrm") > 0)
    val withVec = cand
      .join(vn.select(col("id").as("neighbor_id"), col("v"), col("nrm")), Seq("neighbor_id"))
    val sims = materialized(withVec.alias("a")
      .join(withVec.alias("b"), col("a.vec_id") === col("b.vec_id") &&
        col("a.neighbor_id") =!= col("b.neighbor_id"))
      .select(col("a.vec_id").as("vec_id"),
        col("a.neighbor_id").as("a_id"), col("b.neighbor_id").as("b_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("sim")))

    // round 1: pure relevance (ties: neighbor asc)
    def pick(scored: DataFrame, scoreCol: Column): DataFrame =
      scored.groupBy(col("vec_id"))
        .agg(max_by(struct(col("neighbor_id"), scoreCol.as("s")),
          struct(scoreCol, -col("neighbor_id"))).as("_p"))
        .select(col("vec_id"), col("_p.neighbor_id").as("neighbor_id"),
          col("_p.s").as("mmr_score"))

    var selected = pick(cand, col("rel")).withColumn("mmr_rank", lit(1))

    // rounds 2..k: score = lambda*rel - (1-lambda)*max(sim to selected).
    // Each round: one anti-join (drop selected), one join against the
    // bounded sims of selected items, one max_by per query — all row
    // counts <= N per query, k rounds total.
    for (round <- 2 to k) {
      val selIds = selected.select(col("vec_id"), col("neighbor_id"))
      val remaining = cand.join(selIds, Seq("vec_id", "neighbor_id"), "left_anti")
      val toSel = sims
        .join(selIds.withColumnRenamed("neighbor_id", "b_id"), Seq("vec_id", "b_id"))
        .groupBy(col("vec_id"), col("a_id").as("neighbor_id"))
        .agg(max(col("sim")).as("max_sel_sim"))
      val scored = remaining.join(toSel, Seq("vec_id", "neighbor_id"), "left")
        // a candidate with no sim row (single-candidate pool) has no
        // diversity penalty
        .withColumn("max_sel_sim", coalesce(col("max_sel_sim"), lit(0.0)))
        .withColumn("mmr",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("max_sel_sim"))
      selected = selected.unionByName(
        pick(scored, col("mmr")).withColumn("mmr_rank", lit(round)))
    }
    selected.select(col("vec_id"), col("neighbor_id"),
      col("mmr_score"), col("mmr_rank"))
  }
}
