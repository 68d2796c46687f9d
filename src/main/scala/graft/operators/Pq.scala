package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Product quantization for approximate nearest-neighbour search (Jégou,
  * Douze, Schmid, TPAMI 2011) — the codebook compression stage of the
  * IVF-PQ index family: [[IvfIndex]]'s int8 sibling stores dim bytes per
  * vector; PQ stores `m` bytes (one code per subspace) plus a constant
  * codebook, an order of magnitude smaller again at 100 TB.
  *
  * Formulation, all SQL-replayable:
  *
  *  - vectors unit-normalize, then split into `m` contiguous subvectors;
  *  - each subspace trains its own `nCodes`-entry codebook by plain Lloyd
  *    L2 k-means — run as ONE grouped job across all subspaces (`sub` is
  *    just another grouping key), not `m` separate fits: assignment ranks
  *    `cnorm² − 2·dot(sv, c)` (monotone in L2 distance, division-free, so
  *    no zero-norm NaN guard is needed), means reduce long-form per
  *    `(sub, code, pos)` exactly like [[KMeans.fit]];
  *  - seeds are the `nCodes` vectors with the smallest `md5(id)` — the
  *    same reproducible-sample trick as [[KMeans.fit]] and
  *    [[Similarity.ivfTopK]], sliced per subspace; codes that end an
  *    iteration empty are dropped, matching the SQL replay;
  *  - encoding assigns every subvector to its nearest code: `m` small
  *    integers per vector;
  *  - ADC scoring reconstructs `cosine(q, x) ≈ Σ_sub dot(q_sub, c_{sub,
  *    code_sub(x)})` — the query side stays exact, only the corpus side is
  *    quantized. Partial scores fold in ascending-`sub` order on both
  *    sides, so the sum is deterministic and replays bit-for-bit.
  *
  * Scale shape of [[topKInCells]] (the IVF-PQ composition): candidates are
  * bounded by the same md5-derived Voronoi cells as
  * [[Similarity.ivfTopK]] (equi-join on cell, never all-pairs); the
  * codebook is `m × nCodes × subDim` doubles — kilobytes, broadcast; the
  * scoring join moves `(pair, sub, code)` rows and subvector slices, never
  * whole vectors; the per-pair fold is `m` additions. The classic
  * per-query lookup-table trick is an arithmetic reordering of exactly
  * this join — same cost model, expressed relationally.
  */
object Pq {

  private def sumSq(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x * x)

  /** One row per (vector, subspace): `(id, sub, sv)` over unit-normalized
    * vectors. */
  private[graft] def subvectors(unit: DataFrame, m: Int, subDim: Int): DataFrame =
    unit.select(col("id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col("u"), s * subDim + 1, subDim).as("sv"))): _*)).as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))

  /** Codebook rows `(sub, code, c_v)` after `iterations` Lloyd steps. */
  private def iterate(
      spark: org.apache.spark.sql.SparkSession,
      subs: DataFrame,
      seeds: Seq[(Int, Int, Seq[Double])],
      iterations: Int): Seq[(Int, Int, Seq[Double])] = {
    var centroids = seeds
    for (_ <- 1 to iterations) {
      val cbDf = spark.createDataFrame(centroids).toDF("sub", "code", "c_v")
        .withColumn("cn2", sumSq(col("c_v")))
      val assigned = subs.join(broadcast(cbDf), Seq("sub"))
        .withColumn("d", col("cn2") - lit(2.0) * dot(col("sv"), col("c_v")))
        .groupBy(col("id"), col("sub"))
        .agg(min_by(struct(col("code"), col("sv")),
          struct(col("d"), col("code"))).as("_best"))
        .select(col("sub"), col("_best.code").as("code"), col("_best.sv").as("sv"))
      // long-form means; the collect is control-plane (≤ m×nCodes×subDim)
      val rows = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("x")).as("c"))
        .collect()
      centroids = rows
        .groupBy(r => (r.getInt(0), r.getInt(1))).toSeq
        .map { case ((sub, code), comps) =>
          (sub, code, comps.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq)
        }
        .sortBy(c => (c._1, c._2))
    }
    centroids
  }

  /** The stored/trained codebook as a broadcastable scoring frame
    * `(sub, code, c_v, cn2)` — the shape [[assignCodes]] consumes. */
  private[graft] def codebookFrame(
      spark: org.apache.spark.sql.SparkSession,
      cb: Seq[(Int, Int, Seq[Double])]): DataFrame =
    spark.createDataFrame(cb).toDF("sub", "code", "c_v")
      .withColumn("cn2", sumSq(col("c_v")))

  /** Grouped-Lloyd codebook training over unit vectors `(id, u)` — the
    * model half of [[buildModel]], reusable against any corpus (ad-hoc
    * self-search or a persisted index's stored vectors): md5-smallest
    * seeds, `iterations` assignment/mean rounds, empty codes dropped.
    * Returns the (pinned) subvector frame alongside the codebook so
    * callers encode without re-exploding. */
  private[graft] def trainCodebooks(
      unit: DataFrame,
      m: Int,
      subDim: Int,
      nCodes: Int,
      iterations: Int)(implicit caches: CacheScope): (DataFrame, Seq[(Int, Int, Seq[Double])]) = {
    val spark = unit.sparkSession
    val subs = caches.pin(subvectors(unit, m, subDim))
    val seedVecs = unit
      .withColumn("_h", md5(col("id").cast("string").cast("binary")))
      .orderBy(col("_h")).limit(nCodes)
      .select(col("u")).collect().map(_.getSeq[Double](0))
    val seeds = for {
      sub <- 0 until m; (u, code) <- seedVecs.zipWithIndex
    } yield (sub, code, u.slice(sub * subDim, (sub + 1) * subDim): Seq[Double])
    (subs, iterate(spark, subs, seeds.toSeq, iterations))
  }

  /** Long-form codes `(id, sub, code)` collapsed to the ascending-sub
    * array shape [[org.apache.spark.sql.graft.PqAdcScore]] consumes. */
  private[graft] def codesToArray(codes: DataFrame): DataFrame =
    codes.groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s.getField("code")).as("n_codes"))

  private[graft] def assignCodes(subs: DataFrame, cbDf: DataFrame): DataFrame =
    subs.join(broadcast(cbDf), Seq("sub"))
      .withColumn("d", col("cn2") - lit(2.0) * dot(col("sv"), col("c_v")))
      .groupBy(col("id"), col("sub"))
      .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))

  /** Everything the two search entry points share: normalized vectors,
    * the IVF candidate bound, and the trained-and-encoded PQ model —
    * `cb` is the driver-side codebook (it is collected during training
    * anyway; m × nCodes × subDim doubles, kilobytes). */
  private[graft] case class Model(base: DataFrame, cand: DataFrame, unit: DataFrame,
      subs: DataFrame, codes: DataFrame, cb: Seq[(Int, Int, Seq[Double])],
      nCodes: Int, subDim: Int)

  private[graft] def buildModel(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      nProbe: Int,
      m: Int,
      nCodes: Int,
      iterations: Int)(implicit caches: CacheScope): Model = {
    require(m >= 1 && nCodes >= 1 && iterations >= 1,
      s"m/nCodes/iterations must be >= 1")
    val spark = df.sparkSession
    val base = caches.pin(df
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .filter(col("nrm") > 0))
    val dim = base.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m

    // ---- cell bound (identical formulation to Similarity.ivfTopK) ----
    val cents = base
      .withColumn("_h", md5(col("id").cast("string").cast("binary")))
      .orderBy(col("_h")).limit(nCells)
      .select(col("id").as("c_id"), col("v").as("c_v"), col("nrm").as("c_nrm"))
      .filter(col("c_nrm") > 0)
    val assignW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("c_sim").desc, col("c_id").asc)
    val ranked = base.crossJoin(broadcast(cents))
      .withColumn("c_sim", dot(col("v"), col("c_v")) / (col("nrm") * col("c_nrm")))
      .withColumn("c_rank", row_number().over(assignW))
      .filter(col("c_rank") <= nProbe)
    val assigned = ranked.filter(col("c_rank") === 1)
      .select(col("id"), col("c_id").as("cell"))
    val probes = ranked.select(col("id").as("q_id"), col("c_id").as("cell"))
    val cand = probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id").as("vec_id"), col("id").as("neighbor_id"))
      .dropDuplicates("vec_id", "neighbor_id")

    // ---- PQ codebooks + codes ----
    val unit = base.withColumn("u", transform(col("v"), x => x / col("nrm")))
    val (subs, cb) = trainCodebooks(unit, m, subDim, nCodes, iterations)
    val cbDf = broadcast(codebookFrame(spark, cb))
    Model(base, cand, unit, subs, assignCodes(subs, cbDf), cb, nCodes, subDim)
  }

  /** IVF-PQ top-k self-search: candidates from `nProbe` of `nCells`
    * md5-derived Voronoi cells (the [[Similarity.ivfTopK]] bound), scored
    * by PQ asymmetric distance instead of exact cosine. Returns
    * `(vec_id, neighbor_id, score, rank)`, `score` the reconstructed
    * cosine rounded to 6 places. */
  def topKInCells(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int,
      nProbe: Int,
      m: Int,
      nCodes: Int,
      iterations: Int)(implicit caches: CacheScope): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val mod = buildModel(df, idCol, vecCol, nCells, nProbe, m, nCodes, iterations)
    adcScores(mod, m)
      .groupBy(col("vec_id"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs(col("score"), col("neighbor_id"), k).as("tk"))
      .select(col("vec_id"), posexplode(col("tk")).as(Seq("idx", "e")))
      .select(col("vec_id"), col("e.neighbor_id").as("neighbor_id"),
        round(col("e.score"), 6).as("score"), (col("idx") + 1).as("rank"))
  }

  /** The codebook flattened to [[org.apache.spark.sql.graft.PqAdcScore]]'s
    * `double[m · stride · subDim]` constant layout; dropped (empty) codes
    * leave zero slots that no stored code ever indexes. */
  private[graft] def flatCodebook(
      cb: Seq[(Int, Int, Seq[Double])], m: Int, stride: Int, subDim: Int): Array[Double] = {
    val flat = new Array[Double](m * stride * subDim)
    cb.foreach { case (sub, code, v) =>
      var i = 0
      v.foreach { x => flat((sub * stride + code) * subDim + i) = x; i += 1 }
    }
    flat
  }

  /** `(vec_id, neighbor_id, score)` ADC scores for every candidate pair,
    * computed ROW-LOCALLY by the native [[org.apache.spark.sql.graft
    * .PqAdcScore]] expression: the trained codebook rides along as a
    * flattened constant (kilobytes — the expression-level analogue of a
    * broadcast dimension), the corpus side joins one m-byte code array per
    * neighbor, the query side its unit vector, and the whole ascending-sub
    * partial-dot fold runs as two primitive loops inside whole-stage
    * codegen. Bit-identical to the long-form (pair × sub) join + grouped
    * fold the oracle replays — same subvector slices, same per-sub dot
    * order, same 0.0-seeded ascending-sub fold — but the scoring join
    * moves one row per pair instead of `m`, carries no per-pair
    * aggregation state, and pays no interpreted lambda dispatch. */
  private[graft] def adcScores(mod: Model, m: Int): DataFrame = {
    val flat = flatCodebook(mod.cb, m, mod.nCodes, mod.subDim)
    val codesArr = codesToArray(mod.codes)
    mod.cand
      .join(codesArr.withColumnRenamed("id", "neighbor_id"), Seq("neighbor_id"))
      .join(mod.unit.select(col("id").as("vec_id"), col("u")), Seq("vec_id"))
      .select(col("vec_id"), col("neighbor_id"),
        org.apache.spark.sql.graft.PqAdcScore.pq_adc_score(
          col("u"), col("n_codes"), flat.toIndexedSeq, mod.nCodes, mod.subDim)
          .as("score"))
  }

  /** Two-stage IVF-PQ search (the standard shortlist-and-refine trick,
    * Jégou et al. 2011 §V): PQ ADC ranks the cell-bounded candidates, the
    * top `shortlist` per query are re-scored by EXACT cosine on the
    * original vectors, and the final top-k comes from the exact scores.
    * The quantization error that caps [[topKInCells]]'s recall@k is thus
    * confined to shortlist membership; with `shortlist >> k`, recall is
    * limited only by the IVF probe width.
    *
    * Scale shape: identical to [[topKInCells]] up to the shortlist cut
    * (row_number inside the candidate bound), after which the exact
    * re-rank joins move only `shortlist` rows per query against the
    * vector table — an equi-join on id, bucketable, never all-pairs.
    * Returns `(vec_id, neighbor_id, cosine, rank)` with exact cosine
    * rounded to 4 places (the same contract as [[Similarity.ivfTopK]]). */
  def topKRefined(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int,
      nProbe: Int,
      m: Int,
      nCodes: Int,
      iterations: Int,
      shortlist: Int)(implicit caches: CacheScope): DataFrame = {
    require(shortlist >= k && k >= 1, s"need shortlist $shortlist >= k $k >= 1")
    val mod = buildModel(df, idCol, vecCol, nCells, nProbe, m, nCodes, iterations)

    // ---- stage 1: ADC shortlist (TopKPairs ≡ row_number's
    // (score desc, id asc) cut, but partial buffers combine map-side) ----
    val short = adcScores(mod, m)
      .groupBy(col("vec_id"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs(col("score"), col("neighbor_id"), shortlist).as("tk"))
      .select(col("vec_id"), explode(col("tk")).as("e"))
      .select(col("vec_id"), col("e.neighbor_id").as("neighbor_id"))

    // ---- stage 2: exact cosine re-rank of the shortlist only ----
    Similarity.exactRerank(short,
        mod.base.select(col("id").as("vec_id"),
          col("v").as("q_v"), col("nrm").as("q_nrm")),
        mod.base.select(col("id").as("neighbor_id"),
          col("v").as("n_v"), col("nrm").as("n_nrm")), k)
      .select(col("vec_id"), col("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }
}
