package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, APPENDABLE corpus profile — the sketch family as maintained
  * state, under the same CAS-versioned [[TableStore]] discipline as the
  * embedding indexes: build once over the corpus, then fold each arriving
  * batch into the committed sketches WITHOUT rescanning history, and
  * serve per-group statistics from state alone.
  *
  * What makes this safe is the sketches' CANONICITY, not luck:
  *
  *  - the KMV distinct sketch stores the k smallest distinct hashes per
  *    group; k-smallest-of(stored ∪ batch) = k-smallest-of(full corpus)
  *    because a hash dropped earlier was beaten by k still-stored smaller
  *    ones, so it can never re-enter any union's top-k;
  *  - the level sample stores (level, survivor hashes, values); for every
  *    L ≥ stored level the full corpus's survivor set at L equals
  *    filter(stored survivors ∪ batch, L) (masks nest), and the full
  *    corpus's canonical level can never be BELOW the stored level (its
  *    survivor counts only grow), so re-deriving the minimal fitting
  *    level over stored-∪-batch at offsets ≥ 0 reproduces the
  *    from-scratch sketch EXACTLY.
  *
  * The declared query (q105) proves the claim the strong way: build on
  * 90% of the corpus, append the other 10%, and the served profile must
  * hash-match a DuckDB oracle computed over the FULL corpus from scratch.
  *
  * Scale shape: build/append are the sketch aggregates themselves (one
  * exchange, ≤ k or ≤ b rows per group-partition); stored state is
  * ≤ (k + b)·groups rows; serving never touches the corpus.
  */
object CorpusProfile {

  private def kmvTable(name: String) = s"${name}_kmv"
  private def lvlTable(name: String) = s"${name}_lvl"

  private val HashSpace = 1099511627776.0 // 2^40

  private def draw(salt: String, c: Column): Column =
    conv(substring(md5(concat(lit(s"$salt:"), c.cast("string"))
      .cast("binary")), 1, 10), 16, 10).cast("long")

  /** KMV rows (group, hv) for a batch: k smallest distinct hashes. */
  private def kmvRows(
      df: DataFrame, groupCol: String, distinctCol: String, k: Int): DataFrame =
    df.filter(col(distinctCol).isNotNull)
      .select(col(groupCol).as("group"),
        draw("kmv", col(distinctCol)).as("_hv"))
      .groupBy(col("group"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs_distinct(-col("_hv").cast("double"), col("_hv"), k).as("tk"))
      .select(col("group"), explode(col("tk.neighbor_id")).as("hv"))

  /** Level-sample rows (group, level, hv, v) for a batch. */
  private def lvlRows(
      df: DataFrame, groupCol: String, idCol: String, numCol: String,
      b: Int): DataFrame =
    df.filter(col(idCol).isNotNull && col(numCol).isNotNull)
      .select(col(groupCol).as("group"), draw("kll", col(idCol)).as("_hv"),
        col(numCol).cast("double").as("_v"))
      .groupBy(col("group"))
      .agg(org.apache.spark.sql.graft.LevelSample
        .level_sample(col("_hv"), col("_v"), b).as("ls"))
      .select(col("group"), col("ls.level").as("level"),
        explode(arrays_zip(col("ls.hashes").as("hv"), col("ls.values").as("v")))
          .as("_e"))
      .select(col("group"), col("level"), col("_e.hv").as("hv"),
        col("_e.v").as("v"))

  /** Build the profile over `df` and commit both sketch tables. */
  def build(
      df: DataFrame,
      groupCol: String,
      distinctCol: String,
      idCol: String,
      numCol: String,
      k: Int,
      b: Int,
      store: TableStore,
      name: String): Unit = {
    store.write(kmvRows(df, groupCol, distinctCol, k), kmvTable(name))
    store.write(lvlRows(df, groupCol, idCol, numCol, b), lvlTable(name))
  }

  /** Fold a batch into the committed profile — no rescan of history; the
    * write CASes against the versions the merge derived from. */
  def append(
      spark: SparkSession,
      batch: DataFrame,
      groupCol: String,
      distinctCol: String,
      idCol: String,
      numCol: String,
      k: Int,
      b: Int,
      store: TableStore,
      name: String): Unit = {
    // KMV: stored hashes re-enter the same dedup top-k beside the batch's
    val (kmvStored, kmvVersion) = store.snapshot(spark, kmvTable(name))
    val kmvMerged = kmvStored
      .unionByName(batch.filter(col(distinctCol).isNotNull)
        .select(col(groupCol).as("group"), draw("kmv", col(distinctCol)).as("hv")))
      .groupBy(col("group"))
      .agg(org.apache.spark.sql.graft.TopKPairs
        .top_k_pairs_distinct(-col("hv").cast("double"), col("hv"), k).as("tk"))
      .select(col("group"), explode(col("tk.neighbor_id")).as("hv"))
    store.write(kmvMerged, kmvTable(name), Some(kmvVersion))

    // level sample: re-derive the canonical minimal level over
    // (stored survivors ∪ batch), probing offsets ABOVE the stored level
    // — correctness argument in the object scaladoc
    val (lvlStored, lvlVersion) = store.snapshot(spark, lvlTable(name))
    val storedLev = lvlStored.groupBy(col("group"))
      .agg(max(col("level")).as("_l0")) // level is constant per group
    val batchRows = batch.filter(col(idCol).isNotNull && col(numCol).isNotNull)
      .select(col(groupCol).as("group"), draw("kll", col(idCol)).as("hv"),
        col(numCol).cast("double").as("v"))
      .join(broadcast(storedLev), Seq("group"), "left")
      .withColumn("_l0", coalesce(col("_l0"), lit(0)))
      // 2^l0 exact as a double->long (l0 <= ~40); stored-mask survivors only
      .filter(pmod(col("hv"), pow(lit(2.0), col("_l0")).cast("long")) === 0)
      .select(col("group"), col("hv"), col("v"), col("_l0"))
    val unioned = lvlStored
      .join(broadcast(storedLev), Seq("group"))
      .select(col("group"), col("hv"), col("v"), col("_l0"))
      .unionByName(batchRows)
    // survivor counts at stored-level + offset 0..24; minimal fitting wins
    val counted = unioned
      .select(col("group"), col("hv"), col("v"), col("_l0"),
        explode(sequence(lit(0), lit(24))).as("_off"))
      .filter(pmod(col("hv"),
        pow(lit(2.0), col("_l0") + col("_off")).cast("long")) === 0)
    val chosen = counted
      .groupBy(col("group"), col("_off")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") <= b)
      .groupBy(col("group")).agg(min(col("_off")).as("_off"))
    val lvlMerged = unioned
      .join(broadcast(chosen), Seq("group"))
      .filter(pmod(col("hv"),
        pow(lit(2.0), col("_l0") + col("_off")).cast("long")) === 0)
      .select(col("group"), (col("_l0") + col("_off")).cast("int").as("level"),
        col("hv"), col("v"))
    store.write(lvlMerged, lvlTable(name), Some(lvlVersion))
  }

  private def cmsTable(name: String) = s"${name}_cms"
  private def admittedTable(name: String) = s"${name}_admitted"

  /** Exactly-once micro-batch admission: fold `batch` into the profile
    * unless this `batchId` was already admitted — the standard
    * batchId-gate a `foreachBatch` sink needs, because Structured
    * Streaming redelivers the in-flight batch after a failure and
    * [[append]] is (deliberately) not replay-idempotent: a duplicated
    * row would enter the level sample twice, exactly as it would in a
    * from-scratch build over a doubled corpus. The gate's version table
    * rides the same CAS store, so the admitted-id commit and the sketch
    * commits can never silently diverge under a concurrent writer.
    *
    * First admitted batch BUILDS the profile (tables absent); later ones
    * APPEND. Returns true when the batch was folded, false when skipped
    * as a replay. */
  def admitBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      groupCol: String,
      distinctCol: String,
      idCol: String,
      numCol: String,
      k: Int,
      b: Int,
      store: TableStore,
      name: String): Boolean = {
    import spark.implicits._
    val gate = admittedTable(name)
    val last =
      if (store.exists(gate))
        store.read(spark, gate).agg(max(col("batch_id"))).head().getLong(0)
      else -1L
    if (batchId <= last) false
    else {
      if (store.exists(kmvTable(name)))
        append(spark, batch, groupCol, distinctCol, idCol, numCol, k, b, store, name)
      else
        build(batch, groupCol, distinctCol, idCol, numCol, k, b, store, name)
      store.write(Seq(batchId).toDF("batch_id"), gate)
      true
    }
  }

  /** Streaming admission: every micro-batch of `stream` is folded into
    * the committed profile through the [[admitBatch]] gate — the profile
    * as a live sink. Drain with `Trigger.AvailableNow` for a bounded
    * stage, or leave running against a feed. */
  def admitStream(
      stream: DataFrame,
      groupCol: String,
      distinctCol: String,
      idCol: String,
      numCol: String,
      k: Int,
      b: Int,
      store: TableStore,
      name: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch.sparkSession, batch, batchId,
          groupCol, distinctCol, idCol, numCol, k, b, store, name)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Build the FREQUENCY tier: CMS cells over `valueCol` (typically an
    * exploded token stream), committed beside the other sketches. Cells
    * are per-(group, row, bucket) SUMS, so the append below is cell-wise
    * addition — the one sketch in the family whose merge needs no
    * argument at all. */
  def buildFreq(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      depth: Int,
      width: Int,
      store: TableStore,
      name: String): Unit =
    store.write(
      Sketches.cmsCells(df.select(col(groupCol).as("group"),
        col(valueCol).as("v")), Seq("group"), "v", depth, width, "cms"),
      cmsTable(name))

  /** Fold a batch's cells into the committed frequency tier. */
  def appendFreq(
      spark: SparkSession,
      batch: DataFrame,
      groupCol: String,
      valueCol: String,
      depth: Int,
      width: Int,
      store: TableStore,
      name: String): Unit = {
    val (stored, version) = store.snapshot(spark, cmsTable(name))
    val merged = stored
      .unionByName(Sketches.cmsCells(batch.select(col(groupCol).as("group"),
        col(valueCol).as("v")), Seq("group"), "v", depth, width, "cms"))
      .groupBy(col("group"), col("_r"), col("_b"))
      .agg(sum(col("_c")).as("_c"))
    store.write(merged, cmsTable(name), Some(version))
  }

  /** Takedown for the FREQUENCY tier: subtract a removed batch's cells
    * from the committed state — CMS counts are sums, so removal is exact
    * (cell-wise subtraction) PROVIDED the removed rows were genuinely in
    * the admitted corpus; counts are clamped at zero so a bad takedown
    * list degrades to an under-estimate rather than corrupting the
    * sketch. This is the one sketch in the profile that supports
    * removal: the KMV and level-sample tiers are NOT subtractive (a
    * dropped hash below the retained k / a pruned survivor cannot be
    * recovered), so id takedowns there mean a rebuild over the retained
    * corpus — the same honesty [[IvfIndex.remove]] states for its model:
    * cheap where the math allows it, a rebuild where it doesn't. */
  def removeFreq(
      spark: SparkSession,
      removed: DataFrame,
      groupCol: String,
      valueCol: String,
      depth: Int,
      width: Int,
      store: TableStore,
      name: String): Unit = {
    val (stored, version) = store.snapshot(spark, cmsTable(name))
    val negated = Sketches.cmsCells(removed.select(col(groupCol).as("group"),
        col(valueCol).as("v")), Seq("group"), "v", depth, width, "cms")
      .withColumn("_c", -col("_c"))
    val merged = stored.unionByName(negated)
      .groupBy(col("group"), col("_r"), col("_b"))
      .agg(greatest(sum(col("_c")), lit(0L)).as("_c"))
      .filter(col("_c") > 0)
    store.write(merged, cmsTable(name), Some(version))
  }

  /** Serve frequency estimates for `queries` from the committed cells. */
  def freq(
      spark: SparkSession,
      store: TableStore,
      name: String,
      queries: Seq[String],
      depth: Int,
      width: Int): DataFrame =
    Sketches.cmsEstimates(store.read(spark, cmsTable(name)),
      Seq("group"), queries, depth, width, "cms")

  /** Serve the per-group profile from state alone: (group, n_sketch,
    * est_distinct, level, n_retained, p<q>...) — the same estimator
    * arithmetic as the ad-hoc q93/q98 queries, so a full-corpus oracle
    * replays it. */
  def profile(
      spark: SparkSession,
      store: TableStore,
      name: String,
      k: Int,
      qs: Seq[Double]): DataFrame = {
    val kmv = store.read(spark, kmvTable(name))
      .groupBy(col("group"))
      .agg(count(lit(1)).cast("int").as("n_sketch"), max(col("hv")).as("_kth"))
      .select(col("group"), col("n_sketch"),
        round(when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
            greatest(col("_kth"), lit(1L)).cast("double")), 4).as("est_distinct"))
    val lvlBase = store.read(spark, lvlTable(name))
      .groupBy(col("group"))
      .agg(max(col("level")).as("level"),
        sort_array(collect_list(struct(col("v"), col("hv")))).as("_s"))
      .select(col("group"), col("level"),
        col("_s.v").as("_vs"), size(col("_s")).as("n_retained"))
    val m = col("n_retained").cast("long")
    val qCols = qs.map { q =>
      val p = math.round(q * 10000).toInt
      val idx = floor((lit(p.toLong) * m + lit(9999L)) / lit(10000.0)).cast("int")
      round(element_at(col("_vs"), greatest(idx, lit(1))), 6)
        .as("p" + BigDecimal(q * 100).underlying.stripTrailingZeros
          .toPlainString.replace(".", "_"))
    }
    kmv.join(lvlBase, Seq("group"))
      .select(Seq(col("group"), col("n_sketch"), col("est_distinct"),
        col("level"), col("n_retained")) ++ qCols: _*)
  }
}
