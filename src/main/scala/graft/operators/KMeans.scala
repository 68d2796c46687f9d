package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Deterministic spherical k-means (Lloyd iterations, cosine assignment)
  * over an embedding column — the trainer for [[Similarity.ivfTopK]]'s
  * cells: the IVF query path samples its centroids; this refines them into
  * fitted ones with the exact same assignment rule (cosine desc, cell asc),
  * so trained centroids drop straight in.
  *
  * Per iteration, on a 100 TB corpus:
  *
  *  - centroids (nCells × dim doubles — kilobytes) live on the DRIVER and
  *    BROADCAST into a crossJoin against ≤ nCells rows: assignment is one
  *    narrow pass, exactly MLlib's own k-means shuffle shape;
  *  - new centroids reduce as long-form `(cell, pos, partial-avg)` rows —
  *    map-side combine, one hash aggregation of nCells×dim groups; the
  *    collect back to the driver is control-plane (≤ nCells×dim rows).
  *
  * Determinism end-to-end: seeds are the `nCells` vectors with the
  * smallest `md5(id)` (the reproducible-sample trick of
  * [[Similarity.ivfTopK]], Similarity.scala:180), ties in assignment break
  * by cell index, and every arithmetic step is replayable in SQL — a fixed
  * iteration count unrolls into plain CTEs (q50's oracle does 2).
  *
  * Cells that end an iteration empty are dropped (their id is never
  * reused), matching the SQL replay exactly.
  *
  * Reference scope: summary/profiling surface extended to embeddings per
  * SURVEY §2; iterative refinement is the same bounded-work-loop shape as
  * the reference's queue drain (control_migration_schema_script.sql:463+).
  */
object KMeans {

  /** `iterations` Lloyd steps; returns fitted centroids in long form:
    * `(cell, pos, centroid, n_assigned)` with `cell` the 0-based seed rank
    * and `pos` the 0-based component. */
  def fit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      iterations: Int)(implicit caches: CacheScope): DataFrame = {
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = df.sparkSession
    // read once per iteration plus the seed scan — pin; the idempotent
    // scope also shares this entry with a composed ivfTopKWithCentroids
    // (identical normalized-base plan)
    val base = caches.pin(df
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2Norm(col("v"))))
      .filter(col("nrm") > 0)

    // seeds: md5-smallest ids, cell = 0-based rank in md5 order
    var centroids: Seq[(Int, Seq[Double], Long)] = base
      .withColumn("_h", md5(col("id").cast("string").cast("binary")))
      .orderBy(col("_h")).limit(nCells)
      .select(col("v")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0), 0L) }.toSeq

    for (_ <- 1 to iterations) {
      // zero-norm guard: a cell whose members averaged to the zero vector
      // (exactly opposite embeddings) would make sim = 0/0 = NaN, which
      // Spark sorts ABOVE every real cosine — the degenerate cell would
      // capture the whole corpus. Drop such cells instead (they carry no
      // direction); never triggered when inputs are real embeddings.
      val live = centroids.filter { case (_, v, _) => v.exists(_ != 0.0) }
      val cDf = spark.createDataFrame(
          live.map { case (cell, v, _) => (cell, v) })
        .toDF("cell", "c_v")
        .withColumn("c_nrm", l2Norm(col("c_v")))
      // argmax as a partial-combining AGGREGATE, not a per-id window: the
      // crossJoin emits each row's nCells candidates consecutively in its
      // own partition, so max_by collapses them map-side and the exchange
      // ships ONE row per vector — never corpus × nCells. Tie-break:
      // max of struct(sim, -cell) = highest sim, then lowest cell.
      val assigned = base.crossJoin(broadcast(cDf))
        .withColumn("sim", dot(col("v"), col("c_v")) / (col("nrm") * col("c_nrm")))
        .groupBy(col("id"))
        .agg(max_by(struct(col("cell"), col("v")),
          struct(col("sim"), -col("cell"))).as("_best"))
        .select(col("_best.cell").as("cell"), col("_best.v").as("v"))
      // long-form mean: map-side partial avg over (cell, pos); collect is
      // control-plane (≤ nCells × dim rows)
      val rows: Array[Row] = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"), count(lit(1)).as("n"))
        .collect()
      centroids = rows
        .groupBy(_.getInt(0)).toSeq
        .map { case (cell, comps) =>
          val sorted = comps.sortBy(_.getInt(1))
          (cell, sorted.map(_.getDouble(2)).toSeq, sorted.head.getLong(3))
        }
        .sortBy(_._1)
    }

    spark.createDataFrame(centroids.flatMap { case (cell, v, n) =>
      v.zipWithIndex.map { case (x, pos) => (cell, pos, x, n) }
    }).toDF("cell", "pos", "centroid", "n_assigned")
  }

  /** Fitted centroids re-assembled as vectors `(cell, c_v: array<double>)`
    * — the shape [[Similarity.ivfTopKWithCentroids]] consumes. Components
    * sort by `pos` (unique per cell), so assembly is deterministic. */
  def centroidVectors(fitted: DataFrame): DataFrame =
    fitted.groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("centroid")))),
        s => s.getField("centroid")).as("c_v"))
}
