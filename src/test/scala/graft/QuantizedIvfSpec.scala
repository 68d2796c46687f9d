package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.{CacheScope, IvfIndex, TableStore}

/** Int8 scalar quantization of the persisted IVF index: reconstruction
  * error bound, recall against the full-precision path at the same
  * operating point, and the storage claim measured in actual parquet
  * bytes (the point of quantizing at all). */
class QuantizedIvfSpec extends SparkSpec {

  /** Deterministic 16-dim corpus: enough rows/cells that probes do real
    * work, values spread over magnitudes so scale derivation is exercised. */
  private def corpus(n: Int, offset: Long = 0L) = {
    val s = spark; import s.implicits._
    (0 until n).map { i =>
      val id = offset + i
      val v = Array.tabulate(16) { d =>
        (math.sin(id * 31 + d * 7) * (1.0 + (id % 5)) +
          math.cos(id * 13 + d * 3) * 0.25).toFloat
      }
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  private def buildQuantized(store: TableStore): Unit = {
    implicit val scope: CacheScope = new CacheScope
    IvfIndex.build(corpus(400), "vec_id", "embedding",
      nCells = 8, iterations = 1, store, "emb")
    IvfIndex.quantizeStored(spark, store, "emb")
    scope.release()
  }

  test("per-component reconstruction error is bounded by scale/2, max maps to ±127") {
    val store = new TableStore(tmpDir("qivf"))
    buildQuantized(store)
    val q = IvfIndex.quantizedVectors(spark, store, "emb")
    val v = IvfIndex.vectors(spark, store, "emb")
    val joined = v.join(q.withColumnRenamed("cell", "qcell"), "id")
    // (a) qv stays in [-127, 127]; (b) |qv*scale - v_i| <= scale/2 + eps;
    // (c) the max-|component| slot dequantizes to exactly the max (scale
    //     is derived from it)
    val bad = joined.select(
        exists(col("qv"), b => abs(b.cast("int")) > 127).as("clipped"),
        exists(zip_with(col("v"), col("qv"),
          (x, b) => abs(b.cast("double") * col("scale") - x) > col("scale") / 2 + lit(1e-12)),
          identity).as("over_err"))
      .filter(col("clipped") || col("over_err"))
      .count()
    assert(bad === 0)
    val maxMismatch = joined.select(
        array_max(transform(col("v"), abs(_))).as("vmax"),
        array_max(transform(col("qv"), b => abs(b.cast("int")))).as("qmax"))
      .filter(col("qmax") =!= 127)
      .count()
    assert(maxMismatch === 0, "scale derivation must map the max component to ±127")
  }

  test("quantized top-k recall vs the float path at the same operating point") {
    val store = new TableStore(tmpDir("qivf"))
    buildQuantized(store)
    val batch = corpus(60, offset = 10000L)
    val exact = IvfIndex.topK(spark, batch, "vec_id", "embedding",
      store, "emb", k = 3, nProbe = 2)
      .select(col("vec_id"), col("neighbor_id"))
    val quant = IvfIndex.topKQuantized(spark, batch, "vec_id", "embedding",
      store, "emb", k = 3, nProbe = 2)
      .select(col("vec_id"), col("neighbor_id"))
    val nExact = exact.count()
    val overlap = exact.intersect(quant).count()
    assert(nExact === 60L * 3)
    val recall = overlap.toDouble / nExact
    // quantization-only recall (identical probes): int8 on 16-dim vectors
    // loses almost nothing — hold it to a tight floor so a scheme
    // regression (wrong scale, wrong rounding) fails loudly
    assert(recall >= 0.95, s"quantization recall@3 dropped to $recall")
  }

  test("quantized storage is a fraction of float storage (measured bytes)") {
    val root = tmpDir("qivf")
    val store = new TableStore(root)
    buildQuantized(store)
    def tableBytes(table: String): Long = {
      val dir = java.nio.file.Paths.get(root, table)
      val s = java.nio.file.Files.walk(dir)
      try s.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
        .map(p => java.nio.file.Files.size(p)).sum
      finally s.close()
    }
    val fBytes = tableBytes("emb_vectors")
    val qBytes = tableBytes("emb_qvectors")
    val nVec = IvfIndex.quantizedVectors(spark, store, "emb").count()
    info(f"float ${fBytes / nVec}%d B/vec, int8 ${qBytes / nVec}%d B/vec")
    // 16 doubles = 128 B of payload vs 16 bytes + one double scale; parquet
    // framing overhead means we assert a conservative 45% rather than 1/8
    assert(qBytes.toDouble / fBytes < 0.45,
      s"quantized table $qBytes B not materially smaller than float $fBytes B")
  }

  test("append and remove keep the quantized sibling in sync (serving state)") {
    val store = new TableStore(tmpDir("qivf"))
    buildQuantized(store)
    // append a distinctive new vector; quantized probes must see it
    val s = spark; import s.implicits._
    val fresh = corpus(1, offset = 50000L)
    IvfIndex.append(spark, fresh, "vec_id", "embedding", store, "emb")
    assert(IvfIndex.quantizedVectors(spark, store, "emb")
      .filter(col("id") === 50000L).count() === 1,
      "appended vector missing from the quantized sibling")
    val probe = IvfIndex.topKQuantized(spark, fresh.withColumn("vec_id", lit(99999L)),
      "vec_id", "embedding", store, "emb", k = 1, nProbe = 2)
    assert(probe.head().getAs[Long]("neighbor_id") === 50000L,
      "an identical query must find the appended vector through the quantized path")
    // takedown must reach the quantized sibling too
    val removed = IvfIndex.remove(spark, Seq(50000L).toDF("id"), store, "emb")
    assert(removed === 1)
    assert(IvfIndex.quantizedVectors(spark, store, "emb")
      .filter(col("id") === 50000L).count() === 0,
      "removed vector still present in the quantized sibling")
  }

  test("topKRefined with an exhaustive shortlist equals the float path exactly") {
    val store = new TableStore(tmpDir("qivf"))
    buildQuantized(store)
    val batch = corpus(60, offset = 10000L)
    // shortlist >= corpus: every probed candidate reaches the exact
    // re-rank, so the two-stage answer must equal the float path
    // row-for-row (same scores, same ranks) — the refine stage's
    // correctness contract, independent of quantization quality
    val refined = IvfIndex.topKRefined(spark, batch, "vec_id", "embedding",
      store, "emb", k = 3, nProbe = 2, shortlist = 400)
      .select(col("vec_id"), col("neighbor_id"), round(col("cosine"), 9).as("c"), col("rank"))
    val float = IvfIndex.topK(spark, batch, "vec_id", "embedding",
      store, "emb", k = 3, nProbe = 2)
      .select(col("vec_id"), col("neighbor_id"), round(col("cosine"), 9).as("c"), col("rank"))
    assert(refined.exceptAll(float).count() === 0)
    assert(float.exceptAll(refined).count() === 0)
  }

  test("topKRefined recall is never below the all-quantized path at the same probe width") {
    val store = new TableStore(tmpDir("qivf"))
    buildQuantized(store)
    val batch = corpus(60, offset = 10000L)
    val exact = IvfIndex.topK(spark, batch, "vec_id", "embedding",
      store, "emb", k = 3, nProbe = 3).select(col("vec_id"), col("neighbor_id"))
    val quant = IvfIndex.topKQuantized(spark, batch, "vec_id", "embedding",
      store, "emb", k = 3, nProbe = 3).select(col("vec_id"), col("neighbor_id"))
    val refined = IvfIndex.topKRefined(spark, batch, "vec_id", "embedding",
      store, "emb", k = 3, nProbe = 3, shortlist = 32)
      .select(col("vec_id"), col("neighbor_id"))
    val n = exact.count()
    val qHit = quant.intersect(exact).count()
    val rHit = refined.intersect(exact).count()
    info(f"vs float path: quantized ${qHit.toDouble / n}%.4f refined ${rHit.toDouble / n}%.4f")
    assert(rHit >= qHit,
      s"refine must absorb quantization error, got refined $rHit < quantized $qHit of $n")
    // and the shortlist-32 refine should essentially pin the float answer
    assert(rHit.toDouble / n >= 0.95)
  }

  test("dequantized norms are never zero for nonzero vectors (cosine stays defined)") {
    val store = new TableStore(tmpDir("qivf"))
    buildQuantized(store)
    val zeroNorm = IvfIndex.quantizedVectors(spark, store, "emb")
      .select(VectorFunctions.l2Norm(
        transform(col("qv"), b => b.cast("double") * col("scale"))).as("nrm"))
      .filter(col("nrm") <= 0).count()
    assert(zeroNorm === 0)
  }
}
