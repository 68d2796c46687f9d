package graft

import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, Pq, Similarity}

/** IVF-PQ: structure, determinism, and recall against the exact baseline. */
class PqSpec extends SparkSpec {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def run() = {
    implicit val scope: CacheScope = new CacheScope
    val got = Pq.topKInCells(emb, "vec_id", "embedding",
      k = 3, nCells = 16, nProbe = 4, m = 16, nCodes = 32, iterations = 2)
      .collect()
    scope.release()
    got
  }

  test("shape: k rows per query max, no self matches, ranks contiguous") {
    val rows = run()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.forall(_.getLong(1) != q), s"self match for $q")
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to rs.length))
    }
    // reconstructed cosines stay in a sane band (quantization error only)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.2))
  }

  test("deterministic: two runs produce identical results") {
    val a = run().map(_.toString).sorted
    val b = run().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("recall@3 vs exact cosine clears the measured bound") {
    // nCells = 1: the cell bound is COMPLETE (every pair is a candidate),
    // so recall isolates what PQ itself loses to 8-byte codes — the
    // operating-point recall (cells + PQ stacked) is tracked per round in
    // RECALL_SNAPSHOT instead, where parameter sizing is the real one.
    implicit val scope: CacheScope = new CacheScope
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Pq.topKInCells(emb, "vec_id", "embedding",
        k = 3, nCells = 1, nProbe = 1, m = 16, nCodes = 32, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    scope.release()
    val recall = approx.intersect(exact).size.toDouble / exact.size
    // measured 0.42 on this fixture — RANDOM embeddings are PQ's worst
    // case (distance concentration leaves tiny cosine gaps for the
    // codebook error to swamp); clustered real corpora quantize far
    // better. The net guards collapse of the declared operating point;
    // the stacked cells+PQ recall is tracked per round in RECALL_SNAPSHOT.
    assert(recall >= 0.35, s"PQ quantization-only recall@3 collapsed: $recall")
  }

  test("two-stage refine recovers exact top-3 when the shortlist covers the candidates") {
    // With a complete cell bound (nCells=1) and a shortlist wider than the
    // corpus, stage 1 cannot evict anyone: the exact re-rank must then
    // reproduce the brute-force top-3 EXACTLY (ids, order, and cosine) —
    // the contract that quantization error is confined to shortlist
    // membership.
    implicit val scope: CacheScope = new CacheScope
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .select(col("vec_id"), col("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
      .collect().map(_.toString).sorted
    val refined = Pq.topKRefined(emb, "vec_id", "embedding",
        k = 3, nCells = 1, nProbe = 1, m = 16, nCodes = 32, iterations = 2,
        shortlist = 10000)
      .collect().map(_.toString).sorted
    scope.release()
    assert(refined.toSeq === exact.toSeq)
  }

  test("refine beats the single-stage ranking at the same model and probe width") {
    implicit val scope: CacheScope = new CacheScope
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(pairs: Set[(Long, Long)]) =
      pairs.intersect(exact).size.toDouble / exact.size
    val single = recallOf(Pq.topKInCells(emb, "vec_id", "embedding",
        k = 3, nCells = 16, nProbe = 10, m = 16, nCodes = 32, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val refined = recallOf(Pq.topKRefined(emb, "vec_id", "embedding",
        k = 3, nCells = 16, nProbe = 10, m = 16, nCodes = 32, iterations = 2,
        shortlist = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    scope.release()
    assert(refined >= single,
      s"refine recall $refined must not trail single-stage $single")
    assert(refined >= 0.7,
      s"refined recall@3 at the declared shape collapsed: $refined")
  }
}
