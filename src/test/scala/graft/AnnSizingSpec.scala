package graft

import graft.operators.Similarity

/** The declared ANN queries (q29/q30) derive their index parameters from
  * the corpus size at runtime; their DuckDB oracles replay the sf0.01
  * operating point. This spec pins the correspondence: if the derivation
  * drifts, it fails HERE with the derived numbers in the message — before
  * the hash gate fails with an opaque mismatch.
  *
  * sf0.01 (and sf0.001) embeddings are 500 rows — TESTDATA.md; a testdata
  * regeneration that changes the count shows up as this spec failing with
  * the new operating point to transcribe into the oracle SQL. */
class AnnSizingSpec extends SparkSpec {

  test("q60/q68's index sizing at the oracle corpus stays 8 cells") {
    // greatest(8, n // 56) over the 450-vector corpus split (90% of 500) —
    // mirrored literally in the q60/q68 oracle SQL seeds CTE
    assert(math.max(8, (450L / 56L).toInt) === 8)
    assert(math.max(8, (4500L / 56L).toInt) === 80) // decade up: index scales
  }

  test("q29's nCells recipe at the oracle corpus size stays 16") {
    // greatest(16, n // 125) — mirrored literally in q29's oracle SQL
    assert(math.max(16, (500L / 125L).toInt) === 16)
    // one decade up, the same recipe scales the index instead of the cells
    assert(math.max(16, (5000L / 125L).toInt) === 40)
    assert(math.max(16, (1000000L / 125L).toInt) === 8000)
  }

  test("q30's sizedMultiprobe operating point at the oracle corpus is (bits=2, tables=4, flips=1)") {
    val p = Similarity.sizedMultiprobe(500L)
    assert(p.bits === 2, s"q30 oracle SQL replays bits=2 (range(0, 2)); sizedMultiprobe now derives $p")
    assert(p.tables === 4, s"q30 oracle SQL replays tables=4 (range(0, 4)); sizedMultiprobe now derives $p")
    assert(p.nFlips === 1, s"q30 oracle SQL replays nFlips=1 (fr <= 1); sizedMultiprobe now derives $p")
  }

  test("q71's wide-probe tier at the oracle corpus is (bits=4, tables=4, flips=3)") {
    val p = Similarity.sizedMultiprobe(500L, targetBucketSize = 62, maxFlips = 3)
    assert(p.bits === 4, s"q71 oracle SQL replays bits=4 (range(0, 4)); sizedMultiprobe now derives $p")
    assert(p.tables === 4, s"q71 oracle SQL replays tables=4 (range(0, 4)); sizedMultiprobe now derives $p")
    assert(p.nFlips === 3, s"q71 oracle SQL replays nFlips=3 (fr <= 3); sizedMultiprobe now derives $p")
  }

  test("sizedMultiprobe holds the probe budget constant as n grows") {
    // the scale argument in one assertion: expected bucket size (candidate
    // rows per probed bucket) and the probe count per query are both
    // bounded as n grows 2000x — total candidate volume stays LINEAR in n,
    // unlike the constant-recall tuneLsh point whose table count grows
    // with bits (measured ×10 slope 1.26). The fixed 1000 skew cap stays
    // 4x over the pinned expected bucket at every n.
    for (n <- Seq(500L, 2000L, 5000L, 20000L, 1000000L, 1000000000L)) {
      val p = Similarity.sizedMultiprobe(n)
      assert(p.expectedBucketSize <= 250.0,
        s"n=$n: expected bucket ${p.expectedBucketSize} must stay <= target 250")
      assert(p.tables * (1 + p.nFlips) <= 12,
        s"n=$n: probe budget ${p.tables * (1 + p.nFlips)} buckets/query must stay fixed")
      assert(p.nFlips < p.bits,
        s"n=$n: nFlips ${p.nFlips} must stay in HyperplaneProbes' domain [0, bits)")
    }
  }

  test("derived parameters hold the candidate-join density roughly constant with n") {
    // the scale argument in one assertion: expected bucket occupancy
    // (candidate rows joined per probe) is bounded as n grows 2000x,
    // which is exactly what the frozen-param forms violated (r5 BENCH_sf1
    // slopes 2.86/3.12)
    val occupancies = Seq(500L, 50000L, 1000000L).map { n =>
      val nCells = math.max(16, (n / 125L).toInt)
      n.toDouble / nCells
    }
    assert(occupancies.forall(_ <= 126.0),
      s"per-cell occupancy must stay ~125 at every scale, got $occupancies")
  }
}
