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

  test("q30's tuneLsh operating point at the oracle corpus size is (bits=1, tables=2)") {
    val p = Similarity.tuneLsh(500L, simThreshold = 0.6, targetBucketSize = 250)
    assert(p.bits === 1, s"q30 oracle SQL replays bits=1 (range(0, 1)); tuneLsh now derives $p")
    assert(p.tables === 2, s"q30 oracle SQL replays tables=2 (range(0, 2)); tuneLsh now derives $p")
  }

  test("the skew cap always clears the tuned bucket size by 4x") {
    // tuning TO (or past) a fixed cap would let ORDINARY buckets trip the
    // pathological-bucket guard and silently drop recall. q30 therefore
    // derives the cap as max(1000, 4 * expectedBucketSize): at large n the
    // maxTables budget walks bits back and buckets densify past any fixed
    // threshold (n=1M tunes to ~7.8k-row buckets), and the cap must move
    // with them. At the sf0.01 oracle point the derived cap is exactly the
    // SQL's 1000 literal.
    for (n <- Seq(500L, 2000L, 5000L, 20000L, 1000000L)) {
      val p = Similarity.tuneLsh(n, simThreshold = 0.6, targetBucketSize = 250)
      val cap = math.max(1000, (4 * p.expectedBucketSize).toInt)
      assert(cap >= 4 * p.expectedBucketSize,
        s"n=$n: cap $cap must clear expected bucket ${p.expectedBucketSize} 4x over")
    }
    val p001 = Similarity.tuneLsh(500L, simThreshold = 0.6, targetBucketSize = 250)
    assert(math.max(1000, (4 * p001.expectedBucketSize).toInt) === 1000,
      "sf0.01 derived cap must equal the oracle SQL's HAVING count(*) > 1000")
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
