package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Dedup

/** The DISTRIBUTED connected-components branch of
  * [[Dedup.duplicateClusters]] — the label-propagation loop that only runs
  * above `driverUnionFindThreshold` (the code path a 100 TB corpus
  * exercises). Pinned here with threshold = 0 so every assertion runs the
  * distributed code, cross-checked against the driver union-find. */
class DupClustersDistributedSpec extends SparkSpec {

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame = {
    val s = spark; import s.implicits._
    pairs.toDF("a_id", "b_id")
  }

  private def clusters(
      pairs: Seq[(Long, Long)],
      threshold: Long,
      maxIterations: Int = 20): Map[Long, Long] =
    Dedup.duplicateClusters(pairsDf(pairs), maxIterations, threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // 3 components: a triangle {1,2,3}, an isolated pair {10,11}, and an
  // 8-node chain 20–27 (worst-case diameter for min-label propagation).
  private val graph = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (10L, 11L),
    (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L),
    (24L, 25L), (25L, 26L), (26L, 27L))

  private val expected: Map[Long, Long] =
    (Seq(1L, 2L, 3L).map(_ -> 1L) ++ Seq(10L, 11L).map(_ -> 10L) ++
      (20L to 27L).map(_ -> 20L)).toMap

  test("distributed label propagation labels all components by min id") {
    assert(clusters(graph, threshold = 0) === expected)
  }

  test("distributed path agrees with the driver union-find on the same graph") {
    assert(clusters(graph, threshold = 0) === clusters(graph, threshold = 1000000))
  }

  test("chain converges within diameter+1 rounds") {
    // the min label travels one hop per round: a chain of diameter 7 needs
    // 7 propagation rounds (+1 round to observe no change) — 8 suffices
    assert(clusters(graph, threshold = 0, maxIterations = 8) === expected)
  }

  test("too few rounds leaves a long chain only partially labelled") {
    // documents the O(diameter) bound: after 3 rounds the chain's far end
    // cannot yet carry label 20 (it is > 3 hops from node 20)
    val got = clusters((20L to 27L).sliding(2).map(s => (s(0), s(1))).toSeq,
      threshold = 0, maxIterations = 3)
    assert(got(27L) !== 20L)
    assert(got(21L) === 20L) // near end already converged
  }

  test("distributed path handles duplicate and reversed edges") {
    val noisy = graph ++ Seq((2L, 1L), (3L, 1L), (11L, 10L), (21L, 20L))
    assert(clusters(noisy, threshold = 0) === expected)
  }
}
