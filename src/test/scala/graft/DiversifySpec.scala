package graft

import org.apache.spark.sql.functions._
import graft.operators.Diversify

/** MMR diversified re-ranking: hand-computed greedy rounds, the λ=1
  * degeneration to plain top-k, short-pool and tie edges. */
class DiversifySpec extends SparkSpec {

  // query 100's pool: two near-identical high-relevance vectors plus an
  // orthogonal lower-relevance one
  private def fixtures() = {
    val s = spark; import s.implicits._
    val cand = Seq(
      (100L, 1L, 0.99), // A
      (100L, 2L, 0.98), // A' ~ duplicate of A
      (100L, 3L, 0.80)) // B orthogonal to both
      .toDF("vec_id", "neighbor_id", "rel")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("id", "v")
    (cand, vecs)
  }

  test("greedy rounds: the near-duplicate is demoted below the diverse candidate") {
    val (cand, vecs) = fixtures()
    val got = Diversify.mmr(cand, vecs, k = 3, lambda = 0.5)
      .orderBy(col("mmr_rank"))
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // round 1: A (best rel). round 2: A' scores .5*.98-.5*~1 ≈ -0.01,
    // B scores .5*.80-.5*0 = 0.40 -> B. round 3: A'.
    assert(got.toSeq === Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("lambda = 1 degenerates to plain relevance top-k") {
    val (cand, vecs) = fixtures()
    val got = Diversify.mmr(cand, vecs, k = 3, lambda = 1.0)
      .orderBy(col("mmr_rank"))
      .collect().map(_.getLong(1))
    assert(got.toSeq === Seq(1L, 2L, 3L))
  }

  test("round-1 score is the relevance; later rounds carry the penalized score") {
    val (cand, vecs) = fixtures()
    val rows = Diversify.mmr(cand, vecs, k = 2, lambda = 0.5)
      .orderBy(col("mmr_rank"))
      .collect()
    assert(rows(0).getDouble(2) === 0.99)
    // round 2 = B with zero penalty (orthogonal): 0.5*0.80 - 0.5*0.0
    assert(math.abs(rows(1).getDouble(2) - 0.40) < 1e-9)
  }

  test("a pool smaller than k returns the whole pool, ranked") {
    val s = spark; import s.implicits._
    val cand = Seq((7L, 1L, 0.9), (7L, 2L, 0.5)).toDF("vec_id", "neighbor_id", "rel")
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("id", "v")
    val got = Diversify.mmr(cand, vecs, k = 5, lambda = 0.7)
      .orderBy(col("mmr_rank")).collect()
    assert(got.length === 2)
    assert(got.map(_.getInt(3)).toSeq === Seq(1, 2))
  }

  test("score ties break toward the smaller neighbor id in every round") {
    val s = spark; import s.implicits._
    // identical rel AND identical vectors: rounds must pick ids ascending
    val cand = Seq((9L, 5L, 0.8), (9L, 3L, 0.8), (9L, 8L, 0.8))
      .toDF("vec_id", "neighbor_id", "rel")
    val vecs = Seq(3L, 5L, 8L).map(id => (id, Array(1.0f, 0.0f)))
      .toDF("id", "v")
    val got = Diversify.mmr(cand, vecs, k = 3, lambda = 0.5)
      .orderBy(col("mmr_rank")).collect().map(_.getLong(1))
    assert(got.toSeq === Seq(3L, 5L, 8L))
  }

  test("per-query independence: one query's duplicates never touch another's pool") {
    val s = spark; import s.implicits._
    val (cand1, vecs1) = fixtures()
    val cand = cand1.unionByName(
      Seq((200L, 11L, 0.9), (200L, 12L, 0.2)).toDF("vec_id", "neighbor_id", "rel"))
    val vecs = vecs1.unionByName(
      Seq((11L, Array(0.0f, 1.0f, 0.0f, 0.0f)), (12L, Array(0.0f, 0.0f, 0.0f, 1.0f)))
        .toDF("id", "v"))
    val got = Diversify.mmr(cand, vecs, k = 2, lambda = 0.5)
    assert(got.filter(col("vec_id") === 200L).count() === 2)
    assert(got.filter(col("vec_id") === 100L).count() === 2)
  }
}
