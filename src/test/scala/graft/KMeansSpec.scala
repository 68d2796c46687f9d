package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

class KMeansSpec extends SparkSpec {

  // ids 1,2 = cluster X (≈ e1); ids 3,4 = cluster Y (≈ e2). The md5 seed
  // order of "1".."4" is fixed forever: md5(4) < md5(1) < md5(2) < md5(3),
  // so nCells=2 seeds are ids 4 (cell 0, cluster Y) and 1 (cell 1, X) —
  // one seed per cluster by construction.
  private def twoClusters() = {
    val s = spark; import s.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.1f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.1f)),
      (4L, Array(0.1f, 0.9f, 0.0f)))
      .toDF("vec_id", "embedding")
  }

  private def centroidMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap

  test("one vector per cell: each centroid is exactly its vector") {
    val s = spark; import s.implicits._
    val two = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val m = centroidMap(KMeans.fit(two, "vec_id", "embedding", nCells = 2, iterations = 1))
    // md5("2") > md5("1") → cell 0 seeds from id 1
    assert(m((0, 0)) === ((1.0, 1L)) && m((0, 1)) === ((2.0, 1L)))
    assert(m((1, 0)) === ((3.0, 1L)) && m((1, 1)) === ((4.0, 1L)))
  }

  test("two clusters separate and centroids converge to cluster means") {
    val m = centroidMap(
      KMeans.fit(twoClusters(), "vec_id", "embedding", nCells = 2, iterations = 3))
    // cell 0 seeded in cluster Y (ids 3,4), cell 1 in cluster X (ids 1,2)
    assert(m((0, 0))._2 === 2L && m((1, 0))._2 === 2L)
    assert(math.abs(m((0, 0))._1 - 0.05) < 1e-6) // mean of 0.0, 0.1
    assert(math.abs(m((0, 1))._1 - 0.95) < 1e-6) // mean of 1.0, 0.9
    assert(math.abs(m((1, 0))._1 - 0.95) < 1e-6)
    assert(math.abs(m((1, 1))._1 - 0.05) < 1e-6)
  }

  test("fit is layout-independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      centroidMap(KMeans.fit(df, "vec_id", "embedding", 2, 2))
    assert(run(twoClusters()) === run(twoClusters().repartition(5)))
  }

  test("a cell that averages to the zero vector is dropped, never NaN-captures") {
    val s = spark; import s.implicits._
    // one cell, two exactly opposite vectors: iteration-1 mean is the zero
    // vector; the guard drops the dead cell instead of letting NaN
    // similarity swallow the corpus on iteration 2
    val opposite = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = KMeans.fit(opposite, "vec_id", "embedding", nCells = 1, iterations = 2)
    assert(out.count() === 0L, "dead cell must vanish, not dominate")
  }

  test("ivfTopKWithCentroids drops zero-norm centroids instead of NaN-ranking them") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.2f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(0.0, 0.0)), (1, Seq(1.0, 0.15)))
      .toDF("cell", "c_v")
    val nn = graft.operators.Similarity.ivfTopKWithCentroids(
        vecs, "vec_id", "embedding", cents, k = 1, nProbe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both vectors must land in the LIVE cell (1) and find each other;
    // the dead cell would have NaN-won every ranking if unguarded
    assert(nn === Map(1L -> 2L, 2L -> 1L))
  }

  test("centroidVectors reassembles components in pos order; trained IVF runs") {
    val fitted = KMeans.fit(twoClusters(), "vec_id", "embedding", 2, 3)
    val vecs = graft.operators.KMeans.centroidVectors(fitted)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(vecs(0).length === 3 && vecs(1).length === 3)
    assert(math.abs(vecs(0)(1) - 0.95) < 1e-6) // cluster-Y mean, dim 1
    // trained-index ANN end-to-end: every vector finds its cluster-mate
    val nn = graft.operators.Similarity.ivfTopKWithCentroids(
        twoClusters(), "vec_id", "embedding",
        graft.operators.KMeans.centroidVectors(fitted), k = 1, nProbe = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nn(1L) === 2L && nn(2L) === 1L) // cluster X mates
    assert(nn(3L) === 4L && nn(4L) === 3L) // cluster Y mates
  }
}
