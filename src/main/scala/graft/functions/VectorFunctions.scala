package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` / `array<double>` embedding
  * columns, built purely from Spark's higher-order functions so everything
  * stays inside Catalyst (no UDF serialization, no Python).
  *
  * Scale note: every function here is per-row (narrow); cost is O(dim) per
  * row and fuses into the surrounding projection. At 100 TB the expensive
  * part of similarity work is the *pairing*, handled in
  * [[graft.operators.Similarity]] — these primitives never shuffle.
  */
object VectorFunctions {

  /** Cast `array<float>` to `array<double>` so downstream arithmetic is
    * double-precision (matches what an external oracle computes). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Σ aᵢ·bᵢ — dot product of two equal-length `array<double>` columns,
    * backed by the codegen'd native expression
    * [[org.apache.spark.sql.graft.DotProduct]] (bit-identical to the
    * higher-order `aggregate(zip_with(...))` fold, far faster). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeFunctions.vec_dot(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Johnson–Lindenstrauss random projection to `k` components (native
    * [[org.apache.spark.sql.graft.RandomProjection]]): md5-derived
    * directions (the LSH weight scheme, SQL-replayable), √(3/k) scaling
    * so norms are preserved in expectation. Narrow, O(k·dim) per row. */
  def randomProject(v: Column, k: Int, seed: String = "rp"): Column =
    org.apache.spark.sql.graft.RandomProjection.random_project(v, k, seed)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** Squared euclidean distance. */
  def l2DistSq(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Deterministic random-hyperplane LSH signature: `nBits` sign bits packed
    * into a long. Hyperplane weights are an md5-derived pseudo-random value
    * in [-1, 1) per (seed, bit, dim) — fully reproducible across runs and
    * executors (no fitted model to broadcast) and rebuildable in plain SQL,
    * so LSH bucketing is oracle-checkable end to end.
    *
    * Rows whose vectors point in similar directions collide with high
    * probability: P[bit match] = 1 - θ/π. Used to bucket candidates for
    * near-neighbour search without a crossJoin (the 100 TB path).
    */
  def hyperplaneSignature(vec: Column, nBits: Int, seed: String): Column =
    org.apache.spark.sql.graft.NativeFunctions.hyperplane_sig(toDouble(vec), nBits, seed)

  /** Margin-aware multiprobe buckets: the exact [[hyperplaneSignature]]
    * bucket plus the `nFlips` single-bit flips of the smallest-|projection|
    * bits — `array<long>`, exact bucket first. Same md5 weight family, so
    * every probe replays in plain SQL. */
  def hyperplaneProbes(vec: Column, nBits: Int, seed: String, nFlips: Int): Column =
    org.apache.spark.sql.graft.NativeFunctions.hyperplane_probes(toDouble(vec), nBits, seed, nFlips)

  /** The higher-order-function formulation of [[hyperplaneSignature]] —
    * kept as the executable specification the native expression is asserted
    * bit-identical to (GraftFunctionsSpec); never on a hot path (nBits × dim
    * interpreted lambda evals per row). Weight derivation mirrors the SQL
    * oracle: first 40 bits of md5("seed:bit:dim") scaled to [-1, 1). */
  private[graft] def hyperplaneSignatureHof(vec: Column, nBits: Int, seed: String): Column = {
    val v = toDouble(vec)
    val bits = transform(sequence(lit(0), lit(nBits - 1)), j => {
      val proj = aggregate(
        transform(v, (x, i) => {
          val digest = md5(concat(lit(seed), lit(":"), j.cast("string"), lit(":"),
            i.cast("string")).cast("binary"))
          val h40 = conv(substring(digest, 1, 10), 16, 10).cast("long")
          x * (pmod(h40, lit(100000L)).cast("double") / lit(50000.0) - lit(1.0))
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    })
    // pack: Σ bitⱼ · 2ʲ  (shiftleft needs a literal shift, so use arithmetic)
    aggregate(zip_with(bits, sequence(lit(0), lit(nBits - 1)),
      (b, j) => b * pow(lit(2.0), j).cast("long")), lit(0L), (acc, x) => acc + x)
  }
}
