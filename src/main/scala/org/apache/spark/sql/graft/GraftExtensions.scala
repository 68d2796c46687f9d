package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL registration for graft's native expressions, so `spark.sql` users
  * get them too:
  *
  *  - `vec_dot(a, b)`            — [[DotProduct]]
  *  - `shingle_hashes(toks, n)`  — [[ShingleHashes]] (n: int literal)
  *  - `minhash_signature(toks, n, k)` — [[MinHashSignature]] (int literals)
  *  - `simhash64(toks)`          — [[SimHash64]]
  *  - `token_stats(toks)`        — [[TokenStats]]
  *  - `hyperplane_sig(v, nBits, seed)` — [[HyperplaneSignature]]
  *    (int literal, string literal)
  *  - `sig_agreement(a, b)`      — [[LongPositionsEqual]]
  *  - `nfc_normalize(s)`         — [[NfcNormalize]]
  *  - `winnowed_fingerprints(toks, k, w)` — [[WinnowedFingerprints]]
  *    (int literals)
  *  - `random_project(v, k, seed)` — [[RandomProjection]]
  *    (int literal, string literal)
  *
  * Two entry points: [[GraftFunctions.register]] on a live session, or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` at
  * session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def stringLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => DotProduct(es(0), es(1))),
    "shingle_hashes" -> (es => ShingleHashes(es(0), intLit(es(1), "shingle size n"))),
    "minhash_signature" -> (es => MinHashSignature(es(0),
      intLit(es(1), "shingle size n"), intLit(es(2), "numHashes"))),
    "simhash64" -> (es => SimHash64(es(0))),
    "token_stats" -> (es => TokenStats(es(0))),
    "hyperplane_sig" -> (es => HyperplaneSignature(es(0),
      intLit(es(1), "nBits"), stringLit(es(2), "seed"))),
    "hyperplane_probes" -> (es => HyperplaneProbes(es(0),
      intLit(es(1), "nBits"), stringLit(es(2), "seed"), intLit(es(3), "nFlips"))),
    "sig_agreement" -> (es => LongPositionsEqual(es(0), es(1))),
    "nfc_normalize" -> (es => NfcNormalize(es(0))),
    "winnowed_fingerprints" -> (es => WinnowedFingerprints(es(0),
      intLit(es(1), "shingle size k"), intLit(es(2), "window w"))),
    "random_project" -> (es => RandomProjection(es(0),
      intLit(es(1), "k"), stringLit(es(2), "seed"))))

  /** Register all native functions on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
