package graft

import org.apache.spark.sql.graft.GraftFunctions

/** SQL surface of the native expressions. */
class GraftFunctionsSpec extends SparkSpec {

  test("native functions are callable from spark.sql after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql("SELECT vec_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d")
      .collect().head.getDouble(0)
    assert(dot === 32.0)

    val sh = spark.sql(
      "SELECT size(shingle_hashes(split('a b c d', ' '), 2)) AS n")
      .collect().head.getInt(0)
    assert(sh === 3)

    val sig = spark.sql(
      "SELECT size(minhash_signature(split('a b c d', ' '), 2, 16)) AS n")
      .collect().head.getInt(0)
    assert(sig === 16)

    val sim = spark.sql(
      """SELECT simhash64(split('x y z', ' ')) = simhash64(split('z y x', ' ')) AS eq""")
      .collect().head.getBoolean(0)
    assert(sim)

    val st = spark.sql("SELECT token_stats(split('ab cde', ' ')).n_chars AS c")
      .collect().head.getLong(0)
    assert(st === 5L)

    val hp = spark.sql(
      "SELECT hyperplane_sig(array(1d, 2d), 5, 'test:0') AS s")
      .collect().head.getLong(0)
    assert(hp >= 0L && hp < 32L) // 5 bits packed

    val agree = spark.sql(
      "SELECT sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS n")
      .collect().head.getInt(0)
    assert(agree === 2)
  }

  test("native hyperplane signature is bit-identical to the higher-order formulation") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = emb.select(
      VectorFunctions.hyperplaneSignature(col("embedding"), 12, "lsh:0").as("nat"),
      VectorFunctions.hyperplaneSignatureHof(col("embedding"), 12, "lsh:0").as("hof"))
    assert(both.filter(col("nat") =!= col("hof")).count() === 0)
    // and a second (bits, seed) point to catch packing/seed-chain slips
    val both2 = emb.select(
      VectorFunctions.hyperplaneSignature(col("embedding"), 5, "ndp:3").as("nat"),
      VectorFunctions.hyperplaneSignatureHof(col("embedding"), 5, "ndp:3").as("hof"))
    assert(both2.filter(col("nat") =!= col("hof")).count() === 0)
  }

  test("non-literal shingle size is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(split('a b', ' '), 1 + 1)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }
}
