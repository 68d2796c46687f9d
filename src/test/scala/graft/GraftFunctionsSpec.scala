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
      "SELECT size(minhash_signature(shingle_hashes(split('a b c d', ' '), 2), 16)) AS n")
      .collect().head.getInt(0)
    assert(sig === 16)

    val sim = spark.sql(
      """SELECT simhash64(split('x y z', ' ')) = simhash64(split('z y x', ' ')) AS eq""")
      .collect().head.getBoolean(0)
    assert(sim)

    val st = spark.sql("SELECT token_stats(split('ab cde', ' ')).n_chars AS c")
      .collect().head.getLong(0)
    assert(st === 5L)
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
