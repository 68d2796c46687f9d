package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every declared query must carry oracle SQL
  * and vice versa — a drifted map silently downgrades the driver's
  * correctness gate for that query (rows-only instead of hash-exact). */
class DriverContractSpec extends AnyFunSuite {

  test("queries and oracleSql declare the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) === Set.empty[String], s"queries missing an oracle: ${q -- o}")
    assert((o -- q) === Set.empty[String], s"oracles without a query: ${o -- q}")
  }

  test("query names follow the qNN_ naming scheme, uniquely numbered") {
    val names = SparkEntry.queries.keySet
    val scheme = "q\\d{2,3}_[a-z0-9_]+"
    assert(names.forall(_.matches(scheme)), names.filterNot(_.matches(scheme)))
    val nums = names.toSeq.map(_.drop(1).takeWhile(_.isDigit))
    assert(nums.distinct.size === nums.size, "duplicate query numbers")
  }

  test("every oracle is a single statement (no trailing semicolon/comments drift)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.trim.endsWith(";"), s"$name oracle ends with ';'")
      assert(sql.trim.nonEmpty, s"$name oracle empty")
    }
  }
}
