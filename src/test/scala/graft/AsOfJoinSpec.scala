package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("latest right row at-or-before each left row, per key; null before any right") {
    val s = spark; import s.implicits._
    val clicks = Seq(
      (1L, ts(5), "c1"), // after p@3 → 30.0
      (1L, ts(10), "c2"), // after p@10 (equal ts matches, >= semantics) → 100.0
      (1L, ts(2), "c0"), // before any purchase → null
      (2L, ts(7), "c3"), // user 2's only purchase is at 8 → null
      (3L, ts(9), "c4")) // user 3 has no purchases → null
      .toDF("user_id", "ts", "tag")
    val purchases = Seq(
      (1L, ts(3), 30.0),
      (1L, ts(10), 100.0),
      (2L, ts(8), 55.0))
      .toDF("user_id", "ts", "amount")
    val out = AsOfJoin.latestAtOrBefore(clicks, purchases,
        keys = Seq("user_id"), tsCol = "ts", rightVals = Seq("amount"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("asof_amount")).map(_.toDouble)).toMap
    assert(out === Map(
      "c0" -> None, "c1" -> Some(30.0), "c2" -> Some(100.0),
      "c3" -> None, "c4" -> None))
  }

  test("carried value updates as newer right rows appear in the timeline") {
    val s = spark; import s.implicits._
    val left = (1 to 6).map(i => (1L, ts(i * 10), i)).toDF("k", "ts", "n")
    val right = Seq((1L, ts(15), "a"), (1L, ts(35), "b"), (1L, ts(60), "c"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.latestAtOrBefore(left, right, Seq("k"), "ts", Seq("v"))
      .collect().map(r => r.getAs[Int]("n") -> r.getAs[String]("asof_v")).toMap
    assert(out === Map(1 -> null, 2 -> "a", 3 -> "a", 4 -> "b", 5 -> "b", 6 -> "c"))
  }

  test("a NULL in the latest right row is carried as NULL, never a stale value") {
    val s = spark; import s.implicits._
    val left = Seq((1L, ts(20), "after-null"), (1L, ts(40), "after-mixed"))
      .toDF("k", "ts", "tag")
    // latest right at ts=15 has v=null (older row at ts=5 has v=7): the
    // left row at 20 must see null, not 7; and at ts=35 the right row mixes
    // a null u with a non-null v — both must come from the SAME row
    val right = Seq(
      (1L, ts(5), Option(7), Option("x")),
      (1L, ts(15), Option.empty[Int], Option("y")),
      (1L, ts(35), Option(9), Option.empty[String]))
      .toDF("k", "ts", "v", "u")
    val out = AsOfJoin.latestAtOrBefore(left, right, Seq("k"), "ts", Seq("v", "u"))
      .collect().map(r => r.getAs[String]("tag") ->
        ((Option(r.getAs[java.lang.Integer]("asof_v")), Option(r.getAs[String]("asof_u")))))
      .toMap
    assert(out("after-null") === ((None, Some("y"))))
    assert(out("after-mixed") === ((Some(Integer.valueOf(9)), None)))
  }
}
