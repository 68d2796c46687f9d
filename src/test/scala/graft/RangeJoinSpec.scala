package graft

import java.sql.Timestamp
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("points land in containing intervals; boundaries inclusive; chunks span correctly") {
    val s = spark; import s.implicits._
    val points = Seq(
      (1L, ts(100), "in-a"), // inside a
      (1L, ts(200), "edge-start-b"), // == b.start (inclusive)
      (1L, ts(350), "edge-end-b"), // == b.end (inclusive)
      (1L, ts(351), "outside"), // just past b.end
      (2L, ts(100), "wrong-key")) // key 2 has no interval
      .toDF("k", "ts", "tag")
    val intervals = Seq(
      (1L, ts(50), ts(150), "a"),
      (1L, ts(200), ts(350), "b")) // spans multiple 60s chunks
      .toDF("k", "start_ts", "end_ts", "name")
    val out = RangeJoin.pointsInIntervals(points, intervals,
        keys = Seq("k"), tsCol = "ts", startCol = "start_ts", endCol = "end_ts",
        chunkSeconds = 60L)
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("name"))
    assert(out.toSet === Set("in-a" -> "a", "edge-start-b" -> "b", "edge-end-b" -> "b"))
  }

  test("a point inside two overlapping intervals matches both") {
    val s = spark; import s.implicits._
    val points = Seq((1L, ts(120), "p")).toDF("k", "ts", "tag")
    val intervals = Seq(
      (1L, ts(100), ts(200), "x"),
      (1L, ts(110), ts(130), "y")).toDF("k", "start_ts", "end_ts", "name")
    val out = RangeJoin.pointsInIntervals(points, intervals,
        Seq("k"), "ts", "start_ts", "end_ts", chunkSeconds = 1000L)
      .collect().map(_.getAs[String]("name")).toSet
    assert(out === Set("x", "y"))
  }

  test("a poison interval spanning too many chunks fails loudly, not OOM") {
    val s = spark; import s.implicits._
    val points = Seq((1L, ts(100), "p")).toDF("k", "ts", "tag")
    // end_ts in year ~9999: ~4×10⁸ chunks of 600s — must fail, not explode
    val intervals = Seq((1L, ts(50), ts(253_370_764_800L), "poison"))
      .toDF("k", "start_ts", "end_ts", "name")
    val e = intercept[Exception] {
      RangeJoin.pointsInIntervals(points, intervals,
        Seq("k"), "ts", "start_ts", "end_ts", chunkSeconds = 600L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("spans more than"))
  }

  test("an inverted interval (end before start) fails loudly") {
    val s = spark; import s.implicits._
    val points = Seq((1L, ts(100), "p")).toDF("k", "ts", "tag")
    val intervals = Seq((1L, ts(200), ts(100), "inverted"))
      .toDF("k", "start_ts", "end_ts", "name")
    val e = intercept[Exception] {
      RangeJoin.pointsInIntervals(points, intervals,
        Seq("k"), "ts", "start_ts", "end_ts", chunkSeconds = 60L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("inverted interval"))
  }

  test("shared non-key column names are rejected up front") {
    val s = spark; import s.implicits._
    val points = Seq((1L, ts(100), "p")).toDF("k", "ts", "name")
    val intervals = Seq((1L, ts(50), ts(150), "x")).toDF("k", "start_ts", "end_ts", "name")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointsInIntervals(points, intervals,
        Seq("k"), "ts", "start_ts", "end_ts")
    }
    assert(e.getMessage.contains("name"))
  }
}
