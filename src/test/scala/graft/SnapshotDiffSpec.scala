package graft

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {

  private def snaps() = {
    val s = spark; import s.implicits._
    val old = Seq(
      (1L, "stable document text"),
      (2L, "doc that will change"),
      (3L, "doc that will be removed"),
      (4L, "  Stable  But   Reformatted ")) // cosmetic-only change in new
      .toDF("doc_id", "text")
    val nw = Seq(
      (1L, "stable document text"),
      (2L, "doc that has changed"),
      (4L, "stable but reformatted"),
      (5L, "a brand new document"))
      .toDF("doc_id", "text")
    (old, nw)
  }

  test("diff classifies added/removed/modified/unchanged; normalization absorbs cosmetics") {
    val (old, nw) = snaps()
    val d = SnapshotDiff.diff(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(
      1L -> "unchanged", 2L -> "modified", 3L -> "removed",
      4L -> "unchanged", // whitespace/case only → same fingerprint
      5L -> "added"))
  }

  test("summary counts match the per-doc statuses") {
    val (old, nw) = snaps()
    val m = SnapshotDiff.summary(old, nw, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("unchanged" -> 2L, "modified" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("only fingerprints cross the join — no text column in the join plan") {
    val (old, nw) = snaps()
    val plan = SnapshotDiff.diff(old, nw, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    // the projection below the join must carry md5 fingerprints, not text
    assert(!plan.contains("text#") || plan.indexOf("Join") <
      plan.indexOf("text#"), s"text must be pruned before the join:\n$plan")
  }
}
