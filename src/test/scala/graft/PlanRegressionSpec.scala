package graft

import graft.tools.PlanFingerprint

/** Plan-shape regression net: recompute every declared query's physical-
  * plan fingerprint at sf0.001 and diff against the committed snapshot.
  * A query that GAINS a shuffle Exchange, a SinglePartition exchange, a
  * CartesianProduct, or a broadcast-nested-loop join fails here — in CI,
  * before any benchmark would catch it (the q26 round-3 regression was
  * exactly such a silent extra window+shuffle).
  *
  * After an INTENDED plan change, regenerate with
  * `sbt 'runMain graft.tools.PlanSnapshot'` and commit the diff. */
class PlanRegressionSpec extends SparkSpec {

  test("no declared query gained a shuffle, single-partition exchange, cartesian, or BNLJ") {
    val snapshot = PlanFingerprint.readSnapshot()
    assert(snapshot.nonEmpty,
      s"missing ${PlanFingerprint.snapshotPath} — run `sbt 'runMain graft.tools.PlanSnapshot'`")
    val current = PlanFingerprint.all(spark, "/root/testdata/sf0.001")

    val newQueries = current.keySet -- snapshot.keySet
    assert(newQueries.isEmpty,
      s"queries without a committed fingerprint: ${newQueries.toSeq.sorted.mkString(", ")} — " +
        "regenerate the snapshot (sbt 'runMain graft.tools.PlanSnapshot') and commit it")

    val regressions = current.toSeq.sortBy(_._1).flatMap { case (name, cur) =>
      snapshot.get(name).toSeq.flatMap { old =>
        def gained(what: String, o: Int, c: Int): Option[String] =
          if (c > o) Some(s"$name gained $what: $o -> $c") else None
        gained("shuffle exchange(s)", old.exchanges, cur.exchanges) ++
          gained("SinglePartition exchange(s)", old.singlePartition, cur.singlePartition) ++
          gained("CartesianProduct(s)", old.cartesian, cur.cartesian) ++
          gained("BroadcastNestedLoopJoin(s)", old.bcastNestedLoop, cur.bcastNestedLoop)
      }
    }
    assert(regressions.isEmpty,
      "plan-shape regressions (regenerate the snapshot ONLY if the change is intended):\n  " +
        regressions.mkString("\n  "))

    // improvements are healthy but should be locked in — flag them softly
    val improvements = current.toSeq.sortBy(_._1).flatMap { case (name, cur) =>
      snapshot.get(name).collect {
        case old if cur.exchanges < old.exchanges =>
          s"$name dropped ${old.exchanges - cur.exchanges} exchange(s) — " +
            "regenerate the snapshot to lock the improvement in"
      }
    }
    improvements.foreach(m => info(m))
  }
}
