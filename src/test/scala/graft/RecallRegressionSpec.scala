package graft

import graft.tools.Recall

/** Quality regression net for the ANN family: recompute recall@3 of every
  * tracked approximate query against the exact baseline at sf0.01 and diff
  * against the committed snapshot. A parameter-sizing or scheme change that
  * drops any query's recall by more than the tolerance fails here — the
  * exact failure mode plan fingerprints cannot see.
  *
  * After an INTENDED quality trade, regenerate with
  * `sbt 'runMain graft.tools.RecallSnapshot'` and commit the diff. */
class RecallRegressionSpec extends SparkSpec {

  private val tolerance = 0.02

  test("no ANN query's recall@k dropped vs the committed snapshot") {
    val snapshot = Recall.readSnapshot()
    assert(snapshot.nonEmpty,
      s"missing ${Recall.snapshotPath} — run `sbt 'runMain graft.tools.RecallSnapshot'`")
    val current = Recall.all(spark, "/root/testdata/sf0.01")

    val untracked = current.keySet -- snapshot.keySet
    assert(untracked.isEmpty,
      s"ANN queries without a committed recall: ${untracked.toSeq.sorted.mkString(", ")} — " +
        "regenerate the snapshot (sbt 'runMain graft.tools.RecallSnapshot') and commit it")

    val regressions = current.toSeq.sortBy(_._1).flatMap { case (name, cur) =>
      snapshot.get(name).collect {
        case old if cur < old - tolerance =>
          f"$name recall@${Recall.kOf(name)} dropped $old%.4f -> $cur%.4f"
      }
    }
    assert(regressions.isEmpty,
      "recall regressions (regenerate the snapshot ONLY if the trade is intended):\n  " +
        regressions.mkString("\n  "))

    current.toSeq.sortBy(_._1).foreach { case (name, cur) =>
      snapshot.get(name).foreach { old =>
        if (cur > old + tolerance)
          info(f"$name recall improved $old%.4f -> $cur%.4f — regenerate to lock in")
      }
    }
  }
}
