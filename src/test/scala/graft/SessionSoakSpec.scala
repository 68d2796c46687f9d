package graft

import graft.operators.CacheScope

/** Long-session cache hygiene: one SparkSession runs the ENTIRE declared
  * query surface twice, releasing the app-lifetime CacheScope between
  * runs, and scope-managed storage must drain back to baseline each time
  * — the leak mode this guards against is a long-lived service session
  * whose block manager fills with operator pins that nothing releases.
  *
  * Checkpoint-style blocks (lineage cuts materialized outside any scope,
  * e.g. a connected-components generation loop) are excluded from the
  * drain assertion: their lifecycle is eager unpersist inside the
  * operator plus GC for the final generation, not scope release. */
class SessionSoakSpec extends SparkSpec {

  private def scopedPersistentRdds =
    spark.sparkContext.getPersistentRDDs.values
      .filter(r => !r.isCheckpointed)

  test("two full passes over every declared query, storage drains per run") {
    val dir = "/root/testdata/sf0.001"
    val baseline = scopedPersistentRdds.map(_.id).toSet
    for (run <- 1 to 2) {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        // consume fully; row counts are the oracle gate's business, not
        // this spec's (some queries are legitimately empty at sf0.001)
        try fn(spark, dir).count()
        catch { case e: Throwable => fail(s"$name failed on run $run: $e") }
      }
      CacheScope.appLifetime.release()
      val leaked = scopedPersistentRdds.map(_.id).toSet -- baseline
      assert(leaked.isEmpty,
        s"run $run left ${leaked.size} scope-managed cached RDDs: $leaked")
      assert(CacheScope.appLifetime.pinnedCount === 0,
        s"run $run left pins tracked after release")
    }
  }
}
