package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("kmv is exact below k and close above it") {
    val s = spark; import s.implicits._
    // group "small": 40 distinct (< k=64) → exact; "big": 1000 distinct
    val df = ((1L to 40L).map(i => ("small", i)) ++
      (1L to 1000L).map(i => ("big", i + 100L))).toDF("g", "v")
    val out = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out("small") === ((40, 40.0)), "under-k groups count exactly")
    val (nBig, estBig) = out("big")
    assert(nBig === 64)
    assert(estBig > 700 && estBig < 1300,
      s"KMV(64) of 1000 distinct should land within ~30%, got $estBig")
  }

  test("kmv ignores duplicates and input layout") {
    val s = spark; import s.implicits._
    val base = (1L to 500L).map(i => ("g", i)).toDF("g", "v")
    val dup = base.union(base).union(base).repartition(13)
    val a = Sketches.kmvDistinct(base, Seq("g"), "v", 64).collect().head
    val b = Sketches.kmvDistinct(dup, Seq("g"), "v", 64).collect().head
    assert(a.getDouble(2) === b.getDouble(2),
      "the sketch is a set sketch: multiplicity and partitioning are invisible")
  }

  test("kmv sketches merge: k smallest of a union = k smallest of parts' survivors") {
    val s = spark; import s.implicits._
    // the mergeability the partial aggregate relies on, stated as data:
    // sketching the union equals sketching (left's k survivors ∪ right's
    // k survivors) — no information outside the parts' sketches is needed
    val left = (1L to 300L).map(i => ("g", i)).toDF("g", "v")
    val right = (301L to 700L).map(i => ("g", i)).toDF("g", "v")
    val whole = Sketches.kmvDistinct(left.union(right), Seq("g"), "v", 32)
      .collect().head.getDouble(2)
    val hv = conv(substring(md5(concat(lit("kmv:"),
      col("v").cast("string")).cast("binary")), 1, 10), 16, 10).cast("long")
    def survivors(df: org.apache.spark.sql.DataFrame) =
      df.select(hv.as("h")).distinct().orderBy(col("h")).limit(32)
    // merge by hand: k smallest of the concatenated survivor sets, then
    // the same estimator arithmetic the operator applies
    val handMerged = survivors(left).union(survivors(right)).distinct()
      .orderBy(col("h")).limit(32).collect().map(_.getLong(0))
    val kth = handMerged.last
    val est = math.rint(31.0 * 1099511627776.0 / math.max(kth, 1L) * 10000) / 10000
    assert(est === whole, "union sketch must be reconstructible from part sketches")
  }

  test("kmv excludes NULL values, matching count(DISTINCT x)") {
    val s = spark; import s.implicits._
    val df = (Seq(("g", Some(1L)), ("g", Some(2L)), ("g", None), ("g", None)))
      .toDF("g", "v")
    val out = Sketches.kmvDistinct(df, Seq("g"), "v", 16).collect().head
    assert(out.getInt(1) === 2 && out.getDouble(2) === 2.0,
      "NULLs carry no identity and must not count")
  }

  test("kmv plan: ONE aggregate exchange — sub-distinct, no window, no sort") {
    val s = spark; import s.implicits._
    val df = (1L to 100L).map(i => ("g", i)).toDF("g", "v")
    val plan = Sketches.kmvDistinct(df, Seq("g"), "v", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sketch must not rank per group:\n$plan")
    assert(plan.split("Exchange").length - 1 === 1,
      s"dedup happens inside the partial top-k buffer — exactly one exchange:\n$plan")
  }

  test("quantile buckets: exact NTILE-by-value under b, deterministic always") {
    val s = spark; import s.implicits._
    val df = (1L to 1000L).map(i => (i, (i * 37 % 1000).toDouble)).toDF("id", "v")
    val out = Sketches.quantileBuckets(df, "id", "v", nBuckets = 10, b = 4096)
      .collect().map(r => (r.getDouble(1), r.getInt(2)))
    // values are a permutation of multiples of gcd(37,1000)=1 mod 1000 →
    // 1000 distinct values; an exact sample splits them into 10 bands of
    // exactly 100, and every value's bucket tracks its sorted position
    val sortedVals = out.map(_._1).sorted
    for ((v, bkt) <- out) {
      val pos = sortedVals.indexWhere(_ == v) // first index of this value
      assert(bkt === pos / 100 + 1,
        s"value $v at sorted position $pos must land in bucket ${pos / 100 + 1}")
    }
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert((1 to 10).forall(b => sizes(b) == 100),
      s"exact sample must split 1000 distinct values into 10x100, got $sizes")
    // ties at a boundary fall into the LOWER bucket
    val tied = Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 2.0)).toDF("id", "v")
    val tb = Sketches.quantileBuckets(tied, "id", "v", 2, b = 16)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(tb(1L) === 1 && tb(2L) === 1 && tb(3L) === 2 && tb(4L) === 2)
  }

  test("quantile buckets avoid the global sort: no single-partition window") {
    val s = spark; import s.implicits._
    val df = (1L to 500L).map(i => (i, i.toDouble)).toDF("id", "v")
    val plan = Sketches.quantileBuckets(df, "id", "v", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"NTILE's window must not appear:\n$plan")
    val assignSide = plan.split("BroadcastExchange").head
    assert(!assignSide.contains("Exchange"),
      s"assignment pass must be narrow (boundaries broadcast):\n$plan")
  }

  test("cms never underestimates and stays within the epsilon-N band") {
    val s = spark; import s.implicits._
    // 2000 values over a 50-term vocabulary, zipf-ish
    val vals = (1 to 2000).map(i => ("g", s"term${i % 50 / (1 + i % 3)}"))
    val df = vals.toDF("g", "v")
    val truth = vals.groupBy(_._2).view.mapValues(_.size).toMap
    val qs = truth.keys.take(10).toSeq
    val out = Sketches.cmsCounts(df, Seq("g"), "v", qs, depth = 4, width = 256)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val n = vals.size
    for (q <- qs) {
      assert(out(q) >= truth(q), s"$q: CMS must never underestimate")
      assert(out(q) <= truth(q) + 5L * n / 256,
        s"$q: estimate ${out(q)} too far above ${truth(q)}")
    }
  }

  test("cms is deterministic under repartitioning (mergeable cells)") {
    val s = spark; import s.implicits._
    val vals = (1 to 1000).map(i => (s"g${i % 2}", s"w${i % 37}"))
    val a = Sketches.cmsCounts(vals.toDF("g", "v"), Seq("g"), "v",
      Seq("w1", "w2", "w36"), 4, 128).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    val b = Sketches.cmsCounts(
      scala.util.Random.shuffle(vals).toDF("g", "v").repartition(13),
      Seq("g"), "v", Seq("w1", "w2", "w36"), 4, 128).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(a.toSeq === b.toSeq, "cells are sums — layout must be invisible")
  }

  test("cms plan: one cells aggregate exchange; corpus never joins the vocabulary") {
    val s = spark; import s.implicits._
    val df = (1 to 500).map(i => ("g", s"w${i % 20}")).toDF("g", "v")
    val plan = Sketches.cmsCounts(df, Seq("g"), "v", Seq("w1"), 4, 128)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no windows:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"), s"no cross product:\n$plan")
  }

  test("quantile sketch is exact below b: level 0 and true order statistics") {
    val s = spark; import s.implicits._
    val df = (1L to 100L).map(i => ("g", i, i.toDouble)).toDF("g", "id", "v")
    val out = Sketches.quantileSketch(df, Seq("g"), "id", "v",
      qs = Seq(0.5, 0.9, 0.99), b = 256).collect().head
    assert(out.getInt(1) === 0, "under-b group must stay at level 0")
    assert(out.getInt(2) === 100)
    // ceil(q*m) of 1..100: p50=50, p90=90, p99=99
    assert(out.getDouble(3) === 50.0)
    assert(out.getDouble(4) === 90.0)
    assert(out.getDouble(5) === 99.0)
  }

  test("quantile sketch is canonical: partitioning and row order are invisible") {
    val s = spark; import s.implicits._
    val rows = (1L to 5000L).map(i => ("g", i, (i % 997).toDouble))
    val a = Sketches.quantileSketch(rows.toDF("g", "id", "v"),
      Seq("g"), "id", "v", Seq(0.5, 0.9), b = 128).collect().head
    val b = Sketches.quantileSketch(
      scala.util.Random.shuffle(rows).toDF("g", "id", "v").repartition(17),
      Seq("g"), "id", "v", Seq(0.5, 0.9), b = 128).collect().head
    assert(a.toSeq === b.toSeq,
      "the sketch state is a pure function of the input set")
  }

  test("quantile sketch level matches the canonical minimal-L formula") {
    val s = spark; import s.implicits._
    val rows = (1L to 3000L).map(i => ("g", i, i.toDouble))
    val out = Sketches.quantileSketch(rows.toDF("g", "id", "v"),
      Seq("g"), "id", "v", Seq(0.5), b = 128).collect().head
    // recompute: minimal L such that |{i: hv(i) mod 2^L == 0}| <= 128
    val hv = conv(substring(md5(concat(lit("kll:"),
      col("id").cast("string")).cast("binary")), 1, 10), 16, 10).cast("long")
    val hvs = rows.toDF("g", "id", "v").select(hv).collect().map(_.getLong(0))
    val lev = Iterator.from(0)
      .find(l => hvs.count(h => (h & ((1L << l) - 1)) == 0L) <= 128).get
    assert(out.getInt(1) === lev, "buffer escalation must converge to minimal L")
    assert(out.getInt(2) === hvs.count(h => (h & ((1L << lev) - 1)) == 0L),
      "retained sample must be exactly the survivors at that level")
  }

  test("quantile sketch estimates within the sampling band and preserves multiplicity") {
    val s = spark; import s.implicits._
    // heavily skewed multiset: value 1.0 for 90% of rows, 100.0 for 10%
    val rows = (1L to 10000L).map(i => ("g", i, if (i % 10 == 0) 100.0 else 1.0))
    val out = Sketches.quantileSketch(rows.toDF("g", "id", "v"),
      Seq("g"), "id", "v", Seq(0.5, 0.99), b = 256).collect().head
    assert(out.getDouble(3) === 1.0, "median of the 90/10 multiset is the heavy value")
    assert(out.getDouble(4) === 100.0, "p99 must surface the tail value")
  }

  test("quantile sketch excludes NULL ids and values") {
    val s = spark; import s.implicits._
    val df = Seq(("g", Some(1L), Some(10.0)), ("g", Some(2L), Some(20.0)),
      ("g", None, Some(99.0)), ("g", Some(4L), None)).toDF("g", "id", "v")
    val out = Sketches.quantileSketch(df, Seq("g"), "id", "v", Seq(0.5), 16)
      .collect().head
    assert(out.getInt(2) === 2)
    assert(out.getDouble(3) === 10.0) // ceil(0.5*2)=1 -> first of (10,20)
  }

  test("quantile sketch plan: one aggregate exchange, no window, no global sort") {
    val s = spark; import s.implicits._
    val df = (1L to 100L).map(i => ("g", i, i.toDouble)).toDF("g", "id", "v")
    val plan = Sketches.quantileSketch(df, Seq("g"), "id", "v", Seq(0.5), 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no per-group ranking of the corpus:\n$plan")
    assert(plan.split("Exchange").length - 1 === 1,
      s"sketch = exactly one exchange:\n$plan")
  }

  test("quantile buckets file NULL values under bucket NULL, not bucket 1") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(3.0)),
      (4L, Some(4.0)), (5L, None), (6L, None)).toDF("id", "v")
    val out = Sketches.quantileBuckets(df, "id", "v", nBuckets = 2, b = 16)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(out(5L) === None && out(6L) === None,
      "a NULL value has no rank — its bucket must be NULL, not silently 1")
    // non-NULL rows split exactly as if the NULLs were absent
    assert(out(1L) === Some(1) && out(2L) === Some(1) &&
      out(3L) === Some(2) && out(4L) === Some(2),
      "NULL rows must not shift the boundaries or the real buckets")
  }

  test("quantile buckets file NaN values under bucket NULL, not the top bucket") {
    val s = spark; import s.implicits._
    // NaN is excluded from boundary estimation (LevelSample skips it)
    // but Spark orders it above every double, so without the guard it
    // would silently land in the TOP bucket — the mirror image of the
    // NULL-to-bucket-1 defect
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0),
      (5L, Double.NaN)).toDF("id", "v")
    val out = Sketches.quantileBuckets(df, "id", "v", nBuckets = 2, b = 16)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(out(5L) === None, "a NaN value has no rank — bucket NULL")
    assert(out(1L) === Some(1) && out(2L) === Some(1) &&
      out(3L) === Some(2) && out(4L) === Some(2),
      "NaN rows must not shift the boundaries or the real buckets")
  }

  test("heavy hitters: exact thresholded output on skewed data, truncation exercised") {
    val s = spark; import s.implicits._
    // zipf-ish: value i appears ceil(1000/i) times, i = 1..100 — far more
    // distinct values than the k=40 summary, so MG truncation runs
    val rows = (1 to 100).flatMap(i =>
      Seq.fill(math.ceil(1000.0 / i).toInt)(("g", s"v$i")))
    val n = rows.size
    val truth = rows.groupBy(_._2).view.mapValues(_.size).toMap
    val expected = truth.filter { case (_, c) => c * 10000 >= 500L * n }
    assert(expected.size >= 2 && expected.size <= 5,
      s"fixture sanity: a few hitters at 5%, got ${expected.size}")
    val out = Sketches.heavyHitters(
        scala.util.Random.shuffle(rows).toDF("g", "v").repartition(13),
        Seq("g"), "v", minFrac = 0.05)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === expected.toMap,
      "output must be the EXACT set of 5% hitters with exact counts")
  }

  test("heavy hitters are deterministic under any partitioning") {
    val s = spark; import s.implicits._
    val rows = (1 to 60).flatMap(i =>
      Seq.fill(1 + 600 / i)((s"g${i % 2}", s"w$i")))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.heavyHitters(df, Seq("g"), "v", 0.04)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).sorted.toSeq
    val a = run(rows.toDF("g", "v").repartition(1))
    val b = run(scala.util.Random.shuffle(rows).toDF("g", "v").repartition(29))
    assert(a === b && a.nonEmpty,
      "the verified answer is canonical even though the summary content is not")
  }

  test("misra-gries summary: lower bounds, coverage guarantee, bounded size") {
    val s = spark; import s.implicits._
    val rows = (1 to 80).flatMap(i => Seq.fill(1 + 800 / i)(("g", s"t$i")))
    val n = rows.size
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val k = 12
    // any merge tree (here: whatever 17 partitions' scheduler order gives)
    val mg = scala.util.Random.shuffle(rows).toDF("g", "v").repartition(17)
      .groupBy(col("g"))
      .agg(org.apache.spark.sql.graft.MisraGries
        .misra_gries(col("v"), k).as("mg"))
      .select(col("mg.n"), col("mg.items"), col("mg.counts"))
      .collect().head
    assert(mg.getLong(0) === n.toLong)
    val items = mg.getSeq[String](1)
    val counts = mg.getSeq[Long](2)
    assert(items.size <= k, "summary never exceeds k counters")
    items.zip(counts).foreach { case (item, c) =>
      assert(c <= truth(item), s"$item: stored $c must lower-bound ${truth(item)}")
      assert(truth(item) - c <= n.toLong / (k + 1),
        s"$item: error ${truth(item) - c} exceeds n/(k+1) = ${n / (k + 1)}")
    }
    truth.filter(_._2 > n.toLong / (k + 1)).keys.foreach { heavy =>
      assert(items.contains(heavy),
        s"$heavy is above the n/(k+1) guarantee line and must survive")
    }
  }

  test("misra-gries decrements by ONE: the n/(k+1) bound survives minimum-sized k") {
    val s = spark; import s.implicits._
    // the decrement-by-min counterexample (review finding): k=3 over
    // a,a,a,a,b,b,b,b,c,c,c,c,d — subtracting the min (4) at d would
    // empty the whole summary although a/b/c all clear n/(k+1) = 3.25;
    // classic decrement-by-1 must keep all three with counts >= 4 - 3
    val rows = Seq.fill(4)("a") ++ Seq.fill(4)("b") ++ Seq.fill(4)("c") :+ "d"
    // one partition, d LAST: the order that makes decrement-by-min wipe
    // the summary (any reorder only helps it pass)
    val mg = s.sparkContext.parallelize(rows.map(("g", _)), 1).toDF("g", "v")
      .groupBy(col("g"))
      .agg(org.apache.spark.sql.graft.MisraGries
        .misra_gries(col("v"), 3).as("mg"))
      .select(col("mg.items"), col("mg.counts")).collect().head
    val kept = mg.getSeq[String](0).zip(mg.getSeq[Long](1)).toMap
    for (h <- Seq("a", "b", "c")) {
      assert(kept.contains(h), s"$h clears n/(k+1) and must survive, got $kept")
      assert(kept(h) >= 1, s"$h: count ${kept.get(h)} below the 4 - 13/4 bound")
    }
    // and the exact verify pass turns that into the exact thresholded set
    val out = Sketches.heavyHitters(rows.map(("g", _)).toDF("g", "v"),
        Seq("g"), "v", minFrac = 0.3, k = 3)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("a" -> 4L, "b" -> 4L, "c" -> 4L),
      "minimum-sized summary (k+1 > 1/minFrac) must still be a certain superset")
  }

  test("heavy hitters plan: no vocabulary-wide shuffle on the verify side") {
    val s = spark; import s.implicits._
    val df = (1 to 500).map(i => ("g", s"w${i % 40}")).toDF("g", "v")
    val plan = Sketches.heavyHitters(df, Seq("g"), "v", 0.05)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), s"no cross product:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"candidates must broadcast into the verify filter:\n$plan")
    assert(!plan.contains("Window"), s"no ranking windows:\n$plan")
  }

  test("top_k_pairs_distinct buffer skips duplicates at every position") {
    import org.apache.spark.sql.graft.TopKBuffer
    val buf = new TopKBuffer(4, dedup = true)
    // fill, then replay every element (head, middle, tail) — size stable
    Seq((5.0, 1L), (4.0, 2L), (3.0, 3L), (2.0, 4L)).foreach { case (sc, id) => buf.add(sc, id) }
    assert(buf.size === 4)
    Seq((5.0, 1L), (3.0, 3L), (2.0, 4L)).foreach { case (sc, id) => buf.add(sc, id) }
    assert(buf.size === 4)
    assert(buf.ids.toSeq === Seq(1L, 2L, 3L, 4L))
    // a better non-duplicate still displaces the tail
    buf.add(6.0, 9L)
    assert(buf.ids.take(4).toSeq === Seq(9L, 1L, 2L, 3L))
    // same score, different id: NOT a duplicate — id-asc tie order
    buf.add(6.0, 8L)
    assert(buf.ids.take(4).toSeq === Seq(8L, 9L, 1L, 2L))
    // re-adding the current tail's exact pair is still a no-op
    val before = buf.ids.take(4).toSeq
    buf.add(4.0, 2L)
    assert(buf.ids.take(4).toSeq === before)
  }
  test("kmvOverlap exact arm: sub-k groups give exact jaccard/union/intersection") {
    val s = spark; import s.implicits._
    // A = {1..60}, B = {41..100}: |A ∩ B| = 20, |A ∪ B| = 100, J = 0.2
    val df = ((1 to 60).map(v => ("a", v.toString)) ++
      (41 to 100).map(v => ("b", v.toString))).toDF("g", "v")
    val r = Sketches.kmvOverlap(df, "g", "v", k = 256).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[String]("group_a") === "a" && row.getAs[String]("group_b") === "b")
    assert(row.getAs[Int]("n_a_sketch") === 60 && row.getAs[Int]("n_b_sketch") === 60)
    assert(row.getAs[Double]("est_jaccard") === 0.2)
    assert(row.getAs[Double]("est_union") === 100.0)
    assert(row.getAs[Double]("est_intersection") === 20.0)
  }

  test("kmvOverlap estimator arm lands near the true overlap and is repartition-invariant") {
    val s = spark; import s.implicits._
    // 4000-distinct groups with a 2000-element intersection: J = 1/3
    val df = ((1 to 4000).map(v => ("a", s"v$v")) ++
      (2001 to 6000).map(v => ("b", s"v$v")) ++
      Seq(("a", null.asInstanceOf[String]))).toDF("g", "v") // NULL excluded
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.kmvOverlap(d, "g", "v", k = 256).collect()(0)
    val row = run(df)
    assert(row.getAs[Int]("n_a_sketch") === 256)
    val j = row.getAs[Double]("est_jaccard")
    val u = row.getAs[Double]("est_union")
    val i = row.getAs[Double]("est_intersection")
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"J estimate too far: $j")
    assert(math.abs(u - 6000.0) / 6000.0 < 0.25, s"U estimate too far: $u")
    assert(math.abs(i - 2000.0) / 2000.0 < 0.45, s"I estimate too far: $i")
    // deterministic: exact same doubles under any layout
    val rep = run(df.repartition(13))
    assert(rep.getAs[Double]("est_jaccard") === j)
    assert(rep.getAs[Double]("est_union") === u)
    assert(rep.getAs[Double]("est_intersection") === i)
  }

  test("kmvOverlap emits one row per unordered group pair") {
    val s = spark; import s.implicits._
    val df = (1 to 30).flatMap(v =>
      Seq(("a", s"x$v"), ("b", s"y$v"), ("c", s"x$v"))).toDF("g", "v")
    val rows = Sketches.kmvOverlap(df, "g", "v", k = 64).collect()
    val ps = rows.map(r => (r.getAs[String]("group_a"), r.getAs[String]("group_b"))).toSet
    assert(ps === Set(("a", "b"), ("a", "c"), ("b", "c")))
    // a and c are identical sets: J = 1 exactly (exact arm)
    val ac = rows.find(r => r.getAs[String]("group_a") == "a"
      && r.getAs[String]("group_b") == "c").get
    assert(ac.getAs[Double]("est_jaccard") === 1.0)
    assert(ac.getAs[Double]("est_intersection") === 30.0)
  }
}
