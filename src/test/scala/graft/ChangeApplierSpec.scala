package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.ChangeApplier

/** Property-style test for the CDC merge semantics (SURVEY §5): random op
  * sequences per PK (fixed seed), folded in (file, row) order by a trivial
  * in-memory oracle — last op wins; a PK whose latest op is 'D' is absent.
  */
class ChangeApplierSpec extends SparkSpec {

  private val targetSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("val", StringType)))
  private val changeSchema = StructType(Seq(
    StructField("op", StringType), StructField("id", IntegerType),
    StructField("val", StringType), StructField("_file_name", StringType),
    StructField("_row_in_file", IntegerType)))

  case class Change(op: String, id: Int, value: String, file: String, row: Int)

  private def foldOracle(target: Map[Int, String], changes: Seq[Change]): Map[Int, String] = {
    val latest = changes.groupBy(_.id).map { case (id, cs) =>
      id -> cs.maxBy(c => (c.file, c.row))
    }
    latest.foldLeft(target) { case (acc, (id, c)) =>
      if (c.op == "D") acc - id else acc + (id -> c.value)
    }
  }

  private def randomChanges(rng: scala.util.Random): List[Change] = {
    val n = rng.nextInt(60)
    List.tabulate(n) { i =>
      val op = Seq("I", "U", "D")(rng.nextInt(3))
      Change(op, rng.nextInt(13), s"v${rng.nextInt(1000)}",
        f"2024010${i / 10}-${i / 10}%09d.csv", i % 10 + 1)
    }
  }

  private def runMerge(target0: Map[Int, String], changes: Seq[Change]): Map[Int, String] = {
    val targetDf = spark.createDataFrame(
      java.util.Arrays.asList(target0.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }: _*),
      targetSchema)
    val changesDf = spark.createDataFrame(
      java.util.Arrays.asList(changes.map(c => Row(c.op, c.id, c.value, c.file, c.row)): _*),
      changeSchema)
    ChangeApplier.apply(targetDf, changesDf, Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
  }

  test("merge equals the in-memory fold oracle on random op sequences (seed=42)") {
    val rng = new scala.util.Random(42)
    (1 to 12).foreach { trial =>
      val changes = randomChanges(rng)
      val target0 = (0 to 6).map(i => i -> s"init$i").toMap
      val expected = foldOracle(target0, changes)
      val actual = runMerge(target0, changes)
      assert(actual === expected, s"trial $trial with ${changes.size} changes")
    }
  }

  test("tombstone for a never-seen PK is a no-op; latest-D drops an inserted PK") {
    val result = runMerge(Map(1 -> "a"), Seq(
      Change("D", 99, "x", "f1", 1), // delete of unknown key
      Change("I", 2, "new", "f1", 2), // insert…
      Change("D", 2, "new", "f2", 1))) // …then delete in a later file
    assert(result === Map(1 -> "a"))
  }

  test("aggregate latestPerKey equals the window formulation on random logs") {
    val rng = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val changes = randomChanges(rng)
      val changesDf = spark.createDataFrame(
        java.util.Arrays.asList(changes.map(c => Row(c.op, c.id, c.value, c.file, c.row)): _*),
        changeSchema)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("op", "id", "val", "_file_name", "_row_in_file")
          .collect().map(_.toSeq).toSet
      assert(canon(ChangeApplier.latestPerKey(changesDf, Seq("id"))) ===
        canon(ChangeApplier.latestPerKeyWindow(changesDf, Seq("id"))))
    }
  }

  test("NULL op is a no-op: the target row survives untouched (MERGE semantics)") {
    val result = runMerge(Map(1 -> "a", 2 -> "b"), Seq(
      Change(null, 1, "ghost", "f1", 1), // null op latest for existing key → untouched
      Change("U", 2, "b2", "f1", 2)))
    assert(result === Map(1 -> "a", 2 -> "b2"))
  }

  test("hot-key skew: one PK with 20k updates reduces to its latest row") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val target = Seq((1, "init"), (2, "other")).toDF("id", "val")
    // 20k updates to id=1 across 200 files, plus one late row for id=2
    val changes = s.range(20000)
      .select(
        lit("U").as("op"), lit(1).cast("int").as("id"),
        concat(lit("v"), col("id")).as("val"),
        format_string("20260101-%09d.csv", expr("id div 100")).as("_file_name"),
        (pmod(col("id"), lit(100)) + 1).cast("int").as("_row_in_file"))
      .unionByName(Seq(("U", 2, "late", "20260102-000000000.csv", 1))
        .toDF("op", "id", "val", "_file_name", "_row_in_file"))
    val result = graft.operators.ChangeApplier.apply(target, changes, Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // latest for id=1: max (file, row) = file 199, row 100 → source row 19999
    assert(result === Map(1 -> "v19999", 2 -> "late"))
  }

  test("duplicate rows in one file: highest row number wins") {
    val result = runMerge(Map(1 -> "a"), Seq(
      Change("U", 1, "first", "f1", 1),
      Change("U", 1, "second", "f1", 2)))
    assert(result === Map(1 -> "second"))
  }
}
