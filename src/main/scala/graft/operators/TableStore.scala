package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table with atomic swap — the merge/overwrite substrate
  * (no Delta/Iceberg jar in this environment; SURVEY §7.3).
  *
  * Layout: `<root>/<table>/v<N>/` parquet dirs + `<root>/<table>/_current`
  * manifest holding the live version number. Writers produce `v(N+1)` fully,
  * then repoint the manifest with temp-write + atomic rename; readers
  * resolve the manifest first, so they never observe a half-written table.
  * Old versions are pruned after the swap (best-effort; a reader already
  * holding v(N)'s file list finishes safely on local/HDFS-like stores).
  *
  * At cluster scale the same pattern works on any store with atomic rename
  * (HDFS) — on S3 the manifest write is still atomic (single PUT).
  */
final class TableStore(root: String) {
  Files.createDirectories(Paths.get(root))

  private def tableDir(name: String) = Paths.get(root, name)
  private def manifest(name: String) = tableDir(name).resolve("_current")

  def currentVersion(name: String): Option[Int] =
    if (Files.exists(manifest(name)))
      Some(new String(Files.readAllBytes(manifest(name)), StandardCharsets.UTF_8).trim.toInt)
    else None

  def exists(name: String): Boolean = currentVersion(name).isDefined

  def path(name: String): String =
    currentVersion(name) match {
      case Some(v) => tableDir(name).resolve(s"v$v").toString
      case None => throw new IllegalStateException(s"table $name does not exist under $root")
    }

  def read(spark: SparkSession, name: String): DataFrame = spark.read.parquet(path(name))

  /** Write `df` as the next version and atomically swap the manifest. */
  def write(df: DataFrame, name: String): Int = {
    val next = currentVersion(name).getOrElse(0) + 1
    val dest = tableDir(name).resolve(s"v$next")
    df.write.mode("overwrite").parquet(dest.toString)
    val tmp = tableDir(name).resolve("_current.tmp")
    Files.createDirectories(tableDir(name))
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifest(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    prune(name, keep = next)
    next
  }

  /** Best-effort removal of superseded versions. */
  private def prune(name: String, keep: Int): Unit = {
    val dir = tableDir(name)
    if (Files.exists(dir)) {
      val stream = Files.list(dir)
      try {
        stream.iterator().forEachRemaining { p =>
          val n = p.getFileName.toString
          if (n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.drop(1).toInt != keep) {
            try deleteRecursively(p) catch { case _: java.io.IOException => () }
          }
        }
      } finally stream.close()
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().forEachRemaining(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
