package graft.operators

/** Declared-vs-stored schema policing for the CDC merge path — the part
  * of schema evolution a HEADERLESS positional feed cannot see in-band.
  *
  * The DMS stage carries positional CSVs: a column ADD shows up row-wise
  * as extra trailing cells (the widen_on_drift path handles it,
  * [[IncrementalMerge]]), but a RENAME is literally invisible (no names
  * in the files) and a DROP is indistinguishable from trailing NULLs —
  * worse, a mid-table drop silently shifts every later column one slot
  * left and positionally MIS-CASTS the whole batch into the wrong target
  * columns. The reference has the same blind spot (its
  * information_schema-driven `$n` binding, sql:307–321).
  *
  * The out-of-band fix: the table metadata may declare the upstream
  * column list (`additional_config: {"declared_columns": "a,b,c"}` —
  * the operator's record of the source table layout, updated whenever
  * the source DDL changes). Before merging, [[IncrementalMerge]] calls
  * [[check]]: adds pass (the in-band widen path owns them), while a
  * rename, drop, or reorder fails LOUDLY with the remediation — a
  * re-baseline full load — instead of mis-casting data. Control-plane
  * only: one string comparison per merge, no Spark jobs. */
object SchemaEvolution {

  sealed trait Evolution
  /** Declared matches the stored layout (possibly plus trailing adds —
    * the in-band widen path's territory). */
  case object Compatible extends Evolution
  /** Upstream dropped columns the target still stores. */
  final case class Drops(dropped: Seq[String]) extends Evolution
  /** Same shape, different names at some positions. */
  final case class Renames(pairs: Seq[(String, String)]) extends Evolution
  /** Same names, different order — positionally as corrupting as a drop. */
  case object Reordered extends Evolution
  /** None of the recognizable shapes — declared and stored disagree in a
    * way that needs a human. */
  case object Incompatible extends Evolution

  /** Classify `declared` (the upstream layout per table metadata) against
    * `stored` (the target table's data columns, in order). */
  def classify(declared: Seq[String], stored: Seq[String]): Evolution = {
    if (declared.take(stored.length) == stored) Compatible // exact or adds
    // declared is a strict PREFIX of stored, and every extra stored
    // column carries the in-band widen path's auto-generated name
    // (`c<ordinal>` — IncrementalMerge.widenIfBatchIsWider): the target
    // is AHEAD of the metadata, the normal state right after a widen
    // landed before declared_columns was refreshed. Positionally
    // harmless — pass.
    else if (stored.take(declared.length) == declared &&
        stored.drop(declared.length).forall(_.matches("c\\d+")))
      Compatible
    // declared is a strict prefix but the extras are REAL named columns:
    // the operator refreshed the metadata to record an upstream TRAILING
    // drop. Positionally the change files just carry trailing nulls —
    // but merging them would overwrite every stored value in the dropped
    // columns with null on each update. A declared drop must be loud.
    else if (stored.take(declared.length) == declared)
      Drops(stored.drop(declared.length))
    else if (isProperSubsequence(declared, stored))
      Drops(stored.diff(declared))
    else if (declared.length == stored.length &&
        declared.toSet == stored.toSet) Reordered
    else if (declared.length >= stored.length && {
      val mismatches =
        stored.zip(declared).filter { case (s, d) => s != d }
      // every mismatching position introduces a NEW name (not a shuffled
      // stored one): a rename at those positions
      mismatches.nonEmpty &&
        mismatches.forall { case (_, d) => !stored.contains(d) }
    }) Renames(stored.zip(declared).filter { case (s, d) => s != d })
    else Incompatible
  }

  private def isProperSubsequence(sub: Seq[String], sup: Seq[String]): Boolean = {
    if (sub.length >= sup.length) return false
    var i = 0
    sup.foreach { s => if (i < sub.length && sub(i) == s) i += 1 }
    i == sub.length
  }

  /** [[check]] with a DECLARED RENAME MAP (`additional_config:
    * {"renames": {"stored_old": "declared_new"}}`) — the sanctioned
    * bridge when upstream renamed columns and `declared_columns` already
    * records the new names: a rename is positionally harmless in a
    * headerless feed (no cell moves), so once the operator declares the
    * old→new mapping the merge may proceed with the stored names —
    * a fleet migration records one map per table instead of hand-
    * rewriting files or re-baselining. The stored layout is translated
    * through the map and THEN classified, so only the mapped renames
    * are absolved: unmapped drift — a rename the map misses, a drop, a
    * reorder — still fails loudly with its remediation. The map itself
    * is validated first: an entry whose old name is not stored is stale
    * metadata, and a mapping that collides two columns can never be
    * right; both fail actionably rather than silently misclassifying. */
  def check(tableName: String, declared: Seq[String], stored: Seq[String],
      renames: Map[String, String]): Unit = {
    if (renames.isEmpty) check(tableName, declared, stored)
    else {
      val stale = renames.keys.filterNot(stored.contains).toSeq.sorted
      if (stale.nonEmpty)
        throw new IllegalStateException(
          s"rename map for $tableName names [${stale.mkString(", ")}] that " +
            "the target does not store — stale metadata; fix the renames " +
            "object to map stored names")
      val mapped = stored.map(s => renames.getOrElse(s, s))
      val dups = mapped.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
      if (dups.nonEmpty)
        throw new IllegalStateException(
          s"rename map for $tableName collides columns onto " +
            s"[${dups.toSeq.sorted.mkString(", ")}] — a map may never merge " +
            "two stored columns into one name")
      check(tableName, declared, mapped)
    }
  }

  /** [[classify]] and throw with remediation on anything a positional
    * merge cannot express. Call with the declared list ONLY when the
    * metadata carries one. */
  def check(tableName: String, declared: Seq[String], stored: Seq[String]): Unit =
    classify(declared, stored) match {
      case Compatible => ()
      case Drops(dropped) =>
        throw new IllegalStateException(
          s"declared_columns for $tableName no longer contains " +
            s"[${dropped.mkString(", ")}] that the target still stores: an " +
            "upstream DROP shifts every later positional CSV column one slot " +
            "left and would mis-cast the batch. Re-baseline: run a full load " +
            "under the new layout, then keep declared_columns as declared")
      case Renames(pairs) =>
        throw new IllegalStateException(
          s"declared_columns for $tableName renames " +
            pairs.map { case (s, d) => s"'$s' -> '$d'" }.mkString(", ") +
            ": the warehouse keeps the stored names. Either revert " +
            "declared_columns, or re-baseline with a full load to adopt the " +
            "new names")
      case Reordered =>
        throw new IllegalStateException(
          s"declared_columns for $tableName reorders the stored columns: a " +
            "positional feed under a reorder mis-casts every moved column. " +
            "Re-baseline with a full load under the new column order")
      case Incompatible =>
        throw new IllegalStateException(
          s"declared_columns for $tableName (${declared.mkString(", ")}) is " +
            s"incompatible with the stored layout (${stored.mkString(", ")}) " +
            "beyond adds/renames/drops/reorders — re-baseline with a full " +
            "load and reconcile the metadata")
    }
}
