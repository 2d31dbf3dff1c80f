package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style diff of two snapshots of the same logical table — the
  * incremental-refresh primitive a 100 TB pipeline runs between
  * ingest waves (what changed since the last crawl / dump?), and the
  * Spark form of the reference's "rebuild vs update" database
  * maintenance surface (pygr re-persists whole stores,
  * `annotation.py` / `sqlgraph.py` table reloads; at scale you diff).
  *
  * Scale design: ONE full-outer sort-merge join keyed on `keyCols` —
  * both sides shuffle once on the key, nothing is collected, and when
  * the snapshots are pre-aggregated (the common case: diff of keyed
  * summaries) the join inputs are already small relative to the fact
  * data. Unchanged keys are dropped pre-output, so the result is
  * proportional to the churn, not the table.
  */
object SnapshotDiff {

  /** Returns one row per key whose presence or payload differs:
    * (keyCols..., status, old_<v>..., new_<v>...) with status in
    * {added, removed, changed}. Payload comparison is null-safe
    * (`<=>`). Both inputs must share the same schema, and `keyCols`
    * must be UNIQUE per snapshot — duplicate rows per key fan out
    * through the full-outer join (k_a × k_b rows per key), which is
    * never the intended diff of a keyed snapshot.
    */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "SnapshotDiff.diff: keyCols must be non-empty")
    require(!keyCols.contains("status"),
      "SnapshotDiff.diff: a key column named 'status' would collide with the emitted status column")
    require(a.columns.toSeq == b.columns.toSeq,
      s"SnapshotDiff.diff: snapshot schemas differ " +
        s"(${a.columns.mkString(",")} vs ${b.columns.mkString(",")})")
    val valCols = a.columns.filterNot(keyCols.contains).toSeq
    // a value column already named old_<c>/new_<c> would duplicate a
    // generated name: the diff output would carry ambiguous columns
    // that only fail downstream — reject up front
    val prefixed = valCols.flatMap(c => Seq(s"old_$c", s"new_$c")).toSet
    val collisions = a.columns.filter(prefixed.contains)
    require(collisions.isEmpty,
      s"SnapshotDiff.diff: column(s) ${collisions.mkString(", ")} collide " +
        "with the generated old_/new_ prefixed names — rename them first")
    val aa = a.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"old_$c")) :+ lit(1).as("__in_a"): _*)
    val bb = b.select(keyCols.map(col) ++
      valCols.map(c => col(c).as(s"new_$c")) :+ lit(1).as("__in_b"): _*)
    val changed = valCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    aa.join(bb, keyCols, "full_outer")
      .withColumn("status",
        when(col("__in_a").isNull, lit("added"))
          .when(col("__in_b").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .where(col("status").isNotNull)
      .drop("__in_a", "__in_b")
  }
}
