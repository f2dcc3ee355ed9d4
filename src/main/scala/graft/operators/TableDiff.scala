package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: the exact row-level diff of two versions of
  * a keyed table — `added` (key only in `b`), `removed` (key only in
  * `a`), `changed` (key in both, attribute tuples differ; the output
  * names exactly which columns) — the replica-drift / CDC-validation /
  * migration-audit primitive. Identical rows produce NO output, so the
  * result is O(drift), not O(table).
  *
  * Scale shape: ONE full-outer sort-merge join on the key — both sides
  * scan once, nothing broadcasts, no driver state. Column comparisons
  * are null-safe (`<=>`) codegen'd expressions; presence is tracked by
  * marker literals, so all-null attribute rows diff correctly. When
  * both snapshots are written bucketed by the key
  * ([[graft.sources.Io.writeBucketed]]), the join plans with ZERO
  * Exchange — a 100 TB reconciliation that shuffles nothing
  * (spec-gated).
  */
object TableDiff {

  /** Diff `b` against `a` (a = old, b = new). Both must share the exact
    * schema. Returns keys ++ (status, changed_cols); `changed_cols` is
    * empty for added/removed rows.
    */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(a.columns.sameElements(b.columns),
      s"schemas must match: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    require(keys.forall(a.columns.contains), s"missing key in ${a.columns.mkString(",")}")
    val attrs = a.columns.filterNot(keys.contains).toSeq
    val l = a.select(keys.map(col) ++ (attrs.map(c => col(c).as(s"__l_$c")) :+
      lit(true).as("__l_present")): _*)
    val r = b.select(keys.map(col) ++ (attrs.map(c => col(c).as(s"__r_$c")) :+
      lit(true).as("__r_present")): _*)
    val j = l.join(r, keys, "full_outer")
    val colChanged = attrs.map(c => c -> !(col(s"__l_$c") <=> col(s"__r_$c")))
    val anyChanged = colChanged.map(_._2).reduceOption(_ || _).getOrElse(lit(false))
    val status = when(col("__l_present").isNull, lit("added"))
      .when(col("__r_present").isNull, lit("removed"))
      .when(anyChanged, lit("changed"))
    val changed = filter(
      array(colChanged.map { case (c, p) => when(p, lit(c)) }: _*),
      x => x.isNotNull)
    j.withColumn("status", status)
      .filter(col("status").isNotNull)
      .withColumn("changed_cols",
        when(col("status") === "changed", changed)
          .otherwise(array().cast("array<string>")))
      .select(keys.map(col) :+ col("status") :+ col("changed_cols"): _*)
  }

  /** Drift roll-up: row counts per status plus per-column change counts
    * — the one-screen reconciliation report. Derived from [[diff]], so
    * still one join over the snapshots.
    */
  def summary(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val attrs = a.columns.filterNot(keys.contains).toSeq
    val d = diff(a, b, keys)
    val perCol = attrs.map(c =>
      sum(array_contains(col("changed_cols"), c).cast("long")).as(s"n_$c"))
    val aggs = count(lit(1)).as("n_rows") +: perCol
    d.groupBy(col("status")).agg(aggs.head, aggs.tail: _*)
  }
}
