package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental connected components: maintain min-label cluster
  * assignments over a growing edge set in O(affected) per batch —
  * the clustering stage of a streaming dedup pipeline kept up to date
  * as [[graft.streaming.DedupStream]] emits new pairs, without ever
  * re-clustering the world.
  *
  * State: `<name>_labels (id, comp)`, bucketed by `comp`, APPEND-ONLY.
  * The load-bearing observation is that min-labels are MONOTONE: edges
  * are only ever added, components only ever merge, and the min-id of a
  * merged component is ≤ every member's previous label — so a node's
  * current label is simply `min(comp)` over all rows ever appended for
  * it. That makes the log a join-semilattice (CRDT-style): appends are
  * content-idempotent (replaying a batch appends rows that cannot
  * change any min), partial appends after a crash are harmless, and NO
  * replay gate or transaction log is needed — unlike
  * [[graft.etl.IncrementalAgg]], where counts would double.
  *
  * Per batch ([[mergeEdges]]): the endpoints' current components are
  * looked up (broadcast semi-join — the batch is the small side), their
  * members pulled (semi-join on the bucketed `comp`), and components are
  * recomputed ONLY over star edges (member → current root) plus the new
  * edges. The consistency invariant that makes the single lookup round
  * sufficient — every merge rewrites the FULL membership of each
  * touched component, so members of a current root always fold to that
  * root — is maintained by construction and exercised in the spec.
  *
  * Scale: per-batch compute is O(affected components + batch), the big
  * label side is touched by two column-pruned scans (one filtered by
  * id, one by comp), and the append is O(affected). [[compactLabels]]
  * folds the log (crash-safe swap, [[graft.sources.Io.rebuildBucketed]])
  * so reads stay O(live rows).
  */
object IncrementalCC {

  private def labelsTable(name: String) = s"${name}_labels"

  /** Build the label table from the initial edge set (full-rebuild
    * semantics). Nodes with no edges carry no row — readers default
    * them to their own id, exactly like the batch operator's callers.
    */
  def writeLabels(edges: DataFrame, idACol: String, idBCol: String, name: String,
      buckets: Int = 8): Unit = {
    val spark = edges.sparkSession
    graft.dedup.IncrementalDedup.dropForRebuild(spark, labelsTable(name))
    graft.dedup.IncrementalDedup.dropForRebuild(spark, s"${labelsTable(name)}_new")
    val labels = ConnectedComponents.minLabel(edges, idACol, idBCol)
      .select(col("node").as("id"), col("comp"))
    graft.sources.Io.writeBucketed(labels, labelsTable(name), "comp", buckets)
  }

  /** Fold one batch of new edges in and return the recomputed labels of
    * every affected node (old members of touched components + the
    * batch's nodes). The returned DataFrame is checkpoint-backed; the
    * caller owns its blocks (the bench/verify/stream wrappers release
    * per query/batch) — batch intermediates are freed here.
    */
  def mergeEdges(spark: SparkSession, edges: DataFrame, idACol: String,
      idBCol: String, name: String): DataFrame = {
    recover(spark, name)
    val before = graft.Blocks.persistedIds(spark)
    val e = edges.select(col(idACol).cast("long").as("a"),
      col(idBCol).cast("long").as("b")).localCheckpoint()
    val endpoints = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id"))).distinct()
    val labels = spark.table(labelsTable(name))
    // current root per endpoint: min over the endpoint's rows. Taking
    // CURRENT roots (not every stale comp the endpoints ever carried)
    // is what makes one lookup round sufficient — see the scaladoc
    // invariant. Bounded by the batch size → localCheckpoint + broadcast.
    val touched = labels.join(broadcast(endpoints), Seq("id"), "left_semi")
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
      .select(col("comp")).distinct().localCheckpoint()
    val members = labels.join(broadcast(touched), Seq("comp"), "left_semi")
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
    val star = members.select(col("id").as("a"), col("comp").as("b"))
    val mid = graft.Blocks.persistedIds(spark)
    // minLabel's result is already a lineage-cutting checkpoint — the
    // append below can never reference its own target table through it
    val newLabels = ConnectedComponents.minLabel(star.unionByName(e), "a", "b")
      .select(col("node").as("id"), col("comp"))
    val afterLabels = graft.Blocks.persistedIds(spark)
    // append only what the fold can't already derive: new nodes and
    // labels that DECREASED. Unchanged members stay un-rewritten (their
    // existing rows already fold correctly), which bounds log growth at
    // O(actual merges) and makes a replayed batch append ZERO rows.
    val changed = newLabels
      .join(members.withColumnRenamed("comp", "prev"), Seq("id"), "left")
      .filter(col("prev").isNull || col("comp") < col("prev"))
      .select(col("id"), col("comp"))
      .localCheckpoint()
    graft.sources.Io.appendBucketed(changed, labelsTable(name))
    // free this batch's intermediates (e, touched) and the changed-rows
    // checkpoint — but NOT the checkpoint backing the returned labels:
    // the caller consumes it (releasing it here was a use-after-free the
    // scale harness caught the first time a caller counted the result)
    graft.Blocks.releaseBetween(spark, before, mid)
    graft.Blocks.releaseSince(spark, afterLabels)
    newLabels
  }

  /** Current label per node: the min-fold over the append-only log. */
  def readLabels(spark: SparkSession, name: String): DataFrame = {
    recover(spark, name)
    spark.table(labelsTable(name))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
  }

  /** Fold the label log to one row per node (crash-safe swap; replay
    * safety needs no marker here — appends are idempotent by the
    * min-monotone argument above).
    */
  def compactLabels(spark: SparkSession, name: String): Unit = {
    recover(spark, name)
    val st = labelsTable(name)
    val (buckets, bucketCols, _) =
      org.apache.spark.sql.GraftShims.bucketSpec(spark, st).getOrElse(
        throw new IllegalStateException(s"$st is not bucketed — not ours"))
    val folded = spark.table(st)
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
      .select(col("id"), col("comp"))
    graft.sources.Io.rebuildBucketed(spark, st, folded, bucketCols.head, buckets)
  }

  def recover(spark: SparkSession, name: String): Unit =
    graft.sources.Io.recoverRebuild(spark, labelsTable(name))
}
