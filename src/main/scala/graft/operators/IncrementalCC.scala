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
  * Scale: per-batch compute is O(affected components + batch). Both
  * log lookups are pushed into the scan as driver-side literals (the
  * batch's endpoint/component id sets are bounded by the micro-batch
  * contract): the members pull is an `In(comp, …)` on the bucket column
  * — bucket pruning reads only the touched components' buckets — and
  * the endpoint lookup is an `In(id, …)` against files sorted by id
  * within each bucket, so parquet min/max stats prune row groups. The
  * append is O(affected). [[compactLabels]] folds the log (crash-safe
  * swap, [[graft.sources.Io.rebuildBucketed]]) so reads stay O(live
  * rows).
  *
  * Why not an id-bucketed MIRROR table for the endpoint lookup (the
  * `_ids`-gate shape [[graft.dedup.IncrementalDedup]] uses): the log's
  * crash-safety rests on lookup and append hitting the SAME table — a
  * two-table append is not atomic, and a mirror missing a decrease row
  * returns a stale (too-high) root whose membership pull then misses
  * the already-merged side, appending labels that SPLIT a component;
  * the damage is permanent because replay recomputes `changed` against
  * the healthy main log and never re-appends the missing mirror rows.
  * Literal pushdown gets the O(batch) lookup without a second table.
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
    // sorted by id within each bucket: the endpoint lookup's pushed
    // In(id, …) then prunes row groups via parquet min/max stats
    graft.sources.Io.writeBucketed(labels, labelsTable(name), "comp", buckets,
      sortCol = Some("id"))
  }

  /** Current root per id, restricted to `ids` — the per-batch endpoint
    * lookup. The literal In(id, …) reaches the parquet scan (files are
    * id-sorted within buckets, so min/max stats prune row groups); a
    * broadcast semi-join would filter only after scanning the whole log.
    */
  private[graft] def rootsOf(spark: SparkSession, name: String,
      ids: Seq[Long]): DataFrame =
    spark.table(labelsTable(name))
      .filter(col("id").isin(ids: _*))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))

  /** Current membership of `comps`, min-folded per id. The literal
    * In(comp, …) is on the BUCKET column, so bucket pruning reads only
    * the touched components' buckets.
    */
  private[graft] def membersOf(spark: SparkSession, name: String,
      comps: Seq[Long]): DataFrame =
    spark.table(labelsTable(name))
      .filter(col("comp").isin(comps: _*))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))

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
    // endpoint ids and touched components are bounded by the batch size
    // (micro-batch contract) — collecting them makes both log lookups
    // pushed-literal scans (row-group / bucket pruning) instead of
    // full-log scans behind a broadcast join
    val endpointIds = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id"))).distinct()
      .collect().map(_.getLong(0)).toSeq
    // current root per endpoint: min over the endpoint's rows. Taking
    // CURRENT roots (not every stale comp the endpoints ever carried)
    // is what makes one lookup round sufficient — see the scaladoc
    // invariant.
    val touchedComps = rootsOf(spark, name, endpointIds)
      .select(col("comp")).distinct().collect().map(_.getLong(0)).toSeq
    val members = membersOf(spark, name, touchedComps)
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
    // replay fast path: a converged/replayed batch changes nothing —
    // skip the zero-row write job (see IncrementalAgg.appendDelta)
    if (changed.head(1).nonEmpty)
      graft.sources.Io.appendBucketed(changed, labelsTable(name))
    // free this batch's intermediates (e) and the changed-rows
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
