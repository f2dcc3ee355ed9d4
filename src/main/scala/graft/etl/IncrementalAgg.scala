package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.IncrementalDedup.dropForRebuild

/** Incremental aggregation state: maintain a grouped summary (count /
  * sum / sum-of-squares / min / max — everything mean and stddev derive
  * from) over an append-only fact stream in O(delta) per batch, instead
  * of recomputing the world.
  *
  * This is the maintainable twin of the reference's daily summary
  * (dag:244-253): the full recompute is `q01_agg_daily`; this operator
  * keeps the same result continuously up to date as batches arrive.
  *
  * Layout (log-structured merge, the same philosophy as
  * [[graft.dedup.IncrementalDedup]]'s index):
  *
  *   <name>_state   (keys..., batch_id, cnt, s, s2, mn, mx)
  *                  bucketed by keys.head — appends are O(delta),
  *                  reads fold partials per key with NO extra shuffle
  *                  (HashPartitioning on a subset of the grouping keys
  *                  satisfies the fold's clustering requirement)
  *   <name>_applied (batch_id)
  *                  tiny marker written ONLY by [[compact]], so folding
  *                  partials (which erases their batch ids) never
  *                  forgets which batches are already in
  *
  * Replay safety is CONTENT-gated, not marker-ordered: [[appendDelta]]
  * anti-joins the batch id against state ∪ marker, and the partial
  * append is a single Spark job (commits or doesn't) — so at-least-once
  * delivery folds correctly with no transaction log, exactly like
  * `appendToIndex`. All aggregates carried are commutative monoids;
  * every partial is order-independent, so the fold equals the full
  * recompute bit-for-bit on integral carriers and within one double
  * rounding on sums (spec- and oracle-gated).
  *
  * Batch ids must be >= 0; −1 is the fold sentinel [[compact]] writes.
  */
object IncrementalAgg {

  private def stateTable(name: String)   = s"${name}_state"
  private def newTable(name: String)     = s"${name}_state_new"
  private def appliedTable(name: String) = s"${name}_applied"

  private val aggCols = Seq("batch_id", "cnt", "s", "s2", "mn", "mx")

  /** Per-batch partial rows for `df`: one row per touched key. */
  private def partials(df: DataFrame, keys: Seq[String], valueCol: String,
      batchId: Long): DataFrame = {
    val v = col(valueCol).cast("double")
    df.groupBy(keys.map(col): _*)
      .agg(count(v).as("cnt"), sum(v).as("s"), sum(v * v).as("s2"),
        min(v).as("mn"), max(v).as("mx"))
      .withColumn("batch_id", lit(batchId))
      .select((keys ++ aggCols).map(col): _*)
  }

  /** Heal a crash inside [[compact]]'s swap window. Idempotent; called
    * on entry by every other surface so a crashed maintenance run can
    * never strand the state. (The mechanism lives in
    * [[graft.sources.Io.recoverRebuild]], shared with IncrementalCC.)
    */
  def recover(spark: SparkSession, name: String): Unit =
    graft.sources.Io.recoverRebuild(spark, stateTable(name))

  /** Build the state from the current corpus (full-rebuild semantics:
    * replaces any previous state of this name, including its applied-
    * batches marker).
    *
    * The default `batchId` is `Long.MaxValue`, a reserved "base build"
    * id: foreachBatch streams deliver 0-based batch ids, and a base
    * built under id 0 would make the gate silently swallow the stream's
    * FIRST batch ([[graft.streaming.AggStream]]). Pass an explicit id
    * only in batch-oriented flows that manage their own id space.
    */
  /** Column names the state schema reserves for its aggregate carriers
    * and the replay gate. [[read]]/[[foldForCompaction]] infer the
    * grouping keys by EXCLUDING these, so a user key named like one
    * would corrupt the schema contract — rejected up front with a clear
    * message instead of failing later as an ambiguous-column error.
    */
  private val reservedCols = Set("cnt", "s", "s2", "mn", "mx", "batch_id")
  private def requireKeysFree(keys: Seq[String], valueCol: String): Unit = {
    val clash = (keys :+ valueCol).filter(c => reservedCols(c.toLowerCase))
    require(clash.isEmpty,
      s"IncrementalAgg: column name(s) ${clash.mkString(", ")} collide with " +
        s"the reserved state columns ${reservedCols.toSeq.sorted.mkString(", ")} — " +
        "rename them before building the state")
  }

  def writeState(df: DataFrame, keys: Seq[String], valueCol: String, name: String,
      batchId: Long = Long.MaxValue, buckets: Int = 8): Unit = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    requireKeysFree(keys, valueCol)
    val spark = df.sparkSession
    Seq(stateTable(name), newTable(name), appliedTable(name))
      .foreach(dropForRebuild(spark, _))
    graft.sources.Io.writeBucketed(
      partials(df, keys, valueCol, batchId), stateTable(name), keys.head, buckets)
  }

  /** Fold one batch in: O(|delta| touched keys) appended rows, gated on
    * batch id so an at-least-once replay appends ZERO rows. The state
    * side of the gate is a column-pruned scan of `batch_id` only.
    */
  def appendDelta(delta: DataFrame, keys: Seq[String], valueCol: String, name: String,
      batchId: Long): Unit = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    requireKeysFree(keys, valueCol)
    val spark = delta.sparkSession
    recover(spark, name)
    val before = graft.Blocks.persistedIds(spark)
    // localCheckpoint cuts the read→write lineage on the state table
    // (the self-insert shape Spark rejects on some paths) AND bounds the
    // gated partials — they are #touched-keys rows by construction
    val gated = partials(delta, keys, valueCol, batchId)
      .join(appliedBatches(spark, name), Seq("batch_id"), "left_anti")
      .localCheckpoint()
    if (gated.head(1).nonEmpty)
      graft.sources.Io.appendBucketed(gated, stateTable(name))
    graft.Blocks.releaseSince(spark, before)
  }

  /** The folded summary: one row per key with count / sum / mean /
    * variance-carrier / min / max. Thanks to bucketing on `keys.head`
    * the fold needs no exchange — the scan is already clustered.
    */
  def read(spark: SparkSession, name: String): DataFrame = {
    recover(spark, name)
    val st = spark.table(stateTable(name))
    val keys = st.columns.filterNot(aggCols.contains)
    st.groupBy(keys.map(col): _*)
      .agg(sum("cnt").cast("long").as("cnt"), sum("s").as("s"), sum("s2").as("s2"),
        min("mn").as("mn"), max("mx").as("mx"))
      .withColumn("avg", col("s") / col("cnt"))
  }

  /** Fold the partial log down to one row per key. Keeps replay safety:
    * the batch ids being erased are recorded in the marker table FIRST,
    * so a batch replayed after compaction still gates to a no-op. The
    * swap (write fold → drop state → rename) is crash-safe via
    * [[recover]] at every entry point.
    */
  def compact(spark: SparkSession, name: String): Unit = {
    val (folded, buckets, bucketCol) = foldForCompaction(spark, name)
    // swap: the only destructive step happens AFTER the fold is
    // durable; a crash on either side of the rename is healed by
    // recover()
    graft.sources.Io.rebuildBucketed(spark, stateTable(name), folded, bucketCol, buckets)
  }

  /** Misra-Gries bounded compaction for COUNTING states (valueCol ≡ 1 at
    * append time): fold like [[compact]], then if more than `capacity`
    * keys remain, subtract the (capacity+1)-th largest count from every
    * key and drop the non-positive — the classic mergeable heavy-hitters
    * summary (Misra–Gries 1982; merge rule per Agarwal et al., PODS'12).
    * State never exceeds `capacity` keys, every surviving `cnt` is an
    * UNDERCOUNT by at most the accumulated thresholds — themselves
    * bounded by N/(capacity+1) over a stream of N rows — and any key
    * with true share > 1/(capacity+1) is guaranteed retained. This is
    * what bounds streaming top-k state when the token domain is
    * unbounded ([[graft.streaming.TopKStream]]). The count carriers
    * (cnt, s, s2 — all ≡ the count when value ≡ 1) are decremented
    * coherently; calling this on a non-counting state corrupts its
    * sum/variance semantics, so don't.
    *
    * The threshold probe is a `capacity+1`-row sorted limit — bounded
    * driver work by construction, like every trainer constant here.
    */
  def compactTopK(spark: SparkSession, name: String, capacity: Int): Unit = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val (folded, buckets, bucketCol) = foldForCompaction(spark, name)
    val persisted = folded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = persisted.select(col("cnt")).orderBy(desc("cnt")).limit(capacity + 1).collect()
    val bounded =
      if (top.length <= capacity) persisted
      else {
        val thr = top.map(_.getLong(0)).min
        persisted
          .withColumn("cnt", col("cnt") - thr)
          .filter(col("cnt") > 0)
          .withColumn("s", col("s") - thr.toDouble)
          .withColumn("s2", col("s2") - thr.toDouble)
          .localCheckpoint()
      }
    graft.sources.Io.rebuildBucketed(spark, stateTable(name), bounded, bucketCol, buckets)
    persisted.unpersist(blocking = false)
  }

  /** Steps shared by the compaction variants: record the batch ids the
    * fold will erase in the marker table FIRST (so a batch replayed
    * after compaction still gates to a no-op), then fold the partial log
    * to one row per key under the sentinel batch id, materialized before
    * anything is dropped.
    */
  private def foldForCompaction(spark: SparkSession, name: String): (DataFrame, Int, String) = {
    recover(spark, name)
    val st = stateTable(name)
    val (buckets, bucketCols, _) =
      org.apache.spark.sql.GraftShims.bucketSpec(spark, st).getOrElse(
        throw new IllegalStateException(s"$st is not bucketed — not ours"))
    // anti-join keeps the marker duplicate-free; localCheckpoint cuts
    // its self-lineage
    val applied = spark.table(st).select("batch_id").distinct()
    val fresh =
      if (spark.catalog.tableExists(appliedTable(name)))
        applied.join(spark.table(appliedTable(name)), Seq("batch_id"), "left_anti")
          .localCheckpoint()
      else applied.localCheckpoint()
    fresh.write.mode("append").format("parquet").saveAsTable(appliedTable(name))
    val keys = spark.table(st).columns.filterNot(aggCols.contains).toSeq
    val folded = spark.table(st)
      .groupBy(keys.map(col): _*)
      .agg(sum("cnt").cast("long").as("cnt"), sum("s").as("s"), sum("s2").as("s2"),
        min("mn").as("mn"), max("mx").as("mx"))
      .withColumn("batch_id", lit(-1L))
      .select((keys ++ aggCols).map(col): _*)
    (folded, buckets, bucketCols.head)
  }

  /** Every batch id already folded in: state's live ids ∪ the marker. */
  private def appliedBatches(spark: SparkSession, name: String): DataFrame = {
    val inState = spark.table(stateTable(name)).select("batch_id")
    val all =
      if (spark.catalog.tableExists(appliedTable(name)))
        inState.unionByName(spark.table(appliedTable(name)).select("batch_id"))
      else inState
    all.distinct()
  }
}
