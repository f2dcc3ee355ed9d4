package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental ANN index: a PERSISTED IVF cell table that new vectors
  * append to in O(delta) — assign against the stored coarse centroids,
  * append to the bucketed cells table — with no retraining and no
  * rebuild. The last leg of the incremental family ([[graft.etl
  * .IncrementalAgg]], [[graft.dedup.IncrementalDedup]],
  * [[graft.operators.IncrementalCC]]): an embedding stream lands
  * continuously, and similarity search sees every vector the moment its
  * batch commits.
  *
  * Layout:
  *   <name>_cells     (id, vec, cell)  bucketed by cell — the search
  *                    side; a query's probe join touches only its
  *                    probed cells' buckets
  *   <name>_ids       (id)             bucketed by id — the replay
  *                    gate; anti-joining a delta against it never
  *                    shuffles the big side
  *   <name>_centroids (cell, c)        tiny; the FROZEN quantizer
  *
  * Centroids are deliberately frozen at build time (the standard
  * production practice — retrain offline when drift warrants, then
  * [[writeIndex]] anew): appends stay deterministic and O(delta), and
  * search semantics never shift under a running stream.
  *
  * Replay discipline mirrors [[graft.dedup.IncrementalDedup]]: the id
  * gate makes appends idempotent; cells land BEFORE ids (ids are the
  * commit marker), so a crash between the two can only leave orphan
  * cell rows, which [[topK]] tolerates by folding candidate duplicates
  * (max is idempotent) — the reverse order would silently lose vectors
  * forever.
  */
object IncrementalAnn {

  private def cellsTable(name: String) = s"${name}_cells"
  private def idsTable(name: String)   = s"${name}_ids"
  private def centsTable(name: String) = s"${name}_centroids"

  /** Train the coarse quantizer on the current corpus and build the
    * index (full-rebuild semantics).
    */
  def writeIndex(df: DataFrame, idCol: String, vecCol: String, name: String,
      kCoarse: Int = 16, iters: Int = 5, buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq(cellsTable(name), idsTable(name), centsTable(name), driftTable(name))
      .foreach(graft.dedup.IncrementalDedup.dropForRebuild(spark, _))
    val coarse = KMeans.fit(df, idCol, vecCol, kCoarse, iters)
    val cells = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("cell", KMeans.assignExpr(col("vec"), coarse))
    graft.sources.Io.writeBucketed(cells, cellsTable(name), "cell", buckets)
    graft.sources.Io.writeBucketed(cells.select("id"), idsTable(name), "id", buckets)
    coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "c").coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(centsTable(name))
    // build-time quantization baseline, persisted so drift monitoring
    // never has to rescan the corpus: one extra agg over the same pass's
    // input, one tiny row
    quantStats(df.select(col(vecCol).as("vec")), "vec", coarse).coalesce(1)
      .write.mode("overwrite").format("parquet").saveAsTable(driftTable(name))
  }

  private def driftTable(name: String) = s"${name}_drift"

  /** (n, mean_d2, p95_d2) of squared nearest-centroid distance — the
    * quantization-error summary both [[writeIndex]] (baseline) and
    * [[driftStats]] (per batch) compute. Map-only: the kCoarse×dim
    * centroid matrix rides the plan as a literal.
    */
  private def quantStats(df: DataFrame, vecCol: String,
      coarse: Array[Array[Double]]): DataFrame = {
    val cents = typedLit(coarse.map(_.toSeq).toSeq)
    df.select(graft.functions.CentroidExpressions
        .minCentroidDist(col(vecCol), cents).as("d2"))
      .agg(count(lit(1)).as("n"), avg(col("d2")).as("mean_d2"),
        percentile_approx(col("d2"), lit(0.95), lit(10000)).as("p95_d2"))
  }

  /** Quantization-drift report for a batch against the FROZEN quantizer:
    * the batch's squared-assignment-distance stats next to the
    * build-time baseline, plus their mean ratio. Frozen centroids are
    * the deliberate design (appends stay deterministic and O(delta));
    * this is the monitoring that says WHEN the freeze has gone stale —
    * retrain offline and [[writeIndex]] anew once the ratio drifts past
    * your tolerance (a distribution shift shows up as ratio >> 1: new
    * vectors land far from every frozen centroid, recall decays).
    * O(|delta|) map-only pass + a one-row baseline read; never rescans
    * the corpus.
    */
  def driftStats(delta: DataFrame, vecCol: String, name: String): DataFrame = {
    val spark = delta.sparkSession
    val base = spark.table(driftTable(name)).select(
      col("n").as("base_n"), col("mean_d2").as("base_mean_d2"),
      col("p95_d2").as("base_p95_d2"))
    quantStats(delta.select(col(vecCol).as("vec")), "vec",
        centroids(spark, name))
      .crossJoin(broadcast(base))
      .withColumn("drift_ratio", col("mean_d2") / col("base_mean_d2"))
  }

  /** The frozen coarse centroids, cell-ordered. */
  def centroids(spark: SparkSession, name: String): Array[Array[Double]] =
    spark.table(centsTable(name)).orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** Fold a batch of new vectors in: gate out already-indexed ids
    * (replay no-op), assign against the frozen centroids (map-only),
    * append. O(|delta| · kCoarse) compute, no index rewrite.
    */
  def appendVectors(delta: DataFrame, idCol: String, vecCol: String,
      name: String): Unit = {
    val spark = delta.sparkSession
    recover(spark, name)
    val before = graft.Blocks.persistedIds(spark)
    val fresh = delta
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .join(spark.table(idsTable(name)), Seq("id"), "left_anti")
      .localCheckpoint() // cut the ids-table read→write lineage
    // Replay fast path (guide §6 write cadence, the [[graft.etl
    // .IncrementalAgg.appendDelta]] precedent): a fully-gated batch has
    // nothing to write — skip the centroid collect and both zero-row
    // bucketed write jobs (+ their commit/catalog round trips) instead
    // of paying 3 jobs to append nothing. Table content is identical
    // either way; the head(1) probe reads the checkpoint blocks.
    if (fresh.head(1).nonEmpty) {
      val assigned = fresh.withColumn("cell",
        KMeans.assignExpr(col("vec"), centroids(spark, name)))
      graft.sources.Io.appendBucketed(assigned, cellsTable(name))
      graft.sources.Io.appendBucketed(fresh.select("id"), idsTable(name))
    }
    graft.Blocks.releaseSince(spark, before)
  }

  /** Top-k neighbors for an external query set, probing each query's
    * `nprobe` nearest cells. `nprobe = kCoarse` searches every cell —
    * exact by construction (the cells partition the corpus), which is
    * what the driver query oracles; restricted probes are the scale
    * path, recall-spec'd like the other ANN surfaces. Candidates fold
    * through max(cosine) per (query, neighbor) — idempotent, so the
    * crash-window duplicates described above cannot double-rank.
    */
  def topK(spark: SparkSession, queries: DataFrame, idCol: String, vecCol: String,
      name: String, k: Int, nprobe: Int): DataFrame = {
    recover(spark, name)
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents = centroids(spark, name)
    val probes = IvfPq.probeSet(spark, qRows, cents, nprobe)
      .select(col("query_id"), col("__cl").as("cell"))
    // The probed cells are a driver-side constant: push them into the
    // scan as a literal IN so bucket pruning + parquet min/max pruning
    // fire — the broadcast join alone would filter only AFTER reading
    // the entire (id, vec, cell) table, vectors included.
    val probedCells = IvfPq.probedCellIds(qRows, cents, nprobe)
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("__qv"), Similarity.norm(col(vecCol)).as("__qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    spark.table(cellsTable(name))
      .filter(col("cell").isin(probedCells: _*))
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"), col("__qn"),
        graft.functions.roundStable(
          Similarity.dot(col("__qv"), col("vec")) /
            (col("__qn") * Similarity.norm(col("vec"))), 4).as("cosine"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Fold the per-append file accumulation on `_cells`/`_ids` back to a
    * bounded file count — [[graft.sources.Io.appendBucketed]] adds a
    * file set per batch forever, so a year of micro-batches without this
    * is the small-files problem per bucket. Same crash-safe swap as
    * every other incremental surface ([[graft.sources.Io
    * .rebuildBucketed]]); reads and writes heal the swap window via
    * [[recover]] on entry.
    *
    * Also where the append crash window's orphans die: cells land BEFORE
    * ids (ids are the commit marker), so a crash between the two plus a
    * replay leaves duplicate cell rows that [[topK]] tolerates by
    * max-folding — the compacted table keeps exactly one row per id.
    * The repartition aligns shuffle partitions with the bucket hash
    * (both Murmur3 pmod buckets), so the rebuild writes one file per
    * bucket, not tasks × buckets.
    */
  def compactCells(spark: SparkSession, name: String): Unit = {
    recover(spark, name)
    Seq(cellsTable(name), idsTable(name)).foreach { t =>
      val (buckets, bucketCols, _) =
        org.apache.spark.sql.GraftShims.bucketSpec(spark, t).getOrElse(
          throw new IllegalStateException(s"$t is not bucketed — not ours"))
      val folded = spark.table(t).dropDuplicates("id")
        .repartition(buckets, col(bucketCols.head))
      graft.sources.Io.rebuildBucketed(spark, t, folded, bucketCols.head, buckets)
    }
  }

  /** Heal a crash inside [[compactCells]]'s swap windows. Idempotent. */
  def recover(spark: SparkSession, name: String): Unit = {
    graft.sources.Io.recoverRebuild(spark, cellsTable(name))
    graft.sources.Io.recoverRebuild(spark, idsTable(name))
  }
}
