package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection: dedup N NEW documents against
  * an existing corpus WITHOUT recomputing the world.
  *
  * The production LLM-pipeline shape is a steady trickle of fresh
  * documents arriving against a many-TB corpus whose MinHash state is
  * already known. Recomputing all-corpus pairs per batch is
  * O(corpus·bands) every time; this operator persists the per-document
  * LSH state ONCE as two bucketed tables and then joins only the
  * delta's band rows against it:
  *
  *   index (written once, appended per batch):
  *     <name>_bands (id, band, bh)   bucketed by bh  — LSH candidates
  *     <name>_sets  (id, shh, n_sh)  bucketed by id  — exact verification
  *
  *   per delta batch:
  *     delta bands ⋈ index bands on (band, bh)   → delta-vs-corpus cands
  *     delta bands self-join                     → delta-vs-delta cands
  *     exact merge-scan Jaccard verify against the union of set tables
  *
  * Everything per-document (shingles, signatures, band keys) is
  * deterministic, so the delta's rows are byte-identical to what a
  * full-corpus recompute would produce — the delta join yields EXACTLY
  * the full-corpus pair set restricted to pairs touching the delta
  * (spec-asserted). Bucketing by `bh` means the big index side never
  * re-shuffles: Spark plans the join by shuffling only the (small)
  * delta to the index's bucket layout.
  *
  * Contract: delta ids are disjoint from index ids (append-only id
  * space — the natural property of ingest batches).
  */
object IncrementalDedup {

  private def bandsTable(name: String) = s"${name}_bands"
  private def setsTable(name: String)  = s"${name}_sets"

  /** Drop a managed table AND any stale warehouse directory left behind
    * by a previous process: an in-memory metastore forgets the table
    * between JVMs while its location survives, and `saveAsTable` then
    * fails with LOCATION_ALREADY_EXISTS. Rebuild semantics means both
    * must go.
    */
  private def dropForRebuild(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Build the persistent index over the current corpus (full-rebuild
    * semantics: replaces any previous index of this name). One full
    * scan; `buckets` should be sized so a bucket's band rows fit an
    * executor task (corpus_rows × bands / buckets).
    */
  def writeIndex(df: DataFrame, idCol: String, textCol: String, name: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32, buckets: Int = 8): Unit = {
    dropForRebuild(df.sparkSession, setsTable(name))
    dropForRebuild(df.sparkSession, bandsTable(name))
    val sets = NGramJaccard.shingleSets(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.sources.Io.writeBucketed(
      sets.select(col(idCol).as("id"), col("shh"), col("n_sh")),
      setsTable(name), "id", buckets)
    graft.sources.Io.writeBucketed(
      MinHashLsh.bandRows(sets, idCol, numHashes, bands),
      bandsTable(name), "bh", buckets)
    sets.unpersist()
  }

  /** Fold a verified batch into the index so the NEXT delta sees it.
    * Append-only on both tables (bucketed appends keep the layout).
    */
  def appendToIndex(delta: DataFrame, idCol: String, textCol: String, name: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32): Unit = {
    val sets = NGramJaccard.shingleSets(delta, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sets.select(col(idCol).as("id"), col("shh"), col("n_sh"))
      .write.mode("append").format("parquet").saveAsTable(setsTable(name))
    MinHashLsh.bandRows(sets, idCol, numHashes, bands)
      .write.mode("append").format("parquet").saveAsTable(bandsTable(name))
    sets.unpersist()
  }

  /** All near-dup pairs touching the delta: delta-vs-index plus
    * delta-vs-delta, exact-verified at `minJaccard`. Output is
    * (id_a, id_b, jaccard) with id_a < id_b — the same contract as
    * [[MinHashLsh.similarPairs]], restricted to pairs with at least one
    * delta endpoint.
    */
  def deltaPairs(spark: SparkSession, delta: DataFrame, idCol: String, textCol: String,
      name: String, minJaccard: Double,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dSets = NGramJaccard.shingleSets(delta, idCol, textCol, n).persist(level)
    val dBands = MinHashLsh.bandRows(dSets, idCol, numHashes, bands).persist(level)
    val iBands = spark.table(bandsTable(name))

    // delta-vs-corpus: only the delta side shuffles (index is bucketed
    // on bh); delta-vs-delta: banded self-join within the batch
    val cross = dBands.as("d").join(iBands.as("i"), Seq("band", "bh"))
      .select(least(col("d.id"), col("i.id")).as("id_a"),
        greatest(col("d.id"), col("i.id")).as("id_b"))
    val within = dBands.as("a").join(dBands.as("b"), Seq("band", "bh"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val cand = cross.union(within).distinct()

    // verification needs both endpoints' shingle state: delta rows from
    // this batch, corpus rows from the persisted sets table
    val allSets = spark.table(setsTable(name))
      .unionByName(dSets.select(col(idCol).as("id"), col("shh"), col("n_sh")))
    val out = NGramJaccard.verifyExact(
      cand, allSets.withColumnRenamed("id", idCol), idCol, minJaccard)
      .localCheckpoint()
    dBands.unpersist()
    dSets.unpersist()
    out
  }
}
