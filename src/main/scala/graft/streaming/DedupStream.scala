package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.OutputMode

/** Streaming ingest × incremental dedup — the composition that is the
  * actual production shape of LLM-corpus ingestion: documents arrive as
  * micro-batches; each batch is near-dup-checked against everything seen
  * so far in O(batch), then folded into the persistent MinHash index so
  * the NEXT batch sees it. Nothing ever recomputes corpus-vs-corpus
  * pairs (the reference's batch job, dag:180, re-reads the world every
  * run — this is the streaming upgrade of that stage).
  *
  * Exactly-once EFFECT under foreachBatch's at-least-once contract,
  * without a transaction log, because both halves are idempotent:
  *
  *   - pairs land under `pairsPath/batch=<batchId>` with dynamic
  *     overwrite — a replay rewrites the same directory with the same
  *     rows (every per-document stage is deterministic);
  *   - the index fold is [[graft.dedup.IncrementalDedup.appendToIndex]],
  *     whose anti-join gate appends zero rows for ids already indexed.
  *
  * A replayed batch also emits IDENTICAL pairs despite its docs now
  *  being in the index: same-id candidates are filtered (no self-pairs)
  * and the remaining index-side matches coincide with the within-batch
  * ones, which the candidate distinct() collapses.
  */
object DedupStream {

  /** Streaming sink: wire a document stream (idCol, textCol) into the
    * named incremental-dedup index. The index must exist —
    * [[graft.dedup.IncrementalDedup.writeIndex]] the historical corpus
    * first (an empty corpus is fine).
    */
  def toDedupSink(docs: DataFrame, idCol: String, textCol: String, name: String,
      pairsPath: String, checkpoint: String, minJaccard: Double,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32) =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupBatch(batch, batchId, idCol, textCol, name, pairsPath, minJaccard,
          n, numHashes, bands)
      }

  /** One micro-batch's work, exposed for direct (re)use and testing:
    * delta-join the batch against the index, write the verified pairs
    * under the batch's own partition directory, fold the batch in.
    * Pairs BEFORE append — deltaPairs' self-pair guard plus the
    * overwrite below keep a replay byte-identical either way, but this
    * order keeps the common path cheap (the batch's band rows join only
    * pre-existing index rows).
    */
  def dedupBatch(batch: DataFrame, batchId: Long, idCol: String, textCol: String,
      name: String, pairsPath: String, minJaccard: Double,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32): Unit = {
    val spark = batch.sparkSession
    val pairs = graft.dedup.IncrementalDedup.deltaPairs(
      spark, batch, idCol, textCol, name, minJaccard, n, numHashes, bands)
    pairs.write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(s"$pairsPath/batch=$batchId")
    graft.dedup.IncrementalDedup.appendToIndex(
      batch, idCol, textCol, name, n, numHashes, bands)
  }
}
