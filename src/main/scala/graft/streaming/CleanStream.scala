package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.text.Corpus

/** Streaming ingest × benchmark decontamination — the admission gate a
  * continuously-fed training corpus runs BEFORE anything else sees the
  * data: each arriving micro-batch is screened against the benchmark
  * suite's bloom filter ([[graft.text.Corpus.benchFilter]], built ONCE
  * at stream start — the bench side never recomputes per batch), hits
  * are confirmed exactly, and the batch splits into a clean landing and
  * a quarantine landing.
  *
  * Exactly-once EFFECT under foreachBatch's at-least-once contract by
  * the [[DedupStream]] recipe: each batch owns its `batch=<id>`
  * directory and a replay OVERWRITES it byte-identically (screening is
  * deterministic), so no transaction log is needed. Downstream readers
  * take `spark.read.parquet(cleanDir)` at any time; a batch is visible
  * only after its directory swap completes.
  */
object CleanStream {

  /** Streaming sink: screen each micro-batch of documents against the
    * (static, bounded) benchmark and land clean/contaminated rows under
    * `cleanDir`/`quarantineDir` per-batch directories. Quarantined rows
    * carry the `n_hits`/`contamination` evidence columns.
    */
  def toContaminationSink(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, n: Int, cleanDir: String, quarantineDir: String,
      checkpoint: String, bitsPerItem: Int = 16) = {
    val filter = Corpus.benchFilter(bench, textCol, n, bitsPerItem,
      persist = true)
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        contaminationBatch(filter, batch, batchId, idCol, textCol,
          cleanDir, quarantineDir)
      }
  }

  /** One micro-batch's screening, exposed for direct (re)use and
    * testing: stats over the batch, split, land both sides under the
    * batch's own directories (replay = byte-identical overwrite).
    */
  def contaminationBatch(filter: Corpus.BenchFilter, batch: DataFrame,
      batchId: Long, idCol: String, textCol: String,
      cleanDir: String, quarantineDir: String): Unit = {
    val spark = batch.sparkSession
    val before = graft.Blocks.persistedIds(spark)
    val stats = Corpus.contaminationWith(filter, batch, idCol, textCol)
      .localCheckpoint() // screened once; both splits read the result
    val dirty = stats.filter(col("contaminated"))
    batch.join(dirty.select(col(idCol)), Seq(idCol), "left_anti")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(s"$cleanDir/batch=$batchId")
    batch.join(dirty.select(col(idCol), col("n_hits"), col("contamination")),
        Seq(idCol))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(s"$quarantineDir/batch=$batchId")
    graft.Blocks.releaseSince(spark, before)
  }
}
