package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** Streaming ingest × incremental ANN — the fourth incremental surface's
  * streaming wrapper, closing the family ([[DedupStream]], [[AggStream]],
  * [[DedupStream.toDedupSink]]'s `clusterName` CC composition): an
  * embedding stream lands as micro-batches, each batch is assigned
  * against the FROZEN coarse centroids and appended to the bucketed cell
  * table in O(batch) ([[graft.sim.IncrementalAnn.appendVectors]]), and
  * similarity search ([[graft.sim.IncrementalAnn.topK]]) sees every
  * vector the moment its batch commits.
  *
  * Exactly-once EFFECT under foreachBatch's at-least-once contract by
  * the family's standard argument: the append's id-gate anti-join makes
  * a replayed batch a no-op, and the cells-before-ids write order means
  * a crash between the two can only leave orphan cell rows, which search
  * max-folds away and [[graft.sim.IncrementalAnn.compactCells]]
  * physically removes.
  */
object AnnStream {

  /** Streaming sink: fold a vector stream into the named ANN index. The
    * index must exist — [[graft.sim.IncrementalAnn.writeIndex]] the
    * historical corpus first (centroids are frozen at that point; the
    * stream only ever assigns, never retrains).
    *
    * `compactEvery` > 0 rebuilds the cells/ids tables every that-many
    * batches, bounding the per-append file accumulation; the rebuild is
    * crash-safe (swap + recover-on-entry) and content-preserving, so the
    * cadence composes freely with at-least-once replay.
    */
  def toAnnSink(vectors: DataFrame, idCol: String, vecCol: String,
      name: String, checkpoint: String, compactEvery: Int = 0) =
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sim.IncrementalAnn.appendVectors(batch, idCol, vecCol, name)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          graft.sim.IncrementalAnn.compactCells(batch.sparkSession, name)
      }
}
