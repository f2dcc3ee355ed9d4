package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so Verify, Bench, and tests agree.
  *
  * - `nanosAsLong`: the testdata's `events.ts` is TIMESTAMP(NANOS);
  *   Spark 4 refuses it unless read as raw longs ([[Tables.events]]
  *   converts back to a timestamp).
  * - AQE on: runtime coalescing + skew-join handling is the 100 TB
  *   posture; it costs nothing locally.
  * - UTC so timestamp math matches the DuckDB oracle.
  */
object Sessions {
  def local(cpus: String, shufflePartitions: String = "32"): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // runtime bloom-filter pruning of shuffle-join probe sides — free
      // win for selective fact-dim joins at scale
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // PINNED (default true upstream, but load-bearing here): q386's
      // watermark-expiry oracle needs the no-data micro-batch that runs
      // after a watermark advance to EVICT expired dedup state before
      // the next data batch — dropDuplicatesWithinWatermark only
      // guarantees dedup WITHIN the horizon, so with this off, state
      // could legally linger and the "2 survivors per key" gate would
      // depend on best-effort eviction timing.
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
