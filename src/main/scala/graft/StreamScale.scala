package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rung for the INCREMENTAL-STATE family (the GraphScale twin for
  * the D surfaces): the 100 TB claim behind q70/q72/q79/q86/q87/q381 is
  * that folding a micro-batch costs O(|delta|) — independent of how much
  * state has accumulated — with log growth bounded by actual merges and
  * compaction amortized. This main MEASURES that claim by folding ~100
  * micro-batches through each of the four state disciplines on
  * builder-owned synthetic streams (spark.range + hash-derived payloads,
  * NEVER the read-only driver testdata), timing EVERY batch:
  *
  *  - per-batch wall time, mean of the FIRST 10 vs the LAST 10 folds —
  *    flat (ratio ≈ 1) is the pass bar; a fold that re-reads its whole
  *    state would grow linearly in the batch index;
  *  - state/log rows at the end — bounded by keys touched / actual
  *    merges, not by batches × delta;
  *  - the reader's executed-plan string length at N/2 and N batches —
  *    constant (the fold is a scan + agg over the log, never a
  *    per-batch plan accretion).
  *
  * Surfaces: [[etl.IncrementalAgg]] (appendDelta + compact every 10),
  * [[dedup.IncrementalDedup]] (appendToIndex), [[operators.IncrementalCC]]
  * (mergeEdges), [[sim.IncrementalAnn]] (appendVectors + compactCells
  * every 20) — the exact code the streaming sinks (D8/D3-class, D12's
  * sibling, q86, D10) run per batch.
  *
  * Usage: runMain graft.StreamScale [batches] [surface,...]
  * Results recorded in SURVEY §5.4; rerun on an idle box to reproduce.
  */
object StreamScale {

  private def meanSec(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0 else xs.sum / xs.size

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(100)
    val only = args.drop(1).headOption
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[streamscale] batches=$batches cpus=${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}")

    def planLen(df: DataFrame): Int =
      df.queryExecution.executedPlan.toString.length

    /** Fold `batches` deltas through one surface; report the flatness
      * evidence. `fold` runs batch b; `reader` is the state read whose
      * plan must stay constant; `stateRows` the final log size.
      */
    def run(name: String, deltaRows: Long)(setup: => Unit)(
        fold: Long => Unit)(reader: () => DataFrame): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      val before = Blocks.persistedIds(spark)
      setup
      val times = new scala.collection.mutable.ArrayBuffer[Double](batches)
      var planHalf = 0
      val trace = sys.env.get("SPARK_GRAFT_TRACE").contains("1")
      for (b <- 0L until batches.toLong) {
        val t0 = System.nanoTime()
        fold(b)
        times += (System.nanoTime() - t0) / 1e9
        if (trace) println(f"[streamscale]   $name batch=$b%3d ${times.last}%6.3fs")
        if (b == batches / 2 - 1) planHalf = planLen(reader())
      }
      val planEnd = planLen(reader())
      val rows = reader().count()
      val first = meanSec(times.take(10).toSeq)
      val last = meanSec(times.takeRight(10).toSeq)
      println(f"[streamscale] $name%-18s delta=$deltaRows%6d batches=$batches%4d " +
        f"first10=${first}%6.3fs last10=${last}%6.3fs ratio=${last / math.max(first, 1e-9)}%5.2f " +
        f"state_rows=$rows%9d plan@${batches / 2}=$planHalf%6d plan@$batches=$planEnd%6d")
      Blocks.hardReset(spark, before)
      System.gc()
    }

    // ---- incremental agg: 1000-key space, 20k rows per delta ---------
    val aggKeys = 1000L
    run("incremental_agg", 20000L) {
      etl.IncrementalAgg.writeState(
        spark.range(20000L).select(
          pmod(xxhash64(col("id")), lit(aggKeys)).cast("string").as("k"),
          (pmod(xxhash64(col("id") + 7), lit(1000)).cast("double") / 10.0)
            .as("v")),
        Seq("k"), "v", "ss_agg", batchId = 0L)
    } { b =>
      if (b > 0) {
        etl.IncrementalAgg.appendDelta(
          spark.range(20000L).select(
            pmod(xxhash64(col("id") + lit(b * 20000L)), lit(aggKeys))
              .cast("string").as("k"),
            (pmod(xxhash64(col("id") + lit(b * 20000L + 7)), lit(1000))
              .cast("double") / 10.0).as("v")),
          Seq("k"), "v", "ss_agg", batchId = b)
        if ((b + 1) % 10 == 0) etl.IncrementalAgg.compact(spark, "ss_agg")
      }
    } { () => etl.IncrementalAgg.read(spark, "ss_agg") }

    // ---- incremental dedup: 1k docs per delta, 500-token vocab -------
    def docs(b: Long, n: Long): DataFrame =
      spark.range(n).select((lit(b * n) + col("id")).as("doc_id"),
        concat_ws(" ", (0 until 30).map(j =>
          pmod(xxhash64(col("id") * 31 + lit(j * 1315423911L + b)), lit(500))
            .cast("string")).toIndexedSeq: _*).as("text"))
    run("incremental_dedup", 1000L) {
      dedup.IncrementalDedup.writeIndex(docs(0L, 1000L), "doc_id", "text",
        "ss_dedup")
    } { b =>
      if (b > 0) {
        dedup.IncrementalDedup.appendToIndex(docs(b, 1000L), "doc_id",
          "text", "ss_dedup")
        // deployed shape (r14, compactIndex): the first run WITHOUT a
        // cadence measured the gate scan growing 1.95 s -> 6.6 s per
        // batch over 100 appends — pure file accumulation (one file
        // per bucket per batch), not row volume; see §5.4
        if ((b + 1) % 10 == 0)
          dedup.IncrementalDedup.compactIndex(spark, "ss_dedup")
      }
    } { () => spark.table("ss_dedup_sets") }

    // ---- incremental CC: 20k bounded families, 5k edges per delta ----
    // cluster-shaped edges (the operator's actual workload: dedup
    // families, not a near-percolation random graph): each edge joins
    // two members of one hash-picked <=32-member family, so components
    // stay small-diameter while batches keep merging within them. The
    // first generator drew uniform random endpoints over 50k nodes —
    // at mean degree ~1 (the percolation threshold) that builds ONE
    // giant long-chain component whose diameter blows past minLabel's
    // halving cap by design, which is a property of the graph, not of
    // the incremental fold under test.
    //
    // Each batch touches a 500-family WINDOW (rotating over all 20k,
    // so windows repeat every 40 batches and merges keep accumulating
    // within families): mergeEdges' contract is O(delta + AFFECTED) —
    // the affected set (touched components' members) must be bounded
    // by the micro-batch contract for the flat claim to be the
    // operator's to keep. The wide-touch contrast run (every batch
    // touching ~10k families; see §5.4) measures cost growing exactly
    // as the affected member pull grows (4.7 s -> 11.7 s while
    // families fill toward 32 members) and NOT with total log size —
    // the distinction between O(affected) and O(state).
    val families = 500L
    def ccEdges(b: Long, n: Long): DataFrame = {
      val fam = pmod(xxhash64(col("id") + lit(b * n)), lit(families)) +
        lit((b % 40) * families)
      spark.range(n).select(
        (fam * 32 + pmod(xxhash64(col("id") + lit(b * n + 1)), lit(32)))
          .as("a"),
        (fam * 32 + pmod(xxhash64(col("id") + lit(b * n + 7)), lit(32)))
          .as("b"))
        .filter(col("a") =!= col("b"))
    }
    run("incremental_cc", 5000L) {
      operators.IncrementalCC.writeLabels(ccEdges(0L, 5000L), "a", "b", "ss_cc")
    } { b =>
      if (b > 0) {
        operators.IncrementalCC.mergeEdges(spark, ccEdges(b, 5000L),
          "a", "b", "ss_cc").count(): Unit
        // the log is min-fold append-only: without the cadence the
        // endpoint/member lookups scan every appended file forever —
        // compaction is PART of the deployment recipe, and the
        // harness measures the deployed shape (first run without it:
        // per-batch 5.8 s -> 18.8 s at 100 batches; see §5.4)
        if ((b + 1) % 10 == 0)
          operators.IncrementalCC.compactLabels(spark, "ss_cc")
      }
    } { () => operators.IncrementalCC.readLabels(spark, "ss_cc") }

    // ---- incremental ANN: 16-dim vectors, 5k per delta ---------------
    def vecs(b: Long, n: Long): DataFrame =
      spark.range(n).select((lit(b * n) + col("id")).as("vec_id"),
        transform(sequence(lit(0), lit(15)), i =>
          (pmod(xxhash64(col("id") + lit(b * n) + i * 7919), lit(1000))
            .cast("double") / 500.0 - 1.0).cast("float")).as("embedding"))
    run("incremental_ann", 5000L) {
      sim.IncrementalAnn.writeIndex(vecs(0L, 5000L), "vec_id", "embedding",
        "ss_ann", kCoarse = 8, iters = 3, buckets = 4)
    } { b =>
      if (b > 0) {
        sim.IncrementalAnn.appendVectors(vecs(b, 5000L), "vec_id",
          "embedding", "ss_ann")
        if ((b + 1) % 20 == 0) sim.IncrementalAnn.compactCells(spark, "ss_ann")
      }
    } { () => spark.table("ss_ann_cells") }

    spark.stop()
  }
}
