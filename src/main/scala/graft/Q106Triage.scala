package graft

/** Round-12 attribution harness for the q106_pagerank TRUE warm
  * regression flagged by BENCH_r11 (cold 13.2 / warm 39.9, reproduced
  * serially at recold 12.4 / rewarm 49.5, gc/jit/load ruled out by the
  * bench telemetry). Isolated BenchOne shows NO regression (cold 22.8 /
  * warm 12.5), so the effect needs accumulated in-JVM state.
  *
  * Runs the named query `SPARK_GRAFT_REPS` times (default 6) in one JVM
  * and prints per-run wall time plus the suspects' direct gauges:
  * persisted-RDD count, storage MB in use, cumulative RDD-id counter
  * (proxy for lineage garbage), GC/JIT deltas, and — when
  * `SPARK_GRAFT_POLLUTE=n` is set — first runs `n` other bench queries
  * to reproduce the long-lived-JVM state the full bench has.
  */
object Q106Triage {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "6").toInt
    val pollute = sys.env.getOrElse("SPARK_GRAFT_POLLUTE", "0").toInt
    val target = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q106_pagerank")
    val spark = Sessions.local(cpus, shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("WARN")
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def jitMs(): Long = {
      val b = java.lang.management.ManagementFactory.getCompilationMXBean
      if (b != null && b.isCompilationTimeMonitoringSupported)
        b.getTotalCompilationTime else 0L
    }
    def storageMb(): Long = spark.sparkContext.getExecutorMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum / (1024 * 1024)
    def rddIdCounter(): Int =
      spark.sparkContext.parallelize(Seq(1)).id // fresh id = current counter
    if (pollute > 0) {
      // replicate the bench prefix exactly: Map iteration order, TWO runs
      // per query (cold + warm), same between-runs hygiene as Bench.time
      val others = SparkEntry.queries.view.filter(_._1 != target).take(pollute)
      others.foreach { case (n, fn) =>
        (1 to 2).foreach { _ =>
          val before = Blocks.persistedIds(spark)
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
          Blocks.releaseSince(spark, before)
          System.gc(); Thread.sleep(100)
        }
        System.err.println(s"[pollute] $n done")
      }
    }
    val fn = SparkEntry.queries(target)
    (1 to reps).foreach { i =>
      val before = Blocks.persistedIds(spark)
      val gc0 = gcMs(); val jit0 = jitMs()
      val st0 = storageMb(); val nrdd0 = before.size
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val gcd = (gcMs() - gc0) / 1e3; val jitd = (jitMs() - jit0) / 1e3
      Blocks.releaseSince(spark, before)
      System.gc(); Thread.sleep(100)
      val blocks = org.apache.spark.GraftSparkShims.storageBlocks(spark.sparkContext)
      val byKind = blocks.groupBy(_._1.takeWhile(_ != '_'))
        .map { case (k, bs) => s""""$k":[${bs.size},${bs.map(_._2).sum / 1024}]""" }
        .mkString("{", ",", "}")
      println(f"""{"run":$i,"wall":$dt%.2f,"gc":$gcd%.2f,"jit":$jitd%.2f,"storage0_mb":$st0,"n_persisted0":$nrdd0,"rdd_id":${rddIdCounter()},"resid_blocks_kind_[n,kb]":$byKind}""")
    }
    spark.stop()
  }
}
