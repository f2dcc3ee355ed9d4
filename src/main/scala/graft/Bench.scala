package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every registered query at the given SF dir, printed as
  * ONE JSON line. Each query runs twice: `queries` holds the COLD first
  * run (comparable across rounds — includes plan compilation and any
  * in-operator materialization) and `warm` the immediate second run
  * (steady-state: codegen cached, shuffle files reusable). `value` stays
  * the cold total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("WARN")
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      // Bound cached-block lifetime per run: the dedup/CC queries return
      // localCheckpoint'd results whose blocks otherwise outlive the query
      // — 65 queries × 2 runs of accumulation degrades later warm runs
      // (storage-memory pressure), poisoning the artifact.
      val before = Blocks.persistedIds(spark)
      val t0 = System.nanoTime()
      // A failed query must surface as an ERROR, not a bogus ~50 ms
      // "timing" that deflates the total and masks the breakage.
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      Blocks.releaseSince(spark, before)
      (dt, err)
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val (cold, errC) = time(fn)
      val (warm, errW) = time(fn)
      (name, cold, warm, errC.orElse(errW))
    }.toSeq
    def js(entries: Seq[(String, Double)]) = entries
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.filter(_._4.isDefined)
    failed.foreach { case (n, _, _, e) =>
      System.err.println(s"[bench] $n FAILED: ${e.get}")
    }
    val ok = results.filter(_._4.isEmpty)
    val total = ok.map(_._2).sum
    val totalWarm = ok.map(_._3).sum
    val errJs = failed.map(f => "\"" + f._1 + "\"").mkString("[", ",", "]")
    val head = s""""unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_errors":${failed.size},"errors":$errJs,"total_warm":${f"$totalWarm%.3f"},"value":${f"$total%.3f"}"""
    // Full per-query detail first; the artifact capture keeps only a ~2 KB
    // TAIL of stdout, so this line may truncate — it exists for local logs
    // and judge re-runs.
    println(s"""{"metric":"total_full",$head,"queries":${js(ok.map(r => (r._1, r._2)))},"warm":${js(ok.map(r => (r._1, r._3)))}}""")
    // The LAST line is short enough (~1 KB) to always survive the tail
    // capture intact and parse: headline totals + the top-10 cold and warm
    // queries — round-over-round per-query comparability can't be eaten by
    // truncation again.
    val topCold = ok.sortBy(-_._2).take(10).map(r => (r._1, r._2))
    val topWarm = ok.sortBy(-_._3).take(10).map(r => (r._1, r._3))
    println(s"""{"metric":"total",$head,"queries":${js(topCold)},"warm_top":${js(topWarm)}}""")
    spark.stop()
  }
}
