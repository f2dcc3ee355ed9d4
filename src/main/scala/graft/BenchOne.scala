package graft

/** Isolated per-query bench — the triage tool for driver-artifact
  * anomalies (q104 in r8; q135/q146/q83 in r9) and, since r15, the
  * worker side of [[Bench]]'s FRESH-JVM RE-MEASURE LANE: `Bench` times
  * ~385 queries in ONE JVM, so a neighbor's GC/cleaner debt or
  * once-per-process cost can land inside an innocent query's window,
  * and an in-process "recold" can never prove what the true cold is.
  * This main runs ONLY the queries named in argv or `SPARK_GRAFT_ONLY`
  * (comma-separated) in a fresh session, cold then warm, and prints one
  * JSON line per query:
  *
  * {{{
  * for q in q135_containment q146_hits q83_curation; do
  *   SPARK_GRAFT_ONLY=$q sbt "runMain graft.BenchOne"
  * done
  * }}}
  *
  * An isolated number far below the bench artifact's number for the same
  * query ⇒ bench-context interference, not the query; far above ⇒ the
  * query itself regressed.
  *
  * Comparability with the in-bench cold (r15): the same UNTIMED generic
  * infra warm-up Bench runs precedes the timed loop (otherwise the cold
  * here carries ~5 s of Spark-startup JIT the in-bench cold never pays),
  * and each line self-reports `ext` (external load at cold start, own
  * [[ExternalLoad]] estimator — the parent Bench trusts this for the
  * clean/contaminated call on fresh numbers), `load` (raw loadavg) and
  * `gate_cold_sec` (wall seconds the cold spent inside verdict-gate
  * machinery, [[GateCost]]).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // query names from argv OR the env var — an argv-only invocation
    // previously fell through to "run all 380", a silent 15-minute trap
    val only = (args ++ sys.env.getOrElse("SPARK_GRAFT_ONLY", "").split(","))
      .map(_.trim).filter(_.nonEmpty).toSet
    val spark = Sessions.local(cpus, shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("WARN")
    val extLoadEst = new ExternalLoad
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    // same untimed infra warm-up as Bench (scan + exchange + broadcast
    // + SMJ + iterative-loop codegen paths — Bench.infraWarmup) so
    // "cold" means the same thing in both artifacts
    locally {
      val warm0 = Blocks.persistedIds(spark)
      Bench.infraWarmup(spark, sfDir)
      Blocks.releaseSince(spark, warm0): Unit
      System.gc()
      Thread.sleep(100)
    }
    selected.foreach { case (name, fn) =>
      def run(): (Double, Double, Double, Double) = {
        val before = Blocks.persistedIds(spark)
        val load0 = ProcLoad.loadAvg()
        val ext0 = extLoadEst.sample()
        GateCost.drainSec(): Unit
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val gate = math.min(GateCost.drainSec(), dt)
        Blocks.releaseSince(spark, before)
        (dt, ext0, load0, gate)
      }
      val (cold, ext, load, gateCold) = run()
      val (warm, _, _, _) = run()
      println(f"""{"metric":"isolated","query":"$name","cold":$cold%.3f,"warm":$warm%.3f,"ext":$ext%.1f,"load":$load%.1f,"gate_cold_sec":$gateCold%.3f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
