package graft

/** Isolated per-query bench — the triage tool for driver-artifact
  * anomalies (q104 in r8; q135/q146/q83 in r9): `Bench` times 147
  * queries in ONE JVM, so a neighbor's GC/cleaner debt can land inside
  * an innocent query's window. This main runs ONLY the queries named in
  * `SPARK_GRAFT_ONLY` (comma-separated; default: all) in a fresh
  * session, cold then warm, and prints one JSON line per query — run it
  * once per query in separate JVMs for genuinely isolated numbers:
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
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    selected.foreach { case (name, fn) =>
      def run(): Double = {
        val before = Blocks.persistedIds(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Blocks.releaseSince(spark, before)
        dt
      }
      val cold = run()
      val warm = run()
      println(f"""{"metric":"isolated","query":"$name","cold":$cold%.3f,"warm":$warm%.3f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
