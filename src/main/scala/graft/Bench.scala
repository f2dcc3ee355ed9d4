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
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      (name, time(fn), time(fn)) // (query, cold, warm)
    }
    def js(sel: ((String, Double, Double)) => (String, Double)) = results
      .map { r => val (k, v) = sel(r); s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val cold = js { case (k, c, _) => (k, c) }
    val warm = js { case (k, _, w) => (k, w) }
    val total = results.map(_._2).sum
    val totalWarm = results.map(_._3).sum
    // Headline fields go LAST: the driver's artifact capture has been
    // observed to keep only the TAIL of one long line, so the per-query
    // maps lead and the cold/warm totals close the object — truncation
    // can eat detail but never the headline numbers.
    println(s"""{"metric":"total","unit":"sec","sf":"$sfDir","queries":$cold,"warm":$warm,"n_queries":${results.size},"total_warm":$totalWarm,"value":$total}""")
    spark.stop()
  }
}
