package graft

/** Measured graft-side counterpart to `tools/measure_baseline.py`: runs
  * the reference-equivalent end-to-end pipeline
  * ([[etl.AirQualityPipeline.run]] — synth extract → clean/features →
  * daily summary → parquet land → validation gate) at the reference's
  * NATIVE volume (5 stations × 90 days × 24 h = 10,800 rows) and at the
  * 16× volume (80 stations — the sf0.1-equivalent the baseline harness
  * scales the reference to), printing one JSON line of wall seconds.
  * Together the two artifacts make BASELINE.md a measurement from one
  * box instead of a README prose claim.
  *
  * Usage: runMain graft.BaselineTwin
  */
object BaselineTwin {
  def main(args: Array[String]): Unit = {
    val t00 = System.nanoTime()
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val startup = (System.nanoTime() - t00) / 1e9 // session build only
    def run(stations: Int, tag: String): Double = {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_btwin_$tag").toString
      val t0 = System.nanoTime()
      val validated = etl.AirQualityPipeline.run(spark, out,
        stations = stations, hours = 90 * 24)
      validated.count()
      (System.nanoTime() - t0) / 1e9
    }
    // the FIRST pass is the honest cold number (it carries plan
    // compilation + process JIT on top of the pipeline); the repeats
    // are the steady state a scheduled daily run would see
    val coldNative = run(5, "native_cold")
    val native = run(5, "native")
    val x16 = run(80, "x16")
    println(f"""{"metric":"baseline_twin","unit":"sec","startup_sec":$startup%.2f,"native_cold_sec":$coldNative%.2f,"native_sec":$native%.2f,"x16_sec":$x16%.2f,"native_rows":10800,"x16_rows":172800}""")
    spark.stop()
  }
}
