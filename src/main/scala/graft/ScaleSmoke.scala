package graft

import org.apache.spark.sql.functions._

/** Scale smoke: run the full reference pipeline (generate → clean →
  * features → daily summary → validate) over an arbitrarily large
  * synthetic row count, printing per-stage timings. This is the local
  * stand-in for the 100 TB question — the row count scales with the
  * argument while the code path stays identical to the sf tests.
  *
  * Usage: runMain graft.ScaleSmoke [stations] [hours]
  *   e.g. 200 x 8760 = 1.75M readings; 2000 x 8760 = 17.5M.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val stations = args.headOption.map(_.toInt).getOrElse(500)
    val hours    = args.drop(1).headOption.map(_.toInt).getOrElse(24 * 365)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val n = stations.toLong * hours
    println(s"[scale] rows = $n ($stations stations x $hours hours)")
    val raw = etl.Synth.airQuality(spark, stations, hours)
    time("generate+count")(raw.count())
    val outDir = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val transformed = time("transform + land parquet") {
      etl.AirQualityPipeline.landThenRead(spark, etl.AirQualityPipeline.transform(raw), outDir)
    }
    time("daily summary")(etl.AirQualityPipeline.dailySummary(transformed).count())
    time("validate")(etl.AirQualityPipeline.validate(transformed).collect())
    time("dedup exact")(etl.Clean.dedupExact(raw, Seq("ts", "station"), Seq("reading_id")).count())
    time("rolling mean window")(
      etl.Aggregates.rollingMeanCentered6(raw, "station", Seq("ts"), "pm10", "r").count())
    spark.stop()
  }
}
