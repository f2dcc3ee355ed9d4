package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed synthetic air-quality sensor generator — the reference's
  * extract phase (airflow_dag_calidad_aire.py:40-132) rebuilt on
  * `spark.range`.
  *
  * The reference loops stations × hours in driver Python; here the row id
  * space is a single `range` so generation scales linearly with executors
  * (100 TB of synthetic data = bigger range, same code). "Noise" comes
  * from xxhash64 of (seed, row id) instead of an RNG — deterministic,
  * partition-count-independent, and reproducible, unlike `rand()` whose
  * draw order depends on partitioning.
  */
object Synth {

  /** Uniform [0,1) double derived from hashed row id. */
  private def u01(id: org.apache.spark.sql.Column, salt: Int, seed: Long) =
    (pmod(xxhash64(id, lit(salt), lit(seed)), lit(1000000L)).cast("double")) / lit(1000000.0)

  /** @param stations number of sensor stations
    * @param hours    hours of history per station
    * @param start    first timestamp (epoch seconds)
    */
  def airQuality(spark: SparkSession, stations: Int, hours: Int,
      start: Long = 1704067200L /* 2024-01-01 */, seed: Long = 42L): DataFrame = {
    val ids = spark.range(stations.toLong * hours)
    val st  = col("id") % stations
    val hr  = expr(s"id DIV $stations") // hour index (integer division — `/` would give fractional hours)
    val ts  = timestamp_seconds(lit(start) + hr * 3600)
    val hourOfDay = (hr % 24).cast("int")
    val dayIdx    = (hr / 24).cast("int")
    // reference dag:76-83 — rush-hour and weekend factors
    val hourFactor = when(hourOfDay.between(7, 9) || hourOfDay.between(17, 19), 1.5)
      .when(hourOfDay.between(0, 5), 0.7).otherwise(1.0)
    val weekdayFactor = when(((dayIdx + 0) % 7) >= 5, 0.8).otherwise(1.0)
    // per-station baselines (dag:66-70), hashed not sampled
    def base(salt: Int, lo: Double, hi: Double) =
      lit(lo) + u01(st, salt, seed) * lit(hi - lo)
    def noise(salt: Int, scale: Double) =
      (u01(col("id"), salt, seed) - lit(0.5)) * lit(2.0 * scale)
    def clampLo(c: org.apache.spark.sql.Column) = greatest(c, lit(0.0))
    val pm25 = clampLo(base(1, 15, 40) * hourFactor * weekdayFactor + noise(11, 5))
    ids.select(
      col("id").as("reading_id"),
      concat(lit("station_"), st).as("station"),
      ts.as("ts"),
      // 2% missing simulation in pm25 AND pm10 (dag:96-100), deterministic
      when(u01(col("id"), 99, seed) < 0.02, lit(null)).otherwise(pm25).as("pm25"),
      when(u01(col("id"), 98, seed) < 0.02, lit(null))
        .otherwise(clampLo(base(2, 25, 60) * hourFactor * weekdayFactor + noise(12, 10))).as("pm10"),
      clampLo(base(3, 20, 50) * hourFactor * weekdayFactor + noise(13, 8)).as("no2"),
      clampLo(base(4, 30, 60) * (lit(2.0) - hourFactor) + noise(14, 10)).as("o3"),
      clampLo(base(5, 0.3, 1.2) * hourFactor * weekdayFactor + noise(15, 0.2)).as("co"),
      (lit(10.0) + u01(col("id"), 16, seed) * 20.0).as("temperature"),
      (lit(30.0) + u01(col("id"), 17, seed) * 50.0).as("humidity"))
  }
}
