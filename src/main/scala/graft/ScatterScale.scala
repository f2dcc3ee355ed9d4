package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the d×d scatter builder at PRODUCTION embedding
  * width: times [[sim.Geometry.pc1Fit]] (one outer-product-aggregate
  * pass + driver-side power iteration) on a synthetic corpus at
  * d = 1024 — the width where the former double-posexplode plan
  * generated n·d² ≈ 10⁶ intermediate rows PER INPUT ROW and stopped
  * being runnable at all. The corpus is deterministic (hash-derived
  * values), so timings are comparable across rounds.
  *
  * Usage: runMain graft.ScatterScale [rows] [dim]   (default 100000 1024)
  */
object ScatterScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val d = args.drop(1).headOption.map(_.toInt).getOrElse(1024)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    // deterministic pseudo-random corpus with one planted high-variance
    // dim (pos 37, 10× the others) so the fit has a known right answer
    val df = spark.range(n.toLong).select(
      transform(sequence(lit(0), lit(d - 1)), i =>
        (pmod(xxhash64(col("id") * 7919 + i), lit(1000)).cast("double")
          / 500.0 - 1.0) *
          when(i === 37, 10.0).otherwise(1.0)).as("v"))
      .persist()
    df.count()
    val t0 = System.nanoTime()
    val (w, share) = sim.Geometry.pc1Fit(df, "v", iters = 10)
    val sec = (System.nanoTime() - t0) / 1e9
    val argmax = w.indices.maxBy(i => math.abs(w(i)))
    println(f"""{"metric":"scatter_scale","rows":$n,"dim":$d,"pc1_fit_sec":$sec%.2f,"planted_dim_recovered":${argmax == 37},"pc1_var_share":$share%.4f}""")
    df.unpersist()
    spark.stop()
  }
}
