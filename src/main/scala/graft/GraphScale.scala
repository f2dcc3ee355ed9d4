package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rung for the ITERATIVE graph family (q106/q376 PageRank,
  * q146 HITS, q86's CC core, q163 label propagation): the 100 TB claims
  * for these operators rest on plan shape (one keyed shuffle per round,
  * lineage re-rooted, prior round released); this main MEASURES the
  * claim one decade above the driver's sf0.1 — builder-owned synthetic
  * edges (spark.range + hash endpoints with a planted 1%-of-edges hub,
  * NEVER the read-only driver testdata), the same operator calls as the
  * registered queries, at base E and factor×E.
  *
  * Evidence recorded in SURVEY §5: cold seconds per ROUND at each scale
  * (≤ ~linear growth in E = the pass bar) and the executed-plan string
  * length of the returned frame at both scales and at two different
  * round counts (constant = re-rooting holds; the naive loop's plan
  * doubles per round and OOMs on the STRING before data moves).
  *
  * Usage: runMain graft.GraphScale [baseEdges] [factor] [iters]
  */
object GraphScale {

  /** Hash-endpoint random digraph over n/10 nodes with a planted hub
    * (1% of edges point at node 0 — the power-law skew case the salted
    * paths exist for). Deterministic, partition-independent. */
  private def edges(spark: SparkSession, n: Long): DataFrame = {
    val nodes = math.max(n / 10, 10L)
    spark.range(n).select(
      pmod(xxhash64(col("id")), lit(nodes)).cast("string").as("src"),
      when(pmod(col("id"), lit(100)) < 1, lit("0"))
        .otherwise(pmod(xxhash64(col("id") + n), lit(nodes)).cast("string"))
        .as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(1000000L)
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    def planLen(df: DataFrame): Int = df.queryExecution.executedPlan.toString.length

    def run(name: String)(f: DataFrame => DataFrame): Unit = {
      val rows = Seq(base, base * factor).map { n =>
        val before = Blocks.persistedIds(spark)
        val e = edges(spark, n)
        val t0 = System.nanoTime()
        val out = f(e)
        val cnt = out.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val pl = planLen(out)
        Blocks.hardReset(spark, before)
        System.gc()
        (n, dt, dt / iters, cnt, pl)
      }
      val (n1, t1, r1, _, p1) = rows.head
      val (n2, t2, r2, _, p2) = rows.last
      println(f"[graphscale] $name%-16s E=$n1%9d cold=$t1%7.1fs perRound=$r1%6.2fs plan=$p1%6d | " +
        f"E=$n2%10d cold=$t2%7.1fs perRound=$r2%6.2fs plan=$p2%6d | growth=${t2 / t1}%5.2fx (linear=$factor%d.00x)")
    }

    println(s"[graphscale] base=$base factor=$factor iters=$iters cpus=${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}")
    // constant-plan-in-rounds check: same scale, 2 vs 2*iters rounds
    locally {
      val e = edges(spark, base)
      val pShort = planLen(operators.PageRank.run(e, "src", "dst", iters = 2))
      val pLong = planLen(operators.PageRank.run(e, "src", "dst", iters = 2 * iters))
      println(f"[graphscale] plan-size in rounds: ${2}r=$pShort ${2 * iters}r=$pLong (re-rooted => ~equal)")
      Blocks.hardReset(spark, Set.empty)
    }
    run("pagerank")(e => operators.PageRank.run(e, "src", "dst", iters = iters))
    run("pagerank_dang")(e => operators.PageRank.run(e, "src", "dst", iters = iters,
      redistributeDangling = true))
    run("hits")(e => operators.Hits.run(e, "src", "dst", iters = iters))
    run("labelprop")(e => operators.LabelProp.run(e, "src", "dst", rounds = iters))
    run("conn_comp")(e => operators.ConnectedComponents.minLabel(e, "src", "dst"))
    // §5.1's decision-rule evidence one decade up: salting is pure tax
    // on a single box (no straggler to win back) — re-measured here at
    // 10× the r9 hubscale graph so the "flip saltBuckets only when one
    // hub key exceeds a task's budget ON A CLUSTER" rule rests on
    // current numbers, not a 200k-node memory
    run("pagerank_salt8")(e => operators.PageRank.run(e, "src", "dst",
      iters = iters, saltBuckets = 8))
    run("hits_salt8")(e => operators.Hits.run(e, "src", "dst",
      iters = iters, saltBuckets = 8))
    spark.stop()
  }
}
