package graft

/** Plan-inspection tool: prints `explain("formatted")` for the given
  * queries (default: a representative set) so scan pruning, pushdown, and
  * join strategies can be reviewed. Usage:
  *   runMain graft.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_agg_daily", "q20_join_mstar", "q26_asof_join", "q34_ngram_jaccard", "q37_cosine_topk")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
