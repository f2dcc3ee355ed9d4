package graft

/** Round-12 triage for the three bench-context errors
  * (q165/q191/q98 — all pass isolated): replays the bench's exact
  * per-query hygiene (hardReset + gc) over the Map-order prefix up to
  * and including the failures, printing the FULL exception for the
  * first failure so the interaction (suspected broadcast-reuse after
  * the between-runs broadcast drain) can be attributed.
  */
object QErrTriage {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val upTo = sys.env.getOrElse("SPARK_GRAFT_UPTO", "q165_vocab_coverage")
    val from = sys.env.getOrElse("SPARK_GRAFT_FROM", "0").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "32")
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq
    val stop = names.indexOf(upTo)
    require(stop >= 0, s"$upTo not registered")
    names.slice(from, stop + 1).foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { pass =>
        val before = Blocks.persistedIds(spark)
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            println(s"[errtriage] $name pass=$pass FAILED: ${e.getClass.getName}: ${e.getMessage}")
            e.getStackTrace.take(12).foreach(f => println(s"[errtriage]   at $f"))
            var c = e.getCause
            while (c != null) {
              println(s"[errtriage] caused by ${c.getClass.getName}: ${c.getMessage}")
              c = c.getCause
            }
            spark.stop(); sys.exit(1)
        }
        Blocks.hardReset(spark, before)
        System.gc(); Thread.sleep(100)
      }
      System.err.println(s"[errtriage] $name ok")
    }
    println("[errtriage] no failure reproduced")
    spark.stop()
  }
}
