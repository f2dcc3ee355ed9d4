package graft

import org.apache.spark.sql.functions._

/** ANN-ladder evidence main (the DedupScale discipline): the
  * choose-your-index selection table at two corpus sizes, with wall
  * time per rung measured in isolation — the numbers SURVEY §5 quotes.
  * Run: sbt "runMain graft.AnnScale" (defaults to sf0.001 + sf0.01).
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = Sessions.local("32", shufflePartitions = "32")
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val emb = Tables.embeddings(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = emb.count()
      val t0 = System.nanoTime()
      val table = sim.AnnLadder.selectionTable(emb, "vec_id", "embedding",
        dim = 64, isQuery = col("vec_id") < 10, k = 5)
      val rows = table.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[annladder] dir=$dir corpus=$n%d queries=10 k=5 total=${secs}%7.2f s (fit+search+recall all rungs)")
      rows.foreach { r =>
        println(f"[annladder]   ${r.getString(1)}%-22s recall@5=${r.getDouble(2)}%6.4f scanned/q=${r.getDouble(3)}%10.1f scanB/vec=${r.getDouble(4)}%6.1f rescore/q=${r.getDouble(5)}%6.1f cost=${r.getDouble(6)}%10.1f KB/q")
      }
      emb.unpersist()
      Blocks.releaseAll(spark)
    }
    spark.stop()
  }
}
