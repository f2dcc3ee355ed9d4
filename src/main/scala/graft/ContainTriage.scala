package graft

import org.apache.spark.sql.functions._

/** q135 cost profile (the r9 verdict's "#1 cold query" item): measures
  * where containment-pair time goes at a given SF by replaying
  * [[dedup.NGramJaccard.containmentPairs]]'s stages
  * (NGramJaccard.scala:147-176) with counters between them —
  * shingle/index volume, candidate volume before and after the
  * pair-distinct, verified output — so "candidates dominate" vs "verify
  * dominates" is a number, not a guess, and `maxDocFreq` tuning has a
  * measured basis.
  */
object ContainTriage {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxDocFreq = if (args.length > 1) args(1).toLong else 1000L
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val nDocs = docs.count()
    val sets = dedup.NGramJaccard.shingleSets(docs, "doc_id", "text", 3)
      .persist(level)
    val all = sets.select(col("doc_id").as("id"), explode(col("shh")).as("sh"))
    val dfreq = all.groupBy("sh").count().persist(level)
    val nShingleRows = all.count()
    val nDistinct = dfreq.count()
    val nOverCap = dfreq.filter(col("count") > maxDocFreq).count()
    val capMass = dfreq.filter(col("count") > maxDocFreq)
      .agg(coalesce(sum(col("count")), lit(0L))).collect()(0).getLong(0)
    println(f"[containtriage] sf=$sfDir docs=$nDocs%d shingleRows=$nShingleRows%d " +
      f"distinctShingles=$nDistinct%d overCap(df>$maxDocFreq%d)=$nOverCap%d rowsExcluded=$capMass%d")

    val keep = dfreq.filter(col("count") <= maxDocFreq).select("sh")
    val ix = all.join(keep, "sh").persist(level)
    val t0 = System.nanoTime()
    // candidate volume BEFORE the distinct: the join fan-out the cap
    // bounds — sum over kept shingles of C(df, 2)
    val rawPairs = dfreq.filter(col("count") <= maxDocFreq)
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
      .collect()(0).getLong(0)
    val cand = ix.select(col("id").as("id_a"), col("sh"))
      .join(ix.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
      .persist(level)
    val nCand = cand.count()
    val tCand = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val sa = sets.select(col("doc_id").as("id_a"), col("shh").as("shh_a"),
      col("n_sh").as("n_a"))
    val sb = sets.select(col("doc_id").as("id_b"), col("shh").as("shh_b"),
      col("n_sh").as("n_b"))
    val nOut = cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("c", graft.functions.SetExpressions
        .sortedIntersectCount(col("shh_a"), col("shh_b")))
      .filter(col("c").cast("double") /
        least(col("n_a"), col("n_b")).cast("double") >= 0.8)
      .count()
    val tVerify = (System.nanoTime() - t1) / 1e9
    println(f"[containtriage] rawCandWedges=$rawPairs%d distinctCand=$nCand%d " +
      f"verified=$nOut%d  candGen=${tCand}%.2f s verify=${tVerify}%.2f s")
    spark.stop()
  }
}
