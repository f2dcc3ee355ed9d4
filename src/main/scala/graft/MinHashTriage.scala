package graft

import org.apache.spark.sql.functions._

/** q35 timing triage: phase-level counts for the MinHash+LSH pipeline on
  * a corpus dir — shingle volume, band-bucket sizes, candidate pairs
  * before/after distinct, verified pairs. Round 8 saw q35 warm jump
  * 3.0 → 11.2 s on a REGENERATED documents.parquet with the operator
  * unchanged; these are the numbers that attribute such a shift to
  * corpus structure (candidate-pair inflation) vs a plan regression.
  *
  * Usage: runMain graft.MinHashTriage [sfDir]
  */
object MinHashTriage {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    println(f"[triage] docs=${docs.count()}%d")

    val sets = dedup.NGramJaccard.shingleSets(docs, "doc_id", "text", n = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shingleVol = sets.select(sum(size(col("shingles")))).collect()(0).getLong(0)
    println(f"[triage] shingle_volume=$shingleVol%d")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[triage] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val banded = dedup.MinHashLsh.bandRows(sets, "doc_id").persist()
    timed("bandRows")(banded.count())
    // candidate volume = Σ_buckets C(|bucket|,2); a handful of mega-
    // buckets is the quadratic cliff signature
    val buckets = banded.groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .persist()
    val candVolume = buckets
      .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")))
      .collect()(0).getLong(0)
    val top = buckets.orderBy(col("n").desc).limit(10)
      .collect().map(_.getLong(2)).mkString(",")
    println(f"[triage] cand_volume=$candVolume%d top_buckets=[$top]")

    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bh"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val nDistinct = timed("distinct candidates")(cand.distinct().count())
    println(f"[triage] distinct_candidates=$nDistinct%d")

    val verified = timed("verify (exact jaccard)")(
      dedup.MinHashLsh.pairsPlan(sets, "doc_id", 0.8).count())
    println(f"[triage] verified_pairs=$verified%d")

    timed("q35 end-to-end")(
      dedup.MinHashLsh.similarPairs(docs, "doc_id", "text", 3, 0.8).count())
    spark.stop()
  }
}
