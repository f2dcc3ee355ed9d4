package graft

import org.apache.spark.sql.functions._

/** Local tuning harness (not a spec): minimal nprobe per diagnostic for
  * exact equality with brute force on a given sf dir.
  */
object CandTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.local("8", shufflePartitions = "8")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val bruteKnn = rows(sim.Geometry.knnOutliers(emb, "vec_id", "embedding", 10, 20))
    val bruteHub = rows(sim.Geometry.hubness(emb, "vec_id", "embedding", 10, 20))
    val bruteLid = rows(sim.Geometry.lidMle(emb, "vec_id", "embedding", "label", 10))
    val a = emb.filter(col("label") === 0)
    val b = emb.filter(col("label") === 1)
    val bruteMnn = rows(sim.Similarity.mutualNearest(a, b, "vec_id", "embedding"))
    val cents = sim.KMeans.fit(emb, "vec_id", "embedding", 8, 5)
    val n = emb.count()
    for (np <- 1 to 8) {
      val cells = sim.Candidates.probeCells(emb, "vec_id", "embedding", cents, np)
      val cand = cells.select(col("__id").as("id_a"), col("__cell"))
        .join(cells.select(col("__id").as("id_b"), col("__cell")), Seq("__cell"))
        .filter(col("id_a") =!= col("id_b")).select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cn = cand.count()
      val okK = rows(sim.Geometry.knnOutliers(emb, "vec_id", "embedding", 10, 20,
        candidates = Some(cand))) == bruteKnn
      val okH = rows(sim.Geometry.hubness(emb, "vec_id", "embedding", 10, 20,
        candidates = Some(cand))) == bruteHub
      val okL = rows(sim.Geometry.lidMle(emb, "vec_id", "embedding", "label", 10,
        candidates = Some(cand))) == bruteLid
      val crossCand = sim.Candidates.ivfCrossPairs(a, b, "vec_id", "embedding", 8, np)
      val okM = rows(sim.Similarity.mutualNearest(a, b, "vec_id", "embedding",
        candidates = Some(crossCand))) == bruteMnn
      println(s"RESULT nprobe=$np pairs=$cn/${n * (n - 1)} knn=$okK hub=$okH lid=$okL mnn=$okM")
      cand.unpersist()
    }
    spark.stop()
  }
}
