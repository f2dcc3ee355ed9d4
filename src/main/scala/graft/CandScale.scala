package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-path evidence main (the AnnScale discipline, aimed at the
  * q350-q353 diagnostics family): measured candidate RECALL and PRUNE
  * RATE for [[sim.Candidates.ivfSelfPairs]] at bench scale, on BOTH
  * corpus geometries:
  *
  *   - `raw` — the synthetic sf embeddings, which have NO cluster
  *     structure (intra ≈ inter cosine): IVF recall here is the FLOOR,
  *     the honest worst case (SURVEY §5.2's caveat);
  *   - `clustered` — the same vectors pulled toward 8 deterministic
  *     hash-derived centers (the geometry real embedding corpora have):
  *     the case where cell-keyed pruning actually wins.
  *
  * Per (dir, geometry, nprobe): candidate pairs vs all n(n−1) ordered
  * pairs (prune rate) and the share of TRUE 10-NN pairs (cosine brute
  * force, every point a query) the candidate set covers (recall@10).
  * Deterministic end to end (seeded k-means, hash-derived centers), so
  * the numbers SURVEY §5.2 quotes are reproducible by rerunning:
  * `sbt "runMain graft.CandScale"` (defaults to sf0.01 + sf0.1).
  */
object CandScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      shufflePartitions = "32")
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      // vectors stay FLOAT (the embeddings' native width — KMeans.init
      // and the quantizer stack read float rows)
      val raw = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      // planted geometry: 8 hash-derived centers, noise shrunk 0.3× —
      // intra-cluster cosine ≫ inter, the structure IVF cells exploit
      val clustered = raw.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * 0.3 +
            (pmod(xxhash64(pmod(col("vec_id"), lit(8)) * 64 + i),
              lit(1000)).cast("double") / 500.0 - 1.0) * 2.5)
            .cast("float")).as("embedding"))
      for ((label, df0) <- Seq(("raw", raw), ("clustered", clustered))) {
        val df = df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = df.count()
        // true 10-NN pairs, every point a query (cosine brute force)
        val truth = sim.Similarity.bruteForceTopK(df, df, "vec_id",
            "embedding", 10)
          .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nTruth = truth.count()
        for (np <- Seq(1, 2)) {
          val t0 = System.nanoTime()
          val cand = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
              kCoarse = 8, nprobe = np)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nCand = cand.count()
          val secs = (System.nanoTime() - t0) / 1e9
          val hit = truth.join(cand, Seq("id_a", "id_b")).count()
          val prune = 1.0 - nCand.toDouble / (n.toDouble * (n - 1))
          println(f"[candscale] dir=$dir geometry=$label%-9s n=$n%6d nprobe=$np pairs=$nCand%12d prune=${prune}%6.4f recall@10=${hit.toDouble / nTruth}%6.4f gen_sec=$secs%7.2f")
          cand.unpersist()
        }
        truth.unpersist(); df.unpersist()
        Blocks.releaseAll(spark)
      }
    }
    spark.stop()
  }
}
