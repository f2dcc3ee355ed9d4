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

  /** Builder-owned planted-geometry corpus (the GraphScale discipline —
    * synthetic via spark.range + hash arithmetic, NEVER the read-only
    * driver testdata): `n/cellTarget` hash-derived centers at span ±2.5,
    * noise ±0.3 — intra-cluster cosine ≫ inter, cluster size constant
    * (~cellTarget) as n grows. That is the production scaling (kCoarse
    * ∝ n, bounded cells), so the candidate-pair count should grow
    * LINEARLY in n — the claim the decade rung measures.
    */
  private def planted(spark: org.apache.spark.sql.SparkSession, n: Long,
      d: Int, cellTarget: Int): (DataFrame, Int) = {
    val centers = math.max(2, (n / cellTarget).toInt)
    val df = spark.range(n).select(
      col("id").as("vec_id"),
      pmod(col("id"), lit(centers)).as("cluster"),
      transform(sequence(lit(0), lit(d - 1)), i =>
        ((pmod(xxhash64(pmod(col("id"), lit(centers)) * d + i),
          lit(1000)).cast("double") / 500.0 - 1.0) * 2.5 +
          (pmod(xxhash64(col("id") * d + i + lit(1000000007L)),
            lit(1000)).cast("double") / 500.0 - 1.0) * 0.3)
          .cast("float")).as("embedding"))
    (df, centers)
  }

  /** True 10-NN by CONSTRUCTION: with centers ±2.5 vs noise ±0.3 every
    * point's nearest neighbors are in its planted cluster, so the truth
    * is a CLUSTER-KEYED join (O(n·cellSize) pairs), not global O(n²)
    * brute force — which is what makes a decade-scale truth computable
    * at all. The small rung VALIDATES this against global brute force
    * (overlap printed) before the large rung leans on it.
    */
  private def clusterTruth(df: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = df.select(col("vec_id").as("id_a"), col("cluster"),
      col("embedding").as("__ea"))
    val b = df.select(col("vec_id").as("id_b"), col("cluster"),
      col("embedding").as("__eb"))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("__cos").desc, col("id_b"))
    a.join(b, "cluster").filter(col("id_a") =!= col("id_b"))
      .withColumn("__cos", sim.Similarity.cosine(col("__ea"), col("__eb")))
      .withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
      .select("id_a", "id_b")
  }

  /** The §5.2 DECADE rung (r15 — the GraphScale/StreamScale twin for
    * the candidate path): q350-shape candidate generation + diagnostic
    * at two corpus sizes 10× apart on planted geometry with kCoarse ∝ n
    * (constant cell size — the 100 TB discipline; the large-k probe
    * rides [[sim.Candidates.probeCells]]'s loop form, forced at BOTH
    * sizes so the growth ratio compares like with like). Measured per
    * (n, nprobe): generation wall (fit + probe + pair join), candidate
    * pair count (expect ~10× at 10× n — linear, vs the n² brute twin's
    * 100×), prune share, recall@10 vs the planted truth, and the
    * knnOutliers-diagnostic wall on those candidates.
    */
  private def decade(spark: org.apache.spark.sql.SparkSession,
      sizes: Seq[Long]): Unit = {
    val probes = sys.env.getOrElse("SPARK_GRAFT_DECADE_NPROBE", "1,2")
      .split(",").map(_.trim.toInt).toSeq
    for (n <- sizes) {
      val (df0, centers) = planted(spark, n, d = 64, cellTarget = 256)
      val df = df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nn = df.count()
      val truth = clusterTruth(df, 10)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nTruth = truth.count()
      if (n == sizes.min && n <= 10000) {
        // validate the by-construction truth once, at the size where
        // global brute force is still affordable
        val global = sim.Similarity.bruteForceTopK(df, df, "vec_id",
            "embedding", 10)
          .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"))
        val overlap = truth.join(global, Seq("id_a", "id_b")).count()
          .toDouble / nTruth
        println(f"[candscale-decade] truth_validation n=$nn in_cluster_vs_global_overlap=$overlap%.4f")
      }
      for (np <- probes) {
        val t0 = System.nanoTime()
        val cand = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
            kCoarse = centers, nprobe = np, iters = 3,
            seeding = "parallel", probeLoopFrom = 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nCand = cand.count()
        val genSec = (System.nanoTime() - t0) / 1e9
        val hit = truth.join(cand, Seq("id_a", "id_b")).count()
        val t1 = System.nanoTime()
        sim.Geometry.knnOutliers(df, "vec_id", "embedding", k = 10,
          topN = 20, candidates = Some(cand)).count()
        val diagSec = (System.nanoTime() - t1) / 1e9
        val prune = 1.0 - nCand.toDouble / (nn.toDouble * (nn - 1))
        println(f"[candscale-decade] n=$nn%7d kCoarse=$centers%4d nprobe=$np pairs=$nCand%12d prune=$prune%8.6f recall@10=${hit.toDouble / nTruth}%6.4f gen_sec=$genSec%8.2f diag_sec=$diagSec%8.2f")
        cand.unpersist()
      }
      truth.unpersist(); df.unpersist()
      Blocks.releaseAll(spark)
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("decade")) {
      val sizes = if (args.length >= 3) args.drop(1).map(_.toLong).toSeq
        else Seq(6400L, 64000L)
      // 256 shuffle partitions, not the bench's 32: the nprobe=2 cell
      // at n=64k carries ~110M embedding-bearing rows (~60 GB) through
      // sort/aggregate — at 32 partitions each of 32 concurrent tasks
      // sorts ~2 GB and the executor pool hits UNABLE_TO_ACQUIRE_MEMORY
      // (measured, twice). Sizing partitions to fit task memory is
      // exactly the §5 partitioning discipline; AQE coalesces the
      // small stages back down.
      val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
        shufflePartitions = "256")
      spark.sparkContext.setLogLevel("WARN") // a dying cell must say why
      decade(spark, sizes)
      spark.stop()
      return
    }
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
