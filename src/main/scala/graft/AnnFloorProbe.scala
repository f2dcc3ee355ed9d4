package graft

import org.apache.spark.sql.functions._

/** Triage main: measured mean recall@5 of every verdict-gated ANN rung
  * vs brute force, at the given SF dir — the numbers the q39/q52/q71/
  * q73/q105 `recall_ok` floors are set against (floor = measured − a
  * wide margin; see SparkEntry's per-query notes). Run at sf0.001 and
  * sf0.01 (the correctness-gate SF) before touching a floor.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.AnnFloorProbe"
  */
object AnnFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val isQ = col("vec_id") < 10
    val truth = sim.Similarity.bruteForceTopK(emb, emb.filter(isQ),
      "vec_id", "embedding", k = 5).cache()
    truth.count()
    def report(name: String, ann: org.apache.spark.sql.DataFrame): Unit =
      println(f"$name%-12s mean_recall@5 = ${sim.AnnVerdict.meanRecall(ann, truth, 5)}%.4f")

    report("lsh_8x4_mp", sim.LshAnn.topK(emb, "vec_id", "embedding", isQ, dim = 64, k = 5))
    report("pq_m8", sim.ProductQuantizer.topK(emb, "vec_id", "embedding", isQ, dim = 64, k = 5))
    val mdl = sim.IvfPq.fit(emb, "vec_id", "embedding", dim = 64,
      kCoarse = 16, coarseIters = 3, pqIters = 3)
    report("ivfpq_np8", sim.IvfPq.topK(emb, "vec_id", "embedding", isQ,
      dim = 64, k = 5, nprobe = 8, model = Some(mdl)))
    val mdlR = sim.IvfPq.fit(emb, "vec_id", "embedding", dim = 64,
      kCoarse = 16, coarseIters = 3, pqIters = 3, residual = true)
    report("ivfadc_np8", sim.IvfPq.topK(emb, "vec_id", "embedding", isQ,
      dim = 64, k = 5, nprobe = 8, model = Some(mdlR)))
    report("int8_of4", sim.ScalarQuant.topK(emb, emb.filter(isQ),
      "vec_id", "embedding", k = 5))
    // q51's contract check (must print 1): trained-cell search ≡
    // within-cell brute force
    val assigned = sim.KMeans.fitAssign(emb, "vec_id", "embedding", k = 10, iters = 3)
    val cv = sim.AnnVerdict.cellTopKVerdict(assigned, "vec_id", "embedding",
      "cluster", isQ, k = 5).head()
    println(s"ivf_kmeans   cell_match_ok = ${cv.getLong(4)} assign_ok = ${cv.getLong(3)}")
    spark.stop()
  }
}
