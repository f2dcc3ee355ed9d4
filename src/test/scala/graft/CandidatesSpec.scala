package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Candidate-path embedding diagnostics: the IVF candidate list must
  * reproduce the brute-force result exactly at recall 1.0 (full probe),
  * and the REGISTERED kCoarse=8/nprobe=2 configuration must both prune
  * (fewer pairs than brute force) and still reach recall 1.0 on the
  * test corpus — that equality is what lets q350-q353 share their
  * brute-force twins' oracle SQL.
  */
class CandidatesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def clustered(n: Int): org.apache.spark.sql.DataFrame = {
    // three well-separated directions + deterministic jitter: the IVF
    // assumption (neighbors share a coarse cell) holds by construction
    val base = Seq(Array(1.0f, 0f, 0f), Array(0f, 1.0f, 0f), Array(0f, 0f, 1.0f))
    (0 until n).map { i =>
      val c = base(i % 3)
      val j = (i * 2654435761L % 97).toFloat / 970f // ±0.1 jitter
      (i.toLong, Array(c(0) + j, c(1) + j * 0.7f, c(2) - j * 0.3f),
        (i % 3).toLong)
    }.toDF("vec_id", "embedding", "label")
  }

  test("ivfSelfPairs at nprobe=kCoarse yields every ordered pair") {
    val df = clustered(12)
    val cand = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
      kCoarse = 4, nprobe = 4)
    assert(cand.count() == 12L * 11L, "full probe = all ordered pairs")
  }

  test("candidate-path knnOutliers / hubness / lidMle / mutualNearest ≡ brute force at full probe") {
    val df = clustered(30)
    val cand = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
      kCoarse = 4, nprobe = 4)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    assert(rows(sim.Geometry.knnOutliers(df, "vec_id", "embedding", k = 5,
        topN = 10, candidates = Some(cand))) ==
      rows(sim.Geometry.knnOutliers(df, "vec_id", "embedding", k = 5, topN = 10)))
    assert(rows(sim.Geometry.hubness(df, "vec_id", "embedding", k = 5,
        topN = 10, candidates = Some(cand))) ==
      rows(sim.Geometry.hubness(df, "vec_id", "embedding", k = 5, topN = 10)))
    assert(rows(sim.Geometry.lidMle(df, "vec_id", "embedding", "label",
        k = 5, candidates = Some(cand))) ==
      rows(sim.Geometry.lidMle(df, "vec_id", "embedding", "label", k = 5)))
    val a = df.filter(col("label") === 0)
    val b = df.filter(col("label") === 1)
    val cross = sim.Candidates.ivfCrossPairs(a, b, "vec_id", "embedding",
      kCoarse = 4, nprobe = 4)
    assert(rows(sim.Similarity.mutualNearest(a, b, "vec_id", "embedding",
        candidates = Some(cross))) ==
      rows(sim.Similarity.mutualNearest(a, b, "vec_id", "embedding")))
  }

  test("on a clustered corpus, nprobe=1 candidates prune ~2/3 of pairs AND all four diagnostics stay bit-equal to brute force") {
    // the IVF premise: when geometry exists, neighbors share a coarse
    // cell, so a 1-cell probe is exact at a fraction of the pair cost —
    // this is the 100 TB configuration claim behind q350-q353
    val df = clustered(60)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val cand = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
      kCoarse = 3, nprobe = 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cn = cand.count()
    assert(cn <= 60L * 59L / 2,
      s"1-probe of 3 balanced cells must prune >= half the pairs, got $cn")
    assert(rows(sim.Geometry.knnOutliers(df, "vec_id", "embedding", k = 5,
        topN = 10, candidates = Some(cand))) ==
      rows(sim.Geometry.knnOutliers(df, "vec_id", "embedding", k = 5, topN = 10)),
      "pruned knnOutliers ≡ brute force on clustered data")
    assert(rows(sim.Geometry.hubness(df, "vec_id", "embedding", k = 5,
        topN = 10, candidates = Some(cand))) ==
      rows(sim.Geometry.hubness(df, "vec_id", "embedding", k = 5, topN = 10)),
      "pruned hubness ≡ brute force on clustered data")
    assert(rows(sim.Geometry.lidMle(df, "vec_id", "embedding", "label",
        k = 5, candidates = Some(cand))) ==
      rows(sim.Geometry.lidMle(df, "vec_id", "embedding", "label", k = 5)),
      "pruned lidMle ≡ brute force on clustered data")
    cand.unpersist()
  }

  test("probeCells loop form (large-k path) is bit-equal to the literal form, pairs included") {
    // the decade rung runs kCoarse in the hundreds through the packed
    // transform() loop; its contract is EXACT agreement with the
    // unrolled literal path the registered k=8 queries keep — same
    // distances, same lowest-cell tie rule, same pair set
    val df = clustered(40)
    val cents = sim.KMeans.fit(df, "vec_id", "embedding", k = 4, iters = 3)
    for (np <- Seq(1, 2, 4)) {
      val lit0 = sim.Candidates.probeCells(df, "vec_id", "embedding",
        cents, np) // k=4 < 33: literal path
      val loop = sim.Candidates.probeCells(df, "vec_id", "embedding",
        cents, np, loopFrom = 1) // forced loop path
      assert(lit0.exceptAll(loop).isEmpty && loop.exceptAll(lit0).isEmpty,
        s"probe paths diverge at nprobe=$np")
    }
    val pLit = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
      kCoarse = 4, nprobe = 2)
    val pLoop = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
      kCoarse = 4, nprobe = 2, probeLoopFrom = 1)
    assert(pLit.exceptAll(pLoop).isEmpty && pLoop.exceptAll(pLit).isEmpty)
  }

  test("registered q350-q353 verdict rows pass every gate on sf0.001") {
    // VERDICT-GATED since r14 (CandVerdict): each registered row must
    // come back with every 1/0 verdict at 1 at this SF too — the
    // oracle only runs at sf0.01, so this pins the other local SF
    for (q <- Seq("q350_knn_outlier_cand", "q351_hubness_cand",
        "q352_lid_cand", "q353_mnn_cand")) {
      val row = SparkEntry.queries(q)(spark, sfDir).head()
      for (c <- Seq("fullprobe_eq_brute_ok", "pruned_subset_ok",
          "prune_floor_ok"))
        assert(row.getAs[Long](c) == 1L, s"$q.$c != 1: $row")
    }
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val candN = sim.Candidates.ivfSelfPairs(emb, "vec_id", "embedding",
      kCoarse = 8, nprobe = 2).count()
    assert(candN < n * (n - 1) / 2,
      s"nprobe=2 candidates ($candN) should prune >= half vs all pairs (${n * (n - 1)})")
  }
}
