package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q350-q353 verdict gates have teeth: doctored candidate sets and
  * doctored diagnostics flip their 1s to 0s (the AnnLadderSpec
  * discipline). The verdicts' positive path is gated by the oracle
  * itself (CORRECTNESS rows); here we prove a broken engine could not
  * sneak through it.
  */
class CandVerdictSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def corpus(n: Int): org.apache.spark.sql.DataFrame = {
    val base = Seq(Array(1.0f, 0f, 0f), Array(0f, 1.0f, 0f), Array(0f, 0f, 1.0f))
    (0 until n).map { i =>
      val c = base(i % 3)
      val j = (i * 2654435761L % 97).toFloat / 970f
      (i.toLong, Array(c(0) + j, c(1) + j * 0.7f, c(2) - j * 0.3f),
        (i % 3).toLong)
    }.toDF("vec_id", "embedding", "label")
  }

  private def diagOf(df: org.apache.spark.sql.DataFrame)(
      c: Option[org.apache.spark.sql.DataFrame]) =
    sim.Geometry.knnOutliers(df, "vec_id", "embedding", k = 5, topN = 10,
      candidates = c)

  test("selfVerdict positive path: real full/pruned candidates -> all verdicts 1, counts exact") {
    val df = corpus(30)
    val full = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
      kCoarse = 4, nprobe = 4)
    val pruned = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
      kCoarse = 4, nprobe = 1)
    val r = sim.CandVerdict.selfVerdict(df, "vec_id", kCoarse = 4,
      nprobe = 1, pruneFloorPct = 30, full, pruned, diagOf(df)).head()
    assert(r.getAs[Long]("n_corpus") == 30L)
    assert(r.getAs[Long]("n_pairs_full") == 30L * 29L)
    assert(r.getAs[Long]("pruned_diag_rows") == 10L)
    assert(r.getAs[Long]("fullprobe_eq_brute_ok") == 1L)
    assert(r.getAs[Long]("pruned_subset_ok") == 1L)
    assert(r.getAs[Long]("prune_floor_ok") == 1L)
  }

  test("the gate has teeth: dropped pair / alien pair / no-op pruning each flip their verdict") {
    val df = corpus(30)
    val full = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
      kCoarse = 4, nprobe = 4)
    val pruned = sim.Candidates.ivfSelfPairs(df, "vec_id", "embedding",
      kCoarse = 4, nprobe = 1)
    // (a) full-probe set silently loses one point's entire neighbor
    // list -> the diagnostic can no longer reproduce brute force
    val dropped = full.filter(col("id_a") =!= 7L)
    val ra = sim.CandVerdict.selfVerdict(df, "vec_id", 4, 1, 30,
      dropped, pruned, diagOf(df)).head()
    assert(ra.getAs[Long]("fullprobe_eq_brute_ok") == 0L,
      "a doctored full-probe set must fail the equality verdict")
    // (b) pruned set smuggles a self-pair (id_a == id_b): not a
    // full-probe pair, so the subset verdict fails
    val alien = pruned.unionByName(
      Seq((3L, 3L)).toDF("id_a", "id_b"))
    val rb = sim.CandVerdict.selfVerdict(df, "vec_id", 4, 1, 30,
      full, alien, diagOf(df)).head()
    assert(rb.getAs[Long]("pruned_subset_ok") == 0L,
      "a self-pair in the pruned set must fail the subset verdict")
    // (c) "pruned" path that degenerated to all pairs: prunes 0 %
    val rc = sim.CandVerdict.selfVerdict(df, "vec_id", 4, 1, 30,
      full, full, diagOf(df)).head()
    assert(rc.getAs[Long]("prune_floor_ok") == 0L,
      "an unpruned candidate set must fail the prune floor")
  }

  test("crossVerdict: positive path on disjoint sides, and an empty pruned diagnostic fails the bounds gate") {
    // labels interleaved WITHIN every cluster (label = i % 2, position
    // cluster = i % 3): a 1-probe still finds cross-side candidates in
    // each cell — the q353 shape, where cells mix both sides
    val base = Seq(Array(1.0f, 0f, 0f), Array(0f, 1.0f, 0f), Array(0f, 0f, 1.0f))
    val df = (0 until 24).map { i =>
      val c = base(i % 3)
      val j = (i * 2654435761L % 97).toFloat / 970f
      (i.toLong, Array(c(0) + j, c(1) + j * 0.7f, c(2) - j * 0.3f),
        (i % 2).toLong)
    }.toDF("vec_id", "embedding", "label")
    val a = df.filter(col("label") === 0)
    val b = df.filter(col("label") === 1)
    val full = sim.Candidates.ivfCrossPairs(a, b, "vec_id", "embedding",
      kCoarse = 4, nprobe = 4)
    val pruned = sim.Candidates.ivfCrossPairs(a, b, "vec_id", "embedding",
      kCoarse = 4, nprobe = 1)
    def mnn(c: Option[org.apache.spark.sql.DataFrame]) =
      sim.Similarity.mutualNearest(a, b, "vec_id", "embedding",
        candidates = c)
    val r = sim.CandVerdict.crossVerdict(a, b, "vec_id", 4, 1, 10,
      full, pruned, mnn).head()
    assert(r.getAs[Long]("n_a") == 12L && r.getAs[Long]("n_b") == 12L)
    assert(r.getAs[Long]("n_pairs_full") == 144L)
    assert(r.getAs[Long]("fullprobe_eq_brute_ok") == 1L)
    assert(r.getAs[Long]("pruned_diag_bounded_ok") == 1L)
    // a diagnostic that silently returns nothing on the pruned path
    // must not pass as "bounded"
    def hollow(c: Option[org.apache.spark.sql.DataFrame]) =
      if (c.isDefined && c.get.count() == pruned.count()) mnn(c).limit(0)
      else mnn(c)
    val re = sim.CandVerdict.crossVerdict(a, b, "vec_id", 4, 1, 10,
      full, pruned, hollow).head()
    assert(re.getAs[Long]("pruned_diag_bounded_ok") == 0L,
      "an empty pruned diagnostic must fail the bounds verdict")
  }
}
