package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q390 Misra-Gries guarantee verdict has teeth (the CandVerdictSpec
  * discipline): the positive path is gated by the oracle row itself;
  * here we prove a sketch that violated the mergeable-summaries
  * contract — an overcounting counter, a dropped heavy hitter, a
  * smuggled alien item — could not sneak a 1 through, and that the
  * registered configuration runs the sketch in the EVICTING regime
  * (vocabulary >> capacity) where the guarantee is non-trivial.
  */
class MgVerdictSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // two segments; seg "a": item h0 hot (60 of 100 rows), 40 cold
  // singletons; seg "b": uniform over 20 items, 5 each
  private def rows: org.apache.spark.sql.DataFrame = {
    val a = (0 until 60).map(_ => ("a", "h0")) ++
      (0 until 40).map(i => ("a", s"c$i"))
    val b = (0 until 100).map(i => ("b", s"u${i % 20}"))
    (a ++ b).toDF("segment", "item")
  }

  test("positive path: guarantees hold through real eviction (capacity 8 << 41-item vocabulary)") {
    val v = etl.Aggregates.mgVerdict(rows, "segment", "item", capacity = 8)
      .orderBy("segment").collect()
    assert(v.length == 2)
    v.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 100L)
      assert(r.getAs[Long]("capacity") == 8L)
      assert(r.getAs[Long]("tracked_bound_ok") == 1L, r)
      assert(r.getAs[Long]("underestimate_ok") == 1L, r)
      assert(r.getAs[Long]("coverage_ok") == 1L, r)
    }
    // non-trivial regime: seg "a" has 41 distinct items vs capacity 8,
    // so eviction fired; the heavy hitter (60 > 100/9) must be tracked
    val sk = rows.groupBy(col("segment"))
      .agg(graft.functions.FreqSketchAgg.freqSketch(col("item"), 8).as("sk"))
      .select(col("segment"), explode(col("sk")))
    val aTracked = sk.filter(col("segment") === "a")
      .select("key").as[String].collect().toSet
    assert(aTracked.size <= 8 && aTracked.size < 41)
    assert(aTracked.contains("h0"), s"heavy hitter evicted: $aTracked")
  }

  private def exactOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("segment"), col("item"))
      .agg(count(lit(1)).as("true_cnt"))

  test("doctored sketch: an OVERCOUNTING counter flips underestimate_ok") {
    val tracked = Seq(("a", "h0", 61L), ("a", "c0", 1L))
      .toDF("segment", "item", "reported") // h0 true count is 60
    val v = etl.Aggregates.mgVerdictFrom(exactOf(rows), tracked,
      "segment", capacity = 8).filter(col("segment") === "a").head()
    assert(v.getAs[Long]("underestimate_ok") == 0L)
  }

  test("doctored sketch: undercounting PAST the N/(k+1) bound flips underestimate_ok") {
    // bound for seg a = 100/9 = 11.1; reporting 60-true h0 at 48 is out
    val tracked = Seq(("a", "h0", 48L)).toDF("segment", "item", "reported")
    val v = etl.Aggregates.mgVerdictFrom(exactOf(rows), tracked,
      "segment", capacity = 8).filter(col("segment") === "a").head()
    assert(v.getAs[Long]("underestimate_ok") == 0L)
    // within the bound passes: 50 >= 60 - 11.1
    val ok = Seq(("a", "h0", 50L)).toDF("segment", "item", "reported")
    val v2 = etl.Aggregates.mgVerdictFrom(exactOf(rows), ok,
      "segment", capacity = 8).filter(col("segment") === "a").head()
    assert(v2.getAs[Long]("underestimate_ok") == 1L)
  }

  test("doctored sketch: a DROPPED heavy hitter flips coverage_ok") {
    val tracked = Seq(("a", "c0", 1L)).toDF("segment", "item", "reported")
    val v = etl.Aggregates.mgVerdictFrom(exactOf(rows), tracked,
      "segment", capacity = 8).filter(col("segment") === "a").head()
    assert(v.getAs[Long]("coverage_ok") == 0L)
  }

  test("doctored sketch: an ALIEN item (absent from the corpus) flips underestimate_ok") {
    val tracked = Seq(("a", "h0", 55L), ("a", "ghost", 3L))
      .toDF("segment", "item", "reported")
    val v = etl.Aggregates.mgVerdictFrom(exactOf(rows), tracked,
      "segment", capacity = 8).filter(col("segment") === "a").head()
    assert(v.getAs[Long]("underestimate_ok") == 0L)
  }

  test("doctored sketch: a tracked set LARGER than capacity flips tracked_bound_ok") {
    val tracked = (0 until 9).map(i => ("b", s"u$i", 5L))
      .toDF("segment", "item", "reported")
    val v = etl.Aggregates.mgVerdictFrom(exactOf(rows), tracked,
      "segment", capacity = 8).filter(col("segment") === "b").head()
    assert(v.getAs[Long]("tracked_bound_ok") == 0L)
  }
}
