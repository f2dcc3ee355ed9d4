package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded top-k aggregate must be ROW-SET IDENTICAL to the
  * `row_number().over(partitionBy(key).orderBy(score, id)) <= k` window
  * it replaces (Geometry.rankedTopK / Similarity.bruteForceTopK ride
  * it) — including the window's null ordering (asc = NULLS FIRST,
  * desc = NULLS LAST), NaN placement (greatest), -0.0 < 0.0, exact
  * score ties broken by id, groups smaller than k, and merge across
  * many input partitions (the map-side partial path).
  */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def adversarial: DataFrame =
    Seq(
      (1L, 10L, Some(0.5)), (1L, 11L, Some(0.5)), (1L, 12L, Some(0.3)),
      (1L, 13L, Some(Double.NaN)), (1L, 14L, Some(-0.0)),
      (1L, 15L, Some(0.0)), (1L, 16L, Some(0.7)),
      (1L, 17L, Some(Double.NegativeInfinity)),
      (2L, 20L, Some(1.0)), (2L, 21L, Some(0.9)),
      (2L, 22L, Some(Double.PositiveInfinity)),
      (3L, 30L, Some(Double.NaN)),
      (4L, 40L, None), (4L, 41L, Some(0.1))
    ).toDF("k", "id", "s").repartition(7) // force multi-partition merges

  private def viaAgg(df: DataFrame, k: Int, asc: Boolean): DataFrame = {
    val tk = if (asc) functions.TopKAgg.topKMin(col("s"), col("id"), k)
      else functions.TopKAgg.topKMax(col("s"), col("id"), k)
    df.groupBy(col("k")).agg(tk.as("__tk"))
      .select(col("k"), posexplode(col("__tk")).as(Seq("__p", "__e")))
      .select(col("k"), col("__e").getField("id").as("id"),
        col("__e").getField("score").as("s"), (col("__p") + 1).as("rk"))
  }

  private def viaWindow(df: DataFrame, k: Int, asc: Boolean): DataFrame = {
    val ord = if (asc) col("s").asc else col("s").desc
    df.withColumn("rk", row_number().over(
        Window.partitionBy(col("k")).orderBy(ord, col("id").asc)))
      .filter(col("rk") <= k)
      .select("k", "id", "s", "rk")
  }

  private def assertSame(df: DataFrame, k: Int, asc: Boolean): Unit = {
    val a = viaAgg(df, k, asc)
    val w = viaWindow(df, k, asc)
    assert(a.exceptAll(w).isEmpty && w.exceptAll(a).isEmpty,
      s"k=$k asc=$asc: agg and window disagree")
  }

  test("adversarial scores match the window, asc and desc, k=1/3/64") {
    for (k <- Seq(1, 3, 64); asc <- Seq(true, false))
      assertSame(adversarial, k, asc)
  }

  test("random corpus matches the window across partitionings") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(37).toLong, i.toLong,
        Some(math.rint(rnd.nextDouble() * 100) / 100)) // coarse: force ties
    }
    for (parts <- Seq(1, 13); k <- Seq(5, 10)) {
      val df = rows.toDF("k", "id", "s").repartition(parts)
      assertSame(df, k, asc = true)
      assertSame(df, k, asc = false)
    }
  }

  test("null ids rank exactly like the window's id tie-break (r17 advisor case)") {
    // null id among exact score ties (the id asc NULLS FIRST placement),
    // null id on a null score, and a null id that loses the cut entirely
    val df = Seq(
      (1L, Some(10L), Some(0.5)), (1L, Option.empty[Long], Some(0.5)),
      (1L, Some(11L), Some(0.5)), (1L, Some(12L), Some(0.1)),
      (2L, Option.empty[Long], Option.empty[Double]), (2L, Some(20L), Some(0.3)),
      (3L, Option.empty[Long], Some(0.9)), (3L, Some(30L), Some(0.2)),
      (3L, Some(31L), Some(0.4))
    ).toDF("k", "id", "s").repartition(5)
    for (k <- Seq(1, 2, 64); asc <- Seq(true, false))
      assertSame(df, k, asc)
    // and the emitted id really is NULL, not a sentinel
    val top = viaAgg(df.filter(col("k") === 3L), 1, asc = false).collect()
    assert(top.length == 1 && top(0).isNullAt(1), top.mkString(","))
  }

  test("groups smaller than k emit all rows in rank order") {
    val df = Seq((9L, 1L, Some(0.2)), (9L, 2L, Some(0.1))).toDF("k", "id", "s")
    val got = viaAgg(df, 10, asc = true).orderBy("rk")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == Seq((2L, 0.1, 1), (1L, 0.2, 2)))
  }
}
