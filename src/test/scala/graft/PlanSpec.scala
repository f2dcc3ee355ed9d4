package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression tests: the physical plans the queries compile
  * to ARE part of the contract at 100 TB — a silent fallback from
  * broadcast to sort-merge, or a lost column pruning, is a perf bug even
  * while results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q20 star join: dimensions broadcast, no sort-merge join") {
    val p = planOf("q20_join_mstar")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("SortMergeJoin"), s"no SMJ expected:\n$p")
  }

  test("q01 scan is column-pruned to the three needed columns") {
    val p = planOf("q01_agg_daily")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("ts") && read.contains("event_type") && read.contains("value"))
    assert(!read.contains("props") && !read.contains("user_id"),
      s"unexpected columns in scan: $read")
  }

  test("q08 per-row projection is a single Project over the scan, no aggregation shuffle") {
    // (AQE's pre-execution plan string hides WholeStageCodegen spans, so
    // assert on shape: Project directly over FileScan, only the output
    // sort's range exchange present.)
    val p = planOf("q08_composite_index")
    assert(!p.contains("HashAggregate"), s"no aggregation expected:\n$p")
    assert(p.linesIterator.count(_.trim.startsWith("+- Exchange")) <= 1,
      s"only the sort exchange expected:\n$p")
  }

  test("q37 cosine top-k: query side broadcast, corpus not shuffled before join") {
    val p = planOf("q37_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"queries must broadcast:\n$p")
  }

  test("q04 IQR clip: group bounds broadcast back (no second full shuffle of the fact side)") {
    val p = planOf("q04_outlier_iqr")
    assert(p.contains("BroadcastHashJoin"), s"bounds join must broadcast:\n$p")
  }

  test("date-partitioned writes give partition pruning on filtered reads") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val ev = Tables.events(spark, sfDir)
      .withColumn("date", org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col("ts")))
    sources.Io.writeParquet(ev, s"$tmp/by_date", partitionBy = Seq("date"))
    val filtered = spark.read.parquet(s"$tmp/by_date")
      .filter("date = DATE'2024-01-05'")
    val scan = filtered.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("2024-01-05") || scan.contains("isnotnull(date"),
      s"expected partition filter in scan, got: $scan")
    assert(filtered.count() > 0)
  }

  test("aggregations are partial+final (map-side combine present)") {
    val p = planOf("q01_agg_daily")
    val aggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs:\n$p")
  }
}
