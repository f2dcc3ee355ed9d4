package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate: the operator tree of every query is part
  * of the perf contract — a silently changed plan (new shuffle, join
  * strategy flip, filter no longer pushed below a window/join) should
  * fail CI even while results stay correct.
  *
  * The fingerprint is the operator TREE SHAPE (node names only) of the
  * optimized logical plan and the pre-adaptive physical plan. Expression
  * strings are deliberately excluded: Spark 4's canonicalization reorders
  * commutative chains (`multicommutativeop`) non-deterministically run to
  * run, so text/hash comparisons of full plans flap. Node shape is stable
  * and is what the perf contract is about.
  *
  * To regenerate after an INTENTIONAL plan change:
  *   REGEN_PLAN_HASHES=1 sbt "testOnly graft.PlanRegressionSpec"
  * and commit the updated plan-shapes.txt with a note on what changed.
  */
class PlanRegressionSpec extends AnyFunSuite {
  import TestSpark._

  private val shapeFile = Paths.get("plan-shapes.txt")

  private def shape(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): String = {
    val kids = p.children.asInstanceOf[Seq[org.apache.spark.sql.catalyst.trees.TreeNode[_]]]
    if (kids.isEmpty) p.nodeName
    else p.nodeName + kids.map(shape).mkString("(", ",", ")")
  }

  private def currentShapes(): Map[String, String] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val qe = fn(spark, sfDir).queryExecution
      name -> s"logical=${shape(qe.optimizedPlan)} physical=${shape(qe.sparkPlan)}"
    }.toMap

  test("query plan shapes match the committed baseline") {
    val current = currentShapes()
    if (sys.env.contains("REGEN_PLAN_HASHES") || !Files.exists(shapeFile)) {
      Files.write(shapeFile,
        current.toSeq.sorted.map { case (k, v) => s"$k $v" }.asJava)
      info(s"wrote ${current.size} plan shapes to $shapeFile")
    } else {
      val baseline = Files.readAllLines(shapeFile).asScala
        .map(_.split(" ", 2)).collect { case Array(k, v) => k -> v }.toMap
      val changed = current.filter { case (k, v) => baseline.get(k).exists(_ != v) }
      changed.foreach { case (k, v) =>
        info(s"$k\n  baseline: ${baseline(k)}\n  current:  $v")
      }
      assert(changed.isEmpty,
        s"plan shapes changed for ${changed.keys.toSeq.sorted.mkString(", ")} — " +
          "if intentional, regenerate with REGEN_PLAN_HASHES=1")
      val missing = current.keySet -- baseline.keySet
      assert(missing.isEmpty,
        s"new queries without a plan baseline: ${missing.toSeq.sorted.mkString(", ")} — " +
          "regenerate with REGEN_PLAN_HASHES=1")
    }
  }
}
