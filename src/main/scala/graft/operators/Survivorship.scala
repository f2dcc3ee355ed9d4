package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the step AFTER dedup clustering
  * (q66/q69 pick which rows belong together; this picks WHICH VALUES
  * survive the merge): per cluster, each attribute resolves by a named
  * rule, every rule with a deterministic total tiebreak so the golden
  * record is replayable on any engine.
  *
  * Rules: `latest` (max order column, value as tiebreak), `longest`
  * (string length, then lexicographic), `max` / `min` (value order),
  * `most_frequent` (modal value — count, then lexicographic). NULLs
  * never win: every rule orders by a null-guarded struct, so a cluster
  * with any non-null value for an attribute surfaces one.
  *
  * Shape: all single-row rules fold into ONE aggregation via `max_by`
  * over tiebreak structs; each `most_frequent` attribute costs one
  * extra (cluster, value) count agg joined back (mode needs per-value
  * counts — a different grouping, inherently). No windows, no sort of
  * cluster contents.
  */
object Survivorship {

  sealed trait Rule { def attr: String }
  final case class Latest(attr: String, orderCol: String) extends Rule
  final case class Longest(attr: String) extends Rule
  final case class MaxVal(attr: String) extends Rule
  final case class MinVal(attr: String) extends Rule
  final case class MostFrequent(attr: String) extends Rule

  /** One row per cluster: `clusterCol`, each rule's surviving value
    * under its attr name, plus `n_members`.
    */
  def golden(df: DataFrame, clusterCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.attr).distinct.size == rules.size,
      "one rule per attribute")
    val simple = rules.filter(!_.isInstanceOf[MostFrequent])
    val modal = rules.collect { case m: MostFrequent => m }
    val aggs = simple.map {
      case Latest(a, ord) =>
        max_by(col(a), when(col(a).isNotNull,
          struct(col(ord), col(a)))).as(a)
      case Longest(a) =>
        max_by(col(a), when(col(a).isNotNull,
          struct(length(col(a)), col(a)))).as(a)
      case MaxVal(a) => max(col(a)).as(a)
      case MinVal(a) => min(col(a)).as(a)
      case m: MostFrequent => throw new IllegalStateException(m.toString)
    } :+ count(lit(1)).as("n_members")
    val base = df.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
    modal.foldLeft(base) { case (acc, MostFrequent(a)) =>
      val counts = df.filter(col(a).isNotNull)
        .groupBy(col(clusterCol), col(a))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col(clusterCol))
        .agg(max_by(col(a), struct(col("__n"), col(a))).as(a))
      acc.join(counts, Seq(clusterCol), "left")
    }
  }
}
