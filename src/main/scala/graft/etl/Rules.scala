package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.roundStable

/** Declarative data-quality rules (the Deequ/Great-Expectations idea,
  * Schelter et al. VLDB'18): a rule set is DATA, the evaluation is ONE
  * aggregation — the contract gate a 100 TB feed runs before anything
  * downstream trusts it, generalizing the fixed checks of
  * `Aggregates.validate` / `AirQualityPipeline.validateOrFail`.
  *
  * Every rule — including uniqueness — evaluates in a SINGLE scan:
  * row-level rules are conditional counts, uniqueness is
  * `count(*) − countDistinct(struct(cols))` folded into the same
  * aggregation (Catalyst plans the distincts through one Expand, row
  * multiplier = #unique-rules + 1 — bounded and explicit, the
  * `Profile` trade). The wide one-row result explodes to the long-form
  * report map-side. A per-rule loop would rescan the table per rule;
  * this never reads it twice.
  *
  * Violation semantics (each rule counts ONLY its own failure mode, so
  * reports compose): `NotNull` counts nulls; `InRange`/`InSet`/
  * `MatchesRegex` count non-null values outside the contract (nulls are
  * `NotNull`'s job — a null is not "out of range"); `Unique` counts
  * duplicate rows beyond each first occurrence.
  */
object Rules {

  sealed trait Rule {
    def ruleName: String
    def target: String
  }
  final case class NotNull(column: String) extends Rule {
    val ruleName = "not_null"; val target = column
  }
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Rule {
    val ruleName = "in_range"; val target = column
  }
  final case class InSet(column: String, allowed: Seq[String]) extends Rule {
    val ruleName = "in_set"; val target = column
  }
  final case class MatchesRegex(column: String, pattern: String)
      extends Rule {
    val ruleName = "matches_regex"; val target = column
  }
  final case class Unique(columns: Seq[String]) extends Rule {
    val ruleName = "unique"; val target = columns.mkString(",")
  }

  /** One row per rule: `rule`, `target`, `n_violations`, `n_rows`,
    * `violation_rate`, `passed` — sorted-by-caller, joinable by
    * (rule, target) into alerting.
    */
  def check(df: DataFrame, rules: Seq[Rule], digits: Int = 6): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val viol: Seq[Column] = rules.zipWithIndex.map { case (r, i) =>
      val c = r match {
        case NotNull(column) =>
          sum(when(col(column).isNull, 1L).otherwise(0L))
        case InRange(column, lo, hi) =>
          sum(when(col(column).isNotNull &&
            (col(column) < lo || col(column) > hi), 1L).otherwise(0L))
        case InSet(column, allowed) =>
          sum(when(col(column).isNotNull &&
            !col(column).isin(allowed: _*), 1L).otherwise(0L))
        case MatchesRegex(column, pattern) =>
          sum(when(col(column).isNotNull &&
            !col(column).rlike(pattern), 1L).otherwise(0L))
        case Unique(columns) =>
          count(lit(1)) - countDistinct(struct(columns.map(col): _*))
      }
      c.as(s"__v_$i")
    }
    val row = df.agg(viol.head, (viol.tail :+ count(lit(1)).as("__n")): _*)
    val items = array(rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.ruleName).as("rule"), lit(r.target).as("target"),
        col(s"__v_$i").as("__v"))
    }: _*)
    row.select(col("__n").as("n_rows"), explode(items).as("m"))
      .select(col("m.rule").as("rule"), col("m.target").as("target"),
        col("m.__v").as("n_violations"), col("n_rows"),
        roundStable(col("m.__v").cast("double") /
          greatest(col("n_rows"), lit(1L)), digits).as("violation_rate"),
        (col("m.__v") === 0L).as("passed"))
  }

  /** Referential-integrity audit across tables — the CROSS-table rule
    * [[check]]'s single-scan contract can't express: for each declared
    * (child.fk → parent.pk) relation, how many child rows point at a
    * parent that does not exist. NULL foreign keys are counted
    * SEPARATELY, not as orphans — a null FK is a nullability question
    * (`NotNull`'s jurisdiction), an orphan is a broken pointer; mixing
    * them hides whichever is rarer.
    *
    * Shape per relation: the child aggregates to its DISTINCT non-null
    * key values first (orphanhood is a property of the KEY — the
    * 100 TB child table reduces before any join), then one left join
    * against the parent's distinct keys; child-row counts come from
    * the same pre-aggregation. Output one row per relation, unioned —
    * a ≤ #relations-row report.
    */
  def fkAudit(relations: Seq[(String, DataFrame, Column, DataFrame, Column)],
              digits: Int = 6): DataFrame = {
    require(relations.nonEmpty, "need at least one relation")
    relations.map { case (name, child, fk, parent, pk) =>
      val childKeys = child
        .groupBy(fk.as("__k"))
        .agg(count(lit(1)).as("__cnt"))
      val nullRow = childKeys.filter(col("__k").isNull)
        .agg(coalesce(sum(col("__cnt")), lit(0L)).as("__nulls"))
      val parents = parent.select(pk.as("__k")).distinct()
        .withColumn("__hit", lit(1))
      val joined = childKeys.filter(col("__k").isNotNull)
        .join(parents, Seq("__k"), "left")
        .agg(coalesce(sum(col("__cnt")), lit(0L)).as("__n"),
          coalesce(sum(when(col("__hit").isNull, col("__cnt"))
            .otherwise(0L)), lit(0L)).as("__orphans"))
      joined.crossJoin(nullRow)
        .select(lit(name).as("relation"),
          col("__n").as("n_child"),
          col("__nulls").as("n_null_fk"),
          col("__orphans").as("n_orphans"),
          roundStable(when(col("__n") > 0,
            col("__orphans").cast("double") / col("__n")), digits)
            .as("orphan_rate"))
    }.reduce(_ unionByName _)
  }

  /** Functional-dependency audit — for each declared candidate
    * `det → dep`, HOW BADLY the dependency is violated: the
    * Kivinen-Mannila g₃ measure (the minimum fraction of rows that
    * would have to be deleted for the FD to hold exactly —
    * `1 − Σ_det max_dep count / N`), plus the count of determinant
    * values that map to more than one dependent. g₃ = 0 certifies the
    * dependency (a candidate key, a derivable column); a small g₃
    * localizes dirty rows; a large one refutes the assumed schema
    * invariant before a downstream join dedups on it.
    *
    * Shape per pair: one (det, dep) cell aggregation (the 100 TB table
    * reduces to its distinct cells first), one per-det aggregation over
    * cells, one global fold — no joins, no windows over data. NULL
    * determinants are excluded (an FD predicates on a value being
    * present — [[fkAudit]]'s jurisdiction); a NULL dependent counts as
    * a distinct value (two rows with dep NULL and 'x' DO violate).
    * Output one row per pair, unioned.
    */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)],
              digits: Int = 6): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate dependency")
    pairs.map { case (det, dep) =>
      val cells = df.filter(col(det).isNotNull)
        .groupBy(col(det).as("__det"), col(dep).as("__dep"))
        .agg(count(lit(1)).as("__c"))
      val perDet = cells.groupBy(col("__det"))
        .agg(sum(col("__c")).as("__tot"), max(col("__c")).as("__mx"),
          count(lit(1)).as("__ndep"))
      perDet.agg(
          count(lit(1)).as("__ndet"),
          coalesce(sum(col("__tot")), lit(0L)).as("__n"),
          coalesce(sum(when(col("__ndep") > 1, 1L).otherwise(0L)), lit(0L))
            .as("__viol"),
          coalesce(sum(col("__mx")), lit(0L)).as("__keep"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("__ndet").as("n_det"), col("__n").as("n_rows"),
          col("__viol").as("violating_det"),
          roundStable(when(col("__n") > 0,
            lit(1.0) - col("__keep").cast("double") /
              col("__n").cast("double")), digits).as("g3"))
    }.reduce(_ unionByName _)
  }
}
