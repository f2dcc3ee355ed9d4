package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** Logical node for the as-of join (see [[graft.operators.AsOfJoin]] for
  * the operator semantics and its reference points).
  *
  * Why a custom node instead of building the union-window DataFrame
  * directly: Catalyst treats a Window as a barrier for predicate
  * pushdown on anything but the partition key, so a user filter on a
  * left payload column (`asOf(...).filter($"event_id" < n)`) would run
  * AFTER the full |l|+|r| shuffle. For THIS operator that conservatism
  * is unnecessary — each left row's carried value depends only on right
  * rows, never on other left rows — so dropping left rows early is
  * always safe. [[ResolveAsOfJoin]] encodes exactly that: it pushes
  * adjacent left-only filters into the left child, THEN expands the node
  * into union → window → filter → project, inside the same operator-
  * optimization batch — where the standard rules then push the filter
  * (and column pruning) all the way into the left scan.
  */
case class AsOfJoinLogical(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String,
    carryCol: String, outAttr: AttributeReference,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  // outAttr is synthesized by this node, not read from a child —
  // without this, CheckAnalysis reports it as a missing input attribute
  override def producedAttributes: AttributeSet = AttributeSet(Seq(outAttr))
  // the key/time/carry columns are named by STRING parameters, invisible
  // to QueryPlan's expression scan — declare them (plus the passed-through
  // left payload) so ColumnPruning doesn't strip them from the children
  override def references: AttributeSet = AttributeSet(
    left.output ++ right.output.filter(a =>
      a.name == rightKey || a.name == rightTime || a.name == carryCol))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinLogical =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: left-only-filter pushdown through [[AsOfJoinLogical]],
  * then expansion to the union-window plan. Injected by
  * [[graft.GraftExtensions]] into the operator-optimization batch, so
  * Catalyst's own PushDownPredicates moves user filters down to the node
  * within the same fixed-point iteration before this rule sees them.
  */
object ResolveAsOfJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // a filter touching only left-side columns commutes with the as-of
    // join: push it into the left child before expanding
    case Filter(cond, aj: AsOfJoinLogical)
        if cond.references.subsetOf(aj.left.outputSet) &&
          cond.deterministic =>
      expand(aj.copy(left = Filter(cond, aj.left)))
    case aj: AsOfJoinLogical => expand(aj)
  }

  private def expand(aj: AsOfJoinLogical): LogicalPlan = {
    val lOut = aj.left.output
    def find(out: Seq[Attribute], name: String) =
      out.find(a => a.name == name).getOrElse(
        throw new IllegalArgumentException(s"as-of join: no column '$name'"))
    val lKey   = find(lOut, aj.leftKey)
    val lTime  = find(lOut, aj.leftTime)
    val rKey   = find(aj.right.output, aj.rightKey)
    val rTime  = find(aj.right.output, aj.rightTime)
    val rCarry = find(aj.right.output, aj.carryCol)
    val carryType = rCarry.dataType
    // Casts built in the optimizer never pass through ResolveTimeZone —
    // timezone-dependent casts (date/ntz → timestamp) must carry the
    // session zone explicitly or they stay unresolved
    def cast(e: Expression, dt: org.apache.spark.sql.types.DataType): Expression =
      if (e.dataType == dt) e else Cast(e, dt, Some(conf.sessionLocalTimeZone))

    // left side keeps its payload; both sides get (__t, __k, __carry,
    // __isLeft). Union is by position, post-analysis: key/time types are
    // aligned explicitly (no coercion rules run in the optimizer).
    val lProj = Project(lOut ++ Seq(
      Alias(cast(lTime, TimestampType), "__t")(),
      Alias(lKey, "__k")(),
      Alias(Literal.create(null, carryType), "__carry")(),
      Alias(Literal(1), "__isLeft")()), aj.left)
    val rProj = Project(lOut.map(a => Alias(Literal.create(null, a.dataType), a.name)()) ++ Seq(
      Alias(cast(rTime, TimestampType), "__t")(),
      Alias(cast(rKey, lKey.dataType), "__k")(),
      Alias(rCarry, "__carry")(),
      Alias(Literal(0), "__isLeft")()), aj.right)

    val union = Union(Seq(lProj, rProj), false, false)
    val uOut = union.output
    val (uT, uK, uCarry, uIsLeft) =
      (uOut(lOut.size), uOut(lOut.size + 1), uOut(lOut.size + 2), uOut(lOut.size + 3))

    // right rows sort before left rows at equal t (inclusive boundary);
    // equal-time right rows tie-break on the carried value so the
    // survivor is deterministic (max backward, min forward) — same
    // ordering as the DataFrame formulation. Forward = reverse traversal.
    val order =
      if (aj.forward)
        Seq(SortOrder(uT, Descending), SortOrder(uIsLeft, Ascending),
          SortOrder(uCarry, Descending))
      else
        Seq(SortOrder(uT, Ascending), SortOrder(uIsLeft, Ascending),
          SortOrder(uCarry, Ascending))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val carried = Alias(
      WindowExpression(
        AggregateExpression(Last(uCarry, true), Complete, isDistinct = false),
        WindowSpecDefinition(Seq(uK), order, frame)),
      aj.outAttr.name)(exprId = aj.outAttr.exprId)

    val win = Window(Seq(carried), Seq(uK), order, union, None)
    val onlyLeft = Filter(EqualTo(uIsLeft, Literal(1)), win)
    Project(uOut.take(lOut.size) :+ carried.toAttribute, onlyLeft)
  }
}
