package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, ExprId, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules for the custom as-of join node — the `Rule
  * [LogicalPlan]` tier of the extension surface. Catalyst's own
  * predicate pushdown and column pruning only understand built-in
  * nodes, so without these a `WHERE` above `graft_asof` scans BOTH
  * parquet sides in full and merge-walks rows the filter then throws
  * away — at 100 TB the difference between reading a partition and
  * reading the lake. AsOfJoinSpec pins both rewrites and the
  * semantics-preserving boundaries. */
object AsOfPushdownRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Push deterministic conjuncts that reference only LEFT attributes
    * below the join (each left row's match is independent of other left
    * rows, so filtering before ≡ after). Conjuncts over the left JOIN
    * KEYS additionally prune the RIGHT side with the key-substituted
    * predicate: equality means a right row whose key fails the
    * predicate can only match a left row the left copy already dropped.
    * (Null keys: such left rows fail the pushed predicate above and
    * below alike, so dropping their would-be partners changes nothing.)
    * Predicates touching right-side (match-or-null) attributes NEVER
    * move — filtering candidates would change WHICH right row is the
    * as-of match, not just drop outputs. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (leftOnly, keep) = conjuncts.partition(c =>
        c.deterministic && c.references.subsetOf(a.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val keyMap: Map[ExprId, Attribute] =
          a.leftKeys.zip(a.rightKeys).collect {
            case (l: AttributeReference, r: AttributeReference) =>
              l.exprId -> r
          }.toMap
        val rightCopies = leftOnly
          .filter(_.references.forall(att => keyMap.contains(att.exprId)))
          .map(_.transform {
            case att: AttributeReference if keyMap.contains(att.exprId) =>
              keyMap(att.exprId)
          })
        val newLeft = Filter(leftOnly.reduce(And), a.left)
        val newRight = rightCopies.reduceOption(And)
          .map(Filter(_, a.right)).getOrElse(a.right)
        val pushed = a.copy(left = newLeft, right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Prune unused columns INTO the as-of join's children: a Project above
  * the node keeps only what it names, so each child needs just (used
  * payload ∪ its keys ∪ its order columns) — the rest never leaves the
  * parquet footer (`ReadSchema` shrinks). Fires only when it strictly
  * narrows a child, so the fixed-point terminates. */
object AsOfColumnPruningRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, a: AsOfJoinPlan) =>
      val used = p.references
      val mustL = a.leftKeys.flatMap(_.references) ++
        a.leftOrder.flatMap(_.references)
      val mustR = a.rightKeys.flatMap(_.references) ++
        a.rightOrder.flatMap(_.references)
      val neededL = a.left.output.filter(att =>
        used.contains(att) || mustL.exists(_.exprId == att.exprId))
      val neededR = a.right.output.filter(att =>
        used.contains(att) || mustR.exists(_.exprId == att.exprId))
      if (neededL.length == a.left.output.length &&
          neededR.length == a.right.output.length) p
      else {
        val newLeft =
          if (neededL.length == a.left.output.length) a.left
          else Project(neededL, a.left)
        val newRight =
          if (neededR.length == a.right.output.length) a.right
          else Project(neededR, a.right)
        p.copy(child = a.copy(left = newLeft, right = newRight))
      }
  }
}
