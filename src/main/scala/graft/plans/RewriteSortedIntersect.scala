package graft.plans

import graft.functions.{SortedIntersectSize, SortedLongIntersectSize}
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Expression, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, LongType, StringType}

/** Optimizer rule: `size(array_intersect(a, b))` where both sides are
  * syntactically `sort_array(array_distinct(…))` is rewritten to the native
  * merge-scan intersect expression — users write plain built-ins and the
  * engine upgrades the hot pair loop (SURVEY.md §4.2's "custom Rule" slot).
  *
  * Safety: the pattern itself proves the sorted+distinct precondition;
  * set-semantics of array_intersect equal the merge count on distinct
  * inputs, and both return null on null input (the rewrite is skipped under
  * legacySizeOfNull, whose -1-on-null contract differs). The rewrite also
  * requires containsNull = false element types: sort_array puts null
  * elements first and the merge expressions read slots with getUTF8String/
  * getLong (NPE / garbage on a null slot), and array_intersect's
  * null-matching semantics differ — engine-internal rewrites still fire
  * because split() yields containsNull = false.
  */
object RewriteSortedIntersect extends Rule[LogicalPlan] {

  private def sortedDistinct(e: Expression): Boolean = e match {
    case SortArray(ArrayDistinct(_), Literal(true, BooleanType)) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(ArrayIntersect(a, b), false) if sortedDistinct(a) && sortedDistinct(b) =>
      (a.dataType, b.dataType) match {
        case (ArrayType(StringType, false), ArrayType(StringType, false)) => SortedIntersectSize(a, b)
        case (ArrayType(LongType, false), ArrayType(LongType, false)) => SortedLongIntersectSize(a, b)
        case _ => s
      }
  }
}
