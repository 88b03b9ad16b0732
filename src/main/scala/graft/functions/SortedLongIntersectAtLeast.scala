package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Threshold-aware |a ∩ b|: merge-scan that bails out with -1 the moment
  * the best still-achievable intersection (`matched + min(remaining)`)
  * drops below `minRequired`. For a similarity join at threshold t the
  * caller passes minRequired = ⌈t·(|a|+|b|)/(1+t)⌉; dissimilar pairs — the
  * overwhelming majority — exit after a fraction of the scan, and -1 can
  * never pass the downstream Jaccard filter, so results are unchanged.
  * Precondition: sorted ascending, duplicate-free.
  */
case class SortedLongIntersectAtLeast(left: Expression, right: Expression, minRequired: Expression)
    extends TernaryExpression {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = minRequired

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (arraysOk && minRequired.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>, INT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}, ${minRequired.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_at_least"

  override protected def nullSafeEval(a: Any, b: Any, m: Any): Any =
    SortedMerge.countLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) =>
      SortedMerge.genCountLong(ctx.freshName, a, b, m, ev.value.toString))

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(left = newFirst, right = newSecond, minRequired = newThird)
}
