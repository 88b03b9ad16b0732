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

  override protected def nullSafeEval(a: Any, b: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val need = m.asInstanceOf[Int]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      if (n + math.min(nx - i, ny - j) < need) return -1
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { n += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    if (n < need) -1 else n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val rem = ctx.freshName("rem")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $rem = ($nx - $i < $ny - $j) ? ($nx - $i) : ($ny - $j);
         |  if ($n + $rem < $m) { $n = -1; break; }
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $n++; $i++; $j++; }
         |  else if ($xi < $yj) $i++;
         |  else $j++;
         |}
         |${ev.value} = ($n >= 0 && $n < $m) ? -1 : $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(left = newFirst, right = newSecond, minRequired = newThird)
}
