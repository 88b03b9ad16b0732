package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native codegen'd Hilbert index — the hot-path form of
  * LayoutQueries.hilbertSparkSql's `aggregate` fold: the same xy2d
  * transform (Wikipedia's public-domain formulation) as a tight Java
  * loop instead of a per-element lambda evaluation. The HOF fold is
  * correct but interpreted (~60 expression-node evals × bits per row —
  * measured 6.5 s for the sf0.1 census); this expression runs inside
  * whole-stage codegen at nanoseconds per row. LayoutSpec pins
  * native ≡ HOF fold ≡ the exhaustive curve properties, and the DuckDB
  * oracle recomputes the fold independently, so the loop cannot drift
  * from the portable formulation.
  *
  * Arguments: x, y BIGINT in [0, 2^bits); bits a foldable INT.
  */
case class HilbertIndex(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == LongType && second.dataType == LongType &&
        third.dataType == IntegerType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT, constant INT), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, ${third.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any, bits: Any): Any =
    HilbertIndex.fold(x.asInstanceOf[Long], y.asInstanceOf[Long], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, b) => s"graft.functions.HilbertIndex.fold($x, $y, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertIndex {
  /** The xy2d loop — shared by interpreted eval and generated code. */
  def fold(x0: Long, y0: Long, bits: Int): Long = {
    val n1 = (1L << bits) - 1
    var x = x0
    var y = y0
    var d = 0L
    var b = bits - 1
    while (b >= 0) {
      val rx = (x >> b) & 1L
      val ry = (y >> b) & 1L
      d += (1L << (2 * b)) * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      b -= 1
    }
    d
  }
}
