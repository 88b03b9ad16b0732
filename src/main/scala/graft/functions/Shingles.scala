package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst table-generating function (UDTF): emit all n-token
  * shingles of a token array as rows — the third extension-point leg next
  * to the scalar Expression (CosineSimilarity) and the Aggregator
  * (VectorCentroid); SURVEY.md §2.B "UDTF surface" notes a custom Generator
  * as the alternative to flatMap-style shingling.
  *
  * `graft_shingles(tokens, n)` → rows of one string column `shingle`
  * (space-joined n consecutive tokens). Second argument must be a foldable
  * positive int. Falls back to interpreted eval inside GenerateExec
  * (generators aren't whole-stage-codegen'd for the emit loop anyway).
  */
case class Shingles(tokens: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, n)

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, n.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if n.foldable =>
        val k = n.eval().asInstanceOf[Int]
        if (k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be ≥ 1, got $k")
      case (t, nt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<STRING>, foldable INT), got (${t.simpleString}, ${nt.simpleString})")
    }

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def prettyName: String = "graft_shingles"

  private lazy val k: Int = n.eval().asInstanceOf[Int]
  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input)
    if (arr == null) Nil
    else {
      val a = arr.asInstanceOf[ArrayData]
      val m = a.numElements() - k + 1
      if (m <= 0) Nil
      else (0 until m).map { i =>
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = a.getUTF8String(i + j); j += 1 }
        InternalRow(UTF8String.concatWs(space, parts: _*))
      }
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren(0), n = newChildren(1))
}
