package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Jaro-Winkler similarity (Winkler 1990, the standard
  * record-linkage string comparator): Jaro similarity — matches inside a
  * max(|s1|,|s2|)/2−1 window, half-transpositions — boosted by the
  * common-prefix term l·p·(1−j) with p = 0.1, prefix cap 4, applied only
  * when jaro > 0.7 (the boost threshold). Parameters and edge cases pin
  * to DuckDB's `jaro_winkler_similarity` (probed: empty-vs-anything = 0,
  * including empty-vs-empty; equal strings = 1; window 0 for 2-char
  * strings), so the oracle is the NATIVE DuckDB function — the two
  * engines implement the algorithm independently and must agree to the
  * printed double. Comparison is per Java char (UTF-16 code unit) while
  * DuckDB walks UTF-8 BYTES — identical on the ASCII fixture, but ANY
  * multi-byte character diverges (e.g. 'é' is one UTF-16 unit here vs
  * two UTF-8 bytes there), not just non-BMP text; oracle-comparing
  * non-ASCII input would need both engines normalized to a common unit
  * (code points).
  *
  * This is the entity-resolution primitive a curation pipeline uses for
  * fuzzy key matching (names, titles, near-identical product strings)
  * where token-set similarity (Jaccard/containment) is blind to
  * character-level edits. Spark has levenshtein() but no Jaro-Winkler;
  * a Scala UDF would black-box the optimizer and pay serialization —
  * this expression runs inside whole-stage codegen (the HilbertIndex
  * pattern: one static method shared by interpreted eval and generated
  * code).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Shared by interpreted eval and generated code. */
  def jw(u1: UTF8String, u2: UTF8String): Double = {
    val s1 = u1.toString
    val s2 = u2.toString
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val lMax = math.min(4, math.min(s1.length, s2.length))
    while (l < lMax && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Jaro similarity with DuckDB's edge conventions (either empty → 0,
    * equal → 1).
    */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var k = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var done = false
      while (!done && k <= hi) {
        if (!m2(k) && s2.charAt(k) == c) {
          m1(i) = true; m2(k) = true; m += 1; done = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars out of relative order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tp = t / 2
    val md = m.toDouble
    (md / l1 + md / l2 + (md - tp) / md) / 3.0
  }
}
