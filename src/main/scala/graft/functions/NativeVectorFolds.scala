package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd replacements for the interpreted higher-order-function
  * folds in the vector/LSH hot paths (r16 optimization round, guide §1.2
  * step 2 "per-task work").
  *
  * Spark's array HOFs (zip_with / transform / aggregate) are
  * CodegenFallback: every fold allocates intermediate arrays and evaluates
  * boxed lambda nodes per element. That is invisible at one call, but the
  * LSH family evaluates 96 such folds per embedding (16 tables × 6 bits)
  * and the MinHash family 32 per document — measured as the DOMINANT cost
  * of q_vec_knn_graph_lsh's candidate stage and of bandedSignatures
  * (R16Slice, PERF r16). Each expression here is a fused primitive loop
  * with doGenCode, BIT-IDENTICAL to its HOF reference (same fold order,
  * same null semantics, same 6dp rounding path) — pinned by
  * NativeFoldsSpec against the HOF formulations on the fixtures.
  */
object NativeVectorFolds {
  /** EXACTLY Spark's Round(expr, 6) on DOUBLE (HALF_UP over the
    * Double.toString-canonical BigDecimal, NaN/Inf passthrough) — shared
    * by the interpreted and generated paths of [[PlaneBucket]].
    */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private[functions] def isFloatOrDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Java accessor fragment for element i of an ArrayData known to hold
    * float or double, widened to double. */
  private[functions] def getD(arr: String, elem: DataType, i: String): String = elem match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  private[functions] def elemType(t: DataType): DataType =
    t.asInstanceOf[ArrayType].elementType

  private[functions] def getDEval(arr: ArrayData, elem: DataType, i: Int): Double = elem match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }
}

/** Fused dot product — bit-identical to VectorOps.dot (the zip_with +
  * aggregate HOF): each element widens to double, products accumulate in
  * index order from 0.0; a length mismatch or a null element poisons the
  * fold to NULL exactly as zip_with's null padding does.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  import NativeVectorFolds._

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => isFloatOrDoubleArray(e.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT|DOUBLE> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (et1, et2) = (elemType(left.dataType), elemType(right.dataType))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += getDEval(x, et1, i) * getDEval(y, et2, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val (et1, et2) = (elemType(left.dataType), elemType(right.dataType))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (${getD(a, et1, i)}) * (${getD(b, et2, i)});
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused squared L2 distance — bit-identical to VectorQueries.l2sq (the
  * zip_with + aggregate HOF): d = x − y in double, acc += d·d in index
  * order; length mismatch or null element → NULL.
  */
case class L2Squared(left: Expression, right: Expression) extends BinaryExpression {
  import NativeVectorFolds._

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => isFloatOrDoubleArray(e.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT|DOUBLE> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (et1, et2) = (elemType(left.dataType), elemType(right.dataType))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = getDEval(x, et1, i) - getDEval(y, et2, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val (et1, et2) = (elemType(left.dataType), elemType(right.dataType))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (${getD(a, et1, i)}) - (${getD(b, et2, i)});
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused sign-plane bucket id: for a (bits × dim) weight matrix (a FOLDABLE
  * literal), bit h of the result is set when round6(dot(emb, w[h])) > 0 —
  * bit-identical to the `when(round(VectorOps.dot(...), 6) > 0, 1<<h)`
  * column chain it replaces, including the degenerate cases: an embedding
  * whose length ≠ dim, or containing a null element, poisons every dot to
  * NULL, and the when/otherwise chain then yields bucket 0 (NOT null).
  * One fused bits×dim loop per row instead of `bits` interpreted zip_with
  * + aggregate chains.
  */
case class PlaneBucket(emb: Expression, weightsExpr: Expression) extends BinaryExpression {
  import NativeVectorFolds._

  override def left: Expression = emb
  override def right: Expression = weightsExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = isFloatOrDoubleArray(emb.dataType)
    val wOk = weightsExpr.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => weightsExpr.foldable
      case _ => false
    }
    if (embOk && wOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<FLOAT|DOUBLE>, foldable ARRAY<ARRAY<DOUBLE>>), got " +
        s"(${emb.dataType.simpleString}, ${weightsExpr.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType
  // a NULL embedding yields bucket 0 exactly like the HOF twin (every
  // dot is null, and the when(round(dot) > 0, bit).otherwise(0) chain
  // folds null tests to the otherwise branch) — r16 ADVICE: the native
  // expression previously returned NULL here, silently dropping
  // null-embedding rows from LSH bucket equi-joins instead of colliding
  // them in bucket 0. Strict HOF equivalence restored (NativeFoldsSpec).
  override def nullable: Boolean = false
  override def prettyName: String = "graft_plane_bucket"

  @transient private lazy val weights: Array[Array[Double]] = {
    val ad = weightsExpr.eval(null).asInstanceOf[ArrayData]
    (0 until ad.numElements()).map { h =>
      val row = ad.getArray(h)
      (0 until row.numElements()).map(row.getDouble).toArray
    }.toArray
  }

  /** The shared fold — also the codegen entry (called via reference obj). */
  def bucketOf(x: ArrayData): Int = {
    val et = elemType(emb.dataType)
    val dim = if (weights.isEmpty) 0 else weights(0).length
    val n = x.numElements()
    if (n != dim) return 0 // zip_with pad → null dot → when-otherwise(0) per bit
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return 0; i += 1 }
    var bucket = 0
    var h = 0
    while (h < weights.length) {
      val w = weights(h)
      var acc = 0.0
      var j = 0
      if (et == FloatType) {
        while (j < dim) { acc += x.getFloat(j).toDouble * w(j); j += 1 }
      } else {
        while (j < dim) { acc += x.getDouble(j) * w(j); j += 1 }
      }
      if (round6(acc) > 0) bucket |= (1 << h)
      h += 1
    }
    bucket
  }

  /** Null-tolerant entry shared by eval and codegen. */
  def bucketOfNullable(aOrNull: AnyRef): Int =
    if (aOrNull == null) 0 else bucketOf(aOrNull.asInstanceOf[ArrayData])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    bucketOfNullable(emb.eval(input).asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("planeBucket", this, classOf[PlaneBucket].getName)
    val embGen = emb.genCode(ctx)
    ev.copy(
      code = code"""
        ${embGen.code}
        int ${ev.value} =
          $self.bucketOfNullable(${embGen.isNull} ? null : ${embGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(emb = newLeft, weightsExpr = newRight)
}

/** xxhash64 (seed 42 — Spark's xxhash64 builtin) of every n-token window
  * of a string-token array, in document order: result[i] =
  * xxhash64(concat_ws(' ', toks[i..i+n-1])) — bit-identical to
  * `transform(ngramShingles(toks, n), g -> xxhash64(g))`, including the
  * short-doc case (fewer than n tokens → EMPTY array, so a downstream
  * explode emits no rows) and concat_ws's null handling (null tokens and
  * their separators are skipped).
  *
  * Why native: the HOF chain is interpreted (CodegenFallback) and builds
  * every window STRING — per position a slice array plus a concat of n
  * token copies — before hashing it. Here the tokens are joined ONCE into
  * a byte buffer with space separators and each window hashes a contiguous
  * SLICE of it (windows of adjacent tokens are substrings of the joined
  * document), so per row there is one allocation and zero per-window
  * copying — the guide §4.2 re-slice trick. Used by the 20-token window
  * grain (substring dedup, span provenance, winnow spans) and the
  * 2/3/4-gram curation detectors (repetition, boilerplate, decontam).
  */
case class WindowHashes(child: Expression, nExpr: Expression) extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = nExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (child.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && nExpr.dataType == IntegerType && nExpr.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<STRING>, foldable INT), got " +
        s"(${child.dataType.simpleString}, ${nExpr.dataType.simpleString})")
  }

  @transient private lazy val n: Int = nExpr.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // a NULL token array yields an EMPTY result, exactly like the HOF twin
  // (ngramShingles' when(size(toks) >= n, ...) folds null size to the
  // otherwise-empty branch), so the result is never null
  override def nullable: Boolean = false
  override def prettyName: String = "graft_window_hashes"

  def windowHashesOf(toksOrNull: AnyRef): ArrayData = {
    if (toksOrNull == null) return new GenericArrayData(Array.empty[Long])
    val toks = toksOrNull.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val wins = m - n + 1
    if (wins <= 0) return new GenericArrayData(Array.empty[Long])
    // join all tokens once: bytes + per-token [start, end) offsets
    var anyNull = false
    val bs = new Array[Array[Byte]](m)
    var total = 0
    var i = 0
    while (i < m) {
      if (toks.isNullAt(i)) { anyNull = true }
      else { bs(i) = toks.getUTF8String(i).getBytes; total += bs(i).length }
      i += 1
    }
    val out = new Array[Long](wins)
    if (!anyNull) {
      val joined = new Array[Byte](total + math.max(0, m - 1))
      val starts = new Array[Int](m)
      val ends = new Array[Int](m)
      var off = 0
      i = 0
      while (i < m) {
        if (i > 0) { joined(off) = ' '; off += 1 }
        starts(i) = off
        System.arraycopy(bs(i), 0, joined, off, bs(i).length)
        off += bs(i).length
        ends(i) = off
        i += 1
      }
      var w = 0
      while (w < wins) {
        val s = starts(w)
        out(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          joined, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s,
          ends(w + n - 1) - s, 42L)
        w += 1
      }
    } else {
      // null tokens break window contiguity — assemble per window with
      // concat_ws semantics (nulls and their separators skipped)
      var w = 0
      while (w < wins) {
        var len = 0
        var j = w
        var first = true
        while (j < w + n) {
          if (bs(j) != null) { len += (if (first) 0 else 1) + bs(j).length; first = false }
          j += 1
        }
        val buf = new Array[Byte](len)
        var off = 0
        first = true
        j = w
        while (j < w + n) {
          if (bs(j) != null) {
            if (!first) { buf(off) = ' '; off += 1 }
            System.arraycopy(bs(j), 0, buf, off, bs(j).length)
            off += bs(j).length
            first = false
          }
          j += 1
        }
        out(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
        w += 1
      }
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    windowHashesOf(child.eval(input).asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("windowHashes", this, classOf[WindowHashes].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $self.windowHashesOf(${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, nExpr = newRight)
}

/** All `n` seeded portable min-hashes of a pre-hashed token array in ONE
  * pass: result[i] = min over elements h of (h·(A + AStep·i) + BStep·i)
  * mod SeedMod — bit-identical to n separate
  * `array_min(transform(hs, affine_i))` HOF chains (null elements are
  * skipped exactly as array_min skips them; an empty or all-null input
  * yields NULL, and every downstream element access then reads null just
  * as the per-seed NULL scalars did). Replaces n interpreted transform
  * allocations (n fresh arrays per document) with one primitive loop.
  */
case class PortableMinHashes(child: Expression, nExpr: Expression) extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = nExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && nExpr.dataType == IntegerType && nExpr.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<BIGINT>, foldable INT), got " +
        s"(${child.dataType.simpleString}, ${nExpr.dataType.simpleString})")
  }

  @transient private lazy val n: Int = nExpr.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhashes"

  def minhashesOf(hs: ArrayData): Any = {
    val m = hs.numElements()
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    var j = 0
    while (j < m) {
      if (!hs.isNullAt(j)) {
        seen = true
        val h = hs.getLong(j)
        var i = 0
        while (i < n) {
          val v = (h * (PortableHash.A + PortableHash.AStep * i)
            + PortableHash.BStep * i) % PortableHash.SeedMod
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    minhashesOf(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashes", this, classOf[PortableMinHashes].getName)
    val tmp = ctx.freshName("tmp")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"""
         |Object $tmp = $self.minhashesOf($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, nExpr = newRight)
}

/** Fused 56-bit dHash of a text-byte "image" (q_mm_phash's hash stage) —
  * bit-identical to the interpreted HOF chain it replaces:
  *
  *   codes = transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))
  *   twin codes = transform(codes, (x, i) -> x + 10 + (i % 5 = 0 ? 1 : 0))   [when twin]
  *   pix   = transform(sequence(0, 63), k -> element_at(codes, (k*len) div 64 + 1))
  *   hash  = aggregate(sequence(0, 55), 0L, (acc, b) ->
  *             acc + (pix[(b div 7)*8 + (b%7) + 2] > pix[(b div 7)*8 + (b%7) + 1]
  *                    ? 1L << b : 0L))
  *
  * That chain is CodegenFallback end to end and allocates a length-sized
  * codes array, a 64-slot pix array, and 56 boxed fold steps per row — the
  * dominant cost of q_mm_phash (~5000 hashed media at sf0.1). Here the 64
  * sampled code points read straight off the UTF8String (one code-point
  * walk, no codes array) and the 56 gradient compares run in one primitive
  * loop.
  *
  * Degenerate cases mirror the HOF exactly: an EMPTY text samples nothing
  * (every element_at is null, every compare folds to the otherwise-0
  * branch) → hash 0; a NULL text nulls codes/pix but the aggregate still
  * folds 56 zero terms → hash 0 (so the expression is non-nullable).
  * `twin` (foldable boolean) applies the +10 brightness / +1-per-5th-code
  * re-encode BEFORE sampling, exactly like the HOF twin branch.
  */
case class DHash56(text: Expression, twinExpr: Expression) extends BinaryExpression {
  override def left: Expression = text
  override def right: Expression = twinExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = text.dataType == StringType && twinExpr.dataType == BooleanType && twinExpr.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, foldable BOOLEAN), got " +
        s"(${text.dataType.simpleString}, ${twinExpr.dataType.simpleString})")
  }

  @transient private lazy val twin: Boolean = twinExpr.eval(null).asInstanceOf[Boolean]

  override def dataType: DataType = LongType
  override def nullable: Boolean = false // null/empty text → hash 0, like the HOF fold
  override def prettyName: String = "graft_dhash56"

  def dhashOf(sOrNull: AnyRef): Long = {
    if (sOrNull == null) return 0L
    // code points in character order — ascii(substring(text, i, 1)) is the
    // first code point of the i-th character, and UTF8String characters
    // are code points
    val str = sOrNull.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var cpCount = 0
    var ci = 0
    while (ci < str.length) { cpCount += 1; ci += Character.charCount(str.codePointAt(ci)) }
    if (cpCount == 0) return 0L
    val len = cpCount.toLong
    // the 64 sampled positions are non-decreasing in k, so one forward
    // code-point walk serves all of them
    val pix = new Array[Long](64)
    var k = 0
    var cpIdx = 0 // code-point index of the char at string offset ci
    ci = 0
    var cur = str.codePointAt(0)
    while (k < 64) {
      val want = ((k * len) / 64L).toInt // floor: k*len ≥ 0
      while (cpIdx < want) {
        ci += Character.charCount(cur)
        cur = str.codePointAt(ci)
        cpIdx += 1
      }
      var c = cur.toLong
      if (twin) c += 10L + (if (want % 5 == 0) 1L else 0L)
      pix(k) = c
      k += 1
    }
    var hash = 0L
    var b = 0
    while (b < 56) {
      val base = (b / 7) * 8 + (b % 7)
      if (pix(base + 1) > pix(base)) hash |= (1L << b)
      b += 1
    }
    hash
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    dhashOf(text.eval(input).asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("dhash", this, classOf[DHash56].getName)
    val tGen = text.genCode(ctx)
    ev.copy(
      code = code"""
        ${tGen.code}
        long ${ev.value} = $self.dhashOf(${tGen.isNull} ? null : ${tGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, twinExpr = newRight)
}

/** Index of the first position where two long arrays hold EQUAL non-null
  * elements, or -1 (null arrays, no equal position, or positions past the
  * shorter array). The LSH first-collision dedup primitive (r17): a
  * banded candidate join that carries each doc's full band-signature
  * vector can emit a colliding pair ONLY at its first matching band —
  * making the join output distinct-by-construction and deleting the
  * 21M-row pair distinct that dominated the near-dedup family (null band
  * sigs never match, exactly like the join's sig = sig2 null semantics).
  */
case class FirstEqualIndex(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<BIGINT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false // null input → -1, like "no collision"
  override def prettyName: String = "graft_first_eq"

  def firstEqOf(aOrNull: AnyRef, bOrNull: AnyRef): Int = {
    if (aOrNull == null || bOrNull == null) return -1
    val a = aOrNull.asInstanceOf[ArrayData]
    val b = bOrNull.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) return i
      i += 1
    }
    -1
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    firstEqOf(left.eval(input).asInstanceOf[AnyRef], right.eval(input).asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("firstEq", this, classOf[FirstEqualIndex].getName)
    val aGen = left.genCode(ctx)
    val bGen = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${aGen.code}
        ${bGen.code}
        int ${ev.value} = $self.firstEqOf(
          ${aGen.isNull} ? null : ${aGen.value},
          ${bGen.isNull} ? null : ${bGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused SimHash fingerprint over a doc's PORTABLE token hashes —
  * bit-identical to the explode → wideHash → 62-conditional-sum groupBy
  * formulation it replaces (q_dedup_simhash): for bit i, tokens vote
  * +1/−1 by bit i of wideHash(h) and the fingerprint sets bit i when the
  * vote sum is positive. One primitive loop per row, NO explode and NO
  * shuffle (the old shape shuffled every (doc, token) row into a 62-sum
  * hash aggregate). Null ELEMENTS vote −1 on every bit, exactly like the
  * when(bit = 1, 1).otherwise(−1) chain (a null bit test folds to the
  * otherwise branch); a NULL array is null (the caller filters empty/null
  * token sets first, mirroring explode's emit-nothing). wideHash is
  * PortableHash's two affine scrambles verbatim — exact long arithmetic,
  * so the DuckDB hash-match oracle is untouched.
  */
case class SimhashFp(hsExpr: Expression, nBitsExpr: Expression) extends BinaryExpression {
  override def left: Expression = hsExpr
  override def right: Expression = nBitsExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (hsExpr.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && nBitsExpr.dataType == IntegerType && nBitsExpr.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<BIGINT>, foldable INT), got " +
        s"(${hsExpr.dataType.simpleString}, ${nBitsExpr.dataType.simpleString})")
  }

  @transient private lazy val nBits: Int = nBitsExpr.eval(null).asInstanceOf[Int]

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_fp"

  def fpOf(hs: ArrayData): Long = {
    import PortableHash.{Scramble1Add, Scramble1Mul, Scramble2Add, Scramble2Mul, SeedMod}
    val n = hs.numElements()
    val counts = new Array[Int](nBits)
    var j = 0
    while (j < n) {
      if (hs.isNullAt(j)) {
        // null token hash: every bit test is null → the otherwise(−1) branch
        var i = 0
        while (i < nBits) { counts(i) -= 1; i += 1 }
      } else {
        val h = hs.getLong(j)
        val w = ((h * Scramble1Mul + Scramble1Add) % SeedMod) * 2147483648L +
          ((h * Scramble2Mul + Scramble2Add) % SeedMod)
        var i = 0
        while (i < nBits) {
          if (((w >> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < nBits) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    fpOf(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashFp", this, classOf[SimhashFp].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $self.fpOf($a);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(hsExpr = newLeft, nBitsExpr = newRight)
}
