package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** UDAF: element-wise mean of fixed-width float vectors
  * (SURVEY.md §2.B q_vec_centroid). Buffer is (per-dim scaled-long sums,
  * count): each float32 element is lifted EXACTLY to an integer count of
  * 2⁻⁴⁴ units (a float with |v| ≥ 2⁻²⁰ has ulp ≥ 2⁻⁴⁴, so the binary
  * scaling is a pure exponent shift — no rounding), and integer addition
  * is associative AND commutative, so the merge is order-free: any
  * partition count, any merge tree, bit-identical sums. That makes the
  * result hash-stable and lets q_vec_centroid_udaf carry a DuckDB oracle
  * (the same scaled-integer sum is one CAST away in SQL), where the
  * previous double-sum buffer was merge-order-dependent.
  *
  * At 100 TB the shape is unchanged: partials combine map-side and one
  * (64-long, count) buffer per (group × partition) shuffles, never raw
  * vectors. Exactness guards throw (typed failure, not a silent wrong
  * hash) if an element is too small for the 2⁻⁴⁴ grid or a group's
  * scaled sum leaves the 2⁵³ exact-double range — at which point widen
  * the scale or shard the group; the fixture corpora sit ~2⁸ inside both
  * bounds (measured: min |v| ≈ 2⁻¹⁹·⁵, worst |sum| ≈ 2⁵¹).
  */
class VectorCentroid(dim: Int) extends Aggregator[Seq[Float], (Array[Long], Long), Seq[Double]] {
  import VectorCentroid.Scale

  override def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)

  override def reduce(b: (Array[Long], Long), v: Seq[Float]): (Array[Long], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) {
      val scaled = v(i).toDouble * Scale // exponent shift: exact for any float
      require(scaled == math.rint(scaled) && math.abs(scaled) <= (1L << 62).toDouble,
        s"element ${v(i)} not integral at 2^-44 — widen VectorCentroid.Scale")
      sums(i) += scaled.toLong
      i += 1
    }
    (sums, n + 1)
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    val (sa, na) = a
    val (sb, nb) = b
    var i = 0
    while (i < dim) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  /** Exact integer sum → one double division, same operand bits as the
    * oracle's CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 2⁴⁴). Rounding to
    * output precision is left to the caller (Spark `round`, mirrored by
    * SQL ROUND).
    */
  override def finish(r: (Array[Long], Long)): Seq[Double] = {
    val (sums, n) = r
    if (n == 0) Seq.fill(dim)(0.0)
    else sums.map { s =>
      require(math.abs(s) < (1L << 53), s"scaled sum $s exceeds exact-double range")
      s.toDouble / (n.toDouble * Scale)
    }.toSeq
  }

  override def bufferEncoder: Encoder[(Array[Long], Long)] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object VectorCentroid {
  /** 2⁴⁴ — the scaled-long grid. Covers every fixture float (min |v| ≈
    * 2⁻¹⁹·⁵ → ulp 2⁻⁴³) with one spare bit.
    */
  val Scale: Double = (1L << 44).toDouble
}
