package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** UDAF: element-wise mean of fixed-width float vectors
  * (SURVEY.md §2.B q_vec_centroid). Buffer is (running double sums, count);
  * merge is associative+commutative so Spark combines partial aggregates
  * map-side — at 100 TB this shuffles one 64-double buffer per (group ×
  * partition), never raw vectors. Output rounded to 4dp (float-sum order
  * still varies with partitioning, hence golden/property tests rather than
  * a hash oracle — SURVEY.md §2.B).
  */
class VectorCentroid(dim: Int) extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (sa, na) = a
    val (sb, nb) = b
    var i = 0
    while (i < dim) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] = {
    val (sums, n) = r
    if (n == 0) Seq.fill(dim)(0.0)
    else sums.map(s => BigDecimal(s / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
