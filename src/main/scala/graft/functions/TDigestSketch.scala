package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** UDAF: mergeable t-digest quantile sketch (Dunning's merging variant) —
  * completes the sketch family (bloom / count-min / HLL) with the
  * quantile member every telemetry pipeline needs. Buffer is a bounded
  * centroid list ((mean, weight) pairs) plus a raw-point staging area of
  * ≤ 4·δ entries, so at 100 TB each (group × partition) ships a few-KB
  * digest instead of its raw values, partials merge associatively
  * map-side, and a single reducer folds per-group digests — the same
  * partial-aggregate shape as sum(), at any cardinality.
  *
  * Compression uses the k1-ish weight bound w(q) ≤ 4·N·q(1-q)/δ: centroid
  * capacity shrinks toward the tails, which is what makes extreme
  * quantiles (p99) tight while the median stays within ~1/δ rank error.
  * Estimates depend on merge order (like every t-digest), so correctness
  * is a SketchSpec rank-error bound vs exact percentiles plus a
  * partitioning-invariance tolerance, not a hash oracle.
  *
  * Buffer layout (r16): (means, weights, len, base) — entries [0, base)
  * are the compressed digest, [base, len) the PENDING raw points, and
  * compression fires when the pending region reaches 4·δ entries
  * (Dunning's MergingDigest staging-buffer design). The r15 version
  * triggered on TOTAL length > 4·δ, but the greedy weight-bound merge
  * stabilizes ABOVE that length on uniform data (measured: 597 centroids
  * at δ=100, n=100k), so once past the fixed point EVERY append
  * re-compressed the whole digest — 95,383 compress calls for 100k rows,
  * ~25 µs/row, the entire cost of q_sketch_quantile (~3 s at sf0.1).
  * Amortized staging compresses every 4·δ appends regardless of the
  * digest's fixed-point size: ~250 compress calls for the same 100k rows.
  * Entries past `len` are garbage; every consumer slices to `len` first.
  * The per-row reduce writes one slot (the r15 `:+` copied the whole
  * buffer per row).
  */
class TDigestSketch(compression: Int, quantiles: Seq[Double])
    extends Aggregator[Double, (Array[Double], Array[Double], Int, Int), Seq[Double]] {

  private val maxPending = 4 * compression

  override def zero: (Array[Double], Array[Double], Int, Int) =
    (Array.empty, Array.empty, 0, 0)

  override def reduce(b: (Array[Double], Array[Double], Int, Int),
      x: Double): (Array[Double], Array[Double], Int, Int) = {
    var (means, weights, len, base) = b
    if (means.length <= len) { // zero / post-compress / post-deserialize / increment boundary: grow
      // quarter-staging growth increments (r16 ADVICE): the buffer
      // encoder serializes the FULL capacity arrays — garbage slots past
      // `len` included — so a group shuffled mid-staging shipped up to
      // 4·δ garbage doubles per array (~6.4 KB at δ=100) under full-
      // staging growth. δ-sized increments cap the dead region at ~δ
      // slots for three extra amortized array copies per 4·δ-append
      // staging cycle (noise next to the appends themselves). Capacity
      // never changes WHICH compress calls fire, so estimates are
      // bit-identical either way.
      val cap = math.max(len + maxPending / 4 + 1, len + 1)
      means = java.util.Arrays.copyOf(means, cap)
      weights = java.util.Arrays.copyOf(weights, cap)
    }
    means(len) = x
    weights(len) = 1.0
    val n = len + 1
    if (n - base >= maxPending) {
      val (cm, cw) = compress(java.util.Arrays.copyOf(means, n), java.util.Arrays.copyOf(weights, n))
      (cm, cw, cm.length, cm.length)
    } else (means, weights, n, base)
  }

  override def merge(a: (Array[Double], Array[Double], Int, Int),
      b: (Array[Double], Array[Double], Int, Int)): (Array[Double], Array[Double], Int, Int) = {
    val (cm, cw) = compress(
      java.util.Arrays.copyOf(a._1, a._3) ++ java.util.Arrays.copyOf(b._1, b._3),
      java.util.Arrays.copyOf(a._2, a._3) ++ java.util.Arrays.copyOf(b._2, b._3))
    (cm, cw, cm.length, cm.length)
  }

  /** Sort by mean, then greedily merge adjacent centroids while the
    * combined weight stays under the scale-function bound at the
    * centroid's quantile midpoint. */
  private def compress(means: Array[Double], weights: Array[Double]): (Array[Double], Array[Double]) = {
    if (means.length <= 1) return (means, weights)
    val order = means.indices.sortBy(means(_))
    val total = weights.sum
    val om = new scala.collection.mutable.ArrayBuffer[Double](compression)
    val ow = new scala.collection.mutable.ArrayBuffer[Double](compression)
    var curMeanW = means(order.head) * weights(order.head)
    var curW = weights(order.head)
    var cum = 0.0 // weight fully to the left of the current centroid
    for (idx <- order.tail) {
      val w = weights(idx)
      val q = (cum + (curW + w) / 2) / total
      val limit = 4.0 * total * q * (1 - q) / compression
      if (curW + w <= limit) {
        curMeanW += means(idx) * w
        curW += w
      } else {
        om += curMeanW / curW; ow += curW
        cum += curW
        curMeanW = means(idx) * w; curW = w
      }
    }
    om += curMeanW / curW; ow += curW
    (om.toArray, ow.toArray)
  }

  /** Interpolate each requested quantile over the cumulative centroid
    * weights (midpoint rule). */
  override def finish(r: (Array[Double], Array[Double], Int, Int)): Seq[Double] = {
    val (means0, weights0) = compress(
      java.util.Arrays.copyOf(r._1, r._3), java.util.Arrays.copyOf(r._2, r._3))
    if (means0.isEmpty) return quantiles.map(_ => 0.0)
    val n = means0.length
    val total = weights0.sum
    // cumulative weight at each centroid's midpoint
    val mid = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { mid(i) = acc + weights0(i) / 2; acc += weights0(i); i += 1 }
    quantiles.map { q =>
      val target = q * total
      if (target <= mid(0)) means0(0)
      else if (target >= mid(n - 1)) means0(n - 1)
      else {
        val j = mid.indexWhere(_ >= target)
        val (m0, m1) = (mid(j - 1), mid(j))
        val frac = (target - m0) / (m1 - m0)
        means0(j - 1) + frac * (means0(j) - means0(j - 1))
      }
    }
  }

  override def bufferEncoder: Encoder[(Array[Double], Array[Double], Int, Int)] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
