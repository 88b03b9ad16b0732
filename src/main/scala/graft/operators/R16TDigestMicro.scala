package graft.operators

/** Throwaway micro-benchmark: TDigestSketch reduce/finish outside Spark,
  * instrumented copy — split append cost from compress cost and count
  * compress invocations (r16).
  */
object R16TDigestMicro {
  val compression = 100
  val maxBuffer = 4 * compression
  var nCompress = 0L
  var tCompress = 0L
  var postSizes = List.empty[Int]

  def compress(means: Array[Double], weights: Array[Double]): (Array[Double], Array[Double]) = {
    val t0 = System.nanoTime()
    nCompress += 1
    if (means.length <= 1) return (means, weights)
    val order = means.indices.sortBy(means(_))
    val total = weights.sum
    val om = new scala.collection.mutable.ArrayBuffer[Double](compression)
    val ow = new scala.collection.mutable.ArrayBuffer[Double](compression)
    var curMeanW = means(order.head) * weights(order.head)
    var curW = weights(order.head)
    var cum = 0.0
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
    tCompress += System.nanoTime() - t0
    if (nCompress % 50 == 0) postSizes = om.length :: postSizes
    (om.toArray, ow.toArray)
  }

  def main(args: Array[String]): Unit = {
    val n = 100000
    val rnd = new java.util.Random(42)
    val xs = Array.fill(n)(rnd.nextDouble() * 1000)
    for (round <- 1 to 3) {
      nCompress = 0; tCompress = 0; postSizes = Nil
      val t0 = System.nanoTime()
      var means = Array.empty[Double]; var weights = Array.empty[Double]; var len = 0
      var i = 0
      while (i < n) {
        if (means.length <= len) {
          val cap = math.max(maxBuffer + 1, len + 1)
          means = java.util.Arrays.copyOf(means, cap)
          weights = java.util.Arrays.copyOf(weights, cap)
        }
        means(len) = xs(i); weights(len) = 1.0
        len += 1
        if (len > maxBuffer) {
          val (cm, cw) = compress(java.util.Arrays.copyOf(means, len), java.util.Arrays.copyOf(weights, len))
          means = cm; weights = cw; len = cm.length
        }
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"R16TD round=$round n=$n secs=$dt%.3f nCompress=$nCompress tCompress=${tCompress / 1e9}%.3f postSizes=${postSizes.take(5)}")
    }
  }
}
