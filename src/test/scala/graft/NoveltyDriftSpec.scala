package graft

import graft.operators.{CurationQueries, VectorQueries}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The two round-11 slice monitors pinned against independent truths:
  * q_text_novelty on a crafted split with known shared/new window
  * masses, q_vec_drift against a driver-side scaled-long recomputation
  * of every centroid, cosine, and mean.
  */
class NoveltyDriftSpec extends SparkTestBase with Matchers {

  test("noveltyOn: known shared/new masses attribute exactly") {
    import spark.implicits._
    val block = (0 until 25).map(i => s"w$i").mkString(" ") // 6 windows
    val docs = Seq(
      (1L, block), // standing
      (2L, (0 until 22).map(i => s"s$i").mkString(" ")), // standing, disjoint
      // incoming: copies the standing block (6 known windows) + 14 fresh
      // tokens -> 20 windows total, windows 1..14 novel
      (10L, block + " " + (0 until 14).map(i => s"n$i").mkString(" ")),
      (15L, (0 until 30).map(i => s"f$i").mkString(" ")), // fully novel: 11/11
      (20L, "too short")) // zero windows
      .toDF("doc_id", "text")
    val got = CurationQueries.noveltyOn(docs, col("doc_id") >= 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    got.keySet shouldBe Set(10L, 15L, 20L)
    got(10L) shouldBe ((20L, 14L, Some(0.7)))
    got(15L) shouldBe ((11L, 11L, Some(1.0)))
    got(20L) shouldBe ((0L, 0L, None))
  }

  test("q_vec_drift equals a driver-side scaled-long recomputation") {
    val rows = VectorQueries.vecDrift.query(spark, sfTiny).collect()
    rows should not be empty
    val e = Tables.embeddings(spark, sfTiny)
      .select("label", "vec_id", "embedding").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getSeq[Float](2).toArray))
    val Scale = 17592186044416.0 // 2^44
    def centroid(vs: Seq[Array[Float]]): Array[Double] = {
      val sums = new Array[Long](64)
      vs.foreach(v => (0 until 64).foreach(i => sums(i) += (v(i).toDouble * Scale).toLong))
      sums.map(s => math.round(s / (vs.size.toDouble * Scale) * 1e6) / 1e6)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def inner(x: Array[Double], y: Array[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      math.round(inner(a, b) / math.sqrt(inner(a, a) * inner(b, b)) * 1e6) / 1e6
    }
    val byLabel = e.groupBy(_._1)
    for (row <- rows) {
      val lab = row.getAs[Number](0).longValue
      val (nw, old) = byLabel(lab).partition(_._2 % 5 == 0)
      row.getLong(1) shouldBe old.size.toLong
      row.getLong(2) shouldBe nw.size.toLong
      val cOld = centroid(old.map(_._3).toSeq)
      val cNew = centroid(nw.map(_._3).toSeq)
      row.getDouble(3) shouldBe cos(cOld, cNew) +- 1e-9
      def meanCos(vs: Seq[Array[Float]]): Double = {
        val s = vs.map(v => BigDecimal(cos(v.map(_.toDouble), cOld))).sum
        math.round((s / vs.size).toDouble * 1e6) / 1e6
      }
      row.getDouble(4) shouldBe meanCos(old.map(_._3).toSeq) +- 1e-9
      row.getDouble(5) shouldBe meanCos(nw.map(_._3).toSeq) +- 1e-9
      row.getDouble(6) shouldBe
        (math.round((row.getDouble(4) - row.getDouble(5)) * 1e6) / 1e6) +- 1e-9
    }
  }
}
