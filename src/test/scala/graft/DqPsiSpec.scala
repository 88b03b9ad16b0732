package graft

import graft.operators.MoreQueries
import org.scalatest.matchers.should.Matchers

/** PSI (q_dq_psi). The DuckDB oracle owns value equality; this pins the
  * metric's calibration: a random split of one distribution reads ≈ 0
  * (below the standard 0.1 "no drift" band), a shifted slice reads far
  * above the 0.25 "major drift" line, and the add-one smoothing keeps
  * empty bins finite.
  */
class DqPsiSpec extends SparkTestBase with Matchers {

  test("fixture random split is stable; bins partition both slices") {
    val rows = MoreQueries.dqPsi.query(spark, sfTiny).collect()
    rows should have length 10
    val psi = rows.head.getAs[Double]("psi")
    assert(psi >= 0 && psi < 0.1, s"random-split psi $psi outside the stable band")
    info(s"fixture psi $psi")
  }

  test("a shifted slice scores major drift; empty bins stay finite") {
    import spark.implicits._
    // even keys ~ U(0..999) cents, odd keys ~ U(2000..2999): disjoint
    // supports — reference bins are empty on the current side and vice
    // versa, the worst case for unsmoothed PSI (infinite)
    val shifted = (0 until 4000).map { i =>
      if (i % 2 == 0) (i.toLong, (i % 1000).toLong)
      else (i.toLong, 2000L + i % 1000)
    }.toDF("k", "xc")
    val rows = MoreQueries.psiFrom(shifted).collect()
    rows should have length 10
    val psi = rows.head.getAs[Double]("psi")
    assert(psi > 0.25, s"disjoint-support psi $psi below the major-drift line")
    rows.foreach { r =>
      assert(!r.getAs[Double]("psi_term").isInfinite
        && !r.getAs[Double]("psi_term").isNaN,
        s"bin ${r.getInt(0)} term not finite")
    }
  }
}
