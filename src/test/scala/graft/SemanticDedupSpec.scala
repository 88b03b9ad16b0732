package graft

import graft.operators.DedupQueries
import org.scalatest.matchers.should.Matchers

/** q_dedup_semantic. The DuckDB oracle owns value equality; this pins
  * the SemDeDup rule itself (driver-side recount from raw cosines) and
  * measures the cross-cell miss fraction — the approximation the
  * operator deliberately makes vs the exact q_dedup_embed pair set.
  */
class SemanticDedupSpec extends SparkTestBase with Matchers {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    math.round(d / math.sqrt(na * nb) * 1e6) / 1e6
  }

  test("keep flags match a brute-force recount of the per-pair rule") {
    val out = DedupQueries.dedupSemantic.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    val embs = Tables.embeddings(spark, sfTiny)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    embs.length shouldBe out.size
    var drops = 0
    embs.foreach { case (v, ev) =>
      val (c0v, c1v, keep) = out(v)
      val expectKeep = !embs.exists { case (u, eu) =>
        val (c0u, c1u, _) = out(u)
        u < v && (c0u == c0v || c1u == c1v) && cos(eu, ev) >= 0.4
      }
      assert(keep == expectKeep, s"vec $v keep=$keep, recount $expectKeep")
      if (!expectKeep) drops += 1
    }
    assert(drops > 0, "no vector dropped -- the rule is untested on this fixture")
    info(s"$drops of ${embs.length} vectors dropped")
  }

  test("cross-cell miss fraction vs the exact pair set is measured and bounded") {
    val cells = DedupQueries.dedupSemantic.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    val embs = Tables.embeddings(spark, sfTiny)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // exact tau-pair set, brute force
    val exactPairs = for {
      (a, ea) <- embs; (b, eb) <- embs if a < b && cos(ea, eb) >= 0.4
    } yield (a, b)
    exactPairs should not be empty
    val inCell = exactPairs.count { case (a, b) =>
      cells(a)._1 == cells(b)._1 || cells(a)._2 == cells(b)._2
    }
    val frac = inCell.toDouble / exactPairs.length
    // data-oblivious hyperplanes on the near-orthogonal fixture (tau=0.4
    // -> per-table collision ~(1-acos(.4)/pi)^3~0.25; two-table union
    // measured ~0.36-0.43); floor below the measured band
    assert(frac >= 0.25, f"only $frac%.2f of exact tau-pairs share a cell")
    info(f"$inCell/${exactPairs.length} exact tau-pairs in-cell (${frac * 100}%.1f%%)")
  }
}
