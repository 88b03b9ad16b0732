package graft

import graft.operators.VectorQueries
import org.scalatest.matchers.should.Matchers

/** Pins for the census-adaptive IVF k2 sizing (r14 verdict item 2):
  * q_vec_knn_graph_ivf's registered oracle bakes bits = 4 (k2 = 16)
  * into IvfOracle.graphSql, which is valid ONLY while the census rule
  * yields 16 on every oracle-checked fixture. This spec pins
  *
  *  1. the rule arithmetic itself (next power of two ≥ √maxClass,
  *     floored at 16, capped at 256) at its decision boundaries, and
  *  2. the actual fixture censuses at sf0.001 and sf0.01 — if a driver
  *     fixture regeneration ever pushes a label class past 256 vectors,
  *     this fails loudly instead of the DuckDB hash gate failing
  *     mysteriously.
  *
  * The scale behavior (k2 = 64 at the derived sf1, the √|class| dial
  * that replaced the measured 27×-per-decade fixed-k2 curve) is pinned
  * here arithmetically and measured in SCALE_tier2.json.
  */
class IvfAdaptiveSpec extends SparkTestBase with Matchers {

  test("ivfCellsRule: floor at 16, √ growth in powers of two, cap at 256") {
    // floor: any class up to 256 vectors stays at the r9 constant
    VectorQueries.ivfCellsRule(0L) shouldBe 16
    VectorQueries.ivfCellsRule(1L) shouldBe 16
    VectorQueries.ivfCellsRule(63L) shouldBe 16 // sf0.001 census
    VectorQueries.ivfCellsRule(59L) shouldBe 16 // sf0.01 census
    VectorQueries.ivfCellsRule(218L) shouldBe 16 // sf0.1 census
    VectorQueries.ivfCellsRule(256L) shouldBe 16 // boundary: √256 = 16
    // growth: next power of two ≥ √maxClass
    VectorQueries.ivfCellsRule(257L) shouldBe 32 // √257 ≈ 16.03
    VectorQueries.ivfCellsRule(1024L) shouldBe 32
    VectorQueries.ivfCellsRule(1025L) shouldBe 64
    VectorQueries.ivfCellsRule(2180L) shouldBe 64 // the derived-sf1 census
    VectorQueries.ivfCellsRule(4096L) shouldBe 64
    VectorQueries.ivfCellsRule(4097L) shouldBe 128
    // cap: the codebook must stay broadcastable
    VectorQueries.ivfCellsRule(Long.MaxValue) shouldBe 256
  }

  test("oracle-gate guard: the fixture censuses keep k2 at the baked-in 16") {
    // ALL THREE driver fixtures — sf0.1 especially, whose max class
    // (218) sits closest to the 256 flip point: a regeneration pushing
    // any label class past 256 must fail HERE, not as an opaque DuckDB
    // hash mismatch in the driver's Verify run
    for (dir <- Seq(sfTiny, "/root/testdata/sf0.01", "/root/testdata/sf0.1"))
      withClue(dir) {
        VectorQueries.adaptiveIvfCellsFor(
          Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")) shouldBe 16
      }
  }
}
