package graft

import graft.operators.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Adversarial hot-BUCKET proof for the LSH candidate self-join (round-7
  * verdict ask #5). DedupSkewSpec already pins hot-LANGUAGE skew; the
  * sharper 100 TB risk is one hot (lang, band, sig) bucket — a
  * near-identical boilerplate corpus where n docs share every band
  * signature and the plain join does all n(n-1)/2 comparisons in ONE
  * task. The spec pins:
  *
  *   1. the fixture is genuinely bucket-hot (one bucket carries the
  *      overwhelming share of total pair mass);
  *   2. the grid split changes NOTHING semantically: candidate pair
  *      set and verified output row-for-row equal to the plain join's;
  *   3. the straggler is bounded and measured: max per-cell enumeration
  *      ≤ ⌈n/k⌉² — a k² cut vs the plain bucket's single n² task — at
  *      k× replication per side of the skinny sig rows.
  */
class HotBandSkewSpec extends SparkTestBase with Matchers {

  private val Hot = 240 // docs sharing one identical token set → 1 bucket/band
  private val Blocks = 8

  /** 240 identical docs (one hot bucket per band) + 160 all-unique docs. */
  private lazy val docs: DataFrame = {
    import spark.implicits._
    val boiler = "this software is provided as is without warranty of any kind"
    (1L to 400L).map { id =>
      val text = if (id <= Hot) boiler else s"u${id}a u${id}b u${id}c u${id}d u${id}e"
      (id, "en", text)
    }.toDF("doc_id", "lang", "text")
  }

  private lazy val sets: DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark) // tokenHash is a registered native fn
    docs.select(col("doc_id"), col("lang"),
      graft.functions.Tokenize.tokenSet(col("text")).as("toks"))
  }

  private lazy val banded: DataFrame =
    DedupQueries.bandedSignatures(sets, bands = 16).select("doc_id", "lang", "band", "sig")

  test("fixture is genuinely bucket-hot: hot buckets dominate total pair mass") {
    val sizes = banded.groupBy("lang", "band", "sig").count()
    val hotMax = sizes.agg(max("count")).head.getLong(0)
    hotMax shouldBe Hot.toLong // identical texts collide in EVERY band → 16 hot buckets
    val pairMass = sizes
      .select((col("count") * (col("count") - 1) / 2).as("m"), col("count"))
      .agg(sum("m").as("total"), sum(when(col("count") >= Hot, col("m"))).as("hot")).head
    // the 16 hot buckets carry ≥ 99% of all candidate comparisons, and any
    // single one is a full n(n-1)/2 task on the plain join
    pairMass.getDouble(1) / pairMass.getDouble(0) should be >= 0.99
  }

  test("grid split preserves the candidate pair set and the verified output exactly") {
    val plain = DedupQueries.minhashBandCandidates(sets)
    val salted = DedupQueries.minhashBandCandidatesSkewSafe(sets, blocks = Blocks)
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
    // and through the exact gate (the full q_dedup_near_salted shape)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val hashed = docs.select(col("doc_id"),
      graft.functions.Tokenize.hashedTokenSet(col("text")).as("toksh"))
    val vPlain = DedupQueries.verifyJaccard(plain, hashed, 1, 2)
      .orderBy("doc_id1", "doc_id2").collect().toSeq
    val vSalted = DedupQueries.verifyJaccard(salted, hashed, 1, 2)
      .orderBy("doc_id1", "doc_id2").collect().toSeq
    vSalted shouldBe vPlain
    vPlain.size shouldBe Hot * (Hot - 1) / 2 // every identical pair verified at J = 1.0
  }

  test("straggler bound: max grid-cell enumeration <= ceil(n/k)^2, a k^2 cut") {
    // reconstruct the operator's grid: cell (x, y) compares block x
    // against block y, so its enumeration mass is n_x · n_y
    val blkSizes = banded
      .withColumn("blk", pmod(col("doc_id"), lit(Blocks)).cast("int"))
      .groupBy("lang", "band", "sig", "blk").count()
    val l = blkSizes.select(col("lang"), col("band"), col("sig"),
      col("blk").as("bi"), col("count").as("nl"))
    val r = blkSizes.select(col("lang").as("lang2"), col("band").as("band2"),
      col("sig").as("sig2"), col("blk").as("bj"), col("count").as("nr"))
    val cells = l.join(r, col("lang") === col("lang2") && col("band") === col("band2")
        && col("sig") === col("sig2"))
      .select((col("nl") * col("nr")).as("m"))
    val maxCell = cells.agg(max("m")).head.getLong(0)
    val bound = math.pow(math.ceil(Hot.toDouble / Blocks), 2)
    maxCell.toDouble should be <= bound
    // and the cut is real vs the plain join's single-task n² enumeration
    (Hot.toDouble * Hot) / maxCell should be >= (Blocks * Blocks / 2.0)
  }

  test("adaptive block sizing bounds the worst cell at the target on ANY census") {
    // the sizing rule on this fixture's census
    val b = DedupQueries.adaptiveBlocksFor(banded, DedupQueries.TargetCellPairs)
    b should be >= 1
    val hotCell = math.ceil(Hot.toDouble / b)
    (hotCell * hotCell) should be <= DedupQueries.TargetCellPairs.toDouble
    // the rule holds one decade of hot-bucket growth up: a 10x hotter
    // bucket gets a bigger grid, worst cell still under budget
    val hot10 = Hot * 10L
    val b10 = math.max(1, math.min(64,
      math.ceil(hot10 / math.sqrt(DedupQueries.TargetCellPairs.toDouble)).toInt))
    b10 should be > b
    val cell10 = math.ceil(hot10.toDouble / b10)
    (cell10 * cell10) should be <= DedupQueries.TargetCellPairs.toDouble * 1.1
    // and the adaptive registration's output equals the fixed-8 grid's
    val adaptive = DedupQueries.minhashBandCandidatesSkewSafe(sets, blocks = b)
    val fixed = DedupQueries.minhashBandCandidatesSkewSafe(sets, blocks = Blocks)
    adaptive.exceptAll(fixed).count() shouldBe 0L
    fixed.exceptAll(adaptive).count() shouldBe 0L
    info(s"census-derived blocks=$b on the fixture, $b10 one decade up")
  }
}
