package graft

import java.nio.file.Files

import graft.operators.MiningQueries
import graft.streaming.IncrementalMine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** IncrementalMine: replay the lineitem baskets in micro-batches (whole
  * baskets per batch — the atomicity contract) and assert the
  * state-served rules/recommendations equal the registered one-shot
  * queries EXACTLY. The split is by basket hash, so frequent items'
  * supports are split across batches — proving the unfiltered-state
  * design (thresholds at serve time) is what makes the merge exact; a
  * maintainer that pre-filtered per batch would drop cross-batch pairs.
  */
class IncrementalMineSpec extends SparkTestBase with Matchers {

  private def rows(df: DataFrame) = df.collect().map(_.toString).toSeq

  test("state-served rules + recs equal their one-shot twins exactly after 3-batch replay") {
    val base = Files.createTempDirectory("graft_incmine").toFile.getAbsolutePath
    val bi = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    for (i <- 0 until 3)
      IncrementalMine.processBatch(spark,
        bi.filter(abs(hash(col("ok"))) % 3 === i), base, Some(i.toLong))
    // three merges -> three state versions
    new java.io.File(base).listFiles().count(_.getName.startsWith("v")) shouldBe 3
    rows(IncrementalMine.serveRules(spark, base)) shouldBe
      rows(MiningQueries.mineRules.query(spark, sfTiny))
    rows(IncrementalMine.serveRecs(spark, base)) shouldBe
      rows(MiningQueries.mineRecs.query(spark, sfTiny))
    // crash-replay of a committed batch is a no-op
    val before = rows(IncrementalMine.serveRecs(spark, base))
    IncrementalMine.processBatch(spark,
      bi.filter(abs(hash(col("ok"))) % 3 === 2), base, Some(2L))
    new java.io.File(base).listFiles().count(_.getName.startsWith("v")) shouldBe 3
    rows(IncrementalMine.serveRecs(spark, base)) shouldBe before
  }

  test("cross-batch frequency: items below threshold in every single batch still pair up") {
    // split so NO item reaches MinItemSup within one batch: per-batch
    // pre-filtering would emit zero pairs; the unfiltered merge must
    // still recover every frequent pair of the union
    val base = Files.createTempDirectory("graft_incmine_x").toFile.getAbsolutePath
    import spark.implicits._
    // 30 baskets each containing items (1, 2): together sup=30 >= 25, but
    // any 3-way split leaves <= 10 per batch
    val bi = (0L until 30L).flatMap(ok => Seq((ok, 1L), (ok, 2L)))
      .toDF("ok", "pk")
    for (i <- 0 until 3)
      IncrementalMine.processBatch(spark,
        bi.filter(col("ok") % 3 === i), base, Some(i.toLong))
    val recs = IncrementalMine.serveRecs(spark, base).collect()
    recs.map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet shouldBe
      Set((1L, 2L, 30L), (2L, 1L, 30L))
    recs.foreach(_.getDouble(4) shouldBe 1.0) // perfect co-occurrence
  }
}
