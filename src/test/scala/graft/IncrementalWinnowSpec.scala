package graft

import java.nio.file.Files

import graft.operators.TextQueries
import graft.streaming.IncrementalWinnow
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Incremental winnow-index invariant: fingerprints are content-only, so
  * the maintained fp relation over ANY batch split equals the one-shot
  * extraction, and the served match step equals q_text_winnow_pairs
  * exactly — including the global df-cap (a fingerprint pushed over the
  * cap by a LATER batch must drop out of matches retroactively). State
  * runs the log-record CAS protocol: replays land nothing, concurrent
  * writers lose nothing.
  */
class IncrementalWinnowSpec extends SparkTestBase with Matchers {

  private def pairSet(df: DataFrame) =
    df.select("doc_id1", "doc_id2", "n_shared", "overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  private def oneShot(docs: DataFrame) = pairSet(TextQueries.winnowPairsOn(docs))

  test("3-batch split ingest serves the one-shot match set; replay lands nothing") {
    val base = Files.createTempDirectory("graft_incwin").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    for (i <- 0 until 3)
      IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === i),
        base, Some(i.toLong))
    val want = oneShot(docs)
    want should not be empty
    pairSet(IncrementalWinnow.serveWinnowPairs(spark, base)) shouldBe want
    // crash replay of committed batch 2: the <= tag guard lands nothing
    val st = IncrementalWinnow.currentState(spark, base)
    IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === 2),
      base, Some(2L))
    IncrementalWinnow.currentState(spark, base).version shouldBe st.version
    pairSet(IncrementalWinnow.serveWinnowPairs(spark, base)) shouldBe want
  }

  test("the df-cap is global: a later batch pushing a fingerprint over the cap drops its matches retroactively") {
    import spark.implicits._
    val boiler = (0 until 10).map(i => s"bp$i").mkString(" ")
    def doc(id: Long, extra: String) =
      (id, s"$boiler $extra " + (0 until 10).map(i => s"u${id}_$i").mkString(" "))
    val base = Files.createTempDirectory("graft_incwin_cap").toFile.getAbsolutePath
    // batch 0: 10 docs sharing the boilerplate run — under the df-cap of
    // 16, they all pair up on its fingerprints
    val b0 = (0L until 10L).map(i => doc(i, "")).toDF("doc_id", "text")
    IncrementalWinnow.processBatch(spark, b0, base, Some(0L))
    val before = pairSet(IncrementalWinnow.serveWinnowPairs(spark, base))
    before should not be empty
    // batch 1: 10 MORE docs with the same boilerplate → its fingerprints
    // now exceed the cap; matches that existed only through them vanish
    val b1 = (10L until 20L).map(i => doc(i, "")).toDF("doc_id", "text")
    IncrementalWinnow.processBatch(spark, b1, base, Some(1L))
    val after = pairSet(IncrementalWinnow.serveWinnowPairs(spark, base))
    after shouldBe empty
    // and the served answer equals the one-shot over the full corpus
    after shouldBe oneShot(b0.unionByName(b1))
  }

  test("concurrent ingest: two writers racing the same state lose no batch") {
    val base = Files.createTempDirectory("graft_incwin_race").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === 0),
      base, Some(0L))
    raceAll(
      () => IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === 1), base, None),
      () => IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === 2), base, None))
    IncrementalWinnow.currentState(spark, base).version shouldBe 2L
    pairSet(IncrementalWinnow.serveWinnowPairs(spark, base)) shouldBe oneShot(docs)
  }
}
