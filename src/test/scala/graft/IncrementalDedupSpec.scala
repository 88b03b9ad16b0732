package graft

import java.nio.file.Files

import graft.operators.DedupQueries
import graft.streaming.IncrementalDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

/** Incremental near-dedup invariant: because MinHash signatures depend only
  * on document content, the union of per-batch pair emissions over ANY
  * batch split must equal the one-shot batch q_dedup_near pair set —
  * including the verified jaccard scores.
  */
class IncrementalDedupSpec extends SparkTestBase with Matchers {

  test("foreachBatch incremental MinHash dedup over 2 micro-batches == one-shot q_dedup_near") {
    val srcDir = Files.createTempDirectory("graft_incdedup_src").toFile.getAbsolutePath
    val stateBase = Files.createTempDirectory("graft_incdedup_state").toFile.getAbsolutePath
    val cpDir = Files.createTempDirectory("graft_incdedup_cp").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)

    def write(name: String, df: DataFrame): Unit = {
      val tmp = Files.createTempDirectory("graft_incdedup_w").toFile.getAbsolutePath
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(srcDir, name))
      ()
    }
    // ingest in two batches: the existing corpus, then the "nightly" half
    write("f1.parquet", docs.filter(col("doc_id") % 2 === 0))
    Thread.sleep(1100) // distinct mod times → deterministic file order
    write("f2.parquet", docs.filter(col("doc_id") % 2 === 1))

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(srcDir)
    val state = IncrementalDedup.StatePaths(
      s"$stateBase/banded", s"$stateBase/hashed", s"$stateBase/pairs")
    val q = IncrementalDedup.attach(stream, state)
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.read.parquet(state.pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = DedupQueries.dedupNear.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    want should not be empty
    got shouldBe want
    // each pair emitted exactly once across batches (no re-emission of
    // old-old pairs in later batches)
    spark.read.parquet(state.pairs).count() shouldBe want.size.toLong
  }
}
