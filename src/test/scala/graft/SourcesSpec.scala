package graft

import java.nio.file.Files

import graft.sources.FormatSources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Source/sink round-trips for the non-parquet interchange formats: the
  * fixture data written out and read back must be value-identical, and the
  * ORC path must keep predicate pushdown.
  */
class SourcesSpec extends SparkTestBase with Matchers {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_src_$name").toFile.getAbsolutePath

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toIndexedSeq: Seq[Any]).toSet

  test("CSV round-trip preserves orders values (explicit schema, no inference pass)") {
    val orders = Tables.orders(spark, sfTiny)
    val dir = tmp("csv")
    FormatSources.writeCsv(orders, dir)
    val back = FormatSources.readCsv(spark, dir, orders.schema)
    rows(back) shouldBe rows(orders)
  }

  test("JSON-lines round-trip preserves documents values") {
    val docs = Tables.documents(spark, sfTiny)
    val dir = tmp("json")
    FormatSources.writeJson(docs, dir)
    rows(FormatSources.readJson(spark, dir, docs.schema)) shouldBe rows(docs)
  }

  test("ORC round-trip preserves lineitem values and pushes predicates") {
    val li = Tables.lineitem(spark, sfTiny)
    val dir = tmp("orc")
    FormatSources.writeOrc(li, dir)
    val back = FormatSources.readOrc(spark, dir)
    back.count() shouldBe li.count()
    val filtered = back.filter(col("l_quantity") > 49).select("l_orderkey", "l_quantity")
    filtered.count() shouldBe li.filter(col("l_quantity") > 49).count()
    filtered.queryExecution.executedPlan.toString should include("PushedFilters")
  }

  test("compaction: many small parquet files become few target-sized files, data intact") {
    val orders = Tables.orders(spark, sfTiny)
    val smallDir = tmp("compact_in")
    orders.repartition(20).write.mode("overwrite").parquet(smallDir) // 20 small files
    val inFiles = new java.io.File(smallDir).listFiles().count(_.getName.endsWith(".parquet"))
    inFiles shouldBe 20
    val outDir = tmp("compact_out")
    val totalBytes = new java.io.File(smallDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target = half the data → expect exactly 2 output files
    val nOut = FormatSources.compactParquet(spark, smallDir, outDir, targetBytes = totalBytes / 2 + 1)
    nOut shouldBe 2
    rows(spark.read.parquet(outDir)) shouldBe rows(orders)
  }

  test("embedding vectors survive a JSON round-trip (array<float> fidelity)") {
    val e = Tables.embeddings(spark, sfTiny)
    val dir = tmp("emb")
    FormatSources.writeJson(e, dir)
    val back = FormatSources.readJson(spark, dir, e.schema)
    back.count() shouldBe e.count()
    // spot-check float fidelity on the first vector
    val a = e.orderBy("vec_id").limit(1).collect().head.getSeq[Float](1)
    val b = back.orderBy("vec_id").limit(1).collect().head.getSeq[Float](1)
    a shouldBe b
  }
}
