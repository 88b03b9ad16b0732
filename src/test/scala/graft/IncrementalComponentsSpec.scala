package graft

import java.nio.file.Files

import graft.operators.GraphQueries
import graft.streaming.IncrementalComponents
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Incremental CC invariant: absorbing the LSH graph's edges in arrival
  * batches (an edge lands with its LATER endpoint — the incremental
  * graph maintainer's emission contract) must leave the label table
  * row-identical to the one-shot CC over the full edge set. Plus the
  * per-batch only-coarsens invariant and replay protection.
  */
class IncrementalComponentsSpec extends SparkTestBase with Matchers {

  test("batched edge arrival reproduces the one-shot component labels exactly") {
    val base = Files.createTempDirectory("graft_inccc").toFile.getAbsolutePath
    val edges = GraphQueries.lshUndirectedEdges(spark, sfTiny).localCheckpoint()
    val nodeIds = Tables.embeddings(spark, sfTiny).select("vec_id")
      .collect().map(_.getLong(0)).sorted
    val cut1 = nodeIds(nodeIds.length / 3)
    val cut2 = nodeIds(2 * nodeIds.length / 3)
    // batch of a node = its tercile; an edge lands with its later endpoint
    def nodeBatch(idCol: org.apache.spark.sql.Column) =
      when(idCol <= cut1, 0L).when(idCol <= cut2, 1L).otherwise(2L)
    val nodes = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id").as("node_id"), nodeBatch(col("vec_id")).as("bid"))
    val edgesB = edges.withColumn("bid", nodeBatch(greatest(col("a"), col("b"))))

    var prev = Map.empty[Long, Long]
    for (bid <- 0L to 2L) {
      val st = IncrementalComponents.processBatch(spark,
        nodes.filter(col("bid") === bid).select("node_id"),
        edgesB.filter(col("bid") === bid).select("a", "b"),
        base, Some(bid))
      val now = st.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // labels only coarsen: a node's component id never increases
      prev.foreach { case (v, c) => assert(now(v) <= c,
        s"node $v label rose $c -> ${now(v)} in batch $bid") }
      prev = now
    }

    val fromState = IncrementalComponents.readState(spark, base)
      .orderBy("node_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val oneShot = graft.operators.DedupQueries.connectedComponents(
        Tables.embeddings(spark, sfTiny).select(col("vec_id").as("doc_id")),
        edges.select(col("a").as("doc_id1"), col("b").as("doc_id2")))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    fromState should not be empty
    fromState shouldBe oneShot

    // replay protection: re-landing batch 2 is a no-op (same version served)
    val before = IncrementalComponents.readState(spark, base)
      .agg(sum("component")).collect()(0).getLong(0)
    IncrementalComponents.processBatch(spark,
      nodes.filter(col("bid") === 2L).select("node_id"),
      edgesB.filter(col("bid") === 2L).select("a", "b"), base, Some(2L))
    IncrementalComponents.readState(spark, base)
      .agg(sum("component")).collect()(0).getLong(0) shouldBe before
    // a manual no-id call keeps the committed tag: batch 2 still a no-op after
    IncrementalComponents.processBatch(spark,
      nodes.limit(0).select("node_id"), edgesB.limit(0).select("a", "b"), base, None)
    IncrementalComponents.processBatch(spark,
      nodes.filter(col("bid") === 2L).select("node_id"),
      edgesB.filter(col("bid") === 2L).select("a", "b"), base, Some(2L))
    IncrementalComponents.readState(spark, base)
      .agg(sum("component")).collect()(0).getLong(0) shouldBe before
  }
}
