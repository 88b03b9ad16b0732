package graft.streaming

import graft.functions.Tokenize
import graft.operators.DedupQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental / streaming MinHash near-dedup (round-3 §7.6 #1): the state
  * a nightly 100 TB ingest pipeline keeps is exactly the two tables this
  * maintains — banded LSH signatures and hashed token sets of every
  * document seen so far. Each arriving micro-batch:
  *
  *   1. computes its own signatures (per-row HOFs, shuffle-free);
  *   2. candidate-joins the BATCH signatures against state ∪ batch — only
  *      pairs touching a new doc are enumerated, so batch cost scales with
  *      the batch, not the corpus;
  *   3. verifies candidates exactly (same `verifyJaccard` gate as the
  *      batch operators — precision 1.0 by construction);
  *   4. appends the batch's signatures/hashes to state and the verified
  *      pairs to the output sink.
  *
  * Because signatures depend only on document content, the union of
  * per-batch emissions over any batch split equals the one-shot batch
  * q_dedup_near pair set exactly — IncrementalDedupSpec asserts set
  * equality including the jaccard scores. Driven by foreachBatch
  * (`attach`), the upsert hook Structured Streaming provides for exactly
  * this maintain-a-table pattern.
  */
object IncrementalDedup {

  final case class StatePaths(banded: String, hashed: String, pairs: String)

  private val bandedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("sz", IntegerType), StructField("band", IntegerType),
    StructField("sig", LongType)))
  private val hashedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("toksh", ArrayType(LongType, containsNull = false), nullable = false)))

  private def readState(s: SparkSession, path: String, schema: StructType): DataFrame =
    if (graft.sources.GraftFs.exists(s, path)) s.read.schema(schema).parquet(path)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Process one batch of documents (doc_id, text, lang, ...): emit the
    * verified near-dup pairs involving at least one batch document, then
    * fold the batch into state. Returns the emitted pairs (doc_id1 <
    * doc_id2, jaccard).
    */
  def processBatch(s: SparkSession, batch: DataFrame, state: StatePaths): DataFrame = {
    val sets = batch.select(col("doc_id"), col("lang"),
      Tokenize.tokenSet(col("text")).as("toks"))
    // localCheckpoint: materialize the batch derivations BEFORE appending
    // to the state dirs they will be unioned with next batch
    val bBanded = DedupQueries.bandedSignatures(sets, bands = 16).localCheckpoint()
    val bHashed = batch.select(col("doc_id"),
      Tokenize.hashedTokenSet(col("text")).as("toksh")).localCheckpoint()
    val allBanded = readState(s, state.banded, bandedSchema).unionByName(bBanded)
    val allHashed = readState(s, state.hashed, hashedSchema).unionByName(bHashed)
    // candidates: batch side × (state ∪ batch) side — normalized so a
    // within-batch pair appears once; pairs between two OLD docs were
    // emitted by an earlier batch and never re-enumerate
    val l = bBanded.select(col("lang"), col("band"), col("sig"), col("doc_id").as("did1"))
    val r = allBanded.select(col("lang").as("lang2"), col("band").as("band2"),
      col("sig").as("sig2"), col("doc_id").as("did2"))
    val cands = l.join(r,
        col("lang") === col("lang2") && col("band") === col("band2")
          && col("sig") === col("sig2") && col("did1") =!= col("did2"))
      .select(least(col("did1"), col("did2")).as("doc_id1"),
        greatest(col("did1"), col("did2")).as("doc_id2"))
      .distinct()
    val newPairs = DedupQueries.verifyJaccard(cands, allHashed, 1, 2).localCheckpoint()
    bBanded.write.mode("append").parquet(state.banded)
    bHashed.write.mode("append").parquet(state.hashed)
    newPairs.write.mode("append").parquet(state.pairs)
    newPairs
  }

  /** Attach the incremental dedup to a documents stream via foreachBatch. */
  def attach(docs: DataFrame, state: StatePaths): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      processBatch(batch.sparkSession, batch, state): Unit
    }
}
