package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Diagnostic main (not part of the library surface, like ProbeMain):
  * stateful-streaming state-store shootout — HDFSBacked vs RocksDB
  * provider on a synthetic key-explosion fixture (§7.6 #4). The events
  * fixture has ~1k users; real 100 TB pipelines hold millions of keys of
  * state, which is exactly where the in-memory HDFS-backed provider
  * (whole map resident + full snapshot per commit) falls over and the
  * RocksDB provider (native store, incremental changelog) is the
  * documented choice. This measures the crossover on this box.
  *
  * Usage: runMain graft.streaming.StateStoreBench [nRows] [nKeys] [nBatches]
  * Results recorded in PERF.md (round 4).
  */
object StateStoreBench {

  private def writeFixture(s: SparkSession, base: String,
      nRows: Long, nKeys: Long, nFiles: Int): Unit = {
    s.range(nRows)
      .select(col("id").as("event_id"), pmod(col("id") * 2654435761L, lit(nKeys)).as("user_id"))
      .repartition(nFiles)
      .write.mode("overwrite").parquet(base)
  }

  private def countsStream(s: SparkSession, base: String, nFilesPerTrigger: Int): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    s.readStream
      .schema("event_id LONG, user_id LONG")
      .option("maxFilesPerTrigger", nFilesPerTrigger)
      .parquet(base)
      .select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
      .toDF("user_id", "n_events")
  }

  def runOnce(s: SparkSession, base: String, provider: String,
      nFilesPerTrigger: Int): (Double, Long) = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, provider)
    try {
      val t0 = System.nanoTime()
      val q = countsStream(s, base, nFilesPerTrigger)
        .writeStream.format("noop")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val stateRows = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      (secs, stateRows)
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nKeys = args.lift(1).map(_.toLong).getOrElse(500000L)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = s"/tmp/graft-statebench/${nRows}_$nKeys"
    writeFixture(spark, base, nRows, nKeys, nFiles = nBatches)
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .filter { case (name, _) => args.lift(3).forall(_ == name) }
    // one warm-up + one measured run each, interleaved to level cache effects
    for ((name, cls) <- providers) {
      val (warm, _) = runOnce(spark, base, cls, nFilesPerTrigger = 1)
      val (secs, stateRows) = runOnce(spark, base, cls, nFilesPerTrigger = 1)
      println(f"STATEBENCH provider=$name%-8s rows=$nRows keys=$nKeys batches=$nBatches warm=$warm%.1f s run=$secs%.1f s stateRows=$stateRows")
    }
    spark.stop()
  }
}
