package graft

import java.nio.file.Files

import graft.operators.DedupQueries
import graft.streaming.IncrementalDedup
import org.apache.spark.sql.functions._

/** Stress harness for the two-writer CAS race that failed once in the r12
  * judge's full-suite run (version 1, expected 2 — one racer's batch left
  * no trace, root exception swallowed by a bare Thread). Loops the race
  * with join-and-rethrow so any racer exception surfaces with its own
  * stack; optional background query load approximates full-suite memory
  * pressure. Run: sbt 'Test/runMain graft.RaceStressMain 30 load'
  */
object RaceStressMain {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(20)
    val withLoad = args.contains("load")
    val spark = SparkTestBase.session
    val sfTiny = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sfTiny)
    val want = DedupQueries.dedupNear.query(spark, sfTiny)
      .select("doc_id1", "doc_id2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    @volatile var stop = false
    val load = new Thread(() => {
      // sustained concurrent Spark jobs + allocation churn, the
      // full-suite-load stand-in
      while (!stop) {
        try {
          Tables.lineitem(spark, sfTiny).groupBy("l_returnflag")
            .agg(sum("l_quantity"), avg("l_extendedprice")).collect()
          Tables.documents(spark, sfTiny)
            .select(explode(split(col("text"), " ")).as("w"))
            .groupBy("w").count().orderBy(desc("count")).limit(5).collect()
        } catch { case t: Throwable => println(s"[load] ${t.getClass.getName}: ${t.getMessage}") }
      }
    })
    if (withLoad) { load.setDaemon(true); load.start() }

    var failures = 0
    for (i <- 1 to iters) {
      val base = Files.createTempDirectory(s"graft_race_stress_$i").toFile.getAbsolutePath
      IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 3 === 0), base, Some(0L))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ts = Seq(1, 2).map { m =>
        new Thread(() =>
          try { IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 3 === m), base, None); () }
          catch { case t: Throwable => errs.add(t): Unit })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val v = IncrementalDedup.currentState(spark, base).version
      val got = IncrementalDedup.readPairs(spark, base)
        .select("doc_id1", "doc_id2", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val ok = errs.isEmpty && v == 2L && got == want
      if (!ok) {
        failures += 1
        println(s"[iter $i] FAIL version=$v pairs=${got.size}/${want.size} errs=${errs.size}")
        errs.forEach(t => { println(s"[iter $i] racer exception:"); t.printStackTrace() })
      } else println(s"[iter $i] ok (version=$v, pairs=${got.size})")
      graft.sources.GraftFs.deleteRecursively(spark, base)
    }
    stop = true
    println(s"RaceStress: $failures/$iters failures")
    if (failures > 0) sys.exit(1)
  }
}
