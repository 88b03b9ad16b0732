package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway diagnostic: the round-12 claims, measured. Claims under test:
//   - Persisted-artifact serve (the round's lever pattern): reading a
//     persisted label/prefix/run table costs parquet-scan time and grows
//     ~linearly in the artifact, decoupled from the build's join volume.
//   - Containment prefix probe: with the prefix relation persisted, the
//     remaining inline cost (posting join + pair distinct + early-exit
//     verify) is the honest probe price; measure its x10 growth and the
//     candidate volume it carries.
//   - State-served provenance: serveSpanSource reads committed segments
//     (never re-tokenizes the corpus); measure serve-from-state vs the
//     one-shot rebuild at x1 and x10.
//   - Tables scan-resolution memo: spark.read.parquet pays a per-call
//     listing+footer constant the memo removes; pin the constant.
// Usage: runMain graft.operators.R12ScaleProbe
object R12ScaleProbe {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val big = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- containment probe: x10 growth of the priced inline work --------
    for (dir <- Seq(small, big)) {
      DedupQueries.containmentPrefixPersisted(spark, dir).count() // build once
      val t = DedupQueries.containmentSets(spark, dir).localCheckpoint()
      val prefix = DedupQueries.containmentPrefixPersisted(spark, dir)
      val (nCand, tc) = timed(
        DedupQueries.candidatesFromPrefix(prefix, t).count())
      val (nOut, tv) = timed(
        DedupQueries.verifyContainment(
          DedupQueries.candidatesFromPrefix(prefix, t), t, 4, 5).count())
      println(f"R12PROBE containment $dir cands=$nCand probe=$tc%.2f s verify(total)=$tv%.2f s out=$nOut")
    }

    // ---- state-served provenance vs one-shot, x1 and x10 ----------------
    for (dir <- Seq(small, big)) {
      val base = ServeQueries.spanStateBuilt(spark, dir)
      graft.streaming.IncrementalSpan.serveSpanSource(spark, base).count() // warm
      val (_, ts) = timed(
        graft.streaming.IncrementalSpan.serveSpanSource(spark, base).count())
      val (_, to) = timed(TextQueries.textSpanSource.query(spark, dir).count())
      println(f"R12PROBE span-serve $dir from-state=$ts%.2f s one-shot=$to%.2f s ratio=${ts / to}%.2f")
    }

    // ---- scan-resolution constant ----------------------------------------
    val n = 30
    graft.Tables.documents(spark, small).count() // memo warm
    val (_, tMemo) = timed {
      (1 to n).foreach(_ => graft.Tables.documents(spark, small).limit(1).count())
    }
    val (_, tFresh) = timed {
      (1 to n).foreach(_ =>
        spark.read.parquet(s"$small/documents.parquet").limit(1).count())
    }
    println(f"R12PROBE scan-memo ${tMemo / n}%.4f s/call vs fresh-read ${tFresh / n}%.4f s/call (x$n)")
    spark.stop()
  }
}
