package graft.operators

import org.apache.spark.sql.SparkSession

/** Second-decade pack-store probe (round-7 verdict ask #6): push the store
  * to ~500k objects across ~10^3 components — the component count a year
  * of per-minute streaming batches actually accumulates between
  * compactions — and measure what the snapshot/checkpoint design claims
  * to keep flat or sub-linear:
  *
  *   - PLAN+POLL: changelog poll at the tip (reads CURRENT + one or two
  *     snapshot lines) — must be component-count-independent;
  *   - LOOKUP: a single-id scanBytes (min/max + bloom zone maps prune
  *     components before any manifest parquet opens) — must stay far
  *     below the full-scan cost and grow sub-linearly in components;
  *   - SCAN: the full manifest-union read (the irreducible O(components)
  *     baseline the others are measured against);
  *   - TAILFOLD: compactTail over the whole delta tail (~tail mass);
  *   - VACUUM: the post-compaction sweep that lists and reclaims the
  *     10^3 now-unreferenced component dirs.
  *
  * Decade points at ~10^2 and ~10^3 components let PERF.md report growth
  * RATES, not single samples. Objects are 16-byte payloads: this probe
  * prices METADATA machinery (planning, manifests, snapshots, listing),
  * deliberately not byte throughput (MediaProbe/QBench own that).
  *
  * Usage: runMain graft.operators.StoreScaleProbe [nBase perDelta nDeltas]
  * (defaults 100000 400 1000 ≈ 500k objects, 1001 components).
  */
object StoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.lift(0).map(_.toInt).getOrElse(100000)
    val perDelta = args.lift(1).map(_.toInt).getOrElse(400)
    val nDeltas = args.lift(2).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.multimodal.PackStore
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def objs(lo: Long, hi: Long) =
      spark.range(lo, hi).as[Long].map(i => (i, s"payload-$i".getBytes("UTF-8")))

    val base = java.nio.file.Files.createTempDirectory("graft_storescale")
      .toFile.getAbsolutePath + "/store"
    PackStore.initBase(spark, base, objs(0L, nBase.toLong), 8)

    def measure(tag: String, nComps: Int, nObjs: Long): Unit = {
      val tip = PackStore.latestSnapshotId(spark, base).getOrElse(-1L)
      val (_, tPoll) = timed(
        graft.streaming.PackSubscribe.poll(spark, base, tip - 1).adds.count())
      val probeId = nObjs / 2
      val (nHit, tLookup) = timed(
        PackStore.scanBytes(spark, base, idRange = Some((probeId, probeId))).count())
      val (nAll, tScan) = timed(PackStore.scanBytes(spark, base).count())
      assert(nHit == 1L, s"lookup missed id $probeId")
      assert(nAll == nObjs, s"scan saw $nAll of $nObjs")
      println(f"STORESCALE $tag comps=$nComps objs=$nObjs " +
        f"poll_s=$tPoll%.3f lookup_s=$tLookup%.3f fullscan_s=$tScan%.2f")
    }

    var landed = nBase.toLong
    var comps = 1
    val decade1 = 100
    val tBuild0 = System.nanoTime()
    for (k <- 0 until nDeltas) {
      PackStore.appendDelta(spark, base, objs(landed, landed + perDelta))
      landed += perDelta; comps += 1
      if (comps == decade1) measure("decade1", comps, landed)
    }
    val tBuild = (System.nanoTime() - tBuild0) / 1e9
    println(f"STORESCALE build deltas=$nDeltas per_delta=$perDelta " +
      f"total_s=$tBuild%.1f per_publish_s=${tBuild / nDeltas}%.3f")
    measure("decade2", comps, landed)

    val (_, tFold) = timed(PackStore.compactTail(spark, base, 1))
    val (nAfter, _) = timed(PackStore.scanBytes(spark, base).count())
    assert(nAfter == landed, s"tail fold changed the view: $nAfter vs $landed")
    val (_, tVacuum) = timed(PackStore.vacuum(spark, base, retainSnapshots = 1,
      orphanGraceMs = 0L))
    measure("folded", 2, landed)
    println(f"STORESCALE tailfold_s=$tFold%.1f vacuum_s=$tVacuum%.1f")
    spark.stop()
  }
}
