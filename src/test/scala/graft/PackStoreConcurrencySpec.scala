package graft

import java.nio.file.Files

import graft.multimodal.{ContainerOps, PackStore}
import org.scalatest.matchers.should.Matchers

/** Optimistic multi-writer publish: concurrent appenders must all land
  * (rebase-on-conflict, no lost updates, no shared dirs), and a
  * compaction whose base moves mid-merge must abort and re-merge rather
  * than lose the concurrent delta — with no external lock anywhere.
  */
class PackStoreConcurrencySpec extends SparkTestBase with Matchers {
  import spark.implicits._

  private def view(base: String) =
    PackStore.scan(spark, base).collect().map(_.toString).sorted.toSeq

  test("concurrent appenders all land exactly once; racing compaction re-merges, never loses a delta") {
    val base = Files.createTempDirectory("graft_packconc").toFile.getAbsolutePath + "/store"
    val objs = ContainerOps.containerTable(spark, sfTiny).filter(_._1 <= 299).cache()
    def slice(lo: Long, hi: Long) = objs.filter(o => o._1 >= lo && o._1 < hi)
    def want(hi: Long) = objs.filter(_._1 < hi)
      .map { case (id, b) => ContainerOps.ContainerParser.parse(id, b) }
      .collect().map(_.toString).sorted.toSeq

    PackStore.initBase(spark, base, slice(0, 40), 2) // snap 0

    // 4 threads x 2 appends each, racing on one base — every append must
    // publish (rebase-and-retry), none may share a staging dir
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appenders = (0 until 4).map { t =>
      new Thread(() => {
        try {
          for (j <- 0 until 2) {
            val k = t * 2 + j
            PackStore.appendDelta(spark, base, slice(40 + k * 25, 40 + (k + 1) * 25))
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    appenders.foreach(_.start())
    appenders.foreach(_.join())
    errors shouldBe empty
    PackStore.latestSnapshotId(spark, base) shouldBe Some(8L) // init + 8 appends
    PackStore.readCurrent(spark, base).size shouldBe 9        // no lost update
    PackStore.readCurrent(spark, base).map(_.dir).distinct.size shouldBe 9 // no shared dir
    view(base) shouldBe want(240)

    // compaction racing one more delta: whoever wins, the final view
    // holds BOTH the merged corpus and the concurrent delta
    val compactor = new Thread(() => {
      try PackStore.compact(spark, base, 2)
      catch { case e: Throwable => errors.add(e) }
    })
    val appender = new Thread(() => {
      try PackStore.appendDelta(spark, base, slice(240, 300))
      catch { case e: Throwable => errors.add(e) }
    })
    compactor.start(); appender.start()
    compactor.join(); appender.join()
    errors shouldBe empty
    PackStore.latestSnapshotId(spark, base) shouldBe Some(10L)
    view(base) shouldBe want(300)

    // a second init on the now-populated store is a typed caller bug
    an[IllegalStateException] should be thrownBy
      PackStore.initBase(spark, base, slice(0, 10), 1)
    objs.unpersist()
    ()
  }

  test("racing upserts of the same ids converge: both land, the later publish wins wholesale, no mixed versions") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_packups").toFile.getAbsolutePath + "/store"
    def objs(ver: Byte) = spark.range(0, 50).as[Long].map(i => (i, Array(ver, i.toByte)))
    PackStore.initBase(spark, base, objs(1), 2) // snap 0: v1

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = Seq[Byte](2, 3).map { v =>
      new Thread(() => {
        try PackStore.upsert(spark, base, objs(v))
        catch { case e: Throwable => errors.add(e) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    errors shouldBe empty
    PackStore.latestSnapshotId(spark, base) shouldBe Some(2L) // both landed

    // an atomic upsert is all-or-nothing: the LATER snapshot's tombstone
    // subtracts the earlier winner's delta, so every id carries exactly
    // the later publisher's version — never a v2/v3 mix, never a dup
    val got = PackStore.scanBytes(spark, base).collect()
    got.length shouldBe 50
    val versions = got.map(_._2(0)).toSet
    versions.size shouldBe 1
    Set[Byte](2, 3) should contain (versions.head)
    // and the intermediate snapshot shows the earlier winner consistently
    val mid = PackStore.scanBytes(spark, base, snapshot = Some(1L)).collect()
    mid.map(_._2(0)).toSet.size shouldBe 1
  }

  test("vacuum vs readers: a retained-snapshot reader completes fully after GC; an expired-snapshot reader fails loudly, never partially") {
    val base = Files.createTempDirectory("graft_packgc").toFile.getAbsolutePath + "/store"
    val objs = ContainerOps.containerTable(spark, sfTiny).filter(_._1 <= 199)
    PackStore.initBase(spark, base, objs.filter(_._1 <= 99), 2)  // snap 0
    PackStore.appendDelta(spark, base, objs.filter(_._1 > 99))   // snap 1
    PackStore.compact(spark, base, 2)                            // snap 2 (fresh dirs)

    // both readers pin their component sets BEFORE the vacuum — the
    // plan-then-GC-then-materialize ordering is the worst-case race,
    // and unlike a thread race it is deterministic
    val atExpired = PackStore.scanAt(spark, base, 0)  // dirs only snap 0/1 reference
    val atRetained = PackStore.scanAt(spark, base, 2) // the surviving compaction dir

    PackStore.vacuum(spark, base, retainSnapshots = 1)

    // reader wins when its snapshot is retained: vacuum deletes only
    // dirs no retained snapshot references, so the full read succeeds
    atRetained.collect().map(_.media_id).sorted.toSeq shouldBe (0L to 199L)

    // the expired reader's files are gone: materialization must THROW
    // (missing pack/manifest surfaces as a job failure), never return a
    // silent subset of snapshot 0's 100 rows
    an[Exception] should be thrownBy atExpired.collect()

    // and a FRESH read of the expired snapshot fails typed at plan time
    an[IllegalArgumentException] should be thrownBy PackStore.scanAt(spark, base, 0)

    // the store itself is unharmed by the failed read
    PackStore.scan(spark, base).collect().map(_.media_id).sorted.toSeq shouldBe (0L to 199L)
  }
}
