package graft

import java.nio.file.Files

import graft.multimodal.{ContainerOps, PackStore}
import graft.streaming.PackSubscribe
import org.scalatest.matchers.should.Matchers

/** Changelog subscription: polls must deliver every ingested object
  * exactly once across any poll cadence, emit nothing for compactions,
  * and fail typed when the cursor lags past the retention window.
  */
class PackSubscribeSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  test("s_pack_subscribe: exactly-once across polls; compaction emits nothing; lag past retention fails typed") {
    val base = Files.createTempDirectory("graft_packsub").toFile.getAbsolutePath + "/store"
    val objs = ContainerOps.containerTable(spark, sfTiny).filter(_._1 <= 249).cache()
    def ids(ds: org.apache.spark.sql.Dataset[(Long, Array[Byte])]) =
      ds.collect().map(_._1).sorted.toSeq

    PackStore.initBase(spark, base, objs.filter(_._1 <= 99), 2) // snap 0 (init)
    val p0 = PackSubscribe.poll(spark, base, -1L)
    ids(p0.adds) shouldBe (0L to 99L)
    p0.deletes.count() shouldBe 0L
    val c0 = p0.tip
    c0 shouldBe 0L

    // delta + compaction between polls: the delta arrives once, the
    // compaction (pure rewrite) contributes nothing
    PackStore.appendDelta(spark, base, objs.filter(o => o._1 > 99 && o._1 <= 199)) // snap 1
    PackStore.compact(spark, base, 2)                                              // snap 2
    val p1 = PackSubscribe.poll(spark, base, c0)
    ids(p1.adds) shouldBe (100L to 199L)
    p1.deletes.count() shouldBe 0L
    val c1 = p1.tip
    c1 shouldBe 2L

    // caught up: empty poll, cursor unchanged
    val pE = PackSubscribe.poll(spark, base, c1)
    pE.adds.count() shouldBe 0L
    pE.tip shouldBe c1

    PackStore.appendDelta(spark, base, objs.filter(_._1 > 199)) // snap 3
    val p2 = PackSubscribe.poll(spark, base, c1)
    ids(p2.adds) shouldBe (200L to 249L)
    val c2 = p2.tip
    c2 shouldBe 3L

    // union over all polls == the corpus, each object exactly once
    (ids(p0.adds) ++ ids(p1.adds) ++ ids(p2.adds)) shouldBe (0L to 249L)

    // tombstone publish: the subscriber sees the retraction ids exactly
    // once, and the store view subtracts them
    import spark.implicits._
    PackStore.deleteIds(spark, base, spark.range(0, 50).as[Long]) // snap 4
    val p3 = PackSubscribe.poll(spark, base, c2)
    p3.adds.count() shouldBe 0L
    p3.deletes.collect().sorted.toSeq shouldBe (0L to 49L)
    p3.tip shouldBe 4L
    PackStore.scan(spark, base).collect().map(_.media_id).sorted.toSeq shouldBe (50L to 249L)

    // atomic upsert publish: ONE poll carries both the retractions and
    // the replacement versions, and deletes-before-adds converges to the
    // new versions (a consumer state applying that order ends correct)
    PackStore.upsert(spark, base,
      spark.range(100, 120).as[Long].map(i => (i, Array(9.toByte, i.toByte)))) // snap 5
    val p4 = PackSubscribe.poll(spark, base, p3.tip)
    p4.tip shouldBe 5L
    p4.deletes.collect().sorted.toSeq shouldBe (100L to 119L)
    val newVs = p4.adds.collect().toMap
    newVs.keySet shouldBe (100L to 119L).toSet
    newVs.values.foreach(_(0) shouldBe 9.toByte)
    var state = PackStore.scanComponents(spark,
      PackStore.readSnapshot(spark, base, 4L)).collect().toMap // consumer at cursor 4
    state = state -- p4.deletes.collect()                      // deletes first
    state = state ++ newVs                                     // then adds
    val want = PackStore.scanBytes(spark, base).collect().toMap
    state.keySet shouldBe want.keySet
    state.foreach { case (k, v) => v.toSeq shouldBe want(k).toSeq }

    // a subscriber lagging past the retention window fails typed —
    // never a silent gap, never garbage
    PackStore.vacuum(spark, base, retainSnapshots = 1)
    an[IllegalArgumentException] should be thrownBy PackSubscribe.poll(spark, base, -1L)
    objs.unpersist()
    ()
  }
}
