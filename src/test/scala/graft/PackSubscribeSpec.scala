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
    val (d0, c0) = PackSubscribe.poll(spark, base, -1L)
    ids(d0) shouldBe (0L to 99L)
    c0 shouldBe 0L

    // delta + compaction between polls: the delta arrives once, the
    // compaction (pure rewrite) contributes nothing
    PackStore.appendDelta(spark, base, objs.filter(o => o._1 > 99 && o._1 <= 199)) // snap 1
    PackStore.compact(spark, base, 2)                                              // snap 2
    val (d1, c1) = PackSubscribe.poll(spark, base, c0)
    ids(d1) shouldBe (100L to 199L)
    c1 shouldBe 2L

    // caught up: empty poll, cursor unchanged
    val (dEmpty, cSame) = PackSubscribe.poll(spark, base, c1)
    dEmpty.count() shouldBe 0L
    cSame shouldBe c1

    PackStore.appendDelta(spark, base, objs.filter(_._1 > 199)) // snap 3
    val (d2, c2) = PackSubscribe.poll(spark, base, c1)
    ids(d2) shouldBe (200L to 249L)
    c2 shouldBe 3L

    // union over all polls == the corpus, each object exactly once
    (ids(d0) ++ ids(d1) ++ ids(d2)) shouldBe (0L to 249L)

    // a subscriber lagging past the retention window fails typed —
    // never a silent gap, never garbage
    PackStore.vacuum(spark, base, retainSnapshots = 1)
    an[IllegalArgumentException] should be thrownBy PackSubscribe.poll(spark, base, -1L)
    objs.unpersist()
    ()
  }
}
