package graft

import java.nio.file.Files

import graft.multimodal.PackStore
import org.scalatest.matchers.should.Matchers

/** Named refs (tags) on the pack store: immutable creation, typed
  * failures, and — the property that justifies their existence — vacuum
  * treating tagged snapshots as retained regardless of the count-based
  * window, with dropTag returning them to normal retention.
  */
class PackTagSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  private def objs(lo: Long, hi: Long) =
    spark.range(lo, hi).as[Long].map(i => (i, s"payload-$i".getBytes("UTF-8")))

  private def freshBase(tag: String): String =
    Files.createTempDirectory(s"graft_packtag_$tag").toFile.getAbsolutePath + "/store"

  test("tags pin snapshots through vacuum; dropTag releases them") {
    val base = freshBase("vac")
    PackStore.initBase(spark, base, objs(0, 50), 2)    // snap 0
    PackStore.appendDelta(spark, base, objs(50, 100))  // snap 1
    PackStore.createTag(spark, base, "fifty", 0L)
    PackStore.appendDelta(spark, base, objs(100, 150)) // snap 2
    PackStore.appendDelta(spark, base, objs(150, 200)) // snap 3

    // retain=1 would expire snaps 0-2; the tag must hold snap 0 AND its dirs
    PackStore.vacuum(spark, base, retainSnapshots = 1, orphanGraceMs = 0L)
    PackStore.listTags(spark, base) shouldBe Seq("fifty" -> 0L)
    val tagged = PackStore.scanTag(spark, base, "fifty").collect()
    tagged.map(_.media_id).sorted shouldBe (0L until 50L).toArray
    // untagged expired snapshot is really gone
    intercept[Exception](PackStore.scanAt(spark, base, 1L).collect())
    // the live view is untouched by tag machinery
    PackStore.scan(spark, base).count() shouldBe 200

    // drop the pin: the next vacuum expires snap 0 and reclaims its dirs
    PackStore.dropTag(spark, base, "fifty")
    PackStore.vacuum(spark, base, retainSnapshots = 1, orphanGraceMs = 0L)
    PackStore.listTags(spark, base) shouldBe Seq.empty
    intercept[Exception](PackStore.scanAt(spark, base, 0L).collect())
    PackStore.scan(spark, base).count() shouldBe 200
  }

  test("tags are immutable and validated: duplicate name, bad name, untaggable snapshot") {
    val base = freshBase("val")
    PackStore.initBase(spark, base, objs(0, 10), 1) // snap 0
    PackStore.createTag(spark, base, "v1.0", 0L)
    PackStore.resolveTag(spark, base, "v1.0") shouldBe 0L
    intercept[IllegalStateException](PackStore.createTag(spark, base, "v1.0", 0L))
    intercept[IllegalArgumentException](PackStore.createTag(spark, base, "bad name", 0L))
    intercept[IllegalArgumentException](PackStore.createTag(spark, base, "ghost", 7L))
    intercept[IllegalArgumentException](PackStore.resolveTag(spark, base, "nope"))
  }
}
