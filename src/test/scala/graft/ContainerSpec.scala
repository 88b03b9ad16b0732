package graft

import graft.multimodal.{ContainerOps, VideoContainerOps}
import graft.multimodal.ContainerOps.{ContainerEncoder, ContainerParser}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Container-format parsing specs: metadata must come FROM the bytes
  * (header walks, not sidecar columns), and malformed payloads must
  * surface as typed errors, never as exceptions or silent nulls.
  */
class ContainerSpec extends SparkTestBase with Matchers {

  private val body = "the quick brown fox".getBytes("UTF-8")

  test("png: width/height/channels/depth parsed from IHDR bytes") {
    val r = ContainerParser.parse(1L, ContainerOps.pngBytes(640, 480, body))
    r.error shouldBe None
    r.format shouldBe Some("png")
    r.width shouldBe Some(640)
    r.height shouldBe Some(480)
    r.channels shouldBe Some(3) // color type 2 = truecolor
    r.bits_per_sample shouldBe Some(8)
    r.sample_rate shouldBe None
  }

  test("jpeg: SOF0 found by marker walk, even with extra segments before it") {
    // standard build: SOI + APP0 + SOF0
    val std = ContainerParser.parse(2L, ContainerOps.jpegBytes(1024, 768, body))
    std.error shouldBe None
    std.format shouldBe Some("jpeg")
    std.width shouldBe Some(1024)
    std.height shouldBe Some(768)
    std.channels shouldBe Some(3)
    // insert a COM (0xFFFE) and a DQT-ish (0xFFDB) segment between APP0 and
    // SOF0 — a real stream's shape; the walk must skip them by length
    val base = ContainerOps.jpegBytes(320, 200, body)
    val (head, tail) = base.splitAt(20) // SOI(2) + APP0(18)
    val com = Array(0xff, 0xfe).map(_.toByte) ++ Array[Byte](0, 7) ++ "hello".getBytes("US-ASCII")
    val dqt = Array(0xff, 0xdb).map(_.toByte) ++ Array[Byte](0, 4, 0, 1)
    val r = ContainerParser.parse(3L, head ++ com ++ dqt ++ tail)
    r.error shouldBe None
    r.width shouldBe Some(320)
    r.height shouldBe Some(200)
  }

  test("wav: channels/sample rate parsed from fmt chunk, even after an extra chunk") {
    val std = ContainerParser.parse(4L, ContainerOps.wavBytes(2, 44100, body))
    std.error shouldBe None
    std.format shouldBe Some("wav")
    std.channels shouldBe Some(2)
    std.sample_rate shouldBe Some(44100)
    std.bits_per_sample shouldBe Some(16)
    std.width shouldBe None
    // splice a LIST chunk (odd size → word-aligned skip) before fmt
    val base = ContainerOps.wavBytes(1, 8000, body)
    val (head, tail) = base.splitAt(12) // RIFF + size + WAVE
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0) // pad to even
    val r = ContainerParser.parse(5L, head ++ list ++ tail)
    r.error shouldBe None
    r.channels shouldBe Some(1)
    r.sample_rate shouldBe Some(8000)
  }

  test("malformed payloads are typed errors, not exceptions") {
    // flipped magic → bad_magic, no format, no fields
    val png = ContainerOps.pngBytes(64, 64, body)
    png(0) = (png(0) ^ 0xff).toByte
    val bad = ContainerParser.parse(6L, png)
    bad.error shouldBe Some("bad_magic")
    bad.format shouldBe None
    bad.width shouldBe None
    // truncated headers → truncated, format reported only once magic pins it
    ContainerParser.parse(7L, ContainerOps.pngBytes(64, 64, body).take(10))
      .error shouldBe Some("truncated")
    ContainerParser.parse(7L, ContainerOps.pngBytes(64, 64, body).take(10))
      .format shouldBe Some("png")
    val wavTrunc = ContainerParser.parse(8L, ContainerOps.wavBytes(1, 8000, body).take(10))
    wavTrunc.error shouldBe Some("truncated")
    wavTrunc.format shouldBe None // RIFF form not yet confirmed as WAVE
    ContainerParser.parse(9L, ContainerOps.jpegBytes(64, 64, body).take(10))
      .error shouldBe Some("truncated")
    // RIFF but not WAVE
    val avi = ContainerOps.wavBytes(1, 8000, body)
    avi(8) = 'A'.toByte; avi(9) = 'V'.toByte; avi(10) = 'I'.toByte; avi(11) = ' '.toByte
    ContainerParser.parse(10L, avi).error shouldBe Some("bad_riff_form")
    // PNG sig followed by a non-IHDR chunk
    val notIhdr = ContainerOps.pngBytes(64, 64, body)
    notIhdr(12) = 'X'.toByte
    ContainerParser.parse(11L, notIhdr).error shouldBe Some("bad_ihdr")
    // WAV with fmt chunk missing entirely
    val noFmt = ContainerParser.parse(12L,
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII"))
    noFmt.error shouldBe Some("no_fmt_chunk")
    // garbage
    ContainerParser.parse(13L, Array[Byte](1, 2, 3, 4, 5)).error shouldBe Some("bad_magic")
    // checksum/length still reported for malformed rows (byte properties)
    bad.n_bytes shouldBe png.length
    bad.checksum shouldBe ContainerParser.checksum(png)
  }

  test("jpeg: fill bytes and standalone markers are walked per T.81 grammar") {
    // 0xFF fill bytes before a marker code must be skipped, and TEM /
    // RST0-7 carry no length segment — a walk that reads a bogus segLen
    // from the following bytes would misclassify real streams
    val base = ContainerOps.jpegBytes(320, 200, body)
    val (head, tail) = base.splitAt(20) // SOI(2) + APP0(18)
    val fill = Array(0xff, 0xff, 0xff).map(_.toByte) // fill bytes then tail's own FF
    val tem = Array(0xff, 0x01).map(_.toByte) // standalone TEM
    val rst = Array(0xff, 0xd3).map(_.toByte) // standalone RST3
    val r = ContainerParser.parse(20L, head ++ tem ++ fill ++ tail.drop(1) ++ Array[Byte]())
    r.error shouldBe None
    r.width shouldBe Some(320)
    val r2 = ContainerParser.parse(21L, head ++ rst ++ tail)
    r2.error shouldBe None
    r2.height shouldBe Some(200)
    // EOI before any SOF is a typed structural error, not a bogus segLen read
    val eoi = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    ContainerParser.parse(22L, eoi).error shouldBe Some("no_sof")
  }

  test("riff: negative/oversized chunk size bails as typed error, never spins") {
    // chunk size with the top bit set reads back negative from rLe32; the
    // walk must surface bad_chunk instead of advancing by a non-positive
    // step forever (executor-hang regression guard)
    val evil = "RIFF".getBytes("US-ASCII") ++ Array[Byte](100, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, -128) ++ // size = Int.MinValue
      new Array[Byte](64)
    val r = ContainerParser.parse(30L, evil)
    r.error shouldBe Some("bad_chunk")
    r.format shouldBe Some("wav")
    // a huge-but-positive size that runs off the payload ends the walk (no fmt seen)
    val big = "RIFF".getBytes("US-ASCII") ++ Array[Byte](100, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ Array[Byte](-1, -1, -1, 0x7f) ++ // ~Int.MaxValue
      new Array[Byte](64)
    ContainerParser.parse(31L, big).error shouldBe Some("no_fmt_chunk")
  }

  test("encoder inverts the parser byte-exactly for every builder format") {
    for ((payload, name) <- Seq(
        (ContainerOps.pngBytes(640, 480, body), "png"),
        (ContainerOps.wavBytes(2, 44100, body), "wav"),
        (ContainerOps.jpegBytes(1024, 768, body), "jpeg"))) {
      val parsed = ContainerParser.parseFull(1L, payload)
      withClue(s"$name: ") {
        parsed.row.error shouldBe None
        parsed.bodyOffset should be > 0
        val bodyBytes = payload.drop(parsed.bodyOffset)
        bodyBytes shouldBe body
        ContainerEncoder.encode(parsed.row, bodyBytes).toOption.get shouldBe payload
      }
    }
    // full builder schedule: parse→encode→re-parse is identity for clean ids
    for (id <- 1L to 120L if id % 97 != 0 && id % 89 != 0) {
      val p = ContainerOps.buildPayload(id, s"doc $id body text", 40 + id)
      val parsed = ContainerParser.parseFull(id, p)
      val re = ContainerEncoder.encode(parsed.row, p.drop(parsed.bodyOffset))
      re.toOption.get shouldBe p
    }
  }

  test("encoder quarantines unencodable rows as typed Lefts") {
    val bad = ContainerParser.parse(6L, Array[Byte](1, 2, 3))
    ContainerEncoder.encode(bad, body) shouldBe Left("unparsed_row")
    val png = ContainerParser.parse(1L, ContainerOps.pngBytes(64, 64, body))
    ContainerEncoder.encode(png.copy(channels = Some(5)), body) shouldBe Left("bad_channels")
    ContainerEncoder.encode(png.copy(format = Some("gif")), body) shouldBe Left("unknown_format")
    val wav = ContainerParser.parse(2L, ContainerOps.wavBytes(1, 8000, body))
    ContainerEncoder.encode(wav.copy(sample_rate = Some(0)), body) shouldBe Left("bad_fmt")
  }

  test("corrupted re-encoded object surfaces as typed error, not a task failure") {
    val parsed = ContainerParser.parseFull(1L, ContainerOps.pngBytes(64, 64, body))
    val re = ContainerEncoder.encode(parsed.row, body).toOption.get
    re(0) = (re(0) ^ 0xff).toByte
    val r = ContainerParser.parse(1L, re)
    r.error shouldBe Some("bad_magic")
    val wavRe = ContainerEncoder.encode(
      ContainerParser.parseFull(2L, ContainerOps.wavBytes(2, 44100, body)).row, body).toOption.get
    val r2 = ContainerParser.parse(2L, wavRe.take(10))
    r2.error shouldBe Some("truncated")
  }

  test("q_mm_encode: clean rows round-trip the object store with identical checksums") {
    val source = ContainerOps.mmContainer.query(spark, sfTiny).collect()
      .filter(_.isNullAt(9)).map(r => r.getLong(0) -> r.getLong(3)).toMap
    val rows = ContainerOps.mmEncode.query(spark, sfTiny).collect()
    rows.length shouldBe 489 // the 11 injected-malformed rows are quarantined
    rows.foreach { r =>
      r.isNullAt(9) shouldBe true // every re-encoded object re-parses cleanly
      r.getLong(3) shouldBe source(r.getLong(0)) // byte-exact: checksum matches source payload
    }
  }

  test("q_mm_encode_packed: packed encode layout serves the identical rows as the loose export") {
    val loose = ContainerOps.mmEncode.query(spark, sfTiny).collect().map(_.toString).sorted
    val packed = ContainerOps.mmEncodePacked.query(spark, sfTiny).collect().map(_.toString).sorted
    packed shouldBe loose
  }

  test("q_mm_transcode: headers rewritten to halved values, bodies preserved, malformed rows quarantined") {
    // direct lane first: a transformed header re-encodes with the body intact
    val p = ContainerOps.pngBytes(100, 60, body)
    val parsed = ContainerParser.parseFull(9L, p)
    val enc = ContainerEncoder.encode(
      parsed.row.copy(width = Some(50), height = Some(30)),
      java.util.Arrays.copyOfRange(p, parsed.bodyOffset, p.length)).toOption.get
    val re = ContainerParser.parseFull(9L, enc)
    re.row.error shouldBe None
    re.row.width shouldBe Some(50)
    re.row.height shouldBe Some(30)
    java.util.Arrays.copyOfRange(enc, re.bodyOffset, enc.length) shouldBe body

    // query lane: every surviving row is clean with exactly-halved fields;
    // the injected-malformed rows are quarantined (dropped), not thrown
    val src = ContainerOps.mmContainer.query(spark, sfTiny).collect()
      .filter(_.isNullAt(9)).map(r => r.getLong(0) -> r).toMap
    val rows = ContainerOps.mmTranscode.query(spark, sfTiny).collect()
    rows.length shouldBe src.size
    rows.foreach { r =>
      r.isNullAt(9) shouldBe true
      val s0 = src(r.getLong(0))
      Seq(4, 5, 7).foreach { i => // width, height, sample_rate
        if (s0.isNullAt(i)) r.isNullAt(i) shouldBe true
        else r.getInt(i) shouldBe s0.getInt(i) / 2
      }
      if (!s0.isNullAt(6)) r.getInt(6) shouldBe s0.getInt(6) // channels untouched
    }
  }

  test("mp4: mvhd/tkhd fields parsed from the box walk; encoder inverts byte-exactly") {
    import graft.multimodal.VideoContainerOps
    import graft.multimodal.VideoContainerOps.VideoParser
    val payload = VideoContainerOps.mp4Bytes(640, 480, 1200, 90000, body)
    val r = VideoParser.parse(1L, payload)
    r.error shouldBe None
    r.format shouldBe Some("mp4")
    r.width shouldBe Some(640)
    r.height shouldBe Some(480)
    r.timescale shouldBe Some(1200)
    r.duration shouldBe Some(90000)
    // encoder inverts the parse byte-exactly; body sits after the header
    payload.drop(VideoContainerOps.BodyOffset) shouldBe body
    VideoContainerOps.encodeVideo(r, body).toOption.get shouldBe payload
    // full builder schedule round-trips for clean ids
    for (id <- 1L to 120L if id % 97 != 0 && id % 89 != 0) {
      val p = VideoContainerOps.buildVideoPayload(id, s"doc $id body", 30 + id)
      val parsed = VideoParser.parse(id, p)
      parsed.error shouldBe None
      VideoContainerOps.encodeVideo(parsed, p.drop(VideoContainerOps.BodyOffset))
        .toOption.get shouldBe p
    }
  }

  test("mp4: malformed payloads are typed errors, never exceptions or stuck walks") {
    import graft.multimodal.VideoContainerOps
    import graft.multimodal.VideoContainerOps.VideoParser
    val good = VideoContainerOps.mp4Bytes(64, 64, 600, 1000, body)
    // flipped ftyp byte → bad_magic, no fields
    val bad = good.clone(); bad(4) = (bad(4) ^ 0xff).toByte
    VideoParser.parse(1L, bad).error shouldBe Some("bad_magic")
    VideoParser.parse(1L, bad).format shouldBe None
    // truncation inside the first box → truncated, format pinned by the sniff
    val trunc = VideoParser.parse(2L, good.take(10))
    trunc.error shouldBe Some("truncated")
    trunc.format shouldBe Some("mp4")
    // a box size too small to hold its own header → bad_box (loop guard)
    val tiny = good.clone(); tiny(27) = 4 // moov size 216 → 4 (< 8)
    VideoParser.parse(3L, tiny).error shouldBe Some("bad_box")
    // a box claiming more bytes than the payload has → truncated
    val over = good.clone(); over(24) = 0x7f.toByte // moov size → huge
    VideoParser.parse(4L, over).error shouldBe Some("truncated")
    // ftyp alone, no moov → no_moov
    VideoParser.parse(5L, good.take(24)).error shouldBe Some("no_moov")
    // encoder quarantine
    VideoContainerOps.encodeVideo(VideoParser.parse(1L, bad), body) shouldBe Left("unparsed_row")
    // corrupted re-encoded object → typed error, not a throw
    val re = VideoContainerOps.encodeVideo(VideoParser.parse(6L, good), body).toOption.get
    re(4) = (re(4) ^ 0xff).toByte
    VideoParser.parse(6L, re).error shouldBe Some("bad_magic")
  }

  test("q_mm_video_encode: clean rows round-trip the object store with identical checksums") {
    import graft.multimodal.VideoContainerOps
    val source = VideoContainerOps.mmVideo.query(spark, sfTiny).collect()
      .filter(_.isNullAt(8)).map(r => r.getLong(0) -> r.getLong(3)).toMap
    val rows = VideoContainerOps.mmVideoEncode.query(spark, sfTiny).collect()
    rows.length shouldBe 489 // same injection schedule as the image/audio path
    rows.foreach { r =>
      r.isNullAt(8) shouldBe true
      r.getLong(3) shouldBe source(r.getLong(0)) // byte-exact rebuild
    }
  }

  test("q_mm_container: valid rows parse, injected malformed rows quarantine") {
    val rows = ContainerOps.mmContainer.query(spark, sfTiny).collect()
    rows.length shouldBe 500
    val byErr = rows.groupBy(r => Option(r.getString(9)))
    // injection schedule: %97 → bad_magic {0,97,194,291,388,485}; %89 (minus 0) → truncated
    byErr(Some("bad_magic")).map(_.getLong(0)).sorted shouldBe Array(0L, 97L, 194L, 291L, 388L, 485L)
    byErr(Some("truncated")).map(_.getLong(0)).sorted shouldBe Array(89L, 178L, 267L, 356L, 445L)
    val ok = byErr(None)
    ok.length shouldBe 489
    // every valid row's fields came from a successful byte parse
    ok.foreach { r =>
      val fmt = r.getString(1)
      fmt should (be("png") or be("wav") or be("jpeg"))
      if (fmt == "wav") { r.isNullAt(4) shouldBe true; r.getInt(7) should be >= 8000 }
      else { r.getInt(4) should be >= 16; r.isNullAt(7) shouldBe true }
    }
    // parse is a narrow map: no shuffle before the sort
    val plan = ContainerOps.mmContainer.query(spark, sfTiny).queryExecution.executedPlan.toString
    plan.split("Exchange").length - 1 shouldBe 1 // only the final orderBy range exchange
  }

  test("stsz sample table: box walk is load-bearing, slicing matches the crafted samples") {
    val samples = Seq("alpha", "bee", "ccccc", "dd").map(_.getBytes("US-ASCII"))
    val p = VideoContainerOps.mp4WithSamples(samples)
    // the nested walk finds stsz through the real moov>trak>mdia>minf>stbl path
    val Some((ss, se)) = VideoContainerOps.findBox(p, 0, p.length,
      List("moov", "trak", "mdia", "minf", "stbl", "stsz")): @unchecked
    def rBe(i: Int): Int = ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
      ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    rBe(ss + 8) shouldBe 4 // sample_count
    (0 until 4).map(k => rBe(ss + 12 + 4 * k)) shouldBe Seq(5, 3, 5, 2)
    se - ss shouldBe 12 + 16
    // mdat slicing at the parsed offsets reproduces the samples
    val Some((ms, me)) = VideoContainerOps.findBox(p, 0, p.length, List("mdat")): @unchecked
    new String(p, ms, me - ms, "US-ASCII") shouldBe "alphabeecccccdd"
    // a corrupted child size makes the walk REFUSE (None), never loop/misread
    val bad = p.clone()
    val Some((moovS, _)) = VideoContainerOps.findBox(bad, 0, bad.length, List("moov")): @unchecked
    bad(moovS) = 0; bad(moovS + 1) = 0; bad(moovS + 2) = 0; bad(moovS + 3) = 1 // trak size 1 < 8
    VideoContainerOps.findBox(bad, 0, bad.length,
      List("moov", "trak", "mdia", "minf", "stbl", "stsz")) shouldBe None
  }
}
