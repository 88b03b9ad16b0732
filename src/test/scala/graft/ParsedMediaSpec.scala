package graft

import graft.multimodal.{ContainerOps, ParsedMediaOps}
import org.scalatest.matchers.should.Matchers

/** The graduated decode family (ParsedMediaOps): the quarantine
  * arithmetic of the malformed-payload injection, a full Scala
  * brute-force twin of the PCM sample decode (independent of both the
  * Spark plan and the DuckDB oracle), sign-branch coverage (the decode
  * must see genuinely negative samples), and geometry provenance (the
  * scanline width used by framesample is the header-parsed one).
  */
class ParsedMediaSpec extends SparkTestBase with Matchers {

  private lazy val docs: Seq[(Long, String, Long)] =
    Tables.documents(spark, sfTiny)
      .select("doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("malformed payloads quarantine out: decode rows == docs minus injections") {
    val expected = docs.count { case (id, _, _) => id % 97 != 0 && id % 89 != 0 }
    val rows = ParsedMediaOps.mmDecode.query(spark, sfTiny).collect()
    rows.length shouldBe expected
    val ids = rows.map(_.getLong(0)).toSet
    ids.exists(id => id % 97 == 0 || id % 89 == 0) shouldBe false
  }

  test("pcm decode == Scala brute-force twin (frames, sign, mean), with real negatives") {
    val got = ParsedMediaOps.mmPcm.query(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> r).toMap
    got.size shouldBe docs.size
    var totalNeg = 0L
    var mixedRows = 0
    docs.foreach { case (id, text, _) =>
      val body = text.getBytes("UTF-8").map(b =>
        if ((b & 0xff) % 2 == 1) (b ^ 0x80).toByte else b)
      val ch = (1 + id % 2).toInt
      val ba = ch * 2
      val nf = body.length / ba
      val samples = (0 until nf).map { f =>
        val u = (body(f * ba) & 0xff) | ((body(f * ba + 1) & 0xff) << 8)
        if (u >= 32768) u - 65536 else u
      }
      val r = got(id)
      r.getInt(1) shouldBe ch
      r.getInt(2) shouldBe (8000 << (id % 3)).toInt
      r.getInt(3) shouldBe nf
      r.getLong(5) shouldBe samples.count(_ < 0).toLong
      if (nf > 0)
        r.getDouble(6) shouldBe samples.map(_.toLong).sum.toDouble / nf
      totalNeg += samples.count(_ < 0)
      if (samples.exists(_ < 0) && samples.exists(_ >= 0)) mixedRows += 1
    }
    // the sign branch must be EXERCISED, not vacuous: negatives exist and
    // most rows mix signs (odd/even high bytes in real text)
    totalNeg should be > 0L
    mixedRows should be > docs.size / 2
  }

  test("framesample scanlines use the HEADER-PARSED width, not a fixed window") {
    val rows = ParsedMediaOps.mmFrames.query(spark, sfTiny).collect()
    rows should not be empty
    val byId = docs.map { case (id, t, n) => id -> ((t.getBytes("UTF-8").length, n)) }.toMap
    rows.foreach { r =>
      val (len, nChars) = byId(r.getLong(0))
      val w = (nChars % 512 + 16).toInt
      r.getInt(2) shouldBe w // the geometry the parser read out of IHDR/SOF0
      r.getInt(1) % 4 shouldBe 0
      r.getInt(1) should be < len / w
    }
  }

  test("resize output bytes == stride-2 of the parsed body (checksum twin)") {
    val got = ParsedMediaOps.mmResize.query(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.filter { case (id, _, _) => id % 97 != 0 && id % 89 != 0 }.foreach {
      case (id, text, _) =>
        val body = text.getBytes("UTF-8")
        val down = Array.tabulate((body.length + 1) / 2)(i => body(2 * i))
        var acc = 1L
        down.foreach(b => acc = (acc * 31 + (b & 0xff)) % 1000000007L)
        got(id).getLong(3) shouldBe acc
        got(id).getInt(2) shouldBe down.length
    }
  }

  test("png idat: the zlib layer is real — Adler32 class recomputes the trailer, pixels round-trip") {
    val rows = ParsedMediaOps.mmPngIdat.query(spark, sfTiny).collect()
    rows.length shouldBe docs.size
    val byId = docs.map { case (id, t, n) => id -> ((t.getBytes("UTF-8"), n)) }.toMap
    rows.foreach { r =>
      val (px, nChars) = byId(r.getLong(0))
      val w = (nChars % 512 + 16).toInt
      val nrows = (px.length + w - 1) / w
      r.getInt(1) shouldBe w
      r.getInt(2) shouldBe nrows
      // independent Adler-32: the JDK's own checksum class over the raw
      // scanlines must equal the trailer the query READ FROM THE STREAM
      val raw = new Array[Byte](nrows * (w + 1))
      for (rr <- 0 until nrows; c <- 0 until w) {
        val j = rr * w + c
        raw(rr * (w + 1) + 1 + c) = if (j < px.length) px(j) else 0
      }
      val ad = new java.util.zip.Adler32(); ad.update(raw)
      r.getLong(4) shouldBe ad.getValue
      // independent CRC-32: the JDK class over type+stream must equal the
      // chunk CRC the query READ from the container (and validated)
      val defl = new java.util.zip.Deflater(java.util.zip.Deflater.NO_COMPRESSION)
      defl.setInput(raw); defl.finish()
      val zb = new Array[Byte](raw.length + 64)
      val zl = defl.deflate(zb); defl.end()
      val crc = new java.util.zip.CRC32()
      crc.update("IDAT".getBytes("US-ASCII")); crc.update(zb, 0, zl)
      r.getLong(5) shouldBe crc.getValue
      // single-stored-block container arithmetic
      r.getInt(3) shouldBe raw.length + 11
      // decoded pixel mean == direct computation over padded matrix
      val sum = px.map(_ & 0xff).map(_.toLong).sum
      r.getDouble(8) shouldBe sum.toDouble / (w * nrows)
    }
  }

  test("the parse is load-bearing: a corrupted header changes what decode sees") {
    // same body, different header bytes → different parsed geometry; the
    // decode family reads geometry from the BYTES, so this must differ
    val body = "0123456789abcdef0123456789abcdef".getBytes("US-ASCII")
    val p1 = ContainerOps.ContainerParser.parseFull(1L, ContainerOps.pngBytes(8, 4, body))
    val p2 = ContainerOps.ContainerParser.parseFull(1L, ContainerOps.pngBytes(16, 2, body))
    p1.row.width shouldBe Some(8)
    p2.row.width shouldBe Some(16)
    p1.bodyOffset shouldBe p2.bodyOffset // same layout, different geometry
  }
}
