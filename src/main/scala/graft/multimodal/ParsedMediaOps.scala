package graft.multimodal

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 graduation of the multimodal DECODE family (r9 verdict item
  * 2): q_mm_decode / q_mm_resize / q_mm_framesample / q_mm_pcm now read
  * pixels/samples from the REAL parsed container bodies — the payloads
  * are genuine PNG/JFIF/RIFF containers ([[ContainerOps.buildPayload]]),
  * [[ContainerOps.ContainerParser]] walks the actual chunk/marker/RIFF
  * structure to recover geometry (width/height out of IHDR / SOF0,
  * channels + sample rate out of `fmt `) and to LOCATE the coded body,
  * and every feature below is computed from `payload[bodyOffset..]` at
  * the header-parsed geometry. Malformed payloads (flipped magic,
  * truncation — the builder's doc_id % 97 / % 89 injection) fall out of
  * the decode through the parser's typed-error quarantine, exactly as a
  * 100 TB ingest drops bad objects without killing the scan task.
  *
  * What remains deliberately fake — and marked: the pixel VALUES. The
  * container has no imaging/audio libraries, so the "coded stream" is a
  * stand-in byte sequence (1 byte = 1 grayscale pixel for images; 16-bit
  * LE PCM frames for audio — a REAL sample decode, including sign
  * handling and channel stride, over stand-in bytes). Every output is
  * pure byte arithmetic and carries a full DuckDB oracle that
  * reconstructs the body from the source documents — the driver verifies
  * the parse → locate → decode pipeline end-to-end, not just row counts.
  *
  * Scale design: build + parse + decode run in ONE narrow mapPartitions
  * over the documents scan — payload bytes never shuffle; only the tiny
  * feature rows reach the output sort.
  */
object ParsedMediaOps {

  /** One successfully parsed media row: header-parsed metadata + the
    * located coded body. Metadata comes from the BYTES (ContainerParser),
    * never from sidecar columns.
    */
  final case class ParsedMediaRow(
      media_id: Long, format: String,
      width: Option[Int], height: Option[Int],
      channels: Option[Int], sample_rate: Option[Int],
      bits_per_sample: Option[Int], body: Array[Byte])

  /** Documents → genuine containers → parsed rows (parse-OK only; the
    * corrupt/truncated injections quarantine out through the typed
    * error). Narrow: one map over the scan, no shuffle.
    */
  def parsedMedia(s: SparkSession, dir: String): Dataset[ParsedMediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.flatMap { case (id, text, nChars) =>
        val payload = ContainerOps.buildPayload(id, text, nChars)
        val pr = ContainerOps.ContainerParser.parseFull(id, payload)
        if (pr.row.error.isEmpty && pr.bodyOffset >= 0)
          Some(ParsedMediaRow(id, pr.row.format.get,
            pr.row.width, pr.row.height, pr.row.channels,
            pr.row.sample_rate, pr.row.bits_per_sample,
            payload.drop(pr.bodyOffset)))
        else None
      })
  }

  private def polyChecksum(xs: Iterator[Long]): Long = {
    var acc = 1L
    while (xs.hasNext) acc = (acc * 31 + xs.next()) % 1000000007L
    acc
  }

  /** Shared oracle prelude: the parse-OK documents with their body byte
    * codes (body == text bytes for every builder payload) and the
    * builder's geometry arithmetic. The corrupt/truncate filters mirror
    * [[ContainerOps.buildPayload]]'s injection schedule.
    */
  private val OracleBodySql = """
      m AS (SELECT doc_id AS media_id, text, n_chars, octet_length(encode(text)) AS len
            FROM documents WHERE doc_id % 97 != 0 AND doc_id % 89 != 0),
      b AS (SELECT media_id, n_chars, len,
                   list_transform(range(1, len + 1), i -> CAST(unicode(substring(text, i, 1)) AS BIGINT)) AS codes
            FROM m)""".trim

  final case class DecodeOut(
      media_id: Long, format: String, n_bytes: Int, checksum: Long,
      width: Option[Int], height: Option[Int], sample_rate: Option[Int],
      mean_intensity: Option[Double])

  /** Decode = locate the coded body via the real header walk, then
    * summarize it: byte count, polynomial checksum, mean intensity —
    * with the geometry REPORTED FROM THE PARSED HEADER BYTES (IHDR /
    * SOF0 / `fmt `), which the oracle independently reconstructs from
    * the builder arithmetic. A header/byte mismatch anywhere in
    * build → parse → locate → decode breaks the hash compare.
    */
  val mmDecode = QueryDef(
    "q_mm_decode",
    (s, dir) => {
      import s.implicits._
      parsedMedia(s, dir).mapPartitions(_.map { m =>
        DecodeOut(m.media_id, m.format, m.body.length,
          polyChecksum(m.body.iterator.map(b => (b & 0xff).toLong)),
          m.width, m.height, m.sample_rate,
          // n==0 guard (the mmPcm pattern): an empty body must agree with
          // the oracle's NULL (list_sum of an empty list), not print NaN
          if (m.body.isEmpty) None
          else Some(m.body.iterator.map(b => (b & 0xff).toLong).sum.toDouble / m.body.length))
      }).toDF().orderBy("media_id")
    },
    Some(s"""
      WITH $OracleBodySql
      SELECT media_id,
             CASE media_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END AS format,
             CAST(len AS INTEGER) AS n_bytes,
             list_reduce(list_prepend(CAST(1 AS BIGINT), codes),
                         (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
             CASE WHEN media_id % 3 != 1 THEN CAST(n_chars % 512 + 16 AS INTEGER) END AS width,
             CASE WHEN media_id % 3 != 1 THEN CAST(n_chars % 384 + 16 AS INTEGER) END AS height,
             CASE WHEN media_id % 3 = 1 THEN CAST(8000 * (1 + (media_id % 9) // 3) AS INTEGER) END AS sample_rate,
             CAST(list_sum(codes) AS DOUBLE) / len AS mean_intensity
      FROM b ORDER BY media_id
    """.trim),
  )

  final case class ResizeOut(
      media_id: Long, format: String, n_bytes: Int, checksum: Long,
      width: Option[Int], height: Option[Int], sample_rate: Option[Int])

  /** Resize = stride-2 downsample of the PARSED body (pixels for images,
    * sample bytes for audio — a 2× decimation stand-in) with the parsed
    * geometry halved: dims for images, rate for audio. The checksum is
    * over the downsampled bytes, so the oracle verifies the resample
    * output itself, not just its size.
    */
  val mmResize = QueryDef(
    "q_mm_resize",
    (s, dir) => {
      import s.implicits._
      parsedMedia(s, dir).mapPartitions(_.map { m =>
        val down = Array.tabulate((m.body.length + 1) / 2)(i => m.body(2 * i))
        ResizeOut(m.media_id, m.format, down.length,
          polyChecksum(down.iterator.map(b => (b & 0xff).toLong)),
          m.width.map(_ / 2), m.height.map(_ / 2), m.sample_rate.map(_ / 2))
      }).toDF().orderBy("media_id")
    },
    Some(s"""
      WITH $OracleBodySql,
      d AS (SELECT media_id, n_chars, (len + 1) // 2 AS dlen,
                   list_transform(range(0, (len + 1) // 2),
                                  i -> CAST(unicode(substring(text, CAST(2 * i + 1 AS INTEGER), 1)) AS BIGINT)) AS dcodes
            FROM m)
      SELECT media_id,
             CASE media_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'jpeg' END AS format,
             CAST(dlen AS INTEGER) AS n_bytes,
             list_reduce(list_prepend(CAST(1 AS BIGINT), dcodes),
                         (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
             CASE WHEN media_id % 3 != 1 THEN CAST((n_chars % 512 + 16) // 2 AS INTEGER) END AS width,
             CASE WHEN media_id % 3 != 1 THEN CAST((n_chars % 384 + 16) // 2 AS INTEGER) END AS height,
             CASE WHEN media_id % 3 = 1 THEN CAST(8000 * (1 + (media_id % 9) // 3) // 2 AS INTEGER) END AS sample_rate
      FROM d ORDER BY media_id
    """.trim),
  )

  /** Frame-sample = every 4th SCANLINE of the image body at the
    * HEADER-PARSED width (the real geometry recovered from IHDR/SOF0 —
    * not a fixed 64-byte window): frame f covers body[f·w, (f+1)·w).
    * Only full scanlines count; audio rows route to q_mm_pcm instead.
    */
  val mmFrames = QueryDef(
    "q_mm_framesample",
    (s, dir) => {
      import s.implicits._
      parsedMedia(s, dir)
        .filter(col("format") =!= "wav")
        .as[ParsedMediaRow]
        .mapPartitions(_.flatMap { m =>
          val w = m.width.get
          (0 until m.body.length / w).collect {
            case f if f % 4 == 0 =>
              var sum = 0L
              var i = f * w
              while (i < (f + 1) * w) { sum += (m.body(i) & 0xff); i += 1 }
              (m.media_id, f, w, sum.toDouble / w)
          }
        }).toDF("media_id", "frame_idx", "scan_width", "frame_mean")
        .orderBy("media_id", "frame_idx")
    },
    Some(s"""
      WITH $OracleBodySql,
      img AS (SELECT media_id, n_chars % 512 + 16 AS w, len, text FROM m WHERE media_id % 3 != 1),
      idx AS (SELECT media_id, w, text, CAST(unnest(range(0, len // w)) AS INTEGER) AS frame_idx FROM img),
      f AS (SELECT * FROM idx WHERE frame_idx % 4 = 0)
      SELECT media_id, frame_idx, CAST(w AS INTEGER) AS scan_width,
             list_avg(list_transform(range(1, CAST(w + 1 AS INTEGER)),
                      i -> unicode(substring(text, CAST(frame_idx * w AS INTEGER) + i, 1)))) AS frame_mean
      FROM f ORDER BY media_id, frame_idx
    """.trim),
  )

  final case class PcmOut(
      media_id: Long, channels: Int, sample_rate: Int, n_frames: Int,
      checksum: Long, n_neg: Long, mean_c0: Option[Double])

  /** REAL 16-bit LE PCM sample decode through the full container loop:
    * synthesize a WAV per document (the q_fn_url house pattern) whose
    * data bytes carry genuine sign-bit diversity (odd-valued bytes get
    * the high bit flipped), parse the RIFF/fmt /data walk for channel
    * count + rate + body offset, then decode channel-0 frames exactly as
    * a PCM reader does: u = lo | hi<<8, signed = u − 65536·[hi ≥ 128],
    * frame stride = 2·channels. `n_neg` > 0 on real text proves the sign
    * branch executes; checksum/mean are exact integer arithmetic the
    * oracle replays byte-for-byte.
    */
  val mmPcm = QueryDef(
    "q_mm_pcm",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val body = text.getBytes("UTF-8").map(b =>
            if ((b & 0xff) % 2 == 1) (b ^ 0x80).toByte else b)
          val ch = (1 + id % 2).toInt
          val sr = (8000 << (id % 3)).toInt
          val payload = ContainerOps.wavBytes(ch, sr, body)
          val pr = ContainerOps.ContainerParser.parseFull(id, payload)
          val pBody = payload.drop(pr.bodyOffset)
          val pCh = pr.row.channels.get
          val ba = pCh * pr.row.bits_per_sample.get / 8
          val nf = pBody.length / ba
          var acc = 1L
          var sum = 0L
          var neg = 0L
          var f = 0
          while (f < nf) {
            val lo = pBody(f * ba) & 0xff
            val hi = pBody(f * ba + 1) & 0xff
            val u = lo | (hi << 8)
            acc = (acc * 31 + u) % 1000000007L
            val sgn = if (hi >= 128) u - 65536 else u
            sum += sgn
            if (sgn < 0) neg += 1
            f += 1
          }
          PcmOut(id, pCh, pr.row.sample_rate.get, nf, acc, neg,
            if (nf > 0) Some(sum.toDouble / nf) else None)
        }).toDF().orderBy("media_id")
    },
    Some("""
      WITH m AS (SELECT doc_id AS media_id, text, octet_length(encode(text)) AS len,
                        CAST(1 + doc_id % 2 AS INTEGER) AS channels,
                        CAST(8000 * (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END) AS INTEGER) AS sample_rate
                 FROM documents),
      t AS (SELECT media_id, channels, sample_rate, 2 * channels AS ba, len // (2 * channels) AS nf, text FROM m),
      sm AS (SELECT media_id, channels, sample_rate, CAST(nf AS INTEGER) AS n_frames,
                    list_transform(range(0, nf), f -> (
                      CASE WHEN unicode(substring(text, CAST(f * ba + 1 AS INTEGER), 1)) % 2 = 1
                           THEN xor(unicode(substring(text, CAST(f * ba + 1 AS INTEGER), 1)), 128)
                           ELSE unicode(substring(text, CAST(f * ba + 1 AS INTEGER), 1)) END
                      + 256 * (CASE WHEN unicode(substring(text, CAST(f * ba + 2 AS INTEGER), 1)) % 2 = 1
                                    THEN xor(unicode(substring(text, CAST(f * ba + 2 AS INTEGER), 1)), 128)
                                    ELSE unicode(substring(text, CAST(f * ba + 2 AS INTEGER), 1)) END))) AS us
             FROM t)
      SELECT media_id, channels, sample_rate, n_frames,
             list_reduce(list_prepend(CAST(1 AS BIGINT), list_transform(us, u -> CAST(u AS BIGINT))),
                         (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
             CAST(len(list_filter(us, u -> u >= 32768)) AS BIGINT) AS n_neg,
             CASE WHEN n_frames > 0 THEN
               CAST(list_sum(list_transform(us, u -> CAST(u AS BIGINT) - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END)) AS DOUBLE) / n_frames
             END AS mean_c0
      FROM sm ORDER BY media_id
    """.trim),
  )

  final case class PngIdatOut(
      media_id: Long, width: Int, height: Int, idat_len: Int, adler32: Long,
      crc32: Long, n_pixels: Int, checksum: Long, mean_pixel: Option[Double])

  /** The standard CRC-32 table (polynomial 0xEDB88320, ISO 3309 / PNG
    * §D) as a SQL list literal — lets the oracle RECOMPUTE the chunk CRC
    * from the reconstructed bytes (DuckDB has no crc32 builtin).
    */
  private lazy val CrcTableSql: String = {
    val t = Array.tabulate(256) { n =>
      var c = n.toLong
      var k = 0
      while (k < 8) { c = if ((c & 1) != 0) 0xEDB88320L ^ (c >>> 1) else c >>> 1; k += 1 }
      c
    }
    t.mkString("[", ",", "]")
  }

  /** REAL zlib-coded PNG pipeline (SURVEY r10 candidate 2): the IDAT
    * stream is a genuine zlib stream — java.util.zip.Deflater at
    * NO_COMPRESSION over real filter-0 scanlines (one filter byte + w
    * pixels per row, last row zero-padded, exactly PNG's raw layout) —
    * and the DECODE side runs a real Inflater, checks every scanline's
    * filter byte, and reads pixels at the IHDR-parsed geometry. The
    * deliberate-fake boundary has moved: the pixel VALUES are stand-in
    * bytes, but the compression layer is the real codec.
    *
    * The oracle verifies the COMPRESSED CONTAINER byte-exactly without
    * inflating anything: a single-stored-block zlib stream's length is
    * arithmetic (2 header + 5 block framing + raw + 4 trailer; docs are
    * ≤ 577 B so one block is guaranteed, and the builder REQUIREs it),
    * and the Adler-32 trailer is a closed-form modular sum the SQL
    * recomputes from the raw scanline bytes — so if Java's Deflater ever
    * framed differently, the hash compare (and the builder require)
    * would catch it, not mask it. Pixel features are over the
    * Inflater-DECODED matrix (pad included — what a real decoder sees).
    */
  val mmPngIdat = QueryDef(
    "q_mm_png_idat",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("n_chars"))
        .as[(Long, String, Long)]
        .mapPartitions(_.map { case (id, text, nChars) =>
          val px = text.getBytes("UTF-8")
          val w = (nChars % 512 + 16).toInt
          val nrows = (px.length + w - 1) / w
          // raw scanlines: filter byte 0 + w pixels per row (PNG layout)
          val raw = new Array[Byte](nrows * (w + 1))
          var r = 0
          while (r < nrows) {
            raw(r * (w + 1)) = 0
            var c = 0
            while (c < w) {
              val j = r * w + c
              raw(r * (w + 1) + 1 + c) = if (j < px.length) px(j) else 0
              c += 1
            }
            r += 1
          }
          val defl = new java.util.zip.Deflater(java.util.zip.Deflater.NO_COMPRESSION)
          defl.setInput(raw); defl.finish()
          val zbuf = new Array[Byte](raw.length + 64)
          val zlen = defl.deflate(zbuf)
          defl.end()
          require(zlen == raw.length + 11,
            s"expected one stored block (${raw.length} + 11), got $zlen")
          val zbytes = java.util.Arrays.copyOf(zbuf, zlen)
          // REAL chunk CRC (PNG §5.3: over type + data) — this query
          // closes the zero-CRC deviation for the chunks it writes
          val crcW = new java.util.zip.CRC32()
          crcW.update("IDAT".getBytes("US-ASCII")); crcW.update(zbytes)
          val idat = ((zlen >>> 24) :: (zlen >>> 16) :: (zlen >>> 8) :: zlen :: Nil)
            .map(_.toByte).toArray ++ "IDAT".getBytes("US-ASCII") ++ zbytes ++
            Array((crcW.getValue >>> 24).toByte, (crcW.getValue >>> 16).toByte,
              (crcW.getValue >>> 8).toByte, crcW.getValue.toByte)
          val iend = ContainerOps.beChunk("IEND", Array.emptyByteArray)
          val payload = ContainerOps.pngBytes(w, nrows, idat ++ iend,
            bitDepth = 8, colorType = 0)
          // ---- the real decode: parse headers, walk chunks, INFLATE ----
          val pr = ContainerOps.ContainerParser.parseFull(id, payload)
          val pw = pr.row.width.get
          val ph = pr.row.height.get
          val body = payload.drop(pr.bodyOffset)
          // chunk walk to the IDAT data (len BE32 + type + data + crc)
          var off = 0
          var zdata: Array[Byte] = null
          var storedCrc = 0L
          while (zdata == null) {
            val clen = ((body(off) & 0xff) << 24) | ((body(off + 1) & 0xff) << 16) |
              ((body(off + 2) & 0xff) << 8) | (body(off + 3) & 0xff)
            val ctype = new String(body, off + 4, 4, "US-ASCII")
            if (ctype == "IDAT") {
              zdata = java.util.Arrays.copyOfRange(body, off + 8, off + 8 + clen)
              storedCrc = ((body(off + 8 + clen) & 0xffL) << 24) |
                ((body(off + 9 + clen) & 0xffL) << 16) |
                ((body(off + 10 + clen) & 0xffL) << 8) |
                (body(off + 11 + clen) & 0xffL)
              // REAL CRC validation — what a strict PNG reader does
              val crcR = new java.util.zip.CRC32()
              crcR.update(body, off + 4, 4 + clen)
              require(crcR.getValue == storedCrc, "IDAT crc mismatch")
            } else off += 12 + clen
          }
          val adler = ((zdata(zdata.length - 4) & 0xffL) << 24) |
            ((zdata(zdata.length - 3) & 0xffL) << 16) |
            ((zdata(zdata.length - 2) & 0xffL) << 8) |
            (zdata(zdata.length - 1) & 0xffL)
          val infl = new java.util.zip.Inflater()
          infl.setInput(zdata)
          val out = new Array[Byte](ph * (pw + 1))
          if (out.nonEmpty) {
            val n = infl.inflate(out)
            require(n == out.length && infl.finished(), s"inflate short: $n")
          } else {
            // empty image (0 rows): drain the empty stored block so the
            // stream is still validated end-to-end
            val scratch = new Array[Byte](1)
            require(infl.inflate(scratch) == 0 && infl.finished(), "empty inflate")
          }
          infl.end()
          var acc = 1L
          var sum = 0L
          var rr = 0
          while (rr < ph) {
            require(out(rr * (pw + 1)) == 0, "non-zero filter byte")
            var c = 0
            while (c < pw) {
              val b = out(rr * (pw + 1) + 1 + c) & 0xff
              acc = (acc * 31 + b) % 1000000007L
              sum += b
              c += 1
            }
            rr += 1
          }
          PngIdatOut(id, pw, ph, zdata.length, adler, storedCrc, pw * ph, acc,
            // zero-pixel guard: NULL (like the oracle's empty list_sum), not NaN
            if (pw * ph == 0) None else Some(sum.toDouble / (pw * ph)))
        }).toDF().orderBy("media_id")
    },
    Some(s"""
      WITH m AS (SELECT doc_id AS media_id, text, n_chars,
                        octet_length(encode(text)) AS len,
                        CAST(n_chars % 512 + 16 AS INTEGER) AS w
                 FROM documents),
      g AS (SELECT media_id, text, len, w, CAST((len + w - 1) // w AS INTEGER) AS nrows FROM m),
      -- padded pixel list (row-major, last row zero-padded) and the raw
      -- scanline list (filter byte 0 before each row) as byte-code lists
      px AS (SELECT media_id, w, nrows, len, w * nrows AS npx,
                    nrows * (w + 1) AS rawlen, text
             FROM g),
      lists AS (
        SELECT media_id, w, nrows, npx, rawlen,
               list_transform(range(0, npx), j ->
                 CASE WHEN j < len THEN CAST(unicode(substring(text, CAST(j + 1 AS INTEGER), 1)) AS BIGINT)
                      ELSE 0 END) AS pix,
               list_transform(range(0, rawlen), i ->
                 CASE WHEN i % (w + 1) = 0 THEN 0
                      WHEN (i // (w + 1)) * w + (i % (w + 1)) - 1 < len
                        THEN CAST(unicode(substring(text,
                               CAST((i // (w + 1)) * w + (i % (w + 1)) AS INTEGER), 1)) AS BIGINT)
                      ELSE 0 END) AS raw
        FROM px),
      ad AS (
        SELECT *,
               CAST((rawlen + list_sum(list_transform(range(0, rawlen),
                      i -> (rawlen - i) * raw[CAST(i + 1 AS INTEGER)]))) % 65521 AS BIGINT) AS s2,
               CAST((1 + list_sum(raw)) % 65521 AS BIGINT) AS s1
        FROM lists),
      -- the COMPLETE zlib stream, reconstructed byte-for-byte: header
      -- 78 01, one stored block (01, LEN le16, NLEN le16), raw, adler BE —
      -- then the chunk CRC input 'IDAT' || stream
      z AS (
        SELECT *,
               list_concat(list_concat(
                 [CAST(73 AS BIGINT), 68, 65, 84, 120, 1, 1,
                  rawlen % 256, rawlen // 256,
                  (65535 - rawlen) % 256, (65535 - rawlen) // 256],
                 raw),
                 [s2 // 256, s2 % 256, s1 // 256, s1 % 256]) AS crcin
        FROM ad)
      SELECT media_id, w AS width, nrows AS height,
             CAST(rawlen + 11 AS INTEGER) AS idat_len,
             s2 * 65536 + s1 AS adler32,
             xor(list_reduce(list_prepend(CAST(4294967295 AS BIGINT), crcin),
                 (acc, x) -> xor(acc >> 8,
                   ($CrcTableSql)[CAST((xor(acc, CAST(x AS BIGINT)) & 255) AS INTEGER) + 1])),
               4294967295) AS crc32,
             CAST(npx AS INTEGER) AS n_pixels,
             list_reduce(list_prepend(CAST(1 AS BIGINT), pix),
                         (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
             CAST(list_sum(pix) AS DOUBLE) / npx AS mean_pixel
      FROM z ORDER BY media_id
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(mmDecode, mmResize, mmFrames, mmPcm, mmPngIdat)
}
