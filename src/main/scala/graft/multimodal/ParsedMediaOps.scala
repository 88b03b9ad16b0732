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
      mean_intensity: Double)

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
          m.body.iterator.map(b => (b & 0xff).toLong).sum.toDouble / m.body.length)
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

  def defs: Seq[QueryDef] = Seq(mmDecode, mmResize, mmFrames, mmPcm)
}
