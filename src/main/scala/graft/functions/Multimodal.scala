package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata travelling beside them.
  *
  * The Spark-side plumbing is real and tested — schema, batch shape
  * (one decoder init per partition, rows streamed through it),
  * partitioning, column pruning (metadata queries never touch
  * payload bytes thanks to parquet column projection). HEADER decode
  * is REAL for all three modalities — PNG IHDR / JPEG SOFn
  * ([[parseImageHeader]]), RIFF/WAVE fmt+data ([[parseWavHeader]]),
  * and ISO-BMFF/MP4 mvhd/tkhd/stts ([[parseMp4Header]]) — parsed
  * byte-wise in pure JVM and exercised end-to-end through the
  * q_multimodal_meta oracle on genuinely-wrapped containers.
  *
  * PIXEL/SAMPLE decode is REAL where no entropy codec is needed
  * (round 11): PNG IDAT streams inflate through java.util.zip and
  * unfilter (all five PNG filter types) to raw grayscale pixels →
  * `mean_luma` ([[decodePngGray8]]); WAV data chunks decode as
  * signed 16-bit PCM → `rms_amplitude` ([[decodeWavRms]]). Only the
  * entropy-coded modalities (JPEG DCT, video codecs) and the
  * model-based ops (CLIP-style feature extract, resampling resize,
  * keyframe seeking) remain deterministic fakes behind the same
  * batched partition-local shape — swap those bodies for a codec/
  * model and nothing else changes.
  */
object Multimodal {

  /** An opaque media row: payload + minimal typed metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoder output: metadata extracted from the payload. Image rows
    * carry width/height (parsed); audio rows carry
    * sample_rate/channels/duration_ms (parsed) with null dimensions;
    * video rows carry width/height/duration_ms/n_frames/n_tracks all
    * parsed from a genuine ISO-BMFF container.
    */
  final case class DecodedMeta(doc_id: Long, media_type: String,
                               payload_bytes: Long, width: Option[Int], height: Option[Int],
                               n_frames: Int, sample_rate: Option[Int],
                               channels: Option[Int], duration_ms: Option[Long],
                               n_tracks: Option[Int],
                               mean_luma: Option[Double] = None,
                               rms_amplitude: Option[Double] = None)

  /** Build a media table from any source column. Image rows
    * (doc_id % 3 == 0) are wrapped in a REAL container: a valid PNG
    * (signature + CRC-correct IHDR/tEXt/IEND chunks) for even halves,
    * a JPEG marker stream (SOI + SOF0 + EOI) for the rest. Audio rows
    * (doc_id % 3 == 1) are wrapped in a REAL RIFF/WAVE container
    * (fmt + data chunks, 16-bit PCM) whose rate/channels derive
    * deterministically from the content length — so the SQL oracle
    * can predict what [[parseImageHeader]]/[[parseWavHeader]] must
    * read back. Video rows (doc_id % 3 == 2) are wrapped in a REAL
    * ISO-BMFF/MP4 container (ftyp + moov with mvhd/trak/tkhd/stts +
    * mdat carrying the data) whose duration, track count, dimensions
    * and frame count derive deterministically from the content
    * length — what [[parseMp4Header]] must read back.
    */
  def attachPayload(df: DataFrame, idCol: String, contentCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(contentCol).cast("string").as("content"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, content) =>
        val raw = content.getBytes("UTF-8")
        val n = raw.length
        id % 3 match {
          case 0 =>
            val w = 1 + n % 509
            val h = 1 + n % 389
            val bytes = if (id % 6 == 0) pngWrap(raw, w, h) else jpegWrap(raw, w, h)
            MediaRecord(id, "image", bytes)
          case 1 =>
            // the data chunk carries DETERMINISTIC sample bytes seeded
            // by the content length (audioRamp) — real 16-bit PCM the
            // decoder reduces to an oracle-predictable RMS
            MediaRecord(id, "audio",
              wavWrap(audioRamp(n), 8000 + (n % 8) * 4000, 1 + n % 2))
          case _ =>
            MediaRecord(id, "video",
              mp4Wrap(raw, 64 + n % 577, 64 + n % 433,
                durationMs = 500L + n % 60000, nTracks = 1 + n % 3,
                nFrames = 1 + n % 30))
        }
      })
  }

  /** Pure-JVM image header parse — the REAL decode step for the one
    * modality whose dimensions need no codec: returns
    * (format, width, height) for PNG and JPEG payloads, None
    * otherwise.
    *
    *  - PNG (W3C PNG spec §5.2, §11.2.1): 8-byte signature, then the
    *    first chunk must be IHDR — width/height are the first two
    *    big-endian u32 of its data.
    *  - JPEG (ISO/IEC 10918-1 §B.1-B.2): SOI, then a marker scan
    *    skipping segments by their big-endian length until a frame
    *    header SOFn (0xC0-0xCF minus DHT/JPG/DAC = C4/C8/CC), which
    *    carries precision(1), height(2), width(2). Handles fill
    *    bytes and standalone markers; bails at SOS/EOI (a frame
    *    header always precedes the scan data).
    */
  private[functions] def parseImageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (b.length >= 24 && (0 until 8).forall(i => u8(i) == pngSig(i))) {
      if (u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
        Some(("png", be32(16), be32(20)))
      else None
    } else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xFF) return None // marker desync: not a JPEG stream
        val m = u8(i + 1)
        if (m == 0xFF) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i += 2 // standalone
        else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS: no frame header seen
        else {
          val len = be16(i + 2)
          if (len < 2 || i + 2 + len > b.length) return None
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            if (len < 7) return None
            return Some(("jpeg", be16(i + 7), be16(i + 5)))
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  private def be32Bytes(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  /** Deterministic grayscale pixel value at index j of an image whose
    * source content is n bytes long: (31j + n) mod 256. 31 is odd
    * (invertible mod 256), so any 256 consecutive pixels sum to
    * 0+…+255 = 32640 — the oracle's closed form for mean luma needs
    * only wh mod 256 residual terms.
    */
  private[functions] def pixelAt(j: Int, n: Int): Int =
    (((j.toLong * 31 + n) % 256).toInt + 256) % 256

  /** Deterministic audio sample bytes seeded by content length only:
    * byte j = (7j + n) mod 256, interpreted downstream as 16-bit LE
    * PCM. Length-seeded so the SQL oracle predicts the decoded RMS
    * without byte-level access to the text (encoding-immune).
    */
  private[functions] def audioRamp(n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var j = 0
    while (j < n) { out(j) = ((j * 7 + n) % 256).toByte; j += 1 }
    out
  }

  /** A REAL zlib stream (RFC 1950/1951) of `raw`, built from STORED
    * (uncompressed) deflate blocks: 2-byte header + per-block 5-byte
    * stored header + data + 4-byte Adler-32. Stored blocks make the
    * stream length a closed form — 6 + len + 5·⌈len/65535⌉ — so the
    * container size stays oracle-predictable; the DECODER runs a real
    * java.util.zip.Inflater and accepts any compression level.
    */
  private[functions] def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val nBlocks = math.max(1, (raw.length + 65534) / 65535)
    val out = new Array[Byte](6 + raw.length + 5 * nBlocks)
    out(0) = 0x78.toByte; out(1) = 0x01 // CMF/FLG, (0x7801 % 31) == 0
    var ip = 0; var op = 2; var blk = 0
    while (blk < nBlocks) {
      val len = math.min(65535, raw.length - ip)
      out(op) = (if (blk == nBlocks - 1) 1 else 0).toByte // BFINAL, BTYPE=00
      out(op + 1) = (len & 0xFF).toByte
      out(op + 2) = ((len >>> 8) & 0xFF).toByte
      out(op + 3) = (~len & 0xFF).toByte
      out(op + 4) = ((~len >>> 8) & 0xFF).toByte
      System.arraycopy(raw, ip, out, op + 5, len)
      ip += len; op += 5 + len; blk += 1
    }
    val ad = new java.util.zip.Adler32(); ad.update(raw)
    val a = ad.getValue
    out(op) = ((a >>> 24) & 0xFF).toByte
    out(op + 1) = ((a >>> 16) & 0xFF).toByte
    out(op + 2) = ((a >>> 8) & 0xFF).toByte
    out(op + 3) = (a & 0xFF).toByte
    out
  }

  /** A VALID complete PNG: signature + CRC-correct IHDR(w, h, 8-bit
    * grayscale) + a REAL IDAT (zlib-deflated filtered scanlines of
    * the deterministic [[pixelAt]] pixels, filter type cycling
    * None/Sub/Up by row so decoders must genuinely unfilter) + tEXt
    * carrying `data` + IEND. With m = h·(w+1) filtered bytes and
    * B = ⌈m/65535⌉ stored blocks, total size is exactly
    * data.length + 75 + m + 5·B (8 sig + 25 IHDR + 12+6+m+5B IDAT +
    * 12+n tEXt + 12 IEND) — the oracle's payload_bytes formula.
    */
  private[functions] def pngWrap(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val m = h * (w + 1)
    val fil = new Array[Byte](m)
    val prevRow = new Array[Byte](w)
    val curRow = new Array[Byte](w)
    var y = 0
    while (y < h) {
      val rowOff = y * (w + 1)
      val ft = y % 3
      fil(rowOff) = ft.toByte
      var x = 0
      while (x < w) { curRow(x) = pixelAt(y * w + x, data.length).toByte; x += 1 }
      x = 0
      while (x < w) {
        val r = curRow(x) & 0xFF
        val f = ft match {
          case 0 => r // None
          case 1 => (r - (if (x > 0) curRow(x - 1) & 0xFF else 0)) & 0xFF // Sub, bpp=1
          case _ => (r - (if (y > 0) prevRow(x) & 0xFF else 0)) & 0xFF // Up
        }
        fil(rowOff + 1 + x) = f.toByte
        x += 1
      }
      System.arraycopy(curRow, 0, prevRow, 0, w)
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(data.length + 81 + m)
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(payload)
      bos.write(be32Bytes(payload.length), 0, 4)
      bos.write(tb, 0, 4)
      bos.write(payload, 0, payload.length)
      bos.write(be32Bytes(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", be32Bytes(w) ++ be32Bytes(h) ++ Array[Byte](8, 0, 0, 0, 0))
    chunk("IDAT", zlibStored(fil))
    chunk("tEXt", data)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** REAL PNG pixel decode for the no-entropy-codec case this corpus
    * ships: 8-bit grayscale (color type 0), non-interlaced. Chunk
    * walk concatenates every IDAT, a real java.util.zip.Inflater
    * decompresses (any deflate level), and scanlines unfilter per the
    * PNG spec §9 — all five filter types (None/Sub/Up/Average/Paeth),
    * bpp = 1. Returns (w, h, pixels) or None on anything else
    * (other color types / depths, malformed streams, bad lengths).
    */
  private[functions] def decodePngGray8(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (b.length < 24 || !(0 until 8).forall(i => u8(i) == pngSig(i))) return None
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    while (i + 8 <= b.length) {
      val len = be32(i)
      if (len < 0 || i + 12 + len > b.length) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(i + 8); h = be32(i + 12)
          // depth 8, grayscale, deflate, adaptive filters, no interlace
          if (u8(i + 16) != 8 || u8(i + 17) != 0 || u8(i + 18) != 0 ||
              u8(i + 19) != 0 || u8(i + 20) != 0) return None
        case "IDAT" => idat.write(b, i + 8, len)
        case _ => ()
      }
      i += 12 + len
    }
    if (w <= 0 || h <= 0 || idat.size() == 0) return None
    val m = h * (w + 1)
    val inflated = new Array[Byte](m)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < m && !inf.finished()) {
        val k = inf.inflate(inflated, off, m - off)
        if (k == 0 && inf.needsInput()) return None // truncated stream
        off += k
      }
      if (off != m) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val ft = inflated(y * (w + 1)) & 0xFF
      var x = 0
      while (x < w) {
        val f = inflated(y * (w + 1) + 1 + x) & 0xFF
        val a = if (x > 0) out(y * w + x - 1) & 0xFF else 0
        val up = if (y > 0) out((y - 1) * w + x) & 0xFF else 0
        val c = if (x > 0 && y > 0) out((y - 1) * w + x - 1) & 0xFF else 0
        val r = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + up
          case 3 => f + ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            f + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None
        }
        out(y * w + x) = (r & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** A JPEG marker stream (SOI + single-component SOF0 + EOI) with
    * `data` appended after EOI. Total size is exactly
    * data.length + 17 — the oracle's payload_bytes formula.
    */
  private[functions] def jpegWrap(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length + 17)
    val head = Array(
      0xFF, 0xD8, // SOI
      0xFF, 0xC0, 0x00, 0x0B, // SOF0, length 11
      0x08, (h >>> 8) & 0xFF, h & 0xFF, (w >>> 8) & 0xFF, w & 0xFF, // precision, dims
      0x01, 0x01, 0x11, 0x00, // 1 component: id, 1x1 sampling, qtable 0
      0xFF, 0xD9 // EOI
    ).map(_.toByte)
    bos.write(head, 0, head.length)
    bos.write(data, 0, data.length)
    bos.toByteArray
  }

  /** Parsed WAV metadata: rate (Hz), channel count, bits per sample,
    * sample frames in the data chunk.
    */
  final case class WavMeta(sampleRate: Int, channels: Int, bits: Int, nSamples: Long)

  /** Pure-JVM RIFF/WAVE header parse (RIFF spec; fmt layout per
    * WAVEFORMAT / RFC 2361): "RIFF" + le32 size + "WAVE", then a
    * chunk walk — each chunk is a 4-byte id + le32 size + payload,
    * padded to word alignment. Handles chunks in any order and skips
    * unknown ones (LIST/INFO, fact, cue). Requires a "fmt " chunk
    * (≥16 bytes: format, channels, rate, byte-rate, block-align,
    * bits) and a "data" chunk; sample frames = data length ÷
    * block-align. Returns None on anything malformed.
    */
  private[functions] def parseWavHeader(b: Array[Byte]): Option[WavMeta] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | (u8(i + 3).toLong << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, blockAlign, bits
    var dataLen: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || dataLen.isEmpty)) {
      val id = tag(i)
      val len = le32(i + 4)
      if (len < 0 || i + 8 + len > b.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        fmt = Some((le16(i + 10), le32(i + 12).toInt, le16(i + 20), le16(i + 22)))
      } else if (id == "data") {
        dataLen = Some(len)
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    for {
      (ch, rate, blockAlign, bits) <- fmt
      dl <- dataLen
      if ch > 0 && rate > 0 && blockAlign > 0
    } yield WavMeta(rate, ch, bits, dl / blockAlign)
  }

  /** REAL PCM sample decode: root-mean-square amplitude of the data
    * chunk read as signed 16-bit little-endian samples (the layout
    * the fmt chunk declares). Re-walks the chunk stream to find the
    * data payload, requires 16-bit PCM, and reduces every complete
    * 16-bit word — channel-interleaved frames contribute each channel
    * sample, the standard whole-stream RMS. None when not a WAV, not
    * 16-bit, or the data chunk holds no complete sample.
    */
  private[functions] def decodeWavRms(b: Array[Byte]): Option[Double] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | (u8(i + 3).toLong << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var bits = -1
    var dataAt = -1; var dataLen = 0L
    while (i + 8 <= b.length && (bits < 0 || dataAt < 0)) {
      val id = tag(i)
      val len = le32(i + 4)
      if (len < 0 || i + 8 + len > b.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        bits = le16(i + 22)
      } else if (id == "data") { dataAt = i + 8; dataLen = len }
      i += 8 + len.toInt + (len.toInt & 1)
    }
    if (bits != 16 || dataAt < 0) return None
    val nWords = (dataLen / 2).toInt
    if (nWords == 0) return None
    var sumSq = 0.0
    var k = 0
    while (k < nWords) {
      val v = le16(dataAt + 2 * k)
      val s = if (v >= 0x8000) v - 0x10000 else v
      sumSq += s.toDouble * s
      k += 1
    }
    Some(math.sqrt(sumSq / nWords))
  }

  /** A VALID minimal 16-bit PCM WAV carrying `data` as its data
    * chunk: RIFF(12) + fmt(24) + data header(8) + data + one pad byte
    * when data.length is odd. Total size is exactly
    * data.length + 44 + (data.length & 1) — the oracle's
    * payload_bytes formula.
    */
  private[functions] def wavWrap(data: Array[Byte], sampleRate: Int, channels: Int): Array[Byte] = {
    val pad = data.length & 1
    val out = new Array[Byte](44 + data.length + pad)
    def leS(i: Int, s: String): Unit = { val t = s.getBytes("US-ASCII"); System.arraycopy(t, 0, out, i, 4) }
    def le32(i: Int, v: Long): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    def le16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte }
    val blockAlign = channels * 2
    leS(0, "RIFF"); le32(4, 36L + data.length + pad); leS(8, "WAVE")
    leS(12, "fmt "); le32(16, 16L)
    le16(20, 1) // PCM
    le16(22, channels); le32(24, sampleRate.toLong)
    le32(28, sampleRate.toLong * blockAlign); le16(32, blockAlign); le16(34, 16)
    leS(36, "data"); le32(40, data.length.toLong)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** Parsed ISO-BMFF metadata: presentation duration (ms, from
    * mvhd), track count, first video track's pixel dimensions (tkhd
    * 16.16 fixed point) and total sample (frame) count across all
    * stts tables.
    */
  final case class Mp4Meta(durationMs: Long, nTracks: Int, width: Int, height: Int, nFrames: Int)

  /** Pure-JVM ISO-BMFF/MP4 box walk (ISO/IEC 14496-12 §4.2, §8.2.2,
    * §8.3.2, §8.6.1.2): a file is a sequence of boxes, each a
    * big-endian u32 size + 4-char type (size 1 → 64-bit largesize
    * follows; size 0 → box extends to end of file). Containers
    * (moov, trak, mdia, minf, stbl) simply nest. Requires a top-level
    * ftyp (brand sanity) and a moov with an mvhd; handles version 0
    * (32-bit times) and version 1 (64-bit times) mvhd/tkhd layouts.
    *
    *  - mvhd: timescale + duration → durationMs.
    *  - trak count → nTracks; first trak with non-zero tkhd width
    *    supplies width/height (stored as 16.16 fixed point).
    *  - stts entries: Σ sample_count over every track's decoding
    *    time-to-sample table → nFrames.
    *
    * Returns None on anything malformed (bad sizes, missing moov or
    * mvhd, zero timescale) — the caller falls back to the stub.
    */
  private[functions] def parseMp4Header(b: Array[Byte]): Option[Mp4Meta] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def typ(i: Int): String = new String(b, i, 4, "US-ASCII")
    // Walk the boxes in [from, to); yield (type, payloadStart, payloadEnd).
    def boxes(from: Int, to: Int): Option[List[(String, Int, Int)]] = {
      val out = List.newBuilder[(String, Int, Int)]
      var i = from
      while (i < to) {
        if (i + 8 > to) return None
        val size32 = be32(i)
        val (payload, end) =
          if (size32 == 1L) {
            if (i + 16 > to) return None
            val sz = be64(i + 8)
            if (sz < 16 || i + sz > to) return None
            (i + 16, i + sz.toInt)
          } else if (size32 == 0L) (i + 8, to) // last box: extends to end
          else {
            if (size32 < 8 || i + size32 > to) return None
            (i + 8, i + size32.toInt)
          }
        out += ((typ(i + 4), payload, end))
        i = end
      }
      Some(out.result())
    }
    if (b.length < 8) return None
    for {
      top <- boxes(0, b.length)
      if top.exists(_._1 == "ftyp")
      (_, moovS, moovE) <- top.find(_._1 == "moov")
      moov <- boxes(moovS, moovE)
      (_, mvS, mvE) <- moov.find(_._1 == "mvhd")
      // mvhd v0: ver/flags(4) creation(4) mod(4) timescale(4) duration(4)
      // mvhd v1: ver/flags(4) creation(8) mod(8) timescale(4) duration(8)
      (timescale, duration) <- u8(mvS) match {
        case 0 if mvE - mvS >= 20 => Some((be32(mvS + 12), be32(mvS + 16)))
        case 1 if mvE - mvS >= 32 => Some((be32(mvS + 20), be64(mvS + 24)))
        case _ => None
      }
      if timescale > 0
      traks = moov.filter(_._1 == "trak")
      if traks.nonEmpty
    } yield {
      var w = 0; var h = 0
      var frames = 0L
      traks.foreach { case (_, tS, tE) =>
        boxes(tS, tE).foreach { kids =>
          kids.find(_._1 == "tkhd").foreach { case (_, kS, kE) =>
            // width/height are the last two u32 of the payload
            // (16.16 fixed point), same offset-from-end in v0 and v1
            val dimAt = kE - 8
            if (dimAt >= kS && w == 0) {
              val tw = (be32(dimAt) >>> 16).toInt
              val th = (be32(dimAt + 4) >>> 16).toInt
              if (tw > 0) { w = tw; h = th }
            }
          }
          // descend trak → mdia → minf → stbl → stts
          for {
            (_, mS, mE) <- kids.find(_._1 == "mdia")
            mk <- boxes(mS, mE)
            (_, iS, iE) <- mk.find(_._1 == "minf")
            ik <- boxes(iS, iE)
            (_, sS, sE) <- ik.find(_._1 == "stbl")
            sk <- boxes(sS, sE)
            (_, ttS, ttE) <- sk.find(_._1 == "stts")
            if ttE - ttS >= 8
          } {
            val n = be32(ttS + 4).toInt
            var e = 0
            while (e < n && ttS + 8 + e * 8 + 8 <= ttE) {
              frames += be32(ttS + 8 + e * 8)
              e += 1
            }
          }
        }
      }
      Mp4Meta(duration * 1000L / timescale, traks.size, w, h, frames.toInt)
    }
  }

  /** A VALID minimal ISO-BMFF/MP4 carrying `data` in its mdat box:
    * ftyp(isom) + moov(mvhd timescale=1000 so duration IS ms, one
    * full trak with tkhd dims + an stts of `nFrames` samples, plus
    * `nTracks-1` dimensionless tracks with empty stts) + mdat. Total
    * size is exactly data.length + 296 + (nTracks-1)*140 — the
    * oracle's payload_bytes formula.
    */
  private[functions] def mp4Wrap(data: Array[Byte], w: Int, h: Int,
                                 durationMs: Long, nTracks: Int, nFrames: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val n = payload.map(_.length).sum
      val out = new java.io.ByteArrayOutputStream(8 + n)
      out.write(be32Bytes(8 + n), 0, 4)
      out.write(typ.getBytes("US-ASCII"), 0, 4)
      payload.foreach(p => out.write(p, 0, p.length))
      out.toByteArray
    }
    val unityMatrix =
      be32Bytes(0x00010000) ++ be32Bytes(0) ++ be32Bytes(0) ++
      be32Bytes(0) ++ be32Bytes(0x00010000) ++ be32Bytes(0) ++
      be32Bytes(0) ++ be32Bytes(0) ++ be32Bytes(0x40000000)
    val mvhd = box("mvhd",
      be32Bytes(0), // version 0 + flags
      be32Bytes(0), be32Bytes(0), // creation, modification
      be32Bytes(1000), be32Bytes(durationMs.toInt), // timescale=1000 → duration is ms
      be32Bytes(0x00010000), // rate 1.0
      Array[Byte](0x01, 0x00, 0, 0), // volume 1.0 + reserved(2)
      new Array[Byte](8), // reserved
      unityMatrix,
      new Array[Byte](24), // pre_defined
      be32Bytes(nTracks + 1)) // next_track_ID
    def stts(frames: Int): Array[Byte] =
      if (frames > 0)
        box("stts", be32Bytes(0), be32Bytes(1), be32Bytes(frames),
          be32Bytes(math.max(1, (durationMs / math.max(1, frames)).toInt)))
      else box("stts", be32Bytes(0), be32Bytes(0))
    def trak(id: Int, tw: Int, th: Int, frames: Int): Array[Byte] = {
      val tkhd = box("tkhd",
        be32Bytes(0x00000007), // version 0, flags: enabled|in_movie|in_preview
        be32Bytes(0), be32Bytes(0), // creation, modification
        be32Bytes(id), be32Bytes(0), // track_ID, reserved
        be32Bytes(durationMs.toInt),
        new Array[Byte](8), // reserved
        Array[Byte](0, 0, 0, 0, 0, 0, 0, 0), // layer, alt_group, volume, reserved
        unityMatrix,
        be32Bytes(tw << 16), be32Bytes(th << 16)) // 16.16 fixed point
      box("trak", tkhd, box("mdia", box("minf", box("stbl", stts(frames)))))
    }
    val traks = (1 to nTracks).map { i =>
      if (i == 1) trak(i, w, h, nFrames) else trak(i, 0, 0, 0)
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII"), be32Bytes(0x200),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))
    val moov = box("moov", (mvhd +: traks): _*)
    val mdat = box("mdat", data)
    ftyp ++ moov ++ mdat
  }

  // ======================= DECODE =========================
  // All three shipped modalities parse REAL container headers in
  // pure JVM: PNG/JPEG dimensions, RIFF/WAVE rate/channels/duration,
  // and ISO-BMFF duration/tracks/dimensions/frames — and where no
  // entropy codec is needed, REAL payload decode on top: PNG pixels
  // (inflate + unfilter → mean_luma) and WAV samples (16-bit PCM →
  // rms_amplitude). JPEG DCT and video codec payloads keep null
  // content stats (an entropy decoder is out of pure-JVM scope).
  // A parsed image or audio stream is one frame. Payloads with no
  // recognizable container fall back to the deterministic STUB that
  // derives fake dimensions from the length.
  private def decodeOne(r: MediaRecord): DecodedMeta =
    parseImageHeader(r.payload) match {
      case Some((fmt, w, h)) =>
        val luma =
          if (fmt == "png")
            decodePngGray8(r.payload).map { case (_, _, px) =>
              var s = 0.0; var i = 0
              while (i < px.length) { s += (px(i) & 0xFF); i += 1 }
              s / px.length
            }
          else None
        DecodedMeta(r.doc_id, r.media_type, r.payload.length.toLong,
          Some(w), Some(h), n_frames = 1, None, None, None, None,
          mean_luma = luma)
      case None => parseWavHeader(r.payload) match {
        case Some(wm) =>
          DecodedMeta(r.doc_id, r.media_type, r.payload.length.toLong,
            None, None, n_frames = 1, Some(wm.sampleRate), Some(wm.channels),
            Some(wm.nSamples * 1000L / wm.sampleRate), None,
            rms_amplitude = decodeWavRms(r.payload))
        case None => parseMp4Header(r.payload) match {
          case Some(mm) =>
            DecodedMeta(r.doc_id, r.media_type, r.payload.length.toLong,
              Some(mm.width), Some(mm.height), n_frames = mm.nFrames,
              None, None, Some(mm.durationMs), Some(mm.nTracks))
          case None =>
            val n = r.payload.length.toLong
            DecodedMeta(r.doc_id, r.media_type, n,
              width = Some((64L + n % 577L).toInt),
              height = Some((64L + n % 433L).toInt),
              n_frames = (1L + n % 30L).toInt, None, None, None, None)
        }
      }
    }
  // =============================================================

  /** Batched decode: one "decoder" per partition, rows streamed
    * through it — the shape a real codec needs (expensive init
    * amortized, bounded memory, no driver involvement).
    */
  def decode(ds: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // a real implementation would initialize the codec here, once
      it.map(decodeOne)
    }
  }

  /** End-to-end: attach payloads, decode per-partition, return a
    * DataFrame of metadata.
    */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String, contentCol: String): DataFrame =
    decode(attachPayload(df, idCol, contentCol)).toDF()

  /** Extracted media features: a fixed-dim embedding per payload. */
  final case class MediaFeatures(doc_id: Long, media_type: String, embedding: Array[Float])

  /** One sampled frame of a (video) payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  // ==================== FEATURE-EXTRACT STUB ====================
  // Deterministic pseudo-embedding: bytes folded into `dim` float
  // buckets, L2-normalized. A real extractor (CLIP/wav2vec) replaces
  // the fold; the batched mapPartitions shape, the Array[Float]
  // schema, and the downstream Similarity compatibility stay.
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // real impl: load the model once per partition here
      it.map { r =>
        val acc = new Array[Float](dim)
        var i = 0
        while (i < r.payload.length) {
          acc(i % dim) += (r.payload(i) & 0xFF) / 255.0f
          i += 1
        }
        val n = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat
        val unit = if (n == 0f) acc else acc.map(_ / n)
        MediaFeatures(r.doc_id, r.media_type, unit)
      }
    }
  }

  // ======================= RESIZE STUB ==========================
  // Deterministic "resize": payload truncated/cycled to w*h bytes.
  // A real implementation decodes, scales, re-encodes; schema and
  // batch shape identical.
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val target = w * h
    ds.mapPartitions { it =>
      it.map { r =>
        val out = new Array[Byte](target)
        if (r.payload.nonEmpty) {
          var i = 0
          while (i < target) { out(i) = r.payload(i % r.payload.length); i += 1 }
        }
        r.copy(payload = out)
      }
    }
  }

  // ==================== FRAME-SAMPLE STUB =======================
  // Deterministic frame sampling: n evenly spaced fixed-width slices
  // of the payload (a real implementation seeks keyframes). One input
  // row explodes to n frame rows — the schema a video pipeline needs.
  def sampleFrames(ds: Dataset[MediaRecord], n: Int, frameBytes: Int = 64): Dataset[Frame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      (0 until n).iterator.map { k =>
        val start = if (r.payload.length <= frameBytes) 0
          else (k.toLong * (r.payload.length - frameBytes) / math.max(1, n - 1)).toInt
        val end = math.min(start + frameBytes, r.payload.length)
        Frame(r.doc_id, k, java.util.Arrays.copyOfRange(r.payload, start, end))
      }
    }
  }
}
