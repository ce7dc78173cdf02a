package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("attachPayload produces binary payloads with typed metadata") {
    val df = Seq((0L, "abc"), (1L, "defgh"), (2L, "ij")).toDF("doc_id", "text")
    val media = Multimodal.attachPayload(df, "doc_id", "text").collect()
    assert(media.map(_.media_type).sorted.toSeq == Seq("audio", "image", "video"))
    // audio rows are genuine RIFF/WAVE containers whose data chunk
    // carries the deterministic PCM ramp (length-seeded)
    val wav = media.find(_.doc_id == 1L).get.payload
    assert(wav.length == 5 + 44 + 1) // 5 data bytes, odd -> 1 pad byte
    assert(wav.slice(44, 49).toSeq == (0 until 5).map(j => ((j * 7 + 5) % 256).toByte))
    // video rows are genuine ISO-BMFF containers; "ij" has n=2 so
    // nTracks = 1 + 2 % 3 = 3 and size = 2 + 296 + 2*140
    val mp4 = media.find(_.doc_id == 2L).get.payload
    assert(mp4.length == 2 + 296 + 2 * 140)
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp")
    assert(Multimodal.parseMp4Header(mp4).contains(
      Multimodal.Mp4Meta(500L + 2, 3, 64 + 2 % 577, 64 + 2 % 433, 1 + 2 % 30)))
  }

  test("feature extraction: unit-norm fixed-dim embeddings feed Similarity ops") {
    // all audio ids (%3 == 1): raw payloads, so byte-fold similarity
    // tracks text similarity (image rows now carry container wrappers)
    val df = Seq((1L, "hello world"), (4L, "hello worlq"), (7L, "zzzzzz")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.attachPayload(df, "doc_id", "text"), dim = 8)
    val rows = feats.collect()
    assert(rows.forall(_.embedding.length == 8))
    rows.foreach { f =>
      val n = f.embedding.map(x => x.toDouble * x).sum
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // plumbing compatibility: features are a valid Similarity corpus
    val corpus = feats.toDF().withColumnRenamed("doc_id", "vec_id")
    val top = Similarity.bruteForceTopK(corpus,
      corpus.filter(org.apache.spark.sql.functions.col("vec_id") === 1L), k = 2)
      .as[(Long, Int, Long, Double)].collect()
    assert(top.head._3 == 4L) // near-identical payload ranks first
  }

  test("resize stub: payload reshaped to w*h bytes, metadata type preserved") {
    val df = Seq((2L, "abcdef")).toDF("doc_id", "text") // video: MP4 container
    val resized = Multimodal.resize(Multimodal.attachPayload(df, "doc_id", "text"), 4, 3)
      .collect().head
    assert(resized.payload.length == 12)
    assert(new String(resized.payload.slice(4, 8), "US-ASCII") == "ftyp") // cycled container bytes
    assert(resized.media_type == "video")
  }

  test("frame sampling: one row explodes to n evenly spaced frames") {
    val df = Seq((2L, "x" * 1000)).toDF("doc_id", "text") // doc_id 2 -> video
    val frames = Multimodal.sampleFrames(
      Multimodal.attachPayload(df, "doc_id", "text"), n = 5, frameBytes = 64)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 5)
    assert(frames.forall(_.payload.length == 64))
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("decode: image, audio AND video rows parse REAL container headers") {
    // 0 → PNG-wrapped, 3 → JPEG-wrapped, 1 → WAV-wrapped, 2 → MP4-wrapped
    val df = Seq((0L, "abc"), (3L, "abcde"), (1L, "xyzw"), (2L, "qrs"))
      .toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, df, "doc_id", "text")
      .as[Multimodal.DecodedMeta].collect().map(m => m.doc_id -> m).toMap
    val png = meta(0L)
    // n=3: w=4, h=4 -> filtered stream m = 4*(4+1) = 20, one stored
    // block -> payload = 3 + 75 + 20 + 5
    assert(png.payload_bytes == 3L + 75 + 20 + 5)
    assert(png.width.contains(1 + 3 % 509) && png.height.contains(1 + 3 % 389) && png.n_frames == 1)
    assert(png.sample_rate.isEmpty && png.duration_ms.isEmpty && png.n_tracks.isEmpty)
    // REAL pixel decode: mean of the 16 deterministic pixels
    val wantLuma = (0 until 16).map(j => Multimodal.pixelAt(j, 3)).sum / 16.0
    assert(png.mean_luma.contains(wantLuma))
    assert(png.rms_amplitude.isEmpty)
    val jpg = meta(3L)
    assert(jpg.payload_bytes == 5L + 17)
    assert(jpg.width.contains(1 + 5 % 509) && jpg.height.contains(1 + 5 % 389) && jpg.n_frames == 1)
    assert(jpg.mean_luma.isEmpty) // DCT pixels need an entropy codec
    val wav = meta(1L)
    assert(wav.payload_bytes == 4L + 44) // even data length: no pad
    assert(wav.width.isEmpty && wav.height.isEmpty && wav.n_frames == 1)
    assert(wav.sample_rate.contains(8000 + (4 % 8) * 4000)) // 24 kHz
    assert(wav.channels.contains(1 + 4 % 2)) // mono
    // 4 data bytes / block-align 2 = 2 samples -> 2000/24000 ms -> 0
    assert(wav.duration_ms.contains(0L))
    assert(wav.n_tracks.isEmpty)
    // REAL sample decode: RMS over the 2 LE 16-bit ramp words of n=4
    val words = (0 until 2).map { i =>
      val v = ((2 * i * 7 + 4) % 256) + 256 * (((2 * i + 1) * 7 + 4) % 256)
      if (v >= 0x8000) v - 0x10000 else v
    }
    val wantRms = math.sqrt(words.map(s => s.toDouble * s).sum / 2)
    assert(wav.rms_amplitude.contains(wantRms))
    assert(wav.mean_luma.isEmpty)
    // n=3 → 1 track, so no dimensionless extra traks in the container
    val vid = meta(2L)
    assert(vid.payload_bytes == 3L + 296)
    assert(vid.width.contains(64 + 3 % 577) && vid.height.contains(64 + 3 % 433))
    assert(vid.n_frames == 1 + 3 % 30)
    assert(vid.duration_ms.contains(500L + 3))
    assert(vid.n_tracks.contains(1))
    assert(vid.sample_rate.isEmpty && vid.channels.isEmpty)
  }

  test("parseWavHeader walks real RIFF chunk streams") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // out-of-order chunks with an unknown LIST chunk (odd length,
    // word-aligned) BEFORE fmt — the walk must skip by chunk length
    val data = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val canonical = Multimodal.wavWrap(data, 44100, 2)
    assert(Multimodal.parseWavHeader(canonical)
      .contains(Multimodal.WavMeta(44100, 2, 16, 2))) // 8 bytes / block 4
    val reordered = bytes('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
      'L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0, // odd len + pad
      'd', 'a', 't', 'a', 6, 0, 0, 0, 9, 9, 9, 9, 9, 9,
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, 1, 0, 0x40, 0x1F, 0, 0, 0x80, 0x3E, 0, 0, 2, 0, 16, 0)
    assert(Multimodal.parseWavHeader(reordered)
      .contains(Multimodal.WavMeta(8000, 1, 16, 3)))
    // truncation, bad magic, zero block-align all refuse cleanly
    assert(Multimodal.parseWavHeader(canonical.take(30)).isEmpty)
    assert(Multimodal.parseWavHeader("RIFFxxxxFLAC".getBytes("US-ASCII")).isEmpty)
    val zeroAlign = canonical.clone(); zeroAlign(32) = 0; zeroAlign(33) = 0
    assert(Multimodal.parseWavHeader(zeroAlign).isEmpty)
  }

  test("wavWrap round-trips and pads odd data lengths to word alignment") {
    val odd = "12345".getBytes("UTF-8")
    val wav = Multimodal.wavWrap(odd, 16000, 1)
    assert(wav.length == odd.length + 44 + 1)
    assert(Multimodal.parseWavHeader(wav)
      .contains(Multimodal.WavMeta(16000, 1, 16, 2))) // 5 / 2 = 2 samples
  }

  test("parseImageHeader reads a genuine 1x1 PNG (external file, correct CRCs)") {
    // a real 67-byte 1x1 grayscale PNG (the kind any png encoder
    // emits), not one of our own pngWrap products
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    assert(Multimodal.parseImageHeader(png).contains(("png", 1, 1)))
  }

  test("parseImageHeader walks real JPEG marker streams") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // APP0(JFIF) + comment before a baseline SOF0 of 640x480 — the
    // scan must SKIP variable-length segments by their length fields
    val jfif = bytes(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 2, 0, 0, 1, 0, 1, 0, 0,
      0xFF, 0xFE, 0x00, 0x05, 'h', 'i', '!',
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x01, 0xE0, 0x02, 0x80, 0x01, 0x01, 0x11, 0x00,
      0xFF, 0xD9)
    assert(Multimodal.parseImageHeader(jfif).contains(("jpeg", 640, 480)))
    // progressive JPEGs carry SOF2 instead of SOF0
    val prog = bytes(0xFF, 0xD8,
      0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 0x64, 0x00, 0xC8, 0x01, 0x01, 0x11, 0x00,
      0xFF, 0xD9)
    assert(Multimodal.parseImageHeader(prog).contains(("jpeg", 200, 100)))
    // DHT (C4) is NOT a frame header and must be skipped, not parsed
    val withDht = bytes(0xFF, 0xD8,
      0xFF, 0xC4, 0x00, 0x04, 0x00, 0x00,
      0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x02, 0x00, 0x03, 0x01, 0x01, 0x11, 0x00,
      0xFF, 0xD9)
    assert(Multimodal.parseImageHeader(withDht).contains(("jpeg", 3, 2)))
    // garbage, truncation, and scan-data-before-SOF all refuse cleanly
    assert(Multimodal.parseImageHeader("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseImageHeader(bytes(0xFF, 0xD8, 0xFF, 0xC0, 0x00)).isEmpty)
    assert(Multimodal.parseImageHeader(bytes(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 1, 2)).isEmpty)
  }

  test("wrapped payloads round-trip: pngWrap/jpegWrap dims parse back exactly") {
    val data = "payload text of arbitrary length".getBytes("UTF-8")
    val png = Multimodal.pngWrap(data, 321, 123)
    val m = 123 * 322
    assert(png.length == data.length + 75 + m + 5 * ((m + 65534) / 65535))
    assert(Multimodal.parseImageHeader(png).contains(("png", 321, 123)))
    val jpg = Multimodal.jpegWrap(data, 65535, 1)
    assert(jpg.length == data.length + 17)
    assert(Multimodal.parseImageHeader(jpg).contains(("jpeg", 65535, 1)))
  }

  test("pngWrap IDAT inflates back to the exact deterministic pixels") {
    // multi-block path too: 300x250 -> m = 250*301 = 75250 filtered
    // bytes -> 2 stored blocks
    val data = "x".getBytes("UTF-8")
    for ((w, h) <- Seq((4, 3), (300, 250))) {
      val png = Multimodal.pngWrap(data, w, h)
      val mm = h * (w + 1)
      assert(png.length == data.length + 75 + mm + 5 * ((mm + 65534) / 65535))
      val (dw, dh, px) = Multimodal.decodePngGray8(png).get
      assert((dw, dh) == (w, h))
      assert(px.length == w * h)
      (0 until w * h).foreach { j =>
        assert((px(j) & 0xFF) == Multimodal.pixelAt(j, data.length),
          s"pixel $j of ${w}x$h")
      }
    }
  }

  test("decodePngGray8 unfilters all five PNG filter types (real Deflater stream)") {
    // hand-built 2x5 grayscale image, one row per filter type — the
    // IDAT is REAL max-compression deflate (not our stored blocks), so
    // the decoder's Inflater path is exercised on a foreign stream
    val w = 2; val h = 5
    val pixels = Array(
      10, 250, // y0
      17, 17, // y1
      30, 255, // y2
      9, 120, // y3
      200, 3 // y4
    )
    def px(x: Int, y: Int) = pixels(y * w + x)
    val fil = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      fil.write(y) // filter type = row index
      for (x <- 0 until w) {
        val r = px(x, y)
        val a = if (x > 0) px(x - 1, y) else 0
        val b = if (y > 0) px(x, y - 1) else 0
        val c = if (x > 0 && y > 0) px(x - 1, y - 1) else 0
        val f = y match {
          case 0 => r
          case 1 => (r - a) & 0xFF
          case 2 => (r - b) & 0xFF
          case 3 => (r - ((a + b) >> 1)) & 0xFF
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (r - pred) & 0xFF
        }
        fil.write(f)
      }
    }
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
    defl.setInput(fil.toByteArray); defl.finish()
    val buf = new Array[Byte](1024)
    val zOut = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    defl.end()
    // assemble sig + IHDR + IDAT + IEND with correct CRCs
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(payload)
      bos.write(be32(payload.length)); bos.write(tb); bos.write(payload)
      bos.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0))
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val (dw, dh, got) = Multimodal.decodePngGray8(bos.toByteArray).get
    assert((dw, dh) == (w, h))
    assert(got.map(_ & 0xFF).toSeq == pixels.toSeq)
    // non-grayscale/16-bit images refuse cleanly (no codec for them)
    val rgb = {
      val b2 = new java.io.ByteArrayOutputStream()
      b2.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      val ihdr = be32(1) ++ be32(1) ++ Array[Byte](8, 2, 0, 0, 0) // color type 2
      val crc = new java.util.zip.CRC32(); crc.update("IHDR".getBytes); crc.update(ihdr)
      b2.write(be32(13)); b2.write("IHDR".getBytes); b2.write(ihdr); b2.write(be32(crc.getValue.toInt))
      b2.toByteArray
    }
    assert(Multimodal.decodePngGray8(rgb).isEmpty)
  }

  test("decodeWavRms matches hand-computed signed 16-bit PCM RMS") {
    // samples +1000 and -1000 -> RMS exactly 1000; LE byte layout
    val data = Array[Byte](
      (1000 & 0xFF).toByte, (1000 >> 8).toByte,
      ((-1000) & 0xFF).toByte, (((-1000) >> 8) & 0xFF).toByte)
    val wav = Multimodal.wavWrap(data, 8000, 1)
    assert(Multimodal.decodeWavRms(wav).contains(1000.0))
    // odd data length: the trailing incomplete word is ignored
    val odd = Multimodal.wavWrap(Array[Byte](0, 4, 99), 8000, 1) // one word: 1024
    assert(Multimodal.decodeWavRms(odd).contains(1024.0))
    // empty data chunk -> no samples -> None
    assert(Multimodal.decodeWavRms(Multimodal.wavWrap(Array.emptyByteArray, 8000, 1)).isEmpty)
    // non-WAV bytes refuse cleanly
    assert(Multimodal.decodeWavRms("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("mp4Wrap round-trips: mvhd/tkhd/stts metadata parses back exactly") {
    val data = "video payload stand-in".getBytes("UTF-8")
    val one = Multimodal.mp4Wrap(data, 1920, 1080, durationMs = 41708L, nTracks = 1, nFrames = 1000)
    assert(one.length == data.length + 296)
    assert(Multimodal.parseMp4Header(one).contains(
      Multimodal.Mp4Meta(41708L, 1, 1920, 1080, 1000)))
    // dimensionless extra tracks count toward nTracks but contribute
    // no dims and no frames
    val three = Multimodal.mp4Wrap(data, 640, 480, durationMs = 7L, nTracks = 3, nFrames = 2)
    assert(three.length == data.length + 296 + 2 * 140)
    assert(Multimodal.parseMp4Header(three).contains(
      Multimodal.Mp4Meta(7L, 3, 640, 480, 2)))
    // the mdat box carries the data verbatim at the tail
    assert(new String(one.takeRight(data.length), "UTF-8") == "video payload stand-in")
  }

  test("parseMp4Header walks version-1 boxes, 64-bit largesize and to-end boxes") {
    def be32(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val p = payload.flatten.toArray
      be32(8L + p.length) ++ typ.getBytes("US-ASCII") ++ p
    }
    // moov declared with a 64-bit largesize header (size field = 1)
    def boxL(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val p = payload.flatten.toArray
      be32(1L) ++ typ.getBytes("US-ASCII") ++ be64(16L + p.length) ++ p
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))
    // mvhd v1: 64-bit creation/modification/duration, timescale 500,
    // duration 2500 ticks -> 5000 ms
    val mvhdV1 = box("mvhd", Array[Byte](1, 0, 0, 0),
      be64(0), be64(0), be32(500), be64(2500))
    // tkhd v1: dims are the last two u32 of the payload in both versions
    val tkhdV1 = box("tkhd", Array[Byte](1, 0, 0, 7),
      new Array[Byte](84), be32(320L << 16), be32(240L << 16))
    // stts with TWO entries: 3 + 4 = 7 frames
    val stts = box("stts", be32(0), be32(2), be32(3), be32(100), be32(4), be32(100))
    val trak = box("trak", tkhdV1, box("mdia", box("minf", box("stbl", stts))))
    val moov = boxL("moov", mvhdV1, trak)
    // trailing mdat with size 0: extends to end of file
    val mdat = be32(0) ++ "mdat".getBytes("US-ASCII") ++ "tail".getBytes("UTF-8")
    val file = ftyp ++ moov ++ mdat
    assert(Multimodal.parseMp4Header(file).contains(
      Multimodal.Mp4Meta(5000L, 1, 320, 240, 7)))
    // malformed inputs refuse cleanly
    assert(Multimodal.parseMp4Header(file.take(40)).isEmpty) // truncated mid-box
    assert(Multimodal.parseMp4Header(moov ++ mdat).isEmpty) // no ftyp brand box
    assert(Multimodal.parseMp4Header("free".getBytes("US-ASCII")).isEmpty) // < 8 bytes
    val badSize = file.clone(); badSize(0) = 0x7F // first box size > file length
    assert(Multimodal.parseMp4Header(badSize).isEmpty)
    val zeroTs = ftyp ++ box("moov",
      box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0), be32(0), be32(9)), trak)
    assert(Multimodal.parseMp4Header(zeroTs).isEmpty) // zero timescale
    val noTrak = ftyp ++ box("moov", mvhdV1)
    assert(Multimodal.parseMp4Header(noTrak).isEmpty) // moov without any trak
  }

  test("all three header parsers survive fuzzed and truncated bytes without throwing") {
    // the decode path runs inside executors over whatever bytes the
    // corpus carries — a malformed container must fall through to the
    // stub branch (None), never kill the task with an exception
    val rnd = new scala.util.Random(42) // fixed seed: deterministic CI
    def parsers(b: Array[Byte]): Unit = {
      Multimodal.parseImageHeader(b)
      Multimodal.parseWavHeader(b)
      Multimodal.parseMp4Header(b)
      ()
    }
    // pure noise at assorted sizes (including 0 and 1)
    (0 to 200).foreach { i =>
      val b = new Array[Byte](i match { case 0 => 0; case 1 => 1; case n => rnd.nextInt(256) })
      rnd.nextBytes(b)
      parsers(b)
    }
    // every truncation prefix of each VALID container — the adversarial
    // case for length-field arithmetic (sizes pointing past the end)
    val valid = Seq(
      Multimodal.pngWrap("payload bytes here".getBytes, 33, 47),
      Multimodal.wavWrap("sixteen bit pcm data..".getBytes, 16000, 2),
      Multimodal.mp4Wrap("movie payload".getBytes, 640, 360,
        durationMs = 1234, nTracks = 2, nFrames = 7))
    valid.foreach { v =>
      (0 until v.length).foreach(i => parsers(v.take(i)))
      // single-byte corruptions at every offset of the header region
      (0 until math.min(v.length, 64)).foreach { i =>
        val c = v.clone(); c(i) = (c(i) ^ 0xFF).toByte; parsers(c)
      }
    }
  }
}
