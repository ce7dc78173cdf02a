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
    // audio rows are genuine RIFF/WAVE containers carrying the data
    val wav = media.find(_.doc_id == 1L).get.payload
    assert(wav.length == 5 + 44 + 1) // 5 data bytes, odd -> 1 pad byte
    assert(new String(wav.slice(44, 49), "UTF-8") == "defgh")
    assert(media.find(_.doc_id == 2L).get.payload.toSeq == "ij".getBytes("UTF-8").toSeq)
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
    val df = Seq((2L, "abcdef")).toDF("doc_id", "text") // video: raw payload
    val resized = Multimodal.resize(Multimodal.attachPayload(df, "doc_id", "text"), 4, 3)
      .collect().head
    assert(resized.payload.length == 12)
    assert(new String(resized.payload.take(6), "UTF-8") == "abcdef") // cycled content
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

  test("decode: image and audio rows parse REAL container headers, video uses the stub") {
    // 0 → PNG-wrapped, 3 → JPEG-wrapped, 1 → WAV-wrapped, 2 → video stub
    val df = Seq((0L, "abc"), (3L, "abcde"), (1L, "xyzw"), (2L, "qrs"))
      .toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, df, "doc_id", "text")
      .as[Multimodal.DecodedMeta].collect().map(m => m.doc_id -> m).toMap
    val png = meta(0L)
    assert(png.payload_bytes == 3L + 57)
    assert(png.width.contains(1 + 3 % 509) && png.height.contains(1 + 3 % 389) && png.n_frames == 1)
    assert(png.sample_rate.isEmpty && png.duration_ms.isEmpty)
    val jpg = meta(3L)
    assert(jpg.payload_bytes == 5L + 17)
    assert(jpg.width.contains(1 + 5 % 509) && jpg.height.contains(1 + 5 % 389) && jpg.n_frames == 1)
    val wav = meta(1L)
    assert(wav.payload_bytes == 4L + 44) // even data length: no pad
    assert(wav.width.isEmpty && wav.height.isEmpty && wav.n_frames == 1)
    assert(wav.sample_rate.contains(8000 + (4 % 8) * 4000)) // 24 kHz
    assert(wav.channels.contains(1 + 4 % 2)) // mono
    // 4 data bytes / block-align 2 = 2 samples -> 2000/24000 ms -> 0
    assert(wav.duration_ms.contains(0L))
    val vid = meta(2L)
    assert(vid.payload_bytes == 3L)
    assert(vid.width.contains(64 + 3 % 577) && vid.height.contains(64 + 3 % 433))
    assert(vid.n_frames == 1 + 3 % 30)
    assert(vid.sample_rate.isEmpty)
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
    assert(png.length == data.length + 57)
    assert(Multimodal.parseImageHeader(png).contains(("png", 321, 123)))
    val jpg = Multimodal.jpegWrap(data, 65535, 1)
    assert(jpg.length == data.length + 17)
    assert(Multimodal.parseImageHeader(jpg).contains(("jpeg", 65535, 1)))
  }
}
