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
    assert(media.find(_.doc_id == 1L).get.payload.toSeq == "defgh".getBytes("UTF-8").toSeq)
  }

  test("feature extraction: unit-norm fixed-dim embeddings feed Similarity ops") {
    val df = Seq((0L, "hello world"), (1L, "hello worlq"), (2L, "zzzzzz")).toDF("doc_id", "text")
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
      corpus.filter(org.apache.spark.sql.functions.col("vec_id") === 0L), k = 2)
      .as[(Long, Int, Long, Double)].collect()
    assert(top.head._3 == 1L) // near-identical payload ranks first
  }

  test("resize stub: payload reshaped to w*h bytes, metadata type preserved") {
    val df = Seq((0L, "abcdef")).toDF("doc_id", "text")
    val resized = Multimodal.resize(Multimodal.attachPayload(df, "doc_id", "text"), 4, 3)
      .collect().head
    assert(resized.payload.length == 12)
    assert(new String(resized.payload.take(6), "UTF-8") == "abcdef") // cycled content
    assert(resized.media_type == "image")
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

  test("batched decode stub: deterministic dims from payload length") {
    val df = Seq((0L, "abc")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, df, "doc_id", "text")
      .as[Multimodal.DecodedMeta].head()
    assert(meta.payload_bytes == 3L)
    assert(meta.width == 64 + 3 % 577)
    assert(meta.height == 64 + 3 % 433)
    assert(meta.n_frames == 1 + 3 % 30)
  }
}
