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
