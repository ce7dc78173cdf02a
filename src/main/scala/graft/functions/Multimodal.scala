package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata travelling beside them.
  *
  * The Spark-side plumbing here is real and tested — schema, batch
  * shape (one decoder init per partition, rows streamed through it),
  * partitioning, column pruning (metadata queries never touch
  * payload bytes thanks to parquet column projection). The decode
  * itself is a clearly-marked deterministic STUB because no media
  * codecs ship in this container; swap `decodeOne` for a real codec
  * and nothing else changes.
  */
object Multimodal {

  /** An opaque media row: payload + minimal typed metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoder output: metadata extracted from the payload. */
  final case class DecodedMeta(doc_id: Long, media_type: String,
                               payload_bytes: Long, width: Int, height: Int, n_frames: Int)

  /** Build a media table from any source column; payload bytes are the
    * UTF-8 encoding here (stand-in for real image/audio blobs).
    */
  def attachPayload(df: DataFrame, idCol: String, contentCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("doc_id"),
        when(col(idCol) % 3 === 0, "image")
          .when(col(idCol) % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col(contentCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  // ======================== DECODE STUB ========================
  // Deterministic fake decode: derives "dimensions" from payload
  // length. A real implementation would parse the container format
  // here (JPEG/FLAC/MP4); the function signature, batching, and
  // schema would not change.
  private def decodeOne(r: MediaRecord): DecodedMeta = {
    val n = r.payload.length.toLong
    DecodedMeta(r.doc_id, r.media_type, n,
      width = (64L + n % 577L).toInt,
      height = (64L + n % 433L).toInt,
      n_frames = (1L + n % 30L).toInt)
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
