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
}
