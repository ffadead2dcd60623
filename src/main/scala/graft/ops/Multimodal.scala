package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata structs. The Spark side — schema,
  * batched mapPartitions shape, partitioning — is real and tested; the
  * actual media decode is STUBBED deterministically (this container has no
  * image/audio codecs; a production deployment swaps `decodeStub` for a
  * JNI/codec call with the identical signature).
  */
object Multimodal {

  final case class MediaMeta(
      byteLen: Long,
      kind: String,
      width: Int,
      height: Int,
      checksum: Long)

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * Real implementation would parse the container header. The pseudo-hash
    * is a base-31 polynomial mod 1e9+7 (non-negative, < 2^31) so the stub's
    * outputs are reproducible in ANSI SQL and the plumbing stays
    * oracle-checkable end to end. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h = (h * 31 + (payload(i) & 0xff)) % 1000000007L
      i += 1
    }
    val kind = (h & 3) match {
      case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "blob"
    }
    MediaMeta(payload.length.toLong, kind,
      640 + (h % 1280).toInt, 360 + ((h >> 7) % 720).toInt, h)
  }

  /** Batched decode over (id, payload) — the mapPartitions shape a real
    * codec kernel needs (amortized per-batch init, no per-row JNI cost). */
  def decodeBatch(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      batchSize: Int = 128): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch "codec init" happens here in a real kernel
          batch.map { case (id, payload) => (id, decodeStub(payload)) }
        }
      }
      .toDF(idCol, "meta")
      .select(
        col(idCol),
        col("meta.byteLen").as("byte_len"),
        col("meta.kind").as("kind"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.checksum").as("checksum"))
  }

  /** Frame-sample stub: deterministic k offsets into a payload (the shape
    * of video frame sampling: returns (id, frame_idx, offset)). */
  def frameSample(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      frames: Int = 4): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val n = math.max(payload.length, 1)
        (0 until frames).map(f => (id, f, (n.toLong * f) / frames))
      }
      .toDF(idCol, "frame_idx", "offset")
  }
}
