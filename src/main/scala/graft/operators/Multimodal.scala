package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata; decode/feature-extraction runs
  * partition-batched so a real decoder (JNI/FFI image lib) amortizes its
  * init cost per partition, not per row.
  *
  * The container has no image/audio libraries, so the decode itself is a
  * clearly-marked DETERMINISTIC STUB that parses fake header bytes; the
  * Spark-side contract — schema, binary column handling, mapPartitions
  * batching, partition sizing — is real and tested.
  */
object Multimodal {

  /** Decoded-media metadata row (what a real decoder would emit). */
  case class MediaMeta(
      doc_id: Long, byte_len: Long, format: String,
      width: Int, height: Int, checksum: Long)

  /** Attach an opaque binary payload + declared format to each row.
    * On a real pipeline the payload IS the stored bytes; here it is the
    * UTF-8 text bytes, which keeps sizes/content deterministic. */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      when(col(idCol) % 3 === 0, "jpeg")
        .when(col(idCol) % 3 === 1, "png")
        .otherwise("webp").as("format"))

  /** Partition-batched "decode": one pass per partition over the binary
    * payloads. STUB — a real implementation replaces the body of
    * `decodeOne` with an actual image decode; everything around it
    * (iterator shape, per-partition batching, output encoder) is the
    * production plumbing. */
  def decodeStub(df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"), col("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition init happens HERE in a real decoder (lib handle)
        rows.map { case (id, payload, format) => decodeOne(id, payload, format) }
      }
  }

  /** STUB decoder: derives deterministic fake dimensions from the first
    * payload bytes. Replace with a real format parser. */
  private def decodeOne(id: Long, payload: Array[Byte], format: String): MediaMeta = {
    var checksum = 1125899906842597L
    var i = 0
    while (i < payload.length) { checksum = 31 * checksum + (payload(i) & 0xffL); i += 1 }
    val w = 64 + (math.abs(checksum) % 1024).toInt
    val h = 64 + (math.abs(checksum >> 10) % 1024).toInt
    MediaMeta(id, payload.length.toLong, format, w, h, checksum)
  }

  /** Frame-sampling stub for video payloads: emits every nth "frame"
    * index with a per-frame checksum slice — the generator shape
    * (one-to-many via flatMap inside mapPartitions) matches a real
    * frame extractor. */
  def frameSampleStub(df: DataFrame, idCol: String, everyNth: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val nFrames = math.max(1, payload.length / 32)
          (0 until nFrames by everyNth).map { f =>
            (id, f, payload.slice(f * 32, math.min(payload.length, f * 32 + 32)).length)
          }
        }
      }
      .toDF(idCol, "frame_idx", "frame_bytes")
  }
}
