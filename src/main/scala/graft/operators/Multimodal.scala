package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata; decode/feature-extraction runs
  * partition-batched so a real decoder (JNI/FFI image lib) amortizes its
  * init cost per partition, not per row.
  *
  * Two tiers:
  *   - HEADER-LEVEL metadata is REAL: [[sniffFormat]] (container magic
  *     bytes) and [[parseDimensions]] (PNG IHDR / GIF screen descriptor /
  *     JPEG SOF scan) are dependency-free byte readers, tested against
  *     hand-built valid headers — no codec library involved.
  *   - PIXEL-level decode stays a clearly-marked DETERMINISTIC STUB
  *     (the container ships no image/audio codecs); the Spark-side
  *     contract — schema, binary handling, mapPartitions batching — is
  *     the production plumbing either way.
  */
object Multimodal {

  /** REAL container sniffing from magic bytes. */
  def sniffFormat(b: Array[Byte]): String = {
    def u(i: Int) = b(i) & 0xff
    if (b.length >= 3 && u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff) "jpeg"
    else if (b.length >= 8 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G' &&
      u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a && u(7) == 0x0a) "png"
    else if (b.length >= 4 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8') "gif"
    else if (b.length >= 12 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F') {
      val sub = new String(b, 8, 4, "US-ASCII")
      if (sub == "WEBP") "webp" else if (sub == "WAVE") "wav" else "riff"
    } else "unknown"
  }

  /** REAL (width, height) from image headers, None when unparseable.
    *   - PNG: IHDR is mandatory-first — big-endian ints at offsets 16/20.
    *   - GIF: logical screen descriptor — little-endian u16 at 6/8.
    *   - JPEG: walk the marker segments to the first SOFn frame header
    *     (skipping DHT/DAC/RST/standalone markers) and read the
    *     big-endian height/width that follow the precision byte. */
  def parseDimensions(b: Array[Byte]): Option[(Int, Int)] = {
    def u(i: Int) = b(i) & 0xff
    def be32(i: Int) = (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def be16(i: Int) = (u(i) << 8) | u(i + 1)
    def le16(i: Int) = u(i) | (u(i + 1) << 8)
    sniffFormat(b) match {
      case "png" if b.length >= 24 => Some((be32(16), be32(20)))
      case "gif" if b.length >= 10 => Some((le16(6), le16(8)))
      case "jpeg" =>
        var i = 2
        while (i + 9 < b.length) {
          if (u(i) != 0xff) return None // desynced — corrupt stream
          val marker = u(i + 1)
          if (marker == 0xff) i += 1 // B.1.1.2: 0xFF fill bytes before a marker
          else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) i += 2
          else if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
            return Some((be16(i + 7), be16(i + 5))) // (width, height): w after h in SOF
          else i += 2 + be16(i + 2) // skip segment by its length field
        }
        None
      case _ => None
    }
  }

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

  /** Partition-batched REAL header decode: sniffed format + parsed
    * dimensions (0×0 when the payload isn't a parseable image) + content
    * checksum, one pass per partition. A pixel decoder would extend
    * `decodeHeader` — the iterator/batching/encoder shape is final. */
  def decodeHeaders(df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (w, h) = parseDimensions(payload).getOrElse((0, 0))
          var checksum = 1125899906842597L
          var i = 0
          while (i < payload.length) { checksum = 31 * checksum + (payload(i) & 0xffL); i += 1 }
          MediaMeta(id, payload.length.toLong, sniffFormat(payload), w, h, checksum)
        }
      }
  }

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
