package ocrspark.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction / resize / frame-sampling are partition-batched transforms.
  *
  * The actual codecs are NOT available in this sandbox (no image/audio
  * libraries), so the decode kernel is a clearly marked DETERMINISTIC
  * STUB ([[decodeStub]]) — it fabricates plausible metadata from the
  * byte stream. Everything around it is real Spark plumbing: schema,
  * batch iteration shape (mapPartitions ≈ mapInPandas batches),
  * partitioning, and the explode for frame sampling — swap
  * [[decodeStub]] for a real decoder and the pipeline is production
  * shaped.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
                       n_frames: Int, duration_ms: Long, size_bytes: Long,
                       content_hash: Long)

  /** ======= STUB (no codecs in sandbox) =======
    * Deterministic fake decode: kind from magic-byte sniffing, the rest
    * derived from a stable byte hash. Replace with a real decoder
    * (JavaCV/ImageIO/ffmpeg) outside this sandbox. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length == 0)
      return MediaMeta("empty", 0, 0, 0, 0L, 0L, 0L)
    var h = 1125899906842597L
    var i = 0
    val step = math.max(1, bytes.length / 4096) // bounded work per row
    while (i < bytes.length) { h = 31 * h + bytes(i); i += step }
    val kind =
      if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "image/png"
      else if (bytes.length >= 3 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "image/jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') "image/gif"
      else if (bytes.length >= 4 && ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == '*') ||
        (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0))) "image/tiff"
      else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "image/bmp"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F') "audio/wav"
      else if (bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P') "application/pdf"
      else "application/octet-stream"
    val w = 160 + math.floorMod(h, 8) * 80
    val ht = 120 + math.floorMod(h >> 8, 8) * 60
    val frames = 1 + math.floorMod(h >> 16, 32).toInt
    MediaMeta(kind, w.toInt, ht.toInt, frames, frames * 40L,
      bytes.length.toLong, h)
  }

  /** Attach the metadata struct to a table with a binary column.
    * Partition-batched (mapPartitions) — the decode kernel sees an
    * iterator per partition exactly like a mapInPandas batch, so batch
    * setup cost (model load, decoder init) amortizes per partition,
    * not per row. */
  def withMediaMetadata(df: DataFrame, idCol: String,
                        binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (decoder handles, buffers)
        it.map { case (id, bytes) => (id, decodeStub(bytes)) }
      }
      .toDF(idCol, "media")
      .select(col(idCol), col("media.*"))
  }

  /** Frame-sampling plumbing: one output row per sampled frame index
    * (stride `everyN`) — the decode of actual pixels is the stubbed
    * part; the explode/schema/partition behavior is real. All input
    * metadata columns ride along so downstream stages (resize planning)
    * never re-join — and therefore never re-decode — the media table. */
  def sampleFrames(meta: DataFrame, idCol: String, everyN: Int): DataFrame =
    meta.select(col("*"),
      explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
        lit(everyN))).as("frame_idx"))
      .withColumn("frame_key",
        concat_ws(":", col(idCol), col("frame_idx")))

  /** Resize planning (real arithmetic, stub pixels): target box fit
    * preserving aspect ratio — mirrors the reference's smart-scale
    * branch shape (app.py:356-367) as a pure column expression. */
  def resizePlan(meta: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide) / greatest(col("width"), lit(1)),
      lit(maxSide) / greatest(col("height"), lit(1)), lit(1.0))
    meta.withColumn("scale", round(scale, 6))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
  }
}
