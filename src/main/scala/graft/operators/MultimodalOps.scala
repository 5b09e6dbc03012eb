package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (binary-payload) column operators: treat image/audio/
  * video as opaque `binary` columns with typed metadata, per the
  * builder brief. The decode step is a clearly-marked deterministic
  * STUB (no image/audio codecs exist in this container); everything
  * Spark-side — schema, typed Dataset plumbing, per-partition batch
  * shape, partitioning — is real and oracle-tested.
  *
  * Scale notes (100 TB):
  *  - payloads stay columnar in parquet and are never collected; all
  *    ops are map-side (binaryStats/frameSample are pure projections,
  *    imageMetaStub is one mapPartitions pass);
  *  - metadata extraction emits small fixed-width rows, so the decode
  *    stage shrinks data volume by orders of magnitude before any
  *    shuffle — the shape a real decode pipeline needs;
  *  - a real decoder drops into [[imageMetaStub]]'s per-partition
  *    iterator unchanged (decode libraries initialize once per
  *    partition, not per row).
  */
object MultimodalOps {

  /** Typed metadata row produced by the image decoder. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
      channels: Int, format: String)

  /** Real image header parsing — pure JVM byte walks over the public
    * container formats (PNG IHDR, JPEG SOF segment scan, GIF logical
    * screen descriptor, BMP info header). No codec library needed:
    * dimensions and channel count live in the first dozens of bytes.
    * This replaces the round-6 length-arithmetic decode stub with real
    * metadata (pixel DECODE still needs a codec and stays out of
    * scope — headers are what a 100 TB curation pass reads anyway).
    */
  object ImageHeaders {

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    /** (format, width, height, channels), or None if not a recognized
      * image header. */
    def parse(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
      if (b == null || b.length < 10) return None
      // PNG: 8-byte signature, IHDR chunk at fixed offset 8 (len+type),
      // width/height big-endian at 16/20, color type at 25
      if (b.length >= 26 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val channels = b(25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => 3
        }
        return Some(("png", be32(b, 16), be32(b, 20), channels))
      }
      // GIF87a / GIF89a: logical screen descriptor, little-endian
      if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        return Some(("gif", le16(b, 6), le16(b, 8), 3))
      // BMP: 'BM', BITMAPINFOHEADER width/height little-endian at 18/22
      if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
        return Some(("bmp", le32(b, 18), math.abs(le32(b, 22)), 3))
      // JPEG: SOI then marker segments; dimensions live in the first
      // SOFn frame header (C0-CF minus DHT C4 / JPG C8 / DAC CC)
      if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        var i = 2
        while (i + 9 < b.length) {
          if ((b(i) & 0xff) != 0xff) return None // desynced: not a marker
          var marker = b(i + 1) & 0xff
          while (marker == 0xff && i + 2 < b.length) { i += 1; marker = b(i + 1) & 0xff }
          if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            // SOFn: len(2) precision(1) height(2) width(2) ncomponents(1)
            return Some(("jpeg", be16(b, i + 7), be16(b, i + 5), b(i + 9) & 0xff))
          }
          if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
          else if (marker == 0xd9) return None // EOI before any SOF
          else i += 2 + be16(b, i + 2)
        }
      }
      None
    }

    /** Build a minimal VALID header of each format (used by the gate:
      * synthesize → parse must round-trip exactly; also what a unit
      * test feeds the parser next to golden real-file bytes). */
    def synthesize(format: String, w: Int, h: Int): Array[Byte] = format match {
      case "png" =>
        val b = new Array[Byte](26)
        val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        sig.zipWithIndex.foreach { case (v, i) => b(i) = v.toByte }
        b(11) = 13 // IHDR length
        b(12) = 'I'; b(13) = 'H'; b(14) = 'D'; b(15) = 'R'
        b(16) = (w >>> 24).toByte; b(17) = (w >>> 16).toByte
        b(18) = (w >>> 8).toByte; b(19) = w.toByte
        b(20) = (h >>> 24).toByte; b(21) = (h >>> 16).toByte
        b(22) = (h >>> 8).toByte; b(23) = h.toByte
        b(24) = 8 // bit depth
        b(25) = 2 // color type truecolor -> 3 channels
        b
      case "gif" =>
        val b = new Array[Byte](10)
        b(0) = 'G'; b(1) = 'I'; b(2) = 'F'; b(3) = '8'; b(4) = '9'; b(5) = 'a'
        b(6) = w.toByte; b(7) = (w >>> 8).toByte
        b(8) = h.toByte; b(9) = (h >>> 8).toByte
        b
      case _ => // jpeg: SOI + APP0 stub + SOF0
        val b = new Array[Byte](22)
        b(0) = 0xff.toByte; b(1) = 0xd8.toByte // SOI
        b(2) = 0xff.toByte; b(3) = 0xe0.toByte // APP0
        b(4) = 0; b(5) = 6 // APP0 len (incl len bytes)
        b(6) = 'J'; b(7) = 'F'; b(8) = 'I'; b(9) = 'F'
        b(10) = 0xff.toByte; b(11) = 0xc0.toByte // SOF0
        b(12) = 0; b(13) = 9 // SOF len
        b(14) = 8 // precision
        b(15) = (h >>> 8).toByte; b(16) = h.toByte
        b(17) = (w >>> 8).toByte; b(18) = w.toByte
        b(19) = 3 // components
        b
    }
  }

  /** Attach the binary payload column (here: utf8 bytes of `text`;
    * a real pipeline reads a parquet binary column directly).
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Map-side binary statistics: byte length, content digest, and a
    * digest-prefix bucket (the cheap fingerprint used to shard blobs).
    */
  def binaryStats(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    withPayload(docs).select(
      col(idCol),
      expr("CAST(octet_length(payload) AS INT)").as("n_bytes"),
      md5(col("payload")).as("digest"),
      substring(md5(col("payload")), 1, 2).as("magic2"))

  /** Per-payload image metadata via a typed mapPartitions pass — the
    * plumbing a real decoder plugs into.
    *
    * STUB DECODE: this container ships no image codec, so the
    * width/height/format are derived deterministically from the
    * payload bytes (length arithmetic). Replace the body of the
    * iterator map with an ImageIO/JNI decode for real data.
    */
  def imageMetaStub(docs: DataFrame, idCol: String = "doc_id"): Dataset[ImageMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real decoder initializes its codec HERE, once per partition
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          ImageMeta(id, 1 + n % 1024, 1 + (n / 1024) % 1024, 3,
            if (n % 2 == 0) "png" else "jpeg")
        }
      }
  }

  /** Real-header image metadata: synthesize a valid PNG/JPEG/GIF
    * payload per document (deterministic dims from doc_id — the
    * testdata ships no binary image column), then parse it back with
    * [[ImageHeaders.parse]] in the same per-partition iterator shape a
    * production decode uses. Unrecognized payloads fall back to the
    * length-arithmetic stub so the pass is total.
    */
  def imageMeta(docs: DataFrame, idCol: String = "doc_id"): Dataset[ImageMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val fmt = (id % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "gif" }
          val w = 1 + (id % 4096).toInt
          val h = 1 + (id % 2160).toInt
          val payload = ImageHeaders.synthesize(fmt, w, h)
          ImageHeaders.parse(payload) match {
            case Some((f, pw, ph, ch)) => ImageMeta(id, pw, ph, ch, f)
            case None =>
              val n = payload.length
              ImageMeta(id, 1 + n % 1024, 1 + (n / 1024) % 1024, 3, "unknown")
          }
        }
      }
  }

  /** Frame sampling over a "video" payload: n equally-strided windows
    * per document, each digested — a pure projection + explode, no
    * shuffle, no UDF.
    */
  def frameSample(docs: DataFrame, nFrames: Int, frameLen: Int,
      idCol: String = "doc_id", textCol: String = "text",
      lenCol: String = "n_chars"): DataFrame =
    docs.select(
        col(idCol),
        col(textCol).as("t"),
        greatest(lit(1), expr(s"CAST($lenCol DIV $nFrames AS INT)")).as("stride"))
      .select(col(idCol),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_id"),
        col("t"), col("stride"))
      .select(col(idCol), col("frame_id"),
        md5(expr(s"substring(t, CAST(1 + frame_id * stride AS INT), $frameLen)"))
          .as("frame_digest"))
}
