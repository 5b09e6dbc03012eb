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

  /** Typed metadata row produced by the (stub) image decoder. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
      channels: Int, format: String)

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
