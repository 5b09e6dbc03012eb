package graft.queries

import org.apache.spark.sql.functions.col
import graft.{Q, QueryDef, Tables}
import graft.operators.MultimodalOps

/** Multimodal binary-column queries over `documents` (builder brief):
  * binary stats, the typed mapPartitions decode-stub plumbing, and
  * frame sampling — all with DuckDB oracles reproducing the
  * deterministic stub arithmetic.
  */
object Multimodal {

  def queries: Seq[QueryDef] = Seq(

    Q.df("q90_binary_stats",
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS digest, substring(md5(text), 1, 2) AS magic2
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      MultimodalOps.binaryStats(Tables.t(s, dir, "documents")).orderBy("doc_id")
    },

    // real header parse: payloads are synthesized VALID png/jpeg/gif
    // bytes (dims from doc_id), then parsed back by ImageHeaders — the
    // oracle reproduces the dim arithmetic, so a parser bug (endian,
    // offset, SOF walk) breaks the hash match
    Q.df("q91_image_meta",
      """SELECT doc_id,
        |  CAST(1 + doc_id % 4096 AS INT) AS width,
        |  CAST(1 + doc_id % 2160 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'gif' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      MultimodalOps.imageMeta(Tables.t(s, dir, "documents"))
        .toDF().orderBy("doc_id")
    },

    Q.df("q92_frame_sample",
      """SELECT d.doc_id, CAST(t.f AS INT) AS frame_id,
        |  md5(substring(d.text, CAST(1 + t.f * greatest(1, d.n_chars // 4) AS INT), 16)) AS frame_digest
        |FROM documents d, generate_series(0, 3) t(f)
        |ORDER BY d.doc_id, frame_id""".stripMargin) { (s, dir) =>
      MultimodalOps.frameSample(Tables.t(s, dir, "documents"), nFrames = 4, frameLen = 16)
        .orderBy("doc_id", "frame_id")
    })
}
