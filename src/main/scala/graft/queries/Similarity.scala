package graft.queries

import graft.{Q, QueryDef, Tables}
import graft.operators.SimilarityOps

/** Similarity-search operators over the `embeddings` table
  * (LLM-pipeline extension; see SURVEY.md §0).
  *
  * All scores are exact integer dot products over `floor(x*10000)`
  * quantized vectors, so every query carries a full DuckDB oracle
  * (list lambdas + list_dot_product on exact integer values).
  */
object Similarity {

  // DuckDB fragment: quantized embedding as a list of exact doubles.
  // The CAST to DOUBLE is load-bearing: without it DuckDB multiplies in
  // float32 and lands one ulp off Spark's double math.
  private val duckQ = "list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 10000))"

  // IVF coarse centroids: a fixed, deterministic spread of vec_ids
  // that exists at every scale factor (embeddings has >= 500 rows).
  private val ivfCents = Seq(3L, 67L, 131L, 195L, 259L, 323L, 387L, 451L)
  private val ivfCentsSql = ivfCents.mkString("(", ",", ")")

  // shared oracle CTEs: quantized vectors + centroid set + per-vector
  // nearest centroid (max dot, ties to smallest cid — the operator's
  // pinned tie-break)
  private val ivfBase =
    s"""e AS (SELECT vec_id, $duckQ AS qv FROM embeddings),
       |cent AS (SELECT vec_id AS cid, qv FROM e WHERE vec_id IN $ivfCentsSql),
       |scored AS (SELECT e.vec_id, c.cid,
       |    CAST(list_dot_product(e.qv, c.qv) AS BIGINT) AS dot
       |  FROM e CROSS JOIN cent c),
       |best AS (SELECT vec_id, cid, dot,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
       |  FROM scored)""".stripMargin

  val queries: Seq[QueryDef] = Seq(

    // --- IVF coarse-quantizer assignment: nearest centroid per vector
    Q.df("q54_ivf_assign",
      s"""WITH $ivfBase
         |SELECT vec_id, cid AS cluster, dot FROM best
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      SimilarityOps.ivfAssign(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding", ivfCents)
        .orderBy("vec_id")
    },

    // --- semantic dedup (SemDeDup shape): nearest-centroid clusters,
    // within-cluster cosine >= 0.35 against any smaller id marks a
    // duplicate (keep-first). tau^2 = 49/400 compares exactly in
    // integer arithmetic on both engines (HUGEINT / decimal(38,0)).
    Q.df("q131_semantic_dedup",
      s"""WITH $ivfBase,
         |asg AS (SELECT b.vec_id, b.cid, e.qv,
         |    CAST(list_dot_product(e.qv, e.qv) AS HUGEINT) AS nrm
         |  FROM best b JOIN e ON e.vec_id = b.vec_id WHERE b.rn = 1),
         |p AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
         |    CAST(list_dot_product(a.qv, b.qv) AS HUGEINT) AS d,
         |    a.nrm AS na, b.nrm AS nb
         |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id > b.vec_id),
         |dup AS (SELECT ida AS vec_id, MIN(idb) AS dup_of FROM p
         |  WHERE d > 0 AND 400*d*d >= 49*na*nb GROUP BY ida)
         |SELECT asg.vec_id, asg.cid AS cluster, dup.dup_of,
         |  (dup.dup_of IS NULL) AS keep
         |FROM asg LEFT JOIN dup USING (vec_id) ORDER BY vec_id""".stripMargin) { (s, dir) =>
      SimilarityOps.semanticDedup(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding",
        ivfCents, tau2Num = 49, tau2Den = 400)
        .transform(Q.oracleOrder(_, "vec_id"))
    },

    // --- IVF probed top-k: nprobe=2 inverted lists, exact rerank
    Q.df("q55_ivf_topk",
      s"""WITH $ivfBase,
         |q AS (SELECT qv FROM e WHERE vec_id = 0),
         |probes AS (SELECT c.cid FROM cent c, q
         |  ORDER BY CAST(list_dot_product(c.qv, q.qv) AS BIGINT) DESC, c.cid
         |  LIMIT 2)
         |SELECT b.vec_id, b.cid AS cluster,
         |  CAST(list_dot_product(e.qv, q.qv) AS BIGINT) AS dot
         |FROM best b JOIN e ON e.vec_id = b.vec_id, q
         |WHERE b.rn = 1 AND b.cid IN (SELECT cid FROM probes) AND b.vec_id <> 0
         |ORDER BY dot DESC, b.vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      SimilarityOps.ivfTopK(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0L, centroidIds = ivfCents, nprobe = 2, k = 10)
    },

    // --- brute-force top-k neighbors of vec_id=0 by quantized dot
    Q.df("q50_topk_bruteforce",
      s"""WITH q AS (SELECT $duckQ AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, cast(list_dot_product($duckQ, q.qv) as bigint) AS dot
         |FROM embeddings e, q WHERE e.vec_id <> 0
         |ORDER BY dot DESC, vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      SimilarityOps.bruteForceTopK(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding", queryId = 0L, k = 20)
    },

    // --- ANN: top-k within the query's 8-bit sign-LSH bucket
    Q.df("q51_ann_sign_bucket",
      s"""WITH b AS (
         |  SELECT vec_id, $duckQ AS qv,
         |    cast((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
         |         (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
         |         (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
         |         (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) +
         |         (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END) +
         |         (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) +
         |         (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END) +
         |         (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) as bigint) AS bucket
         |  FROM embeddings),
         |q AS (SELECT bucket AS qbucket, qv AS qqv FROM b WHERE vec_id = 0)
         |SELECT b.vec_id, b.bucket,
         |       cast(list_dot_product(b.qv, q.qqv) as bigint) AS dot
         |FROM b, q WHERE b.bucket = q.qbucket AND b.vec_id <> 0
         |ORDER BY dot DESC, vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      SimilarityOps.annSignBucketTopK(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0L, bits = 8, k = 10)
    },

    // --- one k-means/Lloyd step over the IVF lists: exact per-cluster
    // per-dimension quantized sums + counts (sum, not mean: integer
    // sums are order-independent, double means are not)
    Q.df("q56_ivf_centroid_step",
      s"""WITH $ivfBase
         |SELECT b.cid AS cluster, t.pos - 1 AS pos,
         |  CAST(sum(e.qv[CAST(t.pos AS INT)]) AS BIGINT) AS q_sum, count(*) AS n
         |FROM best b JOIN e ON e.vec_id = b.vec_id, range(1, 65) t(pos)
         |WHERE b.rn = 1
         |GROUP BY 1, 2 ORDER BY cluster, pos""".stripMargin) { (s, dir) =>
      SimilarityOps.ivfCentroidStep(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding", ivfCents)
        .coalesce(1).sortWithinPartitions("cluster", "pos")
    },

    // --- a full Lloyd iteration: integer-mean centroid update, then
    // reassignment counts against the UPDATED centroids (q_sum // n on
    // both engines — truncating integer division matches Scala's)
    Q.df("q57_ivf_lloyd_reassign",
      s"""WITH $ivfBase,
         |step AS (
         |  SELECT b.cid AS cluster, t.pos AS pos,
         |    sum(e.qv[CAST(t.pos AS INT)]) AS q_sum, count(*) AS n
         |  FROM best b JOIN e ON e.vec_id = b.vec_id, range(1, 65) t(pos)
         |  WHERE b.rn = 1 GROUP BY 1, 2),
         |newcent AS (
         |  SELECT cluster AS cid,
         |    list(CAST(CAST(q_sum AS BIGINT) // n AS DOUBLE) ORDER BY pos) AS qv
         |  FROM step GROUP BY 1),
         |rescored AS (
         |  SELECT e.vec_id, c.cid,
         |    CAST(list_dot_product(e.qv, c.qv) AS BIGINT) AS dot
         |  FROM e CROSS JOIN newcent c),
         |rebest AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
         |  FROM rescored)
         |SELECT cid AS cluster, count(*) AS n_members
         |FROM rebest WHERE rn = 1
         |GROUP BY 1 ORDER BY cluster""".stripMargin) { (s, dir) =>
      SimilarityOps.ivfLloydReassign(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding", ivfCents)
        .coalesce(1).sortWithinPartitions("cluster")
    },

    // --- near-dup pairs within 6-bit sign buckets (bucketed self-join)
    Q.df("q52_bucketed_pairs",
      s"""WITH b AS (
         |  SELECT vec_id AS id, $duckQ AS qv,
         |    cast((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
         |         (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
         |         (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
         |         (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) +
         |         (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END) +
         |         (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) as bigint) AS bucket
         |  FROM embeddings),
         |capped AS (
         |  SELECT * FROM b
         |  QUALIFY count(*) OVER (PARTITION BY bucket) <= 10000)
         |SELECT a.id AS vec_a, b.id AS vec_b,
         |       cast(list_dot_product(a.qv, b.qv) as bigint) AS dot
         |FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.id < b.id
         |WHERE list_dot_product(a.qv, b.qv) >= 20000000
         |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      SimilarityOps.bucketedPairs(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding",
        bits = 6, minDot = 20000000L)
        // oracleOrder, not orderBy: the harness sort over a 250-row
        // result must not pay the range-sampler job + exchange
        .transform(df => Q.oracleOrder(df, "vec_a", "vec_b"))
    },

    // --- embedding-cosine near-dup pairs (cos >= 0.3), decided in
    // exact integer arithmetic: 100·dot² >= 9·|a|²·|b|² over
    // floor(x*1000)-quantized vectors
    Q.df("q53_cosine_pairs", {
      val q1k = "list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000))"
      s"""WITH b AS (
         |  SELECT vec_id AS id, $q1k AS qv,
         |    cast((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
         |         (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
         |         (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
         |         (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) +
         |         (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END) +
         |         (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) as bigint) AS bucket
         |  FROM embeddings),
         |capped AS (
         |  SELECT * FROM b
         |  QUALIFY count(*) OVER (PARTITION BY bucket) <= 10000),
         |p AS (
         |  SELECT a.id AS vec_a, b.id AS vec_b,
         |    cast(list_dot_product(a.qv, b.qv) as bigint) AS dot,
         |    cast(list_dot_product(a.qv, a.qv) as bigint) AS na2,
         |    cast(list_dot_product(b.qv, b.qv) as bigint) AS nb2
         |  FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.id < b.id)
         |SELECT vec_a, vec_b, dot FROM p
         |WHERE dot > 0 AND 100 * dot * dot >= 9 * na2 * nb2
         |ORDER BY vec_a, vec_b""".stripMargin
    }) { (s, dir) =>
      SimilarityOps.cosinePairs(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding",
        bits = 6, cosNum = 3, cosDen = 10)
        .orderBy("vec_a", "vec_b")
    },

    // --- symmetric int8 quantization: per-vector scale, codes,
    // saturation count, max grid reconstruction error (floor-millis).
    // The codes travel the oracle as a CSV scalar (codes_csv), not an
    // int array: the driver's pandas-based comparator cannot sort or
    // hash array cells (r6 q58 harness crash). quantizeInt8's array
    // API is unchanged; only this gate query flattens.
    Q.df("q58_int8_quantize",
      s"""WITH e AS (SELECT vec_id, $duckQ AS qv FROM embeddings),
         |a AS (SELECT vec_id, qv,
         |  CAST(greatest(list_max(list_transform(qv, v -> abs(v))), 1.0) AS DOUBLE) AS amax
         |  FROM e),
         |c AS (SELECT vec_id, qv, amax,
         |  list_transform(qv, v -> CAST(floor(v * 127 / amax + 0.5) AS INT)) AS q8
         |  FROM a)
         |SELECT vec_id, CAST(amax AS BIGINT) AS scale,
         |  array_to_string(q8, ',') AS codes_csv,
         |  CAST(len(list_filter(q8, q -> abs(q) = 127)) AS BIGINT) AS n_sat,
         |  CAST(floor(list_max(list_transform(range(1, len(q8) + 1),
         |    i -> abs(qv[CAST(i AS INT)] - q8[CAST(i AS INT)] * amax / 127.0))) * 1000)
         |    AS BIGINT) AS max_err_m
         |FROM c ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.{array_join, col, transform}
      SimilarityOps.quantizeInt8(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          array_join(transform(col("q8"), _.cast("string")), ",")
            .as("codes_csv"),
          col("n_sat"), col("max_err_m"))
        .orderBy("vec_id")
    }
  )
}
