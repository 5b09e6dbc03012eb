package graft.queries

import graft.{Q, QueryDef, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table (LLM-pipeline
  * extension — no counterpart in the reference, which serves tables
  * as-is; see SURVEY.md §0 and the build brief).
  *
  * Oracle strategy: md5-keyed exact dedup and char-n-gram Jaccard are
  * engine-agnostic (md5 / substring / list ops exist in DuckDB), so
  * they carry full DuckDB oracles. MinHash/SimHash derive from Spark's
  * xxhash64 — not reproducible in DuckDB — so those entries are
  * rows-only checks, with ScalaTest specs asserting their semantics
  * (known-duplicate fixtures) instead.
  */
object Dedup {

  val queries: Seq[QueryDef] = Seq(

    // --- exact dup groups: identical oracle (md5 hex matches across engines)
    Q.df("q40_exact_dup_groups",
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin) { (s, dir) =>
      DedupOps.exactDupGroups(Tables.t(s, dir, "documents"), "doc_id", "text")
        .orderBy("fp")
    },

    // --- dedup-materialize: keep lowest doc_id per content group
    Q.df("q41_dedup_keep_first",
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      DedupOps.dedupKeepFirst(Tables.t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
    },

    // --- MinHash+LSH near-dup pairs, now under a FULL DuckDB oracle
    //     (was rows-only through r6). DuckDB cannot run xxhash64, but it
    //     CAN compute the exact all-pairs shingle Jaccard — so the gate
    //     is containment + recall in one hash-match: the LSH pairs
    //     verified at jaccard >= 0.5 must EQUAL the exact truth set at
    //     the same threshold. Any false positive surviving the verify
    //     filter breaks containment; any planted near-dup the banded
    //     buckets miss breaks recall. The oracle's all-pairs join runs
    //     only at the gated SF (the driver's sf0.01); the Spark side
    //     stays the banded LSH plan at every scale. The raw candidate
    //     stream (verify filter off, incl. sub-threshold candidates)
    //     remains covered by DedupSpec + the q45 portable twin.
    Q.df("q42_minhash_lsh_pairs",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
        |  FROM toksrc WHERE len(toks) >= 3
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    len(list_distinct(a.sh || b.sh)) AS jaccard
        |FROM base a JOIN base b ON a.doc_id < b.doc_id
        |WHERE 2 * len(list_intersect(a.sh, b.sh)) >= len(a.sh)
        |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    len(list_distinct(a.sh || b.sh)) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      DedupOps.minhashLshPairs(Tables.t(s, dir, "documents"), "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    },

    // --- connected-component dedup groups over the near-dup pairs:
    //     pairwise similarity is not transitive, so a keep-one policy
    //     needs the transitive closure. Spark runs distributed
    //     min-label propagation with pointer jumping (O(log diameter)
    //     rounds, each a bounded shuffle of the EDGE list only); the
    //     oracle computes the same closure with a recursive CTE over
    //     the exact all-pairs truth set (feasible only at oracle SF —
    //     q42's own gate proves the LSH pairs EQUAL that truth set, so
    //     both sides cluster the same graph).
    Q.df("q129_dup_clusters",
      """WITH RECURSIVE toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM base a JOIN base b ON a.doc_id < b.doc_id
        |  WHERE 2 * len(list_intersect(a.sh, b.sh)) >= len(a.sh)
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      len(list_distinct(a.sh || b.sh)) >= 0.5
        |),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs
        |),
        |reach(id, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
        |),
        |lab AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val pairs = DedupOps
        .minhashLshPairs(Tables.t(s, dir, "documents"), "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
      DedupOps.dupClusters(pairs).transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- SimHash near-dup property gate, now under a FULL DuckDB
    //     oracle (was rows-only through r6). The xxhash64 simhash value
    //     itself is not reproducible in DuckDB; the HASH-MATCHED claim
    //     is the property that makes simhash a dedup signal, checked
    //     from both directions so a degenerate hash cannot pass:
    //       near: every exact-Jaccard >= 0.5 pair must land within
    //             Hamming distance 6 (observed max 5 on this corpus;
    //             a constant simhash passes this but fails far);
    //       far:  every adjacent-id pair with Jaccard < 0.05 must stay
    //             at distance >= 7 (observed min 8; a corrupted bit
    //             fold collapses distances and fails this).
    //     DuckDB derives the pair lists exactly and pins ok=1; Spark
    //     computes ok from the real simhash. The per-doc peers output
    //     (doc_id, simhash, n_chunk_peers) stays spec-tested in
    //     DedupSpec and DuckDB-pinned via the portable twin q46.
    Q.df("q43_simhash_peers",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |near AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM base a JOIN base b ON a.doc_id < b.doc_id
        |  WHERE 2 * len(list_intersect(a.sh, b.sh)) >= len(a.sh)
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      len(list_distinct(a.sh || b.sh)) >= 0.5
        |),
        |far AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    len(list_distinct(a.sh || b.sh)) < 0.05
        |)
        |SELECT doc_a, doc_b, 'near' AS kind, CAST(1 AS BIGINT) AS ok FROM near
        |UNION ALL
        |SELECT doc_a, doc_b, 'far' AS kind, CAST(1 AS BIGINT) AS ok FROM far
        |ORDER BY kind, doc_a, doc_b""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      // the simhash base feeds FOUR broadcast-join builds (sim_a/sim_b
      // on both the near and far sides) whose build jobs race; persist
      // + one eager count materializes the pass once (r19 profiling:
      // two duplicate ~0.3 s-exec simhash builds per run without it)
      val sim = DedupOps.simhashRows(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // ... and that count overlaps the minhash base's own eager
      // materialization below (guide §2.6: independent jobs submitted
      // from a second thread back-fill idle cores) — serializing the
      // two corpus passes cost +0.23 s in the r19 A/B
      val simCount = scala.concurrent.Future { sim.count() }(
        scala.concurrent.ExecutionContext.global)
      val simA = sim.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
      val simB = sim.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
      val ham = expr("bit_count(sim_a ^ sim_b)")
      // near side: the q42-gated truth pairs (minhash-verified >= 0.5;
      // recall 100% is exactly what the q42 oracle proves). The
      // managed variant exposes its persisted signature base so the
      // far side below reuses the SAME shingle sets — the r17 shape
      // ran a THIRD full tokenize+shingle pass ([[shingleRows]] +
      // its own persist) for bytes the near side already cached
      // (guide §1.2: remove unnecessary passes; r18: 1.74 s → 1.29 s).
      val (managed, sigBase) =
        DedupOps.minhashLshPairsWithBase(docs, "doc_id", "text")
      scala.concurrent.Await.result(simCount,
        scala.concurrent.duration.Duration.Inf)
      val near = managed.df
        .filter(col("jaccard") >= 0.5)
        .join(simA, "doc_a").join(simB, "doc_b")
        .select(col("doc_a"), col("doc_b"), lit("near").as("kind"),
          (ham <= 6).cast("long").as("ok"))
      // far side: adjacent-id non-dup pairs, shingle Jaccard < 0.05,
      // over the near side's persisted (doc_id, shingles) base (same
      // >=3-token drop rule, same shingle walk — bit-identical sets).
      val sh = sigBase.select(col("doc_id"), col("shingles"))
      val a = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
      val far = a.join(b, col("doc_b") === col("doc_a") + 1)
        .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double") < 0.05)
        .join(simA, "doc_a").join(simB, "doc_b")
        .select(col("doc_a"), col("doc_b"), lit("far").as("kind"),
          (ham >= 7).cast("long").as("ok"))
      // eager localCheckpoint materializes the (small) gate rows so the
      // signature cache can be released NOW — ManagedResult
      // convention: a persist must not outlive its query
      val result = near.unionByName(far).orderBy("kind", "doc_a", "doc_b")
        .localCheckpoint(true)
      managed.unpersist()
      sim.unpersist()
      result
    },

    // --- cap-policy health metric: per chunk index, bucket census and
    //     the row mass a drop-based cap would lose (the required
    //     "dropped-bucket mass" output; oracle replicates the portable
    //     simhash32 chunk bucketing)
    Q.df("q83_simhash_cap_report",
      """WITH hv AS (
        |  SELECT doc_id,
        |    list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      s -> list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          list_transform(range(1, length(s) + 1),
        |            i -> CAST(ascii(substring(s, CAST(i AS INT), 1)) AS BIGINT))),
        |        (h, c) -> (h * 31 + c) % 1000000007)) AS hs
        |  FROM documents
        |),
        |sim AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(range(0, 32),
        |      j -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> CAST(j AS INT)) & 1 = 1)) > len(hs)
        |                THEN 1 << CAST(j AS INT) ELSE 0 END)) AS simhash32
        |  FROM hv
        |),
        |buckets AS (
        |  SELECT c AS chunk, (simhash32 >> CAST(8*c AS INT)) & 255 AS cv,
        |    count(*) AS bucket_n
        |  FROM sim, range(0, 4) t(c)
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(chunk AS BIGINT) AS chunk,
        |  count(*) AS n_buckets,
        |  CAST(sum(CASE WHEN bucket_n > 64 THEN 1 ELSE 0 END) AS BIGINT) AS overcap_buckets,
        |  CAST(sum(CASE WHEN bucket_n > 64 THEN bucket_n ELSE 0 END) AS BIGINT) AS dropped_rows
        |FROM buckets GROUP BY chunk ORDER BY chunk""".stripMargin) { (s, dir) =>
      DedupOps.portableSimhashCapReport(
        Tables.t(s, dir, "documents"), "doc_id", "text", 64)
        .selectExpr("CAST(chunk AS BIGINT) AS chunk", "n_buckets",
          "overcap_buckets", "dropped_rows")
        .orderBy("chunk")
    },

    // --- char-3-gram Jaccard, blocked by lang, restricted to doc_id<60
    //     to keep the all-pairs oracle cheap; exact integer set sizes →
    //     the double division is bit-identical across engines
    Q.df("q44_ngram_jaccard",
      """WITH grams AS (
        |  SELECT d.doc_id, d.lang,
        |         list_distinct(list_transform(
        |           range(1, greatest(length(d.text) - 2, 0) + 1),
        |           i -> substring(d.text, cast(i as int), 3))) AS tg
        |  FROM documents d WHERE d.doc_id < 60)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       cast(len(list_intersect(a.tg, b.tg)) as double) /
        |       cast(len(list_distinct(list_concat(a.tg, b.tg))) as double) AS jaccard
        |FROM grams a JOIN grams b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      // coalesce(1): the pair stage is broadcast-join map-side over the
      // 59-doc block, so folding the oracle sort in saves an exchange
      DedupOps.ngramJaccardPairs(
        Tables.t(s, dir, "documents").filter(col("doc_id") < 60),
        "doc_id", "text", "lang", n = 3)
        .coalesce(1).sortWithinPartitions("doc_a", "doc_b")
    },

    // portable MinHash+LSH: the whole pipeline (shingle → rolling-hash
    // signature → pair-encoded bands → QUALIFY-capped buckets →
    // candidate join → exact Jaccard) reproduced in DuckDB, so the LSH
    // mechanism itself is hash-verified — q42 (xxhash64 product path)
    // keeps the rows-only check + DedupSpec pinning.
    Q.df("q45_portable_minhash",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |hs AS (
        |  SELECT doc_id, sh,
        |    list_transform(sh, s -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(s) + 1),
        |          i -> CAST(ascii(substring(s, CAST(i AS INT), 1)) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 1000000007)) AS hv
        |  FROM base
        |),
        |sig AS (
        |  SELECT doc_id, sh,
        |    list_transform(range(0, 8),
        |      p -> list_min(list_transform(hv, h -> ((2*p+1)*h + p) % 1000000007))) AS sg
        |  FROM hs
        |),
        |bandrec AS (
        |  SELECT doc_id, b,
        |    sg[CAST(2*b+1 AS INT)] * 1000000007 + sg[CAST(2*b+2 AS INT)] AS bh
        |  FROM sig, range(0, 4) t(b)
        |),
        |capped AS (
        |  SELECT * FROM bandrec QUALIFY count(*) OVER (PARTITION BY b, bh) <= 64
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        |  FROM capped a JOIN capped c ON a.b = c.b AND a.bh = c.bh AND a.doc_id < c.doc_id
        |)
        |SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
        |    len(list_distinct(x.sh || y.sh)) AS jaccard
        |FROM cand JOIN base x ON x.doc_id = cand.doc_a
        |          JOIN base y ON y.doc_id = cand.doc_b
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      DedupOps.portableMinhashPairs(
        Tables.t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_a", "doc_b")
    },

    // streaming MinHash near-dup candidate feed (batch twin of
    // StreamOps.nearDupCandidates — flatMapGroupsWithState runs the
    // same code in batch mode, and the emitted set is
    // batch-boundary-invariant by construction: every non-minimum
    // doc of each band bucket)
    Q.df("q149_stream_neardup_cands",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |hs AS (
        |  SELECT doc_id, sh,
        |    list_transform(sh, s -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(s) + 1),
        |          i -> CAST(ascii(substring(s, CAST(i AS INT), 1)) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 1000000007)) AS hv
        |  FROM base
        |),
        |sig AS (
        |  SELECT doc_id, sh,
        |    list_transform(range(0, 8),
        |      p -> list_min(list_transform(hv, h -> ((2*p+1)*h + p) % 1000000007))) AS sg
        |  FROM hs
        |),
        |bandrec AS (
        |  SELECT doc_id, b,
        |    sg[CAST(2*b+1 AS INT)] * 1000000007 + sg[CAST(2*b+2 AS INT)] AS bh
        |  FROM sig, range(0, 4) t(b)
        |),
        |sel AS (
        |  SELECT doc_id, b, bh, min(doc_id) OVER (PARTITION BY b, bh) AS mn
        |  FROM bandrec
        |)
        |SELECT doc_id, CAST(b AS INT) AS band, bh AS band_hash
        |FROM sel WHERE doc_id <> mn
        |ORDER BY doc_id, band""".stripMargin) { (s, dir) =>
      Q.oracleOrder(
        graft.streaming.StreamOps.nearDupCandidates(
          Tables.t(s, dir, "documents"), "doc_id", "text").toDF(),
        "doc_id", "band")
    },

    // portable 32-bit simhash + capped chunk peers, DuckDB-verified
    // (q43's xxhash64 path keeps the rows-only check + spec pinning)
    Q.df("q46_portable_simhash",
      """WITH hv AS (
        |  SELECT doc_id,
        |    list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      s -> list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          list_transform(range(1, length(s) + 1),
        |            i -> CAST(ascii(substring(s, CAST(i AS INT), 1)) AS BIGINT))),
        |        (h, c) -> (h * 31 + c) % 1000000007)) AS hs
        |  FROM documents
        |),
        |sim AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(range(0, 32),
        |      j -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> CAST(j AS INT)) & 1 = 1)) > len(hs)
        |                THEN 1 << CAST(j AS INT) ELSE 0 END)) AS simhash32
        |  FROM hv
        |),
        |chunks AS (
        |  SELECT doc_id, simhash32, c, (simhash32 >> CAST(8*c AS INT)) & 255 AS cv
        |  FROM sim, range(0, 4) t(c)
        |),
        |capped AS (
        |  SELECT * FROM chunks QUALIFY count(*) OVER (PARTITION BY c, cv) <= 64
        |),
        |peers AS (
        |  SELECT a.doc_id, count(DISTINCT b.doc_id) AS n_chunk_peers
        |  FROM capped a JOIN capped b ON a.c = b.c AND a.cv = b.cv AND a.doc_id <> b.doc_id
        |  GROUP BY 1
        |)
        |SELECT s.doc_id, CAST(s.simhash32 AS BIGINT) AS simhash32,
        |  COALESCE(p.n_chunk_peers, 0) AS n_chunk_peers
        |FROM sim s LEFT JOIN peers p ON s.doc_id = p.doc_id
        |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      DedupOps.portableSimhashPeers(
        Tables.t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // cross-corpus MinHash decontamination: train slice (doc_id%37<>0)
    // vs eval slice (doc_id%37=0), band-bucket candidate join across
    // the corpora, exact-Jaccard verify — the fuzzy complement of
    // q84's exact n-gram contamination check. Same portable signature
    // arithmetic as q45, so the full operator is DuckDB-verified.
    Q.df("q47_cross_corpus_minhash",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |hs AS (
        |  SELECT doc_id, sh,
        |    list_transform(sh, s -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(s) + 1),
        |          i -> CAST(ascii(substring(s, CAST(i AS INT), 1)) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 1000000007)) AS hv
        |  FROM base
        |),
        |sig AS (
        |  SELECT doc_id, sh,
        |    list_transform(range(0, 8),
        |      p -> list_min(list_transform(hv, h -> ((2*p+1)*h + p) % 1000000007))) AS sg
        |  FROM hs
        |),
        |bandrec AS (
        |  SELECT doc_id, b,
        |    sg[CAST(2*b+1 AS INT)] * 1000000007 + sg[CAST(2*b+2 AS INT)] AS bh
        |  FROM sig, range(0, 4) t(b)
        |),
        |tb AS (
        |  SELECT * FROM bandrec WHERE doc_id % 37 <> 0
        |  QUALIFY count(*) OVER (PARTITION BY b, bh) <= 64
        |),
        |eb AS (
        |  SELECT * FROM bandrec WHERE doc_id % 37 = 0
        |  QUALIFY count(*) OVER (PARTITION BY b, bh) <= 64
        |),
        |cand AS (
        |  SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
        |  FROM tb t JOIN eb e ON t.b = e.b AND t.bh = e.bh
        |)
        |SELECT train_id, eval_id,
        |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
        |    len(list_distinct(x.sh || y.sh)) AS jaccard
        |FROM cand JOIN base x ON x.doc_id = cand.train_id
        |          JOIN base y ON y.doc_id = cand.eval_id
        |ORDER BY train_id, eval_id""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      DedupOps.crossCorpusMinhashPairs(
        docs.filter(col("doc_id") % 37 =!= 0), docs.filter(col("doc_id") % 37 === 0),
        "doc_id", "text")
        .orderBy("train_id", "eval_id")
    },

    // streaming near-dup stage 2 (r17, completes q149): incoming docs
    // band-join a STATIC signature index and confirm with exact
    // shingle Jaccard ≥ 0.25. flatMapGroupsWithState emits each
    // confirmed pair exactly once — batch-twin of the streaming run
    // (StreamingSpec drives ≥2 batchings to the same set)
    Q.df("q150_stream_neardup_confirm",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |hs AS (
        |  SELECT doc_id, sh,
        |    list_transform(sh, s -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(s) + 1),
        |          i -> CAST(ascii(substring(s, CAST(i AS INT), 1)) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 1000000007)) AS hv
        |  FROM base
        |),
        |sig AS (
        |  SELECT doc_id, sh,
        |    list_transform(range(0, 8),
        |      p -> list_min(list_transform(hv, h -> ((2*p+1)*h + p) % 1000000007))) AS sg
        |  FROM hs
        |),
        |bandrec AS (
        |  SELECT doc_id, b,
        |    sg[CAST(2*b+1 AS INT)] * 1000000007 + sg[CAST(2*b+2 AS INT)] AS bh
        |  FROM sig, range(0, 4) t(b)
        |),
        |nb AS (
        |  SELECT * FROM bandrec WHERE doc_id % 37 <> 0
        |),
        |ib AS (
        |  SELECT * FROM bandrec WHERE doc_id % 37 = 0
        |  QUALIFY count(*) OVER (PARTITION BY b, bh) <= 64
        |),
        |cand AS (
        |  SELECT DISTINCT n.doc_id AS doc_id, i.doc_id AS index_id
        |  FROM nb n JOIN ib i ON n.b = i.b AND n.bh = i.bh
        |),
        |j AS (
        |  SELECT cand.doc_id, cand.index_id,
        |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
        |      len(list_distinct(x.sh || y.sh)) AS jaccard
        |  FROM cand JOIN base x ON x.doc_id = cand.doc_id
        |            JOIN base y ON y.doc_id = cand.index_id
        |)
        |SELECT doc_id, index_id, jaccard FROM j WHERE jaccard >= 0.05
        |ORDER BY doc_id, index_id""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      val index = DedupOps.portableSignatureRows(
        docs.filter(col("doc_id") % 37 === 0), "doc_id", "text", 3, 8)
      Q.oracleOrder(
        graft.streaming.StreamOps.confirmedNearDups(
          docs.filter(col("doc_id") % 37 =!= 0), index,
          "doc_id", "text", minJaccard = 0.05).toDF(),
        "doc_id", "index_id")
    },

    // incremental cross-snapshot near-dup (r17): the OLD corpus's
    // signatures persist to a parquet index ONCE (memoized index
    // state, the q54/q130 contract); each run joins only the NEW
    // slice against the saved index — hash-equal to the
    // recompute-from-scratch oracle
    Q.df("q151_incremental_minhash",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |hs AS (
        |  SELECT doc_id, sh,
        |    list_transform(sh, s -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(s) + 1),
        |          i -> CAST(ascii(substring(s, CAST(i AS INT), 1)) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 1000000007)) AS hv
        |  FROM base
        |),
        |sig AS (
        |  SELECT doc_id, sh,
        |    list_transform(range(0, 8),
        |      p -> list_min(list_transform(hv, h -> ((2*p+1)*h + p) % 1000000007))) AS sg
        |  FROM hs
        |),
        |bandrec AS (
        |  SELECT doc_id, b,
        |    sg[CAST(2*b+1 AS INT)] * 1000000007 + sg[CAST(2*b+2 AS INT)] AS bh
        |  FROM sig, range(0, 4) t(b)
        |),
        |nb AS (
        |  SELECT * FROM bandrec WHERE doc_id % 3 = 0
        |),
        |ob AS (
        |  SELECT * FROM bandrec WHERE doc_id % 3 <> 0
        |  QUALIFY count(*) OVER (PARTITION BY b, bh) <= 64
        |),
        |cand AS (
        |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        |  FROM nb n JOIN ob o ON n.b = o.b AND n.bh = o.bh
        |)
        |SELECT new_id, old_id,
        |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
        |    len(list_distinct(x.sh || y.sh)) AS jaccard
        |FROM cand JOIN base x ON x.doc_id = cand.new_id
        |          JOIN base y ON y.doc_id = cand.old_id
        |ORDER BY new_id, old_id""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      val idxPath = graft.operators.PlanMemo.getOrCompute[String](
        ("q151_sigindex", graft.operators.PlanMemo.dataKey(docs))) {
        val p = java.nio.file.Files.createTempDirectory("graft_sigidx_").toString
        DedupOps.writeSignatureIndex(
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", p)
        p
      }
      Q.oracleOrder(
        DedupOps.incrementalMinhashPairs(
          docs.filter(col("doc_id") % 3 === 0), idxPath, "doc_id", "text"),
        "new_id", "old_id")
    },

    // the survivors half of the incremental run (r17): new docs with
    // no confirmed near-dup in the persisted index at jaccard >= 0.5
    // — the rows the pipeline keeps and the signature delta the next
    // snapshot appends. Shares q151's memoized index.
    Q.df("q152_incremental_survivors",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |base AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |hs AS (
        |  SELECT doc_id, sh,
        |    list_transform(sh, s -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(s) + 1),
        |          i -> CAST(ascii(substring(s, CAST(i AS INT), 1)) AS BIGINT))),
        |      (h, c) -> (h * 31 + c) % 1000000007)) AS hv
        |  FROM base
        |),
        |sig AS (
        |  SELECT doc_id, sh,
        |    list_transform(range(0, 8),
        |      p -> list_min(list_transform(hv, h -> ((2*p+1)*h + p) % 1000000007))) AS sg
        |  FROM hs
        |),
        |bandrec AS (
        |  SELECT doc_id, b,
        |    sg[CAST(2*b+1 AS INT)] * 1000000007 + sg[CAST(2*b+2 AS INT)] AS bh
        |  FROM sig, range(0, 4) t(b)
        |),
        |nb AS (
        |  SELECT * FROM bandrec WHERE doc_id % 3 = 0
        |),
        |ob AS (
        |  SELECT * FROM bandrec WHERE doc_id % 3 <> 0
        |  QUALIFY count(*) OVER (PARTITION BY b, bh) <= 64
        |),
        |cand AS (
        |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        |  FROM nb n JOIN ob o ON n.b = o.b AND n.bh = o.bh
        |),
        |dups AS (
        |  SELECT DISTINCT new_id
        |  FROM cand JOIN base x ON x.doc_id = cand.new_id
        |            JOIN base y ON y.doc_id = cand.old_id
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
        |      len(list_distinct(x.sh || y.sh)) >= 0.5
        |)
        |SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT new_id FROM dups)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      val idxPath = graft.operators.PlanMemo.getOrCompute[String](
        ("q151_sigindex", graft.operators.PlanMemo.dataKey(docs))) {
        val p = java.nio.file.Files.createTempDirectory("graft_sigidx_").toString
        DedupOps.writeSignatureIndex(
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", p)
        p
      }
      Q.oracleOrder(
        DedupOps.incrementalSurvivors(
          docs.filter(col("doc_id") % 3 === 0), idxPath, "doc_id", "text",
          minJaccard = 0.5)
          .select("doc_id", "lang", "n_chars"),
        "doc_id")
    },

    // blocked fuzzy string join: part names at edit distance <= 2
    // (entity resolution; equi-join + length band, exact levenshtein
    // verify — identical semantics in both engines). The block key is
    // the scale dial: brand alone leaves ~n²/25 candidate pairs, so
    // the canopy adds the name's noun — on this corpus that keeps
    // every dist<=2 pair (edits land in the adjective) at 8× fewer
    // levenshtein evaluations.
    // CAP-DEPENDENCE: fuzzyJoin thins over-cap blocks with an xxhash64
    // sample the DuckDB oracle cannot mirror, so hash-parity holds
    // only while every block stays under maxBucket (10000).
    // overCapIsError makes the operator itself raise with the cause at
    // execution time (riding its own counts join — no extra census
    // job), so a scale-factor bump fails loudly, not as a row-diff
    // mystery.
    Q.df("q68_fuzzy_join",
      """WITH p AS (SELECT p_partkey AS id, p_name AS s,
        |    p_brand || '|' || split_part(p_name, ' ', 2) AS blk FROM part)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
        |WHERE abs(length(a.s) - length(b.s)) <= 2
        |  AND levenshtein(a.s, b.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val parts = Tables.t(s, dir, "part").withColumn("block",
        concat(col("p_brand"), lit("|"),
          element_at(split(col("p_name"), " "), 2)))
      Q.oracleOrder(
        DedupOps.fuzzyJoin(parts, "p_partkey", "p_name", "block", maxDist = 2,
          overCapIsError = true),
        "id_a", "id_b")
    },

    // --- keep-BEST dedup policy: per exact-content group keep the copy
    //     from the first source in binary order (production pipelines
    //     keep the most-trusted mirror, not the lowest id) — same
    //     digest-struct partial-agg + semi-join scale shape as q41
    Q.df("q136_dedup_keep_best",
      """SELECT doc_id, source, lang, n_chars FROM (
        |  SELECT doc_id, source, lang, n_chars,
        |         row_number() OVER (PARTITION BY md5(text)
        |                            ORDER BY source, doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      DedupOps.dedupKeepBest(Tables.t(s, dir, "documents"),
        "doc_id", "text", Seq("source"))
        .select("doc_id", "source", "lang", "n_chars").orderBy("doc_id")
    }
  )
}
