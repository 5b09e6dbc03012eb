package graft.queries

import graft.{Q, QueryDef, Tables}
import graft.operators.{DedupOps, TextAnalysisOps}
import org.apache.spark.sql.functions.{call_function, col, concat, concat_ws, conv, greatest, lit, md5, min, size, slice, split, substring, trim, when}

/** Text-analysis operators over the `documents` table (LLM-pipeline
  * extension; see SURVEY.md §0). Every query carries a full DuckDB
  * oracle — all scores are exact integer/decimal arithmetic.
  */
object TextAnalysis {

  // DuckDB fragment: occurrences of literal `pat` in expression `e`.
  private def occ(e: String, pat: String): String =
    s"cast((length($e) - length(replace($e, '$pat', ''))) / ${pat.length} as bigint)"

  private def duckLangScore(lang: String): String =
    if (lang == "zh")
      // CJK ideograph count (matches TextAnalysisOps.langScore's
      // [^一-鿿] negation; RE2 hex-escape syntax)
      """cast(length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) as bigint)"""
    else TextAnalysisOps.langMarkers(lang)
      .map(m => occ("(' ' || text || ' ')", m)).mkString("(", " + ", ")")

  val queries: Seq[QueryDef] = Seq(

    // --- language-ID: stopword-marker scores + argmax prediction
    Q.df("q60_lang_id", {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val scores = langs.map(l => s"${duckLangScore(l)} AS score_$l").mkString(",\n  ")
      val best = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
      val pred = langs.foldRight("'und'") { (l, acc) =>
        s"CASE WHEN score_$l = $best AND $best > 0 THEN '$l' ELSE $acc END"
      }
      s"""SELECT doc_id, score_de, score_en, score_es, score_fr, score_zh,
         |  $pred AS lang_pred
         |FROM (SELECT doc_id,
         |  $scores
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      TextAnalysisOps.langId(Tables.t(s, dir, "documents"), "doc_id", "text")
        .transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- quality scoring: counts + exact-decimal ratios
    Q.df("q61_quality_score",
      """SELECT doc_id,
        |  cast(length(text) as bigint) AS n_chars,
        |  cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint) AS n_tokens,
        |  cast(cast(length(text) as decimal(20,6)) /
        |       greatest(len(regexp_split_to_array(trim(text), '\s+')), 1) as double) AS chars_per_token,
        |  cast(cast(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) as decimal(20,6)) /
        |       greatest(length(text), 1) as double) AS alpha_ratio,
        |  cast(cast((length(text) - length(replace(text, ' ', ''))) as decimal(20,6)) /
        |       greatest(length(text), 1) as double) AS space_ratio
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysisOps.qualityScore(Tables.t(s, dir, "documents"), "doc_id", "text")
        .transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- token counting: whitespace, BPE-ish regex, chars/4 estimate
    Q.df("q62_token_stats",
      """SELECT doc_id,
        |  cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint) AS ws_tokens,
        |  cast(len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]')) as bigint) AS bpeish_tokens,
        |  cast(ceil(cast(length(text) as double) / 4) as bigint) AS est_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysisOps.tokenStats(Tables.t(s, dir, "documents"), "doc_id", "text")
        .transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- rolling-hash document fingerprint (h = h*31 + code mod 1e9+7)
    Q.df("q63_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(cast(0 as bigint),
        |      list_transform(range(1, length(text) + 1),
        |        i -> cast(ascii(substring(text, cast(i as int), 1)) as bigint))),
        |    (h, c) -> (h * 31 + c) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysisOps.fingerprints(Tables.t(s, dir, "documents"), "doc_id", "text")
        .transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- deterministic content-keyed train/val/test split (80/10/10)
    Q.df("q64_train_split",
      """SELECT doc_id, CAST(b AS BIGINT) AS bucket,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(('0x' || substring(md5(text), 1, 8)) AS UBIGINT) % 100 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysisOps.trainSplit(Tables.t(s, dir, "documents"), "doc_id", "text")
        .transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- deterministic stratified sample: 50% of en, 20% of the rest,
    // decided by a salted content hash (no RNG, engine-stable)
    Q.df("q65_stratified_sample",
      """SELECT doc_id, lang
        |FROM (SELECT doc_id, lang,
        |        CAST(('0x' || substring(md5(text || '#strat'), 1, 8)) AS UBIGINT) % 100 AS b
        |      FROM documents)
        |WHERE b < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysisOps.stratifiedSample(Tables.t(s, dir, "documents"),
          "text", "lang", Map("en" -> 50), defaultPct = 20)
        .select("doc_id", "lang").transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- temperature resampling to a sqrt-flattened source mixture
    // (the pretraining data-recipe step): per-lang target =
    // floor(total * sqrt(n) / sum(sqrt(n))), each lang exactly down-
    // or up-sampled to it by (md5, id) hash-rank; `rep` marks whole-
    // epoch repeats of small sources. The weight sum accumulates in
    // SORTED lang order on both engines, so the IEEE floor agrees
    // bit-for-bit.
    Q.df("q132_mixture_sample",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t,
        |               sum(pow(CAST(n AS DOUBLE), 0.5) ORDER BY lang) AS sw FROM c),
        |tgt AS (SELECT lang, n,
        |    CAST(floor((t * pow(CAST(n AS DOUBLE), 0.5)) / sw) AS BIGINT) AS target
        |  FROM c CROSS JOIN tot),
        |ranked AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents),
        |reps AS (SELECT r.doc_id, r.lang,
        |    (t.target // t.n) +
        |      CASE WHEN r.rk <= (t.target % t.n) THEN 1 ELSE 0 END AS nrep
        |  FROM ranked r JOIN tgt t USING (lang))
        |SELECT doc_id, lang, CAST(unnest(range(nrep)) AS BIGINT) AS rep
        |FROM reps
        |ORDER BY lang, doc_id, rep""".stripMargin) { (s, dir) =>
      TextAnalysisOps.mixtureSample(Tables.t(s, dir, "documents"),
          "doc_id", "lang", alpha = 0.5)
        .transform(Q.oracleOrderC(_, col("lang"), col("doc_id"), col("rep")))
    },

    // --- top-20 word bigrams with counts (vocabulary induction)
    Q.df("q66_top_ngrams",
      """WITH toksrc AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |grams AS (
        |  SELECT unnest(list_transform(range(1, len(toks)),
        |    i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS gram
        |  FROM toksrc WHERE len(toks) >= 2
        |)
        |SELECT gram, count(*) AS n FROM grams
        |GROUP BY gram ORDER BY n DESC, gram LIMIT 20""".stripMargin) { (s, dir) =>
      TextAnalysisOps.topNgrams(Tables.t(s, dir, "documents"), "text", n = 2, k = 20)
    },

    // --- sketch-aggregate stats: GK-sketch discrete median (exact at
    // accuracy >> group size — pinned against DuckDB quantile_disc)
    // + exact distinct; the HLL++ estimate is spec-only (DuckDB's HLL
    // is a different sketch, so no cross-engine hash exists for it)
    Q.df("q67_corpus_stats",
      """SELECT lang, quantile_disc(n_chars, 0.5) AS median,
        |  count(DISTINCT n_chars) AS n_distinct
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      TextAnalysisOps.corpusStats(Tables.t(s, dir, "documents"), "lang", "n_chars")
        .select("lang", "median", "n_distinct")
        .transform(Q.oracleOrder(_, "lang"))
    },

    // --- benchmark decontamination: distinct 5-gram overlap of every
    // training doc (id % 37 != 0) against the held-out eval slice
    // (id % 37 == 0); broadcast eval grams, text never shuffles
    Q.df("q84_contamination",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
        |    i -> array_to_string(list_slice(toks, i, i + 4), ' '))) AS gram
        |  FROM toksrc WHERE len(toks) >= 5
        |),
        |eval_grams AS (
        |  SELECT DISTINCT gram FROM grams WHERE doc_id % 37 = 0
        |),
        |olap AS (
        |  SELECT g.doc_id, count(DISTINCT g.gram) AS n_overlap
        |  FROM grams g JOIN eval_grams e ON g.gram = e.gram
        |  WHERE g.doc_id % 37 <> 0
        |  GROUP BY g.doc_id
        |)
        |SELECT d.doc_id, COALESCE(o.n_overlap, 0) AS n_overlap,
        |  COALESCE(o.n_overlap, 0) >= 1 AS contaminated
        |FROM documents d LEFT JOIN olap o ON d.doc_id = o.doc_id
        |WHERE d.doc_id % 37 <> 0
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      TextAnalysisOps.contaminationCheck(
        docs.filter("doc_id % 37 != 0"), docs.filter("doc_id % 37 = 0"),
        "doc_id", "text", n = 5)
        .transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- repetition/boilerplate filter: top-3-gram fraction per doc
    Q.df("q85_repetition",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        |    i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS gram
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |counts AS (
        |  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
        |),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |    CAST(max(c) AS BIGINT) AS top_gram_n
        |  FROM counts GROUP BY 1
        |)
        |SELECT d.doc_id, COALESCE(a.n_grams, 0) AS n_grams,
        |  COALESCE(a.top_gram_n, 0) AS top_gram_n,
        |  CASE WHEN COALESCE(a.n_grams, 0) > 0
        |    THEN CAST(a.top_gram_n AS DOUBLE) / a.n_grams ELSE 0.0 END AS rep_ratio
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      TextAnalysisOps.repetitionScore(
        Tables.t(s, dir, "documents"), "doc_id", "text", n = 3)
        .transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- PII scrub: count + redact emails and IPv4 literals. The
    // corpus is synthetic, so both engines inject the same
    // deterministic PII before scrubbing — the redaction itself is
    // what the oracle grades
    Q.df("q86_pii_scrub",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@mail' || (doc_id % 7) ||
        |    '.com or 10.' || (doc_id % 200) || '.0.7 now' AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS clean_text
        |FROM seeded ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // fanout before the 4-regex-pass projection: the single-split
      // documents scan would otherwise run every regex on one thread
      val seeded = Q.rangeFanout(Tables.t(s, dir, "documents"), "doc_id")
        .selectExpr("doc_id",
        """concat(text, ' contact user', doc_id, '@mail', doc_id % 7,
          |'.com or 10.', doc_id % 200, '.0.7 now') AS text""".stripMargin.replace("\n", ""))
      TextAnalysisOps.piiScrub(seeded, "doc_id", "text").sortWithinPartitions("doc_id")
    },

    // --- URL/domain profiling: extract → domain-reduce → per-domain
    // doc/mention counts (the source-mix step). Synthetic corpus, so
    // both engines seed the same deterministic URLs — the extraction
    // and domain arithmetic are what the oracle grades
    Q.df("q87_url_domains",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    text || ' see https://host' || (doc_id % 23) || '.example.com/p/' ||
        |    (doc_id % 5) || ' and www.ref' || (doc_id % 11) || '.org ' AS text
        |  FROM documents
        |),
        |urls AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(text,
        |      '(https?://|www\.)[A-Za-z0-9.-]+\.[A-Za-z]{2,}(/[A-Za-z0-9._/-]*)?')) AS url
        |  FROM seeded
        |),
        |doms AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(
        |      url, '^https?://', ''), '^www\.', ''), '/.*$', '') AS domain
        |  FROM urls
        |)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM doms GROUP BY domain ORDER BY domain""".stripMargin) { (s, dir) =>
      val seeded = Tables.t(s, dir, "documents").selectExpr("doc_id",
        """concat(text, ' see https://host', doc_id % 23, '.example.com/p/',
          |doc_id % 5, ' and www.ref', doc_id % 11, '.org ') AS text"""
          .stripMargin.replace("\n", ""))
      // smallDomainSet: the seeded mix produces 34 domains, so the
      // roll-up folds into one 1-task stage (one exchange total) with
      // the oracle sort riding the same stage. An 8-way hashFanout of
      // the regex pass was tried and measured SLOWER (r14): the
      // exchange + 8-task scheduling cost ~3x the 110 ms single-split
      // regex stage it parallelized.
      TextAnalysisOps.urlDomainStats(seeded, "doc_id", "text",
          smallDomainSet = true)
        .sortWithinPartitions("domain")
    },

    // --- token-window chunking: 8-token windows, stride 4, short tails
    // kept (the RAG/embedding prep step; map-side explode)
    Q.df("q88_token_chunks",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |st AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 4)) AS start FROM toksrc
        |)
        |SELECT doc_id, CAST(start / 4 AS BIGINT) AS chunk_idx,
        |  array_to_string(list_slice(toks, CAST(start + 1 AS INT), CAST(start + 8 AS INT)), ' ') AS chunk,
        |  CAST(len(list_slice(toks, CAST(start + 1 AS INT), CAST(start + 8 AS INT))) AS BIGINT) AS n_tokens
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      TextAnalysisOps.chunkTokens(Tables.t(s, dir, "documents"),
        "doc_id", "text", window = 8, stride = 4)
        .transform(Q.oracleOrder(_, "doc_id", "chunk_idx"))
    },

    // --- sequence packing: per-shard (lang) concat-and-chunk bin
    // assignment at a 512-token budget (training-batch prep; one
    // running-sum window per shard — the shard is the parallelism unit)
    Q.df("q89_sequence_packing",
      """WITH t AS (
        |  SELECT doc_id, lang AS shard,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
        |  FROM t
        |)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(cum - n_tokens AS BIGINT) AS stream_offset,
        |  CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysisOps.packSequences(Tables.t(s, dir, "documents"),
        "doc_id", "text", "lang", budget = 512L)
        .transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- top-3 TF-IDF terms per doc; idf pinned to the integer grid
    // (floor(ln(N/df)*1e6)) so scores are exact integer products
    Q.df("q69_tfidf_terms",
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf,
        |    CAST(floor(ln(CAST(n.n AS DOUBLE) / df.df) * 1000000) AS BIGINT) AS idf_u
        |  FROM tf t JOIN df USING (term) CROSS JOIN n
        |),
        |ranked AS (
        |  SELECT doc_id, term, tf, idf_u, tf * idf_u AS score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tf * idf_u DESC, term) AS rn
        |  FROM scored
        |)
        |SELECT doc_id, term, tf, idf_u, score FROM ranked
        |WHERE rn <= 3 ORDER BY doc_id, score DESC, term""".stripMargin) { (s, dir) =>
      // repartition(1), NOT coalesce(1): the operator now range-fans
      // the tokenizer, and a coalesce would collapse that whole
      // narrow chain (tokenize + broadcast join + top-k) back into
      // one task — the shuffle barrier keeps the compute parallel and
      // only the k-per-doc survivors cross it
      TextAnalysisOps.tfidfTopTerms(Tables.t(s, dir, "documents"),
        "doc_id", "text", k = 3,
        corpusN = Some(Tables.rowCount(s, dir, "documents")))
        .transform(Q.oracleOrderC(_, col("doc_id"), col("score").desc, col("term")))
    },

    // --- the pipeline, end to end: quality gate → language gate →
    // exact dedup keep-first → content-keyed split → per-(lang,split)
    // sequence packing. Every stage is one of the oracle-verified
    // operators above; this query pins that they COMPOSE — one DuckDB
    // oracle over the whole five-stage chain.
    Q.df("q99_pipeline", {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val scores = langs.map(l => s"${duckLangScore(l)} AS score_$l").mkString(",\n  ")
      val best = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
      val pred = langs.foldRight("'und'") { (l, acc) =>
        s"CASE WHEN score_$l = $best AND $best > 0 THEN '$l' ELSE $acc END"
      }
      s"""WITH q AS (
         |  SELECT doc_id, text,
         |    cast(cast(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) as decimal(20,6)) /
         |         greatest(length(text), 1) as double) AS alpha_ratio,
         |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_toks
         |  FROM documents),
         |d1 AS (SELECT doc_id, text FROM q WHERE alpha_ratio >= 0.6 AND n_toks >= 5),
         |lang AS (
         |  SELECT doc_id, $pred AS lang_pred
         |  FROM (SELECT doc_id, $scores FROM d1)),
         |d2 AS (
         |  SELECT d1.doc_id, d1.text, lang.lang_pred
         |  FROM d1 JOIN lang USING (doc_id)
         |  WHERE lang_pred IN ('en', 'de', 'es', 'fr')),
         |d3 AS (
         |  SELECT doc_id, text, lang_pred FROM (
         |    SELECT d2.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM d2) WHERE rn = 1),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |          CAST(('0x' || substring(md5(text), 1, 8)) AS UBIGINT) % 100 AS b
         |        FROM d3)),
         |d4 AS (
         |  SELECT d3.doc_id, d3.text, d3.lang_pred || '/' || sp.split AS shard
         |  FROM d3 JOIN sp USING (doc_id)),
         |c AS (
         |  SELECT doc_id, shard,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM d4),
         |w AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum
         |  FROM c)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(cum - n_tokens AS BIGINT) AS stream_offset,
         |  CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_id
         |FROM w ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      // Fused single-frame pipeline (r18, guide §8/§2.4): quality,
      // language and split are PURE per-row functions of (doc_id,
      // text), so computing them as (doc_id, signal) frames and
      // joining each back onto docs — the r17 shape — paid 4 joins /
      // 22 exchanges / 14 SortMergeJoins re-shuffling the text
      // payload (plans/r18/q99_pipeline_before.txt). Inlining them as
      // columns on ONE frame leaves exactly the two fundamental
      // shuffles: the dedup group+semi-join and the per-shard packing
      // window. Expressions are copied verbatim from
      // qualityScore/langId/trainSplit so every filter and shard
      // decision is bit-identical (oracle re-proved).
      graft.functions.TextExpressions.install(s)
      val docs = Tables.t(s, dir, "documents")
      val d2 = docs
        .withColumn("__q", call_function("text_quality", col("text")))
        .filter(
          (col("__q.n_alpha").cast("decimal(20,6)") /
            greatest(col("__q.n_chars"), lit(1L))).cast("double") >= 0.6 &&
          col("__q.n_tokens") >= 5)
        .withColumn("lang_pred",
          call_function("lang_scores", col("text")).getField("lang_pred"))
        .filter(col("lang_pred").isin("en", "de", "es", "fr"))
        .select("doc_id", "text", "lang_pred")
      // keep-first dedup: same partial-agg + semi-join shape as
      // DedupOps.dedupKeepFirst (doc_id unique + non-null on testdata)
      val keep = d2.groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"))
        .select(col("keep_id").as("doc_id"))
      val d3 = d2.join(keep, Seq("doc_id"), "left_semi")
      // content-hash split (trainSplit's exact expression) + shard key
      val bucket = conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long") % 100
      val d4 = d3.withColumn("shard_key", concat(col("lang_pred"), lit("/"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")))
      TextAnalysisOps.packSequences(d4, "doc_id", "text", "shard_key", budget = 512L)
        .transform(Q.oracleOrder(_, "doc_id"))
    },

    // --- BM25 retrieval ranking for a bag-of-terms query (Okapi BM25,
    //     Lucene idf, k1=1.2 b=0.75). Determinism: each (doc, term)
    //     score quantizes to integer micro-units BEFORE the per-doc
    //     sum (the q69 idf convention), so aggregation order cannot
    //     perturb low bits; the expression tree is written identically
    //     on both engines.
    Q.df("q130_bm25_rank",
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |stats AS (
        |  SELECT CAST(sum(len(toks)) AS BIGINT) AS tot,
        |         CAST(count(*) AS BIGINT) AS n FROM toks
        |),
        |tf AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, term,
        |         CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, toks, unnest(toks) AS term FROM toks)
        |  WHERE term IN ('hash', 'join', 'spark')
        |  GROUP BY 1, 2, 3
        |),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id,
        |    CAST(floor(ln((CAST(s.n - d.df AS DOUBLE) + 0.5) /
        |        (CAST(d.df AS DOUBLE) + 0.5) + 1.0) *
        |      ((CAST(t.tf AS DOUBLE) * (1.2 + 1.0)) /
        |       (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 *
        |        CAST(t.dl AS DOUBLE) / (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE)))))
        |      * 1000000.0) AS BIGINT) AS score_u
        |  FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
        |)
        |SELECT doc_id, CAST(sum(score_u) AS BIGINT) AS score_u,
        |       CAST(count(*) AS BIGINT) AS n_terms
        |FROM scored GROUP BY doc_id
        |ORDER BY score_u DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      TextAnalysisOps.bm25Rank(Tables.t(s, dir, "documents"),
        "doc_id", "text", Seq("hash", "join", "spark"), topK = 20)
    },

    // --- Bloom-prefiltered exact decontamination: the contaminationCheck
    //     variant for eval sets too big to broadcast as an exact hash
    //     set. Bloom false positives are removed by the confirm join, so
    //     the oracle is the same EXACT n-gram overlap the q84 shape uses
    //     (different split + n + threshold to keep the queries distinct).
    Q.df("q133_bloom_decontam",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 2),
        |    i -> array_to_string(list_slice(toks, i, i + 3), ' ')))) AS gram
        |  FROM toksrc WHERE len(toks) >= 4
        |),
        |eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 31 = 0),
        |olap AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        |  FROM grams g JOIN eval_grams e USING (gram)
        |  WHERE g.doc_id % 31 <> 0 GROUP BY 1
        |)
        |SELECT d.doc_id, COALESCE(o.n_overlap, 0) AS n_overlap,
        |  COALESCE(o.n_overlap, 0) >= 2 AS contaminated
        |FROM documents d LEFT JOIN olap o ON d.doc_id = o.doc_id
        |WHERE d.doc_id % 31 <> 0
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      Q.oracleOrder(
        TextAnalysisOps.bloomDecontaminate(
          docs.filter("doc_id % 31 != 0"), docs.filter("doc_id % 31 = 0"),
          "doc_id", "text", n = 4, minOverlap = 2),
        "doc_id")
    },

    // --- cross-document duplicated-gram fraction (the Gopher/Dolma
    //     corpus-level boilerplate filter; q85 is the within-doc twin)
    Q.df("q134_dup_gram_fraction",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS gram
        |  FROM toksrc WHERE len(toks) >= 3
        |),
        |dfed AS (
        |  SELECT doc_id, CAST(count(*) OVER (PARTITION BY gram) AS BIGINT) AS df
        |  FROM grams
        |),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |         CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
        |  FROM dfed GROUP BY 1
        |)
        |SELECT d.doc_id, COALESCE(a.n_grams, 0) AS n_grams,
        |  COALESCE(a.n_dup_grams, 0) AS n_dup_grams,
        |  CASE WHEN COALESCE(a.n_grams, 0) = 0 THEN 0.0
        |       ELSE CAST(a.n_dup_grams AS DOUBLE) / CAST(a.n_grams AS DOUBLE)
        |  END AS dup_fraction
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      Q.oracleOrder(
        TextAnalysisOps.dupGramFraction(Tables.t(s, dir, "documents"),
          "doc_id", "text", n = 3, minDf = 2),
        "doc_id")
    },

    // --- deterministic training order: salted-hash shuffle into
    //     shards with in-shard positions — no RNG, engine- and
    //     cluster-size-stable; one shard-key shuffle, never a global
    //     sort
    Q.df("q145_training_order",
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#ord'),
        |      1, 15)) AS UBIGINT) AS h
        |  FROM documents
        |)
        |SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
        |    AS BIGINT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin) { (s, dir) =>
      Q.oracleOrder(
        TextAnalysisOps.trainingOrder(Tables.t(s, dir, "documents"),
          "doc_id", nShards = 8),
        "shard", "pos")
    },

    // --- CCNet-style line-level boilerplate removal: banner/footer
    //     lines seeded deterministically from doc_id (the q143
    //     convention — the synthetic corpus has no newlines of its
    //     own); lines shared by >= 3 docs strip from the rebuilt text
    Q.df("q146_boilerplate_lines",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0
        |      THEN 'SUBSCRIBE TO OUR NEWSLETTER' || chr(10) ELSE '' END ||
        |    text ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN chr(10) || 'Copyright 2024 Example Corp. All rights reserved.'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |      THEN chr(10) || '  Privacy Policy | Terms of Service  '
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 6 = 0 THEN chr(10) ELSE '' END ||
        |    CASE WHEN doc_id % 97 = 0
        |      THEN chr(10) || 'Rare footer ' || CAST(doc_id AS VARCHAR)
        |      ELSE '' END AS text
        |  FROM documents
        |),
        |seeded2 AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS ls FROM seeded
        |),
        |l AS (
        |  SELECT doc_id, unnest(ls) AS line,
        |    unnest(range(1, len(ls) + 1)) AS ord
        |  FROM seeded2
        |),
        |b AS (
        |  SELECT t AS bt
        |  FROM (SELECT DISTINCT doc_id, trim(line) AS t FROM l
        |        WHERE trim(line) <> '')
        |  GROUP BY 1 HAVING count(*) >= 3
        |),
        |flag AS (
        |  SELECT doc_id, line, ord,
        |    (trim(line) <> '' AND trim(line) IN (SELECT bt FROM b)) AS is_b
        |  FROM l
        |)
        |SELECT doc_id,
        |  CAST(count(*) FILTER (WHERE trim(line) <> '') AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (WHERE is_b) AS BIGINT) AS n_boiler,
        |  coalesce(string_agg(line, chr(10) ORDER BY ord)
        |    FILTER (WHERE NOT is_b), '') AS clean_text,
        |  CASE WHEN count(*) FILTER (WHERE trim(line) <> '') = 0 THEN 0
        |    ELSE CAST(floor(CAST(count(*) FILTER (WHERE is_b) AS DOUBLE) /
        |      CAST(count(*) FILTER (WHERE trim(line) <> '') AS DOUBLE)
        |      * 1000000.0) AS BIGINT) END AS boiler_frac_u
        |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val nl = "\n"
      val seeded = Tables.t(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 4 === 0,
            s"SUBSCRIBE TO OUR NEWSLETTER$nl").otherwise(""),
          col("text"),
          when(col("doc_id") % 3 === 0,
            s"${nl}Copyright 2024 Example Corp. All rights reserved.")
            .otherwise(""),
          when(col("doc_id") % 5 === 0,
            s"$nl  Privacy Policy | Terms of Service  ").otherwise(""),
          when(col("doc_id") % 6 === 0, nl).otherwise(""),
          when(col("doc_id") % 97 === 0,
            concat(lit(s"${nl}Rare footer "),
              col("doc_id").cast("string"))).otherwise(""))
          .as("text"))
      Q.oracleOrder(
        TextAnalysisOps.boilerplateLines(seeded, "doc_id", "text", minDocs = 3),
        "doc_id")
    },

    // --- per-document Unicode script profile (multilingual routing /
    //     mixed-script spam signal): non-latin runs seeded from
    //     doc_id (q143 convention — the synthetic corpus is latin)
    Q.df("q147_script_profile",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 29 = 0 THEN 'Пример текста для профиля'
        |    ELSE text ||
        |      CASE WHEN doc_id % 7 = 0 THEN ' Привет мир' ELSE '' END ||
        |      CASE WHEN doc_id % 11 = 0 THEN ' 你好世界です' ELSE '' END ||
        |      CASE WHEN doc_id % 13 = 0 THEN ' مرحبا بالعالم' ELSE '' END ||
        |      CASE WHEN doc_id % 17 = 0 THEN ' γειά σου κόσμε' ELSE '' END ||
        |      CASE WHEN doc_id % 19 = 0 THEN ' 안녕하세요 세계' ELSE '' END ||
        |      CASE WHEN doc_id % 23 = 0 THEN ' 0123456789' ELSE '' END
        |    END AS text
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[\x{0600}-\x{06FF}]')) AS BIGINT) AS n_arabic,
        |    CAST(len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]')) AS BIGINT) AS n_cjk,
        |    CAST(len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS BIGINT) AS n_cyrillic,
        |    CAST(len(regexp_extract_all(text, '[\x{0370}-\x{03FF}]')) AS BIGINT) AS n_greek,
        |    CAST(len(regexp_extract_all(text, '[\x{AC00}-\x{D7AF}]')) AS BIGINT) AS n_hangul,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z\x{00C0}-\x{024F}]')) AS BIGINT) AS n_latin,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
        |    CAST(length(text) AS BIGINT) AS n_total
        |  FROM seeded
        |)
        |SELECT doc_id, n_arabic, n_cjk, n_cyrillic, n_greek, n_hangul,
        |  n_latin, n_digit, n_total,
        |  CASE WHEN GREATEST(n_arabic, n_cjk, n_cyrillic, n_greek, n_hangul,
        |      n_latin) = 0 THEN 'none'
        |    WHEN n_arabic = GREATEST(n_arabic, n_cjk, n_cyrillic, n_greek,
        |      n_hangul, n_latin) THEN 'arabic'
        |    WHEN n_cjk = GREATEST(n_cjk, n_cyrillic, n_greek, n_hangul,
        |      n_latin) THEN 'cjk'
        |    WHEN n_cyrillic = GREATEST(n_cyrillic, n_greek, n_hangul,
        |      n_latin) THEN 'cyrillic'
        |    WHEN n_greek = GREATEST(n_greek, n_hangul, n_latin) THEN 'greek'
        |    WHEN n_hangul = GREATEST(n_hangul, n_latin) THEN 'hangul'
        |    ELSE 'latin' END AS dominant,
        |  CAST((n_arabic > 0)::int + (n_cjk > 0)::int + (n_cyrillic > 0)::int
        |    + (n_greek > 0)::int + (n_hangul > 0)::int + (n_latin > 0)::int
        |    AS BIGINT) AS n_scripts
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val seeded = Tables.t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 29 === 0, "Пример текста для профиля")
          .otherwise(concat(col("text"),
            when(col("doc_id") % 7 === 0, " Привет мир").otherwise(""),
            when(col("doc_id") % 11 === 0, " 你好世界です").otherwise(""),
            when(col("doc_id") % 13 === 0, " مرحبا بالعالم").otherwise(""),
            when(col("doc_id") % 17 === 0, " γειά σου κόσμε").otherwise(""),
            when(col("doc_id") % 19 === 0, " 안녕하세요 세계").otherwise(""),
            when(col("doc_id") % 23 === 0, " 0123456789").otherwise("")))
          .as("text"))
      Q.oracleOrder(
        TextAnalysisOps.scriptProfile(seeded, "doc_id", "text"),
        "doc_id")
    },

    // --- Zipf rank-frequency slope per source (corpus-health
    //     diagnostic): least squares over the top-200 terms,
    //     micro-nat-quantized contributions, exact long sums
    Q.df("q148_zipf_alpha",
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents
        |),
        |tf AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
        |       FROM toks WHERE t <> '' GROUP BY 1, 2),
        |rk AS (SELECT source, c, row_number() OVER
        |         (PARTITION BY source ORDER BY c DESC, t) AS r FROM tf),
        |q AS (SELECT source,
        |    CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT) AS xq,
        |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS yq
        |  FROM rk WHERE r <= 200),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
        |    sum(xq) AS sx, sum(yq) AS sy, sum(xq * yq) AS sxy,
        |    sum(xq * xq) AS sxx
        |  FROM q GROUP BY 1 HAVING count(*) >= 2)
        |SELECT source, n_terms,
        |  CAST(floor(-(CAST(n_terms * sxy - sx * sy AS DOUBLE) /
        |    CAST(n_terms * sxx - sx * sx AS DOUBLE)) * 1000000.0) AS BIGINT)
        |    AS alpha_u
        |FROM s ORDER BY source""".stripMargin) { (s, dir) =>
      Q.oracleOrder(
        TextAnalysisOps.zipfAlpha(Tables.t(s, dir, "documents"),
          "source", "text", k = 200),
        "source")
    },

    // --- pairwise source vocabulary overlap (shard-redundancy
    //     detection): Jaccard of distinct-term sets per source pair,
    //     micro-unit quantized from exact counts
    Q.df("q144_vocab_overlap",
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents
        |),
        |st AS (SELECT DISTINCT source, t FROM toks WHERE t <> ''),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(count(*) AS BIGINT) AS n_common
        |  FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT source_a, source_b, n_common,
        |  za.n + zb.n - n_common AS n_union,
        |  CAST(floor(CAST(n_common AS DOUBLE) /
        |    CAST(za.n + zb.n - n_common AS DOUBLE) * 1000000.0) AS BIGINT)
        |    AS jaccard_u
        |FROM inter
        |JOIN sz za ON inter.source_a = za.source
        |JOIN sz zb ON inter.source_b = zb.source
        |ORDER BY source_a, source_b""".stripMargin) { (s, dir) =>
      Q.oracleOrder(
        TextAnalysisOps.vocabOverlap(Tables.t(s, dir, "documents"),
          "source", "text"),
        "source_a", "source_b")
    },

    // --- encoding-artifact / mojibake gate (ftfy-class): replacement
    //     chars, stray C0 controls, UTF-8-as-Latin-1 digraphs; the
    //     corpus is clean ASCII so artifacts are SEEDED q87-style
    //     (deterministic per doc_id) to make the counts non-trivial
    Q.df("q143_encoding_artifacts",
      """WITH seeded AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 13 = 0 THEN ' ' || chr(195) || chr(169) ELSE '' END ||
        |    CASE WHEN doc_id % 17 = 0 THEN ' ' || chr(226) || chr(8364) || chr(8482) ELSE '' END ||
        |    CASE WHEN doc_id % 19 = 0 THEN ' ' || chr(65533) ELSE '' END ||
        |    CASE WHEN doc_id % 29 = 0 THEN chr(1) || chr(11) ELSE '' END AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, chr(65533))) AS BIGINT) AS n_replacement,
        |  CAST(len(regexp_extract_all(text,
        |    '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}]')) AS BIGINT) AS n_control,
        |  CAST(len(regexp_extract_all(text, chr(195) || '[\x{0080}-\x{00BF}]')) +
        |       len(regexp_extract_all(text, chr(226) || chr(8364))) AS BIGINT) AS n_mojibake,
        |  (len(regexp_extract_all(text, chr(65533))) = 0 AND
        |   len(regexp_extract_all(text,
        |     '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}]')) = 0 AND
        |   len(regexp_extract_all(text, chr(195) || '[\x{0080}-\x{00BF}]')) +
        |   len(regexp_extract_all(text, chr(226) || chr(8364))) = 0) AS clean
        |FROM seeded ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val seeded = Tables.t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 13 === 0, " \u00C3\u00A9").otherwise(""),
          when(col("doc_id") % 17 === 0, " \u00E2\u20AC\u2122").otherwise(""),
          when(col("doc_id") % 19 === 0, " \uFFFD").otherwise(""),
          when(col("doc_id") % 29 === 0, "\u0001\u000B").otherwise("")).as("text"))
      Q.oracleOrder(
        TextAnalysisOps.encodingArtifacts(seeded, "doc_id", "text"),
        "doc_id")
    },

    // --- Gopher quality rule composite: the named hard-filter set
    //     (word-count / mean-word-length / symbol-ratio / alpha-word /
    //     stopword rules + keep), every rule an exact integer
    //     comparison so the oracle is trivially bit-exact
    Q.df("q141_gopher_rules",
      """WITH toksrc AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    w -> w <> '') AS toks
        |  FROM documents
        |),
        |per AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0)
        |      AS BIGINT) AS n_word_chars,
        |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
        |      AS BIGINT) AS n_alpha_words,
        |    CAST(len(list_filter(toks, w -> w = '#' OR w = '...'))
        |      AS BIGINT) AS n_symbol_words,
        |    CAST(len(list_distinct(list_filter(toks, w -> w IN
        |      ('the','be','to','of','and','that','have','with'))))
        |      AS BIGINT) AS n_stopword_hits
        |  FROM toksrc
        |)
        |SELECT doc_id, n_words, n_word_chars, n_alpha_words,
        |  n_symbol_words, n_stopword_hits,
        |  (n_words >= 50 AND n_words <= 100000 AND n_words > 0
        |   AND 3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
        |   AND 10 * n_symbol_words <= n_words
        |   AND 5 * n_alpha_words >= 4 * n_words
        |   AND n_stopword_hits >= 2) AS keep
        |FROM per ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Q.oracleOrder(
        TextAnalysisOps.gopherRules(Tables.t(s, dir, "documents"),
          "doc_id", "text"),
        "doc_id")
    },

    // --- top-k bigram collocations by PMI (phrase mining / tokenizer
    //     merge candidates): micro-nat quantization before the top-k,
    //     vocabulary-sized count joins, TakeOrdered ranking
    Q.df("q142_pmi_bigrams",
      """WITH toksrc AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    w -> w <> '') AS ts
        |  FROM documents
        |),
        |uni AS (SELECT unnest(ts) AS t FROM toksrc),
        |uc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
        |bgidx AS (
        |  SELECT unnest(range(1, len(ts))) AS i, ts
        |  FROM toksrc WHERE len(ts) >= 2
        |),
        |bi AS (SELECT ts[CAST(i AS INT)] AS x, ts[CAST(i AS INT) + 1] AS y
        |       FROM bgidx),
        |bc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cxy
        |       FROM bi GROUP BY 1, 2 HAVING count(*) >= 5),
        |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uc) AS nu,
        |               (SELECT CAST(count(*) AS BIGINT) FROM bi) AS nb)
        |SELECT bc.x || ' ' || bc.y AS bigram, bc.cxy,
        |  CAST(floor(ln((CAST(cxy AS DOUBLE) / CAST(nb AS DOUBLE)) /
        |    ((CAST(ux.c AS DOUBLE) / CAST(nu AS DOUBLE)) *
        |     (CAST(uy.c AS DOUBLE) / CAST(nu AS DOUBLE))))
        |    * 1000000.0) AS BIGINT) AS pmi_u
        |FROM bc JOIN uc ux ON bc.x = ux.t JOIN uc uy ON bc.y = uy.t
        |CROSS JOIN tot
        |ORDER BY pmi_u DESC, bigram LIMIT 20""".stripMargin) { (s, dir) =>
      TextAnalysisOps.pmiBigrams(Tables.t(s, dir, "documents"),
        "text", k = 20, minCount = 5L)
    },

    // --- per-source unigram KL divergence vs the corpus blend (the
    //     data-mixing drift metric): contributions quantized to
    //     nano-nats per (source, term) BEFORE the sum, so both engines
    //     aggregate exact integers in any order
    Q.df("q140_source_divergence",
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents
        |),
        |tf AS (
        |  SELECT source, t, CAST(count(*) AS BIGINT) AS cst
        |  FROM toks WHERE t <> '' GROUP BY 1, 2
        |),
        |ns AS (SELECT source, CAST(sum(cst) AS BIGINT) AS ns,
        |              CAST(count(*) AS BIGINT) AS n_terms
        |       FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM ns),
        |ct AS (SELECT t, CAST(sum(cst) AS BIGINT) AS ct FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT tf.source,
        |    CAST(floor((CAST(cst AS DOUBLE) / CAST(ns AS DOUBLE)) *
        |      ln((CAST(cst AS DOUBLE) * CAST(n AS DOUBLE)) /
        |         (CAST(ct AS DOUBLE) * CAST(ns AS DOUBLE)))
        |      * 1000000000.0) AS BIGINT) AS contrib_u
        |  FROM tf JOIN ct USING (t) JOIN ns USING (source) CROSS JOIN tot
        |)
        |SELECT ns.source, ns.ns AS n_tokens, ns.n_terms,
        |  CAST(sum(contrib_u) AS BIGINT) AS kl_u
        |FROM contrib JOIN ns USING (source)
        |GROUP BY 1, 2, 3 ORDER BY ns.source""".stripMargin) { (s, dir) =>
      Q.oracleOrder(
        TextAnalysisOps.sourceDivergence(Tables.t(s, dir, "documents"),
          "source", "text"),
        "source")
    },

    // --- char-bigram entropy quality proxy (compression-ratio
    //     stand-in): one native codegen expression, zero shuffle; the
    //     entropy sum accumulates in binary bigram order on both
    //     engines so the floor-quantized micro-nats agree exactly
    Q.df("q139_char_entropy",
      """WITH bg AS (
        |  SELECT doc_id, unnest(range(1, length(text))) AS i, text
        |  FROM documents WHERE length(text) >= 2
        |),
        |b2 AS (SELECT doc_id, substr(text, CAST(i AS INT), 2) AS b FROM bg),
        |cnt AS (SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS c
        |        FROM b2 GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1),
        |ent AS (
        |  SELECT c.doc_id, CAST(t.n AS BIGINT) AS n_bigrams,
        |    CAST(floor(sum((c.c / t.n) * ln(t.n / c.c) ORDER BY c.b)
        |      * 1000000.0) AS BIGINT) AS entropy_u
        |  FROM cnt c JOIN tot t ON c.doc_id = t.doc_id GROUP BY 1, 2
        |)
        |SELECT d.doc_id, COALESCE(e.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(e.entropy_u, 0) AS entropy_u
        |FROM documents d LEFT JOIN ent e ON d.doc_id = e.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      Q.oracleOrder(
        TextAnalysisOps.charEntropy(Tables.t(s, dir, "documents"),
          "doc_id", "text"),
        "doc_id")
    },

    // --- deterministic weighted sampling without replacement
    //     (Efraimidis–Spirakis): top-k by ln(u)/w with a content-hash
    //     uniform and n_chars as the quality weight; key quantized to
    //     the integer grid (q69's idf convention), top-k is
    //     TakeOrderedAndProject — no global sort, no RNG state
    Q.df("q137_weighted_sample",
      """SELECT doc_id, n_chars AS w,
        |  CAST(floor(ln((CAST(('0x' || substring(md5(text || '#wsamp'), 1, 8))
        |        AS UBIGINT) + 1.0) / 4294967296.0)
        |      / CAST(n_chars AS DOUBLE) * 1000000000000.0) AS BIGINT) AS key_u
        |FROM documents WHERE n_chars > 0
        |ORDER BY key_u DESC, doc_id LIMIT 200""".stripMargin) { (s, dir) =>
      TextAnalysisOps.weightedSample(Tables.t(s, dir, "documents"),
        "doc_id", "text", "n_chars", k = 200)
    },

    // --- URL domain blocklist filter (the first gate of a web
    //     pipeline): seeded URLs as in q87 plus a conditional mirror
    //     host, blocked on exact OR subdomain-suffix blocklist match;
    //     Spark side is one broadcast set + a zero-shuffle typed map
    //     over the q87 codegen domain extraction
    Q.df("q138_domain_blocklist",
      """WITH seeded AS (
        |  SELECT doc_id,
        |    text || ' see https://host' || (doc_id % 23) || '.example.com/p/' ||
        |    (doc_id % 5) || ' and www.ref' || (doc_id % 11) || '.org ' ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN 'plus http://a' || (doc_id % 7) || '.mirror.site/q '
        |         ELSE '' END AS text
        |  FROM documents
        |),
        |urls AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(text,
        |      '(https?://|www\.)[A-Za-z0-9.-]+\.[A-Za-z]{2,}(/[A-Za-z0-9._/-]*)?')) AS url
        |  FROM seeded
        |),
        |doms AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(
        |      url, '^https?://', ''), '^www\.', ''), '/.*$', '') AS domain
        |  FROM urls
        |),
        |b(domain) AS (VALUES ('ref1.org'), ('ref4.org'),
        |                     ('host7.example.com'), ('mirror.site')),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_urls,
        |    CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM b
        |          WHERE doms.domain = b.domain
        |             OR doms.domain LIKE '%.' || b.domain)
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
        |  FROM doms GROUP BY 1
        |)
        |SELECT d.doc_id, COALESCE(p.n_urls, 0) AS n_urls,
        |  COALESCE(p.n_blocked, 0) AS n_blocked,
        |  COALESCE(p.n_blocked, 0) > 0 AS blocked
        |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val seeded = Tables.t(s, dir, "documents").selectExpr("doc_id",
        """concat(text, ' see https://host', doc_id % 23, '.example.com/p/',
          |doc_id % 5, ' and www.ref', doc_id % 11, '.org ',
          |CASE WHEN doc_id % 3 = 0
          |     THEN concat('plus http://a', doc_id % 7, '.mirror.site/q ')
          |     ELSE '' END) AS text"""
          .stripMargin.replace("\n", ""))
      Q.oracleOrder(
        TextAnalysisOps.domainBlocklist(seeded, "doc_id", "text",
          Seq("ref1.org", "ref4.org", "host7.example.com", "mirror.site")),
        "doc_id")
    },

    // --- exact-substring decontamination via a broadcast Aho–Corasick
    //     automaton (one linear pass per doc regardless of snippet
    //     count); the oracle runs the equivalent theta-join, which is
    //     exactly the O(snippets × corpus) shape the automaton replaces
    Q.df("q135_substring_decontam",
      """WITH toksrc AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
        |),
        |snip AS (
        |  SELECT DISTINCT array_to_string(list_slice(toks, 1, 6), ' ') AS snippet
        |  FROM toksrc WHERE doc_id % 53 = 0 AND len(toks) >= 6
        |),
        |hits AS (
        |  SELECT d.doc_id, CAST(count(DISTINCT s.snippet) AS BIGINT) AS n_matched
        |  FROM documents d JOIN snip s ON position(s.snippet IN d.text) > 0
        |  WHERE d.doc_id % 53 <> 0 GROUP BY 1
        |)
        |SELECT d.doc_id, COALESCE(h.n_matched, 0) AS n_matched,
        |  COALESCE(h.n_matched, 0) >= 1 AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 53 <> 0
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      val toks = split(trim(col("text")), "\\s+")
      val snippets = docs
        .filter(col("doc_id") % 53 === 0 && size(toks) >= 6)
        .select(concat_ws(" ", slice(toks, 1, 6)).as("snippet"))
      Q.oracleOrder(
        TextAnalysisOps.substringDecontaminate(
          docs.filter("doc_id % 53 != 0"), snippets,
          "doc_id", "text", "snippet"),
        "doc_id")
    }
  )
}
