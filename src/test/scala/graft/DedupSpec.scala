package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Semantics of the dedup operators on known-duplicate fixtures —
  * these pin the behavior of the xxhash64-based ops (MinHash/SimHash)
  * that have no DuckDB oracle in the correctness gate.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val longText =
    "the quick brown fox jumps over the lazy dog and runs far away today"
  private val nearText = // one word changed
    "the quick brown fox jumps over the lazy cat and runs far away today"
  private def docs = Seq(
    (1L, longText, "en"),
    (2L, longText, "en"),            // exact dup of 1
    (3L, nearText, "en"),            // near dup of 1
    (4L, "completely different content about spark sql engines", "en"),
    (5L, "ab", "en")                 // shorter than any shingle
  ).toDF("doc_id", "text", "lang")

  /** [[docs]] plus the tokenization edge cases where Java's
    * trim/split would diverge from Spark's (space-only trim, empties
    * kept by split limit -1) — used by the fast-path bit-identity
    * tests so the typed walks stay pinned to the expression semantics
    * on real-corpus shapes, not just clean prose.
    */
  private def edgeDocs = docs.union(Seq(
    (6L, "alpha beta gamma\n", "en"),       // trailing newline
    (7L, "\talpha beta gamma", "en"),       // leading tab
    (8L, " alpha  beta   gamma ", "en"),    // extra spaces
    (9L, "", "en"),                         // empty text
    (10L, null.asInstanceOf[String], "en")  // NULL text
  ).toDF("doc_id", "text", "lang"))

  test("exactDupGroups groups identical texts, keeps min id") {
    val rows = DedupOps.exactDupGroups(docs, "doc_id", "text")
      .filter($"n_copies" > 1).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("keep_id") === 1L)
    assert(rows.head.getAs[Long]("n_copies") === 2L)
  }

  test("dedupKeepFirst drops later exact copies only") {
    val kept = DedupOps.dedupKeepFirst(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L, 4L, 5L))
  }

  test("dedupKeepBest keeps the copy preferred by prefCols, not min id") {
    val d = Seq(
      (1L, "same text here", "web"),
      (2L, "same text here", "books"),   // preferred source, higher id
      (3L, "same text here", "web"),
      (4L, "unique text entirely", "web")
    ).toDF("doc_id", "text", "source")
    val kept = DedupOps.dedupKeepBest(d, "doc_id", "text", Seq("source"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 4L)) // "books" < "web"; id only tiebreaks
    // tiebreak on id within the same preference value
    val d2 = Seq((7L, "x y z", "a"), (5L, "x y z", "a")).toDF("doc_id", "text", "source")
    val kept2 = DedupOps.dedupKeepBest(d2, "doc_id", "text", Seq("source"))
      .select("doc_id").as[Long].collect()
    assert(kept2 === Array(5L))
  }

  test("wordShingles yields empty set for texts shorter than n tokens") {
    val out = Seq("one two", "one two three four").toDF("t")
      .select(size(DedupOps.wordShingles($"t", 3)).as("n")).as[Int].collect()
    assert(out === Array(0, 2))
  }

  test("charShingles yields empty set for texts shorter than n chars") {
    val out = Seq("ab", "abcd").toDF("t")
      .select(size(DedupOps.charShingles($"t", 3)).as("n")).as[Int].collect()
    assert(out === Array(0, 2))
  }

  test("minhashLshPairs finds exact and near dups, jaccard ordered") {
    val pairs = DedupOps.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) === 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("minhashLshPairsWithBase: base IS the shingle source (r18 q43 reuse)") {
    // the exposed signature base must carry bit-identical shingle sets
    // to a standalone shingleRows pass — q43's far-pair gate reads its
    // shingles from the base instead of running a third text pass
    val (managed, base) = DedupOps.minhashLshPairsWithBase(edgeDocs, "doc_id", "text")
    val fromBase = base.select("doc_id", "shingles").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    val standalone = DedupOps.shingleRows(edgeDocs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    assert(fromBase.toSeq === standalone.toSeq)
    // and the pairs frame still answers (same plan as the unmanaged path)
    assert(managed.df.filter($"jaccard" >= 0.5).count() >= 1)
    managed.unpersist()
  }

  test("hashFanout minWidth widens narrow inputs, never exceeds cores") {
    val narrow = docs // in-memory 1-partition-ish local relation
    val fanned = graft.Q.hashFanout(
      narrow.select($"doc_id", $"text"), "doc_id",
      minWidth = spark.sparkContext.defaultParallelism)
    assert(fanned.rdd.getNumPartitions >= math.min(8,
      spark.sparkContext.defaultParallelism))
    assert(fanned.rdd.getNumPartitions <=
      math.max(8, spark.sparkContext.defaultParallelism))
    // identical rows, only the layout changes
    assert(fanned.count() === narrow.count())
  }

  test("portableMinhashPairs finds the same dup structure as the product path") {
    val pairs = DedupOps.portableMinhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) === 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("typed portable-minhash fast path is bit-identical to the expression pipeline") {
    val a = DedupOps.portableSignatureExpr(edgeDocs, "doc_id", "text", 3, 8)
      .orderBy("doc_id").collect()
    val b = DedupOps.portableSignatureRows(edgeDocs, "doc_id", "text", 3, 8)
      .orderBy("doc_id").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) === y.getLong(0))
      assert(x.getSeq[String](1) === y.getSeq[String](1))
      assert(x.getSeq[Long](2) === y.getSeq[Long](2))
    }
  }

  test("typed portable-simhash fast path is bit-identical to the expression fold") {
    val a = DedupOps.portableSimhashExpr(edgeDocs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = DedupOps.portableSimhashRows(edgeDocs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a === b)
  }

  test("portableSimhashPeers: identical docs share simhash32 and count each other") {
    val got = DedupOps.portableSimhashPeers(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L)._1 === got(2L)._1) // identical text, identical hash
    assert(got(1L)._2 >= 1L && got(2L)._2 >= 1L) // they share all chunks
  }

  test("simhash64 is identical for identical text, near for near-dup") {
    val m = DedupOps.simhashWithPeers(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L)._1 === m(2L)._1)            // exact dup -> same simhash
    assert(m(1L)._2 >= 1L && m(2L)._2 >= 1L) // they see each other as peers
    val hamming = java.lang.Long.bitCount(m(1L)._1 ^ m(3L)._1)
    assert(hamming <= 16, s"near-dup hamming $hamming")
  }

  test("ngramJaccardPairs: identical docs score 1.0 within block") {
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", "lang", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs((1L, 3L)) > 0.7)
    assert(pairs((1L, 4L)) < 0.3)
  }

  test("skew guard drops over-full buckets under a fixed drop policy") {
    // 200 identical docs: bucket size 200 > cap 64 -> no pairs
    val many = (1L to 200L).map(i => (i, longText)).toDF("doc_id", "text")
    val n = DedupOps.minhashLshPairs(many, "doc_id", "text",
      cap = DedupOps.CapPolicy.Fixed(64)).count()
    assert(n === 0L)
  }

  test("adaptive cap with sampling keeps recall on hot buckets (the default)") {
    // Same 200 identical docs: the drop policy above zeroes recall; the
    // default Adaptive policy thins the hot band buckets to ~cap members
    // and still emits duplicate pairs — a 10x corpus cannot silently
    // lose the signal (round-5 verdict finding #3).
    val many = (1L to 200L).map(i => (i, longText)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashLshPairs(many, "doc_id", "text")
    val n = pairs.count()
    assert(n > 0L, "sampling policy must keep some duplicate pairs")
    // thinned to ~cap members per bucket: far below the quadratic 19900
    assert(n < 10000L, s"thinning must bound the pair count, got $n")
    // every surviving pair is a true duplicate
    assert(pairs.filter($"jaccard" < 1.0).count() === 0L)

    // simhash path: 200 identical docs all land in the same 4 chunk
    // buckets; sampling keeps a bounded peer signal instead of zero
    val m = DedupOps.simhashWithPeers(many, "doc_id", "text",
      cap = DedupOps.CapPolicy.Adaptive(factor = 8.0, floor = 16))
      .agg(org.apache.spark.sql.functions.sum($"n_chunk_peers")).head.getLong(0)
    assert(m > 0L, "adaptive simhash cap must keep some peers")
  }

  test("portableSimhashCapReport surfaces dropped-bucket mass") {
    val many = (1L to 100L).map(i => (i, longText)).toDF("doc_id", "text")
    val rep = DedupOps.portableSimhashCapReport(many, "doc_id", "text", maxBucket = 64)
      .collect()
    assert(rep.length === 4) // one row per chunk index
    // all 100 identical docs share each chunk bucket: every chunk
    // reports one over-cap bucket of 100 rows
    rep.foreach { r =>
      assert(r.getAs[Long]("overcap_buckets") === 1L)
      assert(r.getAs[Long]("dropped_rows") === 100L)
    }
  }

  test("typed minhash fast path is bit-identical to the expression pipeline") {
    val exprSide = edgeDocs
      .select($"doc_id",
        DedupOps.wordShingles($"text", 3).as("shingles"))
      .filter(size($"shingles") > 0)
      .withColumn("sig", DedupOps.minhashSignature($"shingles", 16))
      .select("doc_id", "shingles", "sig")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[Long](2))).toSet
    val typedSide = DedupOps.signatureRows(edgeDocs, "doc_id", "text", 3, 16)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[Long](2))).toSet
    assert(typedSide === exprSide)
  }

  test("typed simhash fast path is bit-identical to the expression fold") {
    val exprSide = edgeDocs
      .select($"doc_id", DedupOps.simhash64($"text").as("simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val typedSide = DedupOps.simhashRows(edgeDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(typedSide === exprSide)
  }

  test("overCapBuckets reports the dropped buckets and their sizes") {
    val rows = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4)).toDF("k", "v")
    val dropped = DedupOps.overCapBuckets(rows, Seq("k"), maxBucket = 2).collect()
    assert(dropped.length === 1)
    assert(dropped.head.getString(0) === "a")
    assert(dropped.head.getAs[Long]("bucket_n") === 3L)
    // capBuckets keeps exactly the complement
    val kept = DedupOps.capBuckets(rows, Seq("k"), maxBucket = 2)
      .select("k").as[String].collect().toSet
    assert(kept === Set("b"))
  }

  test("fuzzyJoin blocks, length-bands, and verifies with exact edit distance") {
    val rows = Seq(
      (1L, "blue bolt", "A"), (2L, "blue bolts", "A"), (3L, "red widget", "A"),
      (4L, "blue bolt", "B"), // same string, different block -> no pair
      (5L, "bolt blue extremely long name", "A")) // length band prunes
      .toDF("id", "name", "brand")
    val got = DedupOps.fuzzyJoin(rows, "id", "name", "brand", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 1L)))
    // over-cap blocks THIN to a deterministic sample (never drop
    // outright — a fixed-cardinality block key would zero the result
    // at some scale otherwise): output stays a subset of the uncapped
    // pairs, and a within-cap block is untouched
    val thinned = DedupOps.fuzzyJoin(rows, "id", "name", "brand",
      maxDist = 2, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(thinned.subsetOf(got.toSet))
    val untouched = DedupOps.fuzzyJoin(rows, "id", "name", "brand",
      maxDist = 2, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(untouched.toSeq === Seq((1L, 2L, 1L)))
    // oracle-parity mode: instead of thinning, an over-cap block fails
    // loudly at execution time with the block named in the message
    val err = intercept[Exception] {
      DedupOps.fuzzyJoin(rows, "id", "name", "brand",
        maxDist = 2, maxBucket = 3, overCapIsError = true).collect()
    }
    assert(err.getMessage.contains("thinning cap"), err.getMessage)
    val ok = DedupOps.fuzzyJoin(rows, "id", "name", "brand",
      maxDist = 2, maxBucket = 4, overCapIsError = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ok.toSeq === Seq((1L, 2L, 1L)))
  }

  test("crossCorpusMinhashPairs finds only cross-corpus near-dups") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about spark physical plans here"),
      (3L, "the quick brown fox jumps over the lazy dog tonight")) // dup of 1
      .toDF("doc_id", "text")
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "held out benchmark prose sharing nothing with training"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.crossCorpusMinhashPairs(train, eval, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // both train copies hit eval doc 100 at jaccard 1.0; train-train
    // duplication (1,3) must NOT surface; unrelated docs pair with nothing
    assert(pairs.toSet === Set((1L, 100L, 1.0), (3L, 100L, 1.0)))
  }

  test("dupClusters resolves transitive chains to the min-id representative") {
    // 1-2, 2-3, 3-4 form one chain (1 and 4 are NOT directly paired);
    // 10-11 a separate component; 20-21-22 a triangle
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = DedupOps.dupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L)))
  }

  test("dupClusters converges on a long path (pointer jumping)") {
    // a 12-vertex path: plain per-round neighbor-min alone would need
    // 11 rounds; with pointer jumping the fixpoint arrives much
    // earlier — assert correctness under a tight iteration cap.
    // smallGraphMaxPairs = 0 forces the DISTRIBUTED propagation path
    // (the adaptive driver union-find would otherwise absorb every
    // test-sized graph)
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = DedupOps.dupClusters(pairs, maxIters = 6, smallGraphMaxPairs = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === (1L to 12L).map(i => (i, 1L, 12L)).toSet)
  }

  test("dupClusters small-graph collect keeps src/dst pairing across partitions") {
    // r19: the union-find path collects both endpoint columns in ONE
    // job as per-partition primitive chunk pairs — a mis-ordered
    // concatenation would mispair src[i]/dst[i] and merge the wrong
    // components. Spread the edges over many partitions and assert
    // the clustering is still the exact transitive closure.
    val pairs = Seq(
      (1L, 2L), (2L, 3L),           // chain, min=1
      (10L, 11L),                   // pair
      (20L, 21L), (21L, 22L), (20L, 22L)) // triangle
      .toDF("doc_a", "doc_b").repartition(5)
    val got = DedupOps.dupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L)))
  }

  test("dupClusters: driver union-find and distributed propagation agree") {
    // adversarial mix: chain, triangle, star with min-id center last,
    // reverse-ordered pairs, duplicate edges
    val pairs = Seq(
      (5L, 9L), (9L, 2L), (2L, 5L), // triangle, min=2
      (7L, 8L), (8L, 7L),           // dup edges both directions
      (30L, 3L), (31L, 3L), (32L, 3L), // star centered on min
      (40L, 41L), (41L, 42L), (42L, 43L), (43L, 44L)) // chain
      .toDF("doc_a", "doc_b")
    val small = DedupOps.dupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = DedupOps.dupClusters(pairs, smallGraphMaxPairs = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(small === dist)
    assert(small === Set(
      (2L, 2L, 3L), (5L, 2L, 3L), (9L, 2L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L),
      (3L, 3L, 4L), (30L, 3L, 4L), (31L, 3L, 4L), (32L, 3L, 4L),
      (40L, 40L, 5L), (41L, 40L, 5L), (42L, 40L, 5L), (43L, 40L, 5L),
      (44L, 40L, 5L)))
  }
}
