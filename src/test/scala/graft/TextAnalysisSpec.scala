package graft

import graft.operators.TextAnalysisOps
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("countOccurrences counts non-overlapping literal hits") {
    val n = Seq("a the b the c").toDF("t")
      .select(TextAnalysisOps.countOccurrences($"t", " the ").as("n"))
      .as[Long].head()
    assert(n === 2L)
  }

  test("langId picks the language with the most marker hits") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "der hund und die katze und das haus"),
      (3L, "xyzzy plugh"),
      (4L, "你好世界这是一段真正的中文文本") // real (unsegmented) Chinese
    ).toDF("doc_id", "text")
    val m = TextAnalysisOps.langId(df, "doc_id", "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(m(1L) === "en")
    assert(m(2L) === "de")
    assert(m(3L) === "und") // no markers -> undetermined
    assert(m(4L) === "zh")  // CJK chars, no space-delimited markers
  }

  test("qualityScore computes exact counts and ratios") {
    val r = TextAnalysisOps.qualityScore(Seq((1L, "ab cd!")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_chars") === 6L)
    assert(r.getAs[Long]("n_tokens") === 2L)
    assert(r.getAs[Double]("chars_per_token") === 3.0)
    val ar = r.getAs[Double]("alpha_ratio")
    assert(ar > 0.66 && ar < 0.67) // 4 alpha chars / 6 chars
  }

  test("tokenStats: ws vs bpe-ish vs estimate") {
    val r = TextAnalysisOps.tokenStats(Seq((1L, "hello, world! ok")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(r.getAs[Long]("ws_tokens") === 3L)
    assert(r.getAs[Long]("bpeish_tokens") === 5L) // hello , world ! ok
    assert(r.getAs[Long]("est_tokens") === 4L)    // ceil(16/4)
  }

  test("fingerprint matches the hand-computed rolling hash") {
    // h("ab") = (0*31+97)*31 + 98 = 3105
    val fp = TextAnalysisOps.fingerprints(Seq((1L, "ab")).toDF("doc_id", "text"),
      "doc_id", "text").select("fp").as[Long].head()
    assert(fp === 3105L)
  }

  test("stratifiedSample keeps per-stratum rates, deterministically") {
    val docs = (1L to 200L).map(i => (i, s"document number $i", if (i <= 100) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val kept = TextAnalysisOps.stratifiedSample(docs, "text", "lang",
      Map("en" -> 100, "de" -> 0), defaultPct = 50)
      .select("lang").as[String].collect()
    assert(kept.count(_ == "en") === 100) // 100% of en kept
    assert(!kept.contains("de"))          // 0% of de kept
    // repeatable: same input, same sample
    val again = TextAnalysisOps.stratifiedSample(docs, "text", "lang",
      Map("en" -> 100, "de" -> 0), defaultPct = 50).count()
    assert(again === 100L)
  }

  test("topNgrams counts multiplicity and breaks ties lexicographically") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b x y")).toDF("doc_id", "text")
    // bigrams: doc1: "a b","b a","a b","b c"; doc2: "a b","b x","x y"
    val got = TextAnalysisOps.topNgrams(docs, "text", 2, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("typed gramRows matches explode(wordGramsAll) gram-for-gram") {
    val docs = Seq((1L, "a b a b c"), (2L, "one two"), (3L, "solo"),
      (4L, " padded  text \n"), (5L, ""), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val exprSide = docs
      .select(explode(TextAnalysisOps.wordGramsAll($"text", 2)).as("gram"))
      .collect().map(_.getString(0)).sorted.toSeq
    val typedSide = TextAnalysisOps.gramRows(docs, "text", 2)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(typedSide === exprSide)
  }

  test("corpusStats: exact median at high accuracy, HLL within bound and repartition-stable") {
    val docs = (1L to 400L).map { i =>
      val v = (i * 2654435761L) % 997L // pseudo-random values, dups included
      (i, if (i % 2 == 0) "a" else "b", v)
    }.toDF("doc_id", "lang", "n_chars")
    val got = TextAnalysisOps.corpusStats(docs, "lang", "n_chars")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    got.foreach { case (lang, (med, nd, hll)) =>
      // HLL++ estimate within its default ~5% rsd of the exact count
      assert(math.abs(hll - nd).toDouble / nd < 0.15, s"$lang hll=$hll exact=$nd")
      // the sketch median must be an actual data value (discrete)
      val vals = docs.filter($"lang" === lang).select("n_chars").as[Long].collect()
      assert(vals.contains(med))
    }
    // determinism: a different partitioning must give identical output
    val repart = TextAnalysisOps.corpusStats(docs.repartition(13), "lang", "n_chars")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(repart === got)
  }

  test("trainSplit: content-keyed, duplicate docs share a split, boundaries hold") {
    // md5("hello") = 5d41402a… → 0x5d41402a = 1564557354 → bucket 54 → train
    val docs = Seq((1L, "hello"), (2L, "hello"), (3L, "different doc"))
      .toDF("doc_id", "text")
    val got = TextAnalysisOps.trainSplit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("bucket"), r.getAs[String]("split"))).toMap
    assert(got(1L) === ((54L, "train")))
    assert(got(1L) === got(2L)) // byte-equal docs can never cross splits
    got.values.foreach { case (b, s) =>
      val expected = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s === expected)
    }
  }

  test("contaminationCheck flags train docs sharing n-grams with the eval set") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),  // contains eval 5-gram
      (2L, "totally different words here now ok"),
      (3L, "short")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val got = TextAnalysisOps.contaminationCheck(train, eval_, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L) === ((1L, true)))
    assert(got(2L) === ((0L, false)))
    assert(got(3L) === ((0L, false))) // shorter than n: zero grams, clean
  }

  test("repetitionScore: boilerplate scores high, varied text low, short text zero") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),  // 4 trigrams, all identical
      (2L, "one two three four five six"),    // 4 distinct trigrams
      (3L, "tiny doc")).toDF("doc_id", "text")
    val got = TextAnalysisOps.repetitionScore(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 4L, 1.0)))
    assert(got(2L) === ((4L, 1L, 0.25)))
    assert(got(3L) === ((0L, 0L, 0.0)))
  }

  test("piiScrub redacts emails and IPv4s and counts them") {
    val docs = Seq(
      (1L, "mail me at a.b+c@ex-ample.org or 192.168.0.1 thanks"),
      (2L, "no pii here, just 1.2 version numbers")).toDF("doc_id", "text")
    val got = TextAnalysisOps.piiScrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((1L, 1L, "mail me at <EMAIL> or <IP> thanks")))
    assert(got(2L) === ((0L, 0L, "no pii here, just 1.2 version numbers")))
  }

  test("tfidfTopTerms ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common zebra common common"),
      (2L, "common apple"),
      (3L, "common banana banana")).toDF("doc_id", "text")
    val got = TextAnalysisOps.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(4)))).toMap
    // "common" appears in all 3 docs -> idf_u = floor(ln(1)*1e6) = 0,
    // so the doc-unique term wins every doc despite lower tf
    val idf1 = math.floor(math.log(3.0) * 1000000).toLong // df=1 terms
    assert(got(1L) === (("zebra", 1L, idf1)))
    assert(got(2L) === (("apple", 1L, idf1)))
    assert(got(3L) === (("banana", 2L, 2 * idf1)))
  }

  test("chunkTokens windows with stride, keeping short tails") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val got = TextAnalysisOps.chunkTokens(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, "a b c d", 4L), (1L, "d e f g", 4L), (2L, "g h i j", 4L),
      (3L, "j", 1L)))
  }

  test("packSequences assigns the bin of the doc's first token, per shard") {
    val docs = Seq(
      (1L, ("a " * 300).trim, "en"), (2L, ("b " * 300).trim, "en"),
      (3L, ("c " * 100).trim, "en"), (4L, ("d " * 600).trim, "de"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysisOps.packSequences(docs, "doc_id", "text", "lang", budget = 512L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // en stream: offsets 0, 300, 600 -> packs 0, 0, 1; de restarts at 0
    assert(got(1L) === (("en", 300L, 0L, 0L)))
    assert(got(2L) === (("en", 300L, 300L, 0L)))
    assert(got(3L) === (("en", 100L, 600L, 1L)))
    assert(got(4L) === (("de", 600L, 0L, 0L)))
  }

  test("mixtureSample: exact per-group targets, epoch repeats, determinism") {
    // skewed corpus: 'big' 8 docs, 'small' 2 docs; alpha=0.5 targets
    // (total 10): sqrt weights 2.828/1.414, sw=4.243 ->
    // big floor(10*2.828/4.243)=6 (downsample), small
    // floor(10*1.414/4.243)=3 (upsample: one full epoch + 1 repeat)
    val docs = ((1L to 8L).map(i => (i, "big")) ++ Seq((100L, "small"), (101L, "small")))
      .toDF("doc_id", "lang")
    val got = TextAnalysisOps.mixtureSample(docs, "doc_id", "lang", alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = got.groupBy(_._2)
    assert(byLang("big").length === 6)
    assert(byLang("small").length === 3)
    // big is a subset (no repeats) of distinct ids; small repeats one
    assert(byLang("big").forall(_._3 == 0L))
    assert(byLang("small").count(_._3 == 0L) === 2)
    assert(byLang("small").count(_._3 == 1L) === 1)
    // deterministic: second run identical
    val again = TextAnalysisOps.mixtureSample(docs, "doc_id", "lang", alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sorted.toSeq === again.sorted.toSeq)
    // alpha=1 is proportional: targets = counts exactly, zero repeats
    val prop = TextAnalysisOps.mixtureSample(docs, "doc_id", "lang", alpha = 1.0)
      .collect()
    assert(prop.length === 10 && prop.forall(_.getLong(2) == 0L))
  }

  test("urlDomainStats strips scheme/www/path and counts docs vs mentions") {
    val docs = Seq(
      (1L, "see https://www.example.com/a/b and http://example.com/c"),
      (2L, "also www.example.com plus https://other.org/x?y"),
      (3L, "no urls, just example dot com prose")).toDF("doc_id", "text")
    val got = TextAnalysisOps.urlDomainStats(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // example.com: 3 mentions across docs 1+2; other.org: 1 mention
    assert(got("example.com") === ((3L, 2L)))
    assert(got("other.org") === ((1L, 1L)))
    assert(got.size === 2)
  }

  test("bm25Rank ranks by tf, idf, and length normalization") {
    val docs = Seq(
      // doc 1: both query terms, short -> top
      (1L, "spark join engine"),
      // doc 2: same matched tf as doc 1 but much longer -> dl
      // normalization must rank it BELOW doc 1
      (2L, "spark join one two three four five six seven eight nine ten"),
      // doc 3: only the common term, repeated
      (3L, "spark spark spark"),
      // doc 4: no query terms
      (4L, "completely unrelated prose"),
      // docs 5-8: make 'join' rarer than 'spark' (idf differs)
      (5L, "spark runtime notes"), (6L, "spark shuffle study"),
      (7L, "spark memory model"), (8L, "spark catalyst rules"))
      .toDF("doc_id", "text")
    val got = TextAnalysisOps.bm25Rank(docs, "doc_id", "text",
      Seq("spark", "join"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 4 never appears; docs 1 and 2 match both terms
    assert(!got.exists(_._1 == 4L))
    assert(got.filter(t => t._1 == 1L || t._1 == 2L).forall(_._3 == 2L))
    val score = got.map(t => t._1 -> t._2).toMap
    // two matched terms beat one
    assert(score(1L) > score(3L))
    // same matched tf, shorter doc wins (b-normalization)
    assert(score(1L) > score(2L))
    // scores are positive micro-units and the list is rank-ordered
    assert(got.forall(_._2 > 0L))
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("bloomDecontaminate matches exact contaminationCheck output") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different words here now ok"),
      (3L, "short"),
      (4L, "alpha beta gamma delta trailing words and alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "zeta eta theta iota")).toDF("doc_id", "text")
    val exact = TextAnalysisOps.contaminationCheck(train, eval_, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val bloom = TextAnalysisOps.bloomDecontaminate(train, eval_, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(bloom === exact)
    // distinct-gram counting: doc 4 repeats "alpha beta gamma delta" but
    // the overlap counts it once
    assert(bloom(4L)._1 === 1L)
  }

  test("dupGramFraction scores cross-document boilerplate, not within-doc repeats") {
    val docs = Seq(
      (1L, "shared boiler plate text one"),   // grams shared with doc 2
      (2L, "shared boiler plate text two"),
      (3L, "entirely unique document words here"),
      (4L, "tiny"),                            // shorter than n: zero grams
      (5L, "echo echo echo echo")              // within-doc repeat only
    ).toDF("doc_id", "text")
    val got = TextAnalysisOps.dupGramFraction(docs, "doc_id", "text", n = 3, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // docs 1/2 share "shared boiler plate"/"boiler plate text": 2 of 3 grams dup'd
    assert(got(1L) === ((3L, 2L, 2.0 / 3.0)))
    assert(got(2L) === ((3L, 2L, 2.0 / 3.0)))
    assert(got(3L) === ((3L, 0L, 0.0)))
    assert(got(4L) === ((0L, 0L, 0.0)))
    // doc 5's "echo echo echo" is distinct-per-doc so df stays 1
    assert(got(5L) === ((1L, 0L, 0.0)))
  }

  test("AhoCorasick counts distinct patterns with overlaps and fail links") {
    val ac = graft.operators.AhoCorasick.build(
      Seq("he", "she", "his", "hers", "she")) // dup collapses
    assert(ac.patternCount === 4)
    // "ushers": she, he, hers all end inside it; his does not
    assert(ac.distinctMatches("ushers") === 3)
    assert(ac.distinctMatches("his") === 1)
    assert(ac.distinctMatches("xyz") === 0)
    assert(ac.distinctMatches("") === 0)
    assert(ac.distinctMatches(null) === 0)
    // repeated occurrences count once
    assert(ac.distinctMatches("he he he") === 1)
    val empty = graft.operators.AhoCorasick.build(Seq.empty)
    assert(empty.distinctMatches("anything") === 0)
  }

  test("trainingOrder: deterministic, shard-partitioned, contiguous positions") {
    val docs = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = TextAnalysisOps.trainingOrder(docs, "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // repartitioned input yields the identical assignment
    val b = TextAnalysisOps.trainingOrder(docs.repartition(13), "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
    // every doc appears once; shards in range; positions contiguous 1..n
    assert(a.map(_._1).distinct.length === 500)
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // the order is hash-scrambled, not id order (astronomically unlikely
    // to be sorted by id within any 60+-element shard by chance)
    assert(a.groupBy(_._2).exists { case (_, rows) =>
      val byPos = rows.sortBy(_._3).map(_._1).toSeq
      byPos != byPos.sorted
    })
  }

  test("vocabOverlap: hand-computed Jaccard per source pair, zero-overlap pairs absent") {
    val docs = Seq(
      (1L, "x y z", "a"),     // V_a = {x, y, z}
      (2L, "x y w", "b"),     // V_b = {x, y, w}  |a∩b|=2 |a∪b|=4
      (3L, "q r", "c")        // V_c disjoint from both
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysisOps.vocabOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", "b")) === ((2L, 4L,
      math.floor(2.0 / 4.0 * 1e6).toLong)))
    // disjoint pairs are absent, not zero rows
    assert(got.size === 1)
  }

  test("encodingArtifacts: replacement/control/mojibake counts, clean flag") {
    val docs = Seq(
      (1L, "perfectly clean ascii text"),
      (2L, "bad \uFFFD twice \uFFFD here"),
      (3L, "ctrl\u0001and\u000Bbut tabs\tand\nnewlines are fine"),
      (4L, "latin1 moji \u00C3\u00A9 and \u00C3\u00A8"),
      (5L, "cp1252 moji \u00E2\u20AC\u2122 quote"),
      (6L, "\u00C3X not a continuation"),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysisOps.encodingArtifacts(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) === ((0L, 0L, 0L, true)))
    assert(got(2L) === ((2L, 0L, 0L, false)))
    assert(got(3L) === ((0L, 2L, 0L, false)))
    assert(got(4L) === ((0L, 0L, 2L, false)))
    assert(got(5L) === ((0L, 0L, 1L, false)))
    assert(got(6L) === ((0L, 0L, 0L, true)))
    assert(got(7L) === ((0L, 0L, 0L, true)))
  }

  test("gopherRules: exact integer rule set and keep decision") {
    val good = ("the and that have with " * 12).trim // 60 words, mean len 3.4
    val docs = Seq(
      (1L, good),
      (2L, "tiny doc"),                               // word-count rule
      (3L, ("# " * 60).trim + " the of"),             // symbol rule
      (4L, ("1 2 3 4 " * 15).trim)                    // alpha + stopword rules
    ).toDF("doc_id", "text")
    val got = TextAnalysisOps.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    // doc 1: 60 words, 12*(3+3+4+4+4)=216 chars, all alpha, 5 stop hits
    assert(got(1L) === ((60L, 216L, 60L, 0L, 5L, true)))
    assert(got(2L)._6 === false && got(2L)._1 === 2L)
    assert(got(3L)._6 === false && got(3L)._4 === 60L) // symbols counted
    assert(got(4L)._6 === false && got(4L)._3 === 0L)  // no alpha words
  }

  test("boilerplateLines: shared lines strip, order/spelling kept, both paths agree") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha one\nSHARED BANNER\nbody 1"),
      (2L, "SHARED BANNER\n\n  beta two  "),
      (3L, "gamma\nSHARED BANNER \nRARE"), // trailing space trims to the banner
      (4L, "delta\nRARE"), // RARE in only 2 docs -> kept
      (5L, "")).toDF("doc_id", "text")
    val small = graft.operators.TextAnalysisOps
      .boilerplateLines(docs, "doc_id", "text")
    val big = graft.operators.TextAnalysisOps
      .boilerplateLines(docs, "doc_id", "text", maxBroadcast = 0)
    for ((df, label) <- Seq((small, "broadcast"), (big, "join"))) {
      val m = df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
      assert(m(1L) === ((3L, 1L, "alpha one\nbody 1", 333333L)), label)
      assert(m(2L) === ((2L, 1L, "\n  beta two  ", 500000L)), label)
      assert(m(3L) === ((3L, 1L, "gamma\nRARE", 333333L)), label)
      assert(m(4L) === ((2L, 0L, "delta\nRARE", 0L)), label)
      assert(m(5L) === ((0L, 0L, "", 0L)), label)
    }
  }

  test("scriptProfile: hand-computed counts, alphabetical tie-break, none case") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello Мир 你好 123"),
      (2L, ""),
      (3L, "ΑΒΓ αβγ"),
      (4L, "한글 텍스트"),
      (5L, "abc абв") // latin 3 vs cyrillic 3: alphabetical tie-break
    ).toDF("doc_id", "text")
    val m = graft.operators.TextAnalysisOps
      .scriptProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def row(id: Long) = {
      val r = m(id)
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8), r.getString(9), r.getLong(10))
    }
    assert(row(1L) === ((0L, 2L, 3L, 0L, 0L, 5L, 3L, 16L, "latin", 3L)))
    assert(row(2L) === ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, "none", 0L)))
    assert(row(3L) === ((0L, 0L, 0L, 6L, 0L, 0L, 0L, 7L, "greek", 1L)))
    assert(row(4L) === ((0L, 0L, 0L, 0L, 5L, 0L, 0L, 6L, "hangul", 1L)))
    assert(row(5L) === ((0L, 0L, 3L, 0L, 0L, 3L, 0L, 7L, "cyrillic", 2L)))
  }

  test("zipfAlpha: ideal Zipf fits alpha ~ 1, degenerate sources drop") {
    import spark.implicits._
    // source a: freqs 12/6/4 = 12 * r^-1 — exact Zipf, slope -1
    val words = Seq.fill(12)("x") ++ Seq.fill(6)("y") ++ Seq.fill(4)("z")
    val docs = Seq(
      ("a", words.mkString(" ")),
      ("b", "lonely") // one distinct term: fit undefined, dropped
    ).toDF("source", "text")
    val rows = graft.operators.TextAnalysisOps
      .zipfAlpha(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq("a"))
    val (_, n, alphaU) = rows.head
    assert(n === 3L)
    // micro-quantization of the ln contributions perturbs the exact
    // -1 slope by < 1e-2
    assert(alphaU >= 990000L && alphaU <= 1010000L, alphaU.toString)
  }

  test("pmiBigrams: hand-computed PMI, min-count floor, tie order") {
    // 6 docs of "p q r s": bigrams pq/qr/rs x6 each, unigrams x6 each
    // NU = 24, NB = 18 -> identical PMI for all three pairs
    val docs = (1L to 6L).map(i => (i, "p q r s")).toDF("doc_id", "text")
    val exp = math.floor(math.log((6.0 / 18.0) /
      ((6.0 / 24.0) * (6.0 / 24.0))) * 1e6).toLong
    val got = TextAnalysisOps.pmiBigrams(docs, "text", k = 2, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("p q", 6L, exp), ("q r", 6L, exp)))
    // raising the floor above the counts empties the result
    assert(TextAnalysisOps.pmiBigrams(docs, "text", k = 5, minCount = 7L)
      .count() === 0L)
  }

  test("sourceDivergence: zero KL for identical mixes, hand-computed skew") {
    // identical unigram distributions -> every contribution is ln(1) = 0
    val same = Seq((1L, "x y", "a"), (2L, "x y", "b"))
      .toDF("doc_id", "text", "source")
    val g0 = TextAnalysisOps.sourceDivergence(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(g0 === Map("a" -> 0L, "b" -> 0L))
    // skewed: A = {x:2, y:1}, B = {x:1, y:2}, N = 6, ct = {x:3, y:3}
    val skew = Seq((1L, "x x y", "a"), (2L, "x y y", "b"))
      .toDF("doc_id", "text", "source")
    val expA =
      math.floor((2.0 / 3.0) * math.log((2.0 * 6.0) / (3.0 * 3.0)) * 1e9).toLong +
        math.floor((1.0 / 3.0) * math.log((1.0 * 6.0) / (3.0 * 3.0)) * 1e9).toLong
    val got = TextAnalysisOps.sourceDivergence(skew, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") === ((3L, 2L, expA)))
    assert(got("b") === ((3L, 2L, expA))) // symmetric mix -> same KL
    assert(expA > 0L) // divergent mixes score positive
  }

  test("weightedSample is deterministic, weight-monotone in expectation, excludes w<=0") {
    val docs = (1L to 400L).map(i =>
      (i, s"document body number $i", if (i <= 200) 1L else 100L)) ++
      Seq((401L, "zero weight", 0L), (402L, "negative weight", -5L))
    val df = docs.toDF("doc_id", "text", "n_chars")
    val got = TextAnalysisOps.weightedSample(df, "doc_id", "text", "n_chars", k = 100)
      .collect()
    assert(got.length === 100)
    // non-positive weights never sampled
    assert(!got.exists(r => r.getLong(0) >= 401L))
    // w=100 docs dominate a w=1 population of equal size (probability of
    // this failing by chance is astronomically small — and the draw is
    // deterministic, so this is a fixed fact about the fixture)
    val heavy = got.count(_.getLong(1) == 100L)
    assert(heavy > 80, s"expected heavy-weight docs to dominate, got $heavy/100")
    // determinism: identical re-run
    val again = TextAnalysisOps.weightedSample(df, "doc_id", "text", "n_chars", k = 100)
      .collect().map(_.getLong(0)).toSeq
    assert(again === got.map(_.getLong(0)).toSeq)
    // keys are rank-ordered descending
    val keys = got.map(_.getLong(2)).toSeq
    assert(keys.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("domainBlocklist blocks exact and subdomain-suffix matches, map-side") {
    val docs = Seq(
      (1L, "x https://evil.com/a y"),                   // exact
      (2L, "x http://cdn.evil.com/b y"),                // subdomain suffix
      (3L, "x www.fine.org y https://evil.com/c z"),    // one of two blocked
      (4L, "x https://notevil.com/d y"),                // NOT a suffix match
      (5L, "no urls at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysisOps.domainBlocklist(docs, "doc_id", "text", Seq("evil.com"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((1L, 1L, true)))
    assert(got(2L) === ((1L, 1L, true)))
    assert(got(3L) === ((2L, 1L, true)))
    assert(got(4L) === ((1L, 0L, false))) // notevil.com must not match evil.com
    assert(got(5L) === ((0L, 0L, false)))
  }

  test("substringDecontaminate flags docs containing snippets verbatim") {
    val docs = Seq(
      (1L, "prefix alpha beta gamma suffix"),  // contains snippet A
      (2L, "alphabeta gamma"),                 // no word-boundary match
      (3L, "two hits: alpha beta gamma and delta epsilon done"),
      (4L, "clean document")).toDF("doc_id", "text")
    val snips = Seq("alpha beta gamma", "delta epsilon").toDF("snippet")
    val got = TextAnalysisOps.substringDecontaminate(docs, snips,
      "doc_id", "text", "snippet")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) === ((1L, true)))
    assert(got(2L) === ((0L, false)))
    assert(got(3L) === ((2L, true)))
    assert(got(4L) === ((0L, false)))
  }
}
