package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: assert Catalyst actually produces the plan
  * shapes the operators are designed around (predicate pushdown,
  * column pruning, broadcast joins, top-k, map-side dedup) — the
  * 100 TB-scale contract, checked at sf0.001.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Final (post-AQE) physical plan text after executing the query. */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** AQE plan text repeats the pre-adaptive plan under an
    * "== Initial Plan ==" banner — exchange counts must only look at
    * the final section or every exchange double-counts. */
  private def finalPlanOnly(p: String): String =
    p.split("== Initial Plan ==").head

  test("q02: filters are pushed into the parquet scan, columns pruned") {
    val p = executedPlan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), "expected parquet PushedFilters")
    assert(p.contains("l_discount"), "pushed filter should mention l_discount")
    // ReadSchema must NOT include untouched wide columns
    assert(!p.contains("l_extendedprice"), "column pruning failed: l_extendedprice read")
    assert(!p.contains("l_returnflag"), "column pruning failed: l_returnflag read")
  }

  test("q03: 6-way join broadcasts the small dimension sides") {
    val p = executedPlan("q03_join_multiway")
    assert(p.contains("BroadcastHashJoin"), "dims should broadcast, not shuffle")
    assert(!p.contains("CartesianProduct"), "no cartesian products")
  }

  test("q15: ORDER BY + LIMIT plans as TakeOrderedAndProject (no global sort)") {
    val p = executedPlan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), "top-k should avoid a full sort")
  }

  test("q40: exact dedup shuffles digest+id only, with map-side partial agg") {
    val p = executedPlan("q40_exact_dup_groups")
    assert(p.contains("partial_min"),
      "expected map-side partial min before the shuffle")
    // no Exchange may partition by (or carry) the raw text column — the
    // md5 projection must happen below the partial aggregate, map-side
    val exchanges = p.linesIterator.filter(_.trim.matches(".*Exchange (hash|range).*")).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(!_.contains("text#")),
      s"document text crossed a shuffle: ${exchanges.mkString("; ")}")
  }

  test("q50: brute-force top-k broadcasts the single-row query vector") {
    val p = executedPlan("q50_topk_bruteforce")
    assert(p.contains("Broadcast"), "query-vector side should broadcast")
    assert(p.contains("TakeOrderedAndProject"), "scored stream should take-ordered")
  }

  test("q01: aggregation has a map-side partial phase") {
    val p = executedPlan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "expected partial aggregation before the group-by shuffle")
  }

  test("q33: as-of join is union+window — no join node, no cartesian") {
    val p = executedPlan("q33_asof_join")
    assert(p.contains("Window"), "as-of should run as a window fill")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "as-of must not fall back to a nested-loop/cartesian join")
    // the tie-break rides the window sort: exactly ONE hash exchange
    // (the window key) — no pre-aggregation shuffle of the right side
    val hashEx = finalPlanOnly(p).linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 1, s"expected 1 hash exchange (window), got $hashEx:\n$p")
  }

  test("q34: range join broadcasts the interval side — the point side never shuffles") {
    val p = executedPlan("q34_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to a cartesian shape:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"exploded intervals should broadcast:\n$p")
    // the only hash exchange left is the count-per-interval aggregation
    val hashEx = finalPlanOnly(p).linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1, s"point side must not shuffle into the join:\n$p")
  }

  test("q54: IVF assignment is map-side — no Exchange before the projection") {
    // the only exchange allowed is the harness ORDER BY (range); the
    // assignment itself must not hash-shuffle anything
    val p = executedPlan("q54_ivf_assign")
    assert(!p.contains("Exchange hashpartitioning"),
      s"IVF assignment should not shuffle:\n$p")
    assert(p.contains("vec_ldot"), "assignment should use the native expression")
  }

  test("q94: stream-static enrichment broadcasts the dim side") {
    val p = executedPlan("q94_stream_enriched")
    assert(p.contains("BroadcastHashJoin"),
      s"the dim side must ride a broadcast join, not a shuffle:\n$p")
  }

  test("q58: int8 quantization is map-side — only the harness sort shuffles") {
    val p = executedPlan("q58_int8_quantize")
    assert(!p.contains("Exchange hashpartitioning"),
      s"quantization must not hash-shuffle anything:\n$p")
  }

  test("q47: cross-corpus minhash joins only on band buckets — no nested loop") {
    val p = executedPlan("q47_cross_corpus_minhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cross-corpus candidates must come from the band-bucket equi-join, never train × eval:\n$p")
  }

  test("q69: TF-IDF fast path is one fused typed pass — no join, one exchange") {
    // the vocabulary fits the index-state bound at test SF, so df ships
    // as a broadcast MAP inside the fused mapPartitions: the plan must
    // show no join of any kind and exactly one data exchange (the
    // parallelism fanout) before the oracle-order repartition
    val p = executedPlan("q69_tfidf_terms")
    assert(!p.contains("Join"),
      s"df must ride the broadcast map inside the typed pass, not a join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian anywhere in the TF-IDF plan:\n$p")
    val exchanges =
      "Exchange hashpartitioning".r.findAllIn(finalPlanOnly(p)).length
    assert(exchanges <= 1,
      s"expected at most the fanout hash exchange, found $exchanges:\n$p")
  }

  test("q137: weighted sample is TakeOrdered over a codegen key — no global sort") {
    val p = executedPlan("q137_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition heaps, never a full sort:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"),
      s"the sampling key must be built-in expressions (codegen):\n$p")
  }

  test("q138: domain blocklist runs with ZERO data exchanges") {
    val p = finalPlanOnly(executedPlan("q138_domain_blocklist"))
    // oracleOrder's single-partition collapse is the only exchange the
    // query may carry; the operator itself is one typed map over the
    // scan (broadcast set + label walk — no join, no aggregation)
    assert(!p.contains("Exchange hashpartitioning"),
      s"blocklist matching must not shuffle:\n$p")
    assert(!p.contains("Join"), s"blocklist must not plan a join:\n$p")
  }

  test("q146: boilerplate rebuild (warm) is one typed map — no join, no data exchange") {
    // cold pass computes the boilerplate key census (memoized as
    // PlanMemo index state); the WARM plan — what a pipeline re-run
    // pays — is the broadcast-set typed map over the scan
    val first = SparkEntry.queries("q146_boilerplate_lines")(spark, dir)
    first.collect() // prime the census memo
    val p = finalPlanOnly(executedPlan("q146_boilerplate_lines"))
    // the one allowed exchange is hashFanout's width repair of the
    // single-split test scan (a no-op at production split counts)
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1,
      s"warm boilerplate rebuild must not shuffle beyond the width repair:\n$p")
    assert(!p.contains("Join"), s"warm rebuild must not plan a join:\n$p")
    assert(!p.contains("HashAggregate"),
      s"warm rebuild must not re-run the census aggregation:\n$p")
  }

  test("q147: script profile shuffles nothing beyond the width repair") {
    val p = finalPlanOnly(executedPlan("q147_script_profile"))
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1,
      s"script profiling must not shuffle beyond the width repair:\n$p")
    assert(!p.contains("Join"), s"script profiling must not plan a join:\n$p")
    assert(!p.contains("HashAggregate"),
      s"script profiling must not aggregate:\n$p")
  }

  test("q148: zipf fit is memoized index state — the served plan is a local relation") {
    // the source-dimension fit computes once per corpus fingerprint
    // inside PlanMemo (tokenizer explode with map-side partials —
    // documented in the operator scaladoc); every consumer, including
    // this one, is served the collected rows with no scan, no
    // exchange, no aggregation
    val p = finalPlanOnly(executedPlan("q148_zipf_alpha"))
    assert(p.contains("LocalTableScan") || p.contains("LocalRelation"),
      s"memoized fit must serve as a local relation:\n$p")
    // oracleOrder's single-partition gather is the only exchange the
    // harness may add
    assert(!p.contains("Exchange hashpartitioning"),
      s"memoized fit must not shuffle:\n$p")
  }

  test("q87: domain profiling aggregates with a map-side partial phase") {
    val p = executedPlan("q87_url_domains")
    // two-phase agg: partial_count before the exchange on the domain key
    assert(p.contains("partial_count"),
      s"domain counts must combine map-side before the shuffle:\n$p")
  }

  test("q100: sort-narrow-first — Project sits ABOVE Sort, scan reads 2 columns") {
    // the round-8 contract: formatted strings must be computed after
    // the range exchange so the shuffle moves bytes, not payload
    val df = SparkEntry.queries("q100_to_char_datetime")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val proj = p.indexOf("Project")
    val sort = p.indexOf("Sort")
    assert(proj >= 0 && sort >= 0 && proj < sort,
      s"expected Project above Sort (format after the exchange):\n$p")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderdate"),
      "scan should read only the key and date columns")
  }

  test("q68: the cap guard rides the counts join — exactly one aggregate, no extra job") {
    val df = SparkEntry.queries("q68_fuzzy_join")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("raise_error"), "over-cap guard must be in-plan (loud at execution)")
    assert(!p.contains("RangePartitioning"),
      s"final order must be the gathered sort, not a sampling range exchange:\n$p")
  }

  test("bucketed tables co-locate the join: no shuffle on either side") {
    // The 100 TB co-located-join story: two tables bucketed by the join
    // key with the same bucket count join WITHOUT an Exchange on either
    // side (SortMergeJoin reads bucket-aligned scans). This is the
    // storage layout a production deployment pre-buckets fact tables
    // into; sf0.001 proves the plan shape.
    import org.apache.spark.sql.functions.col
    val ss = spark
    import ss.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join's inputs must come straight from bucketed scans — the
      // only allowed Exchange is the tiny post-join groupBy, so no
      // Exchange may partition on the join key
      assert(!plan.split("\n").exists(l =>
        l.contains("Exchange hashpartitioning") && l.contains("orderkey")),
        s"bucketed join must not shuffle on the join key:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"expected bucketed scan:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q123: geo projection is map-side over a pruned scan — one gather for the oracle sort") {
    val p = executedPlan("q123_geo")
    // the ST_* projection is per-row pure compute: no join, no
    // aggregate, no mid-plan hash shuffle (AQE may plan the final
    // oracle-ordering exchange only)
    assert(!p.contains("Join"), s"geo projection must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"geo projection must not aggregate:\n$p")
    // scan reads only the two columns the points are built from
    assert(!p.contains("c_acctbal"), "column pruning failed: c_acctbal read")
    assert(!p.contains("c_address"), "column pruning failed: c_address read")
  }

  test("q124: grammar batch plans a single-stage series expansion") {
    val p = executedPlan("q124_grammar")
    assert(!p.contains("Join"), s"SRF expansion must not join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("LocalizeSingletonSort: ORDER BY over a one-split scan elides the range exchange") {
    // q107 is a pure projection + global sort over orders (one small
    // parquet split at test SF): the rule rewrites it to a local sort,
    // so the executed plan must carry NO RangePartitioning exchange and
    // no range-bounds sampling — one scheduler round instead of three.
    val p = executedPlan("q107_epoch_date_bin")
    assert(!p.contains("rangepartitioning") && !p.contains("RangePartitioning"),
      s"singleton-partition global sort should localize:\n$p")
    assert(p.contains("Sort "), s"the sort itself must survive:\n$p")
    // rows still arrive fully ordered
    val rows = SparkEntry.queries("q107_epoch_date_bin")(spark, dir)
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(rows.sameElements(rows.sorted), "order lost after sort localization")
  }

  test("LocalizeSingletonSort: ORDER BY + LIMIT keeps TakeOrderedAndProject (guard)") {
    // the underLimit guard: q15's fused top-k must not be broken up
    // into a local sort + separate limit by the rewrite
    val p = executedPlan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"limit+sort fusion must survive the sort-localization rule:\n$p")
  }
}
