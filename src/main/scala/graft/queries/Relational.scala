package graft.queries

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2d): scans, projection,
  * filter, equi/semi/anti/outer/cross joins, scalar + correlated
  * subqueries, aggregation, distinct, rollup/cube, window functions,
  * sort/limit, set ops, table functions, lateral explode, regex,
  * string/array/date/JSON functions, CTEs.
  *
  * The reference delegates all of these to its engine via
  * `session_context.sql(query)` (reference:
  * datafusion-postgres/src/handlers.rs:198); here Spark SQL/Catalyst
  * plays that role. Every query is declarative DataFrame/SQL so
  * Catalyst applies pushdown/pruning/join-selection; at 100 TB the
  * same plans parallelize by partition with no driver-side loops.
  */
object Relational {

  val queries: Seq[QueryDef] = Seq(

    // --- aggregation over a scan with pushed-down filter (TPC-H Q1 shape)
    // money sums floor-quantize to integer ticks BEFORE summing: a
    // double→decimal cast is engine-specific in the last ulp (DuckDB
    // converts via double arithmetic, Spark via exact BigDecimal), but
    // floor(x*10^k) of the same IEEE double is identical everywhere.
    Q.sameSql("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  cast(sum(cast(l_quantity as decimal(30,10))) as double) as sum_qty,
        |  cast(sum(cast(floor(l_extendedprice * 100) as bigint)) as double) / 100 as sum_base_price,
        |  cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * 10000) as bigint)) as double) / 10000 as sum_disc_price,
        |  cast(sum(cast(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) as bigint)) as double) / 10000 as sum_charge,
        |  cast(min(l_quantity) as double) as min_qty,
        |  cast(max(l_extendedprice) as double) as max_price,
        |  count(*) as count_order
        |FROM lineitem
        |WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // --- projection + multi-predicate filter (parquet pushdown)
    Q.sameSql("q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
        |  AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // --- 6-way equi join + group agg (TPC-H Q5 shape)
    Q.sameSql("q03_join_multiway",
      """SELECT n_name,
        |  cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(30,10))) as double) as revenue,
        |  count(*) as n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // --- semi join via EXISTS (Catalyst -> LeftSemi)
    Q.sameSql("q04_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    // --- anti join via NOT EXISTS (Catalyst -> LeftAnti)
    Q.sameSql("q05_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    // --- IN (subquery)
    Q.sameSql("q06_in_subquery",
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%')
        |ORDER BY s_suppkey""".stripMargin),

    // --- uncorrelated scalar subquery (exact decimal avg threshold)
    Q.sameSql("q07_scalar_subquery",
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_retailprice >
        |  (SELECT cast(sum(cast(p_retailprice as decimal(30,10))) as double) FROM part)
        |    / (SELECT count(*) FROM part)
        |ORDER BY p_partkey""".stripMargin),

    // --- correlated scalar subquery in projection
    Q.sameSql("q08_correlated_subquery",
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) as n_orders
        |FROM customer ORDER BY c_custkey""".stripMargin),

    // --- window: row_number + running sum (exact decimal frame agg).
    // The source is hash-fanned on the window partition key BEFORE the
    // window: an explicit-width exchange is exempt from AQE's
    // small-shuffle coalescing, which otherwise folds the sf0.1-sized
    // shuffle into ONE task and serializes the whole window pass (the
    // r13→r14 window-trio drift). It satisfies the window's clustering
    // requirement, so EnsureRequirements adds no second exchange; at
    // production scale the width never drops below the source's own
    // split count. Gathered final sort for the q10 range-sample reason.
    Q.df("q09_window_running",
      """SELECT o_orderkey, o_custkey, cast(rn as bigint) as rn,
        |       cast(running as double) as running_spend
        |FROM (
        |  SELECT o_orderkey, o_custkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) as rn,
        |    sum(cast(o_totalprice as decimal(30,10)))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as running
        |  FROM orders) t
        |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Q.oracleOrder(
        Q.hashFanout(Tables.t(s, dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
            "o_custkey")
          .select(col("o_orderkey"), col("o_custkey"),
            row_number().over(w).cast("long").as("rn"),
            sum(col("o_totalprice").cast("decimal(30,10)"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_spend")),
        "o_custkey", "rn")
    },

    // --- window: rank/dense_rank/lag/lead/ntile over a named window.
    // Spark side runs the window then gathers for the deterministic
    // final order (Q.oracleOrder): a full ORDER BY would add a range
    // exchange whose bound-sampling re-executes the window stage.
    Q.df("q10_window_rank",
      """SELECT o_orderkey,
        |  cast(rank() OVER w as bigint) as rnk,
        |  cast(dense_rank() OVER w as bigint) as drnk,
        |  lag(o_orderkey) OVER w as prev_key,
        |  lead(o_orderkey) OVER w as next_key,
        |  cast(ntile(4) OVER w as bigint) as quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // hash-fan on the window partition key first — see q09's note
      // (AQE otherwise coalesces the 5-key shuffle to one task)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Q.oracleOrder(
        Q.hashFanout(Tables.t(s, dir, "orders")
            .select("o_orderkey", "o_totalprice", "o_orderpriority"),
            "o_orderpriority")
          .select(col("o_orderkey"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            lag(col("o_orderkey"), 1).over(w).as("prev_key"),
            lead(col("o_orderkey"), 1).over(w).as("next_key"),
            ntile(4).over(w).cast("long").as("quartile")),
        "o_orderkey")
    },

    // --- set op: INTERSECT
    Q.sameSql("q11_intersect",
      """SELECT c_nationkey as nk FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nk""".stripMargin),

    // --- set op: EXCEPT
    Q.sameSql("q12_except",
      """SELECT c_custkey as ck FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY ck""".stripMargin),

    // --- set op: UNION ALL of scalar aggregates
    Q.sameSql("q13_union_all",
      """SELECT 'cust' as src, count(*) as n FROM customer
        |UNION ALL SELECT 'supp' as src, count(*) as n FROM supplier
        |UNION ALL SELECT 'part' as src, count(*) as n FROM part
        |ORDER BY src""".stripMargin),

    // --- DISTINCT
    Q.sameSql("q14_distinct",
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),

    // --- top-k (TakeOrderedAndProject — no full sort at scale)
    Q.sameSql("q15_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin),

    // --- ROLLUP (explicit NULLS FIRST: engines differ on default)
    Q.sameSql("q16_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) as n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, n""".stripMargin),

    // --- CUBE
    Q.sameSql("q17_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) as n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),

    // --- CASE / string scalar functions
    Q.sameSql("q18_case_string",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN 'low'
        |       WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END as bucket,
        |  upper(o_orderstatus) as status_u,
        |  substring(o_orderpriority, 1, 1) as prio_digit,
        |  cast(length(o_orderpriority) as int) as prio_len,
        |  concat(o_orderstatus, '-', o_orderpriority) as tag,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') as status2
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // --- date functions
    Q.sameSql("q19_date_parts",
      """SELECT o_orderkey,
        |  cast(year(o_orderdate) as int) as yr,
        |  cast(month(o_orderdate) as int) as mo,
        |  cast(day(o_orderdate) as int) as dy,
        |  cast(o_orderdate as date) as odate
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // --- time-bucketed aggregation over the events stream table
    Q.sql("q20_events_hourly",
      """SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') as hr,
        |  event_type, count(*) as n,
        |  cast(sum(cast(value as decimal(30,10))) as double) as sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin,
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') as hr,
        |  event_type, count(*) as n,
        |  cast(sum(cast(value as decimal(30,10))) as double) as sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin),

    // --- JSON extraction from the events.props column. Range-fanout
    // BEFORE the JSON projection: sort-last would feed the range
    // sampler the projected rows (re-executing get_json_object over
    // the whole table) and parse on the scan's single input split.
    Q.df("q21_json_extract",
      """SELECT event_id, cast(json_extract(props, '$.k') as bigint) as k
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      Q.rangeFanout(s.table("events"), "event_id")
        .selectExpr("event_id", "cast(get_json_object(props, '$.k') as bigint) as k")
        .sortWithinPartitions("event_id")
    },

    // --- conditional aggregation (FILTER clause) + count distinct
    Q.sameSql("q22_conditional_agg",
      """SELECT c_mktsegment,
        |  count(*) as n_orders,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') as n_finished,
        |  count(DISTINCT o_custkey) as n_custs
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // --- ordered string aggregation (pg string_agg(x, sep ORDER BY y))
    Q.sql("q23_string_agg",
      """SELECT n_regionkey, array_join(array_sort(collect_list(n_name)), ',') as names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) as names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin),

    // --- array functions over tokenized text
    Q.sql("q24_array_fns",
      """SELECT doc_id, cast(size(split(text, ' ')) as int) as n_tokens,
        |  array_join(slice(array_sort(array_distinct(split(text, ' '))), 1, 5), '|') as first5
        |FROM documents ORDER BY doc_id""".stripMargin,
      """SELECT doc_id, cast(len(string_split(text, ' ')) as int) as n_tokens,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '|') as first5
        |FROM documents ORDER BY doc_id""".stripMargin),

    // --- table function: integer series
    Q.sql("q25_generate_series",
      "SELECT id as i, id * id as sq FROM range(1, 101) ORDER BY i",
      "SELECT cast(g as bigint) as i, cast(g * g as bigint) as sq FROM generate_series(1, 100) t(g) ORDER BY i"),

    // --- lateral explode / unnest
    Q.sql("q26_explode",
      """SELECT doc_id, tok FROM documents
        |LATERAL VIEW explode(split(text, ' ')) t AS tok
        |WHERE doc_id < 20 ORDER BY doc_id, tok""".stripMargin,
      """SELECT doc_id, unnest(string_split(text, ' ')) as tok FROM documents
        |WHERE doc_id < 20 ORDER BY doc_id, tok""".stripMargin),

    // --- regex predicate (pg `~` operator semantics -> rlike)
    Q.sql("q27_regex_filter",
      "SELECT doc_id FROM documents WHERE text rlike 'merge \\\\w+ join' ORDER BY doc_id",
      "SELECT doc_id FROM documents WHERE regexp_matches(text, 'merge \\w+ join') ORDER BY doc_id"),

    // --- full outer join of two aggregated sides
    Q.sameSql("q28_full_outer",
      """SELECT coalesce(c.nk, s.nk) as nk, c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey as nk, count(*) as n_cust FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN (SELECT s_nationkey as nk, count(*) as n_supp FROM supplier GROUP BY s_nationkey) s
        |ON c.nk = s.nk
        |ORDER BY nk""".stripMargin),

    // --- cross join (small dims)
    Q.sameSql("q29_cross_join",
      """SELECT r1.r_name as a, r2.r_name as b
        |FROM region r1 CROSS JOIN region r2 ORDER BY a, b""".stripMargin),

    // --- left outer join + group
    Q.sameSql("q30_left_join_agg",
      """SELECT n_nationkey, n_name, count(c_custkey) as n_cust
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin),

    // --- CTE
    Q.sameSql("q31_cte",
      """WITH big_orders AS (SELECT * FROM orders WHERE o_totalprice > 400000)
        |SELECT o_orderpriority, count(*) as n FROM big_orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // --- as-of join (TemporalOps): each event annotated with the
    // latest order (by o_orderdate <= ts) of the same customer. The
    // oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, so the composed
    // union+window operator is pinned against a real engine's as-of
    // semantics; the right side is pre-aggregated per (key, time) to
    // make the equal-time tie-break explicit on both sides.
    Q.df("q33_asof_join",
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |           FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      import graft.operators.TemporalOps
      // prune BEFORE the as-of compose: asofJoin unions the left side
      // into its window shuffle, so every unselected column (the wide
      // props JSON in particular) would ride the exchange for nothing.
      // The oracle's per-(key, time) max-orderkey pre-aggregation is
      // expressed as the window tie-break instead of a groupBy — same
      // winner, one less shuffle of the orders side
      val events = Tables.t(s, dir, "events")
        .select("event_id", "user_id", "ts")
      val o = Tables.t(s, dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey")
      Q.oracleOrder(
        TemporalOps.asofJoin(events, "user_id", "ts",
            o, "o_custkey", "o_orderdate", Seq("o_orderkey", "o_orderdate"),
            tieBreak = Seq("o_orderkey"))
          .select(col("event_id"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_date")),
        "event_id")
    },

    // --- keyless range join (TemporalOps.rangeJoin): every purchase
    // (sampled) opens a 10-minute window; count ALL events inside it.
    // DuckDB's oracle runs its native IEJoin; the Spark side is the
    // bucket-join shape that avoids the BroadcastNestedLoop cartesian.
    Q.df("q34_range_join",
      """WITH i AS (SELECT event_id AS interval_id, ts AS lo,
        |             ts + INTERVAL 10 MINUTE AS hi
        |           FROM events
        |           WHERE event_type = 'purchase' AND event_id % 20 = 0)
        |SELECT i.interval_id, count(*) AS n
        |FROM i JOIN events e ON e.ts >= i.lo AND e.ts <= i.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.operators.TemporalOps
      val ev = Tables.t(s, dir, "events")
      val iv = ev
        .filter(col("event_type") === "purchase" && col("event_id") % 20 === 0)
        .select(col("event_id").as("interval_id"), col("ts").as("lo"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("hi"))
      // the interval side is a 5% sample of purchases — dimension
      // sized at any SF, so broadcast it and leave events unshuffled
      Q.oracleOrder(
        TemporalOps.rangeJoin(ev, "ts", iv, "lo", "hi", bucketSeconds = 600L,
            broadcastIntervals = true)
          .groupBy("interval_id").agg(count(lit(1)).as("n")),
        "interval_id")
    },

    // --- recursive CTE (Spark 4 WITH RECURSIVE): dense daily spine
    // zero-filling days with no events — the gap-filling analytics
    // pattern. Recursion depth = day span (~30), safely inside
    // Spark's recursion limit.
    Q.df("q35_recursive_spine",
      """WITH RECURSIVE bounds AS (
        |  SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
        |  FROM events),
        |spine(d) AS (
        |  SELECT lo FROM bounds
        |  UNION ALL
        |  SELECT d + INTERVAL 1 DAY FROM spine, bounds WHERE d < hi),
        |daily AS (
        |  SELECT date_trunc('day', ts) AS d, count(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT strftime(s.d, '%Y-%m-%d') AS day,
        |  coalesce(daily.n_events, 0) AS n_events
        |FROM spine s LEFT JOIN daily ON s.d = daily.d
        |ORDER BY day""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      // resolve the spine bounds ONCE (1-row metadata-grade lookup,
      // memoized per data fingerprint — min/max ts is table-stats
      // state): Spark materializes each recursion step as its own
      // job, so a `bounds` CTE referenced inside the recursive branch
      // re-scans events per iteration — 30 extra scans at a 30-day
      // span
      val bounds = graft.operators.PlanMemo.getOrCompute[Option[(String, String)]](
        ("tsbounds", graft.operators.PlanMemo.dataKey(Tables.t(s, dir, "events")))) {
        val b = s.sql(
          """SELECT date_format(date_trunc('day', min(ts)), 'yyyy-MM-dd HH:mm:ss') AS lo,
            |  date_format(date_trunc('day', max(ts)), 'yyyy-MM-dd HH:mm:ss') AS hi
            |FROM events""".stripMargin).head()
        if (b.isNullAt(0)) None else Some((b.getString(0), b.getString(1)))
      }
      bounds match {
        // empty/all-NULL ts → empty spine (what the oracle's recursive
        // bounds CTE yields), not a TIMESTAMP 'null' parse error
        case None =>
          s.sql("SELECT CAST(NULL AS STRING) AS day, CAST(NULL AS BIGINT) AS n_events WHERE false")
        case Some((lo, hi)) =>
          // the recursion BATCHES: each step advances 16 days and
          // explodes into its days — every Spark recursion iteration
          // is a scheduled job (~25 ms of pure overhead on a 1-row
          // step), so a day-per-step spine pays 30 jobs where this
          // shape pays 2-3 for identical rows. Consecutive windows
          // [d, min(d+15d, hi)] tile the span exactly.
          s.sql(
            s"""WITH RECURSIVE wk(d) AS (
               |  SELECT TIMESTAMP '$lo'
               |  UNION ALL
               |  SELECT d + INTERVAL 16 DAY FROM wk
               |  WHERE d + INTERVAL 16 DAY <= TIMESTAMP '$hi'),
               |spine AS (
               |  SELECT explode(sequence(d,
               |    least(d + INTERVAL 15 DAY, TIMESTAMP '$hi'),
               |    INTERVAL 1 DAY)) AS d FROM wk),
               |daily AS (
               |  SELECT date_trunc('day', ts) AS d, count(*) AS n_events
               |  FROM events GROUP BY 1)
               |SELECT date_format(s.d, 'yyyy-MM-dd') AS day,
               |  coalesce(daily.n_events, 0) AS n_events
               |FROM spine s LEFT JOIN daily ON s.d = daily.d
               |ORDER BY day""".stripMargin)
      }
    },

    // --- LATERAL correlated subquery: top-2 customers per nation
    Q.sameSql("q36_lateral_topn",
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin),

    // --- pivot: events per nation-region row, one column per type
    // (DataFrame pivot with an explicit value list; oracle = the CASE
    // aggregation DuckDB spells it as)
    Q.df("q37_pivot",
      """SELECT date_part('day', ts) AS dy,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY dy""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "events")
        .groupBy(dayofmonth(col("ts")).cast("long").as("dy"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("dy")
    },

    // --- value-based window frame: 7-day trailing event volume
    // (RANGE BETWEEN INTERVAL — a frame bound by ORDER-BY value, not
    // row position; the moving-aggregate shape row frames can't spell)
    Q.sql("q38_range_frame",
      sparkSql =
        """WITH daily AS (
          |  SELECT date_trunc('day', ts) AS d, count(*) AS n FROM events GROUP BY 1)
          |SELECT date_format(d, 'yyyy-MM-dd') AS day,
          |  CAST(sum(n) OVER (ORDER BY d
          |    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_7d
          |FROM daily ORDER BY day""".stripMargin,
      duckSql =
        """WITH daily AS (
          |  SELECT date_trunc('day', ts) AS d, count(*) AS n FROM events GROUP BY 1)
          |SELECT strftime(d, '%Y-%m-%d') AS day,
          |  CAST(sum(n) OVER (ORDER BY d
          |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_7d
          |FROM daily ORDER BY day""".stripMargin),

    // --- unpivot/melt: per-nation acctbal stats as (stat, value) rows
    Q.df("q39_unpivot",
      """WITH s AS (
        |  SELECT n_name,
        |    CAST(count(*) AS DOUBLE) AS n_customers,
        |    CAST(sum(CAST(floor(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_bal,
        |    CAST(min(c_acctbal) AS DOUBLE) AS min_bal,
        |    CAST(max(c_acctbal) AS DOUBLE) AS max_bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, stat, value FROM (
        |  SELECT n_name, 'n_customers' AS stat, n_customers AS value FROM s
        |  UNION ALL SELECT n_name, 'sum_bal', sum_bal FROM s
        |  UNION ALL SELECT n_name, 'min_bal', min_bal FROM s
        |  UNION ALL SELECT n_name, 'max_bal', max_bal FROM s)
        |ORDER BY n_name, stat""".stripMargin) { (s, dir) =>
      val stats = Tables.t(s, dir, "customer")
        .join(Tables.t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).cast("double").as("n_customers"),
          (sum(floor(col("c_acctbal").cast("double") * 100).cast("long")).cast("double") / 100).as("sum_bal"),
          min(col("c_acctbal")).cast("double").as("min_bal"),
          max(col("c_acctbal")).cast("double").as("max_bal"))
      stats.unpivot(Array(col("n_name")),
          Array(col("n_customers"), col("sum_bal"), col("min_bal"), col("max_bal")),
          "stat", "value")
        .orderBy("n_name", "stat")
    },

    // --- window: distribution + value functions (percent_rank,
    // cume_dist, first/nth/last value over an explicit rows frame);
    // gathered final order for the same range-sample reason as q10
    Q.df("q48_window_value_fns",
      """SELECT o_orderkey,
        |  CAST(floor(percent_rank() OVER w * 100000) AS BIGINT) AS pct_rank_100k,
        |  CAST(floor(cume_dist() OVER w * 100000) AS BIGINT) AS cume_100k,
        |  first_value(o_orderkey) OVER w2 AS frame_first,
        |  nth_value(o_orderkey, 2) OVER w2 AS frame_second,
        |  last_value(o_orderkey) OVER w2 AS frame_last
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
        |  w2 AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // hash-fan on the window partition key first — see q09's note
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val w2 = w.rowsBetween(-1, 1)
      Q.oracleOrder(
        Q.hashFanout(Tables.t(s, dir, "orders")
            .select("o_orderkey", "o_totalprice", "o_orderpriority"),
            "o_orderpriority")
          .select(col("o_orderkey"),
            floor(percent_rank().over(w) * 100000).cast("long").as("pct_rank_100k"),
            floor(cume_dist().over(w) * 100000).cast("long").as("cume_100k"),
            first(col("o_orderkey")).over(w2).as("frame_first"),
            nth_value(col("o_orderkey"), 2).over(w2).as("frame_second"),
            last(col("o_orderkey")).over(w2).as("frame_last")),
        "o_orderkey")
    },

    // --- GROUPING SETS with grouping() flags (rollup/cube's general
    // form; both engines plan one Expand + single aggregate)
    Q.sameSql("q49_grouping_sets",
      """SELECT n_name, o_orderpriority,
        |  CAST(grouping(n_name) AS BIGINT) AS g_nation,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |  count(*) AS n_orders
        |FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (o_orderpriority), (n_name, o_orderpriority), ())
        |ORDER BY g_nation, g_prio, n_name NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin)
  )
}
