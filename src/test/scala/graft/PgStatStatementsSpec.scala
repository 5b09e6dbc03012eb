package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.{PgServer, PgStatStatements}

/** pg_stat_statements-shaped statement counters (r17 stretch) over
  * the wire path: normalization ($n literal collapse on DML, verbatim
  * utility text), call/row/time accumulation (rows land at stream
  * drain for row-returning statements, from the tag for DML),
  * least-called eviction shape, pg_stat_statements_reset(), and the
  * SET CONSTRAINTS arms (IMMEDIATE = correct no-op here, DEFERRED =
  * honest 0A000 — commit-time undo of applied distributed writes is
  * the unimplementable half). Column set mirrors pg 15's view. */
class PgStatStatementsSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: PgServer = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.pgwire.PgFunctions.registerAll(spark)
    server = new PgServer(spark)
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    super.afterAll()
  }

  private def connect(): Client = {
    val c = new Client(server.boundPort)
    c.startup()
    c
  }

  test("normalization collapses literals to $n on DML, keeps utility text") {
    assert(PgStatStatements.normalize("SELECT * FROM t WHERE a = 5 AND b = 'x'") ===
      "SELECT * FROM t WHERE a = $1 AND b = $2")
    assert(PgStatStatements.normalize("INSERT INTO t VALUES (1, 'a'), (2, 'b')") ===
      "INSERT INTO t VALUES ($1, $2), ($3, $4)")
    assert(PgStatStatements.normalize("SET search_path TO public") ===
      "SET search_path TO public")
    assert(PgStatStatements.normalize("  SELECT\n  1  ;") === "SELECT $1")
  }

  test("counters accumulate calls, rows, and timings over the wire") {
    val c = connect()
    c.query("SELECT pg_stat_statements_reset()")
    c.query("DROP TABLE IF EXISTS pss_t")
    c.query("CREATE TABLE pss_t (a int)")
    c.query("INSERT INTO pss_t VALUES (1), (2), (3)")
    c.query("SELECT a FROM pss_t WHERE a > 0")
    c.query("SELECT a FROM pss_t WHERE a > 1")
    c.query("SELECT a FROM pss_t WHERE a > 2")
    val r = c.query("SELECT calls, rows, query FROM pg_stat_statements " +
      "WHERE query LIKE 'SELECT a FROM pss_t%'")
    assert(r.errors === Nil, r.errors)
    assert(r.rows.size === 1) // three literal variants, ONE fingerprint
    val Seq(Some(calls), Some(rows), Some(q)) = r.rows.head
    assert(calls === "3")
    assert(rows === "6") // 3 + 2 + 1 drained rows
    assert(q === "SELECT a FROM pss_t WHERE a > $1")
    // DML rows come from the command tag
    val ins = c.query("SELECT calls, rows FROM pg_stat_statements " +
      "WHERE query LIKE 'INSERT INTO pss_t%'")
    assert(ins.rows === Seq(Seq(Some("1"), Some("3"))))
    // timing columns present and sane
    val t = c.query("SELECT total_exec_time >= mean_exec_time, " +
      "mean_exec_time > 0 FROM pg_stat_statements " +
      "WHERE query LIKE 'SELECT a FROM pss_t%'")
    assert(t.rows === Seq(Seq(Some("t"), Some("t"))))
    // reset clears
    c.query("SELECT pg_stat_statements_reset()")
    val after = c.query("SELECT count(*) FROM pg_stat_statements " +
      "WHERE query LIKE '%pss_t%'")
    // the reset SELECT itself and this count query may re-land; the
    // pss_t DML/SELECT entries must be gone
    val remaining = c.query("SELECT query FROM pg_stat_statements " +
      "WHERE query LIKE 'INSERT INTO pss_t%'")
    assert(remaining.rows === Nil)
    assert(after.errors === Nil)
    c.query("DROP TABLE pss_t")
    c.close()
  }

  test("SET CONSTRAINTS: ALL forms accepted; bad names live-pinned (r18)") {
    val c = connect()
    assert(c.query("SET CONSTRAINTS ALL IMMEDIATE").tags === Seq("SET CONSTRAINTS"))
    // r18: DEFERRED is real now (journal + commit-time probes)
    assert(c.query("SET CONSTRAINTS ALL DEFERRED").tags === Seq("SET CONSTRAINTS"))
    val e = c.query("SET CONSTRAINTS nosuch_cons_xyz DEFERRED")
    assert(e.errors.map(_._1) === Seq("42704"))
    c.close()
  }

  test("scan metrics: shared_blks_read / records_read land from task input metrics (r18)") {
    val c = connect()
    c.query("SELECT pg_stat_statements_reset()")
    c.query("DROP TABLE IF EXISTS pss_scan")
    c.query("CREATE TABLE pss_scan (a int)")
    c.query("INSERT INTO pss_scan SELECT explode(sequence(1, 5000))")
    c.query("SELECT sum(a) FROM pss_scan")
    // the listener bus is asynchronous — poll until the delta lands
    // (attached at drain of a LATER statement on this connection if
    // the task events lag; each probe query below is such a statement)
    var seen = false
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!seen && System.nanoTime() < deadline) {
      val r = c.query("SELECT shared_blks_read, records_read " +
        "FROM pg_stat_statements WHERE query LIKE 'SELECT sum(a)%'")
      seen = r.rows.exists(row =>
        row.head.exists(_.toLong > 0) && row(1).exists(_.toLong >= 5000))
      if (!seen) Thread.sleep(100)
    }
    assert(seen, "scan delta never attached to the stat entry")
    c.query("DROP TABLE pss_scan")
    c.close()
  }
}
