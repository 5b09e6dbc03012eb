package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.{Complete, Handlers, PgCatalog, PgException, PgFunctions, RowSet, Session}

/** Materialized views over the wire: CREATE [WITH [NO] DATA] /
  * REFRESH / DROP, the 55000 unpopulated-scan guard, snapshot
  * semantics (base-table changes invisible until REFRESH), the
  * pg_matviews / relkind 'm' catalog surface, and the cross-command
  * 42809 hints — every behavior captured on live pg 15 (round-14
  * scratch cluster) before implementation. Live-pinned tags:
  * `SELECT n` for a populated create, bare `CREATE MATERIALIZED VIEW`
  * for WITH NO DATA.
  */
class MatViewSpec extends SparkSpec with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    import spark.implicits._
    Seq((1, "x"), (2, "y")).toDF("a", "b").createOrReplaceTempView("mt")
    PgCatalog.registerAll(spark)
    PgFunctions.registerAll(spark)
  }

  private def s = new Session(1, "postgres", "postgres")

  private def tag(sql: String): String =
    Handlers.execute(spark, s, sql) match {
      case Complete(t, _) => t
      case RowSet(_, rows, tagFor, _) => tagFor(rows.size)
      case other => fail(s"unexpected $other")
    }

  private def rows(sql: String): Seq[org.apache.spark.sql.Row] =
    Handlers.execute(spark, s, sql) match {
      case RowSet(_, it, _, _) => it.toVector
      case other => fail(s"expected rows, got $other")
    }

  test("create WITH DATA: SELECT n tag, snapshot isolation, refresh catches up") {
    assert(tag("CREATE MATERIALIZED VIEW mv1 AS SELECT a, b FROM mt WHERE a > 0")
      === "SELECT 2")
    assert(rows("SELECT count(*) AS n FROM mv1").head.getLong(0) === 2L)
    // base-table change is INVISIBLE until refresh (physical snapshot)
    import spark.implicits._
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("a", "b").createOrReplaceTempView("mt")
    assert(rows("SELECT count(*) AS n FROM mv1").head.getLong(0) === 2L)
    assert(tag("REFRESH MATERIALIZED VIEW mv1") === "REFRESH MATERIALIZED VIEW")
    assert(rows("SELECT count(*) AS n FROM mv1").head.getLong(0) === 3L)
    assert(tag("DROP MATERIALIZED VIEW mv1") === "DROP MATERIALIZED VIEW")
  }

  test("WITH NO DATA: bare tag, 55000 on scan, populated after refresh") {
    assert(tag("CREATE MATERIALIZED VIEW mv2 AS SELECT a FROM mt WITH NO DATA")
      === "CREATE MATERIALIZED VIEW")
    val e = intercept[PgException](rows("SELECT * FROM mv2"))
    assert(e.code === "55000")
    assert(e.msg === """materialized view "mv2" has not been populated""")
    assert(tag("REFRESH MATERIALIZED VIEW mv2") === "REFRESH MATERIALIZED VIEW")
    assert(rows("SELECT count(*) AS n FROM mv2").head.getLong(0) === 3L)
    tag("DROP MATERIALIZED VIEW mv2")
  }

  test("catalog surface: pg_matviews row, relkind 'm', out of pg_tables") {
    tag("CREATE MATERIALIZED VIEW mv3 (aa) AS SELECT a FROM mt")
    val mvRow = rows(
      "SELECT matviewname, ispopulated, definition FROM pg_matviews WHERE matviewname = 'mv3'")
    assert(mvRow.length === 1)
    assert(mvRow.head.getBoolean(1) === true)
    assert(mvRow.head.getString(2).toLowerCase.contains("select a from mt"))
    assert(rows("SELECT relkind FROM pg_class WHERE relname = 'mv3'")
      .head.getString(0) === "m")
    assert(rows("SELECT count(*) AS n FROM pg_tables WHERE tablename = 'mv3'")
      .head.getLong(0) === 0L)
    // the optional column list renames the output
    assert(rows("SELECT aa FROM mv3 ORDER BY aa").map(_.getInt(0)) === Seq(1, 2, 3))
    tag("DROP MATERIALIZED VIEW mv3")
    assert(rows("SELECT count(*) AS n FROM pg_matviews").head.getLong(0) === 0L)
  }

  test("wrong-command errors match pg: 42809 everywhere, 42P01 on missing") {
    tag("CREATE MATERIALIZED VIEW mv4 AS SELECT 1 AS x")
    val e1 = intercept[PgException](tag("DROP VIEW mv4"))
    assert(e1.code === "42809" && e1.msg === """"mv4" is not a view""")
    val e2 = intercept[PgException](tag("DROP TABLE mv4"))
    assert(e2.code === "42809" && e2.msg === """"mv4" is not a table""")
    val e3 = intercept[PgException](tag("REFRESH MATERIALIZED VIEW nosuch"))
    assert(e3.code === "42P01")
    val e4 = intercept[PgException](tag("DROP MATERIALIZED VIEW nosuch"))
    assert(e4.code === "42P01" &&
      e4.msg === """materialized view "nosuch" does not exist""")
    assert(tag("DROP MATERIALIZED VIEW IF EXISTS nosuch") === "DROP MATERIALIZED VIEW")
    val e5 = intercept[PgException](tag("REFRESH MATERIALIZED VIEW mt"))
    assert(e5.code === "42809")
    // duplicate name: 42P07 unless IF NOT EXISTS
    val e6 = intercept[PgException](
      tag("CREATE MATERIALIZED VIEW mv4 AS SELECT 2 AS x"))
    assert(e6.code === "42P07")
    assert(tag("CREATE MATERIALIZED VIEW IF NOT EXISTS mv4 AS SELECT 2 AS x")
      === "CREATE MATERIALIZED VIEW")
    tag("DROP MATERIALIZED VIEW mv4")
  }

  test("drop list form removes several at once") {
    tag("CREATE MATERIALIZED VIEW mva AS SELECT 1 AS x")
    tag("CREATE MATERIALIZED VIEW mvb AS SELECT 2 AS x")
    assert(tag("DROP MATERIALIZED VIEW mva, mvb") === "DROP MATERIALIZED VIEW")
    assert(rows("SELECT count(*) AS n FROM pg_matviews").head.getLong(0) === 0L)
  }

  test("DROP TABLE IF EXISTS on a matview is 42809, backing table intact (live-pinned)") {
    tag("CREATE MATERIALIZED VIEW mv5 AS SELECT 1 AS x")
    // r14 bug: referencedTables read the token after TABLE ('if'),
    // skipped the guard, and pgDropTable deleted the backing table
    val e = intercept[PgException](tag("DROP TABLE IF EXISTS mv5"))
    assert(e.code === "42809" && e.msg === """"mv5" is not a table""")
    assert(rows("SELECT x FROM mv5").head.getInt(0) === 1) // still refreshable/readable
    assert(tag("REFRESH MATERIALIZED VIEW mv5") === "REFRESH MATERIALIZED VIEW")
    tag("DROP MATERIALIZED VIEW mv5")
  }

  test("unpopulated guard edges: quoted names fire, EXPLAIN/LOCK/NO-DATA-create exempt (live-pinned)") {
    tag("""CREATE MATERIALIZED VIEW "MyMV" AS SELECT a FROM mt WITH NO DATA""")
    // quoted, case-significant reference raises 55000 (r14: QIdent
    // tokens dodged the referencedTables scan entirely)
    val e1 = intercept[PgException](rows("""SELECT * FROM "MyMV""""))
    assert(e1.code === "55000" &&
      e1.msg === """materialized view "MyMV" has not been populated""")
    tag("""DROP MATERIALIZED VIEW "MyMV"""")

    tag("CREATE MATERIALIZED VIEW mv6 AS SELECT a FROM mt WITH NO DATA")
    // plain EXPLAIN is plan-only and succeeds in pg; ANALYZE executes
    assert(rows("EXPLAIN SELECT * FROM mv6").nonEmpty)
    val e2 = intercept[PgException](rows("EXPLAIN ANALYZE SELECT * FROM mv6"))
    assert(e2.code === "55000")
    // LOCK TABLE on a matview is 42809 in pg ("cannot lock relation"),
    // not 55000 and not success (one session: LOCK needs a txn block)
    val sess = new Session(2, "postgres", "postgres")
    Handlers.execute(spark, sess, "BEGIN")
    val e3 = intercept[PgException](
      Handlers.execute(spark, sess, "LOCK TABLE mv6"))
    assert(e3.code === "42809" && e3.msg === """cannot lock relation "mv6"""")
    Handlers.execute(spark, sess, "ROLLBACK")
    // CREATE … WITH NO DATA over an unpopulated matview succeeds (the
    // body is stored, not executed); REFRESH of it then raises 55000
    // against the body's unpopulated source
    assert(tag("CREATE MATERIALIZED VIEW mv7 AS SELECT * FROM mv6 WITH NO DATA")
      === "CREATE MATERIALIZED VIEW")
    val e4 = intercept[PgException](tag("REFRESH MATERIALIZED VIEW mv7"))
    assert(e4.code === "55000" &&
      e4.msg === """materialized view "mv6" has not been populated""")
    assert(tag("REFRESH MATERIALIZED VIEW mv6") === "REFRESH MATERIALIZED VIEW")
    assert(tag("REFRESH MATERIALIZED VIEW mv7") === "REFRESH MATERIALIZED VIEW")
    assert(rows("SELECT count(*) AS n FROM mv7").head.getLong(0) > 0L)
    tag("DROP MATERIALIZED VIEW mv7")
    tag("DROP MATERIALIZED VIEW mv6")
  }
}
