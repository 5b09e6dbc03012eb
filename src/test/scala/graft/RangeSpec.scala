package graft

import org.scalatest.BeforeAndAfterAll
import graft.functions.PgRanges
import graft.functions.PgRanges._
import graft.pgwire.PgServer

/** Range-type engine internals + the wire surface (semantic pins live
  * in PgParitySpec sweep-13 — every behavior there is a frozen live
  * PostgreSQL 15 output; this spec covers the pure core directly and
  * the server-path plumbing: RowDescription OIDs, catalog rows,
  * column-typed data flows).
  */
class RangeSpec extends SparkSpec with BeforeAndAfterAll {

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

  // ---- pure core ----------------------------------------------------------

  test("parse/render round-trips, quoting, and malformed input") {
    for (s <- Seq("[1,5)", "(,5)", "[1,)", "(,)", "empty",
      "[\"2026-01-01 00:00:00\",\"2026-01-02 00:00:00\")"))
      assert(render(PgRanges.parse(s)) === s)
    // whitespace around unquoted bounds trims; quoted bounds keep content
    assert(render(PgRanges.parse(" [ 1 , 5 ) ")) === "[1,5)")
    assert(PgRanges.parse("[\"a b\",\"c,d\")").lo === "a b")
    assert(PgRanges.parse("[\"a b\",\"c,d\")").hi === "c,d")
    // escapes: backslash and doubled quotes inside quoted bounds
    assert(PgRanges.parse("[\"a\\\"b\",z)").lo === "a\"b")
    assert(PgRanges.parse("[\"a\"\"b\",z)").lo === "a\"b")
    for (bad <- Seq("{1,5", "foo", "[1 5)", "[1,2,3)", "[1,2"))
      assertThrows[graft.pgwire.PgException](PgRanges.parse(bad))
  }

  test("boundary algebra: mixed-precision timestamp and numeric compare") {
    // "00:00:00.50" vs "00:00:00.5" are the same instant — lexical
    // compare would call them different
    assert(cmpElem("2026-01-01 00:00:00.50", "2026-01-01 00:00:00.5") === 0)
    assert(cmpElem("2026-01-01 00:00:00", "2026-01-01 00:00:00.5") < 0)
    // numerics compare numerically, not lexically ("10" > "9")
    assert(cmpElem("10", "9") > 0)
    assert(cmpElem("1.50", "1.5") === 0)
    // tstz offsets normalize: 01:00+01 == 00:00+00
    assert(cmpElem("2026-01-01 01:00:00+01", "2026-01-01 00:00:00+00") === 0)
  }

  test("set operations stay canonical on discrete inputs") {
    def r(s: String) = PgRanges.parse(s)
    assert(union(r("[1,5)"), r("[5,9)")) === "[1,9)")
    assert(intersect(r("[1,5)"), r("[3,9)")) === "[3,5)")
    assert(minus(r("[1,9)"), r("[5,20)")) === "[1,5)")
    assert(merge(r("[1,2)"), r("[8,9)")) === "[1,9)")
    // continuous single-point intersection keeps inclusivity
    assert(intersect(r("[1,2]"), r("[2,3]")) === "[2,2]")
    assert(intersect(r("[1,2)"), r("[2,3]")) === "empty")
  }

  // ---- wire ---------------------------------------------------------------

  private def connect(): Client = {
    val c = new Client(server.boundPort)
    c.startup()
    c
  }

  test("wire: range values carry pg's range OIDs per subtype") {
    val c = connect()
    val r = c.query("SELECT int4range(1,5) AS a, numrange(1.5,2.5) AS b, " +
      "daterange('2026-01-01','2026-02-01') AS c, " +
      "tsrange('2026-01-01 00:00:00','2026-01-02 00:00:00') AS d, " +
      "int4range(1,5) + int4range(3,9) AS e")
    assert(r.fields === Seq(("a", 3904), ("b", 3906), ("c", 3912),
      ("d", 3908), ("e", 3904)))
    assert(r.rows === Seq(Seq(Some("[1,5)"), Some("[1.5,2.5)"),
      Some("[2026-01-01,2026-02-01)"),
      Some("[\"2026-01-01 00:00:00\",\"2026-01-02 00:00:00\")"),
      Some("[1,9)"))))
    c.close()
  }

  test("wire: range over column data with WHERE-clause operators") {
    val c = connect()
    // ranges built from columns filter rows through the @> rewrite
    val r = c.query("SELECT x, int4range(x, x + 3) AS r " +
      "FROM (VALUES (1),(4),(9)) t(x) WHERE int4range(x, x + 3) @> 5 ORDER BY x")
    assert(r.rows === Seq(Seq(Some("4"), Some("[4,7)"))))
    c.close()
  }

  test("wire: error SQLSTATEs surface through the UDF wrapper") {
    val c = connect()
    val e = c.query("SELECT numrange(5, 1)").errors
    assert(e.nonEmpty)
    assert(e.head._1 === "22000")
    assert(e.head._2.contains("range lower bound must be less than or equal"))
    c.close()
  }

  test("wire: range types visible in pg_type; constructors in pg_proc") {
    val c = connect()
    val r = c.query("SELECT typname, oid, typtype FROM pg_type " +
      "WHERE typname LIKE '%range' AND typtype = 'r' ORDER BY oid")
    assert(r.rows.map(_.map(_.get)) === Seq(
      Seq("int4range", "3904", "r"), Seq("numrange", "3906", "r"),
      Seq("tsrange", "3908", "r"), Seq("tstzrange", "3910", "r"),
      Seq("daterange", "3912", "r"), Seq("int8range", "3926", "r")))
    val p = c.query(
      "SELECT proname FROM pg_proc WHERE proname IN ('int4range','range_merge','isempty') " +
        "ORDER BY proname")
    assert(p.rows.map(_.head.get) === Seq("int4range", "isempty", "range_merge"))
    c.close()
  }
}
