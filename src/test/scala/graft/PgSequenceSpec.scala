package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.{PgServer, PgSequences}

/** Sequences: CREATE/DROP/ALTER SEQUENCE, nextval/currval/setval/
  * lastval, serial auto-fill, session scoping. Expected values are
  * live pg 15 captures (round-14 session): ascending default
  * 1,2,…; descending CYCLE 10,8,6,10; setval/currval coupling;
  * 2200H at MAXVALUE; 55000 before first nextval; 42P01/42P07 DDL
  * errors; implicit `<table>_<col>_seq` dropped with its table.
  */
class PgSequenceSpec extends SparkSpec with BeforeAndAfterAll {

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

  private def one(c: Client, sql: String): Seq[String] = {
    val r = c.query(sql)
    assert(r.errors === Nil, s"$sql -> ${r.errors}")
    r.rows.head.map(_.getOrElse("NULL"))
  }

  test("nextval/currval/lastval, descending cycle, setval (live-pg pinned)") {
    PgSequences.reset()
    val c = connect()
    assert(c.query("CREATE SEQUENCE s1").tags === Seq("CREATE SEQUENCE"))
    assert(one(c, "SELECT nextval('s1'), nextval('s1'), currval('s1'), lastval()") ===
      Seq("1", "2", "2", "2"))
    c.query("CREATE SEQUENCE s2 INCREMENT BY -2 START WITH 10 MINVALUE 5 MAXVALUE 10 CYCLE")
    assert(one(c, "SELECT nextval('s2'), nextval('s2'), nextval('s2'), nextval('s2')") ===
      Seq("10", "8", "6", "10")) // descending CYCLE wraps to MAXVALUE
    assert(one(c, "SELECT setval('s1', 100)") === Seq("100"))
    assert(one(c, "SELECT nextval('s1'), currval('s1')") === Seq("101", "101"))
    assert(one(c, "SELECT setval('s1', 200, false)") === Seq("200"))
    assert(one(c, "SELECT nextval('s1')") === Seq("200")) // is_called=false
    // regclass-cast spelling and schema-qualified names resolve
    assert(one(c, "SELECT nextval('s1'::regclass)") === Seq("201"))
    assert(one(c, "SELECT currval('public.s1')") === Seq("201"))
    c.query("DROP SEQUENCE s1, s2")
    c.close()
  }

  test("error codes: 2200H overflow, 55000 unset, 42P01/42P07 DDL") {
    PgSequences.reset()
    val c = connect()
    c.query("CREATE SEQUENCE s3 MAXVALUE 2")
    assert(one(c, "SELECT nextval('s3'), nextval('s3')") === Seq("1", "2"))
    assert(c.query("SELECT nextval('s3')").errors.map(_._1) === Seq("2200H"))
    assert(c.query("SELECT currval('nosuch')").errors.map(_._1) === Seq("42P01"))
    // lastval IS defined here (the s3 nextvals above); a failed
    // nextval does not move it
    assert(one(c, "SELECT lastval()") === Seq("2"))
    c.query("CREATE SEQUENCE dup")
    assert(c.query("CREATE SEQUENCE dup").errors.map(_._1) === Seq("42P07"))
    assert(c.query("CREATE SEQUENCE IF NOT EXISTS dup").tags ===
      Seq("CREATE SEQUENCE"))
    assert(c.query("DROP SEQUENCE nosuch2").errors.map(_._1) === Seq("42P01"))
    assert(c.query("DROP SEQUENCE IF EXISTS nosuch2").tags === Seq("DROP SEQUENCE"))
    c.query("CREATE SEQUENCE s4")
    c.query("SELECT nextval('s4')")
    assert(c.query("ALTER SEQUENCE s4 RESTART").tags === Seq("ALTER SEQUENCE"))
    assert(one(c, "SELECT nextval('s4')") === Seq("1"))
    c.query("ALTER SEQUENCE s4 RESTART WITH 50")
    assert(one(c, "SELECT nextval('s4')") === Seq("50"))
    c.query("DROP SEQUENCE s3, dup, s4")
    c.close()
  }

  test("currval/lastval are session-scoped") {
    PgSequences.reset()
    val c1 = connect()
    c1.query("CREATE SEQUENCE sess_seq")
    assert(one(c1, "SELECT nextval('sess_seq')") === Seq("1"))
    val c2 = connect()
    // a second connection sees the shared counter but no currval yet
    assert(c2.query("SELECT currval('sess_seq')").errors.map(_._1) === Seq("55000"))
    assert(c2.query("SELECT lastval()").errors.map(_._1) === Seq("55000"))
    assert(one(c2, "SELECT nextval('sess_seq')") === Seq("2"))
    assert(one(c1, "SELECT currval('sess_seq')") === Seq("1"))
    c1.query("DROP SEQUENCE sess_seq")
    c1.close(); c2.close()
  }

  test("serial columns auto-fill from the implicit sequence; dropped with the table") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS seq_t")
    assert(c.query("CREATE TABLE seq_t (id serial, name text)").errors === Nil)
    assert(PgSequences.exists("seq_t_id_seq"))
    c.query("INSERT INTO seq_t (name) VALUES ('a'), ('b')")
    c.query("INSERT INTO seq_t (name) VALUES ('c')")
    val r = c.query("SELECT id, name FROM seq_t ORDER BY id")
    assert(r.rows.map(_.map(_.get)) ===
      Seq(Seq("1", "a"), Seq("2", "b"), Seq("3", "c")))
    // nextval is usable directly against the implicit sequence
    assert(one(c, "SELECT nextval('seq_t_id_seq')") === Seq("4"))
    // a positional INSERT takes the given value, like pg
    c.query("INSERT INTO seq_t VALUES (99, 'z')")
    assert(one(c, "SELECT max(id) FROM seq_t") === Seq("99"))
    assert(c.query("DROP TABLE seq_t").errors === Nil)
    assert(!PgSequences.exists("seq_t_id_seq"))
    c.close()
  }

  test("VALUES inserts reserve serials on the driver as literals, in row order") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS seq_lit")
    c.query("CREATE TABLE seq_lit (id serial, v int DEFAULT 7, name text)")
    // the canonicalized SQL carries reserved literals, not pg_nextval
    // UDF calls — the multi-JVM allocator contract (executor tasks
    // never touch driver sequence state for literal VALUES)
    val canon = graft.pgwire.Handlers.canonicalizeInsert(spark,
      "INSERT INTO seq_lit (name) VALUES ('a'), ('b')", connId = 0)
    assert(!canon.contains("pg_nextval"), canon)
    assert(canon.contains("CAST(1 AS BIGINT)") && canon.contains("CAST(2 AS BIGINT)"), canon)
    // mixed DEFAULT cells: the serial DEFAULT cell becomes a literal,
    // the non-serial DEFAULT keeps its expression; row binding holds
    val canon2 = graft.pgwire.Handlers.canonicalizeInsert(spark,
      "INSERT INTO seq_lit (id, v, name) VALUES (DEFAULT, DEFAULT, 'x'), (41, 5, 'y')",
      connId = 0)
    assert(!canon2.contains("pg_nextval"), canon2)
    assert(canon2.contains("CAST(3 AS BIGINT)"), canon2)
    // end-to-end over the wire: values bind in VALUES order and the
    // sequence advanced exactly by the rows drawn (the two probe
    // canonicalizations above burned 1,2,3 — pg burns reservations of
    // statements that never run, same rule)
    c.query("INSERT INTO seq_lit (name) VALUES ('a'), ('b'), ('c')")
    assert(c.query("SELECT id, name FROM seq_lit ORDER BY id").rows.map(_.map(_.get)) ===
      Seq(Seq("4", "a"), Seq("5", "b"), Seq("6", "c")))
    assert(one(c, "SELECT nextval('seq_lit_id_seq')") === Seq("7"))
    // INSERT ... SELECT: r16 count+reserve two-pass — the fill is
    // window arithmetic over a driver-reserved block, never the
    // pg_nextval UDF (sweep-36d pins the values vs live pg)
    val canon3 = graft.pgwire.Handlers.canonicalizeInsert(spark,
      "INSERT INTO seq_lit (name) SELECT 'q'", connId = 0)
    assert(!canon3.contains("pg_nextval"), canon3)
    assert(canon3.contains("row_number() OVER"), canon3)
    // the probe reserved value 8; the wire path continues from 9
    c.query("INSERT INTO seq_lit (name) SELECT 'r'")
    assert(c.query("SELECT id, name FROM seq_lit WHERE name = 'r'")
      .rows.map(_.map(_.get)) === Seq(Seq("9", "r")))
    // a plain nextval-DEFAULT column (not a serial) keeps the per-row
    // UDF fill — only pg.serial columns take the block reservation
    c.query("DROP SEQUENCE IF EXISTS cyc_s")
    c.query("CREATE SEQUENCE cyc_s MAXVALUE 1000 CYCLE")
    c.query("DROP TABLE IF EXISTS seq_cyc")
    c.query("CREATE TABLE seq_cyc (id int DEFAULT nextval('cyc_s'), v text)")
    val canon4 = graft.pgwire.Handlers.canonicalizeInsert(spark,
      "INSERT INTO seq_cyc (v) SELECT 'q'", connId = 0)
    assert(canon4.contains("pg_nextval"), canon4)
    c.query("DROP TABLE IF EXISTS seq_cyc")
    c.query("DROP SEQUENCE IF EXISTS cyc_s")
    c.query("DROP TABLE seq_lit")
    c.close()
  }

  test("catalog surface: pg_sequences, pg_sequence, pg_class 'S', SELECT FROM seq (live-pg pinned)") {
    PgSequences.reset()
    val c = connect()
    c.query("CREATE SEQUENCE cat_s")
    c.query("CREATE SEQUENCE cat_i AS integer")
    c.query("CREATE SEQUENCE cat_d AS smallint INCREMENT -2")
    // `SELECT * FROM <seq>` — fresh: last_value=START, log_cnt=0,
    // is_called=f (pin: 1|0|f); after two nextvals: 2|31|t
    assert(one(c, "SELECT * FROM cat_s") === Seq("1", "0", "f"))
    one(c, "SELECT nextval('cat_s'), nextval('cat_s')")
    assert(one(c, "SELECT * FROM cat_s") === Seq("2", "31", "t"))
    // pg_sequences: AS-typed bounds and NULL last_value until first use
    val r = c.query(
      """SELECT sequencename, data_type, start_value, min_value, max_value,
        |       increment_by, cycle, cache_size, last_value
        |FROM pg_sequences WHERE sequencename LIKE 'cat_%'
        |ORDER BY sequencename""".stripMargin)
    assert(r.errors === Nil)
    assert(r.rows.map(_.map(_.getOrElse("NULL"))) === Seq(
      Seq("cat_d", "smallint", "-1", "-32768", "-1", "-2", "f", "1", "NULL"),
      Seq("cat_i", "integer", "1", "1", "2147483647", "1", "f", "1", "NULL"),
      Seq("cat_s", "bigint", "1", "1", "9223372036854775807", "1", "f", "1", "2")))
    // setval(…, false) resets log_cnt, pins is_called — and pg_sequences
    // goes back to NULL last_value (live pin: setval('pv',7,false) →
    // relation view 7|0|f but pg_sequences.last_value NULL)
    one(c, "SELECT setval('cat_s', 100, false)")
    assert(one(c, "SELECT * FROM cat_s") === Seq("100", "0", "f"))
    assert(c.query(
      "SELECT last_value FROM pg_sequences WHERE sequencename = 'cat_s'")
      .rows.head.head.isEmpty)
    // pg_sequence joins pg_class on seqrelid; relkind 'S'
    val r2 = c.query(
      """SELECT c.relname, s.seqtypid, s.seqmax, s.seqcycle
        |FROM pg_sequence s JOIN pg_class c ON c.oid = s.seqrelid
        |WHERE c.relname = 'cat_i'""".stripMargin)
    assert(r2.rows.map(_.map(_.get)) === Seq(Seq("cat_i", "23", "2147483647", "f")))
    // psql \ds shape: relkind filter + visibility + owner
    val ds = c.query(
      """SELECT n.nspname, c.relname, c.relkind,
        |       pg_catalog.pg_get_userbyid(c.relowner)
        |FROM pg_catalog.pg_class c
        |  LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
        |WHERE c.relkind IN ('S','') AND pg_catalog.pg_table_is_visible(c.oid)
        |ORDER BY 2""".stripMargin)
    assert(ds.rows.map(_.map(_.get)) === Seq(
      Seq("public", "cat_d", "S", "postgres"),
      Seq("public", "cat_i", "S", "postgres"),
      Seq("public", "cat_s", "S", "postgres")))
    // sequences never leak into pg_tables/user-table rows
    assert(c.query(
      "SELECT 1 FROM pg_tables WHERE tablename LIKE 'cat_%'").rows === Nil)
    c.query("DROP SEQUENCE cat_s, cat_i, cat_d")
    // dropped: relation view retired, catalog rows gone
    assert(c.query("SELECT * FROM cat_s").errors.nonEmpty)
    assert(c.query(
      "SELECT 1 FROM pg_sequences WHERE sequencename LIKE 'cat_%'").rows === Nil)
    c.close()
  }

  test("pg_get_serial_sequence and typed serial bounds (live-pg pinned)") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS gss_t")
    c.query("CREATE TABLE gss_t (id serial, big bigserial, v text)")
    assert(one(c,
      "SELECT pg_get_serial_sequence('gss_t','id'), pg_get_serial_sequence('public.gss_t','big')") ===
      Seq("public.gss_t_id_seq", "public.gss_t_big_seq"))
    // plain column → NULL; missing relation/column → 42P01/42703
    val r = c.query("SELECT pg_get_serial_sequence('gss_t','v') IS NULL AS n")
    assert(r.rows.map(_.map(_.get)) === Seq(Seq("t")))
    assert(c.query("SELECT pg_get_serial_sequence('nosuch_t','x')")
      .errors.map(_._1) === Seq("42P01"))
    assert(c.query("SELECT pg_get_serial_sequence('gss_t','nope')")
      .errors.map(_._1) === Seq("42703"))
    // serial's implicit sequence is typed after the column family
    // (pin: t_id_seq max 2147483647)
    val b = c.query(
      """SELECT sequencename, data_type, max_value FROM pg_sequences
        |WHERE sequencename LIKE 'gss_t%' ORDER BY sequencename""".stripMargin)
    assert(b.rows.map(_.map(_.get)) === Seq(
      Seq("gss_t_big_seq", "bigint", "9223372036854775807"),
      Seq("gss_t_id_seq", "integer", "2147483647")))
    c.query("DROP TABLE gss_t")
    c.close()
  }
}
