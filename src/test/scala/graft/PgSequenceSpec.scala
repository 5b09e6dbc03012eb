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
}
