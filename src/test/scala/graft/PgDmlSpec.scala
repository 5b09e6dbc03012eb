package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.{PgServer, PgSequences}

/** UPDATE / DELETE over the wire (the reference has neither). All
  * expected values are live pg 15 captures (round-14 sweep-34): 3VL
  * WHERE matching, SET … = DEFAULT (serial → nextval, else NULL),
  * multi-column row assignment, RETURNING NEW/OLD values, and the
  * `UPDATE n` / `DELETE n` tags.
  */
class PgDmlSpec extends SparkSpec with BeforeAndAfterAll {

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

  private def rows(c: Client, sql: String): Seq[Seq[String]] = {
    val r = c.query(sql)
    assert(r.errors === Nil, s"$sql -> ${r.errors}")
    r.rows.map(_.map(_.getOrElse("NULL")))
  }

  test("UPDATE: 3VL WHERE, tags, multi-column SET, RETURNING NEW values (live-pg pinned)") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS du")
    assert(c.query("CREATE TABLE du (id serial, a int, b text)").errors === Nil)
    assert(c.query("INSERT INTO du (a,b) VALUES (1,'x'),(2,'y'),(NULL,'z')").tags
      === Seq("INSERT 0 3"))
    // NULL `a` row does not match a > 1 (3VL) — exactly one row updates
    assert(c.query("UPDATE du SET a = a + 10 WHERE a > 1").tags === Seq("UPDATE 1"))
    assert(rows(c, "SELECT id, a, b FROM du ORDER BY id") === Seq(
      Seq("1", "1", "x"), Seq("2", "12", "y"), Seq("3", "NULL", "z")))
    // multi-column row assignment + RETURNING yields NEW values
    val r = c.query("UPDATE du SET (a, b) = (0, 'w') WHERE id = 1 RETURNING id, a, b")
    assert(r.errors === Nil)
    assert(r.rows.map(_.map(_.getOrElse("NULL"))) === Seq(Seq("1", "0", "w")))
    assert(r.tags === Seq("UPDATE 1"))
    // DEFAULT: plain column → NULL; serial column → nextval
    assert(rows(c, "UPDATE du SET a = DEFAULT WHERE id = 2 RETURNING a")
      === Seq(Seq("NULL")))
    assert(rows(c, "UPDATE du SET id = DEFAULT WHERE id = 3 RETURNING id")
      === Seq(Seq("4")))
    // no matching rows → UPDATE 0; no WHERE → all rows
    assert(c.query("UPDATE du SET a = 1 WHERE id = 99").tags === Seq("UPDATE 0"))
    assert(c.query("UPDATE du SET b = 'all'").tags === Seq("UPDATE 3"))
    assert(rows(c, "SELECT DISTINCT b FROM du") === Seq(Seq("all")))
    // alias form
    assert(c.query("UPDATE du AS d SET a = d.a WHERE d.id = 1").tags
      === Seq("UPDATE 1"))
    // unsupported shape is an explicit 0A000, not a wrong answer
    assert(c.query("UPDATE du SET a = 1 FROM du d2").errors.map(_._1)
      === Seq("0A000"))
    c.query("DROP TABLE du")
    c.close()
  }

  test("DELETE: 3VL WHERE, RETURNING OLD rows, full-table delete (live-pg pinned)") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS dd")
    c.query("CREATE TABLE dd (id int, a int)")
    c.query("INSERT INTO dd VALUES (1, 5), (2, 50), (3, NULL)")
    // nothing matches → DELETE 0 and RETURNING is empty
    val r0 = c.query("DELETE FROM dd WHERE a > 500 RETURNING id")
    assert(r0.rows === Nil)
    assert(r0.tags === Seq("DELETE 0"))
    // NULL predicate row SURVIVES (pg 3VL)
    assert(c.query("DELETE FROM dd WHERE a > 10").tags === Seq("DELETE 1"))
    assert(rows(c, "SELECT id FROM dd ORDER BY id") === Seq(Seq("1"), Seq("3")))
    // RETURNING yields the OLD (deleted) rows
    assert(rows(c, "DELETE FROM dd WHERE id = 1 RETURNING id, a")
      === Seq(Seq("1", "5")))
    // no WHERE deletes everything
    assert(c.query("DELETE FROM dd").tags === Seq("DELETE 1"))
    assert(rows(c, "SELECT count(*) FROM dd") === Seq(Seq("0")))
    assert(c.query("DELETE FROM dd USING dd d2").errors.map(_._1) === Seq("0A000"))
    c.query("DROP TABLE dd")
    c.close()
  }

  test("SET runs the type input function: family canonicalization, enum 22P02") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS dfam")
    c.query("DROP TYPE IF EXISTS dml_mood")
    assert(c.query("CREATE TYPE dml_mood AS ENUM ('sad','ok','happy')").errors === Nil)
    assert(c.query(
      "CREATE TABLE dfam (id int, r int4range, m dml_mood)").errors === Nil)
    c.query("INSERT INTO dfam VALUES (1, '[1,2)', 'sad')")
    // family text canonicalizes through the input function on SET
    // (live pin: '[1 , 5]'::int4range → [1,6); bare '1 , 5' → 22P02)
    assert(c.query("UPDATE dfam SET r = '1 , 5' WHERE id = 1").errors.map(_._1)
      === Seq("22P02"))
    assert(c.query("UPDATE dfam SET r = '[1 , 5]' WHERE id = 1").tags
      === Seq("UPDATE 1"))
    assert(rows(c, "SELECT r FROM dfam") === Seq(Seq("[1,6)")))
    // enum labels validate at write time
    assert(c.query("UPDATE dfam SET m = 'NOPE' WHERE id = 1").errors.map(_._1)
      === Seq("22P02"))
    assert(c.query("UPDATE dfam SET m = 'happy' WHERE id = 1").tags
      === Seq("UPDATE 1"))
    assert(rows(c, "SELECT m FROM dfam") === Seq(Seq("happy")))
    c.query("DROP TABLE dfam")
    c.query("DROP TYPE dml_mood")
    c.close()
  }
}
