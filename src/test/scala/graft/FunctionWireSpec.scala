package graft

import graft.pgwire.PgServer

/** The round-7 function surface exercised over a REAL socket: pg
  * templates, interval results (CalendarInterval → RowDescription oid
  * 1186 + pg text rendering), SIMILAR TO and EXTRACT(EPOCH) rewrites,
  * and the binary/uuid packs — i.e. what a psql user sees, not just
  * what spark.sql returns.
  */
class FunctionWireSpec extends SparkSpec {

  private var server: PgServer = _

  override def beforeAll(): Unit = {
    super.beforeAll()
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

  test("to_char family over the wire") {
    val c = connect()
    val r = c.query(
      "SELECT to_char(TIMESTAMP '2026-08-12 15:04:05', 'FMDay, DD Mon YYYY') AS d, " +
        "to_char(12345.678, '99G999D99') AS n, " +
        "to_number('1,234.5', '9G999D9') AS p")
    assert(r.errors.isEmpty, r.errors)
    assert(r.rows.head(0) === Some("Wednesday, 12 Aug 2026"))
    assert(r.rows.head(1) === Some(" 12,345.68"))
    assert(r.rows.head(2) === Some("1234.5"))
    c.close()
  }

  test("age returns interval oid 1186 rendered pg-style") {
    val c = connect()
    val r = c.query(
      "SELECT age(TIMESTAMP '2001-04-10', TIMESTAMP '1957-06-13') AS a, " +
        "justify_hours(make_interval(0, 0, 0, 0, 27)) AS j")
    assert(r.errors.isEmpty, r.errors)
    assert(r.fields.map(_._2) === Seq(1186, 1186))
    assert(r.rows.head(0) === Some("43 years 9 mons 27 days"))
    assert(r.rows.head(1) === Some("1 day 03:00:00"))
    c.close()
  }

  test("SIMILAR TO and EXTRACT(EPOCH) through the server rewrite") {
    val c = connect()
    val r = c.query(
      "SELECT count(*) FROM (VALUES ('abc'), ('adc'), ('xyz')) AS t(x) " +
        "WHERE x SIMILAR TO 'a_c'")
    assert(r.errors.isEmpty, r.errors)
    assert(r.rows.head.head === Some("2"))
    // EXTRACT renders pg's numeric(…,6); date_part stays float8
    val r2 = c.query("SELECT EXTRACT(EPOCH FROM TIMESTAMP '1970-01-02') AS e")
    assert(r2.errors.isEmpty, r2.errors)
    assert(r2.rows.head.head === Some("86400.000000"))
    val r3 = c.query("SELECT date_part('epoch', TIMESTAMP '1970-01-02') AS e")
    assert(r3.errors.isEmpty, r3.errors)
    assert(r3.rows.head.head === Some("86400"))
    c.close()
  }

  test("set-returning splitters rewrite to generators") {
    val c = connect()
    val r = c.query("SELECT regexp_split_to_table('a1b2c', '[0-9]') AS part")
    assert(r.errors.isEmpty, r.errors)
    assert(r.rows.map(_.head) === Seq(Some("a"), Some("b"), Some("c")))
    val r2 = c.query("SELECT string_to_table('x,y', ',') AS v")
    assert(r2.errors.isEmpty, r2.errors)
    assert(r2.rows.map(_.head) === Seq(Some("x"), Some("y")))
    c.close()
  }

  test("binary + uuid + typeof packs over the wire") {
    val c = connect()
    val r = c.query(
      "SELECT encode(decode('6162', 'hex'), 'base64') AS b, " +
        "uuid_extract_version(uuidv7()) AS v, " +
        "pg_typeof(1.5) AS t, " +
        "date_bin(INTERVAL '15' MINUTE, TIMESTAMP '2026-08-12 10:07:30', " +
        "TIMESTAMP '2001-01-01') AS db")
    assert(r.errors.isEmpty, r.errors)
    assert(r.rows.head(0) === Some("YWI="))
    assert(r.rows.head(1) === Some("7"))
    assert(r.rows.head(2) === Some("numeric"))
    // plain TIMESTAMP source is NTZ → date_bin keeps the source type
    // (no offset), exactly pg
    assert(r.rows.head(3) === Some("2026-08-12 10:00:00"))
    c.close()
  }
}
