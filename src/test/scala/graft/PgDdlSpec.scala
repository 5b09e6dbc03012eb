package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.PgServer

/** pg-dialect CREATE TABLE + metadata-keyed operator dispatch
  * (round 13). DDL with pg type spellings (serial, text, numeric(p,s),
  * timestamptz, …) creates Spark tables; the canonical-text families
  * (ranges/inet/tsvector/enum/uuid/json/…) store as STRING with
  * pg.oid_alias / pg.oid_num / pg.enum column metadata, which (a) the
  * wire layer reports as the family OIDs and (b) PgSemantics uses to
  * dispatch operators over BARE stored columns — no cast needed, the
  * deviation every type family previously documented.
  *
  * Operator expectations follow live pg 15 (same semantics the
  * cast-dispatched forms pinned in sweeps 13/16/18/22).
  */
class PgDdlSpec extends SparkSpec with BeforeAndAfterAll {

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

  test("pg type spellings create Spark tables; constraints are tolerated") {
    val c = connect()
    c.query("DROP TABLE IF EXISTS ddl_a")
    // column-level AND table-level PRIMARY KEY together is pg's 42P16
    // (live-pinned: "multiple primary keys … are not allowed")
    assert(c.query("CREATE TABLE ddl_a (id serial PRIMARY KEY, name text, " +
      "PRIMARY KEY (id))").errors.map(_._1) === Seq("42P16"))
    val r = c.query("CREATE TABLE ddl_a (id serial, " +
      "name text NOT NULL, score numeric(10,2) DEFAULT 0, ok boolean, " +
      "created timestamptz, d date, n int8, f float4, " +
      "PRIMARY KEY (id))")
    assert(r.errors === Nil, r.errors)
    assert(r.tags === Seq("CREATE TABLE"))
    val sch = spark.table("ddl_a").schema
    assert(sch.map(f => f.name -> f.dataType.simpleString).toMap === Map(
      "id" -> "int", "name" -> "string", "score" -> "decimal(10,2)",
      "ok" -> "boolean", "created" -> "timestamp", "d" -> "date",
      "n" -> "bigint", "f" -> "float"))
    // duplicate → 42P07; IF NOT EXISTS → clean tag
    val dup = c.query("CREATE TABLE ddl_a (x int)").errors
    assert(dup.map(_._1) === Seq("42P07"))
    assert(c.query("CREATE TABLE IF NOT EXISTS ddl_a (x int)").tags ===
      Seq("CREATE TABLE"))
    c.query("DROP TABLE ddl_a")
    c.close()
  }

  test("family columns store canonical text and report family OIDs") {
    val c = connect()
    c.query("DROP TABLE IF EXISTS ddl_fam")
    assert(c.query("CREATE TABLE ddl_fam (r int4range, ip inet, " +
      "tv tsvector, u uuid, j jsonb, mo money, tags text[])").errors === Nil)
    c.query("INSERT INTO ddl_fam VALUES ('[1,10)', '10.1.2.3', 'cat:1', " +
      "'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11', '{\"a\": 1}', '$1.50', " +
      "array('x','y'))")
    val r = c.query("SELECT r, ip, tv, u, j, mo FROM ddl_fam")
    assert(r.errors === Nil, r.errors)
    // RowDescription reports the family OIDs from the column metadata
    assert(r.fields.map(_._2) === Seq(3904, 869, 3614, 2950, 3802, 790),
      r.fields.mkString(","))
    c.query("DROP TABLE ddl_fam")
    c.close()
  }

  test("operators dispatch on bare stored columns via pg.type metadata") {
    val c = connect()
    c.query("DROP TABLE IF EXISTS ddl_ops")
    c.query("CREATE TYPE dmood AS ENUM ('sad','ok','happy')")
    assert(c.query("CREATE TABLE ddl_ops (id int, r int4range, " +
      "r2 int4range, ip inet, net cidr, tv tsvector, m dmood)").errors === Nil)
    c.query("INSERT INTO ddl_ops VALUES " +
      "(1, '[1,10)', '[2,3)', '10.1.2.3', '10.1.0.0/16', 'cat:1 dog:2', 'happy'), " +
      "(2, '[5,8)', '[20,30)', '192.168.1.9', '192.168.0.0/24', 'fish:3', 'sad')")
    def col(sql: String): Seq[String] =
      c.query(sql).rows.map(_.head.getOrElse("<null>"))
    // range containment / overlap, column vs column and vs bare literal
    assert(col("SELECT r @> r2 FROM ddl_ops ORDER BY id") === Seq("t", "f"))
    assert(col("SELECT r @> '[2,3)' FROM ddl_ops ORDER BY id") === Seq("t", "f"))
    assert(col("SELECT r && r2 FROM ddl_ops ORDER BY id") === Seq("t", "f"))
    // inet strict containment (192.168.1.9 is NOT inside /24 of .0.0)
    assert(col("SELECT ip << net FROM ddl_ops ORDER BY id") === Seq("t", "f"))
    // text-search match on a stored tsvector
    assert(col("SELECT tv @@ 'cat' FROM ddl_ops ORDER BY id") === Seq("t", "f"))
    // enum declared order: ORDER BY, min/max, comparison — bare column
    assert(col("SELECT m FROM ddl_ops ORDER BY m") === Seq("sad", "happy"))
    val mm = c.query("SELECT min(m) AS lo, max(m) AS hi FROM ddl_ops")
    assert(mm.rows === Seq(Seq(Some("sad"), Some("happy"))))
    assert(col("SELECT id FROM ddl_ops WHERE m < 'happy'") === Seq("2"))
    // equality stays on the label text
    assert(col("SELECT id FROM ddl_ops WHERE m = 'happy'") === Seq("1"))
    c.query("DROP TABLE ddl_ops")
    c.query("DROP TYPE dmood")
    c.close()
  }

  test("INSERT canonicalizes family text and validates enum labels at write") {
    val c = connect()
    c.query("DROP TABLE IF EXISTS ddl_canon")
    c.query("CREATE TYPE cmood AS ENUM ('sad','ok','happy')")
    assert(c.query("CREATE TABLE ddl_canon (id int, r int4range, ip inet, " +
      "tv tsvector, mo money, m cmood, j json)").errors === Nil)
    // non-canonical family text on the way IN, canonical on the way OUT
    // (pg runs the type input function on INSERT — expected values
    // live-pinned on pg 15: '[1 , 5]'::int4range → [1,6),
    // 'b  a'::tsvector → 'a' 'b', '1.5'::money → $1.50)
    assert(c.query("INSERT INTO ddl_canon VALUES " +
      "(1, '[1 , 5]', '10.1.2.3', 'b  a', '1.5', 'happy', '{\"a\":1}')")
      .errors === Nil)
    val r = c.query("SELECT r, ip, tv, mo FROM ddl_canon WHERE id = 1")
    assert(r.rows === Seq(Seq(Some("[1,6)"), Some("10.1.2.3"),
      Some("'a' 'b'"), Some("$1.50"))), r.rows)
    // json (non-b) preserves the source text verbatim — pg keeps bytes
    assert(c.query("SELECT j FROM ddl_canon WHERE id = 1").rows ===
      Seq(Seq(Some("{\"a\":1}"))))
    // explicit column list, different order
    assert(c.query("INSERT INTO ddl_canon (ip, id, r) " +
      "VALUES ('192.168.001.009', 2, '[ 2, 3 )')").errors === Nil)
    assert(c.query("SELECT r, ip FROM ddl_canon WHERE id = 2").rows ===
      Seq(Seq(Some("[2,3)"), Some("192.168.1.9"))))
    // invalid enum label errors 22P02 AT WRITE TIME, like pg
    val bad = c.query("INSERT INTO ddl_canon (id, m) VALUES (3, 'HAPPY')").errors
    assert(bad.map(_._1) === Seq("22P02"), bad)
    assert(c.query("SELECT count(*) FROM ddl_canon").rows ===
      Seq(Seq(Some("2"))))
    // INSERT ... RETURNING rides the same canonicalization
    val ret = c.query("INSERT INTO ddl_canon (id, r, m) " +
      "VALUES (4, '[3,4]', 'ok') RETURNING id, r, m")
    assert(ret.errors === Nil, ret.errors)
    assert(ret.rows === Seq(Seq(Some("4"), Some("[3,5)"), Some("ok"))), ret.rows)
    c.query("DROP TABLE ddl_canon")
    c.query("DROP TYPE cmood")
    c.close()
  }

  test("Spark-dialect DDL, CTAS, and USING tails pass through untouched") {
    val c = connect()
    c.query("DROP TABLE IF EXISTS ddl_spark")
    assert(c.query(
      "CREATE TABLE ddl_spark (id INT, s STRING) USING parquet").errors === Nil)
    assert(spark.table("ddl_spark").schema.map(_.name) === Seq("id", "s"))
    c.query("DROP TABLE ddl_spark")
    c.query("DROP TABLE IF EXISTS ddl_ctas")
    assert(c.query(
      "CREATE TABLE ddl_ctas USING parquet AS SELECT 1 AS a").errors === Nil)
    assert(c.query("SELECT a FROM ddl_ctas").rows === Seq(Seq(Some("1"))))
    c.query("DROP TABLE ddl_ctas")
    c.close()
  }

  test("unsupported pg column types fail loudly, not silently") {
    val c = connect()
    val e = c.query("CREATE TABLE ddl_iv (x interval)").errors
    assert(e.map(_._1) === Seq("0A000"), e)
    val e2 = c.query("CREATE TABLE ddl_tz (x timetz)").errors
    assert(e2.map(_._1) === Seq("0A000"), e2)
    c.close()
  }
}
