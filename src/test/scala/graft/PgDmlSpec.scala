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
    // UPDATE … FROM (no WHERE): every target row matches the cross
    // join; each updated exactly once (sweep-38 pins the full shape)
    assert(c.query("UPDATE du SET a = 1 FROM du d2").tags === Seq("UPDATE 3"))
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
    // DELETE … USING over an empty table: the cross join is empty
    assert(c.query("DELETE FROM dd USING dd d2").tags === Seq("DELETE 0"))
    c.query("DROP TABLE dd")
    c.close()
  }

  test("column DEFAULTs: omitted-column fill, DEFAULT keyword, short positional (live-pg pinned)") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS ddef")
    assert(c.query("CREATE TABLE ddef (id int, name text, score numeric(10,2) DEFAULT 0, " +
      "tag text DEFAULT 'x' || 'y')").errors === Nil)
    // omitted columns fill from their defaults (live: 0.00 / xy)
    assert(c.query("INSERT INTO ddef (id, name) VALUES (1, 'a')").tags === Seq("INSERT 0 1"))
    // short positional targets the leading columns
    assert(c.query("INSERT INTO ddef VALUES (2, 'b')").tags === Seq("INSERT 0 1"))
    // DEFAULT keyword inside VALUES resolves per position
    assert(c.query("INSERT INTO ddef VALUES (3, 'c', DEFAULT, DEFAULT)").tags === Seq("INSERT 0 1"))
    assert(rows(c, "SELECT id, name, score, tag FROM ddef ORDER BY id") === Seq(
      Seq("1", "a", "0.00", "xy"), Seq("2", "b", "0.00", "xy"), Seq("3", "c", "0.00", "xy")))
    // expression default with a sequence call allocates per row
    c.query("DROP TABLE IF EXISTS ddef2")
    assert(c.query("CREATE SEQUENCE ddef_seq").errors === Nil)
    assert(c.query("CREATE TABLE ddef2 (id bigint DEFAULT nextval('ddef_seq'), v text)").errors === Nil)
    assert(c.query("INSERT INTO ddef2 (v) VALUES ('p'), ('q')").tags === Seq("INSERT 0 2"))
    assert(rows(c, "SELECT id, v FROM ddef2 ORDER BY id") === Seq(
      Seq("1", "p"), Seq("2", "q")))
    // DEFAULT on a column with no default is NULL (pg semantics)
    assert(c.query("INSERT INTO ddef2 VALUES (DEFAULT, DEFAULT)").tags === Seq("INSERT 0 1"))
    assert(rows(c, "SELECT id, coalesce(v, '<null>') FROM ddef2 WHERE id = 3") === Seq(
      Seq("3", "<null>")))
    // UPDATE SET col = DEFAULT uses the declared default
    assert(c.query("UPDATE ddef SET score = DEFAULT WHERE id = 2").tags === Seq("UPDATE 1"))
    assert(rows(c, "SELECT score FROM ddef WHERE id = 2") === Seq(Seq("0.00")))
    // GENERATED AS IDENTITY maps to the serial machinery
    c.query("DROP TABLE IF EXISTS dident")
    assert(c.query("CREATE TABLE dident (id int GENERATED ALWAYS AS IDENTITY, v text)").errors === Nil)
    assert(c.query("INSERT INTO dident (v) VALUES ('a'), ('b')").tags === Seq("INSERT 0 2"))
    assert(rows(c, "SELECT id, v FROM dident ORDER BY id") === Seq(
      Seq("1", "a"), Seq("2", "b")))
    c.query("DROP TABLE ddef"); c.query("DROP TABLE ddef2")
    c.query("DROP TABLE dident"); c.query("DROP SEQUENCE ddef_seq")
    c.close()
  }

  test("constraints + ON CONFLICT upsert: 23502/23505, DO NOTHING, DO UPDATE with EXCLUDED (live-pg pinned)") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS up14")
    assert(c.query("CREATE TABLE up14 (id int PRIMARY KEY, name text NOT NULL, " +
      "score numeric(10,2) DEFAULT 0, tag text DEFAULT 'x' || 'y')").errors === Nil)
    assert(c.query("INSERT INTO up14 (id, name) VALUES (1, 'a')").tags === Seq("INSERT 0 1"))
    assert(c.query("INSERT INTO up14 VALUES (2, 'b')").tags === Seq("INSERT 0 1"))
    // 23502 (null into NOT NULL)
    val e1 = c.query("INSERT INTO up14 (id, name) VALUES (4, NULL)")
    assert(e1.errors.map(_._1) === Seq("23502"))
    assert(e1.errors.head._2.contains(
      "null value in column \"name\" of relation \"up14\" violates not-null constraint"))
    // 23505 vs stored rows, pg constraint name in the message
    val e2 = c.query("INSERT INTO up14 (id, name) VALUES (1, 'dup')")
    assert(e2.errors.map(_._1) === Seq("23505"))
    assert(e2.errors.head._2.contains("up14_pkey"))
    // 23505 within the same statement
    assert(c.query("INSERT INTO up14 (id, name) VALUES (5,'p'),(5,'q')")
      .errors.map(_._1) === Seq("23505"))
    // DO NOTHING: conflicting row skipped, fresh row inserted
    assert(c.query("INSERT INTO up14 (id, name) VALUES (1,'z'),(6,'new') " +
      "ON CONFLICT (id) DO NOTHING").tags === Seq("INSERT 0 1"))
    // DO UPDATE: EXCLUDED = proposed row, table-qualified = stored row
    assert(c.query("INSERT INTO up14 (id, name, score) VALUES (1,'upd',9.5),(7,'ins',1) " +
      "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name || '!', " +
      "score = up14.score + EXCLUDED.score").tags === Seq("INSERT 0 2"))
    assert(rows(c, "SELECT id, name, score, tag FROM up14 ORDER BY id") === Seq(
      Seq("1", "upd!", "9.50", "xy"), Seq("2", "b", "0.00", "xy"),
      Seq("6", "new", "0.00", "xy"), Seq("7", "ins", "1.00", "xy")))
    // 21000 when two proposed rows hit the same stored row
    assert(c.query("INSERT INTO up14 (id,name) VALUES (2,'x2'),(2,'x3') " +
      "ON CONFLICT (id) DO UPDATE SET name=EXCLUDED.name").errors.map(_._1) === Seq("21000"))
    // DO NOTHING keeps the FIRST of a within-batch duplicate
    assert(c.query("INSERT INTO up14 (id,name) VALUES (8,'a8'),(8,'b8') " +
      "ON CONFLICT (id) DO NOTHING").tags === Seq("INSERT 0 1"))
    assert(rows(c, "SELECT name FROM up14 WHERE id = 8") === Seq(Seq("a8")))
    // DO UPDATE … WHERE false → no change, count 0
    assert(c.query("INSERT INTO up14 (id,name) VALUES (2,'ww') ON CONFLICT (id) " +
      "DO UPDATE SET name = EXCLUDED.name WHERE up14.id > 5").tags === Seq("INSERT 0 0"))
    assert(rows(c, "SELECT name FROM up14 WHERE id = 2") === Seq(Seq("b")))
    // ON CONSTRAINT spelling + no-target DO NOTHING
    assert(c.query("INSERT INTO up14 (id,name) VALUES (2,'oc') " +
      "ON CONFLICT ON CONSTRAINT up14_pkey DO NOTHING").tags === Seq("INSERT 0 0"))
    assert(c.query("INSERT INTO up14 (id,name) VALUES (1,'t') ON CONFLICT DO NOTHING")
      .tags === Seq("INSERT 0 0"))
    // RETURNING yields the affected (updated + inserted) rows
    val r = c.query("INSERT INTO up14 (id,name,score) VALUES (1,'r1',2),(20,'r20',3) " +
      "ON CONFLICT (id) DO UPDATE SET score = up14.score + 1 RETURNING id, name, score")
    assert(r.errors === Nil)
    assert(r.tags === Seq("INSERT 0 2"))
    assert(r.rows.map(_.map(_.getOrElse("NULL"))).sortBy(_.head.toInt) === Seq(
      Seq("1", "upd!", "10.50"), Seq("20", "r20", "3.00")))
    // UPDATE hits the same checks (live-pinned)
    assert(c.query("UPDATE up14 SET id = 2 WHERE id = 6").errors.map(_._1) === Seq("23505"))
    assert(c.query("UPDATE up14 SET name = NULL WHERE id = 2").errors.map(_._1) === Seq("23502"))
    // 42P10 when the target matches no unique constraint
    assert(c.query("INSERT INTO up14 (id,name) VALUES (30,'x') ON CONFLICT (name) DO NOTHING")
      .errors.map(_._1) === Seq("42P10"))
    // column UNIQUE + multi-column UNIQUE: names and NULL exemption
    c.query("DROP TABLE IF EXISTS uq14")
    assert(c.query("CREATE TABLE uq14 (a int UNIQUE, b text, z int, UNIQUE (b, z))").errors === Nil)
    assert(c.query("INSERT INTO uq14 VALUES (1, 'x', 1)").tags === Seq("INSERT 0 1"))
    val e3 = c.query("INSERT INTO uq14 VALUES (2, 'x', 1)")
    assert(e3.errors.map(_._1) === Seq("23505"))
    assert(e3.errors.head._2.contains("uq14_b_z_key"))
    val e4 = c.query("INSERT INTO uq14 VALUES (1, 'y', 2)")
    assert(e4.errors.map(_._1) === Seq("23505"))
    assert(e4.errors.head._2.contains("uq14_a_key"))
    // NULL key members never conflict (pg unique semantics)
    assert(c.query("INSERT INTO uq14 VALUES (NULL, NULL, 1), (NULL, NULL, 1)")
      .tags === Seq("INSERT 0 2"))
    c.query("DROP TABLE up14"); c.query("DROP TABLE uq14")
    // conflict target on a NON-FIRST column: the USING-columns join fronts
    // the key, and the positional write must restore table column order
    // (regression: values landed in the wrong columns / 42601 cast failure)
    c.query("DROP TABLE IF EXISTS uo14")
    assert(c.query("CREATE TABLE uo14 (id int PRIMARY KEY, a int, " +
      "b text NOT NULL DEFAULT 'd', u int UNIQUE)").errors === Nil)
    assert(c.query("INSERT INTO uo14 VALUES (6, 33, 'y', 2)").tags === Seq("INSERT 0 1"))
    assert(c.query("INSERT INTO uo14 VALUES (1, 20, 'x', 2) " +
      "ON CONFLICT (u) DO UPDATE SET a = uo14.a + EXCLUDED.a").tags === Seq("INSERT 0 1"))
    assert(rows(c, "SELECT id, a, b, u FROM uo14 ORDER BY id") === Seq(
      Seq("6", "53", "y", "2")))
    c.query("DROP TABLE uo14")
    c.close()
  }

  test("serial pre-reservation deviation: early-row failure burns the whole batch's draws (pg pipelines)") {
    // DOCUMENTED DEVIATION (ADVICE r15): live pg evaluates VALUES
    // rows one at a time, so `(explicit-conflict row, DEFAULT row)`
    // burns ZERO draws in pg — the conflict fires before row 2's
    // nextval ever runs. Our canonicalize-time pre-reservation draws
    // for every serial slot up front, so the same statement leaves
    // the sequence ONE draw ahead (never behind, never reused). This
    // pins OUR behavior so any change to the allocator is a
    // deliberate decision, and documents the exact delta vs pg.
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS sdev")
    assert(c.query("CREATE TABLE sdev (id serial PRIMARY KEY, v text)").errors === Nil)
    assert(c.query("INSERT INTO sdev (v) VALUES ('a')").tags === Seq("INSERT 0 1"))
    // failing row BEFORE the serial row: pg burns 0, we burn 1
    val e = c.query("INSERT INTO sdev VALUES (1, 'dup'), (DEFAULT, 'b')")
    assert(e.errors.map(_._1) === Seq("23505"))
    assert(rows(c, "SELECT last_value, is_called FROM sdev_id_seq") ===
      Seq(Seq("2", "t"))) // live pg would show (1, t) here
    // the next successful draw continues from the burned reservation
    assert(c.query("INSERT INTO sdev (v) VALUES ('c')").tags === Seq("INSERT 0 1"))
    assert(rows(c, "SELECT id, v FROM sdev ORDER BY id") === Seq(
      Seq("1", "a"), Seq("3", "c"))) // live pg would assign id 2
    c.query("DROP TABLE sdev")
    c.close()
  }

  test("FOREIGN KEY 23503/0A000/2BP01 message shapes (live-pg pinned r16)") {
    // texts captured verbatim from live pg 15 (same box, 2026-08-16);
    // SQLSTATE coverage lives in sweep-41 — this pins the DETAIL/HINT
    // prose and the cascade-action 0A000 gate the differential can't
    // exercise (pg would cascade where we refuse)
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS mford"); c.query("DROP TABLE IF EXISTS mfcust")
    assert(c.query("CREATE TABLE mfcust (id int PRIMARY KEY, n text)").errors === Nil)
    assert(c.query(
      "CREATE TABLE mford (oid int PRIMARY KEY, cid int REFERENCES mfcust (id))")
      .errors === Nil)
    c.query("INSERT INTO mfcust VALUES (1, 'a')")
    c.query("INSERT INTO mford VALUES (10, 1)")
    val e1 = c.query("INSERT INTO mford VALUES (11, 9)")
    assert(e1.errors.map(_._1) === Seq("23503"))
    assert(e1.errors.head._2.contains(
      "insert or update on table \"mford\" violates foreign key constraint " +
        "\"mford_cid_fkey\""))
    assert(e1.errors.head._2.contains(
      "Key (cid)=(9) is not present in table \"mfcust\"."))
    val e2 = c.query("DELETE FROM mfcust WHERE id = 1")
    assert(e2.errors.map(_._1) === Seq("23503"))
    assert(e2.errors.head._2.contains(
      "update or delete on table \"mfcust\" violates foreign key constraint " +
        "\"mford_cid_fkey\" on table \"mford\""))
    assert(e2.errors.head._2.contains(
      "Key (id)=(1) is still referenced from table \"mford\"."))
    val e3 = c.query("TRUNCATE mfcust")
    assert(e3.errors.map(_._1) === Seq("0A000"))
    assert(e3.errors.head._2.contains(
      "cannot truncate a table referenced in a foreign key constraint"))
    assert(e3.errors.head._2.contains("Table \"mford\" references \"mfcust\"."))
    val e4 = c.query("DROP TABLE mfcust")
    assert(e4.errors.map(_._1) === Seq("2BP01"))
    assert(e4.errors.head._2.contains(
      "cannot drop table mfcust because other objects depend on it"))
    assert(e4.errors.head._2.contains(
      "constraint mford_cid_fkey on table mford depends on table mfcust"))
    // cascade actions EXECUTE since r17 (sweep-42 is the randomized
    // differential; this pins the single-case shapes): recorded,
    // rendered, and fired as extra distributed DML in the statement
    c.query("DROP TABLE IF EXISTS cford")
    assert(c.query("CREATE TABLE cford (oid int PRIMARY KEY, " +
      "cid int REFERENCES mfcust (id) ON DELETE CASCADE)").errors === Nil)
    assert(rows(c, "SELECT pg_get_constraintdef(oid) FROM pg_constraint " +
      "WHERE conrelid = 'cford'::regclass AND contype = 'f'") === Seq(
      Seq("FOREIGN KEY (cid) REFERENCES mfcust(id) ON DELETE CASCADE")))
    c.query("INSERT INTO mfcust VALUES (2, 'b')")
    c.query("INSERT INTO cford VALUES (20, 1)")
    // deleting an UNREFERENCED parent row under CASCADE is fine
    assert(c.query("DELETE FROM mfcust WHERE id = 2").tags === Seq("DELETE 1"))
    // the NO ACTION mford FK still blocks — same 23503 live pg raises
    // with a CASCADE sibling present (the cascade alone would fire)
    val e5 = c.query("DELETE FROM mfcust WHERE id = 1")
    assert(e5.errors.map(_._1) === Seq("23503"))
    assert(e5.errors.head._2.contains(
      "violates foreign key constraint \"mford_cid_fkey\" on table \"mford\""))
    // clear the blocker: now the delete cascades into cford (tag
    // counts only the direct parent row, like pg)
    assert(c.query("DELETE FROM mford WHERE oid = 10").tags === Seq("DELETE 1"))
    assert(c.query("DELETE FROM mfcust WHERE id = 1").tags === Seq("DELETE 1"))
    assert(rows(c, "SELECT count(*) FROM cford") === Seq(Seq("0")))
    // ON UPDATE CASCADE executes too (r17 late batch, sweep-43 is the
    // differential): the child key follows the parent's new value
    c.query("INSERT INTO mfcust VALUES (3, 'c')")
    c.query("DROP TABLE IF EXISTS uford")
    assert(c.query("CREATE TABLE uford (oid int PRIMARY KEY, " +
      "cid int REFERENCES mfcust (id) ON UPDATE CASCADE)").errors === Nil)
    c.query("INSERT INTO uford VALUES (30, 3)")
    assert(c.query("UPDATE mfcust SET id = 4 WHERE id = 3").tags ===
      Seq("UPDATE 1"))
    assert(rows(c, "SELECT cid FROM uford") === Seq(Seq("4")))
    // …and (r18) ALSO under a nondeterministic SET on the referenced
    // key: the pair projection persists before the action joins, so
    // the drawn value is stable — pg draws 50 and the child follows
    c.query("CREATE SEQUENCE uford_s START 50")
    assert(c.query("UPDATE mfcust SET id = nextval('uford_s') WHERE id = 4")
      .tags === Seq("UPDATE 1"))
    assert(rows(c, "SELECT id FROM mfcust WHERE id = 50") === Seq(Seq("50")))
    assert(rows(c, "SELECT cid FROM uford") === Seq(Seq("50")))
    c.query("DROP SEQUENCE uford_s")
    c.query("DROP TABLE uford"); c.query("DROP TABLE cford")
    c.query("DROP TABLE mford"); c.query("DROP TABLE mfcust")
    c.close()
  }

  test("constrained INSERT … ON CONFLICT RETURNING streams 50k rows without a driver collect") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS big_ret")
    assert(c.query("CREATE TABLE big_ret (id int PRIMARY KEY, v text)").errors === Nil)
    c.query("INSERT INTO big_ret VALUES (1, 'seed'), (2, 'seed')")
    // key SET, not size: earlier tests' localCheckpoint residue is
    // ContextCleaner-released on GC, which can fire MID-test and drop
    // the global count below the baseline (observed after the r18
    // nondet-SET FK test); the leak claim is "this test adds none"
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    // 50k proposed rows, 2 collide: the RETURNING rowset (49 998 rows)
    // rides the materialized-RDD stream (r14: this path collect()ed
    // the whole rowset to the driver)
    val r = c.query(
      "INSERT INTO big_ret SELECT CAST(id AS int), 'x' FROM range(1, 50001) " +
        "ON CONFLICT (id) DO NOTHING RETURNING *")
    assert(r.errors === Nil, r.errors)
    assert(r.rows.length === 49998)
    assert(r.tags === Seq("INSERT 0 49998"))
    // the stream drained: the persisted RETURNING blocks are released
    assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).isEmpty,
      "leaked persisted RETURNING rows")
    assert(rows(c, "SELECT count(*) FROM big_ret") === Seq(Seq("50000")))
    // portal Close mid-stream releases the constrained path too
    c.parse("sbig", "INSERT INTO big_ret VALUES (70001, 'y'), (70002, 'y') " +
      "ON CONFLICT (id) DO NOTHING RETURNING id")
    c.bind("pbig", "sbig", Nil)
    c.execute("pbig", maxRows = 1)
    assert(c.sync().errors === Nil)
    c.closeStmt('P', "pbig")
    assert(c.sync().errors === Nil)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).isEmpty,
      "leaked persisted RETURNING rows after portal Close")
    c.query("DROP TABLE big_ret")
    c.close()
  }

  test("UPDATE … FROM RETURNING streams without a driver collect and releases its caches") {
    PgSequences.reset()
    val c = connect()
    c.query("DROP TABLE IF EXISTS big_uf")
    c.query("DROP TABLE IF EXISTS big_ufs")
    c.query("CREATE TABLE big_uf (id int, v text)")
    c.query("CREATE TABLE big_ufs (k int, w text)")
    c.query("INSERT INTO big_uf SELECT CAST(id AS int), 'a' FROM range(1, 20001)")
    c.query("INSERT INTO big_ufs SELECT CAST(id AS int), 'B' FROM range(1, 10001)")
    // key SET, not size: earlier tests' localCheckpoint residue is
    // ContextCleaner-released on GC, which can fire MID-test and drop
    // the global count below the baseline (observed after the r18
    // nondet-SET FK test); the leak claim is "this test adds none"
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val r = c.query(
      "UPDATE big_uf SET v = s.w FROM big_ufs s WHERE big_uf.id = s.k RETURNING big_uf.id")
    assert(r.errors === Nil, r.errors)
    assert(r.rows.length === 10000)
    assert(r.tags === Seq("UPDATE 10000"))
    assert((spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore).isEmpty,
      "leaked rid/matched/RETURNING caches")
    assert(rows(c, "SELECT count(*) FROM big_uf WHERE v = 'B'") === Seq(Seq("10000")))
    c.query("DROP TABLE big_uf")
    c.query("DROP TABLE big_ufs")
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
