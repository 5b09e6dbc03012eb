package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.{PgSequences, PgServer}

/** Randomized DML state-machine differential, pinned (sweep-36): 42
  * INSERT/UPDATE/DELETE statements over a serial/int/text/float table
  * with a full sorted table-state dump after every mutation, captured
  * from live pg 15 running the identical script
  * (src/test/resources/dml/). Covers 3VL WHERE matching, multi-row
  * inserts, CASE/expression SETs, multi-column row assignment,
  * `a = DEFAULT` NULLing, serial allocation parity across the whole
  * interleaving, and the exact `INSERT n`/`UPDATE n`/`DELETE n` tags.
  *
  * Known unspecified-order deviation (not exercised here): WHICH
  * matched row receives WHICH value when one UPDATE sets a serial
  * column to DEFAULT across several rows — pg hands values out in
  * heap-scan order, the engine in its scan order; the allocated SET
  * is identical.
  */
class PgDmlParitySpec extends SparkSpec with BeforeAndAfterAll {

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

  private def resource(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing test resource $name")
    try scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8)
      .getLines().toVector
    finally in.close()
  }

  private def replay(script: String, live: String): Unit = {
    PgSequences.reset()
    val c = new Client(server.boundPort)
    c.startup()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    resource(script).filter(_.trim.nonEmpty).foreach { line =>
      if (line.startsWith("?")) {
        val table = line.drop(1).trim
        val r = c.query(s"SELECT * FROM $table")
        assert(r.errors === Nil, s"state dump: ${r.errors}")
        val rows = r.rows.map(_.map(_.getOrElse("\\N")).mkString("|")).sorted
        out += s"STATE $table ${rows.size}"
        out ++= rows
      } else if (line.startsWith(">")) {
        val r = c.query(line.drop(1).trim)
        if (r.errors.nonEmpty) out += s"ROWS ERR ${r.errors.head._1}"
        else {
          val rows = r.rows.map(_.map(_.getOrElse("\\N")).mkString("|")).sorted
          out += s"ROWS ${rows.size}"
          out ++= rows
          out += s"TAG ${r.tags.headOption.getOrElse("OK")}"
        }
      } else if (line.startsWith("!")) {
        val r = c.query(line.drop(1).trim)
        if (r.errors.nonEmpty) out += s"Q ERR ${r.errors.head._1}"
        else {
          val rows = r.rows.map(_.map(_.getOrElse("\\N")).mkString("|")).sorted
          out += s"Q ${rows.size}"
          out ++= rows
        }
      } else {
        val r = c.query(line)
        val tag = r.tags.headOption.getOrElse(
          r.errors.headOption.map("ERR " + _._1).getOrElse("OK"))
        out += s"TAG $tag"
      }
    }
    c.close()
    val want = resource(live)
    assert(out.size === want.size, "line count")
    out.zip(want).zipWithIndex.foreach { case ((got, expect), i) =>
      assert(got === expect, s"line ${i + 1}")
    }
  }

  test("sweep-36: randomized DML script matches live pg state after every statement") {
    replay("/dml/script1.sql", "/dml/live1.txt")
  }

  test("sweep-36c: driver-literal serial reservation matches live pg value-for-value") {
    // the round-15 VALUES allocator: serial fills and DEFAULT cells as
    // reserved literals. Pins row↔value binding in VALUES order,
    // interleaved explicit ids (99), DEFAULT-keyword draws, RETURNING
    // echo of reserved values, burned reservations on statements that
    // later fail (23505 after one draw — live pg burns exactly one),
    // ON CONFLICT DO NOTHING / DO UPDATE over serial draws, and the
    // sequence state probes between. Captured with the fixed
    // pg_capture (single-execution SQLSTATE harvesting — the re-run
    // fallback double-burned draws and corrupted serial fixtures).
    replay("/dml/script6.sql", "/dml/live6.txt")
  }

  test("sweep-36b: family-typed DML (int4range/enum/numeric columns) matches live pg") {
    // exercises SET/WHERE over stored family columns — the run that
    // exposed the bare `r @> 3` range-element gap (a stored range
    // column with a NUMBER operand now dispatches through pg_contains
    // and the analyzer metadata retype)
    replay("/dml/script2.sql", "/dml/live2.txt")
  }

  test("sweep-38: randomized UPDATE…FROM / DELETE…USING matches live pg") {
    // 46 mutations over a serial target joined against two source
    // tables: single/multi FROM items, JOIN and subquery items,
    // self-join, multi-column row assignment from FROM columns, 3VL,
    // RETURNING with target+FROM references, `UPDATE n`/`DELETE n`
    // counted once per target row however many FROM rows match
    replay("/dml/script3.sql", "/dml/live3.txt")
  }

  test("sweep-38b: UPDATE…FROM / DELETE…USING edges match live pg") {
    // alias-free cross join (no WHERE), ONLY, AS-aliases, LEFT JOIN
    // in the FROM items (NULL-extended RETURNING), empty-match
    // UPDATE 0, RETURNING expression aliases, and constrained
    // targets: SET NOT NULL col to NULL → 23502, SET pk to an
    // existing key → 23505 — live-pinned
    replay("/dml/script3b.sql", "/dml/live3b.txt")
  }

  test("sweep-39: CHECK constraints enforced + FK recorded, matches live pg") {
    // column/table/named CHECKs with pg's auto-names (ck_a_check,
    // dup-suffix ck_b_check1) and pg_get_constraintdef parity; 23514
    // on INSERT/UPDATE/UPDATE…FROM/ON CONFLICT DO UPDATE; NULL result
    // passes; ALTER ADD CHECK validates existing rows ("violated by
    // some row") atomically; DROP CONSTRAINT lifts; RENAME COLUMN
    // rewrites stored exprs; DROP COLUMN cascades; FOREIGN KEY rows
    // surface in pg_constraint (contype 'f', condef) unenforced
    replay("/dml/script4.sql", "/dml/live4.txt")
  }

  test("sweep-36d: INSERT…SELECT serial count+reserve matches live pg value-for-value") {
    // the r16 two-pass allocator: block reservation sized by a count
    // pass, values as window arithmetic. Pins row↔value binding in
    // SELECT output order (ORDER BY asc, then desc over the same
    // source), empty-source statements drawing nothing, explicit-id
    // SELECT inserts not drawing, interleaved VALUES/DEFAULT draws,
    // RETURNING echo of block values, and last_value/is_called probes
    // between every statement
    replay("/dml/script8.sql", "/dml/live8.txt")
  }

  test("sweep-41: FOREIGN KEY enforcement matches live pg") {
    // 23503 on child INSERT/UPDATE (incl. ON CONFLICT both arms and
    // UPDATE…FROM), parent DELETE/UPDATE (incl. DELETE…USING),
    // MATCH SIMPLE null passes, composite keys, self-referencing FK
    // with in-batch references, ALTER ADD FK validates existing rows
    // atomically, DDL errors (42P01/42830/42704), RESTRICT action
    // rendering + enforcement, TRUNCATE-referenced 0A000, DROP-parent
    // 2BP01
    replay("/dml/script7.sql", "/dml/live7.txt")
  }

  test("sweep-41c: randomized FK state machine matches live pg after every statement") {
    // 130 seeded-random mutations over a parent + two FK children
    // (one ON DELETE RESTRICT): inserts/updates/deletes/upserts with
    // ~35% violation candidates — live pg raised 27× 23503 and
    // 18× 23505 in this trace, interleaved with full state dumps
    // every 9 statements; pins error-precedence (unique before FK,
    // both row-ordered) as well as the surviving state
    replay("/dml/script10.sql", "/dml/live10.txt")
  }

  test("sweep-41d: randomized FK UPDATE…FROM / DELETE…USING matches live pg") {
    // 90 seeded-random joined-DML mutations against FK tables: child
    // UPDATE…FROM driving the key from a join, parent DELETE…USING /
    // UPDATE…FROM rewriting referenced keys — live pg raised 43×
    // 23503 and 11× 23505 in this trace, state-dumped every 8
    // statements (the dmlWithFrom FK gates sweep-41c doesn't reach)
    replay("/dml/script11.sql", "/dml/live11.txt")
  }

  test("sweep-42: executed ON DELETE actions (CASCADE/SET NULL/SET DEFAULT) match live pg") {
    // r17 — referential actions EXECUTE instead of 0A000: 444
    // statements over a 2-level CASCADE chain (fp→fc→fg) with a NO
    // ACTION grandchild blocker (fx), SET NULL (fn, plus a NOT NULL
    // column → 23502), SET DEFAULT (fd, incl. the default key
    // vanishing in the same statement → 23503), a self-referencing
    // CASCADE tree (ft), DELETE…USING arms, and a RETURNING over a
    // cascading delete. Live pg raised 24× 23503, 8× 23505, 1× 23502
    // in this trace; full state dumps after every destructive wave.
    replay("/dml/script12.sql", "/dml/live12.txt")
  }

  test("sweep-43: executed ON UPDATE actions (CASCADE/SET NULL/SET DEFAULT) match live pg") {
    // r17 late batch — the last cut closed: 454 statements over a
    // natural-key 2-level CASCADE chain (up.id → uc.pid(PK) →
    // ug.cpid), SET NULL (incl. NOT NULL → 23502), SET DEFAULT (incl.
    // the default key vanishing in the same statement → 23503), a NO
    // ACTION blocker, a self-referencing CASCADE tree renumbering,
    // UPDATE…FROM key rewrites, non-key updates (actions must NOT
    // fire), and RETURNING over a cascading update. Live pg raised
    // 38× 23503, 3× 23505, 1× 23502 in this trace; full state dumps
    // after every key-rewriting wave.
    replay("/dml/script13.sql", "/dml/live13.txt")
  }

  test("sweep-45: nondeterministic SET on referenced keys fires ON UPDATE actions like live pg") {
    // r18 — the last FK cut closed: `UPDATE parent SET id = nextval(…)`
    // pre-draws into a persisted row-aligned (__o,__n) pair frame, so
    // CASCADE/SET NULL/SET DEFAULT children follow the SAME drawn
    // value the parent keeps (through r17 this arm was 0A000). 213
    // statements, single-row rewrites (pg's heap-order value
    // assignment is only deterministic per row), RETURNING carrying
    // the drawn value, setval repositioning probes, and the
    // default-key-vanishes 23503 coda. Sequence draw parity is exact
    // value-for-value across the whole trace.
    replay("/dml/script15.sql", "/dml/live15.txt")
  }

  test("sweep-44: transaction blocks with journal undo + deferred constraints match live pg") {
    // r18 — the write journal: 221 statements over randomized
    // BEGIN/COMMIT/ROLLBACK blocks with REAL undo (hardlink-snapshot
    // restore), SAVEPOINT / ROLLBACK TO / RELEASE partial undo,
    // failed-transaction state (25P02 guard incl. nested BEGIN,
    // COMMIT-as-ROLLBACK), TRUNCATE rolled back, DEFERRABLE
    // constraints (INITIALLY DEFERRED FK dcd_pid_fkey, on-demand
    // dci_pid_fkey, deferrable UNIQUE du_k_key) under SET CONSTRAINTS
    // flips — commit-time 23503/23505 roll the whole block back, SET
    // … IMMEDIATE raises outstanding violations mid-block, ROLLBACK
    // TO SAVEPOINT clears a queued violation, and FK ON DELETE
    // CASCADE fires inside a block and restores BOTH tables on
    // ROLLBACK. 73 error shapes in the live trace (23503/23505/
    // 25P02/42704/42809); dumps after every COMMIT/ROLLBACK. The
    // fixture was captured with tools/pg_capture_txn.py (single
    // psql session — transaction state must persist).
    replay("/dml/script14.sql", "/dml/live14.txt")
  }

  test("sweep-41b: TRUNCATE/DROP ... CASCADE over FK references matches live pg") {
    // TRUNCATE CASCADE pulls referencing tables in transitively;
    // DROP TABLE CASCADE drops the dependent CONSTRAINT and stops
    // (child data survives, later inserts are unconstrained);
    // RESTRICT tail accepted on an undepended table
    replay("/dml/script9.sql", "/dml/live9.txt")
  }

  test("sweep-40: sub-SELECT row assignment and correlated SET match live pg") {
    // `SET (a, b) = (SELECT …)` decomposed into per-column scalar
    // subqueries (no row → NULLs), correlated references against the
    // updated row, scalar-subquery SET both correlated and aggregate
    replay("/dml/script5.sql", "/dml/live5.txt")
  }

  test("sweep-37: ALTER TABLE / TRUNCATE state machine matches live pg") {
    // RENAME TO/COLUMN, ADD COLUMN (defaults fill, NOT NULL 23502,
    // 42701/IF NOT EXISTS), DROP COLUMN (42703, constraint+sequence
    // follow), ALTER TYPE (42804 + USING, default re-coercion:
    // numeric 1.5 → text → int yields default 2), SET/DROP
    // DEFAULT/NOT NULL, ADD/DROP CONSTRAINT (23505 `could not create
    // unique index`, 42P07/42P16/42704), TRUNCATE with
    // RESTART/CONTINUE IDENTITY, serial continuation across RENAME TO
    replay("/dml/alter1.sql", "/dml/alter1_live.txt")
  }

  test("sweep-37b: ALTER TABLE serial backfill, multi-action atomicity, constraint follow") {
    // ADD COLUMN serial numbers existing rows 1..n and the next
    // INSERT draws n+1; `ADD q1, DROP nosuch` leaves the table
    // untouched (atomic); dropping/renaming a key column
    // drops/renames through the unique registry
    replay("/dml/alter2.sql", "/dml/alter2_live.txt")
  }

  test("sweep-37c: CREATE/DROP INDEX, unique enforcement, pg_indexes, cascades") {
    // name reservation (42P07/IF NOT EXISTS), auto-names
    // (t_col_idx, function name for expression keys), UNIQUE index =
    // unique constraint (23505 `could not create unique index` on
    // existing dups, `duplicate key` on later INSERTs, DROP INDEX
    // lifts enforcement), DROP INDEX 42704/IF EXISTS, 2BP01 for a
    // constraint-backed index, pg_indexes rows incl. _pkey, and the
    // DROP COLUMN dependency cascade
    replay("/dml/alter3.sql", "/dml/alter3_live.txt")
  }
}
