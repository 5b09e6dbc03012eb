package graft

import graft.pgwire.{Complete, Handlers, PgException, Session}

/** SAVEPOINT / RELEASE / ROLLBACK TO over the tag-only transaction
  * model. Every behavior here was captured live on pg 15 (round-14
  * session, scratch cluster on port 5499) before implementation:
  * 25P01 outside a block, 3B001 on unknown names, RELEASE popping the
  * named savepoint AND everything after it, ROLLBACK TO keeping the
  * named savepoint and clearing a Failed transaction (the ORM
  * nested-transaction recovery pattern), and the command tags
  * (SAVEPOINT / RELEASE / ROLLBACK).
  */
class SavepointSpec extends SparkSpec {

  private def run(session: Session, sql: String) =
    Handlers.execute(spark, session, sql)

  private def tagOf(r: graft.pgwire.PgResult): String = r match {
    case Complete(tag, _) => tag
    case other => fail(s"expected Complete, got $other")
  }

  test("savepoint lifecycle: tags match pg") {
    val s = new Session(1, "postgres", "postgres")
    assert(tagOf(run(s, "BEGIN")) === "BEGIN")
    assert(tagOf(run(s, "SAVEPOINT a")) === "SAVEPOINT")
    assert(tagOf(run(s, "ROLLBACK TO a")) === "ROLLBACK")
    assert(tagOf(run(s, "RELEASE a")) === "RELEASE")
    assert(tagOf(run(s, "COMMIT")) === "COMMIT")
  }

  test("outside a transaction block: 25P01 with pg's message") {
    val s = new Session(1, "postgres", "postgres")
    val e1 = intercept[PgException](run(s, "SAVEPOINT x"))
    assert(e1.code === "25P01")
    assert(e1.msg === "SAVEPOINT can only be used in transaction blocks")
    val e2 = intercept[PgException](run(s, "RELEASE SAVEPOINT x"))
    assert(e2.code === "25P01")
    val e3 = intercept[PgException](run(s, "ROLLBACK TO SAVEPOINT x"))
    assert(e3.code === "25P01")
    assert(e3.msg === "ROLLBACK TO SAVEPOINT can only be used in transaction blocks")
  }

  test("unknown savepoint name: 3B001") {
    val s = new Session(1, "postgres", "postgres")
    run(s, "BEGIN")
    val e1 = intercept[PgException](run(s, "ROLLBACK TO SAVEPOINT nope"))
    assert(e1.code === "3B001")
    assert(e1.msg === """savepoint "nope" does not exist""")
    val e2 = intercept[PgException](run(s, "RELEASE SAVEPOINT nope"))
    assert(e2.code === "3B001")
  }

  test("ROLLBACK TO recovers a failed transaction (ORM pattern)") {
    val s = new Session(1, "postgres", "postgres")
    run(s, "BEGIN")
    run(s, "SAVEPOINT sp1")
    intercept[Exception](run(s, "SELECT 1/0"))
    s.txn = s.Failed // the server loop marks Failed on statement error
    // any ordinary statement is now rejected...
    val blocked = intercept[PgException](run(s, "SELECT 42"))
    assert(blocked.code === "25P02") // in_failed_sql_transaction (live-pinned)
    // ...but ROLLBACK TO passes the guard and clears the failure
    assert(tagOf(run(s, "ROLLBACK TO sp1")) === "ROLLBACK")
    assert(s.txn === s.InTxn)
    run(s, "SELECT 42") // works again
    assert(tagOf(run(s, "COMMIT")) === "COMMIT")
  }

  test("RELEASE pops the named savepoint and everything after it") {
    val s = new Session(1, "postgres", "postgres")
    run(s, "BEGIN")
    run(s, "SAVEPOINT a")
    run(s, "SAVEPOINT b")
    run(s, "RELEASE SAVEPOINT a") // pops a AND b (live-pinned)
    val e = intercept[PgException](run(s, "ROLLBACK TO b"))
    assert(e.code === "3B001")
  }

  test("ROLLBACK TO keeps the named savepoint, pops later ones") {
    val s = new Session(1, "postgres", "postgres")
    run(s, "BEGIN")
    run(s, "SAVEPOINT a")
    run(s, "SAVEPOINT b")
    run(s, "ROLLBACK TO a")
    // a survives (pg allows repeated rollbacks to it); b is gone
    assert(tagOf(run(s, "ROLLBACK TO a")) === "ROLLBACK")
    val e = intercept[PgException](run(s, "ROLLBACK TO b"))
    assert(e.code === "3B001")
  }

  test("identifier rules: quoted preserves case, unquoted folds") {
    val s = new Session(1, "postgres", "postgres")
    run(s, "BEGIN")
    run(s, "SAVEPOINT MySp")
    assert(tagOf(run(s, "ROLLBACK TO mysp")) === "ROLLBACK")
    run(s, """SAVEPOINT "Quoted"""")
    val e = intercept[PgException](run(s, "ROLLBACK TO quoted"))
    assert(e.code === "3B001")
    assert(tagOf(run(s, """ROLLBACK TO "Quoted"""")) === "ROLLBACK")
  }

  test("plain ROLLBACK / COMMIT / BEGIN clear the savepoint stack") {
    val s = new Session(1, "postgres", "postgres")
    run(s, "BEGIN"); run(s, "SAVEPOINT a"); run(s, "ROLLBACK")
    run(s, "BEGIN")
    val e = intercept[PgException](run(s, "ROLLBACK TO a"))
    assert(e.code === "3B001")
    run(s, "SAVEPOINT b"); run(s, "COMMIT"); run(s, "BEGIN")
    val e2 = intercept[PgException](run(s, "ROLLBACK TO b"))
    assert(e2.code === "3B001")
  }

  test("LOCK TABLE: no-op in a block, 25P01 outside, 42P01 on missing") {
    val s = new Session(1, "postgres", "postgres")
    import spark.implicits._
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("locked_t")
    val e1 = intercept[PgException](run(s, "LOCK TABLE locked_t"))
    assert(e1.code === "25P01")
    assert(e1.msg === "LOCK TABLE can only be used in transaction blocks")
    run(s, "BEGIN")
    assert(tagOf(run(s, "LOCK TABLE locked_t")) === "LOCK TABLE")
    assert(tagOf(run(s,
      "LOCK TABLE ONLY public.locked_t IN ACCESS EXCLUSIVE MODE NOWAIT")) === "LOCK TABLE")
    val e2 = intercept[PgException](run(s, "LOCK TABLE nosuch_t"))
    assert(e2.code === "42P01")
    run(s, "COMMIT")
  }

  test("VACUUM/ANALYZE: validated no-ops with pg's gates") {
    val s = new Session(1, "postgres", "postgres")
    import spark.implicits._
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("vac_t")
    assert(tagOf(run(s, "VACUUM")) === "VACUUM")
    assert(tagOf(run(s, "ANALYZE")) === "ANALYZE")
    assert(tagOf(run(s, "VACUUM (FULL, ANALYZE) vac_t")) === "VACUUM")
    assert(tagOf(run(s, "VACUUM FULL VERBOSE vac_t")) === "VACUUM")
    assert(tagOf(run(s, "ANALYZE VERBOSE vac_t")) === "ANALYZE")
    val e1 = intercept[PgException](run(s, "VACUUM nosuch_t"))
    assert(e1.code === "42P01")
    val e2 = intercept[PgException](run(s, "ANALYZE nosuch_t"))
    assert(e2.code === "42P01")
    run(s, "BEGIN")
    val e3 = intercept[PgException](run(s, "VACUUM"))
    assert(e3.code === "25001")
    assert(e3.msg === "VACUUM cannot run inside a transaction block")
    assert(tagOf(run(s, "ANALYZE vac_t")) === "ANALYZE") // allowed in txn
    run(s, "COMMIT")
  }

  test("ROLLBACK WORK TO SAVEPOINT grammar variant") {
    val s = new Session(1, "postgres", "postgres")
    run(s, "BEGIN")
    run(s, "SAVEPOINT sp")
    assert(tagOf(run(s, "ROLLBACK WORK TO SAVEPOINT sp")) === "ROLLBACK")
  }
}
