package graft

import java.nio.file.{Files, Paths}
import org.scalatest.BeforeAndAfterAll
import graft.pgwire._

/** Handler-level spec for the r18 transaction write journal and
  * deferrable-constraint machinery. The full behavioral surface is
  * pinned against live pg 15 by sweep-44 (PgDmlParitySpec,
  * script14/live14 — 221 statements, 73 error shapes, one psql
  * session); this spec covers what the wire replay can't see:
  * journal directory hygiene, disconnect rollback, and the catalog
  * rendering of deferrability.
  */
class TxnJournalSpec extends SparkSpec with BeforeAndAfterAll {

  private val session = new Session(83, "postgres", "postgres")
  private def run(sql: String): PgResult = Handlers.execute(spark, session, sql)
  private def rows(sql: String): Seq[Seq[String]] = run(sql) match {
    case RowSet(_, rs, _, _) => rs.map(r => (0 until r.length).map(i =>
      Option(r.get(i)).map(_.toString).getOrElse("NULL")).toSeq).toSeq
    case other => fail(s"expected rows from $sql, got $other")
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    PgFunctions.registerAll(spark)
    PgCatalog.registerAll(spark)
    Seq("DROP TABLE IF EXISTS txj_c", "DROP TABLE IF EXISTS txj_t",
      "CREATE TABLE txj_t (id int PRIMARY KEY, v text)",
      "INSERT INTO txj_t VALUES (1, 'a'), (2, 'b')",
      "CREATE TABLE txj_c (id int PRIMARY KEY, " +
        "pid int CONSTRAINT txj_c_pid_fkey REFERENCES txj_t(id) " +
        "DEFERRABLE INITIALLY DEFERRED, " +
        "k int CONSTRAINT txj_c_k_key UNIQUE DEFERRABLE)"
    ).foreach(run)
  }

  override def afterAll(): Unit = {
    Seq("DROP TABLE IF EXISTS txj_c", "DROP TABLE IF EXISTS txj_t")
      .foreach(sql => scala.util.Try(run(sql)))
    super.afterAll()
  }

  private def warehouseTxnDirs(): Seq[String] = {
    val wh = Paths.get(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")) match {
      case u if u.getScheme == null => spark.conf.get("spark.sql.warehouse.dir")
      case u => u.getPath
    })
    val d = wh.resolve(".graft_txn")
    if (!Files.isDirectory(d)) Nil
    else {
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala.map(_.getFileName.toString).toSeq
    }
  }

  test("COMMIT and ROLLBACK leave no journal directories behind") {
    val before = warehouseTxnDirs().toSet
    run("BEGIN")
    run("INSERT INTO txj_t VALUES (10, 'x')")
    run("COMMIT")
    run("BEGIN")
    run("UPDATE txj_t SET v = 'y' WHERE id = 10")
    run("ROLLBACK")
    assert(rows("SELECT v FROM txj_t WHERE id = 10") === Seq(Seq("x")))
    assert(warehouseTxnDirs().toSet === before,
      "journal dirs must be discarded at transaction end")
    run("DELETE FROM txj_t WHERE id = 10")
  }

  test("disconnect mid-transaction rolls journaled writes back") {
    run("BEGIN")
    run("INSERT INTO txj_t VALUES (20, 'gone')")
    assert(rows("SELECT count(*) FROM txj_t WHERE id = 20") === Seq(Seq("1")))
    Handlers.abortOnDisconnect(spark, session)
    assert(session.txn === session.Idle)
    assert(rows("SELECT count(*) FROM txj_t WHERE id = 20") === Seq(Seq("0")))
  }

  test("pg_constraint carries condeferrable/condeferred; condef renders the suffix") {
    val fk = rows("SELECT condeferrable, condeferred FROM pg_constraint " +
      "WHERE conname = 'txj_c_pid_fkey'")
    assert(fk === Seq(Seq("true", "true")))
    val uk = rows("SELECT condeferrable, condeferred FROM pg_constraint " +
      "WHERE conname = 'txj_c_k_key'")
    assert(uk === Seq(Seq("true", "false")))
    val defn = rows("SELECT pg_get_constraintdef(oid) FROM pg_constraint " +
      "WHERE conname = 'txj_c_pid_fkey'")
    assert(defn.head.head.endsWith("DEFERRABLE INITIALLY DEFERRED"),
      s"condef missing deferral suffix: $defn")
  }

  test("deferred unique: duplicate allowed mid-txn, repaired before COMMIT") {
    run("BEGIN")
    run("SET CONSTRAINTS txj_c_k_key DEFERRED")
    run("INSERT INTO txj_c VALUES (1, 1, 7)")
    run("INSERT INTO txj_c VALUES (2, 1, 7)") // dup k, deferred
    run("UPDATE txj_c SET k = 8 WHERE id = 2") // repair
    run("COMMIT")
    assert(rows("SELECT count(*) FROM txj_c") === Seq(Seq("2")))
    run("DELETE FROM txj_c")
  }

  test("commit-time 23505 rolls the whole transaction back") {
    run("BEGIN")
    run("SET CONSTRAINTS txj_c_k_key DEFERRED")
    run("INSERT INTO txj_c VALUES (3, 1, 9)")
    run("INSERT INTO txj_c VALUES (4, 1, 9)")
    val e = intercept[PgException](run("COMMIT"))
    assert(e.code === "23505")
    assert(session.txn === session.Idle) // pg: ERROR then ReadyForQuery I
    assert(rows("SELECT count(*) FROM txj_c") === Seq(Seq("0")))
  }
}
