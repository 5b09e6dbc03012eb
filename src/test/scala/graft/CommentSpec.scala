package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.{Complete, Handlers, PgCatalog, PgException, PgFunctions, RowSet, Session}

/** COMMENT ON over the wire: storage, the obj_description /
  * col_description read path (what psql `\d+` and DBeaver consume),
  * pg_description rows, IS NULL removal, and the error codes — all
  * captured on live pg 15 (round-14 scratch cluster) first.
  */
class CommentSpec extends SparkSpec with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    import spark.implicits._
    Seq((1, "x"), (2, "y")).toDF("a", "b").createOrReplaceTempView("ct")
    PgCatalog.registerAll(spark)
    PgFunctions.registerAll(spark)
  }

  override def afterAll(): Unit = {
    // comments are process-global registry state — leave none behind
    try Handlers.execute(spark, s, "COMMENT ON TABLE ct IS NULL")
    catch { case scala.util.control.NonFatal(_) => }
    try Handlers.execute(spark, s, "COMMENT ON COLUMN ct.a IS NULL")
    catch { case scala.util.control.NonFatal(_) => }
    super.afterAll()
  }

  private def s = new Session(1, "postgres", "postgres")

  private def tag(sql: String): String =
    Handlers.execute(spark, s, sql) match {
      case Complete(t, _) => t
      case other => fail(s"unexpected $other")
    }

  private def one(sql: String): Any =
    Handlers.execute(spark, s, sql) match {
      case RowSet(_, it, _, _) => it.next().get(0)
      case other => fail(s"expected rows, got $other")
    }

  test("table and column comments round-trip through the read functions") {
    assert(tag("COMMENT ON TABLE ct IS 'a table comment'") === "COMMENT")
    assert(tag("COMMENT ON COLUMN ct.a IS 'col a comment'") === "COMMENT")
    assert(one("SELECT obj_description('ct'::regclass, 'pg_class')")
      === "a table comment")
    assert(one("SELECT col_description('ct'::regclass, 1)") === "col a comment")
    // single-arg obj_description defaults to pg_class (Compat arity fill)
    assert(one("SELECT obj_description('ct'::regclass)") === "a table comment")
    // pg_description rows: subid 0 = relation, 1 = column a
    assert(one("SELECT count(*) FROM pg_description WHERE objsubid = 0") === 1L)
    assert(one(
      "SELECT description FROM pg_description WHERE objsubid = 1") === "col a comment")
  }

  test("IS NULL removes; escaped quotes preserved") {
    tag("COMMENT ON TABLE ct IS 'it''s quoted'")
    assert(one("SELECT obj_description('ct'::regclass, 'pg_class')")
      === "it's quoted")
    tag("COMMENT ON TABLE ct IS NULL")
    assert(one("SELECT obj_description('ct'::regclass, 'pg_class') IS NULL") === true)
  }

  test("error codes match pg: 42P01, 42703, 0A000") {
    val e1 = intercept[PgException](tag("COMMENT ON TABLE nosuch IS 'x'"))
    assert(e1.code === "42P01")
    val e2 = intercept[PgException](tag("COMMENT ON COLUMN ct.nosuch IS 'x'"))
    assert(e2.code === "42703")
    assert(e2.msg === """column "nosuch" of relation "ct" does not exist""")
    val e3 = intercept[PgException](tag("COMMENT ON DATABASE postgres IS 'x'"))
    assert(e3.code === "0A000")
  }
}
