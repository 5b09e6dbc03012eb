package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.{Handlers, PgCatalog, PgException, PgFunctions, RowSet, Session}

/** pg EXPLAIN grammar over the handler path: option parsing, the
  * QUERY PLAN row shape, ANALYZE's execute-then-summarize contract,
  * and the honest 0A000 guards (DML, non-text formats).
  */
class ExplainSpec extends SparkSpec with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    import spark.implicits._
    (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("expl_t")
    PgCatalog.registerAll(spark)
    PgFunctions.registerAll(spark)
  }

  private def rows(sql: String): (Seq[String], String) = {
    val session = new Session(1, "postgres", "postgres")
    Handlers.execute(spark, session, sql) match {
      case RowSet(schema, it, tagFor, _) =>
        assert(schema.fields.map(_.name).toSeq === Seq("QUERY PLAN"))
        val out = it.map(_.getString(0)).toVector
        (out, tagFor(out.size))
      case other => fail(s"expected RowSet, got $other")
    }
  }

  test("plain EXPLAIN renders the physical plan, tag EXPLAIN") {
    val (plan, tag) = rows("EXPLAIN SELECT id FROM expl_t WHERE id > 10 ORDER BY id")
    assert(tag === "EXPLAIN")
    val text = plan.mkString("\n")
    assert(text.contains("Physical Plan"))
    assert(text.toLowerCase.contains("sort"))
  }

  test("EXPLAIN VERBOSE adds the logical/optimized trees") {
    val (plan, _) = rows("EXPLAIN VERBOSE SELECT count(*) FROM expl_t")
    val text = plan.mkString("\n")
    assert(text.contains("Parsed Logical Plan") || text.contains("Analyzed Logical Plan"))
    assert(text.contains("Physical Plan"))
  }

  test("EXPLAIN ANALYZE executes and appends pg-style summary lines") {
    val (plan, _) = rows("EXPLAIN ANALYZE SELECT v FROM expl_t WHERE id % 2 = 0")
    val text = plan.mkString("\n")
    assert(text.contains("Planning Time:"))
    assert(text.contains("Execution Time:"))
    assert(text.contains("Rows: 25"))
  }

  test("parenthesized option list: ANALYZE off/on, advisory options accepted") {
    val (p1, _) = rows("EXPLAIN (ANALYZE false, COSTS OFF) SELECT 1 AS x")
    assert(!p1.mkString("\n").contains("Execution Time:"))
    val (p2, _) = rows("EXPLAIN (ANALYZE, TIMING, FORMAT TEXT) SELECT 1 AS x")
    assert(p2.mkString("\n").contains("Execution Time:"))
  }

  test("FORMAT JSON/YAML emit one well-formed document; XML raises; unknown option raises 42601") {
    val (j, _) = rows("EXPLAIN (FORMAT JSON) SELECT 1 AS x")
    assert(j.length === 1)
    val doc = j.head
    assert(doc.trim.startsWith("[") && doc.trim.endsWith("]"))
    assert(doc.contains("\"Plan\":") && doc.contains("\"Plan Lines\":"))
    val (y, _) = rows("EXPLAIN (FORMAT YAML) SELECT 1 AS x")
    assert(y.length === 1 && y.head.startsWith("- Plan:"))
    val e1 = intercept[PgException](rows("EXPLAIN (FORMAT XML) SELECT 1"))
    assert(e1.code === "0A000")
    val e2 = intercept[PgException](rows("EXPLAIN (FRABJOUS) SELECT 1"))
    assert(e2.code === "42601")
  }

  test("EXPLAIN of DML plans the row side WITHOUT executing") {
    val before = spark.table("expl_t").count()
    val (pi, _) = rows("EXPLAIN INSERT INTO expl_t VALUES (999, 'boom')")
    assert(pi.mkString("\n").contains("Physical Plan"))
    assert(spark.table("expl_t").count() === before, "EXPLAIN INSERT executed!")
    val (pu, _) = rows("EXPLAIN UPDATE expl_t SET v = 'x' WHERE id = 1")
    assert(pu.mkString("\n").contains("Physical Plan"))
    val (pd, _) = rows("EXPLAIN DELETE FROM expl_t WHERE id = 1")
    assert(pd.mkString("\n").contains("Physical Plan"))
    // the UPDATE … FROM join shows in the plan
    val (pj, _) = rows(
      "EXPLAIN UPDATE expl_t SET v = s.v FROM expl_t s WHERE expl_t.id = s.id")
    assert(pj.mkString("\n").toLowerCase.contains("join"))
    assert(spark.table("expl_t").count() === before)
  }

  test("EXPLAIN ANALYZE <dml> executes the write and reports plan + timing (r16)") {
    val session = new Session(7, "postgres", "postgres")
    def run(sql: String) = Handlers.execute(spark, session, sql)
    run("DROP TABLE IF EXISTS expl_w")
    run("CREATE TABLE expl_w (id int PRIMARY KEY, v text)")
    run("INSERT INTO expl_w VALUES (1, 'a'), (2, 'b')")
    // INSERT under ANALYZE actually writes and reports the tag count
    val (pi, ti) = rows("EXPLAIN ANALYZE INSERT INTO expl_w VALUES (3, 'c'), (4, 'd')")
    assert(ti === "EXPLAIN")
    val texti = pi.mkString("\n")
    assert(texti.contains("Planning Time:") && texti.contains("Execution Time:"))
    assert(texti.contains("Rows: 2 (INSERT 0 2)"), texti)
    assert(spark.table("expl_w").count() === 4)
    // UPDATE: executes, row count from the tag
    val (pu, _) = rows("EXPLAIN ANALYZE UPDATE expl_w SET v = 'x' WHERE id > 2")
    assert(pu.mkString("\n").contains("Rows: 2 (UPDATE 2)"), pu.mkString("\n"))
    assert(Handlers.runSql(spark, "SELECT count(*) FROM expl_w WHERE v = 'x'")
      .head().getLong(0) === 2)
    // DELETE with RETURNING: the stream is drained and discarded (pg
    // discards ANALYZE output rows too), count still reported
    val (pd, _) = rows("EXPLAIN ANALYZE DELETE FROM expl_w WHERE id = 1 RETURNING *")
    assert(pd.mkString("\n").contains("Rows: 1 (DELETE 1)"), pd.mkString("\n"))
    assert(spark.table("expl_w").count() === 3)
    // constraint failures surface as the DML's own error, not a plan
    val e = intercept[PgException](
      rows("EXPLAIN ANALYZE INSERT INTO expl_w VALUES (2, 'dup')"))
    assert(e.code === "23505")
    run("DROP TABLE expl_w")
  }

  test("EXPLAIN over a pg-dialect query runs the compat rewrite first") {
    val (plan, _) = rows(
      "EXPLAIN SELECT '10.1.2.5/24'::inet << '10.0.0.0/8'::cidr AS contained")
    assert(plan.mkString("\n").contains("Physical Plan"))
  }
}
