package graft

import scala.sys.process._

/** postgres_fdw loop-back e2e: a REAL PostgreSQL 15 server (scratch
  * cluster in /tmp, run as the `postgres` system user) mounts the
  * in-process graft server as a FOREIGN SERVER and queries it through
  * stock `postgres_fdw` + libpq. This is the reference's hardest
  * integration test (`tests-integration/test_fdw.py`: IMPORT FOREIGN
  * SCHEMA, scans, aggregates, ORDER BY, DECLARE/FETCH cursor
  * lifecycle) — it drives the extended protocol, cursors,
  * transaction control (`START TRANSACTION ISOLATION LEVEL REPEATABLE
  * READ`), GUC setup (`SET search_path/timezone/datestyle/
  * extra_float_digits`), schema-qualified remote SQL (`public.t`),
  * and `LIMIT n::bigint` from a genuine libpq consumer — the exact
  * surface psql 15 (no \bind) cannot reach.
  *
  * Cancels (does not fail) when the PostgreSQL server toolchain or
  * postgres_fdw.so is not installed.
  */
class FdwE2eSpec extends SparkSpec {

  private val pgPort = 54399
  private val dataDir = s"/tmp/fdw_pgdata_${java.util.UUID.randomUUID.toString.take(8)}"

  private def haveTools: Boolean =
    Seq("/usr/bin/psql", "/usr/local/bin/psql").exists(new java.io.File(_).canExecute) &&
      new java.io.File("/usr/local/bin/initdb").canExecute &&
      new java.io.File("/usr/local/bin/pg_ctl").canExecute &&
      new java.io.File("/usr/lib/postgresql/15/lib/postgres_fdw.so").exists()

  private def sh(cmd: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(s => { out ++= s; out += '\n' },
      s => { out ++= s; out += '\n' }))
    (code, out.toString)
  }

  /** psql against the SCRATCH pg (not graft) over its unix socket. */
  private def pq(sql: String): (Int, String) = {
    val out = new StringBuilder
    val cmd = Seq("/usr/bin/psql", "-X", "-A", "-t", "-h", "/tmp",
      "-p", pgPort.toString, "-U", "postgres", "-d", "postgres",
      "-v", "ON_ERROR_STOP=1", "-P", "null=<NULL>", "-c", sql)
    val code = Process(cmd, None, "PGCONNECT_TIMEOUT" -> "10")
      .!(ProcessLogger(s => { out ++= s; out += '\n' }, s => { out ++= s; out += '\n' }))
    (code, out.toString)
  }

  private def pqScript(script: String): (Int, String) = {
    val out = new StringBuilder
    val cmd = Seq("/usr/bin/psql", "-X", "-A", "-t", "-h", "/tmp",
      "-p", pgPort.toString, "-U", "postgres", "-d", "postgres",
      "-v", "ON_ERROR_STOP=1")
    val in = new java.io.ByteArrayInputStream(script.getBytes("UTF-8"))
    val code = (Process(cmd, None, "PGCONNECT_TIMEOUT" -> "10") #< in)
      .!(ProcessLogger(s => { out ++= s; out += '\n' }, s => { out ++= s; out += '\n' }))
    (code, out.toString)
  }

  private var server: Option[pgwire.PgServer] = None
  private var clusterUp = false

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (haveTools) {
      // in-process graft server over the sf0.001 tables
      val (_, srv) = Cli.serve(Array(
        "--parquet", "nation:/root/testdata/sf0.001/nation.parquet",
        "--parquet", "region:/root/testdata/sf0.001/region.parquet",
        "--parquet", "orders:/root/testdata/sf0.001/orders.parquet",
        "--parquet", "embeddings:/root/testdata/sf0.001/embeddings.parquet",
        "--host", "127.0.0.1", "-p", "0"))
      server = Some(srv)
      // scratch pg 15 cluster, owned by the postgres system user
      new java.io.File(dataDir).mkdirs()
      sh(Seq("chown", "postgres", dataDir))
      val (c1, o1) = sh(Seq("su", "postgres", "-c",
        s"/usr/local/bin/initdb -D $dataDir -U postgres -A trust"))
      assert(c1 == 0, s"initdb failed: $o1")
      val (c2, o2) = sh(Seq("su", "postgres", "-c",
        s"/usr/local/bin/pg_ctl -D $dataDir -o '-p $pgPort -k /tmp' -l $dataDir/log start"))
      assert(c2 == 0, s"pg_ctl start failed: $o2")
      clusterUp = true
      // FDW wiring: server → the in-process graft port
      val port = srv.boundPort
      assert(pq("CREATE EXTENSION postgres_fdw")._1 == 0)
      assert(pq(
        s"""CREATE SERVER graft_server FOREIGN DATA WRAPPER postgres_fdw
           |OPTIONS (host '127.0.0.1', port '$port', dbname 'postgres')""".stripMargin)._1 == 0)
      assert(pq(
        """CREATE USER MAPPING FOR postgres SERVER graft_server
          |OPTIONS (user 'postgres', password 'pg')""".stripMargin)._1 == 0)
      assert(pq(
        """CREATE FOREIGN TABLE f_nation (n_nationkey int, n_name text,
          |  n_regionkey int, n_comment text)
          |SERVER graft_server OPTIONS (table_name 'nation')""".stripMargin)._1 == 0)
      assert(pq(
        """CREATE FOREIGN TABLE f_region (r_regionkey int, r_name text, r_comment text)
          |SERVER graft_server OPTIONS (table_name 'region')""".stripMargin)._1 == 0)
      assert(pq(
        """CREATE FOREIGN TABLE f_orders (o_orderkey bigint, o_custkey bigint,
          |  o_orderstatus text, o_totalprice double precision, o_orderdate date)
          |SERVER graft_server OPTIONS (table_name 'orders')""".stripMargin)._1 == 0)
      assert(pq(
        """CREATE FOREIGN TABLE f_emb (vec_id bigint, embedding real[], label text)
          |SERVER graft_server OPTIONS (table_name 'embeddings')""".stripMargin)._1 == 0)
    }
  }

  override def afterAll(): Unit = {
    if (clusterUp) {
      sh(Seq("su", "postgres", "-c",
        s"/usr/local/bin/pg_ctl -D $dataDir -m immediate stop"))
      sh(Seq("rm", "-rf", dataDir))
    }
    server.foreach(_.stop())
    super.afterAll()
  }

  test("fdw: full scan and filtered scan through a live postgres_fdw") {
    assume(haveTools, "no PostgreSQL server toolchain installed")
    val (c1, o1) = pq("SELECT count(*) FROM f_nation")
    assert(c1 === 0, o1)
    assert(o1.trim === "25")
    val (c2, o2) = pq(
      "SELECT n_name FROM f_nation WHERE n_nationkey < 3 ORDER BY n_name")
    assert(c2 === 0, o2)
    assert(o2.trim.linesIterator.toSeq === Seq("NATION_0", "NATION_1", "NATION_2"))
  }

  test("fdw: join of two foreign tables with aggregation") {
    assume(haveTools, "no PostgreSQL server toolchain installed")
    val (c, o) = pq(
      """SELECT r.r_name, count(*) FROM f_nation n
        |JOIN f_region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin)
    assert(c === 0, o)
    assert(o.trim.linesIterator.toSeq ===
      Seq("AFRICA|5", "AMERICA|5", "ASIA|5", "EUROPE|5", "MIDDLE EAST|5"))
  }

  test("fdw: aggregates and ORDER BY ... LIMIT n::bigint remote SQL") {
    assume(haveTools, "no PostgreSQL server toolchain installed")
    val (c1, o1) = pq("SELECT avg(n_regionkey)::numeric(10,1), max(n_name) FROM f_nation")
    assert(c1 === 0, o1)
    assert(o1.trim === "2.0|NATION_9")
    // postgres_fdw writes `LIMIT 3::bigint` into its remote SQL
    val (c2, o2) = pq(
      "SELECT o_orderkey, o_orderdate FROM f_orders ORDER BY o_orderkey LIMIT 3")
    assert(c2 === 0, o2)
    assert(o2.trim.linesIterator.size === 3)
    assert(o2.trim.linesIterator.next().startsWith("0|"))
  }

  test("fdw: DECLARE/FETCH/CLOSE cursor lifecycle inside a transaction") {
    assume(haveTools, "no PostgreSQL server toolchain installed")
    val (c, o) = pqScript(
      """BEGIN;
        |DECLARE fdw_cur CURSOR FOR
        |  SELECT n_nationkey, n_name FROM f_nation ORDER BY n_nationkey;
        |FETCH FORWARD 3 FROM fdw_cur;
        |FETCH NEXT FROM fdw_cur;
        |CLOSE fdw_cur;
        |COMMIT;
        |""".stripMargin)
    assert(c === 0, o)
    val rows = o.linesIterator.filter(_.matches("\\d+\\|.*")).toSeq
    assert(rows === Seq("0|NATION_0", "1|NATION_1", "2|NATION_2", "3|NATION_3"))
  }

  test("fdw: NULL / date / real[] array type round-trips") {
    assume(haveTools, "no PostgreSQL server toolchain installed")
    // an empty aggregate produces SQL NULL on the remote; pg renders it
    val (c1, o1) = pq("SELECT max(n_name) FROM f_nation WHERE n_nationkey < 0")
    assert(c1 === 0, o1)
    assert(o1.trim === "<NULL>")
    val (c2, o2) = pq("SELECT o_orderdate FROM f_orders ORDER BY o_orderkey LIMIT 1")
    assert(c2 === 0, o2)
    assert(o2.trim.matches("\\d{4}-\\d{2}-\\d{2}"), o2)
    // float4[] comes back as a pg array pg can subscript and slice
    val (c3, o3) = pq(
      "SELECT cardinality(embedding) FROM f_emb ORDER BY vec_id LIMIT 1")
    assert(c3 === 0, o3)
    assert(o3.trim.toInt > 0)
    val (c4, o4) = pq(
      "SELECT embedding[1] IS NOT NULL FROM f_emb ORDER BY vec_id LIMIT 1")
    assert(c4 === 0, o4)
    assert(o4.trim === "t")
  }

  test("fdw: IMPORT FOREIGN SCHEMA discovers a served table") {
    assume(haveTools, "no PostgreSQL server toolchain installed")
    val (c1, o1) = pq(
      """IMPORT FOREIGN SCHEMA public LIMIT TO (region)
        |FROM SERVER graft_server INTO public""".stripMargin)
    assert(c1 === 0, o1)
    val (c2, o2) = pq("SELECT count(*) FROM region")
    assert(c2 === 0, o2)
    assert(o2.trim === "5")
    val (c3, o3) = pq("SELECT r_name FROM region ORDER BY r_regionkey LIMIT 1")
    assert(c3 === 0, o3)
    assert(o3.trim === "AFRICA")
  }
}
