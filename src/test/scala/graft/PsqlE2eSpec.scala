package graft

import scala.sys.process._

/** End-to-end test with a REAL PostgreSQL client: the `psql` binary
  * (libpq) from the container's PostgreSQL 15 installation, driven
  * against the in-process server. This is the live-client coverage
  * the reference gets from its integration suite
  * (`tests-integration/test_csv.py` runs psql-style clients over a
  * socket); every byte on the wire here is produced and consumed by
  * stock libpq, not by our own test client.
  *
  * Cancels (does not fail) when no psql binary is installed.
  */
class PsqlE2eSpec extends SparkSpec {

  private lazy val psqlPath: Option[String] =
    Seq("/usr/bin/psql", "/usr/local/bin/psql").find(p => new java.io.File(p).canExecute)

  /** Run psql -X (no rc file) unaligned tuples-only against the
    * server; returns (exit code, stdout, stderr). */
  private def psql(port: Int, sql: String, extraArgs: Seq[String] = Nil): (Int, String, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    val cmd = Seq(psqlPath.get, "-X", "-A", "-t", "-h", "127.0.0.1",
      "-p", port.toString, "-U", "postgres", "-d", "postgres",
      "-v", "ON_ERROR_STOP=1") ++ extraArgs ++ Seq("-c", sql)
    val code = Process(cmd, None, "PGCONNECT_TIMEOUT" -> "10")
      .!(ProcessLogger(s => { out ++= s; out += '\n' }, s => { err ++= s; err += '\n' }))
    (code, out.toString, err.toString)
  }

  /** Pipe a multi-line psql script via stdin — the only way psql
    * processes inline meta-commands like \bind. */
  private def psqlScript(port: Int, script: String): (Int, String, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    val cmd = Seq(psqlPath.get, "-X", "-A", "-t", "-h", "127.0.0.1",
      "-p", port.toString, "-U", "postgres", "-d", "postgres",
      "-v", "ON_ERROR_STOP=1")
    val in = new java.io.ByteArrayInputStream(script.getBytes("UTF-8"))
    val code = (Process(cmd, None, "PGCONNECT_TIMEOUT" -> "10") #< in)
      .!(ProcessLogger(s => { out ++= s; out += '\n' }, s => { err ++= s; err += '\n' }))
    (code, out.toString, err.toString)
  }

  private def withServer(f: Int => Unit): Unit = {
    val (_, server) = Cli.serve(Array(
      "--parquet", "nation:/root/testdata/sf0.001/nation.parquet",
      "--parquet", "region:/root/testdata/sf0.001/region.parquet",
      "--host", "127.0.0.1", "-p", "0"))
    try f(server.boundPort) finally server.stop()
  }

  test("psql: simple query round-trips typed values") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psql(port, "SELECT 1 AS one")
      assert(c1 === 0, e1)
      assert(o1.trim === "1")
      val (c2, o2, _) = psql(port,
        "SELECT 42::int8 AS i, 'txt' AS t, 1.5::float8 AS f, true AS b, " +
          "NULL AS n, ARRAY[1,2,3] AS a, DATE '2026-08-13' AS d")
      assert(c2 === 0)
      assert(o2.trim === "42|txt|1.5|t||{1,2,3}|2026-08-13")
      // count over the served parquet — the reference's smoke check
      val (c3, o3, _) = psql(port, "SELECT count(*) FROM nation")
      assert(c3 === 0)
      assert(o3.trim === "25")
    }
  }

  test("psql: materialized view lifecycle over the wire") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psqlScript(port,
        """CREATE MATERIALIZED VIEW big_nations AS
          |  SELECT n_name FROM nation WHERE n_nationkey >= 20;
          |SELECT count(*) FROM big_nations;
          |REFRESH MATERIALIZED VIEW big_nations;
          |SELECT matviewname, ispopulated FROM pg_matviews;
          |DROP MATERIALIZED VIEW big_nations;
          |""".stripMargin)
      assert(c1 === 0, s"out=$o1 err=$e1")
      assert(o1.contains("5"), o1)             // 25 nations, keys 20-24
      assert(o1.contains("big_nations|t"), o1) // pg_matviews row
      // \dm reads relkind 'm' through psql's real pg_class query
      val (c2, o2, e2) = psqlScript(port,
        """CREATE MATERIALIZED VIEW dm_probe AS SELECT 1 AS x;
          |\dm
          |DROP MATERIALIZED VIEW dm_probe;
          |""".stripMargin)
      assert(c2 === 0, s"out=$o2 err=$e2")
      assert(o2.contains("dm_probe"), o2)
      assert(o2.contains("materialized view"), o2)
    }
  }

  test("psql: savepoint recovery inside a failed transaction") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      // one statement per line → one wire message each (a single -c
      // batch would abort at the error, exactly like pg's simple
      // protocol); ON_ERROR_STOP off so the script continues past the
      // deliberate failure
      val (c1, o1, e1) = psqlScript(port,
        """\set ON_ERROR_STOP 0
          |BEGIN;
          |SAVEPOINT sp1;
          |SELECT no_such_col FROM nation;
          |ROLLBACK TO sp1;
          |SELECT 42 AS recovered;
          |COMMIT;
          |""".stripMargin)
      assert(c1 === 0, s"out=$o1 err=$e1")
      assert(o1.contains("42"), o1)
      assert(e1.toLowerCase.contains("error"), "the bad SELECT must error")
    }
  }

  test("psql: EXPLAIN and EXPLAIN ANALYZE render QUERY PLAN rows") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psql(port,
        "EXPLAIN SELECT n_name FROM nation WHERE n_nationkey > 5 ORDER BY n_name")
      assert(c1 === 0, e1)
      assert(o1.contains("Physical Plan"), o1)
      val (c2, o2, e2) = psql(port,
        "EXPLAIN (ANALYZE, COSTS OFF) SELECT count(*) FROM nation")
      assert(c2 === 0, e2)
      assert(o2.contains("Execution Time:"), o2)
      assert(o2.contains("Rows: 1"), o2)
      // EXPLAIN ANALYZE <dml> (r16): executes the write, reports the
      // tag count — verified through a real libpq client
      val (c3, o3, e3) = psqlScript(port,
        """DROP TABLE IF EXISTS expl_psql;
          |CREATE TABLE expl_psql (id int PRIMARY KEY, v text);
          |EXPLAIN ANALYZE INSERT INTO expl_psql VALUES (1, 'a'), (2, 'b');
          |SELECT count(*) AS n FROM expl_psql;
          |EXPLAIN ANALYZE DELETE FROM expl_psql WHERE id = 1;
          |SELECT count(*) AS n2 FROM expl_psql;
          |DROP TABLE expl_psql;""".stripMargin)
      assert(c3 === 0, e3)
      assert(o3.contains("Rows: 2 (INSERT 0 2)"), o3)
      assert(o3.contains("Rows: 1 (DELETE 1)"), o3)
      assert("(?s).*\\b2\\b.*".r.matches(o3), o3) // count after insert
      assert(o3.contains("1"), o3) // count after delete
    }
  }

  test("psql: real queries — join, agg, regex op, jsonpath op") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psql(port,
        "SELECT r.r_name, count(*) AS n FROM nation n JOIN region r " +
          "ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name ORDER BY r.r_name")
      assert(c1 === 0, e1)
      assert(o1.linesIterator.size === 5)
      assert(o1.linesIterator.next() === "AFRICA|5")
      val (c2, o2, _) = psql(port,
        "SELECT n_name FROM nation WHERE n_name ~ '^NATION_[12]$' ORDER BY n_name")
      assert(c2 === 0)
      assert(o2.trim.linesIterator.toSeq === Seq("NATION_1", "NATION_2"))
      val (c3, o3, _) = psql(port,
        """SELECT '{"a":[1,2,3]}' @? '$.a[*] ? (@ > 2)' AS hit""")
      assert(c3 === 0)
      assert(o3.trim === "t")
    }
  }

  test("psql: backslash introspection commands (\\dt, \\d table, \\df)") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      // \dt runs a multi-join pg_catalog query with ::regclass casts —
      // the heaviest client-SQL compat path, produced by real psql
      val (c1, o1, e1) = psql(port, "\\dt")
      assert(c1 === 0, e1)
      assert(o1.contains("nation") && o1.contains("region"))
      val (c2, o2, e2) = psql(port, "\\d nation")
      assert(c2 === 0, e2)
      assert(o2.contains("n_nationkey") && o2.contains("integer"))
      assert(o2.contains("n_name") && o2.contains("text"))
      val (c3, o3, e3) = psql(port, "\\df abs")
      assert(c3 === 0, e3)
      assert(o3.contains("abs"))
      val (c4, o4, e4) = psql(port, "\\dn")
      assert(c4 === 0, e4)
      assert(o4.contains("public"))
    }
  }

  test("psql: multi-statement scripts, transactions, errors") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      // (psql 15 has no \bind — extended protocol stays covered by
      // JdbcWireSpec's pgjdbc byte replay)
      val (c1, o1, e1) = psqlScript(port,
        "SELECT n_name FROM nation WHERE n_nationkey = 7;\n" +
          "SELECT count(*) AS c FROM nation WHERE n_regionkey < 2;\n")
      assert(c1 === 0, e1)
      assert(o1.trim.linesIterator.toSeq.head === "NATION_7")
      // transaction tags through libpq
      val (c2, o2, e2) = psql(port, "BEGIN; SELECT 1; COMMIT;")
      assert(c2 === 0, e2)
      // a SQL error yields a pg-shaped message and nonzero exit
      val (c3, _, e3) = psql(port, "SELECT * FROM no_such_table")
      assert(c3 !== 0)
      assert(e3.contains("ERROR"))
      // the connection-level session survives errors: new connection fine
      val (c4, o4, _) = psql(port, "SELECT 2")
      assert(c4 === 0 && o4.trim === "2")
    }
  }

  test("psql: SET/SHOW GUCs and server parameter reporting") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psql(port, "SET extra_float_digits = 0; SHOW extra_float_digits;")
      assert(c1 === 0, e1)
      assert(o1.trim.endsWith("0"))
      val (c2, o2, _) = psql(port, "SHOW server_version")
      assert(c2 === 0)
      assert(o2.trim.nonEmpty)
    }
  }

  test("psql: TIME pseudo-type round-trips through a live libpq client") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psql(port, "SELECT '12:34:56'::time")
      assert(c1 === 0, e1)
      assert(o1.trim === "12:34:56")
      val (c2, o2, e2) = psql(port, "SELECT TIME '23:59:59.25'")
      assert(c2 === 0, e2)
      assert(o2.trim === "23:59:59.25")
      // (extended-protocol TIME params are covered byte-level in
      // PgServerSpec — psql 15 has no \bind, it arrived in psql 16)
      // pg error SQLSTATE surfaces through libpq
      val (c4, _, e4) = psql(port, "SELECT '25:00'::time")
      assert(c4 !== 0)
      assert(e4.contains("out of range"), e4)
    }
  }

  test("psql: geometry renders hex EWKB through live libpq") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psql(port,
        "SELECT st_setsrid(st_makepoint(1, 2), 4326) AS g, " +
          "st_astext('POINT(3 4)'::geometry) AS t, " +
          "st_distance(st_makepoint(0,0), st_makepoint(3,4)) AS d")
      assert(c1 === 0, e1)
      assert(o1.trim ===
        "0101000020E6100000000000000000F03F0000000000000040|POINT(3 4)|5")
    }
  }

  test("psql: range types round-trip through live libpq") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psql(port,
        "SELECT int4range(1, 5, '[]') AS r, int4range(1, 10) @> 5 AS c, " +
          "'[1,5)'::int4range + int4range(5, 9) AS u, " +
          "isempty(numrange(2, 2)) AS e")
      assert(c1 === 0, e1)
      assert(o1.trim === "[1,6)|t|[1,9)|t")
      // error SQLSTATE surfaces through libpq
      val (c2, _, e2) = psql(port, "SELECT numrange(5, 1)")
      assert(c2 !== 0)
      assert(e2.contains("lower bound must be less than or equal"), e2)
    }
  }

  test("psql: text search + trigram similarity through live libpq") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psql(port,
        "SELECT to_tsvector('english', 'The jumping foxes') AS v, " +
          "to_tsvector('fat cats') @@ plainto_tsquery('fat cat') AS m, " +
          "ts_headline('simple', 'a target here', 'target'::tsquery) AS h, " +
          "floor(similarity('word', 'two words') * 1000) AS s")
      assert(c1 === 0, e1)
      assert(o1.trim === "'fox':3 'jump':2|t|a <b>target</b> here|363")
    }
  }

  test("psql: round-11 type families through live libpq") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c1, o1, e1) = psql(port,
        "SELECT '10.1.2.3/8'::inet AS i, network('192.168.1.5/24'::inet) AS n, " +
          "B'1010' # B'0110' AS x, 42::bit(8) AS b, " +
          "'08-00-2b-01-02-03'::macaddr AS m")
      assert(c1 === 0, e1)
      assert(o1.trim === "10.1.2.3/8|192.168.1.0/24|1100|00101010|08:00:2b:01:02:03")
      val (c2, o2, e2) = psql(port,
        "SELECT xmlelement(name foo, xmlattributes(42 as a), 'x<y') AS x, " +
          "array_to_string(xpath('/a/b/text()', '<a><b>one</b><b>two</b></a>'::xml), ',') AS p")
      assert(c2 === 0, e2)
      assert(o2.trim === "<foo a=\"42\">x&lt;y</foo>|one,two")
      // enum DDL lifecycle + declared-order semantics over a live
      // connection (pg sorts by label position: sad < ok < happy)
      val (c3, o3, e3) = psqlScript(port,
        """CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy');
          |SELECT 'ok'::mood;
          |SELECT string_agg(m, ',' ORDER BY m::mood) AS s,
          |  min(m::mood) AS lo, max(m::mood) AS hi
          |  FROM (VALUES ('happy'), ('sad'), ('ok')) t(m);
          |SELECT 'sad'::mood < 'happy' AS lt;
          |DROP TYPE mood;""".stripMargin)
      assert(c3 === 0, e3)
      assert(o3.contains("CREATE TYPE") && o3.contains("ok") && o3.contains("DROP TYPE"))
      assert(o3.contains("sad,ok,happy|sad|happy"), o3)
      assert(o3.contains("t"), o3)
    }
  }

  test("psql: \\copy drives the COPY sub-protocol through live libpq") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      // \copy ... to stdout — psql issues COPY ... TO STDOUT and
      // relays CopyData to its stdout
      val (c1, o1, e1) = psqlScript(port,
        "\\copy (select r_regionkey, r_name from region order by r_regionkey) to stdout")
      assert(c1 === 0, e1)
      assert(o1.linesIterator.size === 5)
      assert(o1.startsWith("0\tAFRICA"), o1)
      // csv with header
      val (c2, o2, e2) = psqlScript(port,
        "\\copy (select r_regionkey from region order by r_regionkey) to stdout with csv header")
      assert(c2 === 0, e2)
      assert(o2.linesIterator.toSeq === Seq("r_regionkey", "0", "1", "2", "3", "4"))
      // \copy from a client-side file: psql reads it and streams
      // CopyData FROM STDIN
      val f = java.nio.file.Files.createTempFile("graft_copy", ".tsv")
      java.nio.file.Files.writeString(f, "100\talpha\n101\t\\N\n")
      val (c3, o3, e3) = psqlScript(port,
        s"""CREATE TABLE psql_copy_t (id INT, name STRING) USING parquet;
           |\\copy psql_copy_t from '$f'
           |SELECT id, coalesce(name, '?') FROM psql_copy_t ORDER BY id;
           |DROP TABLE psql_copy_t;""".stripMargin)
      assert(c3 === 0, e3)
      assert(o3.contains("COPY 2"), o3)
      assert(o3.contains("100|alpha"), o3)
      assert(o3.contains("101|?"), o3)
      java.nio.file.Files.deleteIfExists(f)
    }
  }

  test("psql: \\d shows the Indexes section, \\di lists indexes (round 14)") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c0, _, e0) = psqlScript(port,
        """CREATE TABLE idxt (id int PRIMARY KEY, a int, b text);
          |CREATE INDEX idxt_ab ON idxt (a, b);
          |CREATE UNIQUE INDEX idxt_b_u ON idxt (b);""".stripMargin)
      assert(c0 === 0, e0)
      // `-t` (tuples-only) suppresses \d FOOTERS, where the Indexes
      // section lives — switch it off inside the script
      val (c1, o1, e1) = psqlScript(port,
        "\\pset tuples_only off\n\\d idxt")
      assert(c1 === 0, e1)
      // psql composes this section from pg_index + pg_class +
      // pg_get_indexdef + pg_get_constraintdef over the emulation
      assert(o1.contains("Indexes:"), o1)
      assert(o1.contains("\"idxt_pkey\" PRIMARY KEY, btree (id)"), o1)
      assert(o1.contains("\"idxt_b_u\" UNIQUE, btree (b)"), o1)
      assert(o1.contains("\"idxt_ab\" btree (a, b)"), o1)
      val (c2, o2, e2) = psql(port, "\\di")
      assert(c2 === 0, e2)
      assert(o2.contains("idxt_pkey"), o2)
      assert(o2.contains("idxt_ab"), o2)
      val (c3, o3, e3) = psql(port,
        "SELECT indexname FROM pg_indexes WHERE tablename = 'idxt' ORDER BY 1")
      assert(c3 === 0, e3)
      assert(o3.trim.linesIterator.toSeq === Seq("idxt_ab", "idxt_b_u", "idxt_pkey"), o3)
      psql(port, "DROP TABLE idxt")
    }
  }

  test("psql: views list in pg_views and \\dv, not pg_tables (round 14)") {
    assume(psqlPath.nonEmpty, "no psql binary installed")
    withServer { port =>
      val (c0, _, e0) = psql(port,
        "CREATE VIEW nation_v AS SELECT n_name FROM nation WHERE n_regionkey = 1")
      assert(c0 === 0, e0)
      val (c1, o1, e1) = psql(port,
        "SELECT viewname FROM pg_views WHERE schemaname = 'public'")
      assert(c1 === 0, e1)
      assert(o1.trim === "nation_v", o1)
      val (c2, o2, e2) = psql(port,
        "SELECT count(*) FROM pg_tables WHERE tablename = 'nation_v'")
      assert(c2 === 0, e2)
      assert(o2.trim === "0", o2)
      val (c3, o3, e3) = psqlScript(port, "\\pset tuples_only off\n\\dv")
      assert(c3 === 0, e3)
      assert(o3.contains("nation_v"), o3)
      assert(o3.contains("view"), o3)
      // the view still QUERIES (wire-dialect body handled at CREATE)
      val (c4, o4, e4) = psql(port, "SELECT count(*) FROM nation_v")
      assert(c4 === 0, e4)
      assert(o4.trim === "5", o4)
      // \d+ renders the stored definition through pg_get_viewdef
      val (c6, o6, e6) = psqlScript(port, "\\pset tuples_only off\n\\d+ nation_v")
      assert(c6 === 0, e6)
      assert(o6.contains("View definition"), o6)
      assert(o6.contains("n_regionkey = 1"), o6)
      val (c5, _, e5) = psql(port, "DROP VIEW nation_v")
      assert(c5 === 0, e5)
    }
  }
}
