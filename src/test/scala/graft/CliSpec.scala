package graft

import java.nio.file.Files

/** End-to-end test of the product CLI (reference:
  * datafusion-postgres-cli/src/main.rs + tests-integration/test.sh,
  * which serves delhiclimate.csv and checks `SELECT count(*)`): write
  * CSV/JSON/parquet files, drive the REAL arg-parse → register → serve
  * path on an ephemeral port, and query over the wire.
  */
class CliSpec extends SparkSpec {

  test("--csv/--json/--parquet/--dir registration serves tables over the wire") {
    val dir = Files.createTempDirectory("graft-cli")
    val csv = dir.resolve("climate.csv")
    Files.writeString(csv, "date,meantemp\n2017-01-01,15.9\n2017-01-02,18.5\n2017-01-03,17.1\n")
    val json = dir.resolve("kv.json")
    Files.writeString(json, """{"k":"a","v":1}""" + "\n" + """{"k":"b","v":2}""" + "\n")
    val pq = dir.resolve("nums")
    import spark.implicits._
    (1 to 10).toDF("n").write.parquet(pq.toString)

    // separate dir for --dir expansion (stem → table name)
    val served = Files.createTempDirectory("graft-cli-dir")
    Files.writeString(served.resolve("extra.csv"), "x\n1\n2\n")

    val (_, server) = Cli.serve(Array(
      "--csv", s"climate:$csv",
      "--json", s"kv:$json",
      "--parquet", s"nums:$pq",
      "--dir", served.toString,
      "--host", "127.0.0.1", "-p", "0"))
    try {
      val c = new Client(server.boundPort)
      c.startup()
      // the reference integration test's exact check: row count of the served CSV
      assert(c.query("SELECT count(*) AS n FROM climate").rows === Seq(Seq(Some("3"))))
      // CSV schema inference: meantemp is numeric, usable in aggregates
      assert(c.query("SELECT max(meantemp) FROM climate").rows === Seq(Seq(Some("18.5"))))
      assert(c.query("SELECT v FROM kv WHERE k = 'b'").rows === Seq(Seq(Some("2"))))
      assert(c.query("SELECT sum(n) FROM nums").rows === Seq(Seq(Some("55"))))
      assert(c.query("SELECT count(*) FROM extra").rows === Seq(Seq(Some("2"))))
      // registered tables visible through pg_catalog introspection
      val rels = c.query(
        "SELECT relname FROM pg_catalog.pg_class WHERE relname IN ('climate','kv','nums','extra') ORDER BY relname")
      assert(rels.rows.flatten.flatten === Seq("climate", "extra", "kv", "nums"))
      c.close()
    } finally server.stop()
  }

  test("bad args are rejected with a usable message") {
    intercept[IllegalArgumentException](Cli.serve(Array("--csv", "no-colon-here")))
    intercept[IllegalArgumentException](Cli.serve(Array("--bogus", "x")))
    intercept[IllegalArgumentException](Cli.serve(Array("--avro", "no-colon-either")))
    intercept[IllegalArgumentException](
      Cli.serve(Array("--tls-cert", "/tmp/only-cert.pem", "-p", "0")))
  }

  test("--user + --auth cleartext: CLI-created users can log in") {
    val (_, server) = Cli.serve(Array(
      "--auth", "cleartext", "--user", "alice:sekret", "-p", "0"))
    try {
      val ok = new Client(server.boundPort)
      val r = ok.startup(user = "alice", password = Some("sekret"))
      assert(r.txnStatus === 'I')
      assert(ok.query("SELECT 1").rows === Seq(Seq(Some("1"))))
      ok.close()
      val bad = new Client(server.boundPort)
      intercept[Throwable] {
        val rb = bad.startup(user = "alice", password = Some("wrong"))
        assert(rb.errors.nonEmpty) // either error reply or closed conn
        throw new RuntimeException("got error reply as expected")
      }
    } finally server.stop()
  }

  test("the CLI main serves as a standalone process") {
    // spawn the real `graft.Cli` main in its own JVM — the shipped
    // product shape (reference: tests-integration/test.sh launches the
    // CLI binary and queries it)
    val dir = Files.createTempDirectory("graft-cli-proc")
    Files.writeString(dir.resolve("climate.csv"),
      "date,meantemp\n2017-01-01,15.9\n2017-01-02,18.5\n")
    val port = { val ss = new java.net.ServerSocket(0); try ss.getLocalPort finally ss.close() }
    val sep = java.io.File.pathSeparator
    val cp = (Seq("target/scala-2.13/classes") ++
      new java.io.File("/opt/spark/jars").listFiles().map(_.getPath)).mkString(sep)
    val proc = new ProcessBuilder(
      s"${sys.props("java.home")}/bin/java", "-Xmx2g", "-cp", cp, "graft.Cli",
      "--dir", dir.toString, "--host", "127.0.0.1", "-p", port.toString,
      "--master", "local[2]")
      .redirectErrorStream(true).redirectOutput(new java.io.File("/tmp/graft-cli-proc.log"))
      .start()
    try {
      // poll until the server accepts (session startup takes ~10 s)
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      var c: Client = null
      while (c == null) {
        try { c = new Client(port) }
        catch { case _: java.net.ConnectException =>
          assert(System.nanoTime() < deadline, "CLI process never came up; see /tmp/graft-cli-proc.log")
          assert(proc.isAlive, "CLI process died; see /tmp/graft-cli-proc.log")
          Thread.sleep(500)
        }
      }
      c.startup()
      assert(c.query("SELECT count(*) AS n FROM climate").rows === Seq(Seq(Some("2"))))
      assert(c.query("SELECT version()").rows.head.head.get.contains("PostgreSQL"))
      c.close()
    } finally proc.destroyForcibly()
  }
}
