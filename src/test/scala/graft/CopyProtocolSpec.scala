package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.PgServer

/** COPY sub-protocol over a live socket (pg protocol §55.2.6):
  * TO STDOUT (text + csv, escaping, header, delimiter, column lists)
  * and FROM STDIN (text + csv, NULLs, quoted fields, CopyFail,
  * error SQLSTATEs). Parity-PLUS: the reference implements no COPY;
  * semantics here follow the public pg docs, and psql `\copy` runs
  * against this surface in PsqlE2eSpec.
  */
class CopyProtocolSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: PgServer = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    import spark.implicits._
    Seq((1, "alice", 1.5), (2, "bo,b", 2.5), (3, null.asInstanceOf[String], 3.5))
      .toDF("id", "name", "val").createOrReplaceTempView("copy_src")
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

  test("COPY (query) TO STDOUT: text format, \\N nulls, COPY tag") {
    val c = connect()
    val (ncols, data, tag, errs) =
      c.copyOut("COPY (SELECT id, name, val FROM copy_src ORDER BY id) TO STDOUT")
    assert(errs === Nil)
    assert(ncols === 3)
    assert(data === "1\talice\t1.5\n2\tbo,b\t2.5\n3\t\\N\t3.5\n")
    assert(tag === "COPY 3")
    c.close()
  }

  test("text format escapes backslash, tab, newline in data") {
    val c = connect()
    val (_, data, _, errs) = c.copyOut(
      "COPY (SELECT 'a' || chr(9) || 'b' AS x, 'c' || chr(10) || 'd' AS y, " +
        "'e' || chr(92) || 'f' AS z) TO STDOUT")
    assert(errs === Nil)
    assert(data === "a\\tb\tc\\nd\te\\\\f\n")
    c.close()
  }

  test("COPY TO STDOUT csv: header, quoting of delimiter/quote/newline") {
    val c = connect()
    val (_, data, tag, errs) = c.copyOut(
      "COPY (SELECT id, name, val FROM copy_src ORDER BY id) TO STDOUT " +
        "(FORMAT csv, HEADER true)")
    assert(errs === Nil)
    assert(data === "id,name,val\n1,alice,1.5\n2,\"bo,b\",2.5\n3,,3.5\n")
    assert(tag === "COPY 3")
    c.close()
  }

  test("csv null is the empty unquoted field; quoted empty is a value") {
    val c = connect()
    val (_, data, _, _) = c.copyOut(
      "COPY (SELECT CAST(NULL AS STRING) AS a, '' AS b) TO STDOUT (FORMAT csv)")
    assert(data === ",\"\"\n")
    c.close()
  }

  test("legacy option syntax: WITH DELIMITER CSV HEADER") {
    val c = connect()
    val (_, data, _, errs) = c.copyOut(
      "COPY (SELECT id, val FROM copy_src WHERE id = 1) TO STDOUT WITH DELIMITER ';' CSV HEADER")
    assert(errs === Nil)
    assert(data === "id;val\n1;1.5\n")
    c.close()
  }

  test("COPY table TO STDOUT with a column list") {
    val c = connect()
    val (ncols, data, _, errs) = c.copyOut("COPY copy_src (name, id) TO STDOUT")
    assert(errs === Nil)
    assert(ncols === 2)
    assert(data.linesIterator.toSeq.sorted ===
      Seq("\\N\t3", "alice\t1", "bo,b\t2"))
    c.close()
  }

  test("COPY FROM STDIN text roundtrips rows incl. NULL and escapes") {
    val c = connect()
    val r0 = c.query(
      "CREATE TABLE copy_tgt (id INT, name STRING, val DOUBLE) USING parquet")
    assert(r0.errors === Nil)
    val r = c.copyIn("COPY copy_tgt FROM STDIN",
      Seq("10\tten\t10.5\n11\t\\N\t11.5\n", "12\ta\\tb\t\\N\n"))
    assert(r.errors === Nil)
    assert(r.tags === Seq("COPY 3"))
    val chk = c.query(
      "SELECT id, coalesce(name, '<null>'), coalesce(CAST(val AS STRING), '<null>') " +
        "FROM copy_tgt ORDER BY id")
    assert(chk.rows === Seq(
      Seq(Some("10"), Some("ten"), Some("10.5")),
      Seq(Some("11"), Some("<null>"), Some("11.5")),
      Seq(Some("12"), Some("a\tb"), Some("<null>"))))
    c.query("DROP TABLE copy_tgt")
    c.close()
  }

  test("COPY binary round-trips: TO bytes feed FROM STDIN (FORMAT binary)") {
    val c = connect()
    c.query("DROP TABLE IF EXISTS copy_bin")
    val r0 = c.query("CREATE TABLE copy_bin (id INT, name STRING, val DOUBLE, " +
      "ok BOOLEAN, d DATE, num DECIMAL(10,2)) USING parquet")
    assert(r0.errors === Nil)
    // payload produced by the server's own binary TO side (the TO
    // bytes themselves are live-pg-pinned in CopyParitySpec)
    val (formats, data, tag, errs) = c.copyOutBytes(
      "COPY (SELECT 1 AS id, 'aéb' AS name, 1.5::float8 AS val, true AS ok, " +
        "DATE '2026-01-02' AS d, 12.34::numeric(10,2) AS num " +
        "UNION ALL SELECT 2, NULL, NULL, false, NULL, NULL ORDER BY 1) " +
        "TO STDOUT (FORMAT binary)")
    assert(errs === Nil)
    assert(tag === "COPY 2")
    assert(formats.forall(_ == 1))
    val r = c.copyInBytes("COPY copy_bin FROM STDIN (FORMAT binary)", Seq(data))
    assert(r.errors === Nil)
    assert(r.tags === Seq("COPY 2"))
    val chk = c.query("SELECT id, coalesce(name, '<n>'), " +
      "coalesce(CAST(val AS STRING), '<n>'), ok, " +
      "coalesce(CAST(d AS STRING), '<n>'), coalesce(CAST(num AS STRING), '<n>') " +
      "FROM copy_bin ORDER BY id")
    assert(chk.rows === Seq(
      Seq(Some("1"), Some("aéb"), Some("1.5"), Some("t"), Some("2026-01-02"), Some("12.34")),
      Seq(Some("2"), Some("<n>"), Some("<n>"), Some("f"), Some("<n>"), Some("<n>"))))
    c.query("DROP TABLE copy_bin")
    c.close()
  }

  test("COPY binary rejects text-mode options and bad signatures") {
    val c = connect()
    val bad = c.query("COPY (SELECT 1) TO STDOUT (FORMAT binary, HEADER)").errors
    assert(bad.nonEmpty && bad.head._1 === "42601", bad)
    val bad2 = c.query("COPY (SELECT 1) TO STDOUT (FORMAT binary, DELIMITER '|')").errors
    assert(bad2.nonEmpty && bad2.head._1 === "42601", bad2)
    c.query("CREATE TABLE copy_bin2 (id INT) USING parquet")
    val r = c.copyInBytes("COPY copy_bin2 FROM STDIN (FORMAT binary)",
      Seq("not a pgcopy stream".getBytes("UTF-8")))
    assert(r.errors.nonEmpty && r.errors.head._1 === "22P04", r.errors)
    c.query("DROP TABLE copy_bin2")
    c.close()
  }

  test("COPY FROM STDIN csv: header skip, quoted embedded delimiter + newline") {
    val c = connect()
    c.query("CREATE TABLE copy_csv (id INT, txt STRING) USING parquet")
    val r = c.copyIn("COPY copy_csv FROM STDIN (FORMAT csv, HEADER true)",
      Seq("id,txt\n1,\"a,b\"\n2,\"line1\nline2\"\n3,\"say \"\"hi\"\"\"\n"))
    assert(r.errors === Nil)
    assert(r.tags === Seq("COPY 3"))
    val chk = c.query("SELECT txt FROM copy_csv ORDER BY id")
    assert(chk.rows === Seq(
      Seq(Some("a,b")), Seq(Some("line1\nline2")), Seq(Some("say \"hi\""))))
    c.query("DROP TABLE copy_csv")
    c.close()
  }

  test("COPY FROM STDIN with column list fills unlisted columns with NULL") {
    val c = connect()
    c.query("CREATE TABLE copy_part (id INT, name STRING, val DOUBLE) USING parquet")
    val r = c.copyIn("COPY copy_part (val, id) FROM STDIN", Seq("7.5\t70\n"))
    assert(r.errors === Nil)
    assert(r.tags === Seq("COPY 1"))
    val chk = c.query(
      "SELECT id, coalesce(name, '<null>'), val FROM copy_part")
    assert(chk.rows === Seq(Seq(Some("70"), Some("<null>"), Some("7.5"))))
    c.query("DROP TABLE copy_part")
    c.close()
  }

  test("COPY TO STDOUT renders geometry as hex EWKB (round-11 surfaces compose)") {
    val c = connect()
    val (_, data, tag, errs) = c.copyOut(
      "COPY (SELECT 1 AS id, st_makepoint(1, 2) AS g) TO STDOUT")
    assert(errs === Nil)
    assert(data === "1\t0101000000000000000000F03F0000000000000040\n")
    assert(tag === "COPY 1")
    c.close()
  }

  test("CopyFail surfaces 57014 and the session stays usable") {
    val c = connect()
    c.query("CREATE TABLE copy_fail (id INT) USING parquet")
    val r = c.copyIn("COPY copy_fail FROM STDIN", Seq("1\n"), fail = Some("client aborted"))
    assert(r.errors.map(_._1) === Seq("57014"))
    assert(c.query("SELECT 42").rows === Seq(Seq(Some("42"))))
    assert(c.query("SELECT count(*) FROM copy_fail").rows === Seq(Seq(Some("0"))))
    c.query("DROP TABLE copy_fail")
    c.close()
  }

  test("error SQLSTATEs: missing relation, file targets, bad format") {
    val c = connect()
    val r1 = c.copyIn("COPY no_such_table FROM STDIN", Nil)
    assert(r1.errors.map(_._1) === Seq("42P01"))
    val (_, _, _, e2) = c.copyOut("COPY copy_src TO '/tmp/x'")
    assert(e2.map(_._1) === Seq("0A000"))
    val (_, _, _, e3) = c.copyOut("COPY copy_src TO STDOUT (FORMAT parquet)")
    assert(e3.map(_._1) === Seq("22023"))
    assert(c.query("SELECT 1").rows === Seq(Seq(Some("1"))))
    c.close()
  }

  test("row width mismatch is 22P04") {
    val c = connect()
    c.query("CREATE TABLE copy_w (id INT, name STRING) USING parquet")
    val r = c.copyIn("COPY copy_w FROM STDIN", Seq("1\ta\tEXTRA\n"))
    assert(r.errors.map(_._1) === Seq("22P04"))
    c.query("DROP TABLE copy_w")
    c.close()
  }
}
