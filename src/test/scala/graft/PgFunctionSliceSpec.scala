package graft

import org.apache.spark.sql.Row
import graft.pgwire.PgFunctions

/** End-to-end SQL coverage for the functions.md roadmap slice:
  * formatting (to_char/to_number/to_timestamp/to_date), datetime
  * (age/justify/timezone/now-family) and string (format, quoting,
  * regexp, string_to_array, initcap) packs, registered exactly the
  * way a pgwire session gets them (PgFunctions.registerAll).
  */
class PgFunctionSliceSpec extends SparkSpec {

  private def one(sql: String): Row = {
    PgFunctions.registerAll(spark)
    spark.sql(sql).collect().head
  }

  test("to_char over timestamps and dates through SQL") {
    val r = one(
      """SELECT to_char(TIMESTAMP '2026-08-12 15:04:05.123456', 'YYYY-MM-DD HH24:MI:SS') AS a,
        |  to_char(DATE '2026-08-12', 'FMMonth DDth, YYYY') AS b,
        |  to_char(TIMESTAMP '2026-08-12 15:04:05', 'Dy HH12:MI AM') AS c""".stripMargin)
    assert(r.getString(0) === "2026-08-12 15:04:05")
    assert(r.getString(1) === "August 12th, 2026")
    assert(r.getString(2) === "Wed 03:04 PM")
  }

  test("to_char numeric templates through SQL") {
    val r = one(
      """SELECT to_char(1485, '9G999') AS a, to_char(485.8, 'FM999.90') AS b,
        |  to_char(-12454.8, '99G999D9S') AS c, to_char(CAST(0.0004859 AS DOUBLE), '9.99EEEE') AS d""".stripMargin)
    assert(r.getString(0) === " 1,485")
    assert(r.getString(1) === "485.80")
    assert(r.getString(2) === "12,454.8-")
    assert(r.getString(3) === " 4.86e-04")
  }

  test("to_number / to_timestamp / to_date round trips") {
    val r = one(
      """SELECT to_number('12,454.8-', '99G999D9S') AS a,
        |  to_timestamp('2026-08-12 15:04:05', 'YYYY-MM-DD HH24:MI:SS') AS b,
        |  to_timestamp(86400) AS c,
        |  to_date('12 Aug 2026', 'DD Mon YYYY') AS d""".stripMargin)
    assert(r.getDouble(0) === -12454.8)
    assert(r.get(1).toString === "2026-08-12 15:04:05.0")
    assert(r.get(2).toString === "1970-01-02 00:00:00.0")
    assert(r.get(3).toString === "2026-08-12")
  }

  test("age matches the pg doc example; justify family normalizes") {
    val r = one(
      """SELECT pg_interval_text(age(TIMESTAMP '2001-04-10', TIMESTAMP '1957-06-13')) AS a,
        |  pg_interval_text(justify_hours(INTERVAL '27' HOUR)) AS b,
        |  pg_interval_text(justify_days(make_interval(0, 0, 0, 35))) AS c,
        |  pg_interval_text(justify_interval(make_interval(0, 1, 0, 0, -1))) AS d""".stripMargin)
    assert(r.getString(0) === "43 years 9 mons 27 days")
    assert(r.getString(1) === "1 day 03:00:00")
    assert(r.getString(2) === "1 mon 5 days")
    assert(r.getString(3) === "29 days 23:00:00")
  }

  test("timezone() converts to wall clock; now-family is monotone-ish") {
    val r = one(
      """SELECT timezone('Asia/Tokyo', TIMESTAMP '2026-08-12 00:00:00') AS tok,
        |  isfinite(TIMESTAMP '2026-08-12 00:00:00') AS fin,
        |  clock_timestamp() IS NOT NULL AS ck,
        |  statement_timestamp() IS NOT NULL AS st,
        |  length(timeofday()) > 20 AS tod""".stripMargin)
    // session zone is UTC, so +09:00
    assert(r.get(0).toString === "2026-08-12T09:00")
    assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4))
  }

  test("pg format() conversions") {
    val r = one(
      """SELECT format('Hello %s, %1$s again', 'world') AS a,
        |  format('%I.%I', 'my table', 'col') AS b,
        |  format('%L and %L', 'O''Reilly', CAST(NULL AS STRING)) AS c,
        |  format('|%10s|%-10s|', 'foo', 'bar') AS d""".stripMargin)
    assert(r.getString(0) === "Hello world, world again")
    assert(r.getString(1) === "\"my table\".col")
    assert(r.getString(2) === "'O''Reilly' and NULL")
    assert(r.getString(3) === "|       foo|bar       |")
  }

  test("num_nonnulls / num_nulls variadic") {
    val r = one("SELECT num_nonnulls(1, NULL, 'a', NULL) AS a, num_nulls(1, NULL, 'a', NULL) AS b")
    assert(r.getInt(0) === 2 && r.getInt(1) === 2)
  }

  test("string_to_array pg rules") {
    val r = one(
      """SELECT string_to_array('xx~^~yy~^~zz', '~^~', 'yy') AS a,
        |  string_to_array('abc', NULL) AS b,
        |  string_to_array('a,b,,c', ',') AS c,
        |  string_to_array('abc', '') AS d""".stripMargin)
    assert(r.getSeq[String](0) === Seq("xx", null, "zz"))
    assert(r.getSeq[String](1) === Seq("a", "b", "c"))
    assert(r.getSeq[String](2) === Seq("a", "b", "", "c"))
    assert(r.getSeq[String](3) === Seq("abc"))
  }

  test("regexp_split_to_array and regexp_matches") {
    val r = one(
      """SELECT regexp_split_to_array('hello   world  foo', '\\s+') AS a,
        |  regexp_matches('foobarbequebaz', '(b[^b]+)(b[^b]+)') AS b,
        |  regexp_matches('nope', 'x(y)z') AS c,
        |  regexp_split_to_array('A-B-c', '-', 'i') AS d""".stripMargin)
    assert(r.getSeq[String](0) === Seq("hello", "world", "foo"))
    assert(r.getSeq[String](1) === Seq("bar", "beque"))
    assert(r.isNullAt(2))
    assert(r.getSeq[String](3) === Seq("A", "B", "c"))
  }

  test("initcap pg word rule, quoting, casefold, to_ascii, strpos, radix") {
    val r = one(
      """SELECT initcap('hi-there bob''s 3rd item') AS a,
        |  quote_literal('O''Reilly') AS b, quote_nullable(CAST(NULL AS STRING)) AS c,
        |  casefold('GROSS Straße') AS d,
        |  to_ascii('café résumé') AS e,
        |  strpos('high', 'ig') AS f, strpos('high', 'zz') AS g,
        |  to_bin(13) AS h, to_oct(64) AS i, to_hex(255) AS j,
        |  normalize('é') = normalize('é', 'NFC') AS k""".stripMargin)
    // pg words are alphanumeric runs: '3rd' starts with a digit, so
    // the 'r' is not word-initial and stays lower
    assert(r.getString(0) === "Hi-There Bob'S 3rd Item")
    assert(r.getString(1) === "'O''Reilly'")
    assert(r.getString(2) === "NULL")
    assert(r.getString(3) === "gross strasse")
    assert(r.getString(4) === "cafe resume")
    assert(r.getInt(5) === 2 && r.getInt(6) === 0)
    assert(r.getString(7) === "1101" && r.getString(8) === "100" && r.getString(9) === "ff")
    assert(r.getBoolean(10))
  }
}
