package graft

/** Differential-parity pins: every expected value here is the OUTPUT
  * OF A LIVE PostgreSQL 15.18 (same expression, UTF8 cluster, UTC) —
  * captured with the PgDiffTool harness and frozen so the suite stays
  * hermetic. Expressions run through the full client path: Compat
  * rewrite → engine → wire text encoder.
  *
  * The round-8 differential sweep found 27 divergences; these pins
  * cover the 23 fixed ones. Round 11 closed the biggest remaining
  * deviation class: plain pg `timestamp` now maps to TIMESTAMP_NTZ
  * end-to-end (no spurious "+00"); only `timestamptz` renders with an
  * offset. Residual documented deviations: function RETURN types that
  * Spark fixes as session-zoned (e.g. date_trunc over DATE renders
  * +00 where pg returns plain timestamp), and to_number's L template
  * following en_US ('$') rather than the C locale.
  */
class PgParitySpec extends SparkSpec {

  private def one(expr: String): String = {
    graft.pgwire.PgFunctions.registerAll(spark)
    // the SAME path the live server runs: Compat rewrite + PgSemantics
    // plan pass + TIME tagging (Handlers.runSql)
    val df = graft.pgwire.Handlers.runSql(spark, s"SELECT $expr")
    val row = df.collect()(0)
    graft.pgwire.TextEncoder.encodeField(row.get(0), df.schema.fields(0),
      java.time.ZoneOffset.UTC).getOrElse("<NULL>")
  }

  /** [[one]] distinguishing SQL NULL (None) from any text value. */
  private def oneOpt(expr: String): Option[String] = {
    graft.pgwire.PgFunctions.registerAll(spark)
    val df = graft.pgwire.Handlers.runSql(spark, s"SELECT $expr")
    val row = df.collect()(0)
    graft.pgwire.TextEncoder.encodeField(row.get(0), df.schema.fields(0),
      java.time.ZoneOffset.UTC)
  }

  test("to_char FM one-shot and numeric overflow/literal forms") {
    assert(one("to_char(TIMESTAMP '2023-08-15 12:34:56', 'FMDay, DD FMMonth YYYY')") ===
      "Tuesday, 15 August 2023")
    assert(one("to_char(123, 'XXXX')") === "XXXX")
    assert(one("to_char(123, 'FMXXXX')") === "XXXX")
  }

  test("bytea input: hex and octal-escape forms through casts and args") {
    assert(one("""length('\x1234567890'::bytea)""") === "5")
    assert(one("""get_byte('\x1234567890'::bytea, 4)""") === "144")
    assert(one("""set_byte('\x1234567890'::bytea, 4, 64)""") === """\x1234567840""")
    assert(one("""get_bit('\x1234567890'::bytea, 30)""") === "1")
    assert(one("""encode('123\000\001', 'base64')""") === "MTIzAAE=")
    assert(one("""encode('123abc', 'hex')""") === "313233616263")
  }

  test("string functions: negative left/right, chr code points, substring-regex") {
    assert(one("left('abcde', -2)") === "abc")
    assert(one("right('abcde', -2)") === "cde")
    assert(one("left('abcde', 2)") === "ab")
    assert(one("right('abcde', 2)") === "de")
    assert(one("chr(977)") === "ϑ")
    assert(one("chr(65)") === "A")
    val e = intercept[Exception](one("chr(0)"))
    assert(e.getMessage.contains("null character not permitted"))
    assert(one("substring('Thomas' from '...$')") === "mas")
    assert(one("substring('Thomas' from 'h(.)m')") === "o")
    assert(one("substring('Thomas' from 2 for 3)") === "hom")
    assert(one("starts_with('alphabet', 'alph')") === "t")
  }

  test("pg regexp optional-arg family (start / N / flags / subexpr)") {
    val street = "'number of your street, town zip, FR'"
    assert(one(s"regexp_instr($street, '[^,]+', 1, 2)") === "23")
    assert(one(s"regexp_substr($street, '[^,]+', 1, 2)") === " town zip")
    assert(one("regexp_like('Hello World', 'world', 'i')") === "t")
    assert(one("regexp_count('ABCABCAXYaxy', 'A.')") === "3")
    assert(one("regexp_count('ABCABCAXYaxy', 'A.', 1, 'i')") === "4")
    // pg 3-arg regexp_replace replaces the FIRST match only
    assert(one("regexp_replace('aaa', 'a', 'X')") === "Xaa")
    assert(one("regexp_replace('aaa', 'a', 'X', 'g')") === "XXX")
    assert(one("regexp_replace('aaa', 'a', 'X', 2)") === "aXa")
    assert(one("regexp_replace('aaaa', 'a', 'X', 2, 2)") === "aaXa")
    // group refs use pg's \1 syntax
    assert(one("""regexp_replace('Thomas', '(.)homas', '\1!')""") === "T!")
  }

  test("math: div scale, gcd/lcm, trunc dispatch") {
    assert(one("div(9, 4)") === "2")
    assert(one("div(-9, 4)") === "-2")
    assert(one("gcd(1071, 462)") === "21")
    assert(one("lcm(1071, 462)") === "23562")
    assert(one("trunc(42.4382, 2)") === "42.43")
    assert(one("trunc(42.8)") === "42")
    assert(one("trunc(-42.8)") === "-42")
    // the date form still routes through Spark's trunc
    assert(one("trunc(DATE '2023-08-15', 'MM')") === "2023-08-01")
  }

  test("intervals: justify day fields, mixed literals, date_bin text stride") {
    assert(one("justify_hours(INTERVAL '27 hours')") === "1 day 03:00:00")
    assert(one("justify_days(INTERVAL '35 days')") === "1 mon 5 days")
    assert(one("justify_interval(INTERVAL '1 mon -1 hour')") === "29 days 23:00:00")
    assert(one("INTERVAL '35 days'") === "35 days")
    assert(one("INTERVAL '1 mon -1 hour'") === "1 mon -01:00:00")
    assert(one("INTERVAL '2 weeks ago'") === "-14 days")
    assert(one("INTERVAL '1.5 days'") === "1 day 12:00:00")
    assert(one("date_part('epoch', TIMESTAMP '2023-08-15 12:00:00')") ===
      "1692100800")
    // stride arrives as pg's untyped literal text; NTZ source stays
    // NTZ (sweep #12 — exactly live pg)
    assert(one("date_bin('15 minutes', TIMESTAMP '2020-02-11 15:44:17', " +
      "TIMESTAMP '2001-01-01')") === "2020-02-11 15:30:00")
  }

  test("U& literals and normalize form keywords") {
    assert(one("""U&'d\0061t\+000061'""") === "data")
    assert(one("""normalize(U&'\0061\0301', NFC) = U&'\00E1'""") === "t")
    assert(one("normalize('abc', NFKC)") === "abc")
  }

  test("array functions: positions/replace/cat/ndims/prepend, && overlap") {
    assert(one("array_positions(array['a','b','a'], 'a')") === "{1,3}")
    assert(one("array_replace(array[1,2,5,4], 5, 3)") === "{1,2,3,4}")
    assert(one("array_cat(array[1,2], array[3,4])") === "{1,2,3,4}")
    assert(one("array_prepend(0, array[1,2])") === "{0,1,2}")
    assert(one("array_ndims(array[1,2,3])") === "1")
    assert(one("array_ndims(array[array[1],array[2]])") === "2")
    assert(one("array[1,2] && array[2,3]") === "t")
    assert(one("array[1,2] && array[3,4]") === "f")
    assert(one("string_to_array('a,b,c', NULL)") === """{a,",",b,",",c}""")
    assert(one("string_to_array('', ',')") === "{}")
  }

  test("concat skips NULLs; format renders booleans as t/f") {
    assert(one("concat('a', NULL, 'c')") === "ac")
    assert(one("concat('a', 42)") === "a42")
    assert(one("format('%s %s', 1.5, true)") === "1.5 t")
  }

  test("pg math operators: ^ power, # xor, |/ sqrt, @ abs; log is base 10") {
    assert(one("2^10") === "1024")
    assert(one("2 ^ 10") === "1024")
    assert(one("3 # 5") === "6")
    assert(one("|/ 25.0") === "5")
    // abs of numeric keeps the value's scale (pg prints 5.0)
    assert(one("@ -5.0") === "5.0")
    assert(one("log(100)") === "2")
    assert(one("log(2.0, 64.0)") === "6")
  }

  test("string edges: ltrim/rtrim sets, substr clamping, bool casts") {
    assert(one("ltrim('zzzytest', 'xyz')") === "test")
    assert(one("rtrim('testxxzx', 'xyz')") === "test")
    assert(one("substr('alphabet', 0, 3)") === "al")
    assert(one("substr('alphabet', -2, 5)") === "al")
    assert(one("substr('alphabet', 3, 2)") === "ph")
    assert(one("substr('alphabet', 3)") === "phabet")
    assert(one("substring('alphabet' from 0 for 3)") === "al")
    assert(one("CAST('off' AS boolean)") === "f")
    assert(one("'on'::boolean") === "t")
  }

  test("extract pg-only fields and coarse date_trunc") {
    assert(one("extract(dow from DATE '2023-08-13')") === "0") // Sunday
    assert(one("extract(isodow from DATE '2023-08-13')") === "7")
    assert(one("extract(dow from DATE '2023-08-14')") === "1") // Monday
    assert(one("extract(isodow from DATE '2023-08-14')") === "1")
    assert(one("extract(decade from DATE '2023-08-15')") === "202")
    assert(one("extract(century from DATE '2023-08-15')") === "21")
    assert(one("extract(millennium from DATE '2023-08-15')") === "3")
    assert(one("extract(microseconds from TIMESTAMP '2023-08-15 12:34:56.5')") ===
      "56500000")
    assert(one("extract(milliseconds from TIMESTAMP '2023-08-15 12:34:56.5')") ===
      "56500.000")
    assert(one("date_part('dow', DATE '2023-08-13')") === "0")
    assert(one("date_trunc('decade', DATE '2023-08-15')") === "2020-01-01 00:00:00+00")
    assert(one("date_trunc('century', DATE '2023-08-15')") === "2001-01-01 00:00:00+00")
    assert(one("date_trunc('millennium', DATE '2023-08-15')") === "2001-01-01 00:00:00+00")
  }

  test("to_char over abbreviated interval literals") {
    assert(one("to_char(INTERVAL '4 hours 3 mins 2 secs', 'HH24:MI:SS')") ===
      "04:03:02")
  }

  private def rows(expr: String): Seq[String] = {
    graft.pgwire.PgFunctions.registerAll(spark)
    val sql = graft.pgwire.Compat.rewrite(s"SELECT $expr")
    val df = spark.sql(sql)
    df.collect().toSeq.map(r =>
      graft.pgwire.TextEncoder.encodeField(r.get(0), df.schema.fields(0),
        java.time.ZoneOffset.UTC).getOrElse("<NULL>"))
  }

  test("generate_series: direction rule, step, temporal form") {
    assert(rows("generate_series(1, 3)") === Seq("1", "2", "3"))
    assert(rows("generate_series(5, 1, -2)") === Seq("5", "3", "1"))
    // pg: wrong-direction series is EMPTY (Spark sequence reverses)
    assert(rows("generate_series(5, 1)") === Seq.empty)
    // pg: DATE endpoints cast to plain timestamp — NTZ, no offset
    // (round 11; previously rendered the +00 deviation)
    assert(rows("generate_series(DATE '2023-01-01', DATE '2023-01-03', " +
      "INTERVAL '1' DAY)") === Seq("2023-01-01 00:00:00",
      "2023-01-02 00:00:00", "2023-01-03 00:00:00"))
  }

  test("grammar: ANY/ALL/SOME over arrays, OVERLAPS, BETWEEN SYMMETRIC") {
    assert(one("'a' < ANY (ARRAY['b', 'c'])") === "t")
    assert(one("'z' > ALL (ARRAY['a', 'b'])") === "t")
    assert(one("3 = SOME (ARRAY[1, 2, 3])") === "t")
    assert(one("5 = ANY (ARRAY[1, 2, 3])") === "f")
    assert(one("1 <> ALL (ARRAY[2, 3])") === "t")
    assert(one("(DATE '2023-01-01', DATE '2023-06-01') OVERLAPS " +
      "(DATE '2023-05-01', DATE '2023-12-01')") === "t")
    assert(one("(DATE '2023-01-01', DATE '2023-02-01') OVERLAPS " +
      "(DATE '2023-05-01', DATE '2023-12-01')") === "f")
    assert(one("2 BETWEEN SYMMETRIC 3 AND 1") === "t")
    assert(one("4 BETWEEN SYMMETRIC 3 AND 1") === "f")
    assert(one("localtimestamp <= localtimestamp") === "t")
  }

  test("aggregate-internal ORDER BY for string_agg / array_agg") {
    def agg(expr: String, from: String): String = {
      graft.pgwire.PgFunctions.registerAll(spark)
      val sql = graft.pgwire.Compat.rewrite(s"SELECT $expr FROM $from")
      val df = spark.sql(sql)
      graft.pgwire.TextEncoder.encodeField(df.collect()(0).get(0),
        df.schema.fields(0), java.time.ZoneOffset.UTC).getOrElse("<NULL>")
    }
    assert(agg("string_agg(x, ',' ORDER BY x)", "(VALUES ('b'),('a')) t(x)") === "a,b")
    assert(agg("string_agg(x, '-' ORDER BY x DESC)", "(VALUES ('b'),('a')) t(x)") ===
      "b-a")
    assert(agg("array_agg(x ORDER BY x DESC)", "(VALUES (1),(3),(2)) t(x)") ===
      "{3,2,1}")
    assert(agg("array_agg(x ORDER BY x)", "(VALUES (3),(1),(2)) t(x)") === "{1,2,3}")
    // the ORDER BY key is NOT the aggregated expression — pg orders by
    // the KEY (live pg 15: "b,a" / "{b,a}")
    assert(agg("string_agg(name, ',' ORDER BY id)",
      "(VALUES (2,'a'),(1,'b')) t(id,name)") === "b,a")
    assert(agg("array_agg(name ORDER BY id)",
      "(VALUES (2,'a'),(1,'b')) t(id,name)") === "{b,a}")
    // numeric ORDER BY keys sort numerically, not as strings
    // (live pg 15: [2, 10]; compact rendering is the documented deviation)
    assert(agg("json_agg(x ORDER BY x)", "(VALUES (2),(10)) t(x)") === "[2, 10]")
    assert(agg("jsonb_agg(x ORDER BY x DESC)", "(VALUES (2),(10),(1)) t(x)") === "[10, 2, 1]")
    // NULL keys place like pg: NULLS LAST ascending
    assert(agg("json_agg(x ORDER BY x)", "(VALUES ('b'),(NULL),('a')) t(x)") === """["a", "b", null]""")
    assert(agg("string_agg(x, ',' ORDER BY x)", "(VALUES ('b'),(NULL),('a')) t(x)") ===
      "a,b")
    // multiple ORDER BY keys
    assert(agg("string_agg(name, ',' ORDER BY grp, id)",
      "(VALUES (2,2,'a'),(1,1,'b'),(1,0,'c')) t(grp,id,name)") === "c,b,a")
  }

  test("jsonb mutators raise pg's non-integer path element error (live pg 15)") {
    // pg: ERROR: path element at position 2 is not an integer: "x"
    val e1 = intercept[Exception](one("""jsonb_set('{"a":[1]}','{a,x,b}','2')"""))
    assert(e1.getMessage.contains("path element at position 2 is not an integer"),
      e1.getMessage)
    val e2 = intercept[Exception](
      one("""jsonb_delete_path('{"a":[1]}', '{a,x,b}')"""))
    assert(e2.getMessage.contains("path element at position 2 is not an integer"),
      e2.getMessage)
    // …but an intermediate MISSING OBJECT key still no-ops (live pg 15)
    assert(one("""jsonb_set('{"a":{"q":1}}','{a,x,b}','2')""") === """{"a": {"q": 1}}""")
  }

  test("json_to_record / json_to_recordset row expansion (live pg 15)") {
    def rows(sql: String): Seq[String] = {
      graft.pgwire.PgFunctions.registerAll(spark)
      val df = spark.sql(graft.pgwire.Compat.rewrite(sql))
      df.collect().toSeq.map(r => df.schema.fields.indices.map(i =>
        graft.pgwire.TextEncoder.encodeField(r.get(i), df.schema.fields(i),
          java.time.ZoneOffset.UTC).getOrElse("<NULL>")).mkString("|"))
    }
    // extra keys ignored; declared columns fill by name
    assert(rows("""SELECT a, b FROM
      json_to_record('{"a":1,"b":"x","extra":9}') AS t(a int, b text)""") ===
      Seq("1|x"))
    // missing keys → NULL; a json string "7" coerces into int (pg
    // text-input conversion)
    assert(rows("""SELECT a, c FROM json_to_record('{"a":1}') AS t(a int, c text)""") ===
      Seq("1|<NULL>"))
    assert(rows("""SELECT a FROM jsonb_to_record('{"a":"7"}') AS t(a int)""") ===
      Seq("7"))
    // typed columns: date and double precision
    assert(rows("""SELECT d, f FROM
      json_to_record('{"d":"2024-01-02","f":2.5}') AS t(d date, f double precision)""") ===
      Seq("2024-01-02|2.5"))
    // recordset: one row per array element
    assert(rows("""SELECT x, y FROM
      json_to_recordset('[{"x":1,"y":"a"},{"x":2}]') AS t(x int, y text)""") ===
      Seq("1|a", "2|<NULL>"))
  }

  test("::json/::jsonb cast marks values json-typed for json_build_* (live pg 15)") {
    // pg embeds a jsonb-typed argument raw: {"k" : {"a": 1}}
    // pg: `{"k" : {"a": 1}}` — builder " : " spacing around the
    // embedded canonical jsonb
    assert(one("""json_build_object('k', '{"a":1}'::jsonb)""") === """{"k" : {"a": 1}}""")
    // a ::json (non-b) argument embeds its ORIGINAL text verbatim
    // (round 14 — the previous pin captured the engine's normalizing
    // deviation; live pg 15 keeps the source bytes)
    assert(one("""json_build_array('[1,2]'::json, 'txt')""") === """[[1,2], "txt"]""")
    assert(one("""json_build_array('[1 ,2]'::json, 'txt')""") === """[[1 ,2], "txt"]""")
    // the cast alone validates + normalizes
    assert(one("""'{"a" :  1}'::jsonb""") === """{"a": 1}""")
    val e = intercept[Exception](one("'{nope'::jsonb"))
    assert(e.getMessage.contains("invalid input syntax for type json"), e.getMessage)
  }

  /** Like `one` but through Handlers.runSql — the server's full query
    * path including the pg.type=time output tagging, which the TIME
    * rendering depends on. */
  private def oneServer(expr: String): String = {
    graft.pgwire.PgFunctions.registerAll(spark)
    val df = graft.pgwire.Handlers.runSql(spark, s"SELECT $expr AS v")
    val row = df.collect()(0)
    graft.pgwire.TextEncoder.encodeField(row.get(0), df.schema.fields(0),
      java.time.ZoneOffset.UTC).getOrElse("<NULL>")
  }

  test("TIME input/output parity (live pg 15 pins)") {
    // colon, short, compact, fraction (rounded to micros), 24:00
    assert(oneServer("'12:34:56'::time") === "12:34:56")
    assert(oneServer("'12:34'::time") === "12:34:00")
    assert(oneServer("'123456'::time") === "12:34:56")
    assert(oneServer("'1234'::time") === "12:34:00")
    assert(oneServer("'12:34:56.789'::time") === "12:34:56.789")
    assert(oneServer("'12:34:56.123456789'::time") === "12:34:56.123457")
    assert(oneServer("'120000.5'::time") === "12:00:00.5")
    assert(oneServer("'24:00:00'::time") === "24:00:00")
    // AM/PM and zone-offset dropping
    assert(oneServer("'12:34:56 PM'::time") === "12:34:56")
    assert(oneServer("'1:00 PM'::time") === "13:00:00")
    assert(oneServer("'12:30 AM'::time") === "00:30:00")
    assert(oneServer("'12:34:56+05'::time") === "12:34:56")
    assert(oneServer("'12:34:56-08:30'::time") === "12:34:56")
    // literal / CAST / chained-cast spellings
    assert(oneServer("TIME '03:04'") === "03:04:00")
    assert(oneServer("CAST('12:34:56' AS time)") === "12:34:56")
    assert(oneServer("'2026-08-13 12:34:56'::timestamp::time") === "12:34:56")
    assert(oneServer("'12:34:56'::time without time zone") === "12:34:56")
    // pg error classes: 22008 out of range, 22007 invalid syntax
    for (bad <- Seq("24:00:01", "25:00", "12:60", "13:00 PM"))
      assert(pgCode(intercept[Exception](oneServer(s"'$bad'::time"))) === Some("22008"), bad)
    for (bad <- Seq("abc", "996", "12"))
      assert(pgCode(intercept[Exception](oneServer(s"'$bad'::time"))) === Some("22007"), bad)
  }

  test("TIME RowDescription OID and binary wire form") {
    graft.pgwire.PgFunctions.registerAll(spark)
    val df = graft.pgwire.Handlers.runSql(spark, "SELECT '12:34:56'::time AS t")
    val f = df.schema.fields(0)
    assert(graft.pgwire.PgType.isTimeField(f))
    assert(graft.pgwire.PgType.oidOf(f) === 1083)
    // binary TIME = micros-since-midnight int8
    val nanos = df.collect()(0).getLong(0)
    assert(nanos / 1000L === (12L * 3600 + 34 * 60 + 56) * 1000000L)
  }

  private def pgCode(e: Throwable): Option[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .collectFirst { case p: graft.pgwire.PgException => p.code }

  test("sweep-4: ROW constructor, ?|/?&, @> with rhs casts (live pg 15)") {
    assert(one("row_to_json(ROW(1, 'x'))") === """{"f1":1,"f2":"x"}""")
    assert(one("""'{"a":1,"b":2}'::jsonb ?| array['b','x']""") === "t")
    assert(one("""'{"a":1,"b":2}'::jsonb ?| array['y','x']""") === "f")
    assert(one("""'{"a":1,"b":2}'::jsonb ?& array['a','b']""") === "t")
    assert(one("""'{"a":1,"b":2}'::jsonb ?& array['a','x']""") === "f")
    // rhs ::jsonb casts absorbed into the operator rewrite
    assert(one("""'{"a":{"b":2}}'::jsonb @> '{"a":{}}'::jsonb""") === "t")
    assert(one("""'[1,2,3]'::jsonb @> '3'::jsonb""") === "t")
    assert(one("""'[[1,2]]'::jsonb @> '[2,1]'::jsonb""") === "f")
    assert(one("""'{"a":1}'::jsonb <@ '{"a":1,"b":2}'::jsonb""") === "t")
  }

  test("sweep-4: to_char PL keeps the default sign column (live pg 15)") {
    assert(one("to_char(485, 'PL999')") === "+ 485")
    assert(one("to_char(485, 'FMPL999')") === "+485")
    assert(one("to_char(-485, 'PL999')") === " -485")
    assert(one("to_char(-485, 'FMPL999')") === "-485")
    assert(one("to_char(485, 'SG999')") === "+485") // SG replaces the column
    assert(one("to_char(485, '999PL')") === " 485+")
  }

  test("sweep-4: interval extract, mixed literals, pg pluralization (live pg 15)") {
    // pg does not normalize interval fields across units
    assert(one("extract(epoch from interval '1 day 2:03:04')") === "93784.000000")
    assert(one("extract(hours from interval '1 day 2:03:04')") === "2")
    assert(one("extract(hours from interval '100 hours')") === "100")
    assert(one("extract(days from interval '100 hours')") === "0")
    assert(one("extract(minutes from interval '100 hours')") === "0")
    assert(one("extract(seconds from interval '1 min 30.5 sec')") === "30.500000")
    assert(one("extract(microseconds from interval '1 min 30.5 sec')") === "30500000")
    assert(one("extract(year from interval '14 months')") === "1")
    assert(one("extract(month from interval '14 months')") === "2")
    assert(one("extract(epoch from interval '1 year')") === "31557600.000000")
    assert(one("date_part('hours', interval '100 hours')") === "100")
    // mixed-sign literals keep pg's independent day/time fields
    assert(one("interval '-1 day 5 hours'") === "-1 days +05:00:00")
    assert(one("interval '1 day -5 hours'") === "1 day -05:00:00")
    // pg pluralizes every value except exactly 1
    assert(one("- interval '1 day 2 hours'") === "-1 days -02:00:00")
    assert(one("interval '-1 mon'") === "-1 mons")
    assert(one("interval '1 mon'") === "1 mon")
    // day + colon-time in one literal
    assert(one("interval '1 day 2:03:04'") === "1 day 02:03:04")
  }

  test("json[b]_populate_record[set] expands from a table row type (live pg 15 shape)") {
    graft.pgwire.PgFunctions.registerAll(spark)
    graft.Tables.register(spark, "/root/testdata/sf0.001")
    def q(sql: String): Seq[String] =
      graft.pgwire.Handlers.runSql(spark, sql).collect().toSeq
        .map(_.toSeq.map(v => if (v == null) "<NULL>" else v.toString).mkString("|"))
    // missing keys → NULL (pg: defaults from the NULL base row)
    assert(q("""SELECT r_regionkey, r_name FROM
      json_populate_record(null::region, '{"r_regionkey": 7}')""") === Seq("7|<NULL>"))
    // string number coerces into the int column (pg text-input conversion)
    assert(q("""SELECT r_regionkey FROM
      jsonb_populate_record(null::region, '{"r_regionkey": "3"}')""") === Seq("3"))
    // recordset: one row per array element; alias without AS
    assert(q("""SELECT x.r_regionkey FROM jsonb_populate_recordset(null::region,
      '[{"r_regionkey":1},{"r_regionkey":2}]') x ORDER BY 1""") === Seq("1", "2"))
    // unknown table name → untouched call → engine error surfaces
    val e = intercept[Exception](q(
      "SELECT * FROM json_populate_record(null::no_such_tbl, '{}')"))
    assert(e.getMessage != null)
  }

  test("sweep-4: string_agg DISTINCT feeds values in sorted order (live pg 15)") {
    assert(one("(SELECT string_agg(DISTINCT x, ',') FROM (VALUES ('b'),('a'),('b')) t(x))") ===
      "a,b")
    assert(one("(SELECT string_agg(DISTINCT x, ',') FROM (VALUES (CAST(NULL AS STRING))) t(x))") ===
      "<NULL>")
  }

  test("sweep-5: array_agg keeps NULL elements; FILTER folds in (live pg 15)") {
    // Spark's collect_list silently drops NULLs; pg keeps them
    assert(one("(SELECT array_agg(v) FROM (SELECT lead(x, 2) OVER (ORDER BY x) v " +
      "FROM (VALUES (1),(2),(3)) t(x)) s)") === "{3,NULL,NULL}")
    assert(one("(SELECT array_agg(x ORDER BY x) FILTER (WHERE x > 1) " +
      "FROM (VALUES (3),(1),(2)) t(x))") === "{2,3}")
    assert(one("(SELECT array_agg(x) FILTER (WHERE x > 1) " +
      "FROM (VALUES (3),(1),(2)) t(x))") === "{3,2}")
  }

  test("sweep-5: grammar — FETCH FIRST, GROUP BY (), unnest, slices (live pg 15)") {
    assert(one("(SELECT x FROM (VALUES (1),(2)) t(x) ORDER BY x FETCH FIRST 1 ROW ONLY)") === "1")
    assert(one("(SELECT sum(x) FROM (VALUES (1),(2)) t(x) GROUP BY ())") === "3")
    assert(one("(SELECT sum(u) FROM unnest(ARRAY[1,2,3]) u)") === "6")
    assert(one("(SELECT string_agg(k || '=' || v, ',') FROM " +
      "unnest(ARRAY['a','b'], ARRAY['1','2']) AS t(k, v))") === "a=1,b=2")
    assert(one("(ARRAY[1,2,3])[1:2]") === "{1,2}")
    assert(one("string_to_array('a,b,c', ',', 'b')") === "{a,NULL,c}")
    assert(one("now() = transaction_timestamp()") === "t")
  }

  test("sweep-5: intervals — colon literals, to_char, date_trunc, isfinite (live pg 15)") {
    assert(one("interval '25:10:05'") === "25:10:05")
    assert(one("to_char(interval '25:10:05', 'HH24 MI SS')") === "25 10 05")
    assert(one("date_trunc('hour', interval '3 days 2:47:33')") === "3 days 02:00:00")
    assert(one("isfinite(interval '1 day')") === "t")
    assert(one("to_char(TIMESTAMP '2024-03-07 13:05:06.345678', 'MS US FF3')") ===
      "345 345678 345")
    assert(one("to_char(TIMESTAMP '2024-03-07 13:05:06.345678', 'FF1 FF6')") ===
      "3 345678")
  }

  test("DISTINCT ON keeps the first row per key in ORDER BY order (live pg 15)") {
    def q(sql: String): Seq[String] =
      graft.pgwire.Handlers.runSql(spark, sql).collect().toSeq
        .map(_.toSeq.map(String.valueOf).mkString("|"))
    assert(q("SELECT DISTINCT ON (x % 2) x, y FROM " +
      "(VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')) t(x,y) ORDER BY x % 2, x DESC") ===
      Seq("4|d", "3|c"))
    assert(q("SELECT DISTINCT ON (y) y, x FROM (VALUES (1,'a'),(2,'a'),(3,'b')) t(x,y) " +
      "ORDER BY y, x DESC LIMIT 1") === Seq("a|2"))
    // without ORDER BY: one arbitrary row per key (count is defined)
    assert(q("SELECT count(*) FROM (SELECT DISTINCT ON (y) x FROM " +
      "(VALUES (1,'a'),(2,'a'),(3,'b')) t(x,y) ORDER BY y, x) s") === Seq("2"))
  }

  test("sweep-5: timestamp/date ± time arithmetic (live pg 15)") {
    // round 11: plain `timestamp` is NTZ end-to-end, so these render
    // exactly live pg's output (no +00 — the old deviation is closed)
    assert(one("timestamp '2024-03-07 10:11:12' + time '01:02:03'") ===
      "2024-03-07 11:13:15")
    assert(one("timestamp '2024-03-07' - time '01:00:00'") ===
      "2024-03-06 23:00:00")
    // date + time starts from DATE, so the sweep-6 date±interval rule
    // carries it to timestamp WITHOUT tz — pg's exact output
    assert(one("date '2024-03-07' + time '12:30:00'") ===
      "2024-03-07 12:30:00")
  }

  test("sweep-6: integer division truncates; numeric→int casts round (live pg 15)") {
    assert(one("7 / 2") === "3")
    assert(one("(-7) / 2") === "-3")
    assert(one("pg_typeof(7 / 2)") === "integer")
    assert(one("pg_typeof(7::bigint / 2)") === "bigint")
    // explicit float cast keeps float division (USER_SPECIFIED_CAST guard)
    assert(one("7::float8 / 2") === "3.5")
    assert(one("cast(2.999 as int)") === "3")
    assert(one("cast(2.5 as int)") === "3")
    assert(one("cast(-2.5 as int)") === "-3")
    assert(one("cast(3.5 as int)") === "4")
    assert(one("cast(2.4 as int)") === "2")
    // date − date is an integer day count, composable as one
    assert(one("date '2024-03-01' - date '2024-02-01'") === "29")
    assert(one("date '2024-03-01' - date '2024-02-01' - 1") === "28")
    // date ± interval is a timestamp (pg: without time zone)
    assert(one("'2024-01-01'::date - '1 day'::interval") === "2023-12-31 00:00:00")
    assert(one("date '2024-01-01' + interval '90 minutes'") === "2024-01-01 01:30:00")
  }

  test("sweep-6: LIKE-operator spellings and ROW IS NULL field semantics (live pg 15)") {
    assert(one("'abc' ~~ 'a%'") === "t")
    assert(one("'abc' !~~ 'a%'") === "f")
    assert(one("'ABC' ~~* 'a%'") === "t")
    assert(one("'ABC' !~~* 'a%'") === "f")
    assert(one("ROW(NULL, NULL) IS NULL") === "t")
    assert(one("ROW(1, NULL) IS NULL") === "f")
    assert(one("ROW(1, 2) IS NOT NULL") === "t")
    assert(one("ROW(1, NULL) IS NOT NULL") === "f")
  }

  test("sweep-6: substring forms — 2-arg FROM and SIMILAR/ESCAPE (live pg 15)") {
    assert(one("substring('Thomas' from 3)") === "omas")
    assert(one("substring('Thomas' from 2 for 3)") === "hom")
    assert(one("""substring('Thomas' similar '%#"o_a#"_' escape '#')""") === "oma")
    assert(one("substring('Thomas' similar '%mas' escape '#')") === "Thomas")
    assert(one("substring('Thomas' similar 'X%' escape '#')") === "<NULL>")
  }

  test("sweep-6: array ops — elem concat, array_dims (live pg 15)") {
    assert(one("ARRAY[1,2] || 3") === "{1,2,3}")
    assert(one("4 || ARRAY[5,6]") === "{4,5,6}")
    assert(one("ARRAY[1] || 2 || 3") === "{1,2,3}")
    assert(one("ARRAY[1,2] || ARRAY[3]") === "{1,2,3}")
    assert(one("array_dims(ARRAY[1,2,3])") === "[1:3]")
    assert(one("array_dims(ARRAY[]::int[])") === "<NULL>")
  }

  test("sweep-6: make_time/make_interval/make_timestamp/julian (live pg 15)") {
    assert(one("make_time(8, 15, 23.5)") === "08:15:23.5")
    assert(one("make_interval(years => 1, months => 2, days => 3)") ===
      "1 year 2 mons 3 days")
    assert(one("make_interval(hours => 5, secs => 1.5)") === "05:00:01.5")
    // pg make_timestamp returns timestamp WITHOUT tz (no +00)
    assert(one("make_timestamp(2024, 6, 1, 12, 30, 45.5)") === "2024-06-01 12:30:45.5")
    assert(one("extract(julian from date '2024-01-01')") === "2460311")
    assert(one("extract(julian from timestamp '1969-12-31 12:00')") === "2440587.5")
    assert(one("to_char(interval '15h 2m 12s', 'HH24:MI:SS')") === "15:02:12")
  }

  test("sweep-6: hypothetical-set aggregates lower to counting aggregates (live pg 15)") {
    def agg(fn: String, v: String, dirn: String = "") =
      one(s"(SELECT $fn($v) WITHIN GROUP (ORDER BY x $dirn) " +
        "FROM (VALUES (1.0),(2.0),(3.0),(4.0)) t(x))")
    assert(agg("rank", "2.5") === "3")
    assert(agg("rank", "2.5", "DESC") === "3")
    assert(agg("percent_rank", "2.5") === "0.5")
    assert(agg("cume_dist", "2.5") === "0.6")
    assert(one("(SELECT dense_rank(2.5) WITHIN GROUP (ORDER BY x) " +
      "FROM (VALUES (1.0),(2.0),(2.0),(3.0)) t(x))") === "3")
    assert(one("(SELECT cume_dist(2.0) WITHIN GROUP (ORDER BY x) " +
      "FROM (VALUES (1.0),(2.0),(2.0),(3.0)) t(x))") === "0.8")
    // NULL hypothetical ranks after all non-nulls (ASC NULLS LAST)
    assert(one("(SELECT rank(NULL::numeric) WITHIN GROUP (ORDER BY x) " +
      "FROM (VALUES (1.0),(2.0)) t(x))") === "3")
  }

  test("sweep-6: regr_avgx/avgy are float8 for any input (live pg 15)") {
    assert(one("(SELECT regr_avgx(y,x) FROM (VALUES (1.0,2.0),(2.0,4.1),(3.0,5.9)) t(x,y))") === "2")
    assert(one("(SELECT regr_avgy(y,x) FROM (VALUES (1.0,2.0),(2.0,4.1),(3.0,5.9)) t(x,y))") === "4")
  }

  test("sweep-7: AT TIME ZONE both directions + timestamptz literals (live pg 15)") {
    // naive literal interpreted IN the zone → timestamptz (+00 render)
    assert(one("timestamp '2024-06-01 12:00:00' AT TIME ZONE 'America/New_York'") ===
      "2024-06-01 16:00:00+00")
    assert(one("timestamp '2024-01-15 00:00:00' AT TIME ZONE 'UTC'") ===
      "2024-01-15 00:00:00+00")
    // timestamptz converted TO the zone → naive timestamp
    assert(one("timestamptz '2024-06-01 12:00:00+00' AT TIME ZONE 'America/New_York'") ===
      "2024-06-01 08:00:00")
    assert(one("timestamptz '2024-06-01 12:00:00+00'") === "2024-06-01 12:00:00+00")
  }

  test("sweep-7: order-insensitive aggregates accept ORDER BY; char casts (live pg 15)") {
    assert(one("(SELECT max(x ORDER BY x) FROM (VALUES (3),(1)) t(x))") === "3")
    assert(one("(SELECT sum(x ORDER BY x DESC) FROM (VALUES (3),(1)) t(x))") === "4")
    // char(n) blank-pads and truncates; varchar(n) truncates
    assert(one("'   '::char(5)") === "     ")
    assert(one("'abcdef'::char(3)") === "abc")
    assert(one("'ab'::varchar(1)") === "a")
    assert(one("'ab'::varchar(10)") === "ab")
  }

  test("sweep-7: pg output functions in concat and float→text (live pg 15)") {
    assert(one("concat('a', 2, NULL, true)") === "a2t")
    assert(one("concat(false, 'x')") === "fx")
    // but the text CAST of boolean stays 'true'/'false' (pg quirk)
    assert(one("true::text") === "true")
    assert(one("1e3::text") === "1000")
    assert(one("1.5e-3::text") === "0.0015")
    assert(one("(1.0::float8 / 3)::text") === "0.3333333333333333")
  }

  test("sweep-8: LIKE/ILIKE/SIMILAR/regex escape semantics (live pg 15)") {
    assert(one("""'st_astext' LIKE 'st\_%'""") === "t")
    assert(one("""'stXastext' LIKE 'st\_%'""") === "f")
    assert(one("""'a%c' LIKE 'a\%c'""") === "t")
    assert(one("'abc' LIKE 'a#_c' ESCAPE '#'") === "f")
    assert(one("'a_c' LIKE 'a#_c' ESCAPE '#'") === "t")
    assert(one("'a#c' LIKE 'a##c' ESCAPE '#'") === "t")
    assert(one("'ABC' ILIKE 'ab_'") === "t")
    assert(one("""'a_c' SIMILAR TO 'a\_c'""") === "t")
    assert(one("""'backslash\' ~ '\\$'""") === "t")
    assert(one("""'a1c' ~ 'a\dc'""") === "t")
    assert(one("like_escape('a#_c', '#')") === """a\_c""")
    assert(one("like_escape('a##b', '#')") === """a\#b""")
    assert(one("""like_escape('a\b', '')""") === """a\\b""")
    assert(one("like_escape('ab#', '#')") === """ab\""")
  }

  test("sweep-8: NTZ timestamp semantics — extract, trunc, flexible input (live pg 15)") {
    // EXTRACT returns numeric (epoch at scale 6); date_part stays float8
    assert(one("extract(epoch from '2024-03-07 00:00:00'::timestamp)") ===
      "1709769600.000000")
    assert(one("date_part('epoch', '2024-03-07 00:00:00'::timestamp)") ===
      "1709769600")
    // date_trunc over NTZ input returns plain timestamp (no +00)
    assert(one("date_trunc('hour', '2024-03-07 10:41:12'::timestamp)") ===
      "2024-03-07 10:00:00")
    assert(one("date_trunc('week', '2024-03-07'::timestamp)") ===
      "2024-03-04 00:00:00")
    // pg's flexible datetime input forms for literals
    assert(one("'20240307 101112'::timestamp") === "2024-03-07 10:11:12")
    assert(one("'March 7, 2024 10:11'::timestamp") === "2024-03-07 10:11:00")
    assert(one("'7 Mar 2024'::timestamp") === "2024-03-07 00:00:00")
    assert(one("'2024-03-07 10:11:12+05'::timestamp") === "2024-03-07 10:11:12")
    assert(one("'2024-3-7 1:02 PM'::timestamp") === "2024-03-07 13:02:00")
    assert(one("'epoch'::timestamp") === "1970-01-01 00:00:00")
    // series over NTZ endpoints yields NTZ rows (pg: 3 plain timestamps)
    def q(sql: String): Seq[String] =
      graft.pgwire.Handlers.runSql(spark, sql).collect().toSeq
        .map(r => graft.pgwire.TextEncoder.encodeField(r.get(0),
          graft.pgwire.Handlers.runSql(spark, sql).schema.fields(0),
          java.time.ZoneOffset.UTC).getOrElse("<NULL>"))
    assert(q("SELECT * FROM generate_series('2024-01-01'::timestamp, " +
      "'2024-01-03'::timestamp, interval '1 day') AS g") ===
      Seq("2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 00:00:00"))
    // interval corners from the same sweep
    assert(one("justify_hours(interval '27 hours')") === "1 day 03:00:00")
    assert(one("justify_days(interval '35 days')") === "1 mon 5 days")
    assert(one("interval '1 day 3 hours' / 2") === "13:30:00")
    assert(one("'2024-03-07 10:11:12'::timestamp - '2024-03-01 00:00:00'::timestamp") ===
      "6 days 10:11:12")
  }

  test("sweep-9: rounding modes, intervals, multidim arrays, numeric literals (live pg 15)") {
    // float8 rounds half-to-EVEN; numeric half-away-from-zero
    assert(one("round(2.5::float8)") === "2")
    assert(one("round(3.5::float8)") === "4")
    assert(one("round(2.5)") === "3")
    assert(one("2.5::float8::int") === "2")
    assert(one("2.5::numeric::int") === "3")
    // SQL-standard interval shorthands
    assert(one("interval '1-2'") === "1 year 2 mons")
    assert(one("interval '3 4:05:06'") === "3 days 04:05:06")
    // interval output function through ::text
    assert(one("interval '1 year 2 mons'::text") === "1 year 2 mons")
    assert(one("interval '1 day 12 hours'::text") === "1 day 12:00:00")
    assert(one("interval '36 hours'::text") === "36:00:00")
    // mixed year-month/day-time arithmetic keeps fields independent
    assert(one("interval '2 mons' - interval '10 days'") === "2 mons -10 days")
    assert(one("interval '1 year' + interval '1 day'") === "1 year 1 day")
    // multidimensional ARRAY literal renders pg's nested-brace form
    assert(one("ARRAY[[1,2],[3,4]]") === "{{1,2},{3,4}}")
    // NUMERIC typed literal keeps the spelled scale; integer ::numeric
    // stays decimal-typed (the /3 = 0 int-division regression)
    assert(one("numeric '12.3450'") === "12.3450")
    assert(one("(2::numeric / 3) > 0.6") === "t")
    // documented deviations kept visible: decimal division scale is
    // Spark's (pg renders 20 digits), to_char L is en_US, sqrt over
    // numeric keeps double precision
  }

  test("sweep-10: aggregate result rendering and DISTINCT array_agg (live pg 15)") {
    def agg(sql: String): String = {
      val df = graft.pgwire.Handlers.runSql(spark, s"SELECT $sql")
      graft.pgwire.TextEncoder.encodeField(df.collect().head.get(0),
        df.schema.fields(0), java.time.ZoneOffset.UTC).getOrElse("<NULL>")
    }
    // pg avg over int/numeric renders numeric with >= 16 fractional
    // digits; float8 input stays float8
    assert(agg("avg(x) FROM (VALUES (2),(3)) t(x)") === "2.5000000000000000")
    assert(agg("avg(x) FROM (VALUES (2.0),(3.0)) t(x)") === "2.5000000000000000")
    assert(agg("avg(x) FROM (VALUES (2.5::float8),(3.5::float8)) t(x)") === "3")
    // array_agg(DISTINCT …): sorted distinct set, NULL once
    // (NULLS LAST asc / FIRST desc), exactly live pg
    assert(agg("array_agg(DISTINCT x ORDER BY x) FROM (VALUES (2),(1),(2)) t(x)") ===
      "{1,2}")
    assert(agg("array_agg(DISTINCT x ORDER BY x DESC) FROM (VALUES (2),(1),(NULL)) t(x)") ===
      "{NULL,2,1}")
    assert(agg("array_agg(DISTINCT x) FROM (VALUES ('b'),('a'),(NULL),('a')) t(x)") ===
      "{a,b,NULL}")
    // sum result types match pg: int → bigint, rendered bare
    assert(agg("sum(x) FROM (VALUES (2),(3)) t(x)") === "5")
    assert(agg("string_agg(x, ',' ORDER BY x DESC) FROM (VALUES ('a'),('b'),('c')) t(x)") ===
      "c,b,a")
    // documented deviations: stddev/variance over ints compute in
    // float8 (pg: exact numeric at 20 digits); json_agg spacing is
    // compact (pg spaces per-function); GROUPS frames and window
    // EXCLUDE are unsupported (no Spark counterpart)
  }

  test("sweep-12: bytea string functions, sha2 family, date_bin NTZ (live pg 15)") {
    // byte-level substring/trim — previously mangled through the
    // string-typed UDFs' UTF-8 round trip
    assert(one("""substring('\x1234567890'::bytea from 2 for 3)""") === """\x345678""")
    assert(one("""substr('\x1234567890'::bytea, 3)""") === """\x567890""")
    assert(one("""ltrim('\x123412'::bytea, '\x12'::bytea)""") === """\x3412""")
    assert(one("""btrim('\x12341234'::bytea, '\x12'::bytea)""") === """\x341234""")
    // sha2 digests return bytea like pg (not Spark's hex text)
    assert(one("sha256('abc')") ===
      """\xba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad""")
    assert(one("sha224('abc')") ===
      """\x23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7""")
    assert(one("encode(sha256('abc'), 'hex')") ===
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    // date_bin keeps the source's type: NTZ in → NTZ out (no +00)
    assert(one("date_bin('1 hour', timestamp '2024-03-07 10:41', " +
      "timestamp '2024-03-07')") === "2024-03-07 10:00:00")
    // unicode rows verified against a UTF8-encoded cluster: char
    // semantics (not bytes) for left/length/ascii/chr
    assert(one("left('αβγδ', 2)") === "αβ")
    assert(one("length('αβγδ')") === "4")
    assert(one("chr(945)") === "α")
  }

  test("sweep-11: composite IS [NOT] NULL is field-wise (live pg 15, docs §9.2)") {
    // the famous asymmetry: a mixed row fails BOTH tests
    assert(one("ROW(NULL, NULL) IS NULL") === "t")
    assert(one("ROW(1, NULL) IS NULL") === "f")
    assert(one("ROW(1, NULL) IS NOT NULL") === "f")
    assert(one("ROW(1, 2) IS NOT NULL") === "t")
    assert(one("ROW(1, 2) IS NULL") === "f")
  }

  test("sweep-13: range types — full live-pg-pinned matrix (pg §8.17/§9.19)") {
    // 109 expressions swept against live PostgreSQL 15.18 BEFORE the
    // implementation was written; every value below is the live
    // output (construction/canonicalization incl. discrete stepping
    // and 'empty' collapse, text casts with quoted bounds, the full
    // operator family @> <@ && << >> &< &> -|- + * -, accessors, the
    // range_cmp ordering, and pg_typeof subtype recovery)
    val pinned: Seq[(String, String)] = Seq(
    // --- construct ---
    ("int4range(1,5)", "[1,5)"),
    ("int4range(1,5,'[]')", "[1,6)"),
    ("int4range(1,5,'(]')", "[2,6)"),
    ("int4range(1,5,'()')", "[2,5)"),
    ("int4range(1,5,'[)')", "[1,5)"),
    ("int4range(5,5)", "empty"),
    ("int4range(5,5,'[]')", "[5,6)"),
    ("int4range(NULL,5)", "(,5)"),
    ("int4range(1,NULL)", "[1,)"),
    ("int4range(NULL,NULL)", "(,)"),
    ("int4range(NULL,5,'[]')", "(,6)"),
    ("int8range(10,20,'(]')", "[11,21)"),
    ("numrange(1.5,2.5)", "[1.5,2.5)"),
    ("numrange(1.5,2.5,'[]')", "[1.5,2.5]"),
    ("numrange(1.50,2)", "[1.50,2)"),
    ("numrange(5,5)", "empty"),
    ("numrange(5,5,'[]')", "[5,5]"),
    ("numrange(NULL,2.5,'(]')", "(,2.5]"),
    ("daterange('2026-01-01','2026-02-01')", "[2026-01-01,2026-02-01)"),
    ("daterange('2026-01-01','2026-02-01','[]')", "[2026-01-01,2026-02-02)"),
    ("daterange('2026-01-01','2026-01-01','(]')", "empty"),
    ("tsrange('2026-01-01 00:00:00','2026-01-02 12:30:00')", "[\"2026-01-01 00:00:00\",\"2026-01-02 12:30:00\")"),
    ("tsrange('2026-01-01 00:00:00.5','2026-01-02 00:00:00','[]')", "[\"2026-01-01 00:00:00.5\",\"2026-01-02 00:00:00\"]"),
    ("tstzrange('2026-01-01 00:00:00+00','2026-01-02 00:00:00+00')", "[\"2026-01-01 00:00:00+00\",\"2026-01-02 00:00:00+00\")"),
    ("'[1,5)'::int4range", "[1,5)"),
    ("'[1,5]'::int4range", "[1,6)"),
    ("'(1,5)'::int4range", "[2,5)"),
    ("'empty'::int4range", "empty"),
    ("' [1, 5) '::int4range", "[1,5)"),
    ("'[1.5,2.5]'::numrange", "[1.5,2.5]"),
    ("'(,5)'::int4range", "(,5)"),
    ("'[1,)'::int4range", "[1,)"),
    ("'(,)'::int4range", "(,)"),
    ("'[\"2026-01-01 00:00:00\",\"2026-01-02 00:00:00\")'::tsrange", "[\"2026-01-01 00:00:00\",\"2026-01-02 00:00:00\")"),
    ("'[2026-01-01 00:00:00,2026-01-02 00:00:00)'::tsrange", "[\"2026-01-01 00:00:00\",\"2026-01-02 00:00:00\")"),
    ("tstzrange('2026-01-01 00:00:00.5+00','2026-01-02 00:00:00+00','(]')", "(\"2026-01-01 00:00:00.5+00\",\"2026-01-02 00:00:00+00\"]"),
    ("daterange('2026-01-31','2026-01-31','[]')", "[2026-01-31,2026-02-01)"),
    // --- pred ---
    ("int4range(1,10) @> 5", "t"),
    ("int4range(1,10) @> 10", "f"),
    ("int4range(1,10) @> 1", "t"),
    ("int4range(1,10) @> int4range(2,4)", "t"),
    ("int4range(1,10) @> int4range(1,10)", "t"),
    ("int4range(1,10) @> 'empty'::int4range", "t"),
    ("'empty'::int4range @> 'empty'::int4range", "t"),
    ("'empty'::int4range @> 3", "f"),
    ("int4range(2,4) <@ int4range(1,10)", "t"),
    ("3 <@ int4range(1,10)", "t"),
    ("int4range(1,5) && int4range(4,8)", "t"),
    ("int4range(1,5) && int4range(5,8)", "f"),
    ("int4range(1,5) && 'empty'::int4range", "f"),
    ("'empty'::int4range && 'empty'::int4range", "f"),
    ("int4range(1,5) << int4range(5,8)", "t"),
    ("int4range(1,5) << int4range(4,8)", "f"),
    ("'empty'::int4range << int4range(1,2)", "f"),
    ("int4range(1,2) << 'empty'::int4range", "f"),
    ("int4range(5,8) >> int4range(1,5)", "t"),
    ("int4range(1,5) &< int4range(4,8)", "t"),
    ("int4range(4,8) &< int4range(1,5)", "f"),
    ("'empty'::int4range &< int4range(1,5)", "f"),
    ("int4range(4,8) &> int4range(1,5)", "t"),
    ("int4range(1,5) -|- int4range(5,8)", "t"),
    ("int4range(1,5) -|- int4range(6,8)", "f"),
    ("numrange(1,2) -|- numrange(2,3)", "t"),
    ("numrange(1,2,'[]') -|- numrange(2,3)", "f"),
    ("numrange(1,2,'[]') -|- numrange(2,3,'(]')", "t"),
    ("'empty'::int4range -|- 'empty'::int4range", "f"),
    // --- setop ---
    ("int4range(1,5) + int4range(4,8)", "[1,8)"),
    ("int4range(1,5) + int4range(5,8)", "[1,8)"),
    ("int4range(1,5) + 'empty'::int4range", "[1,5)"),
    ("'empty'::int4range + 'empty'::int4range", "empty"),
    ("int4range(1,5) * int4range(3,8)", "[3,5)"),
    ("int4range(1,5) * int4range(6,8)", "empty"),
    ("int4range(1,10) - int4range(5,15)", "[1,5)"),
    ("int4range(1,10) - int4range(0,5)", "[5,10)"),
    ("int4range(1,10) - int4range(1,10)", "empty"),
    ("int4range(1,10) - 'empty'::int4range", "[1,10)"),
    ("int4range(1,10) * 'empty'::int4range", "empty"),
    // --- acc ---
    ("lower(int4range(1,5))", "1"),
    ("upper(int4range(1,5))", "5"),
    ("lower(numrange(1.5,2.5))", "1.5"),
    ("lower(daterange('2026-01-01','2026-02-01'))", "2026-01-01"),
    ("lower(tsrange('2026-01-01 00:00:00','2026-01-02 00:00:00'))", "2026-01-01 00:00:00"),
    ("isempty(int4range(5,5))", "t"),
    ("isempty(int4range(1,5))", "f"),
    ("isempty('empty'::numrange)", "t"),
    ("lower_inc(int4range(1,5))", "t"),
    ("upper_inc(int4range(1,5))", "f"),
    ("upper_inc(numrange(1,5,'[]'))", "t"),
    ("lower_inc('(,5)'::int4range)", "f"),
    ("lower_inf('(,5)'::int4range)", "t"),
    ("lower_inf(int4range(1,5))", "f"),
    ("upper_inf('[1,)'::int4range)", "t"),
    ("lower_inf('empty'::int4range)", "f"),
    ("lower_inc('empty'::int4range)", "f"),
    ("range_merge(int4range(1,3), int4range(8,10))", "[1,10)"),
    ("range_merge('empty'::int4range, int4range(8,10))", "[8,10)"),
    ("range_merge('empty'::int4range, 'empty'::int4range)", "empty"),
    ("range_merge('(,3)'::int4range, int4range(8,10))", "(,10)"),
    // --- ord ---
    ("int4range(1,5) = int4range(1,5)", "t"),
    ("int4range(1,5) = '[1,5)'::int4range", "t"),
    ("int4range(1,5) <> int4range(1,6)", "t"),
    ("int4range(1,5) < int4range(1,6)", "t"),
    ("int4range(1,5) < int4range(2,3)", "t"),
    ("int4range(2,3) > int4range(1,5)", "t"),
    ("'empty'::int4range < int4range(1,2)", "t"),
    // --- typeof ---
    ("pg_typeof(int4range(1,5))", "int4range"),
    ("pg_typeof(numrange(1,2))", "numrange"),
    ("pg_typeof(int4range(1,5) + int4range(2,6))", "int4range"),
    ("pg_typeof(lower(int4range(1,5)))", "integer")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // infinite/empty bounds access as NULL (live pg: empty output)
    for (e <- Seq("lower('empty'::int4range)", "upper('empty'::int4range)",
      "lower('(,5)'::int4range)", "upper('[1,)'::int4range)"))
      assert(one(e) === "<NULL>", s"expr: $e")
    // error SQLSTATEs (live pg 15, \\set VERBOSITY verbose):
    // 22000 bounds order + non-contiguous set ops, 22P02 malformed
    // literal, 42601 invalid flags
    def err(e: String): String =
      intercept[Exception](one(e)).getMessage
    assert(err("numrange(2.5,1.5)").contains(
      "range lower bound must be less than or equal to range upper bound"))
    assert(err("int4range(1,5) + int4range(7,9)").contains(
      "result of range union would not be contiguous"))
    assert(err("int4range(1,10) - int4range(3,5)").contains(
      "result of range difference would not be contiguous"))
    assert(err("'{1,5'::int4range").contains("malformed range literal"))
    assert(err("int4range(1,5,'xx')").contains("invalid range bound flags"))
  }

  test("sweep-14: text search — to_tsvector/tsquery/@@/rank matrix (live pg 15)") {
    // 58 expressions swept against live PostgreSQL 15.18 BEFORE the
    // implementation was written (tokenizer classes incl. hyphen
    // compounds/urls/emails/files/numbers, Porter2 stemming + the
    // english stopword config, position semantics, tsquery parsing and
    // canonical rendering, @@ incl. phrase distance and prefix, and
    // EXACT ts_rank/ts_rank_cd float parity — the rank formulas were
    // reverse-engineered from controlled probes to 8 digits). The
    // stemmer is separately verified on 2980 live ts_lexize pairs
    // (TsStemDiff) and to_tsvector on 150 real `documents` rows
    // (TsDocDiff) — both 0 diffs.
    val pinned: Seq[(String, String)] = Seq(
    ("to_tsvector('english', 'The quick brown foxes jumped over the lazy dogs')", "'brown':3 'dog':9 'fox':4 'jump':5 'lazi':8 'quick':2"),
    ("to_tsvector('english', 'a fat cat sat on a mat - it ate a fat rats')", "'ate':9 'cat':3 'fat':2,11 'mat':7 'rat':12 'sat':4"),
    ("to_tsvector('simple', 'The Quick Brown Foxes!')", "'brown':3 'foxes':4 'quick':2 'the':1"),
    ("to_tsvector('english', 'foo-bar baz')", "'bar':3 'baz':4 'foo':2 'foo-bar':1"),
    ("to_tsvector('english', 'one-two-three four')", "'four':5 'one':2 'one-two-thre':1 'three':4 'two':3"),
    ("to_tsvector('simple', 'foo-bar')", "'bar':3 'foo':2 'foo-bar':1"),
    ("to_tsvector('english', 'version 1.2.3 released')", "'1.2.3':2 'releas':3 'version':1"),
    ("to_tsvector('english', 'pi is 3.14 and e is 2.71')", "'2.71':7 '3.14':3 'e':5 'pi':1"),
    ("to_tsvector('english', 'contact admin@example.com or visit https://example.com/page')", "'/page':7 'admin@example.com':2 'contact':1 'example.com':6 'example.com/page':5 'visit':4"),
    ("to_tsvector('english', 'file /usr/local/bin/thing')", "'/usr/local/bin/thing':2 'file':1"),
    ("to_tsvector('english', 'C3PO and R2D2 are droids 42')", "'42':6 'c3po':1 'droid':5 'r2d2':3"),
    ("to_tsvector('english', 'repeated repeated repeated words')", "'repeat':1,2,3 'word':4"),
    ("to_tsvector('english', '  punctuation!!! ... (parens) [brackets] {braces}  ')", "'brace':4 'bracket':3 'paren':2 'punctuat':1"),
    ("to_tsvector('english', 'Don''t stop believing')", "'believ':4 'stop':3"),
    ("to_tsvector('english', 'o''clock at the king''s castle')", "'castl':7 'clock':2 'king':5 'o':1"),
    ("to_tsvector('english', 'x y z i a')", "'x':1 'y':2 'z':3"),
    ("to_tsvector('english', 'under_score snake_case_name')", "'case':4 'name':5 'score':2 'snake':3"),
    ("to_tsvector('simple', '123 45.67 1e10')", "'123':1 '1e10':3 '45.67':2"),
    ("to_tsvector('english', 'MixedCASE WORDS lower UPPER')", "'lower':3 'mixedcas':1 'upper':4 'word':2"),
    ("length(to_tsvector('english', 'a fat cat sat on a mat'))", "4"),
    ("strip(to_tsvector('english', 'fat cats ate rats'))", "'ate' 'cat' 'fat' 'rat'"),
    ("to_tsvector('english', 'supernovae explode') @@ to_tsquery('english', 'supernova')", "t"),
    ("to_tsvector('english', 'a fat cat') @@ to_tsquery('english', 'cat & fat')", "t"),
    ("to_tsvector('english', 'a fat cat') @@ to_tsquery('english', 'cat & dog')", "f"),
    ("to_tsvector('english', 'a fat cat') @@ to_tsquery('english', 'cat | dog')", "t"),
    ("to_tsvector('english', 'a fat cat') @@ to_tsquery('english', '!dog')", "t"),
    ("to_tsvector('english', 'a fat cat') @@ to_tsquery('english', 'fat <-> cat')", "t"),
    ("to_tsvector('english', 'fat a cat') @@ to_tsquery('english', 'fat <-> cat')", "f"),
    ("to_tsvector('english', 'fat a cat') @@ to_tsquery('english', 'fat <2> cat')", "t"),
    ("to_tsvector('english', 'error logs found') @@ plainto_tsquery('english', 'errors log')", "t"),
    ("to_tsvector('english', 'error logs found') @@ phraseto_tsquery('english', 'error logs')", "t"),
    ("to_tsvector('english', 'logs error found') @@ phraseto_tsquery('english', 'error logs')", "f"),
    ("to_tsquery('english', 'fat & rats')", "'fat' & 'rat'"),
    ("to_tsquery('english', 'fat & (cats | dogs)')", "'fat' & ( 'cat' | 'dog' )"),
    ("to_tsquery('english', '!fat & rats')", "!'fat' & 'rat'"),
    ("to_tsquery('simple', 'Fat | Rats')", "'fat' | 'rats'"),
    ("to_tsquery('english', 'fat <-> cats')", "'fat' <-> 'cat'"),
    ("to_tsquery('english', 'the & fat')", "'fat'"),
    ("to_tsquery('english', 'fatties:*')", "'fatti':*"),
    ("plainto_tsquery('english', 'The Fat Rats')", "'fat' & 'rat'"),
    ("phraseto_tsquery('english', 'The Fat Rats')", "'fat' <-> 'rat'"),
    ("websearch_to_tsquery('english', 'fat rats')", "'fat' & 'rat'"),
    ("websearch_to_tsquery('english', '\"fat rats\" -dogs')", "'fat' <-> 'rat' & !'dog'"),
    ("websearch_to_tsquery('english', 'fat or rats')", "'fat' | 'rat'"),
    ("ts_rank(to_tsvector('english', 'a fat cat sat on a mat'), to_tsquery('english', 'cat'))", "0.06079271"),
    ("ts_rank(to_tsvector('english', 'a fat cat fat sat fat'), to_tsquery('english', 'fat'))", "0.082745634"),
    ("ts_rank_cd(to_tsvector('english', 'a fat cat sat on a mat'), to_tsquery('english', 'cat & mat'))", "0.025"),
    ("'fat:2,4 cat:3'::tsvector", "'cat':3 'fat':2,4"),
    ("'fat & rat'::tsquery", "'fat' & 'rat'"),
    ("'fat:2A cat:3B'::tsvector", "'cat':3B 'fat':2A"),
    ("numnode(to_tsquery('english', 'fat & rats'))", "3"),
    ("querytree(to_tsquery('english', '!fat & rats'))", "'rat'"),
    ("to_tsvector('english', 'The 15 quick-thinking foxes (v2.0) jumped high!')", "'15':2 'fox':6 'high':9 'jump':8 'quick':4 'quick-think':3 'think':5 'v2.0':7"),
    ("to_tsvector('english', 'aaa2bbb ccc33 44ddd')", "'44ddd':3 'aaa2bbb':1 'ccc33':2"),
    ("to_tsvector('english', 'hello world hello again hello')", "'hello':1,3,5 'world':2")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // empty results (empty input / all-stopword input)
    for (e <- Seq("to_tsvector('english', '')", "to_tsvector('english', 'The The The')", "plainto_tsquery('english', 'the')"))
      assert(one(e) === "", s"expr: $e")
  }

  test("sweep-15: to_char templates, array fns, intervals, aggregates (live pg 15)") {
    // 94 expressions swept whitespace-exact against live PostgreSQL
    // 15.18: to_char RN/EEEE/V/PL/MI/SG/TH padding, format(), the
    // array function family (5 wrong answers found and fixed:
    // array_position NULL-when-absent, NULL-removing array_remove,
    // leaf-counting cardinality, numeric generate_series, string_agg
    // NULL delimiter), justify_*, age, statistical aggregates,
    // WITHIN GROUP, FILTER combinations. Documented deviation (not
    // pinned): regr_intercept/regr_r2 differ in the last 1-2 ulps —
    // pg accumulates float8 aggregates with its own transition
    // ordering that a distributed partial-agg cannot reproduce
    // bit-exactly (same class as the stddev/variance note).
    val pinned: Seq[(String, String)] = Seq(
    ("to_char(485, 'RN')", "        CDLXXXV"),
    ("to_char(2026, 'RN')", "         MMXXVI"),
    ("to_char(3999, 'RN')", "      MMMCMXCIX"),
    ("to_char(123.45, '9.99EEEE')", " 1.23e+02"),
    ("to_char(0.0004859, '9.99EEEE')", " 4.86e-04"),
    ("to_char(-123.45, '9.99EEEE')", "-1.23e+02"),
    ("to_char(12.34, '99V99')", " 1234"),
    ("to_char(12.34, '9999V9')", "   123"),
    ("to_char(-12, '99PL')", "-12 "),
    ("to_char(12, 'SG99')", "+12"),
    ("to_char(-12, 'SG99')", "-12"),
    ("to_char(12, '99MI')", "12 "),
    ("to_char(-12, '99MI')", "12-"),
    ("to_char(412, '999TH')", " 412TH"),
    ("to_char(411, '999th')", " 411th"),
    ("to_char(-485.8, 'FM999.99')", "-485.8"),
    ("format('Hello %s, %s', 'World', 42)", "Hello World, 42"),
    ("format('%I.%I', 'tab le', 'col')", "\"tab le\".col"),
    ("format('%L and %L', 'it''s', NULL)", "'it''s' and NULL"),
    ("format('%-10s|', 'pad')", "pad       |"),
    ("format('%1$s %1$s', 'twice')", "twice twice"),
    ("array_position(ARRAY['a','b','c','b'], 'b')", "2"),
    ("array_positions(ARRAY['a','b','c','b'], 'b')", "{2,4}"),
    ("array_remove(ARRAY[1,2,3,2], 2)", "{1,3}"),
    ("array_remove(ARRAY[1,NULL,2], NULL)", "{1,2}"),
    ("array_replace(ARRAY[1,2,5,4], 5, 3)", "{1,2,3,4}"),
    ("cardinality(ARRAY[[1,2],[3,4]])", "4"),
    ("cardinality(ARRAY[]::int[])", "0"),
    ("array_length(ARRAY[1,2,3], 1)", "3"),
    ("array_lower(ARRAY[1,2,3], 1)", "1"),
    ("array_upper(ARRAY[1,2,3], 1)", "3"),
    ("array_cat(ARRAY[1,2], ARRAY[3,4])", "{1,2,3,4}"),
    ("ARRAY[1,2] < ARRAY[1,3]", "t"),
    ("ARRAY[1,2] < ARRAY[1,2,0]", "t"),
    ("ARRAY[1,2,3] = ARRAY[1,2,3]", "t"),
    ("justify_days(interval '35 days')", "1 mon 5 days"),
    ("justify_hours(interval '27 hours')", "1 day 03:00:00"),
    ("justify_interval(interval '1 mon -1 hour')", "29 days 23:00:00"),
    ("interval '1 day' * 3", "3 days"),
    ("interval '2 hours' / 2", "01:00:00"),
    ("age(timestamp '2026-01-01', timestamp '2024-06-15')", "1 year 6 mons 16 days"),
    ("age(date '2026-08-14', date '2026-08-01')", "13 days"),
    ("extract(epoch from interval '1 day 2 hours')", "93600.000000"),
    ("generate_series(1.0, 3.0, 0.5)", "1.0"),
    ("generate_series(5, 1, -2)", "5"),
    ("split_part('a,b,c', ',', -1)", "c"),
    ("overlay('Txxxxas' placing 'hom' from 2 for 4)", "Thomas"),
    ("translate('12345', '143', 'ax')", "a2x5"),
    ("quote_literal('it''s')", "'it''s'"),
    ("quote_nullable(NULL)", "NULL"),
    ("quote_nullable(42)", "'42'"),
    ("num_nonnulls(1, NULL, 'a')", "2"),
    ("num_nulls(1, NULL, 'a')", "1"),
    ("greatest(1, NULL, 3)", "3"),
    ("concat_ws(',', 'a', NULL, 'b')", "a,b"),
    ("string_agg(x, NULL ORDER BY x) FROM (VALUES ('a'),('b')) t(x)", "ab"),
    ("bit_and(x) FROM (VALUES (6),(3)) t(x)", "2"),
    ("bit_or(x) FROM (VALUES (4),(1)) t(x)", "5"),
    ("bit_xor(x) FROM (VALUES (7),(2)) t(x)", "5"),
    ("bool_and(x) FROM (VALUES (true),(false)) t(x)", "f"),
    ("every(x) FROM (VALUES (true),(true)) t(x)", "t"),
    ("count(*) FILTER (WHERE x > 1) FROM (VALUES (1),(2),(3)) t(x)", "2"),
    ("sum(DISTINCT x) FILTER (WHERE x > 0) FROM (VALUES (1),(1),(2),(-1)) t(x)", "3"),
    ("corr(y, x) FROM (VALUES (1,2),(2,4),(3,6)) t(x, y)", "1"),
    ("covar_samp(y, x) FROM (VALUES (1,2),(2,4),(3,7)) t(x, y)", "2.5"),
    ("regr_slope(y, x) FROM (VALUES (1,2),(2,4),(3,7)) t(x, y)", "2.5"),
    ("mode() WITHIN GROUP (ORDER BY x) FROM (VALUES (1),(2),(2),(3)) t(x)", "2"),
    ("percentile_cont(0.5) WITHIN GROUP (ORDER BY x) FROM (VALUES (1),(2),(3),(100)) t(x)", "2.5"),
    ("percentile_disc(0.5) WITHIN GROUP (ORDER BY x) FROM (VALUES (1),(2),(3),(100)) t(x)", "2"),
    ("percentile_cont(ARRAY[0.25, 0.75]) WITHIN GROUP (ORDER BY x) FROM (VALUES (1),(2),(3),(4)) t(x)", "{1.75,3.25}"),
    ("starts_with('alphabet', 'alph')", "t"),
    ("left('abc', 10)", "abc"),
    ("lpad('abc', 2)", "ab"),
    ("lpad('abc', 7, 'xy')", "xyxyabc"),
    ("reverse('abc')", "cba"),
    ("initcap('hi THOMAS x-1b')", "Hi Thomas X-1b"),
    ("ascii('x')", "120"),
    ("chr(120)", "x"),
    ("md5('abc')", "900150983cd24fb0d6963f7d28e17f72"),
    ("substr('alphabet', 0, 3)", "al"),
    ("strpos('high', 'ig')", "2"),
    ("position('ig' in 'high')", "2"),
    ("parse_ident('\"Some School\".teacher')", "{\"Some School\",teacher}"),
    ("btrim('xyxtrimyyx', 'xy')", "trim"),
    ("string_agg(x, NULL) FROM (VALUES ('a'),('b')) t(x)", "ab"),
    ("array_position(ARRAY[1,NULL,3], NULL)", "2"),
    ("array_positions(ARRAY[1,NULL,1], NULL)", "{2}"),
    ("cardinality(ARRAY[[[1,2],[3,4]],[[5,6],[7,8]]])", "8"),
    ("generate_series(3.0, 1.0, -1.0)", "3.0"),
    ("generate_series(1.25, 2.0, 0.25)", "1.25")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // psql -A -t can't distinguish NULL from '' — these are pinned to
    // pg's documented semantics (SQL NULL vs empty string)
    for (e <- Seq("array_position(ARRAY[1,2,3], 4)",
      "array_length(ARRAY[1,2,3], 2)", "least(NULL, NULL)"))
      assert(one(e) === "<NULL>", s"expr: $e")
    for (e <- Seq("split_part('a,b,c', ',', 5)", "repeat('ab', 0)", "repeat('ab', -1)"))
      assert(one(e) === "", s"expr: $e")
  }

  test("sweep-16: pg_trgm — trigram extraction and similarity family (live pg 15)") {
    // 26 expressions pinned against live pg 15 WITH `CREATE EXTENSION
    // pg_trgm`: show_trgm word-splitting/padding/sort/array-quoting,
    // set similarity, positional-extent word_similarity, and
    // word-boundary strict_word_similarity — all float4-exact
    val pinned: Seq[(String, String)] = Seq(
    ("show_trgm('cat')", "{\"  c\",\" ca\",\"at \",cat}"),
    ("show_trgm('Cat DOG')", "{\"  c\",\"  d\",\" ca\",\" do\",\"at \",cat,dog,\"og \"}"),
    ("show_trgm('a')", "{\"  a\",\" a \"}"),
    ("show_trgm('ab')", "{\"  a\",\" ab\",\"ab \"}"),
    ("show_trgm('')", "{}"),
    ("show_trgm('  spaced  out  ')", "{\"  o\",\"  s\",\" ou\",\" sp\",ace,ced,\"ed \",out,pac,spa,\"ut \"}"),
    ("show_trgm('word1 42x')", "{\"  4\",\"  w\",\" 42\",\" wo\",\"2x \",42x,\"d1 \",ord,rd1,wor}"),
    ("show_trgm('don''t')", "{\"  d\",\"  t\",\" do\",\" t \",don,\"on \"}"),
    ("show_trgm('foo-bar')", "{\"  b\",\"  f\",\" ba\",\" fo\",\"ar \",bar,foo,\"oo \"}"),
    ("similarity('cat', 'cat')", "1"),
    ("similarity('cat', 'dog')", "0"),
    ("similarity('word', 'two words')", "0.36363637"),
    ("similarity('', '')", "0"),
    ("similarity('abc', '')", "0"),
    ("similarity('GUMBO', 'gambol')", "0.18181819"),
    ("similarity('hello world', 'hello word')", "0.64285713"),
    ("word_similarity('word', 'two words')", "0.8"),
    ("word_similarity('words', 'two words')", "1"),
    ("word_similarity('apple', 'green apples')", "0.8333333"),
    ("strict_word_similarity('word', 'two words')", "0.5714286"),
    ("strict_word_similarity('apple', 'green apples')", "0.625"),
    ("show_limit()", "0.3"),
    ("similarity('transmission', 'transmitted')", "0.3888889"),
    ("similarity('database', 'data base')", "0.5833333"),
    ("word_similarity('', 'abc')", "0"),
    ("strict_word_similarity('', '')", "0")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-16b: ts utilities, tsquery operators, ts_headline (live pg 15)") {
    // 27 expressions pinned live: ts_delete (text + array forms),
    // weight-filtering ts_filter, tsvector_to_array/array_to_tsvector,
    // tsquery_phrase and the &&/||/!!/<-> tsquery operators, tsvector
    // || concatenation with position shifting, 3-arg setweight, and
    // ts_headline — whose fragment-selection behavior (right-extend to
    // MinWords breaking only at a long-enough word, left-extend only
    // on end-of-text shortfall, ShortWord skips, boundary punctuation
    // at doc edges, StartSel/StopSel options) was reconstructed from
    // these pins until 0 diffs
    val pinned: Seq[(String, String)] = Seq(
    ("ts_delete('fat:2,4 cat:3 rat:5A'::tsvector, 'fat')", "'cat':3 'rat':5A"),
    ("ts_delete('fat:2,4 cat:3 rat:5A'::tsvector, ARRAY['fat','rat'])", "'cat':3"),
    ("ts_filter('fat:2,4 cat:3b,7c rat:5A'::tsvector, '{a,b}')", "'cat':3B 'rat':5A"),
    ("tsvector_to_array('fat:2,4 cat:3 rat:5A'::tsvector)", "{cat,fat,rat}"),
    ("array_to_tsvector(ARRAY['fat','cat','rat'])", "'cat' 'fat' 'rat'"),
    ("array_to_tsvector(ARRAY['b','a','b'])", "'a' 'b'"),
    ("tsquery_phrase('fat'::tsquery, 'cat'::tsquery)", "'fat' <-> 'cat'"),
    ("tsquery_phrase('fat'::tsquery, 'cat'::tsquery, 10)", "'fat' <10> 'cat'"),
    ("'fat'::tsquery && 'rat'::tsquery", "'fat' & 'rat'"),
    ("'fat'::tsquery || 'rat'::tsquery", "'fat' | 'rat'"),
    ("!!'fat'::tsquery", "!'fat'"),
    ("'fat'::tsquery <-> 'rat'::tsquery", "'fat' <-> 'rat'"),
    ("'cat:3 fat:2,4'::tsvector || 'cat:4 dog:1'::tsvector", "'cat':3,8 'dog':5 'fat':2,4"),
    ("setweight('fat:2,4 cat:3'::tsvector, 'A', '{cat}')", "'cat':3A 'fat':2,4"),
    ("ts_headline('english', 'The quick brown fox jumps over the lazy dog', to_tsquery('english','fox'))", "The quick brown <b>fox</b> jumps over the lazy dog"),
    ("ts_headline('english', 'The quick brown fox jumps over the lazy dog', to_tsquery('english','fox & dog'))", "The quick brown <b>fox</b> jumps over the lazy <b>dog</b>"),
    ("ts_headline('simple', 'a b c d target e f', 'target'::tsquery)", "a b c d <b>target</b> e f"),
    ("ts_headline('english', 'The fox runs. The dog sleeps here quietly tonight.', to_tsquery('english','dog'), 'StartSel=<<, StopSel=>>')", "The fox runs. The <<dog>> sleeps here quietly tonight."),
    ("ts_headline('english', 'word one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty alpha beta gamma delta epsilon target zeta eta theta iota kappa one two three four five six seven eight nine ten eleven twelve', to_tsquery('english','target'))", "<b>target</b> zeta eta theta iota kappa one two three four five six seven eight nine"),
    ("ts_headline('simple', 'x y z', 'nomatch'::tsquery)", "x y z"),
    ("ts_headline('simple', 'first target here', 'target'::tsquery, 'MaxWords=4, MinWords=2')", "<b>target</b> here"),
    ("ts_headline('simple', 'punct, stays! (kept) target end.', 'target'::tsquery)", "punct, stays! (kept) <b>target</b> end."),
    ("ts_headline('english', 'The foxes were jumping', to_tsquery('english','fox & jump'))", "The <b>foxes</b> were <b>jumping</b>"),
    ("ts_headline('simple', 'aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt uu vv target ww xx', 'target'::tsquery)", "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt uu vv <b>target</b> ww xx"),
    ("ts_headline('simple', 'one of it in at to target by', 'target'::tsquery, 'MinWords=2, MaxWords=5')", "<b>target</b> by"),
    ("ts_headline('english', 'running dogs', to_tsquery('english','run:*'))", "<b>running</b> dogs"),
    ("ts_headline('simple', 'only tail words here target', 'target'::tsquery, 'MinWords=3, MaxWords=6')", "words here <b>target</b>")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-17: datetime/number template input-output edges (live pg 15)") {
    // 35 expressions pinned live: to_date/to_timestamp template INPUT
    // (day-of-year DDD, Julian J, compact digits, ISO week dates
    // IYYY-"W"IW-ID with quoted-literal consumption, 12-hour +
    // meridian, MS fractions), to_char IYYY/IW/Q/WW/DDD/J/SSSS and
    // interval templates, isoyear/isodow/week/quarter/julian
    // extraction, to_number G/D/S/L/PR forms, PR bracket rendering,
    // VARIADIC array expansion, decade/century/millennium truncation.
    // Accepted deviation (not pinned): a date-less to_timestamp
    // defaults to pg's 0001-01-01 BC — BC-era rendering crosses the
    // legacy julian-gregorian rebase and is out of scope.
    val pinned: Seq[(String, String)] = Seq(
    ("to_date('2024-03-07', 'YYYY-MM-DD')", "2024-03-07"),
    ("to_date('07/03/2024', 'DD/MM/YYYY')", "2024-03-07"),
    ("to_date('March 07, 2024', 'Month DD, YYYY')", "2024-03-07"),
    ("to_date('7 Mar 24', 'DD Mon YY')", "2024-03-07"),
    ("to_date('2024-066', 'YYYY-DDD')", "2024-03-06"),
    ("to_date('20240307', 'YYYYMMDD')", "2024-03-07"),
    ("to_timestamp('2024-03-07 14:30:45', 'YYYY-MM-DD HH24:MI:SS')", "2024-03-07 14:30:45+00"),
    ("to_timestamp('07.03.2024 02:30 PM', 'DD.MM.YYYY HH12:MI PM')", "2024-03-07 14:30:00+00"),
    ("to_timestamp('2024-03-07 14:30:45.123', 'YYYY-MM-DD HH24:MI:SS.MS')", "2024-03-07 14:30:45.123+00"),
    ("to_date('2024-W10-4', 'IYYY-\"W\"IW-ID')", "2024-03-07"),
    ("make_date(2024, 3, 7)", "2024-03-07"),
    ("make_timestamptz(2024, 3, 7, 14, 30, 45.5)", "2024-03-07 14:30:45.5+00"),
    ("to_char(date '2024-03-07', 'IYYY-IW-ID')", "2024-10-4"),
    ("to_char(date '2024-03-07', 'Q WW DDD')", "1 10 067"),
    ("to_char(date '2024-03-07', 'J')", "2460377"),
    ("to_char(timestamp '2024-03-07 14:30:45', 'SSSS')", "52245"),
    ("to_char(timestamp '2024-03-07 14:30:45', 'US of day FMDDDD')", "000000 +00 thursday  675"),
    ("to_char(interval '4 hours 3 minutes', 'HH24:MI')", "04:03"),
    ("to_char(interval '100 days 4 hours', 'DD HH24')", "100 04"),
    ("date_part('isoyear', date '2024-01-01')", "2024"),
    ("date_part('isodow', date '2024-03-10')", "7"),
    ("date_part('week', date '2024-01-01')", "1"),
    ("date_part('quarter', date '2024-03-07')", "1"),
    ("date_part('julian', date '2024-03-07')", "2460377"),
    ("to_number('12,454.8-', '99G999D9S')", "-12454.8"),
    ("to_number('$1,234.56', 'L9G999D99')", "1234.56"),
    ("to_number('<564>', '999PR')", "-564"),
    ("to_char(-485, '999PR')", "<485>"),
    ("to_char(485, '999PR')", " 485 "),
    ("num_nonnulls(VARIADIC ARRAY[1,2,NULL])", "2"),
    ("date_trunc('decade', date '2024-03-07')", "2020-01-01 00:00:00+00"),
    ("date_trunc('century', date '2024-03-07')", "2001-01-01 00:00:00+00"),
    ("date_trunc('millennium', date '2024-03-07')", "2001-01-01 00:00:00+00"),
    ("date_trunc('quarter', timestamp '2024-05-07 10:00:00')", "2024-04-01 00:00:00")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // make_date range validation errors (Spark words it "invalid
    // date" where pg says "out of range" — both reject)
    val mdErr = intercept[Exception](one("make_date(2024, 2, 30)"))
      .getMessage.toLowerCase
    assert(mdErr.contains("out of range") || mdErr.contains("invalid date"))
  }

  test("sweep-17b: phraseto stopword-gap distances (live pg 15)") {
    // pg preserves dropped-stopword POSITIONS in phrase queries:
    // 'the fat in a rat' → 'fat' <3> 'rat' (fat@2, rat@5) — and the
    // match semantics follow ('error of the log' matches its own
    // phrase, 'error bad log' does not)
    val pinned: Seq[(String, String)] = Seq(
    ("phraseto_tsquery('english', 'the fat in a rat')", "'fat' <3> 'rat'"),
    ("phraseto_tsquery('english', 'fat of the land')", "'fat' <3> 'land'"),
    ("websearch_to_tsquery('english', '\"sad cat or fat rat\"')", "'sad' <-> 'cat' <2> 'fat' <-> 'rat'"),
    ("to_tsvector('english','error of the log') @@ phraseto_tsquery('english', 'error of the log')", "t"),
    ("to_tsvector('english','error bad log') @@ phraseto_tsquery('english', 'error of the log')", "f"),
    ("phraseto_tsquery('english', 'the cat')", "'cat'"),
    ("phraseto_tsquery('english', 'cat the')", "'cat'"),
    ("phraseto_tsquery('english', 'The Fat Rats')", "'fat' <-> 'rat'"),
    ("websearch_to_tsquery('english', '\"fat rats\" -dogs')", "'fat' <-> 'rat' & !'dog'")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-18: inet/cidr network types (live pg 15)") {
    // 42 expressions pinned live BEFORE implementation (0 diffs on
    // the second run; the only iteration was prefix-~ dispatch):
    // v4/v6 parsing, RFC 5952 rendering with /32 and /128 display
    // suppression, cidr host-bit validation, host/masklen/network/
    // broadcast/netmask/hostmask/family/abbrev/text/set_masklen/
    // inet_merge, the << <<= >> >>= && operators, +/- arithmetic
    // (incl. v6), ~ & | bitwise ops, and network_cmp ordering
    val pinned: Seq[(String, String)] = Seq(
    ("'192.168.1.5'::inet", "192.168.1.5"),
    ("'192.168.1.5/24'::inet", "192.168.1.5/24"),
    ("'192.168.1.0/24'::cidr", "192.168.1.0/24"),
    ("'10.1.2.3/8'::inet", "10.1.2.3/8"),
    ("'::1'::inet", "::1"),
    ("'2001:db8::8a2e:370:7334'::inet", "2001:db8::8a2e:370:7334"),
    ("'2001:db8::/32'::cidr", "2001:db8::/32"),
    ("host('192.168.1.5/24'::inet)", "192.168.1.5"),
    ("masklen('192.168.1.5/24'::inet)", "24"),
    ("network('192.168.1.5/24'::inet)", "192.168.1.0/24"),
    ("broadcast('192.168.1.5/24'::inet)", "192.168.1.255/24"),
    ("netmask('192.168.1.5/24'::inet)", "255.255.255.0"),
    ("hostmask('192.168.23.20/30'::inet)", "0.0.0.3"),
    ("family('192.168.1.5'::inet)", "4"),
    ("family('::1'::inet)", "6"),
    ("abbrev('10.1.0.0/16'::cidr)", "10.1/16"),
    ("abbrev('10.1.0.0/16'::inet)", "10.1.0.0/16"),
    ("text('192.168.1.5'::inet)", "192.168.1.5/32"),
    ("set_masklen('192.168.1.5/24'::inet, 16)", "192.168.1.5/16"),
    ("set_masklen('192.168.1.0/24'::cidr, 16)", "192.168.0.0/16"),
    ("inet_same_family('192.168.1.5'::inet, '::1'::inet)", "f"),
    ("inet_merge('192.168.1.5/24'::inet, '192.168.2.5/24'::inet)", "192.168.0.0/22"),
    ("'192.168.1.5'::inet + 25", "192.168.1.30"),
    ("'192.168.1.5'::inet - 5", "192.168.1.0"),
    ("'192.168.2.10'::inet - '192.168.2.3'::inet", "7"),
    ("'10.1.0.10'::inet << '10.1.0.0/16'::cidr", "t"),
    ("'10.1.0.10/16'::inet << '10.1.0.0/16'::cidr", "f"),
    ("'10.1.0.10/16'::inet <<= '10.1.0.0/16'::cidr", "t"),
    ("'10.1.0.0/16'::cidr >> '10.1.0.10'::inet", "t"),
    ("'10.1.0.0/16'::cidr >>= '10.1.0.0/16'::cidr", "t"),
    ("'10.1.0.0/16'::cidr && '10.1.5.0/24'::cidr", "t"),
    ("'10.1.0.0/16'::cidr && '10.2.0.0/24'::cidr", "f"),
    ("~'192.168.1.5'::inet", "63.87.254.250"),
    ("'192.168.1.5'::inet & '255.255.0.0'::inet", "192.168.0.0"),
    ("'192.168.1.5'::inet | '0.0.0.255'::inet", "192.168.1.255"),
    ("'192.168.1.5'::inet < '192.168.1.6'::inet", "t"),
    ("'192.168.1.5/24'::inet = '192.168.1.5/24'::inet", "t"),
    ("'192.168.1.5/24'::inet < '192.168.1.5/25'::inet", "t"),
    ("'2001:db8::1'::inet + 5", "2001:db8::6")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // invalid inputs error with pg's wording
    assert(intercept[Exception](one("'192.168.1.5/24'::cidr"))
      .getMessage.contains("invalid cidr value"))
    assert(intercept[Exception](one("'192.168.1.5/33'::inet"))
      .getMessage.contains("invalid input syntax for type inet"))
    assert(intercept[Exception](one("'256.1.1.1'::inet"))
      .getMessage.contains("invalid input syntax for type inet"))
  }

  test("sweep-18b: macaddr/macaddr8 (live pg 15)") {
    // all six input spellings canonicalize (colon/dash pairs, 3-hex
    // groups, dotted quads, bare hex, case folding), trunc zeroes the
    // NIC bytes, ~ & | operate bytewise, macaddr8 expands 6-byte
    // input with the EUI-64 ff:fe midsection, set7bit flips the
    // local-admin bit — 17 live pins, 0 diffs on the first run
    val pinned: Seq[(String, String)] = Seq(
    ("'08:00:2b:01:02:03'::macaddr", "08:00:2b:01:02:03"),
    ("'08-00-2b-01-02-03'::macaddr", "08:00:2b:01:02:03"),
    ("'08002b:010203'::macaddr", "08:00:2b:01:02:03"),
    ("'08002b-010203'::macaddr", "08:00:2b:01:02:03"),
    ("'0800.2b01.0203'::macaddr", "08:00:2b:01:02:03"),
    ("'0800-2b01-0203'::macaddr", "08:00:2b:01:02:03"),
    ("'08002b010203'::macaddr", "08:00:2b:01:02:03"),
    ("'08:00:2B:01:02:03'::macaddr", "08:00:2b:01:02:03"),
    ("trunc('12:34:56:78:90:ab'::macaddr)", "12:34:56:00:00:00"),
    ("~'12:34:56:78:90:ab'::macaddr", "ed:cb:a9:87:6f:54"),
    ("'12:34:56:78:90:ab'::macaddr & '08:00:2b:01:02:03'::macaddr", "00:00:02:00:00:03"),
    ("'12:34:56:78:90:ab'::macaddr | '08:00:2b:01:02:03'::macaddr", "1a:34:7f:79:92:ab"),
    ("'12:34:56:78:90:ab'::macaddr < '12:34:56:78:90:ac'::macaddr", "t"),
    ("'12:34:56:78:90:ab'::macaddr = '12:34:56:78:90:AB'::macaddr", "t"),
    ("'08:00:2b:01:02:03:04:05'::macaddr8", "08:00:2b:01:02:03:04:05"),
    ("macaddr8_set7bit('00:34:56:ab:cd:ef'::macaddr8)", "02:34:56:ff:fe:ab:cd:ef"),
    ("'12:34:56:78:90:ab'::macaddr8", "12:34:56:ff:fe:78:90:ab")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    assert(intercept[Exception](one("'08:00:2b:01:02'::macaddr"))
      .getMessage.contains("invalid input syntax for type macaddr"))
  }

  test("sweep-19: bit strings — literals, bitwise ops, casts (live pg 15)") {
    // B'…' and (cast-adjacent) X'…' literals, & | # with pg's
    // equal-length enforcement, ~ << >>, int↔bit(n) conversions
    // (low-bits MSB-first; pattern-text string casts), right-side
    // truncate/zero-extend for bit(n), bit_count/get_bit/set_bit/
    // octet_length dispatch against the bytea twins, and the free
    // string-op surface (||, position, substring, overlay, length) —
    // 24 live pins, 0 diffs
    val pinned: Seq[(String, String)] = Seq(
    ("B'1010'", "1010"),
    ("B'1010' & B'0110'", "0010"),
    ("B'1010' | B'0110'", "1110"),
    ("B'1010' # B'0110'", "1100"),
    ("~B'1010'", "0101"),
    ("B'1010' << 1", "0100"),
    ("B'1010' >> 2", "0010"),
    ("B'1010' || B'01'", "101001"),
    ("bit_length(B'1010')", "4"),
    ("length(B'1010')", "4"),
    ("octet_length(B'10101010')", "1"),
    ("position(B'10' in B'001011')", "3"),
    ("get_bit(B'1010', 1)", "0"),
    ("set_bit(B'1010', 1, 1)", "1110"),
    ("overlay(B'10000000' placing B'111' from 2)", "11110000"),
    ("substring(B'110010' from 2 for 3)", "100"),
    ("B'1010'::bit(6)", "101000"),
    ("B'101011'::bit(4)", "1010"),
    ("'1010'::bit(4)", "1010"),
    ("B'1010' = B'1010'", "t"),
    ("B'1010' < B'1011'", "t"),
    ("42::bit(8)", "00101010"),
    ("B'00101010'::int", "42"),
    ("bit_count(B'1010')", "2"),
    ("X'1F'::bit(8)", "00011111")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-19b: ts_headline MaxFragments mode (live pg 15)") {
    // fragment-per-cover selection reconstructed from live pins to 0
    // diffs: half-excess left / remainder right extension, short
    // leading words traded for right extension, short trailing words
    // trimmed, edge-clipped budget lost, FragmentDelimiter honored
    val pinned: Seq[(String, String)] = Seq(
    ("ts_headline('simple', 'one two target three four five six seven eight nine ten eleven twelve goal thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty twentyone twentytwo target twentythree', 'target'::tsquery, 'MaxFragments=2, MinWords=2, MaxWords=4')", "<b>target</b> three four five ... twentytwo <b>target</b> twentythree"),
    ("ts_headline('simple', 'one two target three four five six seven eight nine ten eleven twelve goal thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty twentyone twentytwo target twentythree', 'target | goal'::tsquery, 'MaxFragments=2, MinWords=2, MaxWords=4')", "<b>target</b> three four five ... twelve <b>goal</b> thirteen fourteen"),
    ("ts_headline('simple', 'one two target three four five six seven eight nine ten eleven twelve goal thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty twentyone twentytwo target twentythree', 'target | goal'::tsquery, 'MaxFragments=3, MinWords=1, MaxWords=3')", "<b>target</b> three four ... twelve <b>goal</b> thirteen ... twentytwo <b>target</b> twentythree"),
    ("ts_headline('simple', 'a b target c d', 'target'::tsquery, 'MaxFragments=1, MinWords=2, MaxWords=3')", "<b>target</b>"),
    ("ts_headline('simple', 'no match here at all', 'target'::tsquery, 'MaxFragments=2, MinWords=2, MaxWords=4')", "no match"),
    ("ts_headline('simple', 'one two target three four five six seven eight nine ten eleven twelve goal thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty twentyone twentytwo target twentythree', 'target'::tsquery, 'MaxFragments=2, MinWords=2, MaxWords=4, FragmentDelimiter=\" | \"')", "<b>target</b> three four five | twentytwo <b>target</b> twentythree")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-20: XML — construction, validation, xpath (live pg 15)") {
    // the last declared-out-of-scope family: xmlelement with the
    // name-keyword syntax and xmlattributes (type-directed raw-vs-
    // escape embedding resolved syntactically), xmlforest/xmlconcat/
    // xmlcomment/xmlpi/xmlroot/xmlserialize/xmlagg, ::xml content
    // validation, well-formed checks, IS DOCUMENT, and xpath()/
    // xpath_exists() over the JDK DOM+XPath (DTDs and external
    // entities disabled) — 29 live pins, 0 diffs
    val pinned: Seq[(String, String)] = Seq(
    ("xmlelement(name foo)", "<foo/>"),
    ("xmlelement(name foo, 'content')", "<foo>content</foo>"),
    ("xmlelement(name foo, xmlattributes('bar' as attr), 'text')", "<foo attr=\"bar\">text</foo>"),
    ("xmlelement(name foo, xmlattributes(42 as a, 'x<y' as b))", "<foo a=\"42\" b=\"x&lt;y\"/>"),
    ("xmlelement(name root, xmlelement(name child, 1), xmlelement(name child, 2))", "<root><child>1</child><child>2</child></root>"),
    ("xmlforest('abc' AS foo, 123 AS bar)", "<foo>abc</foo><bar>123</bar>"),
    ("xmlconcat('<a/>'::xml, '<b>x</b>'::xml)", "<a/><b>x</b>"),
    ("xmlcomment('hello')", "<!--hello-->"),
    ("xmlpi(name php, 'echo $x;')", "<?php echo $x;?>"),
    ("xmlroot('<a/>'::xml, version '1.0')", "<a/>"),
    ("'<a>text</a>'::xml", "<a>text</a>"),
    ("'<a><b>1</b></a>'::xml", "<a><b>1</b></a>"),
    ("'not xml'::xml", "not xml"),
    ("xmlserialize(content '<a>x</a>'::xml AS text)", "<a>x</a>"),
    ("xml_is_well_formed('<a/>')", "t"),
    ("xml_is_well_formed('<a>')", "f"),
    ("xml_is_well_formed_content('plain text')", "t"),
    ("xml_is_well_formed_document('<a/>')", "t"),
    ("xmlelement(name foo, 'a & b < c')", "<foo>a &amp; b &lt; c</foo>"),
    ("(xpath('/a/b/text()', '<a><b>one</b><b>two</b></a>'::xml))[1]", "one"),
    ("xpath('/a/b/text()', '<a><b>one</b><b>two</b></a>'::xml)", "{one,two}"),
    ("xpath('//b', '<a><b>1</b><c><b>2</b></c></a>'::xml)", "{<b>1</b>,<b>2</b>}"),
    ("xpath('/a/@id', '<a id=\"7\"/>'::xml)", "{7}"),
    ("xpath('count(//b)', '<a><b/><b/></a>'::xml)", "{2}"),
    ("xpath_exists('/a/b', '<a><b/></a>'::xml)", "t"),
    ("xpath_exists('/a/c', '<a><b/></a>'::xml)", "f"),
    ("'<a>x</a>'::xml IS DOCUMENT", "t"),
    ("'plain'::xml IS DOCUMENT", "f"),
    ("xmlagg(x::xml) FROM (VALUES ('<a/>'), ('<b/>')) t(x)", "<a/><b/>")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    assert(intercept[Exception](one("xmlcomment('hello--ish')"))
      .getMessage.contains("invalid XML comment"))
    assert(intercept[Exception](one("'<unclosed>'::xml"))
      .getMessage.contains("invalid XML content"))
  }

  test("sweep-21: money type (live pg 15, lc_monetary C)") {
    // $-and-comma rendering with half-up cent rounding, money±money,
    // money times/over numeric, money/money as a float8 ratio, the
    // ::numeric escape, and ordering — 17 live pins, 0 diffs
    val pinned: Seq[(String, String)] = Seq(
    ("'12.34'::money", "$12.34"),
    ("'$1,234.56'::money", "$1,234.56"),
    ("1234.567::numeric::money", "$1,234.57"),
    ("'-12.34'::money", "-$12.34"),
    ("'0'::money", "$0.00"),
    ("'12.344'::money", "$12.34"),
    ("'12.345'::money", "$12.35"),
    ("'1000000'::money", "$1,000,000.00"),
    ("'12.34'::money + '1.66'::money", "$14.00"),
    ("'12.34'::money - '1.34'::money", "$11.00"),
    ("'12.34'::money * 2", "$24.68"),
    ("'12.34'::money / 2", "$6.17"),
    ("'12.34'::money * 1.5", "$18.51"),
    ("'100'::money / '25'::money", "4"),
    ("'12.34'::money::numeric", "12.34"),
    ("'12.34'::money = '12.34'::money", "t"),
    ("'12.34'::money < '12.35'::money", "t")
    )
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-22: enum declared-order semantics (live pg 15)") {
    // pg §8.7.2: enum values sort by label position, not lexically.
    // All expected values captured from a scratch pg 15 cluster with
    // CREATE TYPE mood AS ENUM ('sad','ok','happy').
    graft.pgwire.PgFunctions.registerAll(spark)
    graft.functions.PgEnums.drop(spark, "mood")
    graft.functions.PgEnums.create(spark, "mood", Seq("sad", "ok", "happy"))
    val pinned: Seq[(String, String)] = Seq(
      ("(SELECT string_agg(m, ',' ORDER BY m::mood) " +
        "FROM (VALUES ('happy'),('sad'),('ok')) t(m))", "sad,ok,happy"),
      ("(SELECT min(m::mood) FROM (VALUES ('happy'),('sad'),('ok')) t(m))", "sad"),
      ("(SELECT max(m::mood) FROM (VALUES ('happy'),('sad'),('ok')) t(m))", "happy"),
      ("'sad'::mood < 'happy'", "t"),
      ("'ok'::mood >= 'happy'", "f"),
      ("'ok' <= 'ok'::mood", "t"),
      ("greatest('sad'::mood, 'happy'::mood)", "happy"),
      ("least('ok'::mood, 'sad'::mood, 'happy'::mood)", "sad"),
      // order-independent comparisons stay on the label text
      ("'ok'::mood = 'ok'", "t"),
      ("'ok'::mood <> 'sad'", "t"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // ORDER BY over rows follows declared order
    val df = graft.pgwire.Handlers.runSql(spark,
      "SELECT m FROM (VALUES ('happy'),('sad'),('ok')) t(m) ORDER BY m::mood")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("sad", "ok", "happy"))
    graft.functions.PgEnums.drop(spark, "mood")
  }

  test("sweep-23: pg_trgm operator spellings (live pg 15, pg_trgm loaded)") {
    // 30 expressions pinned against a scratch pg 15 with CREATE
    // EXTENSION pg_trgm — zero-diff on first run. `%`/`<%`/`%>`/
    // `<<%`/`%>>` are the threshold booleans at the extension-default
    // limits (0.3/0.6/0.5); `<->`/`<<->`/`<->>` are float4 distances.
    // `5 % 2` stays modulo (pg resolves the numeric overload), and a
    // string-function operand (lower) or ::text cast also dispatches.
    val pinned: Seq[(String, String)] = Seq(
      ("'word' % 'word'", "t"),
      ("'word' % 'words'", "t"),
      ("'hello' % 'helo'", "t"),
      ("'abc' % 'xyz'", "f"),
      ("'listen' % 'silent'", "f"),
      ("'postgres' % 'postgre'", "t"),
      ("'the quick brown fox' % 'quick fox'", "t"),
      ("'word' <-> 'words'", "0.4285714"),
      ("'hello' <-> 'helo'", "0.4285714"),
      ("'abc' <-> 'xyz'", "1"),
      ("'same' <-> 'same'", "0"),
      ("'word' <% 'two words here'", "t"),
      ("'words' <% 'two words here'", "t"),
      ("'zzz' <% 'two words here'", "f"),
      ("'two words here' %> 'word'", "t"),
      ("'two words here' %> 'zzz'", "f"),
      ("'word' <<% 'two words here'", "t"),
      ("'zzz' <<% 'two words here'", "f"),
      ("'two words here' %>> 'word'", "t"),
      ("'word' <<-> 'two words here'", "0.19999999"),
      ("'two words here' <->> 'word'", "0.19999999"),
      ("lower('WORD') % 'word'", "t"),
      ("'word'::text <-> 'woird'", "0.625"),
      ("5 % 2", "1"),
      ("7 % 3", "1"),
      ("'QUICK Fox' % 'quick fox'", "t"),
      ("'a' <-> 'b'", "1"),
      ("'' % 'word'", "f"),
      ("'' <-> ''", "1"),
      ("'x' % 'x'", "t"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("trim_scale: variable-scale numeric rendering (live pg 15)") {
    // pg 13 trim_scale drops trailing fractional zeros; the result is
    // a variable-scale numeric, which Spark's fixed-scale decimals
    // can't carry — the engine renders the trimmed text form tagged
    // pg.oid_alias=numeric. All outputs captured live.
    val pinned: Seq[(String, String)] = Seq(
      ("trim_scale(8.4100)", "8.41"),
      ("trim_scale(8.0000)", "8"),
      ("trim_scale(-0.0500)", "-0.05"),
      ("trim_scale(30.00)", "30"),
      ("trim_scale(0.000)", "0"),
      ("trim_scale(123)", "123"),
      ("trim_scale(1.5e2::numeric)", "150"),
      ("trim_scale('120'::numeric)", "120"),
      ("trim_scale(NULL::numeric)", "<NULL>"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // wire OID: numeric (1700), not text
    val df = graft.pgwire.Handlers.runSql(spark, "SELECT trim_scale(8.4100) AS t")
    assert(graft.pgwire.PgType.oidOf(df.schema.fields(0)) === 1700)
  }

  test("sweep-24: ts_rank weights-array overloads + normalization laws (live pg 15)") {
    // 24 vectors, 0 diffs on first run. Two findings this sweep fixed:
    // norm flag 1 divides by log(len+1) — BASE 2 for ts_rank, NATURAL
    // log for ts_rank_cd — and flag 16 by log2(uniq+1) for both; the
    // previous 1+ln(n) reading only agreed at n=1 (what the original
    // pins used). Weights arrays: {D,C,B,A} order, <4 elements →
    // 2202E, any weight outside [0,1] → 22023 (tsrank.c getWeights).
    val pinned: Seq[(String, String)] = Seq(
      ("ts_rank('{0.1,0.2,0.4,1.0}', 'cat:1 dog:5', 'cat'::tsquery)", "0.06079271"),
      ("ts_rank('{1.0,1.0,1.0,1.0}', 'cat:1 dog:5', 'cat'::tsquery)", "0.6079271"),
      ("ts_rank('{0.5,0.5,0.5,0.5}', 'cat:1A dog:5B', 'cat & dog'::tsquery)", "0.47621495"),
      ("ts_rank('{0.1,0.2,0.4,1.0}', 'cat:1A dog:5B', 'cat & dog'::tsquery)", "0.60236955"),
      ("ts_rank('{0.1,0.2,0.4,1.0}', 'cat:1 dog:5', 'cat'::tsquery, 1)", "0.03835593"),
      ("ts_rank_cd('{0.1,0.2,0.4,1.0}', 'cat:1 dog:5', 'cat & dog'::tsquery)", "0.025"),
      ("ts_rank_cd('{1.0,1.0,1.0,1.0}', 'cat:1 dog:5', 'cat & dog'::tsquery)", "0.25"),
      ("ts_rank(ARRAY[0.1,0.2,0.4,1.0], 'cat:2B', 'cat'::tsquery)", "0.24317084"),
      ("ts_rank('cat:1', 'cat'::tsquery, 1)", "0.06079271"),
      ("ts_rank('cat:1 dog:2', 'cat'::tsquery, 1)", "0.03835593"),
      ("ts_rank('cat:1 dog:2 fish:3', 'cat'::tsquery, 1)", "0.030396355"),
      ("ts_rank('cat:1 dog:2 fish:3 cow:4', 'cat'::tsquery, 1)", "0.026181996"),
      ("ts_rank('cat:1,2 dog:3', 'cat'::tsquery, 1)", "0.037995443"),
      ("ts_rank('cat:1 dog:2 fish:3', 'cat'::tsquery, 16)", "0.030396355"),
      ("ts_rank('cat:1 dog:2 fish:3 cow:4 pig:5 hen:6 fox:7', 'cat'::tsquery, 16)", "0.020264236"),
      ("ts_rank('cat:1 dog:2 fish:3', 'cat'::tsquery, 3)", "0.010132118"),
      ("ts_rank_cd('cat:1 dog:2', 'cat & dog'::tsquery, 1)", "0.09102392"),
      ("ts_rank_cd('cat:1 dog:2 fish:3', 'cat & dog'::tsquery, 1)", "0.072134756"),
      ("ts_rank_cd('cat:1 dog:2 fish:3', 'cat & dog'::tsquery, 16)", "0.05"),
      ("ts_rank_cd('cat:1 dog:2 fish:3', 'cat & dog'::tsquery, 8)", "0.033333335"),
      ("ts_rank_cd('cat:1 dog:2 fish:3', 'cat & dog'::tsquery, 17)", "0.036067378"),
      ("ts_rank('cat:1 dog:2', 'cat'::tsquery, 32)", "0.057308756"),
      ("ts_rank('cat:1 dog:2', 'cat'::tsquery, 2)", "0.030396355"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // error paths match pg's SQLSTATEs
    def errOf(expr: String): String = {
      val e: Throwable = intercept[Exception] {
        graft.pgwire.Handlers.runSql(spark, s"SELECT $expr").collect()
      }
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .collectFirst { case p: graft.pgwire.PgException => p.code }
        .getOrElse("?")
    }
    assert(errOf("ts_rank('{0.1,0.2}', 'cat:1', 'cat'::tsquery)") === "2202E")
    assert(errOf("ts_rank('{0.2,0.4,0.8,2.0}', 'cat:1', 'cat'::tsquery)") === "22023")
  }

  test("sweep-25: GROUPS frames and frame EXCLUDE (live pg 15)") {
    // 32 vectors, 0 diffs after two fixes (composite RANGE token
    // hiding the frame from the EXCLUDE pass; rank-like functions
    // need the whole frame dropped, not just the EXCLUDE clause).
    // Fixture peer groups by o: {1},{2,2},{3,3,3},{5}; x NULL on id 5.
    def wf(inner: String): String =
      s"(SELECT string_agg(coalesce(s::text,'N'), ',' ORDER BY id) FROM " +
      s"(SELECT id, $inner AS s FROM (VALUES (1,1,1,10),(2,1,2,20),(3,1,2,30)," +
      s"(4,1,3,40),(5,1,3,NULL::int),(6,2,3,60),(7,2,5,70)) v(id,p,o,x)) q)"
    val pinned: Seq[(String, String)] = Seq(
      // GROUPS with UNBOUNDED/CURRENT bounds — RANGE keyword mapping
      ("sum(x) OVER (ORDER BY o GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
       "10,60,60,160,160,160,230"),
      ("sum(x) OVER (ORDER BY o GROUPS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)",
       "230,220,220,170,170,170,70"),
      ("count(*) OVER (ORDER BY o GROUPS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
       "7,7,7,7,7,7,7"),
      ("sum(x) OVER (PARTITION BY p ORDER BY o GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
       "10,60,60,100,100,60,130"),
      // GROUPS integer offsets — dense_rank subquery restructure
      ("sum(x) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
       "60,160,160,220,220,220,170"),
      ("count(*) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW)",
       "1,3,3,5,5,5,4"),
      ("sum(x) OVER (ORDER BY o GROUPS 2 PRECEDING)",
       "10,60,60,160,160,160,220"),
      ("sum(x) OVER (ORDER BY o GROUPS BETWEEN CURRENT ROW AND 1 FOLLOWING)",
       "60,150,150,170,170,170,70"),
      ("sum(x) OVER (PARTITION BY p ORDER BY o GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW)",
       "10,60,60,90,90,60,130"),
      ("sum(x) OVER (ORDER BY o DESC GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW)",
       "60,150,150,170,170,170,70"),
      ("min(x) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING)",
       "10,10,10,20,20,20,40"),
      // EXCLUDE over RANGE frames — arithmetic decomposition
      ("sum(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)",
       "N,40,30,120,160,100,160"),
      ("sum(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)",
       "N,10,10,60,60,60,160"),
      ("sum(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES)",
       "10,30,40,100,60,120,230"),
      ("sum(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE NO OTHERS)",
       "10,60,60,160,160,160,230"),
      ("count(*) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)",
       "0,1,1,3,3,3,6"),
      ("count(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES)",
       "1,2,2,4,3,4,6"),
      ("count(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)",
       "0,2,2,4,5,4,5"),
      ("avg(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)",
       "N,20.0000000000000000,15.0000000000000000,30.0000000000000000,32.0000000000000000,25.0000000000000000,32.0000000000000000"),
      ("avg(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)",
       "N,10.0000000000000000,10.0000000000000000,20.0000000000000000,20.0000000000000000,20.0000000000000000,32.0000000000000000"),
      ("sum(x) OVER (PARTITION BY p ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)",
       "N,10,10,60,60,N,60"),
      ("sum(x) OVER (ORDER BY o RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP)",
       "50,110,110,50,50,50,N"),
      ("sum(x) OVER (ORDER BY o RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)",
       "60,130,140,90,50,110,70"),
      // EXCLUDE over ROWS frames (CURRENT ROW any; GROUP/TIES UP..UF)
      ("sum(x) OVER (ORDER BY o ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)",
       "20,40,60,30,100,70,60"),
      ("sum(x) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW)",
       "220,210,200,190,230,170,160"),
      ("sum(x) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP)",
       "220,180,180,130,130,130,160"),
      ("sum(x) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES)",
       "230,200,210,170,130,190,230"),
      ("count(id) OVER (ORDER BY o ROWS BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)",
       "0,1,2,2,2,2,2"),
      // GROUPS offsets + EXCLUDE composed (restructure then decompose)
      ("sum(x) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE GROUP)",
       "N,10,10,50,50,50,100"),
      ("sum(x) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)",
       "60,130,140,160,120,180,170"),
      // ranking functions: pg ignores the frame — EXCLUDE is a no-op
      ("row_number() OVER (ORDER BY o, id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)",
       "1,2,3,4,5,6,7"),
      ("rank() OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES)",
       "1,2,2,4,4,4,7"))
    for ((inner, want) <- pinned)
      assert(one(wf(inner)) === want, s"expr: $inner")
    // unsupported shapes raise 0A000 rather than returning wrong rows
    def errOf(expr: String): String = {
      val e: Throwable = intercept[Exception] {
        graft.pgwire.Handlers.runSql(spark, s"SELECT ${wf(expr)}").collect()
      }
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .collectFirst { case p: graft.pgwire.PgException => p.code }
        .getOrElse("?")
    }
    // r16: min/max EXCLUDE GROUP now splits in group space (sweep-25c)
    // — live value replaces the old 0A000 pin
    assert(one(wf("min(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)"))
      === "N,10,10,10,10,10,10")
    assert(errOf("sum(x) OVER (ORDER BY o ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP)") === "0A000")
    assert(errOf("sum(x) OVER (ORDER BY o ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES)") === "0A000")
  }
  test("sweep-25b: min/max with frame EXCLUDE CURRENT ROW (live pg 15)") {
    // min/max are not subtractable, so EXCLUDE CURRENT ROW over a
    // ROWS frame splits into the two complementary pieces composed
    // with least()/greatest() (NULL-skipping matches min over an
    // empty piece). Also pins pg's no-op semantics when the frame
    // provably cannot contain the current row. 8 ad-hoc vectors +
    // these 6 fixture vectors, all live-exact.
    def wf(inner: String): String =
      s"(SELECT string_agg(coalesce(s::text,'N'), ',' ORDER BY id) FROM " +
      s"(SELECT id, $inner AS s FROM (VALUES (1,1,1,10),(2,1,2,20),(3,1,2,30)," +
      s"(4,1,3,40),(5,1,3,NULL::int),(6,2,3,60),(7,2,5,70)) v(id,p,o,x)) q)"
    val pinned: Seq[(String, String)] = Seq(
      ("min(x) OVER (ORDER BY id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW)",
       "20,10,10,20,30,40,60"),
      ("max(x) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)",
       "20,30,40,30,60,70,60"),
      ("min(x) OVER (PARTITION BY p ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)",
       "N,10,10,10,10,N,60"),
      ("max(x) OVER (ORDER BY id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW)",
       "70,70,70,70,70,70,N"),
      // frame collapses to just the excluded row: empty, typed NULL
      ("min(x) OVER (ORDER BY id ROWS BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW)",
       "N,N,N,N,N,N,N"),
      // frame cannot contain the current row: EXCLUDE is pg's no-op
      ("max(x) OVER (ORDER BY id ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING EXCLUDE CURRENT ROW)",
       "N,10,20,30,40,40,60"))
    for ((expr, want) <- pinned)
      assert(one(wf(expr)) === want, s"expr: $expr")
  }

  test("sweep-25c: min/max with EXCLUDE GROUP/TIES split in group space (live pg 15, r16)") {
    // the r15 honest 0A000 gap, closed: min/max cannot subtract the
    // excluded peer group, so the window restructures through the
    // dense_rank group-number subquery (the GROUPS-offset machinery)
    // and the frame SPLITS at ±1 group, composed with
    // least()/greatest(); EXCLUDE TIES re-includes the current row's
    // own value. 9 vectors over RANGE and GROUPS frames (incl.
    // partitioned, offset-GROUPS, and empty-remainder shapes), all
    // captured live 2026-08-16.
    def wf(inner: String): String =
      s"(SELECT string_agg(coalesce(s::text,'N'), ',' ORDER BY id) FROM " +
      s"(SELECT id, $inner AS s FROM (VALUES (1,1,1,10),(2,1,2,20),(3,1,2,30)," +
      s"(4,1,3,40),(5,1,3,NULL::int),(6,2,3,60),(7,2,5,70)) v(id,p,o,x)) q)"
    val pinned: Seq[(String, String)] = Seq(
      ("min(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP)",
       "20,10,10,10,10,10,10"),
      ("max(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES)",
       "70,70,70,70,70,70,70"),
      ("min(x) OVER (PARTITION BY p ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)",
       "N,10,10,10,10,N,60"),
      ("max(x) OVER (ORDER BY o RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE GROUP)",
       "70,70,70,70,70,70,N"),
      // remainder provably empty: typed NULL
      ("min(x) OVER (ORDER BY o RANGE BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE GROUP)",
       "N,N,N,N,N,N,N"),
      // TIES over the bare peer group: just the row's own value
      ("min(x) OVER (ORDER BY o RANGE BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE TIES)",
       "10,20,30,40,N,60,70"),
      ("min(x) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP)",
       "20,10,10,20,20,20,40"),
      ("max(x) OVER (PARTITION BY p ORDER BY o GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE TIES)",
       "10,20,30,40,30,60,70"),
      ("max(x) OVER (ORDER BY o GROUPS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING EXCLUDE GROUP)",
       "30,60,60,70,70,70,60"))
    for ((expr, want) <- pinned)
      assert(one(wf(expr)) === want, s"expr: $expr")
  }

  test("sweep-25d: min/max EXCLUDE CURRENT ROW over RANGE/GROUPS frames (live pg 15, r17)") {
    // the LAST 0A000 window shape, closed: a RANGE/GROUPS frame is a
    // union of whole peer groups, so it splits into [start, group-1],
    // [group+1, end] in dense_rank group space PLUS the current group
    // minus the current row — two complementary ROWS windows
    // partitioned by the peer group itself (same partition+order ⇒
    // one Window operator ⇒ one physical row order ⇒ exact
    // complement). 7 vectors incl. partitioned, offset-GROUPS,
    // peers-minus-self, and cannot-contain-current (pg's no-op),
    // captured live 2026-08-16.
    def wf(inner: String): String =
      s"(SELECT string_agg(coalesce(s::text,'N'), ',' ORDER BY id) FROM " +
      s"(SELECT id, $inner AS s FROM (VALUES (1,1,1,10),(2,1,2,20),(3,1,2,30)," +
      s"(4,1,3,40),(5,1,3,NULL::int),(6,2,3,60),(7,2,5,70)) v(id,p,o,x)) q)"
    val pinned: Seq[(String, String)] = Seq(
      ("min(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)",
       "N,10,10,10,10,10,10"),
      ("max(x) OVER (ORDER BY o RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW)",
       "70,70,70,70,70,70,60"),
      ("min(x) OVER (PARTITION BY p ORDER BY o RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW)",
       "20,30,20,N,40,70,N"),
      // bare peer group minus the row itself
      ("min(x) OVER (ORDER BY o RANGE BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW)",
       "N,30,20,60,40,40,N"),
      ("min(x) OVER (ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)",
       "20,10,10,20,20,20,40"),
      ("max(x) OVER (PARTITION BY p ORDER BY o GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW)",
       "N,30,20,30,40,N,60"),
      // frame cannot contain the current row: EXCLUDE is pg's no-op
      ("max(x) OVER (ORDER BY o GROUPS BETWEEN 1 FOLLOWING AND 2 FOLLOWING EXCLUDE CURRENT ROW)",
       "60,70,70,70,70,70,N"))
    for ((expr, want) <- pinned)
      assert(one(wf(expr)) === want, s"expr: $expr")
  }

  test("sweep-26: german/french/spanish text-search configs (live pg 15, UTF8 db)") {
    // End-to-end through the config path (parser + stop words +
    // Snowball stemmer): 20 vectors, 0 diffs against a UTF8-encoding
    // live database (the scratch cluster's default SQL_ASCII db
    // splits non-ascii letters in the parser — capture artifact, the
    // engine's UTF-8 behavior is the faithful one). The stemmers
    // themselves were swept over 22,164 ts_lexize vocabulary pairs
    // (morphological cross products + random strings + edge words):
    // german 0 diffs first run; spanish/french converged after the
    // RV-limited-matching fix and two french prelude pins (ë/ï
    // respelling precedence, bare-H postlude deletion, H as a
    // non-vowel in the step-6 un-accent scan).
    val pinned: Seq[(String, String)] = Seq(
      ("to_tsvector('german', 'Die Kinder spielen fröhlich im schönen Garten und die Häuser')", "'frohlich':4 'gart':7 'haus':10 'kind':2 'schon':6 'spiel':3"),
      ("to_tsvector('french', 'Les enfants jouaient joyeusement dans les beaux jardins nationaux')", "'beau':7 'enfant':2 'jardin':8 'jou':3 'joyeux':4 'le':1,6 'national':9"),
      ("to_tsvector('spanish', 'Los niños jugaban alegremente en los hermosos jardines nacionales')", "'alegr':4 'hermos':7 'jardin':8 'jug':3 'nacional':9 'niñ':2"),
      ("to_tsvector('german', 'Verständnisses Ergebnissen Zeugnisse Königinnen')", "'ergebnis':2 'koniginn':4 'verstandnis':1 'zeugnis':3"),
      ("to_tsvector('french', 'naïve héroïque aiguë continuité généralisation')", "'aigu':3 'continu':4 'généralis':5 'héro':2 'naïv':1"),
      ("to_tsvector('spanish', 'construyendo dámelo escribiéndonos lingüística averigüéis')", "'averigü':5 'constru':1 'damel':2 'escrib':3 'lingüist':4"),
      ("plainto_tsquery('german', 'schönen Häuser')", "'schon' & 'haus'"),
      ("plainto_tsquery('french', 'les jardins nationaux')", "'le' & 'jardin' & 'national'"),
      ("plainto_tsquery('spanish', 'jardines hermosos')", "'jardin' & 'hermos'"),
      ("ts_lexize('german_stem', 'aufeinander')", "{aufeinand}"),
      ("ts_lexize('french_stem', 'continuité')", "{continu}"),
      ("ts_lexize('spanish_stem', 'torpedearon')", "{torped}"),
      ("to_tsvector('german', 'Häuser') @@ to_tsquery('german', 'haus')", "t"),
      ("to_tsvector('french', 'jardins') @@ plainto_tsquery('french', 'jardin')", "t"),
      ("to_tsvector('spanish', 'niños') @@ to_tsquery('spanish', 'niñ:*')", "t"),
      ("to_tsvector('german', 'die und im ist')", ""),
      ("ts_headline('german', 'Die Kinder spielen im Garten', to_tsquery('german', 'garten'))", "Die Kinder spielen im <b>Garten</b>"),
      ("websearch_to_tsquery('french', 'jardins \"beaux arbres\"')", "'jardin' & 'beau' <-> 'arbre'"),
      ("ts_rank(to_tsvector('german', 'Häuser und Gärten'), to_tsquery('german', 'gärten'))", "0.06079271"),
      ("phraseto_tsquery('spanish', 'jardines hermosos')", "'jardin' <-> 'hermos'"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    val germanPairs = Seq(
      ("kategorerinnen", "kategorerinn"),
      ("erklärenden", "erklar"),
      ("mögig", "mogig"),
      ("bedeuterem", "bedeut"),
      ("beziehungheit", "beziehung"),
      ("verständlichkeit", "verstand"),
      ("bäumeerem", "baume"),
      ("kleinte", "kleint"),
      ("wichtigs", "wichtig"),
      ("bewegem", "beweg"),
      ("treuerinnen", "treuerinn"),
      ("freundlichkeiten", "freundlich"))
    val spanishPairs = Seq(
      ("cantyendo", "cantyend"),
      ("coman", "com"),
      ("logicamientos", "logic"),
      ("libres", "libr"),
      ("cases", "cas"),
      ("explicuciones", "explicu"),
      ("comeña", "comeñ"),
      ("oéis", "oeis"),
      ("librosa", "libros"),
      ("cariñárselas", "cariñ"),
      ("trabajidades", "trabaj"),
      ("pequeñivo", "pequeñ"))
    val frenchPairs = Seq(
      ("bellions", "bellion"),
      ("continueriez", "continu"),
      ("paradoxaux", "paradoxal"),
      ("paraatrice", "paraatric"),
      ("nettoassent", "netto"),
      ("appelelle", "appelel"),
      ("naïissons", "naïisson"),
      ("nettoeraient", "netto"),
      ("finieraient", "fini"),
      ("ambitiettes", "ambitiet"),
      ("continue", "continu"),
      ("ambitiatrice", "ambiti"))
    for ((w, want) <- germanPairs)
      assert(graft.functions.SnowballStems.germanStem(w) === want, s"de: $w")
    for ((w, want) <- spanishPairs)
      assert(graft.functions.SnowballStems.spanishStem(w) === want, s"es: $w")
    for ((w, want) <- frenchPairs)
      assert(graft.functions.SnowballStems.frenchStem(w) === want, s"fr: $w")
  }

  test("sweep-27: array/record ::text cast rendering + bare varchar (live pg 15)") {
    // Cast(array|struct -> string) now renders pg composite text via
    // the wire TextEncoder (PgSemantics rule + PgCompositeText) —
    // previously Spark's '[1, 2, 3]' leaked through explicit casts.
    // 26 vectors, 1 non-diff (psql NULL-display artifact).
    val pinned: Seq[(String, String)] = Seq(
      ("(ARRAY[1,2,3])::text", "{1,2,3}"),
      ("(ARRAY['a','b c'])::text", "{a,\"b c\"}"),
      ("(ARRAY[true,false])::text", "{t,f}"),
      ("(ARRAY[[1,2],[3,4]])::text", "{{1,2},{3,4}}"),
      ("(ARRAY[1.5,2.5])::text", "{1.5,2.5}"),
      ("(ARRAY['x',null])::text", "{x,NULL}"),
      ("(ARRAY[1,NULL,3])::text", "{1,NULL,3}"),
      ("(ROW(1,'x'))::text", "(1,x)"),
      ("(ROW('a b', NULL, true))::text", "(\"a b\",,t)"),
      ("(ROW('x,y', '(paren)'))::text", "(\"x,y\",\"(paren)\")"),
      ("(ARRAY[ROW(1,'a'), ROW(2,'b c')])::text",
       "{\"(1,a)\",\"(2,\\\"b c\\\")\"}"),
      ("(ARRAY['a\"b','c\\d'])::text",
       "{\"a\\\"b\",\"c\\\\d\"}"),
      ("(ARRAY[''])::text", "{\"\"}"),
      ("(ARRAY['NULL','null'])::text", "{\"NULL\",\"null\"}"),
      ("(ARRAY['{}','a,b','a{b'])::text", "{\"{}\",\"a,b\",\"a{b\"}"),
      ("(ARRAY['2024-01-15'::date])::text", "{2024-01-15}"),
      ("(ARRAY['2024-01-15 10:30:00'::timestamp])::text",
       "{\"2024-01-15 10:30:00\"}"),
      ("(ARRAY[1.0::float8/3])::text", "{0.3333333333333333}"),
      ("length((ARRAY[1,2,3])::text)", "7"),
      ("(ARRAY[1,2])::text || '!'", "{1,2}!"),
      ("('{\"a\":1}'::jsonb)::text", "{\"a\": 1}"),
      ("'x'::varchar", "x"),
      ("123.45::text", "123.45"),
      ("true::text", "true"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }
  test("sweep-28: jsonb canonical sub-document rendering (live pg 15)") {
    // pg re-serializes jsonb from its binary form, so every jsonb
    // accessor/builder renders sub-documents `{"a": 1, "b": [1, 2]}`-
    // spaced; json (non-b) functions keep compact/insertion-order
    // text. 44 vectors, 39 exact; the excluded five were capture
    // artifacts (multiline jsonb_pretty — pinned in PgJsonSpec —
    // set-returning first-vs-last row, error-vs-error) plus the two
    // ::json original-text deviations, CLOSED in round 14 (pg_json
    // preserves source bytes; sweep-29 below pins the whole family).
    val pinned: Seq[(String, String)] = Seq(
      ("'{\"b\":1,\"a\":[1,2,{\"c\":3}]}'::jsonb",
       "{\"a\": [1, 2, {\"c\": 3}], \"b\": 1}"),
      ("json_build_object('a',1,'b',json_build_array(1,2))",
       "{\"a\" : 1, \"b\" : [1, 2]}"),
      ("jsonb_build_object('a',1,'b',2)",
       "{\"a\": 1, \"b\": 2}"),
      ("json_build_array(1,'x',null)",
       "[1, \"x\", null]"),
      ("to_json(ARRAY[1,2,3])",
       "[1,2,3]"),
      ("row_to_json(ROW(1,'x'))",
       "{\"f1\":1,\"f2\":\"x\"}"),
      ("json_agg(x) FROM (VALUES (1),(2)) t(x)",
       "[1, 2]"),
      ("jsonb_agg(x) FROM (VALUES (1),(2)) t(x)",
       "[1, 2]"),
      ("json_object_agg(k,v) FROM (VALUES ('a',1),('b',2)) t(k,v)",
       "{ \"a\" : 1, \"b\" : 2 }"),
      ("jsonb_object_agg(k,v) FROM (VALUES ('a',1),('b',2)) t(k,v)",
       "{\"a\": 1, \"b\": 2}"),
      ("json_object('{a,1,b,2}')",
       "{\"a\" : \"1\", \"b\" : \"2\"}"),
      ("jsonb_set('{\"a\":1}'::jsonb, '{b}', '2'::jsonb)",
       "{\"a\": 1, \"b\": 2}"),
      ("('{\"a\":1}'::jsonb || '{\"b\":2}'::jsonb)",
       "{\"a\": 1, \"b\": 2}"),
      ("jsonb_insert('{\"a\":[1,2]}'::jsonb, '{a,1}', '9'::jsonb)",
       "{\"a\": [1, 9, 2]}"),
      ("json_strip_nulls('{\"a\":1,\"b\":null}'::json)",
       "{\"a\":1}"),
      ("jsonb_strip_nulls('{\"a\":1,\"b\":null}'::jsonb)",
       "{\"a\": 1}"),
      ("to_jsonb(ARRAY['a','b'])",
       "[\"a\", \"b\"]"),
      ("jsonb_path_query_array('[1,2,3]'::jsonb, '$[*] ? (@ > 1)')",
       "[2, 3]"),
      ("('{\"a\":{\"b\":1,\"c\":[1,2]}}'::jsonb) -> 'a'",
       "{\"b\": 1, \"c\": [1, 2]}"),
      ("('[{\"x\":1},{\"y\":2}]'::jsonb) -> 0",
       "{\"x\": 1}"),
      ("jsonb_extract_path('{\"a\":{\"b\":[1,2]}}'::jsonb, 'a')",
       "{\"b\": [1, 2]}"),
      ("(SELECT string_agg(v::text, '|') FROM jsonb_array_elements('[{\"a\":1},[1,2]]'::jsonb) t(v))",
       "{\"a\": 1}|[1, 2]"),
      ("(SELECT string_agg(value::text, '|') FROM jsonb_each('{\"a\":{\"b\":1},\"c\":[1,2]}'::jsonb) t(key,value))",
       "{\"b\": 1}|[1, 2]"),
      ("jsonb_path_query_first('[{\"a\":1}]'::jsonb, '$[0]')",
       "{\"a\": 1}"),
      ("(SELECT string_agg(v::text, '|') FROM jsonb_path_query('[{\"a\":1},{\"b\":[2,3]}]'::jsonb, '$[*]') t(v))",
       "{\"a\": 1}|{\"b\": [2, 3]}"),
      ("jsonb_typeof('{\"a\":1}'::jsonb)",
       "object"),
      ("to_jsonb('{\"a\":1,\"b\":2}'::jsonb)",
       "{\"a\": 1, \"b\": 2}"),
      ("to_jsonb(ROW(1,'x'))",
       "{\"f1\": 1, \"f2\": \"x\"}"),
      ("json_object('{a,b}', '{1,2}')",
       "{\"a\" : \"1\", \"b\" : \"2\"}"),
      ("json_object('{{a,1},{b,2}}')",
       "{\"a\" : \"1\", \"b\" : \"2\"}"),
      ("jsonb_build_array(1, jsonb_build_object('k','v'))",
       "[1, {\"k\": \"v\"}]"),
      ("('{\"a\":1}'::jsonb #> '{}')",
       "{\"a\": 1}"),
      ("jsonb_set_lax('{\"a\":1}'::jsonb, '{b}', null, true, 'use_json_null')",
       "{\"a\": 1, \"b\": null}"),
      ("'{\"b\":1, \"a\": 2}'::jsonb",
       "{\"a\": 2, \"b\": 1}"),
      ("('{\"a\": {\"b\":1,  \"c\": 2}}'::jsonb) -> 'a'",
       "{\"b\": 1, \"c\": 2}"),
      ("('[{\"x\":1,\"y\":[1,2]}]'::json) -> 0",
       "{\"x\":1,\"y\":[1,2]}"),
      ("('[{\"x\":1,\"y\":[1,2]}]'::jsonb) -> 0",
       "{\"x\": 1, \"y\": [1, 2]}"),
      ("('{\"a\":{\"b\":2}}'::json) #> '{a}'",
       "{\"b\":2}"),
      ("('{\"a\":{\"b\":2}}'::jsonb) #> '{a}'",
       "{\"b\": 2}"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-30: italian/portuguese/dutch/russian text-search configs (live pg 15, UTF8 db)") {
    // Round-14 Snowball ports, same method as sweep-26: each stemmer
    // swept over a morphological cross-product vocabulary against
    // live pg 15 ts_lexize to 0 diffs (russian 5.4k + 1.1k edge words
    // incl. ё-folding; dutch 2.9k incl. y/i hiatus markers; italian
    // 4.6k incl. qU and attached pronouns; portuguese 5.2k after
    // pruning the accent-twin verb entries the real among lacks and
    // adding its bare 'eis'). End-to-end vectors captured on a UTF8
    // database (the SQL_ASCII scratch default mangles non-ascii).
    val pinned: Seq[(String, String)] = Seq(
      ("to_tsvector('russian', 'Дети радостно играли в красивых национальных садах')",
        "'дет':1 'игра':3 'красив':5 'национальн':6 'радостн':2 'сад':7"),
      ("to_tsvector('portuguese', 'As crianças brincavam alegremente nos belos jardins nacionais')",
        "'alegr':4 'bel':6 'brinc':3 'crianc':2 'jardins':7 'nacion':8"),
      ("to_tsvector('italian', 'I bambini giocavano felicemente nei bellissimi giardini nazionali')",
        "'bambin':2 'bellissim':6 'felic':4 'giardin':7 'gioc':3 'nazional':8"),
      ("to_tsvector('dutch', 'De kinderen speelden vrolijk in de mooie nationale tuinen')",
        "'kinder':2 'mooi':7 'national':8 'speeld':3 'tuin':9 'vrolijk':4"),
      ("plainto_tsquery('russian', 'красивые сады')", "'красив' & 'сад'"),
      ("to_tsvector('portuguese', 'coração emoções constituições')",
        "'constituiçõ':3 'coraçã':1 'emoçõ':2"),
      ("ts_headline('russian', 'Дети играли в саду', to_tsquery('russian', 'сад'))",
        "Дети играли в <b>саду</b>"),
      ("to_tsvector('russian', 'Ёжик нёс ёлку')", "'ежик':1 'елк':3 'нес':2"),
      ("websearch_to_tsquery('portuguese', 'jardins \"belos amigos\"')",
        "'jardins' & 'bel' <-> 'amig'"),
      ("to_tsvector('dutch', 'de het een en van is')", ""),
      ("to_tsvector('italian', 'perché città università caffè')",
        "'caff':4 'citt':2 'univers':3"),
      ("ts_lexize('italian_stem', 'organizzazione')", "{organizz}"),
      ("ts_lexize('portuguese_stem', 'organização')", "{organiz}"),
      ("ts_lexize('dutch_stem', 'mogelijkheden')", "{mogelijk}"),
      ("ts_lexize('russian_stem', 'программирование')", "{программирован}"),
      ("ts_rank(to_tsvector('russian', 'красивые сады и парки'), to_tsquery('russian', 'сады'))",
        "0.06079271"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // per-stemmer pairs sampled from the 0-diff sweep captures
    val ru = Seq(("глубокому", "глубок"), ("человечое", "человеч"),
      ("безопаснью", "безопасн"), ("делыван", "делыва"),
      ("добрешь", "добреш"), ("бегауйте", "бега"), ("изменими", "измен"),
      ("важнейшую", "важн"), ("письменность", "письмен"))
    val nl = Seq(("vertelingen", "vertel"), ("baken", "bak"),
      ("snelaas", "snelas"), ("grootbare", "grootbar"),
      ("lopbarheid", "lopbar"), ("moeilijkheden", "moeilijk"),
      ("koninginnen", "koninginn"), ("gemeenschappelijk", "gemeenschapp"))
    val it = Seq(("arrività", "arriv"), ("grandirsi", "grand"),
      ("generaliscono", "general"), ("buona", "buon"),
      ("finuzione", "finuzion"), ("guardosamente", "guardos"),
      ("abituarli", "abitu"), ("crocchio", "crocc"))
    val pt = Seq(("coraçlogias", "coraçlog"), ("cantiva", "cantiv"),
      ("amigante", "amig"), ("felizos", "feliz"), ("falição", "faliçã"),
      ("falada", "fal"), ("tenidades", "tenidad"), ("cheguei", "chegu"))
    for ((w, want) <- ru)
      assert(graft.functions.SnowballStems.russianStem(w) === want, s"ru: $w")
    for ((w, want) <- nl)
      assert(graft.functions.SnowballStems.dutchStem(w) === want, s"nl: $w")
    for ((w, want) <- it)
      assert(graft.functions.SnowballStems.italianStem(w) === want, s"it: $w")
    for ((w, want) <- pt)
      assert(graft.functions.SnowballStems.portugueseStem(w) === want, s"pt: $w")
  }

  test("sweep-31: swedish/norwegian/danish/finnish text-search configs (live pg 15, UTF8 db)") {
    // Round-14 Snowball ports. The Scandinavian trio came out 0-diff
    // on the first live sweep (sv 12,048 / no 10,796 / da 10,838
    // ts_lexize pairs incl. adversarial random words). Finnish — the
    // agglutinative hard case — was reverse-engineered against 24,695
    // live pairs plus targeted probes to 0 diffs: the suffix tables
    // were recovered from pg's own dict_snowball.so string pool, and
    // the probe set pinned the semantics the published description
    // leaves out (region-FITTING candidates with fallback-on-
    // condition-failure, hard-abort for the illative hVn and tta/ttä
    // classes, the i/j-plural gate on a removed case ending, and the
    // R1-interior jo/oj/uj trims).
    val pinned: Seq[(String, String)] = Seq(
      ("to_tsvector('swedish', 'Barnen lekte glatt i de vackra nationella trädgårdarna')",
        "'barn':1 'glatt':3 'lekt':2 'nationell':7 'trädgård':8 'vackr':6"),
      ("to_tsvector('norwegian', 'Barna lekte glade i de vakre nasjonale hagene')",
        "'barn':1 'glad':3 'hag':8 'lekt':2 'nasjonal':7 'vakr':6"),
      ("to_tsvector('danish', 'Børnene legede glade i de smukke nationale haver')",
        "'børn':1 'glad':3 'hav':8 'leged':2 'national':7 'smuk':6"),
      ("to_tsvector('finnish', 'Lapset leikkivät iloisesti kauniissa kansallisissa puutarhoissa')",
        "'ilois':3 'kansallis':5 'kauni':4 'laps':1 'leikkiv':2 'puutarho':6"),
      ("plainto_tsquery('swedish', 'vackra trädgårdarna')", "'vackr' & 'trädgård'"),
      ("plainto_tsquery('norwegian', 'vakre hagene')", "'vakr' & 'hag'"),
      ("plainto_tsquery('danish', 'smukke haver')", "'smuk' & 'hav'"),
      ("plainto_tsquery('finnish', 'kauniissa puutarhoissa')", "'kauni' & 'puutarho'"),
      ("ts_lexize('swedish_stem', 'kärleksfullt')", "{kärleksfull}"),
      ("ts_lexize('norwegian_stem', 'hemmelighetene')", "{hemm}"),
      ("ts_lexize('danish_stem', 'venligst')", "{ven}"),
      ("ts_lexize('finnish_stem', 'edistyksellisyydellänsäkään')", "{edistyksellisyyd}"),
      ("to_tsvector('swedish', 'och det att i en')", ""),
      ("ts_headline('danish', 'Børnene leger i haven', to_tsquery('danish', 'leger'))",
        "Børnene <b>leger</b> i haven"),
      ("to_tsvector('finnish', 'taloissa') @@ to_tsquery('finnish', 'talo')", "t"),
      ("websearch_to_tsquery('swedish', 'vackra \"nationella parker\"')",
        "'vackr' & 'nationell' <-> 'park'"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-41: turkish text-search config (live pg 15, UTF8 db)") {
    // Round-15 Snowball port — the probe-hardest config: verified
    // 0-diff against live pg ts_lexize on 27,980 words (7,980
    // morphological cross-product + 20,000 random) and against
    // libstemmer 2.2 on 190,308 more. The recovered semantics include
    // the mark/slice machinery no other config needs: nDA/nA case
    // suffixes MARK without deleting and an inner ki-chain deletes
    // from the MIDDLE of the word (baysininkinda → baysinda), the
    // possessive-n chain re-exposes verb suffixes only at the
    // original word end (kartın → kar but altınla → alt), and the
    // postlude order is append-U *then* devoice (dadla → dadı,
    // dumla → t).
    val pinned: Seq[(String, String)] = Seq(
      ("to_tsvector('turkish', 'çocuklar güzel ulusal bahçelerde mutlu oynuyorlardı')",
        "'bahçe':4 'güzel':2 'mutlu':5 'oynuyor':6 'ulusal':3 'çocuk':1"),
      ("plainto_tsquery('turkish', 'güzel bahçelerde')", "'güzel' & 'bahçe'"),
      ("ts_lexize('turkish_stem', 'çocuklar')", "{çocuk}"),
      ("ts_lexize('turkish_stem', 'okuldakilerden')", "{okul}"),
      ("ts_lexize('turkish_stem', 'kitaplarımızdakiler')", "{kitaplarımızdaki}"),
      ("ts_lexize('turkish_stem', 'baysininkinda')", "{baysinda}"),
      ("ts_lexize('turkish_stem', 'ailecasına')", "{aileca}"),
      ("ts_lexize('turkish_stem', 'kartın')", "{kar}"),
      ("ts_lexize('turkish_stem', 'gözlerimizin')", "{göz}"),
      ("ts_lexize('turkish_stem', 'sevadı')", "{sevadı}"),
      ("to_tsvector('turkish', 've bu da bir şey')", "'bir':4"),
      ("to_tsvector('turkish', 'evlerinde') @@ to_tsquery('turkish', 'evler')", "t"),
      ("websearch_to_tsquery('turkish', 'güzel \"ulusal parklar\"')",
        "'güzel' & 'ulusal' <-> 'park'"),
      ("ts_headline('turkish', 'çocuklar bahçede oynuyor', to_tsquery('turkish', 'bahçede'))",
        "çocuklar <b>bahçede</b> oynuyor"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-35: romanian/hungarian/indonesian text-search configs (live pg 15, UTF8 db)") {
    // Round-14 Snowball ports, verified 0-diff against live ts_lexize:
    // ro 10,957 pairs, hu 12,004 (incl. digraph-double undoubling:
    // nny→ny), id 6,363 — the indonesian flag system (prefix classes
    // gating -kan/-an/-i, nasal restorations men+y+V→s / mem+V→p, and
    // the restored-letter cursor that blocks second-order matching)
    // was recovered by brute-forcing flow hypotheses against the
    // capture. Sentence pins below from a UTF8-encoded cluster.
    val pinned: Seq[(String, String)] = Seq(
      ("to_tsvector('romanian', 'Muncitorii lucrează frumos în grădinile naționale')",
        "'frumos':3 'grădin':5 'lucr':2 'muncit':1 'național':6 'în':4"),
      ("to_tsvector('romanian', 'copiii învăţau cântecele frumoase')",
        "'copii':1 'cântec':3 'frumoas':4 'învăţ':2"),
      ("to_tsvector('hungarian', 'A gyerekek boldogan játszottak a szép nemzeti kertekben')",
        "'boldog':3 'gyerek':2 'játszott':4 'kert':8 'nemzet':7 'szép':6"),
      ("to_tsvector('indonesian', 'Anak-anak bermain dengan gembira di taman nasional yang indah')",
        "'anak':2,3 'anak-anak':1 'dengan':5 'di':7 'gembira':6 'indah':11 'main':4 'nasional':9 'taman':8 'yang':10"),
      ("plainto_tsquery('romanian', 'grădinile frumoase')", "'grădin' & 'frumoas'"),
      ("plainto_tsquery('hungarian', 'szép kertekben')", "'szép' & 'kert'"),
      ("plainto_tsquery('indonesian', 'mempelajari pengajaran')", "'ajar' & 'ajar'"),
      ("ts_lexize('romanian_stem', 'muncitorii')", "{muncit}"),
      ("ts_lexize('romanian_stem', 'lucrează')", "{lucr}"),
      ("ts_lexize('hungarian_stem', 'házakban')", "{ház}"),
      ("ts_lexize('hungarian_stem', 'tollal')", "{tol}"), // instrumental undouble
      ("ts_lexize('indonesian_stem', 'mempelajari')", "{ajar}"),
      ("ts_lexize('indonesian_stem', 'menyapu')", "{sapu}"), // meny+V → s
      ("ts_headline('hungarian', 'a gyerekek a kertekben játszanak', to_tsquery('hungarian','kertekben'))",
        "a gyerekek a <b>kertekben</b> játszanak"),
      ("to_tsvector('indonesian', 'buku') @@ to_tsquery('indonesian', 'bukuku')", "t"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-29: ::json preserves original text; accessors slice source fragments (live pg 15)") {
    // pg's json (non-b) type stores the SOURCE BYTES: round-trips are
    // verbatim (key order, interior spacing, duplicate keys, even
    // surrounding whitespace), and every accessor returns the original
    // source fragment of the target value — not a re-serialization.
    // 33 vectors captured live on pg 15 (round-14 session), 33 exact.
    val pinned: Seq[(String, Option[String])] = Seq(
      ("'{\"b\":1, \"a\": 2}'::json", Some("{\"b\":1, \"a\": 2}")),
      ("'{\"b\":1,\"a\":[1,2,{\"c\":3}]}'::json", Some("{\"b\":1,\"a\":[1,2,{\"c\":3}]}")),
      ("'[{\"x\":1,  \"y\": [1 ,2]}]'::json -> 0", Some("{\"x\":1,  \"y\": [1 ,2]}")),
      ("('[ {\"x\":1} ]'::json) -> 0", Some("{\"x\":1}")),
      ("('{\"a\":1,\"a\":2}'::json) -> 'a'", Some("2")), // duplicate keys: LAST wins
      ("('{\"a\": 1.50}'::json) -> 'a'", Some("1.50")), // original number repr
      ("('{\"a\":{\"b\" :2}}'::json) #> '{a}'", Some("{\"b\" :2}")),
      ("('{\"a\": [1 , 2]}'::json) ->> 'a'", Some("[1 , 2]")), // container via ->>: fragment
      ("('[1, 2]'::json) -> 1", Some("2")),
      ("('[1, 2]'::json) -> -1", Some("2")), // negative index from the end
      ("('[1, 2]'::json) -> 5", None),
      ("('{\"a\": \"x\"}'::json) -> 'missing'", None),
      ("json_extract_path('{\"a\": {\"b\" :1}}', 'a')", Some("{\"b\" :1}")),
      ("json_extract_path_text('{\"a\": {\"b\" :1}}', 'a')", Some("{\"b\" :1}")),
      ("('{\"a\": \"he said \\\"hi\\\"\"}'::json) ->> 'a'", Some("he said \"hi\"")),
      ("('{\"a\": \"he said \\\"hi\\\"\"}'::json) -> 'a'", Some("\"he said \\\"hi\\\"\"")),
      ("('{\"a\": null}'::json) -> 'a'", Some("null")), // json null stays text via ->
      ("('{\"a\": null}'::json) ->> 'a'", None), // ->> maps json null to SQL NULL
      ("('{\"a\": true}'::json) -> 'a'", Some("true")),
      ("('{\"a\": 1e3}'::json) -> 'a'", Some("1e3")), // exponent form preserved
      ("('{\"a\\\"q\": 7}'::json) -> 'a\"q'", Some("7")), // escaped quote in key
      ("json_build_object('k', '{\"b\":1, \"a\":2}'::json)",
        Some("{\"k\" : {\"b\":1, \"a\":2}}")), // json arg embeds raw, original text
      ("json_build_array('[1 ,2]'::json, 'txt')", Some("[[1 ,2], \"txt\"]")),
      ("('{\"emoji\": \"👍\"}'::json) ->> 'emoji'", Some("👍")),
      ("('[[1 , 2],[3, 4]]'::json) #> '{0,1}'", Some("2")),
      ("('{\"a\": {\"b\": {\"c\" :9}}}'::json) #>> '{a,b}'", Some("{\"c\" :9}")),
      ("('{\"a\":1}'::json) #> '{}'", Some("{\"a\":1}")), // empty path: whole doc
      ("json_strip_nulls('{\"a\":1, \"b\":null}'::json)", Some("{\"a\":1}")),
      ("json_typeof('{\"a\": 1}'::json)", Some("object")),
      ("('{\"outer\": {\"b\":1, \"a\": 2}}'::json) -> 'outer'",
        Some("{\"b\":1, \"a\": 2}")),
      ("json_array_length('[1, 2 , 3]'::json)", Some("3")),
      ("('\"scalar\"'::json) ->> 0", None), // subscripting a scalar
      ("(' {\"a\": 1} '::json)", Some(" {\"a\": 1} "))) // surrounding ws survives
    for ((expr, want) <- pinned)
      assert(oneOpt(expr) === want, s"expr: $expr")
  }

  test("sweep-30: unique-name operators resolve on both-unknown literals (live pg 15)") {
    // pg resolves an operator over two untyped literals when the name
    // is UNIQUE in the catalog: <<= / >>= (inet), and text @@ text
    // (to_tsvector(l) @@ plainto_tsquery(r)). Names with multiple
    // candidates ('<<', '&&', '@>', '-|-', '%', '<->') raise
    // "operator is not unique" in pg and keep their Spark/default
    // meaning here (documented superset deviation). 11 vectors
    // captured live on pg 15 (round-14 session), 11 exact.
    val pinned: Seq[(String, String)] = Seq(
      ("'192.168.1.5' <<= '192.168.1.0/24'", "t"),
      ("'192.168.1.5' <<= '192.168.2.0/24'", "f"),
      ("'192.168.1.0/24' >>= '192.168.1.5'", "t"),
      ("'10.0.0.0/8' >>= '10.255.0.1'", "t"),
      ("'fat cats ate rats' @@ 'cat'", "t"),
      // plainto treats '&' as punctuation: both words still required
      ("'fat cats ate rats' @@ 'cats & rats'", "t"),
      ("'fat:1 cat:2' @@ 'cat'", "t"),
      ("'a fat cat' @@ 'fat & cow'", "f"),
      ("'192.168.1.5' <<= '192.168.1.0/24'::cidr", "t"),
      // one-side-typed forms keep resolving (regression guard)
      ("'a fat cat' @@ 'fat & cow'::tsquery", "f"),
      ("'fat cats' @@ to_tsquery('cats')", "t"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
  }

  test("sweep-32: unknown-literal coercion — arrays, datetime, functions (live pg 15)") {
    // 81/83 vectors 0-diff vs live pg 15; the two accepted deviations
    // (engine MORE permissive where pg raises not-unique/no-operator:
    // coalesce(null,'5')+1, date_part('year','lit')) are documented in
    // COVERAGE.md.
    val pinned = Seq(
      // prefix-typed literals: pg's `typename 'literal'` syntax
      ("int4range '[1,5)' @> 3", "t"),
      ("numrange '[1.5,2.5)' @> 2.0", "t"),
      ("inet '192.168.1.5' << cidr '192.168.1.0/24'", "t"),
      ("uuid 'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11'",
        "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"),
      // array ops with an untyped '{…}' literal (array_in coercion)
      ("'{1,2}'::int[] && '{2,3}'", "t"),
      ("'{1,2}'::int[] || '{3}'", "{1,2,3}"),
      ("'{1,2}'::int[] || '{}'", "{1,2}"),
      ("'{1,2,3}'::int[] @> '{2}'", "t"),
      ("'{2}' <@ '{1,2,3}'::int[]", "t"),
      // array || typed element → append/prepend
      ("'{1,2}'::int[] || 4", "{1,2,4}"),
      ("0 || '{1,2}'::int[]", "{0,1,2}"),
      // timestamp/interval ± unknown: + reads an INTERVAL, ts - reads
      // a TIMESTAMP (pg prefers ts-ts for minus)
      ("'2020-06-15 12:00:00'::timestamp + '90 minutes'", "2020-06-15 13:30:00"),
      ("'2020-01-02 00:00:00'::timestamp - '2020-01-01 12:00:00'", "12:00:00"),
      ("extract(epoch from '2020-01-02 00:00:00'::timestamp - '2020-01-01 00:00:00')",
        "86400.000000"),
      ("'1 day'::interval + '2 hours'", "1 day 02:00:00"),
      ("'1 day'::interval - '2 hours'", "1 day -02:00:00"),
      // ISO 8601 interval input (uppercase designators required)
      ("'P1DT2H'::interval", "1 day 02:00:00"),
      ("'P1Y2M3DT4H5M6S'::interval", "1 year 2 mons 3 days 04:05:06"),
      ("'P0001-02-03T04:05:06'::interval", "1 year 2 mons 3 days 04:05:06"),
      ("'PT0.5S'::interval", "00:00:00.5"),
      ("'P1W'::interval", "7 days"),
      ("'P1.5D'::interval", "1 day 12:00:00"),
      ("'P0.5Y'::interval", "6 mons"),
      ("'P-1D'::interval", "-1 days"),
      ("'PT'::interval", "00:00:00"),
      ("interval 'P1D'", "1 day"),
      // 1-arg to_timestamp is pg's epoch → timestamptz
      ("to_timestamp('1609459200')", "2021-01-01 00:00:00+00"),
      ("to_timestamp(1609459200.5)", "2021-01-01 00:00:00.5+00"),
      // greatest/least coerce unknown literals to the known type
      ("greatest('1', 2)", "2"),
      ("least(3, '2')", "2"),
      ("greatest('1', 2.5, 3)", "3"),
      ("greatest('2020-01-05'::date, '2020-01-01')", "2020-01-05"),
      // function-argument unknowns already resolving (regression set)
      ("abs('-3')", "3"),
      ("round('3.14159', 2)", "3.14"),
      ("substr('hello', '2')", "ello"),
      ("power('2', '10')", "1024"),
      ("width_bucket('5.35', 0.024, 10.06, 5)", "3"))
    for ((expr, want) <- pinned)
      assert(one(expr) === want, s"expr: $expr")
    // pg-error parity: both sides raise (unknown-vs-unknown is not
    // unique; a non-array-shaped literal beside an array is 22P02;
    // lowercase ISO designators and bare 'P' are invalid interval
    // input; timestamp minus a non-timestamp literal fails its cast)
    for (bad <- Seq("'[1,5)' @> 3", "'{1,2}' && '{2,3}'",
      "'{1,2}'::int[] || '3'", "'3' || '{1,2}'::int[]",
      "'p1dt2h'::interval", "'P'::interval", "'-P1DT2H'::interval",
      "'2020-06-15 12:00:00'::timestamp - '1 hour'"))
      intercept[Exception] { one(bad) }
  }
}
