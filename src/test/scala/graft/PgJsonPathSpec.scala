package graft

/** Engine-level vectors for the SQL/JSON path family
  * (PgJsonPathExpressions). Expected values follow the public
  * PostgreSQL docs §9.16.2 ("The SQL/JSON Path Language") examples,
  * restated in the engine's compact jsonb rendering.
  */
class PgJsonPathSpec extends SparkSpec {

  private def one(sql: String): Any = {
    graft.pgwire.PgFunctions.registerAll(spark)
    spark.sql(s"SELECT $sql AS r").collect()(0).get(0)
  }
  private def str(sql: String): String = one(sql) match {
    case null => null
    case v => v.toString
  }
  private def items(sql: String): Seq[String] = {
    graft.pgwire.PgFunctions.registerAll(spark)
    spark.sql(s"SELECT $sql AS r").collect()(0).getSeq[String](0)
  }

  private val doc = """'{"a":[1,2,3,4,5]}'"""

  test("pg doc headline: $.a[*] filter with vars across the five functions") {
    val path = "'$.a[*] ? (@ >= $min && @ <= $max)'"
    val vars = """'{"min":2, "max":4}'"""
    assert(one(s"jsonb_path_exists($doc, $path, $vars)") === true)
    assert(items(s"jsonb_path_query($doc, $path, $vars)") === Seq("2", "3", "4"))
    assert(str(s"jsonb_path_query_array($doc, $path, $vars)") === "[2, 3, 4]")
    assert(str(s"jsonb_path_query_first($doc, $path, $vars)") === "2")
    assert(one(s"jsonb_path_match($doc, 'exists($$.a[*] ? (@ >= 2 && @ <= 4))')") === true)
  }

  test("lax auto-unwraps; strict errors structurally; silent suppresses") {
    val nested = """'{"a":[{"b":1},{"b":2}]}'"""
    assert(str(s"jsonb_path_query_array($nested, '$$.a.b')") === "[1, 2]")
    assert(str(s"jsonb_path_query_array($nested, 'lax $$.a.b')") === "[1, 2]")
    val e = intercept[Exception](str(s"jsonb_path_query_array($nested, 'strict $$.a.b')"))
    assert(e.getMessage.contains("member accessor"))
    // 4-arg silent form: query_array wraps the empty sequence (pg 15
    // pinned: '[]'), the scalar functions map the error to SQL NULL
    assert(str(
      s"jsonb_path_query_array($nested, 'strict $$.a.b', '{}', true)") === "[]")
    assert(str(
      s"jsonb_path_query_first($nested, 'strict $$.a.b', '{}', true)") === null)
    assert(one(
      s"jsonb_path_exists($nested, 'strict $$.a.b', '{}', true)") === null)
    // lax missing member yields empty, exists() false
    assert(str(s"jsonb_path_query_array($nested, '$$.missing')") === "[]")
    assert(one(s"jsonb_path_exists($nested, '$$.missing')") === false)
  }

  test("subscripts: index, last, ranges, comma lists; strict bounds") {
    val arr = """'[10,20,30,40]'"""
    assert(str(s"jsonb_path_query_first($arr, '$$[1]')") === "20")
    assert(str(s"jsonb_path_query_first($arr, '$$[last]')") === "40")
    assert(str(s"jsonb_path_query_array($arr, '$$[1 to 2]')") === "[20, 30]")
    assert(str(s"jsonb_path_query_array($arr, '$$[0, last]')") === "[10, 40]")
    assert(str(s"jsonb_path_query_array($arr, '$$[last - 1]')") === "[30]")
    // lax out-of-bounds yields empty; strict errors
    assert(str(s"jsonb_path_query_array($arr, '$$[9]')") === "[]")
    val e = intercept[Exception](str(s"jsonb_path_query_array($arr, 'strict $$[9]')"))
    assert(e.getMessage.contains("out of bounds"))
    // lax: scalar behaves as a one-element array
    assert(str(s"jsonb_path_query_first('7', '$$[0]')") === "7")
  }

  test("item methods: type/size/double/abs/floor/ceiling") {
    assert(items(s"""jsonb_path_query('[1, "a", [], {}, true, null]', '$$[*].type()')""") ===
      Seq("\"number\"", "\"string\"", "\"array\"", "\"object\"", "\"boolean\"", "\"null\""))
    assert(str(s"jsonb_path_query_first($doc, '$$.a.size()')") === "5")
    assert(str(s"""jsonb_path_query_first('{"x":"1.5"}', '$$.x.double()')""") === "1.5")
    assert(str(s"jsonb_path_query_array('[-1.5, 1.5]', '$$[*].abs()')") === "[1.5, 1.5]")
    assert(str(s"jsonb_path_query_array('[1.8, -1.8]', '$$[*].floor()')") === "[1, -2]")
    assert(str(s"jsonb_path_query_array('[1.2, -1.2]', '$$[*].ceiling()')") === "[2, -1]")
    val e = intercept[Exception](
      str(s"""jsonb_path_query_first('{"x":"pi"}', '$$.x.double()')"""))
    assert(e.getMessage.contains("double"))
  }

  test("filter predicates: like_regex, starts with, is unknown, nesting") {
    val strs = """'["abc", "abd", "aBdC", "ab", null]'"""
    assert(str(s"""jsonb_path_query_array($strs, '$$[*] ? (@ like_regex "^ab.*c")')""") === """["abc"]""")
    assert(str(
      s"""jsonb_path_query_array($strs, '$$[*] ? (@ like_regex "^ab.*c" flag "i")')""") === """["abc", "aBdC"]""")
    assert(str(s"""jsonb_path_query_array($strs, '$$[*] ? (@ starts with "ab")')""") === """["abc", "abd", "ab"]""")
    // ordering against json null is FALSE (not unknown) in pg — the
    // is-unknown filter selects nothing here (pg 15 pinned: '[]')
    assert(str(s"""jsonb_path_query_array($strs, '$$[*] ? ((@ > "a") is unknown)')""") === "[]")
    // cross-type ordering IS unknown: the number survives is-unknown
    assert(str(s"""jsonb_path_query_array('[1, "b"]', '$$[*] ? ((@ > "a") is unknown)')""") === "[1]")
    // nested filter over objects, && / || / !
    val books = """'{"items":[{"p":12,"s":true},{"p":5,"s":false},{"p":8,"s":true}]}'"""
    assert(str(
      s"jsonb_path_query_array($books, '$$.items[*] ? (@.p > 6 && @.s == true).p')") === "[12, 8]")
    assert(str(
      s"jsonb_path_query_array($books, '$$.items[*] ? (@.p < 6 || !(@.s == true)).p')") === "[5]")
  }

  test("arithmetic and predicate-path items") {
    assert(str(s"""jsonb_path_query_first('{"x":[2]}', '$$.x[0] + 3')""") === "5")
    assert(str(s"""jsonb_path_query_first('{"x":7}', '-$$.x')""") === "-7")
    assert(str(s"""jsonb_path_query_first('{"x":7}', '$$.x % 4')""") === "3")
    assert(str(s"""jsonb_path_query_first('{"x":7}', '$$.x * 2 + 1')""") === "15")
    val e = intercept[Exception](str(s"""jsonb_path_query_first('{"x":7}', '$$.x / 0')"""))
    assert(e.getMessage.contains("division by zero"))
    // a predicate path used as a query yields its ternary item; a
    // missing member compares FALSE, not unknown (pg 15 pinned)
    assert(str(s"""jsonb_path_query_first('{"a":1}', '$$.a == 1')""") === "true")
    assert(str(s"""jsonb_path_query_first('{"a":1}', '$$.a == 2')""") === "false")
    assert(str(s"""jsonb_path_query_first('{"a":1}', '$$.b == 1')""") === "false")
    assert(one(s"""jsonb_path_match('{"a":1}', '$$.b == 1')""") === false)
    // genuinely-unknown (cross-type ordering) -> SQL NULL
    assert(one(s"""jsonb_path_match('[1]', '$$[0] > "a"')""") === null)
  }

  test("wildcards, quoted members, and null semantics") {
    assert(str(s"""jsonb_path_query_array('{"a":1,"b":2}', '$$.*')""") === "[1, 2]")
    assert(str(s"""jsonb_path_query_array('{"odd key":5}', '$$."odd key"')""") === "[5]")
    // jsonpath null comparisons: null == null true; ordering false
    assert(one(s"""jsonb_path_exists('[null]', '$$[*] ? (@ == null)')""") === true)
    assert(one(s"""jsonb_path_exists('[1]', '$$[*] ? (@ == null)')""") === false)
    // cross-type comparison is unknown, not an error: filter drops it
    assert(str(s"""jsonb_path_query_array('[1, "x"]', '$$[*] ? (@ > 0)')""") === "[1]")
    // STRICT nulls: null args -> null result
    assert(str("jsonb_path_query_array(CAST(NULL AS STRING), '$')") === null)
  }

  test(".** recursive descent with level bounds (pg 15 pinned)") {
    val d = """'{"a":{"b":1},"c":[2,3]}'"""
    assert(str(s"jsonb_path_query_array($d, '$$.**')") === """[{"a": {"b": 1}, "c": [2, 3]}, {"b": 1}, 1, [2, 3], 2, 3]""")
    assert(str(s"jsonb_path_query_array($d, '$$.**{1}')") === """[{"b": 1}, [2, 3]]""")
    assert(str(s"jsonb_path_query_array($d, '$$.**{1 to 2}')") === """[{"b": 1}, 1, [2, 3], 2, 3]""")
    // `last` lower bound = deepest level of each branch (the leaves)
    assert(str(s"jsonb_path_query_array($d, '$$.**{last}')") === "[1, 2, 3]")
    assert(str(s"""jsonb_path_query_array('{"a":1,"b":{"c":2}}', '$$.**{last}')""") === "[1, 2]")
    assert(str(s"""jsonb_path_query_array('[[1,[2]],3]', '$$.**{last}')""") === "[1, 2, 3]")
    // `last` upper bound = unbounded
    assert(str(s"""jsonb_path_query_array('{"a":{"b":1}}', '$$.**{1 to last}')""") === """[{"b": 1}, 1]""")
    assert(str(s"""jsonb_path_query_array('{"a":{"b":{"c":1}}}', '$$.**{2 to last}')""") === """[{"c": 1}, 1]""")
    // an empty root is itself level 0
    assert(str(s"jsonb_path_query_array('[]', '$$.**')") === "[[]]")
    // descent + filter finds nested values at any depth
    assert(str(s"""jsonb_path_query_array('{"x":{"deep":{"v":9}},"v":1}',
      '$$.** ? (@.type() == "number" && @ > 5)')""".stripMargin.replace("\n", " ")) === "[9]")
  }

  test(".keyvalue() emits id/key/value objects (sequential ids)") {
    assert(str(s"""jsonb_path_query_array('{"a":1,"b":"x"}', '$$.keyvalue()')""") === """[{"id": 0, "key": "a", "value": 1}, {"id": 0, "key": "b", "value": "x"}]""")
    // lax unwraps an array of objects
    assert(str(s"""jsonb_path_query_array('[{"b":1}]', '$$.keyvalue()')""") === """[{"id": 0, "key": "b", "value": 1}]""")
    assert(str(s"jsonb_path_query_array('{}', '$$.keyvalue()')") === "[]")
    // two distinct objects get distinct ids
    assert(str(s"""jsonb_path_query_array('[{"a":1},{"b":2}]', '$$[*].keyvalue().id')""") === "[0, 1]")
    val e = intercept[Exception](str(s"jsonb_path_query_array('3', '$$.keyvalue()')"))
    assert(e.getMessage.contains("keyvalue"))
  }

  test(".datetime() parses ISO forms, renders canonically, types correctly") {
    assert(str(s"""jsonb_path_query_first('"2023-08-15"', '$$.datetime()')""") ===
      "\"2023-08-15\"")
    assert(str(s"""jsonb_path_query_first('"2023-08-15 12:34:56"', '$$.datetime()')""") ===
      "\"2023-08-15T12:34:56\"")
    assert(str(s"""jsonb_path_query_first('"12:34:56"', '$$.datetime()')""") ===
      "\"12:34:56\"")
    assert(str(
      s"""jsonb_path_query_first('"2023-08-15 12:34:56+05:30"', '$$.datetime()')""") ===
      "\"2023-08-15T12:34:56+05:30\"")
    // bare-hour offset normalizes; fraction trims trailing zeros
    assert(str(
      s"""jsonb_path_query_first('"2023-08-15 12:34:56+05"', '$$.datetime()')""") ===
      "\"2023-08-15T12:34:56+05:00\"")
    assert(str(s"""jsonb_path_query_first('"12:34:56.120"', '$$.datetime()')""") ===
      "\"12:34:56.12\"")
    assert(str(
      s"""jsonb_path_query_first('"2023-08-15 12:34:56.123456"', '$$.datetime()')""") ===
      "\"2023-08-15T12:34:56.123456\"")
    // .type() names the five pg kinds
    assert(str(s"""jsonb_path_query_first('"2023-08-15"', '$$.datetime().type()')""") ===
      "\"date\"")
    assert(str(s"""jsonb_path_query_first('"12:34:56.123"', '$$.datetime().type()')""") ===
      "\"time without time zone\"")
    assert(str(s"""jsonb_path_query_first('"10:00:00+03"', '$$.datetime().type()')""") ===
      "\"time with time zone\"")
    assert(str(
      s"""jsonb_path_query_first('"2023-08-15 10:00:00+02"', '$$.datetime().type()')""") ===
      "\"timestamp with time zone\"")
    // errors match pg's wording; seconds are required
    val e1 = intercept[Exception](
      str(s"""jsonb_path_query_first('"bad"', '$$.datetime()')"""))
    assert(e1.getMessage.contains("datetime format is not recognized"))
    val e2 = intercept[Exception](
      str(s"""jsonb_path_query_first('"2023-08-15 12:34"', '$$.datetime()')"""))
    assert(e2.getMessage.contains("datetime format is not recognized"))
    val e3 = intercept[Exception](
      str(s"jsonb_path_query_first('5', '$$.datetime()')"))
    assert(e3.getMessage.contains("can only be applied to a string"))
  }

  test(".datetime(template) via the to_char engine; comparisons by instant") {
    assert(str(
      s"""jsonb_path_query_first('"15-08-2023"', '$$.datetime("DD-MM-YYYY")')""") ===
      "\"2023-08-15\"")
    assert(str(
      s"""jsonb_path_query_first('"15 Aug 2023"', '$$.datetime("DD Mon YYYY")')""") ===
      "\"2023-08-15\"")
    assert(str(s"""jsonb_path_query_first('"2023-08-15 5:30 PM"',
      '$$.datetime("YYYY-MM-DD HH:MI PM")')""".stripMargin.replace("\n", " ")) ===
      "\"2023-08-15T17:30:00\"")
    // comparisons: same kind, and date promotes against timestamp
    assert(str(s"""jsonb_path_query_array('["2023-08-15","2023-09-01"]',
      '$$[*] ? (@.datetime() > "2023-08-20".datetime())')""".stripMargin.replace("\n", " ")) === """["2023-09-01"]""")
    assert(str(s"""jsonb_path_query_array('["10:00:00","14:00:00"]',
      '$$[*] ? (@.datetime() < "12:00:00".datetime())')""".stripMargin.replace("\n", " ")) === """["10:00:00"]""")
    // the filter yields the ORIGINAL item, not the converted one
    assert(str(s"""jsonb_path_query_array('["2023-08-15 00:00:00","2023-08-16"]',
      '$$[*] ? (@.datetime() < "2023-08-15 12:00:00".datetime())')"""
      .stripMargin.replace("\n", " ")) === """["2023-08-15 00:00:00"]""")
    // an unparseable value inside a filter is unknown, not an error
    assert(str(s"""jsonb_path_query_array('["bad","2023-08-15"]',
      '$$[*] ? (@.datetime() > "2023-08-14".datetime())')"""
      .stripMargin.replace("\n", " ")) === """["2023-08-15"]""")
    // time vs date is unknown; datetime vs raw string is unknown
    assert(str(s"""jsonb_path_query_array('["10:00:00"]',
      '$$[*] ? (@.datetime() < "2023-08-15".datetime())')"""
      .stripMargin.replace("\n", " ")) === "[]")
    assert(str(s"""jsonb_path_query_array('["2023-08-15"]',
      '$$[*] ? (@.datetime() == "2023-08-15")')"""
      .stripMargin.replace("\n", " ")) === "[]")
    // tz-requiring comparisons are HARD errors — not filter-absorbed,
    // not silenced (pg 15 pinned)
    val e = intercept[Exception](str(s"""jsonb_path_query_array('["2023-08-15"]',
      '$$[*] ? (@.datetime() > "2023-08-14 00:00:00+02".datetime())')"""
      .stripMargin.replace("\n", " ")))
    assert(e.getMessage.contains("without time zone usage"))
    val e2 = intercept[Exception](str(s"""jsonb_path_query_array('["2023-08-15"]',
      '$$[*] ? (@.datetime() > "2023-08-14 00:00:00+02".datetime())', '{}', true)"""
      .stripMargin.replace("\n", " ")))
    assert(e2.getMessage.contains("without time zone usage"))
  }

  test("parse errors name the position; unsupported methods are loud") {
    val e1 = intercept[Exception](str(s"jsonb_path_exists('{}', '$$.')"))
    assert(e1.getMessage.contains("syntax error in jsonpath"))
    val e2 = intercept[Exception](str(s"jsonb_path_exists('{}', '$$.a.bogus()')"))
    assert(e2.getMessage.contains("unsupported jsonpath method"))
    // unknown variable errors (matches pg message shape) — even
    // inside a filter, and even with silent=true (pg 15 pinned)
    val e3 = intercept[Exception](
      str(s"jsonb_path_query_array($doc, '$$.a[*] ? (@ > $$nope)')"))
    assert(e3.getMessage.contains("could not find jsonpath variable"))
    val e4 = intercept[Exception](
      str(s"jsonb_path_exists($doc, '$$nope', '{}', true)"))
    assert(e4.getMessage.contains("could not find jsonpath variable"))
  }
}
