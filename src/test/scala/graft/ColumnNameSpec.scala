package graft

import graft.pgwire.{Compat, Handlers}

/** pg implicit result-column names (parse_target.c FigureColname),
  * live-pinned against pg 15 (sweep-33): the Compat rewrite injects
  * pg-computed aliases into the outermost select list so
  * RowDescription matches pg instead of Spark's pretty-expression
  * names (`lower(ABC)`, `(a + b)`).
  */
class ColumnNameSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.pgwire.PgFunctions.registerAll(spark)
    spark.sql("SELECT 1 AS a, 'x' AS b").createOrReplaceTempView("nm")
  }

  private def names(sql: String): Seq[String] =
    Handlers.runSql(spark, sql).schema.fieldNames.toSeq

  private def name(sql: String): String = names(sql).head

  test("operators, literals and IS tests name ?column? (live pin)") {
    assert(name("SELECT 1+1") === "?column?")
    assert(name("SELECT 'x'") === "?column?")
    assert(name("SELECT NOT true") === "?column?")
    assert(name("SELECT a IS NULL FROM nm") === "?column?")
    assert(name("SELECT (a) IS NULL FROM nm") === "?column?")
    assert(name("SELECT -a FROM nm") === "?column?")
    assert(name("SELECT 1::int4 + 2") === "?column?")
    assert(name("SELECT b || 'y' FROM nm") === "?column?")
  }

  test("function calls name after the function (live pin)") {
    assert(name("SELECT lower('A')") === "lower")
    assert(name("SELECT count(*) FROM nm") === "count")
    assert(name("SELECT COALESCE(1,2)") === "coalesce")
    assert(name("SELECT greatest(1,2)") === "greatest")
    assert(name("SELECT nullif(1,2)") === "nullif")
    assert(name("SELECT row_number() OVER (ORDER BY a) FROM nm") === "row_number")
    assert(name("SELECT sum(a) FILTER (WHERE true) FROM nm") === "sum")
    assert(name("SELECT EXISTS(SELECT 1)") === "exists")
    // session-bound sequence substitutions display under pg names
    assert(Compat.rewriteTop("SELECT pg_nextval('s', 1)", Set.empty)
      .contains("AS `nextval`"))
    // special-form spellings keep pg's internal names
    assert(name("SELECT trim('  x ')") === "btrim")
    assert(name("SELECT trim(LEADING ' ' FROM ' x')") === "ltrim")
    assert(name("SELECT substring('abc' from 1 for 2)") === "substring")
    assert(name("SELECT position('a' in 'abc')") === "position")
    assert(name("SELECT extract(year from date '2020-01-01')") === "extract")
  }

  test("casts: argument name wins, else the resolved type (live pin)") {
    assert(name("SELECT 1::int") === "int4")
    assert(name("SELECT a::text FROM nm") === "a")
    assert(name("SELECT (a+1)::text FROM nm") === "text")
    assert(name("SELECT a::numeric(10,2) FROM nm") === "a")
    assert(name("SELECT CAST(a AS text) FROM nm") === "a")
    assert(name("SELECT CAST(1+1 AS bigint)") === "int8")
  }

  test("strength and edges: nested casts, literals, subscripts (live pin)") {
    // a weak (type-derived) inner name does not survive an outer cast
    assert(name("SELECT 'x'::text::varchar") === "varchar")
    // keyword literals are not refs
    assert(name("SELECT NULL") === "?column?")
    assert(name("SELECT true") === "?column?")
    // subscripts are transparent
    assert(name("SELECT (ARRAY[1,2])[1]") === "array")
    // WITHIN GROUP's GROUP is not the clause boundary
    assert(name("SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY a) FROM nm")
      === "percentile_cont")
    // regexp_match (pg 10 scalar first-match form) exists and names
    assert(name("SELECT regexp_match('abc', 'b')") === "regexp_match")
  }

  test("constructs: case/array/row/subquery/typed literals (live pin)") {
    assert(name("SELECT CASE WHEN true THEN 1 END") === "case")
    assert(name("SELECT CASE WHEN false THEN 1 ELSE a END FROM nm") === "a")
    assert(name("SELECT ARRAY[1,2]") === "array")
    assert(name("SELECT (SELECT 1 AS zz)") === "zz")
    assert(name("SELECT (SELECT lower('A'))") === "lower")
    assert(name("SELECT DATE '2020-01-01'") === "date")
    assert(name("SELECT timestamp '2020-01-01'") === "timestamp")
  }

  test("refs, aliases and folding (live pin)") {
    assert(name("SELECT nm.a FROM nm") === "a")
    assert(name("SELECT ((a)) FROM nm") === "a")
    assert(name("SELECT a b FROM nm") === "b")
    // pg folds unquoted aliases; quoted keep case
    assert(name("SELECT 1 AS FooBar") === "foobar")
    assert(name("SELECT 1 AS \"FooBar\"") === "FooBar")
    // `x IS DISTINCT FROM y` keeps its FROM inside the item
    assert(names("SELECT a IS DISTINCT FROM 2, a FROM nm") ===
      Seq("?column?", "a"))
    // only the first set-op branch is named
    assert(name("SELECT 1+1 UNION ALL SELECT 2+2") === "?column?")
    // WITH: names derive from the terminal select list
    assert(name("WITH c AS (SELECT 1 AS x) SELECT lower('A') FROM c") ===
      "lower")
  }

  test("raw rewrite keeps semantics: injected aliases parse") {
    val sql = Compat.rewriteTop(
      "SELECT 1+1, lower('A'), a, CASE WHEN true THEN 1 END FROM nm",
      Set.empty)
    assert(sql.contains("?column?"))
    assert(spark.sql(sql).collect().length === 1)
    // fragment-level rewrite stays alias-free (CompatSpec's pins)
    assert(!Compat.rewrite("SELECT 1+1").contains("?column?"))
  }
}
