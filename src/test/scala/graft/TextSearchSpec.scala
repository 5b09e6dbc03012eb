package graft

import org.scalatest.BeforeAndAfterAll
import graft.functions.TextSearch
import graft.pgwire.PgServer

/** Text-search engine internals + wire surface (semantic pins live in
  * PgParitySpec sweep-14, stemmer/doc-scale differentials in
  * TsStemDiff/TsDocDiff — all frozen live-pg outputs; this spec
  * covers the pure core and the server-path plumbing).
  */
class TextSearchSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: PgServer = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.pgwire.PgFunctions.registerAll(spark)
    server = new PgServer(spark)
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    super.afterAll()
  }

  // ---- pure core ----------------------------------------------------------

  test("stemmer: porter2 spec exemplars") {
    val cases = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "tie",
      "cries" -> "cri", "generalizations" -> "general", "communication" -> "communic",
      "arsenic" -> "arsenic", "hopping" -> "hop", "tanned" -> "tan",
      "falling" -> "fall", "dying" -> "die", "news" -> "news",
      "conditional" -> "condit", "rational" -> "ration", "electricity" -> "electr",
      "happy" -> "happi", "skies" -> "sky")
    for ((w, s) <- cases) assert(TextSearch.stem(w) === s, w)
  }

  test("tokenizer: positions, compounds, protocol skip") {
    val v = TextSearch.toTsVector("english", "See https://a.io/x and foo-bar!")
    assert(v.render === "'/x':4 'a.io':3 'a.io/x':2 'bar':8 'foo':7 'foo-bar':6 'see':1")
  }

  test("tsquery parse/render round-trips with precedence") {
    def rt(s: String): String =
      TextSearch.parseTsQuery("simple", s, lexize = false)
        .map(TextSearch.renderTsQuery).getOrElse("")
    assert(rt("a & b | c") === "'a' & 'b' | 'c'")
    assert(rt("a & (b | c)") === "'a' & ( 'b' | 'c' )")
    assert(rt("!a & b") === "!'a' & 'b'")
    assert(rt("a <-> b <2> c") === "'a' <-> 'b' <2> 'c'")
    assert(rt("pre:* & w:AB") === "'pre':* & 'w':AB")
  }

  test("match: weights, prefix, phrase distance") {
    import TextSearch._
    def m(v: String, q: String): Boolean =
      tsMatch(parseTsVector(v), parseTsQuery("simple", q, lexize = false).get)
    assert(m("'cat':3A 'fat':2", "cat:A"))
    assert(!m("'cat':3A 'fat':2", "cat:B"))
    assert(m("'catalog':1", "cat:*"))
    assert(!m("'catalog':1", "cat"))
    assert(m("'a':1 'b':3", "a <2> b"))
    assert(!m("'a':1 'b':3", "a <-> b"))
    // chained phrase: all three in sequence
    assert(m("'x':1 'y':2 'z':3", "x <-> y <-> z"))
    assert(!m("'x':1 'y':2 'z':5", "x <-> y <-> z"))
  }

  // ---- wire ---------------------------------------------------------------

  private def connect(): Client = {
    val c = new Client(server.boundPort)
    c.startup()
    c
  }

  test("wire: ts values carry OIDs 3614/3615; full pipeline renders") {
    val c = connect()
    val r = c.query("SELECT to_tsvector('english', 'fat cats ate rats') AS v, " +
      "plainto_tsquery('english', 'fat rats') AS q, " +
      "to_tsvector('english', 'fat cats ate rats') @@ plainto_tsquery('english', 'fat rats') AS m")
    assert(r.fields.map(f => (f._1, f._2)) === Seq(("v", 3614), ("q", 3615), ("m", 16)))
    assert(r.rows === Seq(Seq(Some("'ate':3 'cat':2 'fat':1 'rat':4"),
      Some("'fat' & 'rat'"), Some("t"))))
    c.close()
  }

  test("wire: text @@ tsquery converts the raw side like pg") {
    val c = connect()
    val r = c.query("SELECT x, to_tsquery('english', 'hashes') @@ x AS m " +
      "FROM (VALUES ('hash join plan'), ('merge sort')) t(x) ORDER BY x")
    assert(r.rows.map(_.map(_.get)) ===
      Seq(Seq("hash join plan", "t"), Seq("merge sort", "f")))
    c.close()
  }

  test("wire: casts, catalog rows, and \\df visibility") {
    val c = connect()
    val r = c.query("SELECT 'b:3 a:1,2'::tsvector AS v, 'x & !y'::tsquery AS q, " +
      "numnode('a & b | c'::tsquery) AS n, querytree('!a & b'::tsquery) AS t")
    assert(r.rows === Seq(Seq(Some("'a':1,2 'b':3"), Some("'x' & !'y'"),
      Some("5"), Some("'b'"))))
    val tt = c.query(
      "SELECT typname, oid FROM pg_type WHERE typname IN ('tsvector','tsquery') ORDER BY oid")
    assert(tt.rows.map(_.map(_.get)) === Seq(Seq("tsvector", "3614"), Seq("tsquery", "3615")))
    c.close()
  }
}
