package graft

import org.scalatest.BeforeAndAfterAll
import graft.functions.Geo
import graft.functions.Geo._
import graft.pgwire.{PgServer, PgType}

/** The geo surface (SURVEY §2a#9 — the reference feature-gates the
  * same encoder in arrow-pg/src/geo_encoder.rs:92-162): WKT/EWKT
  * parse+render, EWKB bytes (pinned against the well-known-binary
  * spec by hand-computed fixtures), measures/predicates, the ST_* SQL
  * surface, and the hex-EWKB wire rendering with the GEOMETRY OID.
  */
class GeoSpec extends SparkSpec with BeforeAndAfterAll {

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

  // ---- WKT parse/render ---------------------------------------------------

  private val roundtrips = Seq(
    "POINT(1 2)",
    "POINT(-1.5 2.25)",
    "POINT EMPTY",
    "LINESTRING(0 0,1 1,2 0)",
    "LINESTRING EMPTY",
    "POLYGON((0 0,10 0,10 10,0 10,0 0))",
    "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))",
    "POLYGON EMPTY",
    "MULTIPOINT((1 2),(3 4))",
    "MULTIPOINT EMPTY",
    "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 0)),((5 5,6 5,6 6,5 5)))",
    "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))",
    "GEOMETRYCOLLECTION EMPTY")

  test("WKT parse → render roundtrips every geometry type") {
    roundtrips.foreach { w => assert(renderWkt(parseWkt(w)) === w, w) }
  }

  test("WKT syntax variants normalize (case, spacing, bare multipoint)") {
    assert(renderWkt(parseWkt("point ( 1  2 )")) === "POINT(1 2)")
    assert(renderWkt(parseWkt("MULTIPOINT(1 2, 3 4)")) === "MULTIPOINT((1 2),(3 4))")
    assert(renderWkt(parseWkt("LineString(0 0, 1.50 2.0)")) === "LINESTRING(0 0,1.5 2)")
  }

  test("EWKT SRID prefix parses and renders; plain WKT omits it") {
    val g = parseWkt("SRID=4326;POINT(1 2)")
    assert(g.srid === 4326)
    assert(renderEwkt(g) === "SRID=4326;POINT(1 2)")
    assert(renderWkt(g) === "POINT(1 2)")
  }

  test("Z/M geometries are rejected loudly (2D scope)") {
    intercept[IllegalArgumentException](parseWkt("POINT Z (1 2 3)"))
    intercept[IllegalArgumentException](parseWkt("POINTZ(1 2 3)"))
    intercept[IllegalArgumentException](parseWkt("LINESTRING(0 0 0,1 1 1)"))
    intercept[IllegalArgumentException](parseWkt("POINT M (1 2 3)"))
  }

  test("malformed WKT errors") {
    intercept[IllegalArgumentException](parseWkt("POINT(1)"))
    intercept[IllegalArgumentException](parseWkt("BLOB(1 2)"))
    intercept[IllegalArgumentException](parseWkt("POINT(1 2") )
    intercept[IllegalArgumentException](parseWkt("POINT(1 2) extra"))
  }

  // ---- EWKB ---------------------------------------------------------------

  test("EWKB bytes pinned: POINT(1 2) (WKB spec little-endian layout)") {
    assert(bytesToHex(toEwkb(parseWkt("POINT(1 2)"))) ===
      "0101000000000000000000F03F0000000000000040")
  }

  test("EWKB bytes pinned: SRID=4326;POINT(1 2) carries the 0x20 flag + srid") {
    assert(bytesToHex(toEwkb(parseWkt("SRID=4326;POINT(1 2)"))) ===
      "0101000020E6100000000000000000F03F0000000000000040")
  }

  test("EWKB roundtrips every type, with and without SRID") {
    roundtrips.foreach { w =>
      val g = parseWkt(w)
      assert(renderWkt(fromEwkb(toEwkb(g))) === w, w)
      val s = g.withSrid(3857)
      val back = fromEwkb(toEwkb(s))
      assert(back.srid === 3857, w)
      assert(renderWkt(back) === w, w)
    }
  }

  test("big-endian WKB parses (byte order 00)") {
    // POINT(1 2) big-endian: 00 00000001 3FF0000000000000 4000000000000000
    val hex = "00000000013FF00000000000004000000000000000"
    assert(renderWkt(fromEwkb(hexToBytes(hex))) === "POINT(1 2)")
  }

  test("POINT EMPTY serializes as NaN coordinates (PostGIS convention)") {
    val b = toEwkb(parseWkt("POINT EMPTY"))
    assert(renderWkt(fromEwkb(b)) === "POINT EMPTY")
  }

  test("truncated / Z-flagged / unknown-type WKB rejected") {
    intercept[IllegalArgumentException](fromEwkb(Array[Byte](1, 1, 0)))
    // Z flag 0x80000000 over point
    intercept[IllegalArgumentException](
      fromEwkb(hexToBytes("0101000080" + "0" * 48)))
    // ISO WKB Z type 1001
    intercept[IllegalArgumentException](
      fromEwkb(hexToBytes("01E9030000" + "0" * 48)))
    intercept[IllegalArgumentException](
      fromEwkb(hexToBytes("0163000000")))
  }

  test("parseAny accepts WKT, EWKT and hex EWKB") {
    val hex = "0101000000000000000000F03F0000000000000040"
    assert(renderWkt(parseAny(hex)) === "POINT(1 2)")
    assert(renderWkt(parseAny("POINT(1 2)")) === "POINT(1 2)")
    assert(parseAny("SRID=32633;POINT(1 2)").srid === 32633)
  }

  // ---- measures / predicates ---------------------------------------------

  test("length / perimeter / area follow pg dimension rules") {
    val line = parseWkt("LINESTRING(0 0,3 4)")
    assert(length(line) === 5.0)
    assert(area(line) === 0.0)
    val sq = parseWkt("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    assert(area(sq) === 100.0)
    assert(perimeter(sq) === 40.0)
    assert(length(sq) === 0.0) // pg: ST_Length of areal type is 0
    val holed = parseWkt("POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))")
    assert(area(holed) === 96.0)
    assert(perimeter(holed) === 48.0)
  }

  test("distance: vertices, segment interiors, polygon containment") {
    val a = parseWkt("POINT(0 0)")
    assert(distance(a, parseWkt("POINT(3 4)")) === 5.0)
    // closest approach is the segment's interior, not a vertex
    assert(distance(parseWkt("POINT(5 5)"), parseWkt("LINESTRING(0 0,10 0)")) === 5.0)
    // point inside polygon → 0
    assert(distance(parseWkt("POINT(5 5)"),
      parseWkt("POLYGON((0 0,10 0,10 10,0 10,0 0))")) === 0.0)
    // crossing segments → 0
    assert(distance(parseWkt("LINESTRING(0 0,10 10)"),
      parseWkt("LINESTRING(0 10,10 0)")) === 0.0)
    // disjoint polygons: edge-to-edge
    assert(distance(parseWkt("POLYGON((0 0,1 0,1 1,0 1,0 0))"),
      parseWkt("POLYGON((3 0,4 0,4 1,3 1,3 0))")) === 2.0)
  }

  test("contains / intersects / centroid / envelope") {
    val sq = parseWkt("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    assert(Geo.contains(sq, parseWkt("POINT(5 5)")))
    assert(!Geo.contains(sq, parseWkt("POINT(15 5)")))
    assert(!Geo.contains(sq, parseWkt("POINT(0 5)"))) // boundary: NOT contained
    val holed = parseWkt("POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))")
    assert(!Geo.contains(holed, parseWkt("POINT(3 3)"))) // in the hole
    assert(intersects(sq, parseWkt("POINT(0 5)"))) // boundary DOES intersect
    assert(!intersects(sq, parseWkt("POINT(11 5)")))
    assert(renderWkt(centroid(sq)) === "POINT(5 5)")
    assert(renderWkt(centroid(parseWkt("LINESTRING(0 0,10 0)"))) === "POINT(5 0)")
    assert(renderWkt(centroid(parseWkt("MULTIPOINT((0 0),(2 0),(2 2),(0 2))"))) === "POINT(1 1)")
    assert(renderWkt(envelope(parseWkt("LINESTRING(0 0,10 5)"))) ===
      "POLYGON((0 0,10 0,10 5,0 5,0 0))")
    assert(renderWkt(envelope(parseWkt("POINT(3 4)"))) === "POINT(3 4)")
    assert(renderWkt(envelope(parseWkt("LINESTRING(0 3,0 9)"))) === "LINESTRING(0 3,0 9)")
  }

  test("polygon centroid honors holes") {
    // hole at the right side pulls the centroid left of center
    val g = parseWkt("POLYGON((0 0,10 0,10 10,0 10,0 0),(6 4,8 4,8 6,6 6,6 4))")
    val c = centroid(g).coord.get
    assert(c._1 < 5.0)
    assert(math.abs(c._2 - 5.0) < 1e-12)
  }

  // ---- SQL surface --------------------------------------------------------

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").collect().head.get(0)

  test("ST_* SQL: constructors, accessors, measures") {
    assert(one("st_astext(st_geomfromtext('POINT(1 2)'))") === "POINT(1 2)")
    assert(one("st_x(st_makepoint(3.5D, 4.5D))") === 3.5)
    assert(one("st_y(st_point(3.5D, 4.5D))") === 4.5)
    assert(one("st_srid(st_setsrid(st_makepoint(1D, 2D), 4326))") === 4326)
    assert(one("st_asewkt(st_setsrid(st_makepoint(1D, 2D), 4326))") === "SRID=4326;POINT(1 2)")
    assert(one("st_npoints(st_geomfromtext('LINESTRING(0 0,1 1,2 0)'))") === 3)
    assert(one("st_geometrytype(st_geomfromtext('LINESTRING(0 0,1 1)'))") === "ST_LineString")
    assert(one("geometrytype(st_geomfromtext('POINT(0 0)'))") === "POINT")
    assert(one("st_length(st_geomfromtext('LINESTRING(0 0,3 4)'))") === 5.0)
    assert(one("st_area(st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))'))") === 100.0)
    assert(one("st_distance(st_makepoint(0D,0D), st_makepoint(3D,4D))") === 5.0)
    assert(one("st_dwithin(st_makepoint(0D,0D), st_makepoint(3D,4D), 5.0D)") === true)
    assert(one("st_contains(st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))'), st_makepoint(5D,5D))") === true)
    assert(one("st_within(st_makepoint(5D,5D), st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))'))") === true)
    assert(one("st_astext(st_centroid(st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))')))") === "POINT(5 5)")
    assert(one("st_astext(st_envelope(st_geomfromtext('LINESTRING(0 0,10 5)')))") ===
      "POLYGON((0 0,10 0,10 5,0 5,0 0))")
    assert(one("st_astext(st_makeline(st_makepoint(0D,0D), st_makepoint(1D,1D)))") ===
      "LINESTRING(0 0,1 1)")
    assert(one("st_astext(st_makeenvelope(0D, 0D, 2D, 3D, 4326))") ===
      "POLYGON((0 0,2 0,2 3,0 3,0 0))")
    assert(one("st_isempty(st_geomfromtext('POINT EMPTY'))") === true)
    // binary output: WKB has no SRID, EWKB keeps it
    assert(one("length(st_asbinary(st_setsrid(st_makepoint(1D,2D), 4326)))") === 21)
    assert(one("length(st_asewkb(st_setsrid(st_makepoint(1D,2D), 4326)))") === 25)
  }

  test("NULL propagation across the pack") {
    assert(one("st_astext(CAST(NULL AS BINARY))") === null)
    assert(one("st_distance(CAST(NULL AS BINARY), st_makepoint(0D,0D))") === null)
    assert(one("st_x(st_geomfromtext('POINT EMPTY'))") === null)
  }

  // ---- wire ---------------------------------------------------------------

  private def connect(): Client = {
    val c = new Client(server.boundPort)
    c.startup()
    c
  }

  test("wire: geometry renders as hex EWKB with the GEOMETRY oid") {
    val c = connect()
    val r = c.query("SELECT st_setsrid(st_makepoint(1, 2), 4326) AS geom")
    assert(r.fields === Seq(("geom", PgType.GEOMETRY)))
    assert(r.rows === Seq(Seq(Some(
      "0101000020E6100000000000000000F03F0000000000000040"))))
    c.close()
  }

  test("wire: ::geometry cast accepts WKT, EWKT and hex EWKB") {
    val c = connect()
    val r = c.query("SELECT st_astext('POINT(1 2)'::geometry) AS a, " +
      "st_srid('SRID=4326;POINT(1 2)'::geometry) AS b, " +
      "st_astext('0101000000000000000000F03F0000000000000040'::geometry) AS c")
    assert(r.rows === Seq(Seq(Some("POINT(1 2)"), Some("4326"), Some("POINT(1 2)"))))
    c.close()
  }

  test("wire: 2-arg st_geomfromtext(wkt, srid) call shape pads") {
    val c = connect()
    val r = c.query("SELECT st_srid(st_geomfromtext('POINT(0 0)', 32633)) AS s")
    assert(r.rows === Seq(Seq(Some("32633"))))
    c.close()
  }

  test("wire: geometry type visible in pg_type; st functions in pg_proc") {
    val c = connect()
    val t = c.query(s"SELECT typname FROM pg_type WHERE oid = ${PgType.GEOMETRY}")
    assert(t.rows === Seq(Seq(Some("geometry"))))
    val p = c.query("SELECT count(*) FROM pg_proc WHERE proname LIKE 'st_%'")
    assert(p.rows.head.head.get.toInt >= 30)
    c.close()
  }

  test("wire: binary result format carries raw EWKB bytes") {
    val c = connect()
    c.parse("s1", "SELECT st_setsrid(st_makepoint(1, 2), 4326)")
    c.bind("p1", "s1", Nil, Seq(1.toShort))
    c.describe('P', "p1")
    c.execute("p1")
    val r = c.sync()
    assert(r.binRows.nonEmpty)
    assert(Geo.bytesToHex(r.binRows.head.head.get) ===
      "0101000020E6100000000000000000F03F0000000000000040")
    c.close()
  }
}
