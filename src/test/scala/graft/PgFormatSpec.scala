package graft

import java.math.{BigDecimal => JBD}
import java.time.{ZoneId, ZonedDateTime}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PgFormat

/** Engine-level vectors for the pg template formatters. The numeric
  * block is PostgreSQL's own doc example table (Functions and
  * Operators §9.8, Table 9.31) — every row here is copied from that
  * public table, with the locale-dependent rows (G/D/L) restated for
  * the C locale this engine pins.
  */
class PgFormatSpec extends AnyFunSuite {

  private def toChar(v: Double, fmt: String): String =
    PgFormat.formatNum(PgFormat.compileNum(fmt), new JBD(v))
  private def toCharD(v: String, fmt: String): String =
    PgFormat.formatNum(PgFormat.compileNum(fmt), new JBD(v))

  test("doc table: plain digits and sign column") {
    assert(toChar(485, "999") === " 485")
    assert(toChar(-485, "999") === "-485")
    assert(toChar(485, "9 9 9") === " 4 8 5")
    assert(toChar(1485, "9,999") === " 1,485")
    assert(toChar(1485, "9G999") === " 1,485")
    assert(toChar(148.5, "999.999") === " 148.500")
    assert(toCharD("3148.5", "9G999D999") === " 3,148.500")
  }

  test("doc table: zero forcing and blank integer part") {
    assert(toCharD("-0.1", "99.99") === " -.10")
    assert(toCharD("-0.1", "FM9.99") === "-.1")
    assert(toCharD("-0.1", "FM90.99") === "-0.1")
    assert(toCharD("0.1", "0.9") === " 0.1")
    assert(toChar(12, "9990999.9") === "    0012.0")
    assert(toChar(12, "FM9990999.9") === "0012.")
    assert(toChar(148.5, "FM999.999") === "148.5")
    assert(toCharD("148.5", "FM999.990") === "148.500")
  }

  test("doc table: anchored signs") {
    assert(toChar(-485, "999S") === "485-")
    assert(toChar(-485, "999MI") === "485-")
    assert(toChar(485, "999MI") === "485 ")
    assert(toChar(485, "FM999MI") === "485")
    // PL adds to the default sign column, it does not replace it
    // (live pg 15: to_char(485,'PL999') = '+ 485')
    assert(toChar(485, "PL999") === "+ 485")
    assert(toChar(485, "SG999") === "+485")
    assert(toChar(-485, "SG999") === "-485")
    assert(toChar(-485, "9SG99") === "4-85")
    assert(toChar(-485, "999PR") === "<485>")
    assert(toChar(485, "999PR") === " 485 ")
  }

  test("doc table: currency, literals, ordinals") {
    assert(toChar(485, "L999") === "$ 485")
    assert(toChar(482, "999th") === " 482nd")
    assert(toChar(485, "\"Good number:\"999") === "Good number: 485")
    assert(toCharD("485.8", "\"Pre:\"999\" Post:\" .999") === "Pre: 485 Post: .800")
  }

  test("doc table: V, EEEE, RN") {
    assert(toChar(12, "99V999") === " 12000")
    assert(toCharD("12.4", "99V999") === " 12400")
    assert(toCharD("12.45", "99V9") === " 125")
    assert(toCharD("0.0004859", "9.99EEEE") === " 4.86e-04")
    assert(toChar(485, "RN") === "        CDLXXXV")
    assert(toChar(485, "FMRN") === "CDLXXXV")
    assert(toChar(5.2, "FMRN") === "V")
  }

  test("overflow fills digit positions with # (sign column stays)") {
    // live pg 15 pinned: the default sign column renders as space (or
    // '-'), NOT '#' — the docs' '####' example doesn't match pg 15
    assert(toChar(12345, "999") === " ###")
    assert(toChar(12345, "9,999") === " #####")
    assert(toChar(-12345, "999") === "-###")
    assert(toChar(12345, "S999") === "+###")
    assert(toChar(12345, "999MI") === "### ")
    assert(toChar(12345, "FM999") === "###")
    // a format with no digit positions renders literals only
    assert(toChar(123, "XXXX") === "XXXX")
    // any integer part overflows a zero-slot template (pg: ' .#')
    assert(toCharD("0.5", ".9") === " .#")
  }

  test("rounding is half-up away from zero") {
    assert(toChar(485.8, "999") === " 486")
    assert(toChar(0.5, "9") === " 1")
    assert(toChar(-0.5, "9") === "-1")
  }

  test("to_number doc vector and basics") {
    assert(PgFormat.parseNum(PgFormat.compileNum("99G999D9S"), "12,454.8-")
      .compareTo(new JBD("-12454.8")) === 0)
    assert(PgFormat.parseNum(PgFormat.compileNum("L9,999.99"), "$1,234.56")
      .compareTo(new JBD("1234.56")) === 0)
    assert(PgFormat.parseNum(PgFormat.compileNum("999PR"), "<485>")
      .compareTo(new JBD("-485")) === 0)
    assert(PgFormat.parseNum(PgFormat.compileNum("99V999"), "12400")
      .compareTo(new JBD("12.4")) === 0)
  }

  // ---- datetime ----

  private val zone = ZoneId.of("UTC")
  private val ts = ZonedDateTime.of(2026, 8, 12, 15, 4, 5, 123456000, zone) // Wednesday

  private def dt(fmt: String): String =
    PgFormat.formatDt(PgFormat.compileDt(fmt), ts, hasTz = true)

  test("datetime: numeric fields and padding") {
    assert(dt("YYYY-MM-DD HH24:MI:SS") === "2026-08-12 15:04:05")
    assert(dt("YYYY-MM-DD HH12:MI:SS AM") === "2026-08-12 03:04:05 PM")
    assert(dt("YY Y,YYY YYY Y") === "26 2,026 026 6")
    assert(dt("MS US") === "123 123456")
    assert(dt("DDD DD D ID") === "224 12 4 3")
    assert(dt("WW IW W Q CC") === "32 33 2 3 21")
    assert(dt("J") === "2461265")
    assert(dt("SSSS") === "54245")
  }

  test("datetime: names and casing") {
    assert(dt("MONTH") === "AUGUST   ")
    assert(dt("Month") === "August   ")
    assert(dt("month") === "august   ")
    assert(dt("FMMonth") === "August")
    assert(dt("Mon DY Day dy") === "Aug WED Wednesday wed")
    assert(dt("RM rm") === "VIII viii")
  }

  test("datetime: ordinals, quoted literals, FM one-shot prefix") {
    assert(dt("DDth \"of\" FMMonth") === "12th of August")
    assert(dt("HH12 A.M.") === "03 P.M.")
    assert(dt("\"Year: \"YYYY") === "Year: 2026")
    // live pg 15 pinned: FM modifies ONLY the next keyword — it is
    // not a toggle ('Month FMMonth Month' pads the third Month again)
    assert(dt("Month FMMonth Month") === "August    August August   ")
    assert(dt("FMDay, DD FMMonth YYYY") === "Wednesday, 12 August 2026")
  }

  test("datetime: timezone tokens on UTC") {
    assert(dt("TZH:TZM") === "+00:00")
    assert(dt("OF") === "+00")
  }

  test("interval rendering") {
    val n = PgFormat.compileDt("HH24:MI:SS")
    assert(PgFormat.formatInterval(n, 0, 0, (26 * 3600L + 61) * 1000000L) === "26:01:01")
    val ym = PgFormat.compileDt("YYYY-MM")
    assert(PgFormat.formatInterval(ym, 26, 0, 0L) === "0002-02")
  }

  test("to_timestamp parse side") {
    val z = ZoneId.of("UTC")
    def p(in: String, fmt: String): Long =
      PgFormat.parseDt(PgFormat.compileDt(fmt), in, z)
    val base = ZonedDateTime.of(2026, 8, 12, 15, 4, 5, 0, z).toInstant
    assert(p("2026-08-12 15:04:05", "YYYY-MM-DD HH24:MI:SS") ===
      base.getEpochSecond * 1000000L)
    assert(p("12 Aug 2026", "DD Mon YYYY") ===
      ZonedDateTime.of(2026, 8, 12, 0, 0, 0, 0, z).toInstant.getEpochSecond * 1000000L)
    assert(p("2026-08-12 03:04:05 PM", "YYYY-MM-DD HH12:MI:SS AM") ===
      base.getEpochSecond * 1000000L)
    // pg doc's own gotcha example: to_timestamp('2000    JUN','YYYY MON')
    assert(p("2000    JUN", "YYYY MON") ===
      ZonedDateTime.of(2000, 6, 1, 0, 0, 0, 0, z).toInstant.getEpochSecond * 1000000L)
  }

  test("numeric fast paths agree with the BigDecimal path") {
    val rnd = new scala.util.Random(8)
    val fmts = Seq("FM9999990.00", "FM9,999,999", "SG9", "FM00000", "9999990.99",
      "999G999D99", "S999999.999", "0000.0", "99999999")
    for (_ <- 1 to 4000) {
      val f = PgFormat.compileNum(fmts(rnd.nextInt(fmts.length)))
      val l = rnd.nextLong() % 10000000L
      assert(PgFormat.formatNumLong(f, l) === PgFormat.formatNum(f, JBD.valueOf(l)))
      val d = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(8))
      assert(PgFormat.formatNumDouble(f, d) === PgFormat.formatNum(f, JBD.valueOf(d)),
        s"double $d")
    }
    // exact-representation edges
    for (d <- Seq(0.0, -0.0, 0.5, -0.5, 2.675, 849.995, 1e7, 1e-4, 123456.785)) {
      val f = PgFormat.compileNum("FM9999990.00")
      assert(PgFormat.formatNumDouble(f, d) === PgFormat.formatNum(f, JBD.valueOf(d)), s"edge $d")
    }
  }

  test("DtF arithmetic fields agree with java.time across eras") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 4000) {
      // epoch days from year ~ -2000 to ~ 4000
      val day = rnd.nextLong() % 730000L
      val micro = math.abs(rnd.nextLong()) % 86400000000L
      val f = new PgFormat.DtF(day, micro, 0, zone)
      val zdt = java.time.Instant.ofEpochSecond(day * 86400L + micro / 1000000L,
        (micro % 1000000L) * 1000L).atZone(zone)
      assert(f.year === zdt.getYear, s"year day=$day")
      assert(f.month === zdt.getMonthValue, s"month day=$day")
      assert(f.day === zdt.getDayOfMonth, s"dom day=$day")
      assert(f.hour === zdt.getHour); assert(f.minute === zdt.getMinute)
      assert(f.second === zdt.getSecond); assert(f.micro === zdt.getNano / 1000)
      assert(f.dowIso === zdt.getDayOfWeek.getValue, s"dow day=$day")
      assert(f.dayOfYear === zdt.getDayOfYear, s"doy day=$day")
      assert(f.isoYear === zdt.toLocalDate.get(java.time.temporal.IsoFields.WEEK_BASED_YEAR),
        s"isoYear day=$day")
      assert(f.isoWeek === zdt.toLocalDate.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR),
        s"isoWeek day=$day")
      assert(f.julianDay === zdt.toLocalDate.getLong(java.time.temporal.JulianFields.JULIAN_DAY))
      assert(PgFormat.DtF.daysFromCivil(f.year, f.month, f.day) === day, s"roundtrip day=$day")
    }
  }
}
