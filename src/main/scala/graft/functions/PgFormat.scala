package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneId, ZoneOffset, ZonedDateTime}
import java.time.temporal.JulianFields

/** PostgreSQL `to_char` / `to_number` / `to_timestamp` template engines.
  *
  * The reference tracks these in its hand-maintained roadmap
  * (datafusion-pg-functions/functions.md: Data Type Formatting, all P2
  * "planned" — src/format.rs:13 is an empty register stub), so the
  * behavior here is implemented from the public PostgreSQL docs
  * (Functions and Operators §9.8, Tables 9.26–9.31) and pinned by the
  * doc's own example table in PgFormatSpec. Pure JVM string work, no
  * Spark types — the Catalyst wrappers live in
  * [[PgFormatExpressions]].
  *
  * Deviations (documented):
  *  - locale-dependent tokens use the C/ASCII locale: `G`=',' `D`='.'
  *    `L`='$', day/month names in English (pg's lc_numeric/lc_time
  *    default build behavior).
  *  - `TM` (translation mode) and `FX` are accepted and ignored.
  */
object PgFormat {

  // ======================================================================
  // datetime templates (pg Table 9.26/9.27)
  // ======================================================================

  sealed trait DtNode
  final case class DtLit(s: String) extends DtNode
  /** key is the canonical UPPER token; raw preserves the template's
    * capitalization (drives name casing); th: 0 none / 1 "th" / 2 "TH";
    * fm = fill mode active at this token. */
  final case class DtTok(key: String, raw: String, th: Int, fm: Boolean) extends DtNode

  /** Longest-match-first token table. `Y,YYY` must precede `Y`. */
  private val dtKeys: Seq[String] = Seq(
    "HH24", "HH12", "HH", "MI", "SSSSS", "SSSS", "SS", "MS", "US",
    "FF1", "FF2", "FF3", "FF4", "FF5", "FF6",
    "A.M.", "P.M.", "AM", "PM", "B.C.", "A.D.", "BC", "AD",
    "Y,YYY", "IYYY", "IYY", "IY", "YYYY", "YYY", "YY", "Y",
    "MONTH", "MON", "MM", "DAY", "DY", "IDDD", "DDD", "DD", "ID", "D",
    "IW", "WW", "W", "CC", "J", "Q", "RM", "TZH", "TZM", "TZ", "OF", "I")

  def compileDt(fmt: String): Vector[DtNode] = {
    val out = Vector.newBuilder[DtNode]
    var i = 0
    var fm = false
    val n = fmt.length
    while (i < n) {
      val c = fmt.charAt(i)
      if (c == '"') { // quoted literal, "" escapes nothing in pg (ends)
        val end = fmt.indexOf('"', i + 1)
        val stop = if (end < 0) n else end
        out += DtLit(fmt.substring(i + 1, stop))
        i = if (end < 0) n else end + 1
      } else if (c == '\\' && i + 1 < n) {
        out += DtLit(fmt.substring(i + 1, i + 2)); i += 2
      } else {
        val up = fmt.substring(i, math.min(n, i + 5)).toUpperCase
        // FM is a one-shot prefix: it modifies ONLY the next keyword
        // (pg 15 pinned: 'Month FMMonth Month' pads the third Month)
        if (up.startsWith("FM")) { fm = true; i += 2 }
        else if (up.startsWith("FX") || up.startsWith("TM")) { i += 2 }
        else {
          dtKeys.find(k => up.startsWith(k)) match {
            case Some(k) =>
              val raw = fmt.substring(i, i + k.length)
              i += k.length
              var th = 0
              if (i + 1 < n + 1 && fmt.regionMatches(true, i, "TH", 0, 2) && i + 2 <= n) {
                th = if (fmt.charAt(i) == 'T' && fmt.charAt(i + 1) == 'H') 2 else 1
                i += 2
              }
              out += DtTok(k, raw, th, fm)
              fm = false
            case None =>
              out += DtLit(c.toString); i += 1
          }
        }
      }
    }
    // merge adjacent literals
    out.result().foldLeft(Vector.empty[DtNode]) {
      case (acc :+ DtLit(a), DtLit(b)) => acc :+ DtLit(a + b)
      case (acc, x) => acc :+ x
    }
  }

  private val monthsU = Array("JANUARY", "FEBRUARY", "MARCH", "APRIL", "MAY", "JUNE",
    "JULY", "AUGUST", "SEPTEMBER", "OCTOBER", "NOVEMBER", "DECEMBER")
  private val daysU = Array("SUNDAY", "MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY",
    "FRIDAY", "SATURDAY")
  private val romanM = Array("I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX",
    "X", "XI", "XII")

  /** pg name casing: ALLCAPS template → upper, Capitalized → title,
    * lower → lower. Decided by the first two template chars. */
  private def caseName(raw: String, name: String): String = {
    val letters = raw.filter(_.isLetter)
    val c0 = if (letters.nonEmpty) letters.charAt(0) else 'A'
    if (Character.isUpperCase(c0)) {
      if (letters.length > 1 && Character.isUpperCase(letters.charAt(1))) name.toUpperCase
      else name.charAt(0).toUpper + name.substring(1).toLowerCase
    } else name.toLowerCase
  }

  private def ordinal(v: Long, upper: Boolean): String = {
    val s =
      if (v < 0) "th"
      else (v % 100) match {
        case 11 | 12 | 13 => "th"
        case _ => (v % 10) match {
          case 1 => "st"; case 2 => "nd"; case 3 => "rd"; case _ => "th"
        }
      }
    if (upper) s.toUpperCase else s
  }

  private def num(v: Long, width: Int, fm: Boolean, th: Int): String = {
    val base =
      if (fm) v.toString
      else {
        val s = math.abs(v).toString
        val sign = if (v < 0) "-" else ""
        sign + ("0" * math.max(0, width - s.length)) + s
      }
    base + (if (th == 0) "" else ordinal(v, th == 2))
  }

  /** Per-row datetime fields computed with pure integer arithmetic —
    * the to_char hot path constructs one of these instead of a
    * ZonedDateTime (round-7 verdict: the per-row java.time allocation
    * made the to_char pack the slowest surface in the engine). Civil
    * date from epoch day uses Howard Hinnant's public-domain
    * days-from-civil inverse (chrono-compatible low-level date
    * algorithms); ISO week fields are derived lazily since most
    * templates never ask for them. */
  final class DtF(val epochDay: Long, val microOfDay: Long,
      val offsetSec: Int, val zone: ZoneId) {
    // civil-from-days
    private val z0 = epochDay + 719468L
    private val era = Math.floorDiv(z0, 146097L)
    private val doe = (z0 - era * 146097L).toInt // [0, 146096]
    private val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    private val doyM = doe - (365 * yoe + yoe / 4 - yoe / 100) // March-based
    private val mp = (5 * doyM + 2) / 153
    val day: Int = doyM - (153 * mp + 2) / 5 + 1
    val month: Int = if (mp < 10) mp + 3 else mp - 9
    val year: Int = (yoe + era * 400).toInt + (if (month <= 2) 1 else 0)
    val hour: Int = (microOfDay / 3600000000L).toInt
    val minute: Int = (microOfDay / 60000000L % 60).toInt
    val second: Int = (microOfDay / 1000000L % 60).toInt
    val micro: Int = (microOfDay % 1000000L).toInt
    /** ISO day of week, 1=Mon..7=Sun (1970-01-01 was a Thursday). */
    val dowIso: Int = Math.floorMod(epochDay + 3, 7).toInt + 1
    def isLeap: Boolean = (year % 4 == 0 && year % 100 != 0) || year % 400 == 0
    def dayOfYear: Int =
      DtF.cumDays(month - 1) + day + (if (month > 2 && isLeap) 1 else 0)
    def julianDay: Long = epochDay + 2440588L
    def secondOfDay: Int = (microOfDay / 1000000L).toInt
    // ISO week-date (computed on demand; q100-style templates use ID/WW
    // which do NOT need these)
    private def isoP(y: Int): Int = {
      val yy = Math.floorMod(y, 400) // same leap pattern every 400y, keeps math in Int
      Math.floorMod(yy + yy / 4 - yy / 100 + yy / 400, 7)
    }
    private def weeksIn(y: Int): Int = if (isoP(y) == 4 || isoP(y - 1) == 3) 53 else 52
    lazy val (isoYear: Int, isoWeek: Int) = {
      val w = (dayOfYear - dowIso + 10) / 7
      if (w < 1) (year - 1, weeksIn(year - 1))
      else if (w > weeksIn(year)) (year + 1, 1)
      else (year, w)
    }
    def instantMicros: Long = epochDay * 86400000000L + microOfDay - offsetSec * 1000000L
  }

  object DtF {
    private[PgFormat] val cumDays = Array(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)
    def fromEpochDay(day: Long): DtF = new DtF(day, 0L, 0, ZoneOffset.UTC)
    /** `localMicros` is already shifted into the display zone. */
    def fromLocalMicros(localMicros: Long, offsetSec: Int, zone: ZoneId): DtF =
      new DtF(Math.floorDiv(localMicros, 86400000000L),
        Math.floorMod(localMicros, 86400000000L), offsetSec, zone)
    def fromZdt(zdt: ZonedDateTime): DtF =
      new DtF(zdt.toLocalDate.toEpochDay, zdt.toLocalTime.toNanoOfDay / 1000L,
        zdt.getOffset.getTotalSeconds, zdt.getZone)
    /** days-from-civil (Hinnant) — inverse of the DtF field computation. */
    def daysFromCivil(y0: Int, m: Int, d: Int): Long = {
      val y = y0 - (if (m <= 2) 1 else 0)
      val era = Math.floorDiv(y.toLong, 400L)
      val yoe = (y - era * 400).toInt
      val doyM = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
      val doe = yoe * 365 + yoe / 4 - yoe / 100 + doyM
      era * 146097L + doe - 719468L
    }
  }

  /** Compatibility entry: callers that already hold a ZonedDateTime. */
  def formatDt(nodes: Vector[DtNode], zdt: ZonedDateTime, hasTz: Boolean): String =
    formatDt(nodes, DtF.fromZdt(zdt), hasTz)

  /** Append `v` zero-padded to `width` (unless fill-mode), plus the
    * ordinal suffix — allocation-free replacement for num() on the
    * formatting hot path. */
  private def appendNum(sb: StringBuilder, v: Long, width: Int, fm: Boolean, th: Int): Unit = {
    if (v < 0) sb.append('-')
    val a = math.abs(v)
    if (!fm) {
      var digits = 1; var t = a
      while (t >= 10) { digits += 1; t /= 10 }
      var pad = width - digits
      while (pad > 0) { sb.append('0'); pad -= 1 }
    }
    sb.append(a)
    if (th != 0) sb.append(ordinal(v, th == 2))
  }

  /** Render one datetime through a compiled template. `f` carries the
    * wall-clock fields in the session zone (or the naive local value
    * for date / timestamp-without-tz, with `hasTz=false`). */
  def formatDt(nodes: Vector[DtNode], f: DtF, hasTz: Boolean): String = {
    val sb = new StringBuilder
    val y = f.year // proleptic; <=0 means BC (1 - y)
    val dispYear = if (y <= 0) 1 - y else y
    nodes.foreach {
      case DtLit(s) => sb.append(s)
      case DtTok(key, raw, th, fm) =>
        def bc(u: String, l: String): String =
          caseName(raw, if (y <= 0) u else l) // caller passes BC/AD pair
        key match {
          case "HH24" => appendNum(sb, f.hour, 2, fm, th)
          case "HH12" | "HH" =>
            val h = f.hour % 12; appendNum(sb, if (h == 0) 12 else h, 2, fm, th)
          case "MI" => appendNum(sb, f.minute, 2, fm, th)
          case "SS" => appendNum(sb, f.second, 2, fm, th)
          case "SSSS" | "SSSSS" =>
            appendNum(sb, f.secondOfDay.toLong, 1, true, th)
          case "MS" => appendNum(sb, f.micro / 1000L, 3, fm, th)
          case "US" => appendNum(sb, f.micro.toLong, 6, fm, th)
          case k if k.startsWith("FF") =>
            // FFn (pg 13+): first n digits of the fractional second
            val n = k.charAt(2) - '0'
            appendNum(sb, f.micro / math.pow(10, 6 - n).toLong, n, fm, th)
          case "AM" | "PM" =>
            sb.append(caseName(raw, if (f.hour < 12) "AM" else "PM"))
          case "A.M." | "P.M." =>
            sb.append(caseName(raw, if (f.hour < 12) "A.M." else "P.M."))
          case "BC" | "AD" => sb.append(bc("BC", "AD"))
          case "B.C." | "A.D." => sb.append(bc("B.C.", "A.D."))
          case "YYYY" => appendNum(sb, dispYear.toLong, 4, fm, th)
          case "Y,YYY" =>
            val s = num(dispYear.toLong, 4, true, 0)
            val cut = s.length - 3
            sb.append(s.substring(0, cut) + "," + s.substring(cut))
            if (th != 0) sb.append(ordinal(dispYear.toLong, th == 2))
          case "YYY" => appendNum(sb, dispYear.toLong % 1000, 3, fm, th)
          case "YY" => appendNum(sb, dispYear.toLong % 100, 2, fm, th)
          case "Y" => appendNum(sb, dispYear.toLong % 10, 1, fm, th)
          case "IYYY" => appendNum(sb, f.isoYear.toLong, 4, fm, th)
          case "IYY" => appendNum(sb, f.isoYear.toLong % 1000, 3, fm, th)
          case "IY" => appendNum(sb, f.isoYear.toLong % 100, 2, fm, th)
          case "I" => appendNum(sb, f.isoYear.toLong % 10, 1, fm, th)
          case "MONTH" => sb.append(padName(caseName(raw, monthsU(f.month - 1)), 9, fm))
          case "MON" => sb.append(caseName(raw, monthsU(f.month - 1).substring(0, 3)))
          case "MM" => appendNum(sb, f.month.toLong, 2, fm, th)
          case "DAY" =>
            sb.append(padName(caseName(raw, daysU(f.dowIso % 7)), 9, fm))
          case "DY" =>
            sb.append(caseName(raw, daysU(f.dowIso % 7).substring(0, 3)))
          case "DDD" => appendNum(sb, f.dayOfYear.toLong, 3, fm, th)
          case "IDDD" =>
            appendNum(sb, ((f.isoWeek - 1) * 7 + f.dowIso).toLong, 3, fm, th)
          case "DD" => appendNum(sb, f.day.toLong, 2, fm, th)
          case "D" => appendNum(sb, (f.dowIso % 7 + 1).toLong, 1, fm, th)
          case "ID" => appendNum(sb, f.dowIso.toLong, 1, fm, th)
          case "WW" => appendNum(sb, ((f.dayOfYear - 1) / 7 + 1).toLong, 2, fm, th)
          case "IW" => appendNum(sb, f.isoWeek.toLong, 2, fm, th)
          case "W" => appendNum(sb, ((f.day - 1) / 7 + 1).toLong, 1, fm, th)
          case "CC" => appendNum(sb, ((dispYear - 1) / 100 + 1).toLong, 2, fm, th)
          case "J" => appendNum(sb, f.julianDay, 1, true, th)
          case "Q" => appendNum(sb, ((f.month - 1) / 3 + 1).toLong, 1, fm, th)
          case "RM" =>
            val r = romanM(f.month - 1)
            val cased = if (raw.charAt(0).isUpper) r else r.toLowerCase
            sb.append(if (fm) cased else cased + (" " * (4 - cased.length)))
          case "TZ" =>
            if (hasTz) {
              val inst = Instant.ofEpochSecond(Math.floorDiv(f.instantMicros, 1000000L))
              val abbrev = java.util.TimeZone.getTimeZone(f.zone)
                .getDisplayName(f.zone.getRules.isDaylightSavings(inst),
                  java.util.TimeZone.SHORT)
              sb.append(if (raw.charAt(0).isUpper) abbrev.toUpperCase else abbrev.toLowerCase)
            }
          case "TZH" =>
            val off = f.offsetSec
            sb.append(f"${if (off < 0) "-" else "+"}%s${math.abs(off) / 3600}%02d")
          case "TZM" =>
            sb.append(f"${math.abs(f.offsetSec) / 60 % 60}%02d")
          case "OF" =>
            val off = f.offsetSec
            val h = math.abs(off) / 3600; val m = math.abs(off) / 60 % 60
            sb.append(f"${if (off < 0) "-" else "+"}%s$h%02d")
            if (m != 0) sb.append(f":$m%02d")
          case other => sb.append(other) // unreachable
        }
    }
    sb.toString
  }

  private def padName(s: String, w: Int, fm: Boolean): String =
    if (fm || s.length >= w) s else s + (" " * (w - s.length))

  // ---- interval rendering (subset of tokens meaningful for intervals) ----

  /** pg applies the time-unit tokens to an interval's components;
    * HH24 carries total hours (can exceed 23 only via days=0 inputs —
    * we render the day/time split as stored: months, days, micros). */
  /** pg interval input text → (months, days, micros); None when the
    * text doesn't parse. Handles `N unit` runs (pg unit spellings
    * incl. mon/yr/w abbreviations), fractional quantities spilling to
    * finer fields (pg: '1.5 days' = 1 day 12:00:00), a bare
    * HH:MM[:SS[.f]] time part, per-field signs, and trailing 'ago'
    * (negates everything). */
  def parseIntervalText(s: String): Option[(Int, Int, Long)] = {
    // ISO 8601 durations ('P1Y2M3DT4H5M6S', 'P1W', 'PT0.5S', and the
    // alternative 'P0001-02-03T04:05:06') — pg requires the UPPERCASE
    // P/T designators ('p1dt2h' is invalid, live-pinned sweep-32);
    // per-field signs are allowed ('P-1D' → -1 days), a leading sign
    // is not; bare 'PT' is a valid zero interval, bare 'P' is not.
    if (s.trim.startsWith("P")) return parseIso8601Interval(s.trim)
    var months = 0L; var days = 0L; var micros = 0L
    var ago = false
    // pg accepts glued number+unit spellings ('15h 2m 12s', '3d');
    // split them into the number/unit token pairs the loop consumes
    val glued = "([+-]?\\d+(?:\\.\\d+)?)([a-z]+)".r
    val toks = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .flatMap {
        case glued(num, unit) => Seq(num, unit)
        case t => Seq(t)
      }
    if (toks.isEmpty) return None
    val usPerDay = 86400000000L
    var i = 0
    var pendingNum: Option[java.math.BigDecimal] = None
    def addUnit(unit: String, q: java.math.BigDecimal): Boolean = {
      val us: Long = unit match {
        case "microsecond" | "microseconds" | "us" => 1L
        case "millisecond" | "milliseconds" | "ms" => 1000L
        case "second" | "seconds" | "sec" | "secs" | "s" => 1000000L
        case "minute" | "minutes" | "min" | "mins" | "m" => 60000000L
        case "hour" | "hours" | "hr" | "hrs" | "h" => 3600000000L
        case "day" | "days" | "d" =>
          val whole = q.setScale(0, java.math.RoundingMode.DOWN)
          days += whole.longValueExact()
          micros += q.subtract(whole).multiply(new JBigDecimal(usPerDay)).longValue()
          return true
        case "week" | "weeks" | "w" =>
          val d = q.multiply(new JBigDecimal(7))
          val whole = d.setScale(0, java.math.RoundingMode.DOWN)
          days += whole.longValueExact()
          micros += d.subtract(whole).multiply(new JBigDecimal(usPerDay)).longValue()
          return true
        case "month" | "months" | "mon" | "mons" =>
          val whole = q.setScale(0, java.math.RoundingMode.DOWN)
          months += whole.longValueExact()
          val fracDays = q.subtract(whole).multiply(new JBigDecimal(30))
          val wholeD = fracDays.setScale(0, java.math.RoundingMode.DOWN)
          days += wholeD.longValueExact()
          micros += fracDays.subtract(wholeD).multiply(new JBigDecimal(usPerDay)).longValue()
          return true
        case "year" | "years" | "yr" | "yrs" | "y" =>
          months += q.multiply(new JBigDecimal(12))
            .setScale(0, java.math.RoundingMode.DOWN).longValueExact()
          return true
        case "decade" | "decades" => months += q.multiply(new JBigDecimal(120))
            .setScale(0, java.math.RoundingMode.DOWN).longValueExact(); return true
        case "century" | "centuries" => months += q.multiply(new JBigDecimal(1200))
            .setScale(0, java.math.RoundingMode.DOWN).longValueExact(); return true
        case "millennium" | "millenniums" | "millennia" =>
          months += q.multiply(new JBigDecimal(12000))
            .setScale(0, java.math.RoundingMode.DOWN).longValueExact(); return true
        case _ => return false
      }
      micros += q.multiply(new JBigDecimal(us)).longValue()
      true
    }
    val timeRe = "([+-]?)(\\d+):(\\d{1,2})(?::(\\d{1,2})(\\.\\d+)?)?".r
    val ymRe = "([+-]?)(\\d+)-(\\d+)".r
    while (i < toks.length) {
      val t = toks(i)
      t match {
        case "ago" if i == toks.length - 1 => ago = true
        case ymRe(sg, y, mo) if pendingNum.isEmpty =>
          // SQL-standard year-month '1-2' (sign covers both fields)
          val m = y.toLong * 12 + mo.toLong
          months += (if (sg == "-") -m else m)
        case timeRe(sg, hh, mm, ss, fr) =>
          // SQL-standard 'D HH:MM:SS': a pending bare number before a
          // time field is the day count ('3 4:05:06' = 3 days 04:05:06)
          pendingNum.foreach { q =>
            days += q.setScale(0, java.math.RoundingMode.DOWN).longValueExact()
            pendingNum = None
          }
          val sign = if (sg == "-") -1L else 1L
          var us = hh.toLong * 3600000000L + mm.toLong * 60000000L
          if (ss != null) us += ss.toLong * 1000000L
          if (fr != null) us += new JBigDecimal(fr).multiply(new JBigDecimal(1000000))
            .setScale(0, java.math.RoundingMode.DOWN).longValueExact()
          micros += sign * us
        case _ =>
          val isNum = t.matches("[+-]?\\d+(\\.\\d+)?")
          if (isNum) {
            if (pendingNum.nonEmpty) return None
            pendingNum = Some(new JBigDecimal(t))
          } else pendingNum match {
            case Some(q) =>
              if (!addUnit(t, q)) return None
              pendingNum = None
            case None =>
              // a unit with implied quantity 1? pg requires a number
              return None
          }
      }
      i += 1
    }
    pendingNum match {
      case Some(q) => micros += q.multiply(new JBigDecimal(1000000L)).longValue()
      case None =>
    }
    if (ago) { months = -months; days = -days; micros = -micros }
    if (months > Int.MaxValue || months < Int.MinValue ||
      days > Int.MaxValue || days < Int.MinValue) None
    else Some((months.toInt, days.toInt, micros))
  }

  private def parseIso8601Interval(s: String): Option[(Int, Int, Long)] = {
    val usPerDay = 86400000000L
    var months = 0L; var days = 0L; var micros = 0L
    val body = s.substring(1)
    // alternative format P<yyyy>-<mm>-<dd>[T<hh>:<mm>:<ss[.f]>]
    val alt = ("^(\\d{4})-(\\d{1,2})-(\\d{1,2})" +
      "(?:T(\\d{1,2}):(\\d{1,2}):(\\d{1,2}(?:\\.\\d+)?))?$").r
    body match {
      case alt(y, mo, d, h, mi, se) =>
        months = y.toLong * 12 + mo.toLong
        days = d.toLong
        if (h != null)
          micros = h.toLong * 3600000000L + mi.toLong * 60000000L +
            new JBigDecimal(se).multiply(new JBigDecimal(1000000L))
              .setScale(0, java.math.RoundingMode.DOWN).longValueExact()
        return Some((months.toInt, days.toInt, micros))
      case _ =>
    }
    if (body.isEmpty) return None // bare 'P' is invalid; bare 'PT' is zero
    var inTime = false
    var sawField = body == "T" // 'PT' alone is a valid zero interval
    var i = 0
    try {
      while (i < body.length) {
        val c = body.charAt(i)
        if (c == 'T') { if (inTime) return None; inTime = true; i += 1 }
        else {
          val start = i
          if (i < body.length && (body.charAt(i) == '+' || body.charAt(i) == '-')) i += 1
          while (i < body.length &&
            (body.charAt(i).isDigit || body.charAt(i) == '.')) i += 1
          if (i == start || i >= body.length) return None
          val q = new JBigDecimal(body.substring(start, i))
          val des = body.charAt(i)
          i += 1
          sawField = true
          // fraction spillover mirrors pg's verbose-unit rules
          (des, inTime) match {
            case ('Y', false) =>
              months += q.multiply(new JBigDecimal(12))
                .setScale(0, java.math.RoundingMode.DOWN).longValueExact()
            case ('M', false) =>
              val whole = q.setScale(0, java.math.RoundingMode.DOWN)
              months += whole.longValueExact()
              val fracDays = q.subtract(whole).multiply(new JBigDecimal(30))
              val wholeD = fracDays.setScale(0, java.math.RoundingMode.DOWN)
              days += wholeD.longValueExact()
              micros += fracDays.subtract(wholeD)
                .multiply(new JBigDecimal(usPerDay)).longValue()
            case ('W', false) =>
              val d = q.multiply(new JBigDecimal(7))
              val whole = d.setScale(0, java.math.RoundingMode.DOWN)
              days += whole.longValueExact()
              micros += d.subtract(whole)
                .multiply(new JBigDecimal(usPerDay)).longValue()
            case ('D', false) =>
              val whole = q.setScale(0, java.math.RoundingMode.DOWN)
              days += whole.longValueExact()
              micros += q.subtract(whole)
                .multiply(new JBigDecimal(usPerDay)).longValue()
            case ('H', true) =>
              micros += q.multiply(new JBigDecimal(3600000000L)).longValue()
            case ('M', true) =>
              micros += q.multiply(new JBigDecimal(60000000L)).longValue()
            case ('S', true) =>
              micros += q.multiply(new JBigDecimal(1000000L)).longValue()
            case _ => return None
          }
        }
      }
    } catch { case _: ArithmeticException => return None }
    if (!sawField) return None
    if (months > Int.MaxValue || months < Int.MinValue ||
      days > Int.MaxValue || days < Int.MinValue) None
    else Some((months.toInt, days.toInt, micros))
  }

  def formatInterval(nodes: Vector[DtNode], months: Int, days: Int, micros: Long): String = {
    val sb = new StringBuilder
    val totSec = micros / 1000000L
    val us = math.abs(micros % 1000000L)
    val hh = totSec / 3600
    val mi = math.abs(totSec / 60 % 60)
    val ss = math.abs(totSec % 60)
    nodes.foreach {
      case DtLit(s) => sb.append(s)
      case DtTok(key, _, th, fm) => key match {
        case "YYYY" => sb.append(num(months / 12L, 4, fm, th))
        case "YY" => sb.append(num(months / 12L % 100, 2, fm, th))
        case "MM" => sb.append(num(months % 12L, 2, fm, th))
        case "DD" => sb.append(num(days.toLong, 2, fm, th))
        case "HH24" => sb.append(num(hh, 2, fm, th))
        case "HH12" | "HH" =>
          val h = math.abs(hh) % 12; sb.append(num(if (h == 0) 12 else h, 2, fm, th))
        case "MI" => sb.append(num(mi, 2, fm, th))
        case "SS" => sb.append(num(ss, 2, fm, th))
        case "SSSS" | "SSSSS" => sb.append(num(totSec, 1, true, th))
        case "MS" => sb.append(num(us / 1000, 3, fm, th))
        case "US" => sb.append(num(us, 6, fm, th))
        case _ => // date-of-year tokens are undefined on intervals: emit nothing
      }
    }
    sb.toString
  }

  // ======================================================================
  // numeric templates (pg Table 9.28/9.29, example Table 9.31)
  // ======================================================================

  sealed trait NumItem
  case object NDigit9 extends NumItem
  case object NDigit0 extends NumItem
  case object NSep extends NumItem // ',' or G
  case object NDec extends NumItem // '.' or D
  case object NCurr extends NumItem // L or $
  case object NSignS extends NumItem // S at this position
  case object NSignMI extends NumItem
  case object NSignPL extends NumItem
  case object NSignSG extends NumItem
  final case class NLit(s: String) extends NumItem

  final case class NumFmt(items: Vector[NumItem], fm: Boolean, pr: Boolean,
      vPow: Int, eeee: Boolean, rn: Boolean, th: Int, hasB: Boolean) {
    val intDigits: Int = items.takeWhile(_ != NDec).count(i => i == NDigit9 || i == NDigit0)
    val decDigits: Int = items.dropWhile(_ != NDec).count(i => i == NDigit9 || i == NDigit0)
    // PL deliberately excluded: pg keeps the default sign column AND
    // prints the plus — to_char(485,'PL999') = "+ 485" (live-pg pin);
    // S/MI/SG replace the column, PL adds to it.
    val anchoredSign: Boolean = items.exists {
      case NSignS | NSignMI | NSignSG => true; case _ => false
    }
    // per-template invariants hoisted off the per-row path (round-8:
    // formatNum used to recompute these for every value)
    val intItemsArr: Array[NumItem] = items.takeWhile(_ != NDec).toArray
    val hasDec: Boolean = items.contains(NDec)
    val decTailArr: Array[NumItem] =
      if (!hasDec) Array.empty else items.dropWhile(_ != NDec).drop(1).toArray
    /** Count of int digit positions forced to print by a '0' (from the
      * leftmost '0' rightward). */
    val forcedCount: Int = {
      var forcedFrom = Int.MaxValue
      var di = 0
      intItemsArr.foreach {
        case NDigit0 => if (forcedFrom == Int.MaxValue) forcedFrom = di; di += 1
        case NDigit9 => di += 1
        case _ =>
      }
      if (forcedFrom == Int.MaxValue) 0 else intDigits - forcedFrom
    }
    /** Rightmost forced '0' among decimal digit positions (-1 if none). */
    val lastForcedDec: Int = {
      var lastForced = -1
      var p = 0
      decTailArr.foreach {
        case NDigit0 => lastForced = p; p += 1
        case NDigit9 => p += 1
        case _ =>
      }
      lastForced
    }
    val zeroFrac: String = "0" * decDigits
  }

  def compileNum(fmt: String): NumFmt = {
    val items = Vector.newBuilder[NumItem]
    var i = 0; var fm = false; var pr = false; var v = 0; var eeee = false
    var rn = false; var th = 0; var hasB = false
    val n = fmt.length
    def at(s: String): Boolean = fmt.regionMatches(true, i, s, 0, s.length)
    while (i < n) {
      val c = fmt.charAt(i)
      if (c == '"') {
        val end = fmt.indexOf('"', i + 1)
        val stop = if (end < 0) n else end
        items += NLit(fmt.substring(i + 1, stop))
        i = if (end < 0) n else end + 1
      } else if (at("FM")) { fm = true; i += 2 }
      else if (at("TH")) { th = if (c == 'T') 2 else 1; i += 2 }
      else if (at("PR")) { pr = true; i += 2 }
      else if (at("MI")) { items += NSignMI; i += 2 }
      else if (at("PL")) { items += NSignPL; i += 2 }
      else if (at("SG")) { items += NSignSG; i += 2 }
      else if (at("RN")) { rn = true; i += 2 }
      else if (at("EEEE")) { eeee = true; i += 4 }
      else if (c == 'V' || c == 'v') {
        // digits after V are ordinary digit positions; V only records
        // the implied 10^n shift (doc: to_char(12,'99V999') = ' 12000')
        i += 1
        while (i < n && (fmt.charAt(i) == '9' || fmt.charAt(i) == '0')) {
          items += (if (fmt.charAt(i) == '9') NDigit9 else NDigit0)
          v += 1; i += 1
        }
      }
      else if (c == '9') { items += NDigit9; i += 1 }
      else if (c == '0') { items += NDigit0; i += 1 }
      else if (c == ',' || c == 'G' || c == 'g') { items += NSep; i += 1 }
      else if (c == '.' || c == 'D' || c == 'd') { items += NDec; i += 1 }
      else if (c == 'L' || c == 'l' || c == '$') { items += NCurr; i += 1 }
      else if (c == 'S' || c == 's') { items += NSignS; i += 1 }
      else if (c == 'B' || c == 'b') { hasB = true; i += 1 }
      else { items += NLit(c.toString); i += 1 }
    }
    NumFmt(items.result(), fm, pr, v, eeee, rn, th, hasB)
  }

  private val romanH = Array("", "C", "CC", "CCC", "CD", "D", "DC", "DCC", "DCCC", "CM")
  private val romanT = Array("", "X", "XX", "XXX", "XL", "L", "LX", "LXX", "LXXX", "XC")
  private val romanO = Array("", "I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX")

  def roman(v: Int): String =
    if (v < 1 || v > 3999) "#" * 15
    else ("M" * (v / 1000)) + romanH(v / 100 % 10) + romanT(v / 10 % 10) + romanO(v % 10)

  /** pg `to_char(numeric, text)`. */
  def formatNum(f: NumFmt, in: JBigDecimal): String = {
    if (f.rn) {
      val r = roman(in.setScale(0, RoundingMode.HALF_UP).intValue())
      return (if (f.fm) r else (" " * math.max(0, 15 - r.length)) + r) +
        (if (f.th != 0) ordinal(in.longValue(), f.th == 2) else "")
    }
    val value0 = if (f.vPow == 0) in else in.movePointRight(f.vPow)
    if (f.eeee) {
      val neg = value0.signum() < 0
      val fmtStr = "%." + f.decDigits + "e"
      var s = String.format(java.util.Locale.ROOT, fmtStr, Double.box(value0.abs.doubleValue()))
      // java gives e-04 style already ("%e" pads exponent to 2)
      val signStr = if (neg) "-" else if (f.fm) "" else " "
      return signStr + s
    }
    val neg = value0.signum() < 0
    val rounded = value0.abs.setScale(f.decDigits, RoundingMode.HALF_UP)
    val intPart = rounded.toBigInteger.toString
    val fracPart =
      if (f.decDigits == 0) ""
      else {
        val s = rounded.toPlainString
        val dot = s.indexOf('.')
        if (dot < 0) "0" * f.decDigits else s.substring(dot + 1)
      }
    val thVal = if (f.th == 0) 0L else value0.setScale(0, RoundingMode.DOWN).longValue()
    renderParts(f, neg, intPart, fracPart, thVal)
  }

  /** Fast path for integral inputs — same output as
    * formatNum(JBigDecimal.valueOf(v)) with no BigDecimal on the row. */
  def formatNumLong(f: NumFmt, v: Long): String =
    if (f.rn || f.eeee || f.vPow != 0 || v == Long.MinValue)
      formatNum(f, JBigDecimal.valueOf(v))
    else renderParts(f, v < 0, java.lang.Long.toString(math.abs(v)), f.zeroFrac, v)

  /** Fast path for doubles. Must reproduce
    * formatNum(JBigDecimal.valueOf(v)) exactly, so it rounds the same
    * shortest-decimal digit string Double.toString produces; scientific
    * notation and the rare template features fall back. */
  def formatNumDouble(f: NumFmt, v: Double): String = {
    if (f.rn || f.eeee || f.vPow != 0 || f.th != 0 || v.isNaN || v.isInfinite)
      return formatNum(f, JBigDecimal.valueOf(v))
    val s = java.lang.Double.toString(math.abs(v))
    if (s.indexOf('E') >= 0) return formatNum(f, JBigDecimal.valueOf(v))
    val dot = s.indexOf('.')
    val (ip, fp) = roundDigits(s.substring(0, dot), s.substring(dot + 1), f.decDigits)
    renderParts(f, v < 0, ip, fp, 0L)
  }

  /** HALF_UP rounding of an unsigned decimal split into digit strings;
    * returns (intPart without leading zeros — "0" when empty, fracPart
    * of exactly `dec` chars). */
  private def roundDigits(intStr: String, fracStr: String, dec: Int): (String, String) = {
    def strip(s: String): String = {
      var i = 0
      while (i < s.length - 1 && s.charAt(i) == '0') i += 1
      s.substring(i)
    }
    if (fracStr.length <= dec)
      (strip(intStr), fracStr + ("0" * (dec - fracStr.length)))
    else if (fracStr.charAt(dec) < '5')
      (strip(intStr), fracStr.substring(0, dec))
    else {
      val buf = (intStr + fracStr.substring(0, dec)).toCharArray
      var i = buf.length - 1
      var carry = true
      while (i >= 0 && carry) {
        if (buf(i) == '9') buf(i) = '0'
        else { buf(i) = (buf(i) + 1).toChar; carry = false }
        i -= 1
      }
      val all = if (carry) "1" + new String(buf) else new String(buf)
      (strip(all.substring(0, all.length - dec)), all.substring(all.length - dec))
    }
  }

  private val DIGITS: Array[String] =
    Array("0", "1", "2", "3", "4", "5", "6", "7", "8", "9")

  /** Template rendering over pre-extracted digit strings. `fracPart`
    * must be exactly decDigits chars; `thVal` is only read when the
    * template carries TH/th. */
  private def renderParts(f: NumFmt, neg: Boolean, intPart: String,
      fracPart: String, thVal: Long): String = {
    // pg 15 pinned: a format with NO digit positions renders its
    // literals only — no sign column, no overflow ('XXXX' -> "XXXX")
    val hasDigits = f.intDigits > 0 || f.decDigits > 0
    if (!hasDigits) {
      val sb = new StringBuilder
      f.items.foreach {
        case NLit(s) => sb.append(s)
        case NDec => sb.append('.')
        case _ =>
      }
      return sb.toString
    }
    // pg 15 pinned: ANY integer part (even "0") overflows when it has
    // more digits than slots; '#' fills digit/sep positions while sign
    // tokens render normally ('999' -> ' ###', 'S999' -> '+###',
    // '999MI' -> '### ', 'FM999' -> '###')
    val overflow = intPart.length > f.intDigits
    if (overflow) {
      val sb = new StringBuilder
      if (!f.anchoredSign && !f.fm) sb.append(if (neg) '-' else ' ')
      f.items.foreach {
        case NDigit9 | NDigit0 | NSep => sb.append('#')
        case NDec => sb.append('.')
        case NLit(s) => sb.append(s)
        case NSignS | NSignSG => sb.append(if (neg) '-' else '+')
        case NSignMI => sb.append(if (neg) '-' else ' ')
        case NSignPL => sb.append(if (neg) "" else "+")
        case NCurr => sb.append('$')
        case _ =>
      }
      return sb.toString
    }
    // A '0' in the integer template forces every position from it
    // rightward to print; with an all-'9' template a zero integer part
    // prints NO digits (doc: to_char(-0.1,'99.99') = ' -.10').
    val intItems = f.intItemsArr
    val forcedCount = f.forcedCount
    val effDigits =
      if (intPart == "0" && forcedCount == 0 && f.decDigits > 0) 0
      else math.max(intPart.length, forcedCount)
    val digits =
      if (effDigits == 0) ""
      else ("0" * math.max(0, effDigits - intPart.length)) + intPart

    // walk integer items right-to-left assigning digits into slots;
    // rendered(k) == null means "suppressed" (FM mode drops it)
    val rendered = new Array[String](intItems.length)
    var dRemain = digits.length
    var k = intItems.length - 1
    while (k >= 0) {
      intItems(k) match {
        case NDigit9 | NDigit0 =>
          if (dRemain > 0) { rendered(k) = DIGITS(digits.charAt(dRemain - 1) - '0'); dRemain -= 1 }
          else rendered(k) = if (f.fm) null else " "
        case NSep =>
          rendered(k) = if (dRemain > 0) "," else if (f.fm) null else " "
        case NCurr => rendered(k) = "$"
        case NSignS => rendered(k) = if (neg) "-" else "+"
        case NSignMI => rendered(k) = if (neg) "-" else if (f.fm) null else " "
        case NSignPL => rendered(k) = if (!neg) "+" else if (f.fm) null else " "
        case NSignSG => rendered(k) = if (neg) "-" else "+"
        case NLit(s) => rendered(k) = s
        case NDec => // not in intItems
      }
      k -= 1
    }
    // Default sign column (no S/MI/PL/SG and no PR... PR keeps it too):
    // the sign hugs the first printed digit, adding one column; when no
    // int digit printed it CONSUMES the rightmost blank slot instead.
    val needDefaultSign = !f.anchoredSign
    val signCh = if (f.pr) (if (neg) "<" else " ") else (if (neg) "-" else " ")
    val intSb = new StringBuilder
    if (f.fm) {
      rendered.foreach(r => if (r != null) intSb.append(r))
      if (needDefaultSign && neg && !f.pr) intSb.insert(firstDigitIdx(intSb.toString), '-')
      else if (f.pr && neg) intSb.insert(0, '<')
    } else if (needDefaultSign) {
      // index (in rendered, expanded) of first actual digit char
      var firstDigit = -1
      var lastBlankSlot = -1
      var outIdx = 0
      var ki = 0
      val offsets = new Array[Int](intItems.length)
      while (ki < intItems.length) {
        offsets(ki) = outIdx
        val r = rendered(ki)
        if (r != null) {
          val isDigitSlot = intItems(ki) == NDigit9 || intItems(ki) == NDigit0
          if (isDigitSlot && r != " " && firstDigit < 0) firstDigit = outIdx
          if (isDigitSlot && r == " ") lastBlankSlot = outIdx
          outIdx += r.length
        }
        ki += 1
      }
      rendered.foreach(r => if (r != null) intSb.append(r))
      if (firstDigit >= 0) intSb.insert(firstDigit, signCh)
      else if (lastBlankSlot >= 0) intSb.setCharAt(lastBlankSlot, signCh.charAt(0))
      else intSb.append(signCh)
    } else {
      rendered.foreach(r => if (r != null) intSb.append(r))
    }
    val sb = intSb
    // decimal part
    if (f.hasDec) {
      sb.append('.')
      val lastForced = f.lastForcedDec
      var trailing = fracPart.length
      if (f.fm) { // trim trailing zeros beyond the last forced '0'
        while (trailing > lastForced + 1 && trailing > 0 &&
          fracPart.charAt(trailing - 1) == '0') trailing -= 1
      }
      var fi = 0
      f.decTailArr.foreach {
        case NDigit9 | NDigit0 =>
          if (fi < trailing) { sb.append(fracPart.charAt(fi)); fi += 1 }
          else { if (!f.fm) sb.append(' '); fi += 1 }
        case NSignS => sb.append(if (neg) "-" else "+")
        case NSignMI => sb.append(if (neg) "-" else if (f.fm) "" else " ")
        case NSignPL => sb.append(if (!neg) "+" else if (f.fm) "" else " ")
        case NSignSG => sb.append(if (neg) "-" else "+")
        case NCurr => sb.append("$")
        case NLit(s) => sb.append(s)
        case _ =>
      }
    }
    if (f.pr) sb.append(if (neg) '>' else ' ')
    if (f.th != 0) sb.append(ordinal(thVal, f.th == 2))
    sb.toString
  }

  private def firstDigitIdx(s: String): Int = {
    val i = s.indexWhere(_.isDigit)
    if (i < 0) s.length else i
  }

  /** pg `to_number(text, text)` — lenient scan guided by the template:
    * sign from '-' / trailing '-' / '<...>' anywhere, digits and one
    * decimal point collected in order, group/currency/blank noise
    * skipped, `V` divides back down. Covers the doc example
    * to_number('12,454.8-', '99G999D9S') = -12454.8. */
  def parseNum(f: NumFmt, in: String): JBigDecimal = {
    if (in == null) return null
    var neg = false
    val sb = new StringBuilder
    var seenDot = false
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      else if ((c == '.') && !seenDot) { sb.append('.'); seenDot = true }
      else if (c == '-' || c == '<') neg = true
      i += 1
    }
    if (sb.isEmpty || sb.toString == ".") return null
    var v = new JBigDecimal(sb.toString)
    if (neg) v = v.negate()
    if (f.vPow > 0) v = v.movePointLeft(f.vPow)
    v
  }

  // ======================================================================
  // to_timestamp(text, template) — parse side
  // ======================================================================

  private val monthPrefixes: Map[String, Int] =
    monthsU.zipWithIndex.map { case (m, i) => m -> (i + 1) }.toMap

  /** Natural digit width of a numeric datetime keyword. */
  private def dtWidth(key: String): Int = key match {
    case "YYYY" | "Y,YYY" | "IYYY" => 4
    case "YYY" | "DDD" | "MS" | "IDDD" => 3
    case "US" => 6
    case k if k.startsWith("FF") => k.charAt(2) - '0'
    case "J" => 7
    case "SSSS" | "SSSSS" => 5
    case "Y" | "D" | "ID" | "Q" | "W" => 1
    case _ => 2
  }

  private def isNumericTok(key: String): Boolean = key match {
    case "MON" | "MONTH" | "DAY" | "DY" | "AM" | "PM" | "A.M." | "P.M." |
         "BC" | "AD" | "B.C." | "A.D." | "TZ" | "RM" => false
    case _ => true
  }

  /** Compiled parse template: the nodes plus the adjacency flags that
    * used to be recomputed per parsed value (round-8: parseDt ran once
    * per row on the to_date/to_timestamp hot path). */
  final class DtParse(val nodes: Vector[DtNode]) {
    // pg limits a numeric field to its keyword width when the next
    // template node is another numeric field (no separator between)
    val adjacent: Array[Boolean] = {
      val out = new Array[Boolean](nodes.length)
      var i = 0
      while (i < nodes.length) {
        out(i) = nodes(i) match {
          case DtTok(k, _, _, _) if isNumericTok(k) =>
            (i + 1 < nodes.length) && (nodes(i + 1) match {
              case DtTok(k2, _, _, _) => isNumericTok(k2)
              case _ => false
            })
          case _ => false
        }
        i += 1
      }
      out
    }
  }

  def compileDtParse(fmt: String): DtParse = new DtParse(compileDt(fmt))

  /** Parse `in` according to the compiled template; returns epoch
    * micros in `zone`. pg-lenient: runs of separator literals match
    * any whitespace/punct. A numeric field immediately followed by
    * another numeric field is limited to its keyword width (pg's rule
    * that makes 'YYYYMMDD' parse); otherwise it reads greedily. */
  def parseDt(nodes: Vector[DtNode], in: String, zone: ZoneId): Long =
    parseDt(new DtParse(nodes), in, zone)

  def parseDt(tpl: DtParse, in: String, zone: ZoneId): Long = {
    val nodes = tpl.nodes
    var year = 1; var month = 1; var day = 1
    var hour = 0; var min = 0; var sec = 0; var usec = 0
    var pm = false; var sawPm = false; var hour12 = false
    var bc = false
    var isoWeek = 0; var isoDow = 0
    var tzOffSec: Option[Int] = None
    var tzNeg = false
    var pos = 0
    val n = in.length
    def skipSep(): Unit = {
      while (pos < n && !Character.isLetterOrDigit(in.charAt(pos))) pos += 1
    }
    def readInt(maxW: Int): Int = {
      skipSep()
      val st = pos
      while (pos < n && pos - st < maxW && Character.isDigit(in.charAt(pos))) pos += 1
      if (st == pos) 0 else in.substring(st, pos).toInt
    }
    def readSignedInt(maxW: Int): Int = {
      skipSep0()
      val negSign = pos < n && (in.charAt(pos) == '-' || in.charAt(pos) == '+')
      tzNeg = negSign && in.charAt(pos) == '-'
      if (negSign) pos += 1
      val v = readInt(maxW)
      if (tzNeg) -v else v
    }
    def skipSep0(): Unit = { // like skipSep but keeps +/- for offsets
      while (pos < n && !Character.isLetterOrDigit(in.charAt(pos)) &&
        in.charAt(pos) != '+' && in.charAt(pos) != '-') pos += 1
    }
    def readName(): String = {
      skipSep()
      val st = pos
      while (pos < n && Character.isLetter(in.charAt(pos))) pos += 1
      in.substring(st, pos)
    }
    val adjacent = tpl.adjacent
    nodes.zipWithIndex.foreach { case (node, nodeIdx) =>
      def w(key: String, greedy: Int): Int =
        if (adjacent(nodeIdx)) dtWidth(key) else greedy
      node match {
      case DtLit(s) =>
        // non-alnum separators are skipped lazily by the readers;
        // ALPHANUMERIC literal chars (quoted, e.g. the "W" in
        // IYYY-"W"IW) consume one input char each like pg
        s.foreach { c =>
          if (Character.isLetterOrDigit(c)) { skipSep(); if (pos < n) pos += 1 }
        }
      case DtTok(key, _, _, _) => key match {
        case "YYYY" | "Y,YYY" => year = readInt(w(key, 4 + 2)) // allow 5-6 digit years
        case "YYY" => val v = readInt(3); year = if (v >= 100) 1900 + v % 1000 else 2000 + v
        case "YY" => val v = readInt(2); year = if (v < 70) 2000 + v else 1900 + v
        case "Y" => year = 2000 + readInt(1)
        case "IYYY" => year = readInt(4)
        case "MM" => month = readInt(2)
        case "MON" | "MONTH" =>
          val nm = readName().toUpperCase
          if (nm.length >= 3) {
            var mi = 0
            var found = false
            while (mi < 12 && !found) {
              if (monthsU(mi).startsWith(nm)) { month = mi + 1; found = true }
              mi += 1
            }
          }
        case "DD" => day = readInt(2)
        case "DDD" =>
          val doy = readInt(3)
          val d0 = LocalDate.ofYearDay(if (year == 0) 1 else year, math.max(1, doy))
          month = d0.getMonthValue; day = d0.getDayOfMonth
        case "HH24" => hour = readInt(2)
        case "HH12" | "HH" => hour = readInt(2); hour12 = true
        case "MI" => min = readInt(2)
        case "SS" => sec = readInt(2)
        case "SSSS" | "SSSSS" =>
          val s = readInt(5); hour = s / 3600; min = s / 60 % 60; sec = s % 60
        case "MS" => usec += readInt(3) * 1000
        case "US" => usec += readInt(6)
        case k if k.startsWith("FF") =>
          val n = k.charAt(2) - '0'
          usec += readInt(n) * math.pow(10, 6 - n).toInt
        case "AM" | "PM" | "A.M." | "P.M." =>
          val nm = readName().toUpperCase
          sawPm = true; pm = nm.startsWith("P")
        case "BC" | "B.C." | "AD" | "A.D." =>
          val nm = readName().toUpperCase
          bc = nm.startsWith("B")
        case "TZH" => tzOffSec = Some(tzOffSec.getOrElse(0) + readSignedInt(2) * 3600)
        case "TZM" =>
          // sign comes from the TZH read: '-00:30' must subtract even
          // though the hour field itself is zero
          val m = readInt(2)
          tzOffSec = Some(tzOffSec.getOrElse(0) + (if (tzNeg) -m * 60 else m * 60))
        case "OF" =>
          val h = readSignedInt(2)
          skipSep(); val m = if (pos < n && Character.isDigit(in.charAt(pos))) readInt(2) else 0
          tzOffSec = Some(h * 3600 + (if (tzNeg) -m else m) * 60)
        case "DY" | "DAY" | "D" => readName() // parsed and ignored (pg checks consistency; we don't)
        case "IW" => isoWeek = readInt(2)
        case "ID" => isoDow = readInt(1)
        case "J" =>
          val j = readInt(7)
          val d0 = LocalDate.MIN.`with`(JulianFields.JULIAN_DAY, j.toLong)
          year = d0.getYear; month = d0.getMonthValue; day = d0.getDayOfMonth
        case _ => // Q/WW/W/CC/TZ etc. contribute nothing to the point value (pg ignores)
      }
    }
    }
    if (hour12 && sawPm) {
      val h = hour % 12
      hour = if (pm) h + 12 else h
    }
    if (isoWeek > 0) {
      // ISO week-date input (IYYY-IW-ID): resolve via the ISO week
      // fields anchored at Jan 4 (always week 1)
      val wf = java.time.temporal.WeekFields.ISO
      val d0 = LocalDate.of(if (year == 0) 1 else year, 1, 4)
        .`with`(wf.weekOfWeekBasedYear(), isoWeek.toLong)
        .`with`(wf.dayOfWeek(), math.max(1, isoDow).toLong)
      year = d0.getYear; month = d0.getMonthValue; day = d0.getDayOfMonth
    }
    if (bc) year = 1 - year
    val mo = math.max(1, month)
    val dy = math.max(1, day)
    // fast tail: explicit offset or fixed-offset session zone + valid
    // fields → pure arithmetic (no LocalDateTime/Instant per row);
    // invalid fields keep the java.time path so the error is identical
    val fixedOff: Int = tzOffSec.getOrElse {
      val rules = zone.getRules
      if (rules.isFixedOffset) rules.getOffset(Instant.EPOCH).getTotalSeconds
      else Int.MinValue
    }
    val leap = (year % 4 == 0 && year % 100 != 0) || year % 400 == 0
    val validYmd = mo >= 1 && mo <= 12 && dy >= 1 && {
      val dim = mo match {
        case 2 => if (leap) 29 else 28
        case 4 | 6 | 9 | 11 => 30
        case _ => 31
      }
      dy <= dim
    }
    if (fixedOff != Int.MinValue && validYmd && hour <= 23 && min <= 59 && sec <= 59)
      (DtF.daysFromCivil(year, mo, dy) * 86400L +
        hour * 3600L + min * 60L + sec - fixedOff) * 1000000L + usec
    else {
      val ldt = LocalDateTime.of(year, mo, dy, hour, min, sec, usec * 1000)
      val z = tzOffSec match {
        case Some(off) => ldt.atOffset(java.time.ZoneOffset.ofTotalSeconds(off)).toInstant
        case None => ldt.atZone(zone).toInstant
      }
      z.getEpochSecond * 1000000L + z.getNano / 1000L
    }
  }

  /** Timestamp micros → session-zone ZonedDateTime. */
  def microsToZdt(micros: Long, zone: ZoneId): ZonedDateTime =
    Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L).atZone(zone)
}
