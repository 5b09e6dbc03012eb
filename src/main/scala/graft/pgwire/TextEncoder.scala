package graft.pgwire

import java.sql.{Date, Timestamp}
import java.time.{Duration, Instant, LocalDate, LocalDateTime, Period, ZoneOffset}
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Spark Row values → PostgreSQL text-format wire strings, following
  * pg's own output conventions (the reference delegates this to
  * pgwire's ToSqlText; behavior matrix at
  * arrow-pg/src/encoder.rs:536-738 and list_encoder.rs/struct_encoder.rs).
  *
  * Null is represented as None (the DataRow writes -1 length).
  */
object TextEncoder {

  /** Output-format GUCs (pg FormatOptions; reference delegates to
    * pgwire's ToSqlText + FormatOptions, encoder.rs:259-534):
    * DateStyle (style + field order), bytea_output, extra_float_digits.
    *
    * extra_float_digits ≥ 1 → shortest-round-trip (pg 12+ default);
    * ≤ 0 → `%.*g` with 15+n (float8) / 6+n (float4) significant digits.
    */
  final case class Fmt(
      zone: java.time.ZoneId = ZoneOffset.UTC,
      dateStyle: String = "iso",   // iso | sql | postgres | german
      dateOrder: String = "mdy",   // mdy | dmy | ymd
      byteaEscape: Boolean = false,
      extraFloatDigits: Int = 1)

  object Fmt {
    val default: Fmt = Fmt()

    /** Parse from GUC values as pg does: DateStyle is a comma list where
      * each item is either a style or an order, last mention wins. */
    def fromGucs(zone: java.time.ZoneId, dateStyle: Option[String],
        byteaOutput: Option[String], extraFloatDigits: Option[String]): Fmt = {
      var style = "iso"; var order = "mdy"
      dateStyle.foreach(_.split(',').map(_.trim.toLowerCase).foreach {
        case s @ ("iso" | "sql" | "postgres") => style = s
        case "german" => style = "german"; order = "dmy"
        case o @ ("mdy" | "dmy" | "ymd") => order = o
        case ("us") => order = "mdy"
        case ("european" | "euro") => order = "dmy"
        case _ =>
      })
      Fmt(zone, style, order,
        byteaEscape = byteaOutput.exists(_.equalsIgnoreCase("escape")),
        extraFloatDigits = extraFloatDigits.flatMap(_.toIntOption).getOrElse(1))
    }
  }

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  /** pg TIME text from nanos-since-midnight (the SURVEY §1 TIME
    * encoding: LongType + pg.type=time metadata).
    */
  def encodeTime(nanos: Long): String = {
    val us = nanos / 1000
    val h = us / 3600000000L
    val m = (us % 3600000000L) / 60000000L
    val s = (us % 60000000L) / 1000000L
    val frac = us % 1000000L
    val base = "%02d:%02d:%02d".format(h, m, s)
    if (frac == 0) base
    else base + "." + "%06d".format(frac).reverse.dropWhile(_ == '0').reverse
  }

  /** Field-aware encode: honors pg.type=time metadata and the session
    * timezone for timestamptz (pg renders TIMESTAMPTZ at the TimeZone
    * GUC with its UTC offset; reference: set_show.rs TimeZone handling).
    */
  def encodeField(v: Any, f: StructField, zone: java.time.ZoneId): Option[String] =
    encodeField(v, f, Fmt(zone = zone))

  def encodeField(v: Any, f: StructField,
      fmt: Fmt = Fmt.default): Option[String] =
    if (v == null) None
    else if (PgType.isTimeField(f)) Some(encodeTime(v.asInstanceOf[Long]))
    // geometry (EWKB bytes): text form is uppercase hex EWKB, exactly
    // PostGIS's geometry output function (reference geo surface,
    // arrow-pg/src/geo_encoder.rs — its WKB arrays render the same way)
    else if (PgType.isGeometryField(f))
      Some(graft.functions.Geo.bytesToHex(v.asInstanceOf[Array[Byte]]))
    else f.dataType match {
      case TimestampType =>
        val instant = v match {
          case t: Timestamp => t.toInstant
          case t: Instant => t
        }
        Some(formatTsTz(instant, fmt))
      case _ => encode(v, f.dataType, fmt)
    }

  /** pg timestamptz text at a zone: "yyyy-MM-dd HH:mm:ss[.ffffff]±HH[:MM]". */
  def formatTsTz(instant: Instant, zone: java.time.ZoneId): String =
    formatTsTz(instant, Fmt(zone = zone))

  def formatTsTz(instant: Instant, fmt: Fmt): String = {
    val zoned = instant.atZone(fmt.zone)
    val base = formatTs(zoned.toLocalDateTime, fmt)
    val totalSec = zoned.getOffset.getTotalSeconds
    val sign = if (totalSec < 0) "-" else "+"
    val abs = math.abs(totalSec)
    val hh = abs / 3600
    val mm = (abs % 3600) / 60
    base + sign + "%02d".format(hh) + (if (mm != 0) ":%02d".format(mm) else "")
  }

  /** Encode one value of the given Spark type to pg text format. */
  def encode(v: Any, dt: DataType, fmt: Fmt = Fmt.default): Option[String] =
    if (v == null) None
    else Some(dt match {
      case NullType => return None
      case BooleanType => if (v.asInstanceOf[Boolean]) "t" else "f"
      case ByteType | ShortType | IntegerType | LongType => v.toString
      case FloatType => formatFloat(v.asInstanceOf[Float].toDouble, isFloat4 = true, fmt.extraFloatDigits)
      case DoubleType => formatFloat(v.asInstanceOf[Double], isFloat4 = false, fmt.extraFloatDigits)
      case _: DecimalType => v.asInstanceOf[java.math.BigDecimal].toPlainString
      case StringType | _: CharType | _: VarcharType => v.toString
      case BinaryType => formatBytea(v.asInstanceOf[Array[Byte]], fmt.byteaEscape)
      case DateType => v match {
        case d: Date => formatDate(d.toLocalDate, fmt)
        case d: LocalDate => formatDate(d, fmt)
      }
      case TimestampNTZType => v match {
        case t: LocalDateTime => formatTs(t, fmt)
        case t: Timestamp => formatTs(t.toLocalDateTime, fmt)
      }
      case TimestampType => v match {
        // session tz is UTC throughout; pg prints tz-aware values with offset
        case t: Timestamp => formatTs(t.toInstant.atOffset(ZoneOffset.UTC).toLocalDateTime, fmt) + "+00"
        case t: Instant => formatTs(t.atOffset(ZoneOffset.UTC).toLocalDateTime, fmt) + "+00"
      }
      case dt: DayTimeIntervalType =>
        // a day-leading type renders its whole days as pg days
        // ('35 days', not '840:00:00') — see dayTimeParts
        val us = v.asInstanceOf[Duration].toNanos / 1000
        val (dd, rest) = graft.functions.PgFormatExpressions.dayTimeParts(us, dt)
        formatInterval(0, dd, rest)
      case _: YearMonthIntervalType => formatYearMonthInterval(v.asInstanceOf[Period])
      case CalendarIntervalType =>
        val ci = v.asInstanceOf[CalendarInterval]
        formatInterval(ci.months, ci.days, ci.microseconds)
      case ArrayType(el, _) => encodeArray(v.asInstanceOf[scala.collection.Seq[Any]], el, fmt)
      case st: StructType => encodeStruct(v.asInstanceOf[Row], st)
      case MapType(kt, vt, _) => encodeMap(v.asInstanceOf[scala.collection.Map[Any, Any]], kt, vt)
      case other => throw new IllegalArgumentException(s"Unsupported type $other")
    })

  private def formatTs(t: LocalDateTime): String = formatTs(t, Fmt.default)

  private def formatTs(t: LocalDateTime, fmt: Fmt): String = {
    val micros = t.getNano / 1000
    val frac =
      if (micros == 0) ""
      else "." + "%06d".format(micros).reverse.dropWhile(_ == '0').reverse
    val time = "%02d:%02d:%02d".format(t.getHour, t.getMinute, t.getSecond) + frac
    fmt.dateStyle match {
      case "iso" => t.format(tsFmt) + frac
      case "german" => formatDate(t.toLocalDate, fmt) + " " + time
      case "sql" => formatDate(t.toLocalDate, fmt) + " " + time
      case "postgres" =>
        // "Wed Mar 01 14:30:00 2024" (day-of-week style; deviation:
        // tz-aware values keep the ISO ±HH offset suffix rather than
        // a zone abbreviation)
        val dow = t.getDayOfWeek.getDisplayName(
          java.time.format.TextStyle.SHORT, java.util.Locale.ENGLISH)
        val mon = t.getMonth.getDisplayName(
          java.time.format.TextStyle.SHORT, java.util.Locale.ENGLISH)
        s"$dow $mon %02d".format(t.getDayOfMonth) + s" $time ${t.getYear}"
    }
  }

  /** pg DateStyle-aware DATE text. */
  private def formatDate(d: LocalDate, fmt: Fmt): String = fmt.dateStyle match {
    case "iso" => d.format(dateFmt)
    case "german" => "%02d.%02d.%04d".format(d.getDayOfMonth, d.getMonthValue, d.getYear)
    case "sql" =>
      if (fmt.dateOrder == "dmy") "%02d/%02d/%04d".format(d.getDayOfMonth, d.getMonthValue, d.getYear)
      else "%02d/%02d/%04d".format(d.getMonthValue, d.getDayOfMonth, d.getYear)
    case "postgres" =>
      if (fmt.dateOrder == "dmy") "%02d-%02d-%04d".format(d.getDayOfMonth, d.getMonthValue, d.getYear)
      else "%02d-%02d-%04d".format(d.getMonthValue, d.getDayOfMonth, d.getYear)
  }

  /** bytea_output: hex (default) or pg escape format (printables
    * verbatim, backslash doubled, the rest octal-escaped). */
  private def formatBytea(b: Array[Byte], escape: Boolean): String =
    if (!escape) "\\x" + b.map("%02x".format(_)).mkString
    else b.map { x =>
      val c = x & 0xff
      if (c == '\\') "\\\\"
      else if (c >= 32 && c <= 126) c.toChar.toString
      else "\\%03o".format(c)
    }.mkString

  /** pg float text (Ryu-style): shortest round-trip digits, plain
    * decimal within the pg exponent window, `d.ddde±XX` outside it.
    * pg prints `0.0001` (not `1.0E-4`) and `1e-05`; the decimal window
    * is exponent ∈ [-4, 15] for float8 and [-4, 5] for float4
    * (matching pg's float8out/float4out Ryu output).
    */
  def formatFloat(d: Double, isFloat4: Boolean, extraFloatDigits: Int = 1): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else if (d == 0.0) { if (1 / d < 0) "-0" else "0" }
    else {
      val neg = d < 0
      // extra_float_digits ≥ 1 → shortest round-trip (Java's toString);
      // ≤ 0 → pg's pre-Ryu `%.*g` with DIG+n significant digits
      val ndig =
        if (extraFloatDigits >= 1) 0
        else math.max(1, (if (isFloat4) 6 else 15) + extraFloatDigits)
      val s =
        if (ndig > 0)
          new java.math.BigDecimal(math.abs(d))
            .round(new java.math.MathContext(ndig)).toString
        else if (isFloat4) java.lang.Float.toString(math.abs(d).toFloat)
        else java.lang.Double.toString(math.abs(d))
      val (mant, exp) =
        if (s.contains("E")) { val Array(m, e) = s.split("E"); (m, e.toInt) }
        else (s, 0)
      val dot = mant.indexOf('.')
      val digits0 = mant.replace(".", "")
      val intLen = if (dot < 0) mant.length else dot
      val stripped = digits0.dropWhile(_ == '0')
      val lead = digits0.length - stripped.length
      val e10 = intLen + exp - lead - 1 // exponent of first significant digit
      val sig0 = stripped.reverse.dropWhile(_ == '0').reverse
      val sig = if (sig0.isEmpty) "0" else sig0
      // %g switches to scientific at the precision; Ryu at the pg window
      val maxDecimalExp =
        if (ndig > 0) ndig - 1 else if (isFloat4) 5 else 15
      val body =
        if (e10 > maxDecimalExp || e10 < -4) {
          val m = if (sig.length == 1) sig else sig.head + "." + sig.tail
          m + "e" + (if (e10 < 0) "-" else "+") + "%02d".format(math.abs(e10))
        } else if (e10 >= sig.length - 1) {
          sig + "0" * (e10 - sig.length + 1)
        } else if (e10 >= 0) {
          sig.substring(0, e10 + 1) + "." + sig.substring(e10 + 1)
        } else {
          "0." + "0" * (-e10 - 1) + sig
        }
      (if (neg) "-" else "") + body
    }

  /** pg interval text, verbose-ish style: "1 year 2 mons 3 days 04:05:06".
    * pg pluralizes every value except exactly 1 ('-1 days', live-pg
    * pinned), and prefixes the time part with an explicit '+' when an
    * earlier field is negative ('-1 days +05:00:00').
    */
  def formatInterval(months: Int, days: Int, micros: Long): String = {
    val sb = new StringBuilder
    val years = months / 12
    val mons = months % 12
    if (years != 0) sb.append(s"$years year${if (years != 1) "s" else ""} ")
    if (mons != 0) sb.append(s"$mons mon${if (mons != 1) "s" else ""} ")
    if (days != 0) sb.append(s"$days day${if (days != 1) "s" else ""} ")
    if (micros != 0 || sb.isEmpty) {
      val neg = micros < 0
      val am = math.abs(micros)
      val h = am / 3600000000L
      val m = (am % 3600000000L) / 60000000L
      val s = (am % 60000000L) / 1000000L
      val us = am % 1000000L
      sb.append(if (neg) "-" else if (days < 0 || months < 0) "+" else "")
      sb.append("%02d:%02d:%02d".format(h, m, s))
      if (us != 0) sb.append("." + "%06d".format(us).reverse.dropWhile(_ == '0').reverse)
    }
    sb.toString.trim
  }

  private def formatDayTimeInterval(d: Duration): String =
    formatInterval(0, 0, d.toNanos / 1000)

  private def formatYearMonthInterval(p: Period): String =
    formatInterval(p.getYears * 12 + p.getMonths, 0, 0)

  /** pg array text: {a,b,NULL}; elements quoted when they contain
    * specials (reference regression: `{NULL}` array — encoder.rs tests).
    */
  def encodeArray(els: scala.collection.Seq[Any], elType: DataType,
      fmt: Fmt = Fmt.default): String =
    els.map { el =>
      encode(el, elType, fmt) match {
        case None => "NULL"
        case Some(s) => quoteArrayElement(s, elType)
      }
    }.mkString("{", ",", "}")

  private def needsQuote(s: String): Boolean =
    s.isEmpty || s.equalsIgnoreCase("null") ||
      s.exists(c => c == ',' || c == '{' || c == '}' || c == '"' || c == '\\' || c.isWhitespace)

  private def quoteArrayElement(s: String, elType: DataType): String = elType match {
    // nested sub-arrays render bare: pg multidim text is {{1,2},{3,4}}
    case _: ArrayType => s
    case StringType | _: CharType | _: VarcharType | BinaryType | _: StructType |
         CalendarIntervalType | _: DayTimeIntervalType | _: YearMonthIntervalType |
         TimestampType | TimestampNTZType if needsQuote(s) || s.contains("\\x") =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case _ if needsQuote(s) =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case _ => s
  }

  /** pg composite text: (a,b); NULL fields empty; quoting like arrays
    * (reference: arrow-pg/src/struct_encoder.rs:74-160).
    */
  def encodeStruct(row: Row, st: StructType): String =
    st.fields.zipWithIndex.map { case (fld, i) =>
      encode(if (row.isNullAt(i)) null else row.get(i), fld.dataType) match {
        case None => ""
        case Some(s) =>
          if (s.isEmpty || s.exists(c => c == ',' || c == '(' || c == ')' || c == '"' || c == '\\' || c.isWhitespace))
            "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          else s
      }
    }.mkString("(", ",", ")")

  /** Maps have no pg type; hstore-style "k"=>"v" text. */
  def encodeMap(m: scala.collection.Map[Any, Any], kt: DataType, vt: DataType): String =
    m.map { case (k, v) =>
      val ks = encode(k, kt).getOrElse("NULL")
      val vs = encode(v, vt).map(s => "\"" + s + "\"").getOrElse("NULL")
      "\"" + ks + "\"=>" + vs
    }.mkString(", ")
}
