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
  def encodeField(v: Any, f: StructField,
      zone: java.time.ZoneId = ZoneOffset.UTC): Option[String] =
    if (v == null) None
    else if (PgType.isTimeField(f)) Some(encodeTime(v.asInstanceOf[Long]))
    else f.dataType match {
      case TimestampType =>
        val instant = v match {
          case t: Timestamp => t.toInstant
          case t: Instant => t
        }
        Some(formatTsTz(instant, zone))
      case _ => encode(v, f.dataType)
    }

  /** pg timestamptz text at a zone: "yyyy-MM-dd HH:mm:ss[.ffffff]±HH[:MM]". */
  def formatTsTz(instant: Instant, zone: java.time.ZoneId): String = {
    val zoned = instant.atZone(zone)
    val base = formatTs(zoned.toLocalDateTime)
    val totalSec = zoned.getOffset.getTotalSeconds
    val sign = if (totalSec < 0) "-" else "+"
    val abs = math.abs(totalSec)
    val hh = abs / 3600
    val mm = (abs % 3600) / 60
    base + sign + "%02d".format(hh) + (if (mm != 0) ":%02d".format(mm) else "")
  }

  /** Encode one value of the given Spark type to pg text format. */
  def encode(v: Any, dt: DataType): Option[String] =
    if (v == null) None
    else Some(dt match {
      case NullType => return None
      case BooleanType => if (v.asInstanceOf[Boolean]) "t" else "f"
      case ByteType | ShortType | IntegerType | LongType => v.toString
      case FloatType => formatFloat(v.asInstanceOf[Float].toDouble, isFloat4 = true)
      case DoubleType => formatFloat(v.asInstanceOf[Double], isFloat4 = false)
      case _: DecimalType => v.asInstanceOf[java.math.BigDecimal].toPlainString
      case StringType | _: CharType | _: VarcharType => v.toString
      case BinaryType => "\\x" + v.asInstanceOf[Array[Byte]].map("%02x".format(_)).mkString
      case DateType => v match {
        case d: Date => d.toLocalDate.format(dateFmt)
        case d: LocalDate => d.format(dateFmt)
      }
      case TimestampNTZType => v match {
        case t: LocalDateTime => formatTs(t)
        case t: Timestamp => formatTs(t.toLocalDateTime)
      }
      case TimestampType => v match {
        // session tz is UTC throughout; pg prints tz-aware values with offset
        case t: Timestamp => formatTs(t.toInstant.atOffset(ZoneOffset.UTC).toLocalDateTime) + "+00"
        case t: Instant => formatTs(t.atOffset(ZoneOffset.UTC).toLocalDateTime) + "+00"
      }
      case _: DayTimeIntervalType => formatDayTimeInterval(v.asInstanceOf[Duration])
      case _: YearMonthIntervalType => formatYearMonthInterval(v.asInstanceOf[Period])
      case CalendarIntervalType =>
        val ci = v.asInstanceOf[CalendarInterval]
        formatInterval(ci.months, ci.days, ci.microseconds)
      case ArrayType(el, _) => encodeArray(v.asInstanceOf[scala.collection.Seq[Any]], el)
      case st: StructType => encodeStruct(v.asInstanceOf[Row], st)
      case MapType(kt, vt, _) => encodeMap(v.asInstanceOf[scala.collection.Map[Any, Any]], kt, vt)
      case other => throw new IllegalArgumentException(s"Unsupported type $other")
    })

  private def formatTs(t: LocalDateTime): String = {
    val base = t.format(tsFmt)
    val micros = t.getNano / 1000
    if (micros == 0) base
    else base + "." + "%06d".format(micros).reverse.dropWhile(_ == '0').reverse
  }

  /** pg float text (Ryu-style): shortest round-trip digits, plain
    * decimal within the pg exponent window, `d.ddde±XX` outside it.
    * pg prints `0.0001` (not `1.0E-4`) and `1e-05`; the decimal window
    * is exponent ∈ [-4, 15] for float8 and [-4, 5] for float4
    * (matching pg's float8out/float4out Ryu output).
    */
  def formatFloat(d: Double, isFloat4: Boolean): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else if (d == 0.0) { if (1 / d < 0) "-0" else "0" }
    else {
      val neg = d < 0
      // Java's toString is already shortest-round-trip; re-format it.
      val s =
        if (isFloat4) java.lang.Float.toString(math.abs(d).toFloat)
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
      val maxDecimalExp = if (isFloat4) 5 else 15
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

  /** pg interval text, verbose-ish style: "1 year 2 mons 3 days 04:05:06". */
  def formatInterval(months: Int, days: Int, micros: Long): String = {
    val sb = new StringBuilder
    val years = months / 12
    val mons = months % 12
    if (years != 0) sb.append(s"$years year${if (math.abs(years) != 1) "s" else ""} ")
    if (mons != 0) sb.append(s"$mons mon${if (math.abs(mons) != 1) "s" else ""} ")
    if (days != 0) sb.append(s"$days day${if (math.abs(days) != 1) "s" else ""} ")
    if (micros != 0 || sb.isEmpty) {
      val neg = micros < 0
      val am = math.abs(micros)
      val h = am / 3600000000L
      val m = (am % 3600000000L) / 60000000L
      val s = (am % 60000000L) / 1000000L
      val us = am % 1000000L
      sb.append(if (neg) "-" else "")
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
  def encodeArray(els: scala.collection.Seq[Any], elType: DataType): String =
    els.map { el =>
      encode(el, elType) match {
        case None => "NULL"
        case Some(s) => quoteArrayElement(s, elType)
      }
    }.mkString("{", ",", "}")

  private def needsQuote(s: String): Boolean =
    s.isEmpty || s.equalsIgnoreCase("null") ||
      s.exists(c => c == ',' || c == '{' || c == '}' || c == '"' || c == '\\' || c.isWhitespace)

  private def quoteArrayElement(s: String, elType: DataType): String = elType match {
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
