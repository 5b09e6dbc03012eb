package graft.pgwire

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.sql.{Date, Timestamp}
import java.time.{Duration, Instant, LocalDate, LocalDateTime, Period, ZoneOffset}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Spark Row values → PostgreSQL binary-format wire bytes
  * (format code 1 in Bind/RowDescription). Matches pg's canonical
  * binary encodings: big-endian integers, 2000-01-01 epoch for
  * date/timestamp, base-10000 digit groups for numeric, dimensioned
  * element lists for arrays, (oid,len,bytes) tuples for records.
  * The reference gets these from pgwire's ToSqlBinary; same contract.
  */
object BinaryEncoder {

  val PG_EPOCH_DAYS: Long = LocalDate.of(2000, 1, 1).toEpochDay
  val PG_EPOCH_MICROS: Long = PG_EPOCH_DAYS * 86400L * 1000000L

  def be2(v: Int): Array[Byte] = ByteBuffer.allocate(2).putShort(v.toShort).array()
  def be4(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()
  def be8(v: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(v).array()

  /** Encode one value to pg binary; None = NULL. */
  def encode(v: Any, dt: DataType): Option[Array[Byte]] =
    if (v == null) None
    else Some(dt match {
      case NullType => return None
      case BooleanType => Array[Byte](if (v.asInstanceOf[Boolean]) 1 else 0)
      case ByteType => be2(v.asInstanceOf[Byte].toInt)
      case ShortType => be2(v.asInstanceOf[Short].toInt)
      case IntegerType => be4(v.asInstanceOf[Int])
      case LongType => be8(v.asInstanceOf[Long])
      case FloatType => be4(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
      case DoubleType => be8(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case _: DecimalType => encodeNumeric(v.asInstanceOf[java.math.BigDecimal])
      case StringType | _: CharType | _: VarcharType => v.toString.getBytes("UTF-8")
      case BinaryType => v.asInstanceOf[Array[Byte]]
      case DateType =>
        val days = v match {
          case d: Date => d.toLocalDate.toEpochDay
          case d: LocalDate => d.toEpochDay
        }
        be4((days - PG_EPOCH_DAYS).toInt)
      case TimestampNTZType =>
        val micros = v match {
          case t: LocalDateTime =>
            t.toEpochSecond(ZoneOffset.UTC) * 1000000L + t.getNano / 1000
          case t: Timestamp => t.getTime * 1000 + (t.getNanos % 1000000) / 1000
        }
        be8(micros - PG_EPOCH_MICROS)
      case TimestampType =>
        val micros = v match {
          case t: Timestamp => t.getTime * 1000 + (t.getNanos % 1000000) / 1000
          case t: Instant => t.getEpochSecond * 1000000L + t.getNano / 1000
        }
        be8(micros - PG_EPOCH_MICROS)
      case _: DayTimeIntervalType =>
        val d = v.asInstanceOf[Duration]
        intervalBytes(0, 0, d.toNanos / 1000)
      case _: YearMonthIntervalType =>
        val p = v.asInstanceOf[Period]
        intervalBytes(p.getYears * 12 + p.getMonths, 0, 0)
      case CalendarIntervalType =>
        val ci = v.asInstanceOf[CalendarInterval]
        intervalBytes(ci.months, ci.days, ci.microseconds)
      case ArrayType(el, _) => encodeArray(v.asInstanceOf[scala.collection.Seq[Any]], el)
      case st: StructType => encodeRecord(v.asInstanceOf[Row], st)
      case other =>
        // no binary form (e.g. maps): fall back to text bytes
        TextEncoder.encode(v, other).getOrElse("").getBytes("UTF-8")
    })

  /** interval: micros int64, days int32, months int32. */
  def intervalBytes(months: Int, days: Int, micros: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(16)
    b.putLong(micros); b.putInt(days); b.putInt(months)
    b.array()
  }

  /** pg numeric binary: ndigits, weight, sign, dscale, base-10000 digits. */
  def encodeNumeric(bd: java.math.BigDecimal): Array[Byte] = {
    val dscale = math.max(bd.scale, 0)
    val neg = bd.signum < 0
    val abs = bd.abs.stripTrailingZeros
    if (abs.unscaledValue.signum == 0)
      return be2(0) ++ be2(0) ++ be2(0) ++ be2(dscale)
    // shift into an integer count of base-10000 groups
    val scale4 = ((abs.scale + 3) / 4) * 4
    val scaled = abs.movePointRight(scale4).toBigIntegerExact
    var digits = List.empty[Int]
    var rem = scaled
    val tenK = java.math.BigInteger.valueOf(10000)
    while (rem.signum > 0) {
      val Array(q, r) = rem.divideAndRemainder(tenK)
      digits = r.intValue :: digits
      rem = q
    }
    val weight = digits.length - 1 - scale4 / 4
    // drop trailing zero groups
    val trimmed = digits.reverse.dropWhile(_ == 0).reverse
    val out = new ByteArrayOutputStream()
    out.write(be2(trimmed.length))
    out.write(be2(weight))
    out.write(be2(if (neg) 0x4000 else 0))
    out.write(be2(dscale))
    trimmed.foreach(d => out.write(be2(d)))
    out.toByteArray
  }

  /** pg array binary: ndim, hasnull, eloid, dims, elements. */
  def encodeArray(els: scala.collection.Seq[Any], elType: DataType): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val hasNull = els.exists(_ == null)
    out.write(be4(1))
    out.write(be4(if (hasNull) 1 else 0))
    out.write(be4(PgType.oidOf(elType)))
    out.write(be4(els.length))
    out.write(be4(1)) // lower bound
    els.foreach { el =>
      encode(el, elType) match {
        case None => out.write(be4(-1))
        case Some(b) => out.write(be4(b.length)); out.write(b)
      }
    }
    out.toByteArray
  }

  /** pg record binary: nfields, then (oid, len, bytes) per field. */
  def encodeRecord(row: Row, st: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be4(st.fields.length))
    st.fields.zipWithIndex.foreach { case (fld, i) =>
      out.write(be4(PgType.oidOf(fld.dataType)))
      encode(if (row.isNullAt(i)) null else row.get(i), fld.dataType) match {
        case None => out.write(be4(-1))
        case Some(b) => out.write(be4(b.length)); out.write(b)
      }
    }
    out.toByteArray
  }
}
