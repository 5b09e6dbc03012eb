package graft

import java.nio.ByteBuffer
import java.time.{Duration, LocalDate, LocalDateTime}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.pgwire.{BinaryEncoder, PgType, TextEncoder}

/** Codec regression matrix ported from the reference's encoder tests
  * (arrow-pg/src/encoder.rs:536-738, list_encoder.rs,
  * struct_encoder.rs:74-235, datatypes.rs:241-364): `{NULL}` arrays,
  * NULL structs, element quoting, pg float text format, numeric
  * binary base-10000 groups, the 2000-01-01 wire epoch, oid-alias
  * RowDescription OIDs.
  */
class CodecSpec extends AnyFunSuite {

  private def text(v: Any, dt: DataType): String =
    TextEncoder.encode(v, dt).getOrElse(fail(s"expected non-null for $v"))

  // ---- type map ----------------------------------------------------------

  test("Spark type → pg OID map matches the SURVEY §1 contract") {
    assert(PgType.oidOf(BooleanType: DataType) === 16)
    assert(PgType.oidOf(ShortType: DataType) === 21)
    assert(PgType.oidOf(IntegerType: DataType) === 23)
    assert(PgType.oidOf(LongType: DataType) === 20)
    assert(PgType.oidOf(FloatType: DataType) === 700)
    assert(PgType.oidOf(DoubleType: DataType) === 701)
    assert(PgType.oidOf(DecimalType(20, 0): DataType) === 1700) // UInt64 widening target
    assert(PgType.oidOf(StringType: DataType) === 25)
    assert(PgType.oidOf(BinaryType: DataType) === 17)
    assert(PgType.oidOf(DateType: DataType) === 1082)
    assert(PgType.oidOf(TimestampNTZType: DataType) === 1114)
    assert(PgType.oidOf(TimestampType: DataType) === 1184)
    assert(PgType.oidOf(ArrayType(StringType): DataType) === 1009)
    assert(PgType.oidOf(ArrayType(IntegerType): DataType) === 1007)
    // ARRAY[NULL] reports text[] like the reference (datatypes.rs:58)
    assert(PgType.oidOf(ArrayType(NullType): DataType) === 1009)
    assert(PgType.oidOf(StructType(Seq(StructField("a", IntegerType))): DataType) === 2249)
  }

  test("oid-alias field metadata overrides the wire OID (regclass=2205)") {
    val plain = StructField("oid", IntegerType)
    val aliased = StructField("oid", IntegerType,
      metadata = new MetadataBuilder().putString(PgType.OID_ALIAS_KEY, "regclass").build())
    assert(PgType.oidOf(plain) === 23)
    assert(PgType.oidOf(aliased) === 2205)
    assert(PgType.oidOf(aliased.copy(metadata =
      new MetadataBuilder().putString(PgType.OID_ALIAS_KEY, "regtype").build())) === 2206)
  }

  test("typlen reports fixed sizes and -1 for varlena") {
    assert(PgType.typlen(16) === 1)
    assert(PgType.typlen(21) === 2)
    assert(PgType.typlen(23) === 4)
    assert(PgType.typlen(20) === 8)
    assert(PgType.typlen(25) === -1)
    assert(PgType.typlen(1700) === -1)
  }

  // ---- text format -------------------------------------------------------

  test("bool/int/string text forms") {
    assert(text(true, BooleanType) === "t")
    assert(text(false, BooleanType) === "f")
    assert(text(42, IntegerType) === "42")
    assert(text(-7L, LongType) === "-7")
    assert(text("hi", StringType) === "hi")
  }

  test("pg float text format (the 1.0E-4 → 0.0001 regression)") {
    assert(text(0.0001d, DoubleType) === "0.0001")
    assert(text(0.00001d, DoubleType) === "1e-05")
    assert(text(1.5d, DoubleType) === "1.5")
    assert(text(1.0d, DoubleType) === "1")
    assert(text(-2.25d, DoubleType) === "-2.25")
    assert(text(1e16d, DoubleType) === "1e+16")
    assert(text(1e15d, DoubleType) === "1000000000000000")
    assert(text(0.0d, DoubleType) === "0")
    assert(text(Double.NaN, DoubleType) === "NaN")
    assert(text(Double.PositiveInfinity, DoubleType) === "Infinity")
    assert(text(Double.NegativeInfinity, DoubleType) === "-Infinity")
    assert(text(1.5f, FloatType) === "1.5")
    assert(text(1e7f, FloatType) === "1e+07")
    assert(text(123456f, FloatType) === "123456")
  }

  test("decimal prints plain (no scientific)") {
    assert(text(new java.math.BigDecimal("12345.6789"), DecimalType(10, 4)) === "12345.6789")
    assert(text(new java.math.BigDecimal("0.0001"), DecimalType(10, 4)) === "0.0001")
  }

  test("bytea hex form") {
    assert(text(Array[Byte](0xde.toByte, 0xad.toByte), BinaryType) === "\\xdead")
  }

  test("date and timestamp text forms (micros trimmed like pg)") {
    assert(text(LocalDate.of(2024, 3, 7), DateType) === "2024-03-07")
    assert(text(LocalDateTime.of(2024, 3, 7, 12, 30, 45), TimestampNTZType) ===
      "2024-03-07 12:30:45")
    assert(text(LocalDateTime.of(2024, 3, 7, 12, 30, 45, 123000000), TimestampNTZType) ===
      "2024-03-07 12:30:45.123")
    assert(text(java.time.Instant.parse("2024-03-07T12:30:45Z"), TimestampType) ===
      "2024-03-07 12:30:45+00")
  }

  test("pg TIME: LongType + pg.type=time metadata (SURVEY §1 contract)") {
    val f = StructField("t", LongType,
      metadata = new MetadataBuilder().putString(PgType.PG_TYPE_KEY, "time").build())
    assert(PgType.oidOf(f) === 1083)
    // 12:30:45.5 = (12*3600 + 30*60 + 45) * 1e9 + 5e8 nanos
    val nanos = (12L * 3600 + 30 * 60 + 45) * 1000000000L + 500000000L
    assert(TextEncoder.encodeField(nanos, f) === Some("12:30:45.5"))
    assert(TextEncoder.encodeTime(0L) === "00:00:00")
    // plain long field without the tag stays int8
    assert(PgType.oidOf(StructField("x", LongType)) === 20)
  }

  test("interval text form") {
    assert(TextEncoder.formatInterval(14, 3, 3600000000L + 61000000L) ===
      "1 year 2 mons 3 days 01:01:01")
    assert(TextEncoder.formatInterval(0, 0, 0) === "00:00:00")
    assert(text(Duration.ofHours(1).plusMinutes(1).plusSeconds(1),
      DayTimeIntervalType()) === "01:01:01")
  }

  test("array text: {NULL}, quoting of specials, empty string") {
    assert(text(Seq(null), ArrayType(StringType)) === "{NULL}")
    assert(text(Seq("a", "b"), ArrayType(StringType)) === "{a,b}")
    assert(text(Seq("a,b"), ArrayType(StringType)) === "{\"a,b\"}")
    assert(text(Seq(""), ArrayType(StringType)) === "{\"\"}")
    assert(text(Seq("null"), ArrayType(StringType)) === "{\"null\"}")
    assert(text(Seq("""say "hi""""), ArrayType(StringType)) === """{"say \"hi\""}""")
    assert(text(Seq(1, 2, null), ArrayType(IntegerType)) === "{1,2,NULL}")
  }

  test("struct/RECORD text: NULL field empty, quoting (struct_encoder.rs)") {
    val st = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    assert(text(Row(1, "x"), st) === "(1,x)")
    assert(text(Row(null, "with space"), st) === "(,\"with space\")")
    assert(text(Row(2, null), st) === "(2,)")
  }

  // ---- binary format -----------------------------------------------------

  private def bin(v: Any, dt: DataType): Array[Byte] =
    BinaryEncoder.encode(v, dt).getOrElse(fail("null"))

  test("integer/float binary are big-endian fixed width") {
    assert(bin(1, IntegerType).toSeq === Seq[Byte](0, 0, 0, 1))
    assert(bin(258L, LongType).toSeq === Seq[Byte](0, 0, 0, 0, 0, 0, 1, 2))
    assert(ByteBuffer.wrap(bin(1.5f, FloatType)).getFloat === 1.5f)
    assert(ByteBuffer.wrap(bin(-2.5d, DoubleType)).getDouble === -2.5d)
    assert(bin(true, BooleanType).toSeq === Seq[Byte](1))
  }

  test("date/timestamp binary use the 2000-01-01 pg epoch") {
    assert(ByteBuffer.wrap(bin(LocalDate.of(2000, 1, 1), DateType)).getInt === 0)
    assert(ByteBuffer.wrap(bin(LocalDate.of(2000, 1, 2), DateType)).getInt === 1)
    assert(ByteBuffer.wrap(bin(LocalDate.of(1999, 12, 31), DateType)).getInt === -1)
    val ts = LocalDateTime.of(2000, 1, 1, 0, 0, 1)
    assert(ByteBuffer.wrap(bin(ts, TimestampNTZType)).getLong === 1000000L)
  }

  test("numeric binary: base-10000 digit groups (12345.678)") {
    val b = ByteBuffer.wrap(bin(new java.math.BigDecimal("12345.678"), DecimalType(10, 3)))
    assert(b.getShort === 3) // ndigits
    assert(b.getShort === 1) // weight
    assert(b.getShort === 0) // sign +
    assert(b.getShort === 3) // dscale
    assert(b.getShort === 1)
    assert(b.getShort === 2345)
    assert(b.getShort === 6780)
  }

  test("numeric binary: zero and negative") {
    val z = ByteBuffer.wrap(bin(new java.math.BigDecimal("0.00"), DecimalType(10, 2)))
    assert(z.getShort === 0); assert(z.getShort === 0)
    assert(z.getShort === 0); assert(z.getShort === 2) // dscale preserved
    val n = ByteBuffer.wrap(bin(new java.math.BigDecimal("-1"), DecimalType(10, 0)))
    assert(n.getShort === 1); assert(n.getShort === 0)
    assert(n.getShort === 0x4000.toShort) // negative sign word
  }

  test("array binary layout: ndim/hasnull/eloid/dims + elements") {
    val b = ByteBuffer.wrap(bin(Seq(1, null), ArrayType(IntegerType)))
    assert(b.getInt === 1) // ndim
    assert(b.getInt === 1) // hasnull
    assert(b.getInt === 23) // int4 element oid
    assert(b.getInt === 2) // dim size
    assert(b.getInt === 1) // lower bound
    assert(b.getInt === 4); assert(b.getInt === 1) // elem 1
    assert(b.getInt === -1) // NULL elem
  }

  test("record binary layout: nfields + (oid,len,bytes)") {
    val st = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val b = ByteBuffer.wrap(bin(Row(7, null), st))
    assert(b.getInt === 2)
    assert(b.getInt === 23); assert(b.getInt === 4); assert(b.getInt === 7)
    assert(b.getInt === 25); assert(b.getInt === -1)
  }

  test("interval binary: micros, days, months") {
    val b = ByteBuffer.wrap(BinaryEncoder.intervalBytes(14, 3, 5000000L))
    assert(b.getLong === 5000000L)
    assert(b.getInt === 3)
    assert(b.getInt === 14)
  }
}
