package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC and Avro container file readers for the CLI
  * (`--arrow name:path`, `--avro name:path` — reference registers the
  * same formats, datafusion-postgres-cli/src/main.rs:132-182).
  *
  * Built directly on the arrow-vector / avro jars that ship inside
  * the Spark distribution (no connector needed). Reads materialize on
  * the DRIVER: the CLI's job is registering local files next to the
  * server process, which is exactly the reference CLI's usage. The
  * distributed-scan path for 100 TB stays parquet/csv/json; a size
  * guard refuses files that clearly aren't "registration-sized".
  */
object ArrowAvroSources {

  private val MaxBytes = 1L << 30 // 1 GiB driver-side guard

  private def sizeGuard(path: String, format: String): Unit = {
    val n = Files.size(Paths.get(path))
    require(n <= MaxBytes,
      s"--$format $path is ${n >> 20} MiB; driver-side $format registration is " +
        s"capped at ${MaxBytes >> 20} MiB — convert to parquet for the distributed scan path")
  }

  // ======================================================================
  // Arrow IPC (File format)
  // ======================================================================

  import org.apache.arrow.vector.types.pojo.{ArrowType, Field}

  private def arrowToSpark(f: Field): StructField = {
    val dt: DataType = f.getType match {
      case t: ArrowType.Int => t.getBitWidth match {
        case 8 => ByteType
        case 16 => ShortType
        case 32 => IntegerType
        case _ => LongType
      }
      case t: ArrowType.FloatingPoint =>
        if (t.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE)
          FloatType else DoubleType
      case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Date => DateType
      case t: ArrowType.Timestamp =>
        if (t.getTimezone == null) TimestampNTZType else TimestampType
      case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
      case t: ArrowType.Decimal => DecimalType(t.getPrecision, t.getScale)
      case _: ArrowType.List =>
        ArrayType(arrowToSpark(f.getChildren.get(0)).dataType)
      case other => throw new IllegalArgumentException(
        s"--arrow: unsupported Arrow type $other for field ${f.getName}")
    }
    StructField(f.getName, dt, nullable = f.isNullable)
  }

  /** Arrow object model → Spark external row values. */
  private def convertArrow(v: Any): Any = v match {
    case null => null
    case t: org.apache.arrow.vector.util.Text => t.toString
    case l: java.util.List[_] => l.asScala.map(convertArrow).toSeq
    case b: java.math.BigDecimal => b
    case x => x // primitives, LocalDateTime, epoch-day ints handled by schema
  }

  /** Per-column converter from the Arrow field type: tz-aware
    * timestamp vectors surface raw Longs in their declared unit
    * (getObject on TimeStamp*TZVector returns Long, not a date-time
    * object), DateDay surfaces epoch-day ints, DateMilli surfaces
    * LocalDateTime. */
  private def arrowConverter(f: Field): Any => Any = f.getType match {
    case t: ArrowType.Timestamp if t.getTimezone != null =>
      import org.apache.arrow.vector.types.TimeUnit
      val toInstant: Long => java.time.Instant = t.getUnit match {
        case TimeUnit.SECOND => java.time.Instant.ofEpochSecond(_)
        case TimeUnit.MILLISECOND => java.time.Instant.ofEpochMilli(_)
        case TimeUnit.MICROSECOND => us => java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
        case TimeUnit.NANOSECOND => ns => java.time.Instant.ofEpochSecond(
          Math.floorDiv(ns, 1000000000L), Math.floorMod(ns, 1000000000L))
      }
      { case null => null; case x: java.lang.Long => toInstant(x.longValue()); case x => x }
    case _: ArrowType.Date =>
      { case null => null
        case x: java.lang.Integer => java.time.LocalDate.ofEpochDay(x.longValue())
        case x: java.time.LocalDateTime => x.toLocalDate // DateMilliVector
        case x => x }
    case _ => convertArrow
  }

  /** The IPC *file* format opens with the magic "ARROW1"; the *stream*
    * format (conventional extension .arrows) has no magic and must go
    * through ArrowStreamReader — ArrowFileReader requires the footer
    * and throws on stream files. Sniff instead of trusting extensions. */
  private def isArrowFileFormat(path: String): Boolean = {
    val in = Files.newInputStream(Paths.get(path))
    try {
      val magic = new Array[Byte](6)
      var off = 0
      while (off < 6) {
        val n = in.read(magic, off, 6 - off)
        if (n < 0) return false
        off += n
      }
      java.util.Arrays.equals(magic, "ARROW1".getBytes("US-ASCII"))
    } finally in.close()
  }

  def readArrow(spark: SparkSession, path: String): DataFrame = {
    sizeGuard(path, "arrow")
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val ch = FileChannel.open(Paths.get(path))
    try {
      val reader: org.apache.arrow.vector.ipc.ArrowReader =
        if (isArrowFileFormat(path))
          new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
        else
          new org.apache.arrow.vector.ipc.ArrowStreamReader(
            java.nio.channels.Channels.newInputStream(ch), alloc)
      try {
        val root = reader.getVectorSchemaRoot
        val fields = root.getSchema.getFields.asScala.toSeq
        val schema = StructType(fields.map(arrowToSpark))
        val convs = fields.map(arrowConverter)
        val rows = new java.util.ArrayList[Row]()
        while (reader.loadNextBatch()) {
          val vectors = root.getFieldVectors.asScala.toSeq
          var i = 0
          val n = root.getRowCount
          while (i < n) {
            rows.add(Row.fromSeq(vectors.zip(convs).map { case (v, conv) =>
              conv(v.getObject(i))
            }))
            i += 1
          }
        }
        spark.createDataFrame(rows, schema)
      } finally reader.close()
    } finally { ch.close(); alloc.close() }
  }

  // ======================================================================
  // Avro container files
  // ======================================================================

  import org.apache.avro.{LogicalTypes, Schema => ASchema}
  import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}

  private def avroToSpark(s: ASchema): (DataType, Boolean) = s.getType match {
    case ASchema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != ASchema.Type.NULL)
      require(nonNull.size == 1,
        s"--avro: only [null, T] unions are supported, got $s")
      val (dt, _) = avroToSpark(nonNull.head)
      (dt, true)
    case ASchema.Type.BOOLEAN => (BooleanType, false)
    case ASchema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case ASchema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
        (TimestampType, false)
      case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
        (TimestampNTZType, false)
      case _ => (LongType, false)
    }
    case ASchema.Type.FLOAT => (FloatType, false)
    case ASchema.Type.DOUBLE => (DoubleType, false)
    case ASchema.Type.STRING | ASchema.Type.ENUM => (StringType, false)
    case ASchema.Type.BYTES | ASchema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
      case _ => (BinaryType, false)
    }
    case ASchema.Type.ARRAY =>
      val (el, elNull) = avroToSpark(s.getElementType)
      (ArrayType(el, containsNull = elNull), false)
    case ASchema.Type.MAP =>
      val (v, vNull) = avroToSpark(s.getValueType)
      (MapType(StringType, v, valueContainsNull = vNull), false)
    case other => throw new IllegalArgumentException(
      s"--avro: unsupported Avro type $other")
  }

  private def convertAvro(v: Any, s: ASchema): Any = v match {
    case null => null
    case _ if s.getType == ASchema.Type.UNION =>
      convertAvro(v, s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get)
    case u: org.apache.avro.util.Utf8 => u.toString
    case e: GenericData.EnumSymbol => e.toString
    case b: java.nio.ByteBuffer =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          new java.math.BigDecimal(new java.math.BigInteger(
            { val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a }),
            d.getScale)
        case _ =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
      }
    case f: GenericData.Fixed => s.getLogicalType match {
      // Spark's own Avro writer encodes decimals as FIXED by default
      case d: LogicalTypes.Decimal =>
        new java.math.BigDecimal(new java.math.BigInteger(f.bytes()), d.getScale)
      case _ => f.bytes().clone()
    }
    case i: java.lang.Integer if s.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
      java.time.LocalDate.ofEpochDay(i.longValue())
    case l: java.lang.Long => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis => java.time.Instant.ofEpochMilli(l)
      case _: LogicalTypes.TimestampMicros =>
        java.time.Instant.ofEpochSecond(Math.floorDiv(l, 1000000L),
          Math.floorMod(l, 1000000L) * 1000L)
      case _: LogicalTypes.LocalTimestampMillis =>
        java.time.LocalDateTime.ofInstant(java.time.Instant.ofEpochMilli(l),
          java.time.ZoneOffset.UTC)
      case _: LogicalTypes.LocalTimestampMicros =>
        java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochSecond(Math.floorDiv(l, 1000000L),
            Math.floorMod(l, 1000000L) * 1000L), java.time.ZoneOffset.UTC)
      case _ => l
    }
    case a: java.util.Collection[_] =>
      a.asScala.map(convertAvro(_, s.getElementType)).toSeq
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> convertAvro(x, s.getValueType) }.toMap
    case x => x
  }

  def readAvro(spark: SparkSession, path: String): DataFrame = {
    sizeGuard(path, "avro")
    val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try {
      val aschema = reader.getSchema
      require(aschema.getType == ASchema.Type.RECORD,
        s"--avro: top-level schema must be a record, got ${aschema.getType}")
      val afields = aschema.getFields.asScala.toSeq
      val schema = StructType(afields.map { f =>
        val (dt, nullable) = avroToSpark(f.schema())
        StructField(f.name(), dt, nullable)
      })
      val rows = new java.util.ArrayList[Row]()
      while (reader.hasNext) {
        val rec = reader.next()
        rows.add(Row.fromSeq(afields.map(f => convertAvro(rec.get(f.pos()), f.schema()))))
      }
      spark.createDataFrame(rows, schema)
    } finally reader.close()
  }
}
