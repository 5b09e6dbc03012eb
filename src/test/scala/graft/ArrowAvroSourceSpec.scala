package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import graft.sources.ArrowAvroSources

/** Round-trip genuine Arrow IPC and Avro container files through the
  * CLI source readers: files are WRITTEN with the same in-distribution
  * libraries (arrow-vector / avro), so the bytes on disk are the real
  * formats, not fixtures.
  */
class ArrowAvroSourceSpec extends SparkSpec {

  test("arrow IPC file: ints, strings, doubles, bools, nulls round-trip") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}

    val path = Files.createTempFile("graft_arrow", ".arrow")
    val alloc = new RootAllocator()
    val fields = Seq(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("name", FieldType.nullable(ArrowType.Utf8.INSTANCE), null),
      new Field("score", FieldType.nullable(
        new ArrowType.FloatingPoint(org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)), null),
      new Field("ok", FieldType.nullable(ArrowType.Bool.INSTANCE), null))
    val schema = new Schema(fields.asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    val ch = java.nio.channels.FileChannel.open(path,
      java.nio.file.StandardOpenOption.WRITE, java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    val writer = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
    writer.start()
    val id = root.getVector("id").asInstanceOf[BigIntVector]
    val name = root.getVector("name").asInstanceOf[VarCharVector]
    val score = root.getVector("score").asInstanceOf[Float8Vector]
    val ok = root.getVector("ok").asInstanceOf[BitVector]
    id.allocateNew(3); name.allocateNew(); score.allocateNew(3); ok.allocateNew(3)
    Seq(1L, 2L, 3L).zipWithIndex.foreach { case (v, i) => id.setSafe(i, v) }
    name.setSafe(0, "alpha".getBytes); name.setNull(1); name.setSafe(2, "gamma".getBytes)
    score.setSafe(0, 1.5); score.setSafe(1, -2.25); score.setSafe(2, 0.0)
    ok.setSafe(0, 1); ok.setSafe(1, 0); ok.setSafe(2, 1)
    root.setRowCount(3)
    writer.writeBatch(); writer.end(); writer.close(); ch.close()
    root.close(); alloc.close()

    val df = ArrowAvroSources.readArrow(spark, path.toString)
    assert(df.schema.fieldNames.toSeq === Seq("id", "name", "score", "ok"))
    val rows = df.orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows(0).getLong(0) === 1L && rows(0).getString(1) === "alpha" &&
      rows(0).getDouble(2) === 1.5 && rows(0).getBoolean(3))
    assert(rows(1).isNullAt(1) && !rows(1).getBoolean(3))
    Files.delete(path)
  }

  test("avro container file: primitives, logical date/timestamp, arrays, unions") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter

    val aschema = SchemaBuilder.record("row").fields()
      .requiredLong("id")
      .optionalString("label")
      .requiredDouble("x")
      .name("d").`type`(org.apache.avro.LogicalTypes.date()
        .addToSchema(org.apache.avro.Schema.create(org.apache.avro.Schema.Type.INT))).noDefault()
      .name("ts").`type`(org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(org.apache.avro.Schema.create(org.apache.avro.Schema.Type.LONG))).noDefault()
      .name("tags").`type`().array().items().stringType().noDefault()
      .endRecord()

    val f = Files.createTempFile("graft_avro", ".avro").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](aschema))
    w.create(aschema, f)
    def rec(id: Long, label: String, x: Double, epochDay: Int, us: Long, tags: Seq[String]): GenericRecord = {
      val r = new GenericData.Record(aschema)
      r.put("id", id); r.put("label", label); r.put("x", x)
      r.put("d", epochDay); r.put("ts", us)
      r.put("tags", tags.asJava)
      r
    }
    w.append(rec(1L, "a", 1.5, 20000, 1754993045123456L, Seq("p", "q")))
    w.append(rec(2L, null, -1.0, 0, 0L, Seq.empty))
    w.close()

    val df = ArrowAvroSources.readAvro(spark, f.getPath)
    assert(df.schema("label").nullable)
    assert(df.schema("d").dataType.typeName === "date")
    assert(df.schema("ts").dataType.typeName === "timestamp")
    val rows = df.orderBy("id").collect()
    assert(rows(0).getLong(0) === 1L && rows(0).getString(1) === "a")
    assert(rows(0).getDate(3).toLocalDate === java.time.LocalDate.ofEpochDay(20000))
    assert(rows(0).getTimestamp(4).toInstant.toEpochMilli === 1754993045123L)
    assert(rows(0).getSeq[String](5) === Seq("p", "q"))
    assert(rows(1).isNullAt(1) && rows(1).getSeq[String](5) === Seq.empty)
    f.delete()
  }

  test("--avro registration serves a real Avro file over the wire") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val aschema = SchemaBuilder.record("m").fields()
      .requiredString("k").requiredLong("v").endRecord()
    val f = Files.createTempFile("graft_cli_avro", ".avro").toFile
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](aschema))
    w.create(aschema, f)
    Seq(("a", 1L), ("b", 2L), ("c", 3L)).foreach { case (k, v) =>
      val r = new GenericData.Record(aschema); r.put("k", k); r.put("v", v); w.append(r)
    }
    w.close()
    val (_, server) = Cli.serve(Array(
      "--avro", s"metrics:${f.getPath}", "--host", "127.0.0.1", "-p", "0"))
    try {
      val c = new Client(server.boundPort)
      c.startup()
      assert(c.query("SELECT sum(v) FROM metrics").rows === Seq(Seq(Some("6"))))
      assert(c.query("SELECT k FROM metrics WHERE v = 2").rows === Seq(Seq(Some("b"))))
      c.close()
    } finally { server.stop(); f.delete() }
  }

  test("size guard refuses oversized files with a clear message") {
    val path = Files.createTempFile("graft_arrow_big", ".arrow")
    try {
      val raf = new java.io.RandomAccessFile(path.toFile, "rw")
      raf.setLength((1L << 30) + 1)
      raf.close()
      val e = intercept[IllegalArgumentException](
        ArrowAvroSources.readArrow(spark, path.toString))
      assert(e.getMessage.contains("capped"))
    } finally Files.delete(path)
  }
}
