package graft.queries

import java.nio.file.{Files, Paths}
import graft.{Q, QueryDef, Tables}
import graft.pgwire.{Handlers, PgCatalog, PgFunctions}

/** Oracle-verified queries for the pg-compat surface: the system/math
  * UDF packs (SURVEY §2b/§2c), the pg_catalog emulation (§2a #12-19),
  * the compat SQL rewrites (§2a #20-23), and CSV/JSON source parity
  * (§2a #11). UDF results are pinned against literal oracles; catalog
  * queries against the deterministic OID assignment (sorted table
  * names, 16384+).
  */
object PgCompat {

  private def withUdfs(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    PgFunctions.registerAll(s)
    fn(s, dir)
  }

  /** Fixture memo for the file-source parity queries (q78/q79/q108/
    * q109): each writes region through a real format once per
    * (dir, kind) per JVM, so the TIMED query body only exercises the
    * reader — the thing the query verifies — not the fixture setup
    * (round-8 verdict item: a collect()-based writer inside the timed
    * body benches the wrong code).
    */
  private val fixtureMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
  private def fixture(dir: String, kind: String)(write: => String): String =
    fixtureMemo.computeIfAbsent((dir, kind), _ => write)

  /** Range-partition `df` on `key` with an EXPLICIT partition count so
    * AQE never coalesces it (an explicit numPartitions is exempt from
    * coalescing). Callers place an expensive projection after this and
    * finish with `sortWithinPartitions(key)` — together exactly
    * `orderBy(key)`'s layout, but with the projection guaranteed to run
    * at full parallelism and the range sampler fed narrow raw rows
    * instead of re-executing the projection (which sort-last would).
    * Inert at production scale: defaultParallelism = total cores.
    */
  private def rangeFanout(s: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame, key: String): org.apache.spark.sql.DataFrame =
    graft.Q.rangeFanout(df, key)

  def queries: Seq[QueryDef] = Seq(

    // typed Aggregator UDAF surface (SURVEY §2d "UDF surface"): pg
    // string_agg ORDER BY semantics that collect_list cannot guarantee
    Q.df("q32_ordered_string_agg",
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      graft.functions.PgAggregates.registerAll(s)
      s.sql(
        """SELECT n_regionkey, ordered_string_agg(n_name, n_name) AS names
          |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    },

    Q.df("q70_system_udfs",
      """SELECT '"select"' AS qi_reserved, 'abc' AS qi_plain, '"Abc"' AS qi_mixed,
        |  '"a b"' AS qi_space, 'a|b' AS pi, 'character varying(32)' AS ft_varchar,
        |  'integer' AS ft_int, 'numeric(6,2)' AS ft_num, 'UTF-8' AS enc,
        |  '1206 kB' AS sz, 'public' AS cs, 'postgres' AS cdb,
        |  CAST(1 AS INT) AS pid, true AS htp""".stripMargin) {
      withUdfs((s, _) => s.sql(
        """SELECT quote_ident('select') AS qi_reserved, quote_ident('abc') AS qi_plain,
          |  quote_ident('Abc') AS qi_mixed, quote_ident('a b') AS qi_space,
          |  array_join(parse_ident('a.b'), '|') AS pi, format_type(1043, 36) AS ft_varchar,
          |  format_type(23, -1) AS ft_int, format_type(1700, 393222) AS ft_num,
          |  pg_encoding_to_char(6) AS enc, pg_size_pretty(CAST(1234567 AS BIGINT)) AS sz,
          |  pg_current_schema() AS cs, pg_current_database() AS cdb,
          |  CAST(pg_backend_pid() AS INT) AS pid,
          |  has_table_privilege('postgres', 'region', 'SELECT') AS htp""".stripMargin))
    },

    Q.df("q71_math_udfs",
      """SELECT CAST(0.5 AS DOUBLE) AS s30, CAST(0.5 AS DOUBLE) AS c60,
        |  CAST(1.0 AS DOUBLE) AS t45, CAST(1.0 AS DOUBLE) AS ct45,
        |  CAST(30.0 AS DOUBLE) AS as5, CAST(180.0 AS DOUBLE) AS ac1,
        |  CAST(45.0 AS DOUBLE) AS at1, CAST(3.0 AS DOUBLE) AS dv,
        |  CAST(0.0 AS DOUBLE) AS e0, CAST(1.0 AS DOUBLE) AS ec0,
        |  CAST(0.0 AS DOUBLE) AS lg1, CAST(3 AS BIGINT) AS wb,
        |  CAST(2 AS INT) AS wba, CAST(0 AS INT) AS wba0,
        |  CAST(1 AS BIGINT) AS m1, CAST(-1 AS BIGINT) AS m2,
        |  true AS m0_null""".stripMargin) {
      withUdfs((s, _) => s.sql(
        """SELECT sind(30.0D) AS s30, cosd(60.0D) AS c60, tand(45.0D) AS t45,
          |  cotd(45.0D) AS ct45, asind(0.5D) AS as5, acosd(-1.0D) AS ac1,
          |  atand(1.0D) AS at1,
          |  CAST(div(CAST(17 AS DECIMAL(10,2)), CAST(5 AS DECIMAL(10,2))) AS DOUBLE) AS dv,
          |  erf(0.0D) AS e0, erfc(0.0D) AS ec0, lgamma(1.0D) AS lg1,
          |  width_bucket(5.35D, 0.024D, 10.06D, 5L) AS wb,
          |  pg_width_bucket(25.0D, array(10.0D, 20.0D, 30.0D)) AS wba,
          |  pg_width_bucket(5.0D, array(10.0D, 20.0D, 30.0D)) AS wba0,
          |  pg_mod(7L, 3L) AS m1, pg_mod(-7L, 3L) AS m2,
          |  pg_mod(5L, 0L) IS NULL AS m0_null""".stripMargin))
    },

    Q.df("q72_pg_class",
      """SELECT * FROM (VALUES
        |  (16384,'customer',2200,'r',5),(16385,'documents',2200,'r',5),
        |  (16386,'embeddings',2200,'r',3),(16387,'events',2200,'r',6),
        |  (16388,'lineitem',2200,'r',11),(16389,'nation',2200,'r',3),
        |  (16390,'orders',2200,'r',6),(16391,'part',2200,'r',6),
        |  (16392,'region',2200,'r',2),(16393,'supplier',2200,'r',4))
        |  AS t(oid, relname, relnamespace, relkind, relnatts)
        |ORDER BY relname""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      PgCatalog.registerAll(s)
      s.sql(
        """SELECT CAST(oid AS INT) AS oid, relname,
          |  CAST(relnamespace AS INT) AS relnamespace, relkind,
          |  CAST(relnatts AS INT) AS relnatts
          |FROM pg_class ORDER BY relname""".stripMargin)
    },

    Q.df("q73_pg_namespace",
      "SELECT * FROM (VALUES (11,'pg_catalog'),(2200,'public')) AS t(oid, nspname) ORDER BY oid") {
      (s, dir) =>
        PgCatalog.registerAll(s)
        s.sql("SELECT CAST(oid AS INT) AS oid, nspname FROM pg_namespace ORDER BY oid")
    },

    Q.df("q74_pg_type",
      """SELECT * FROM (VALUES
        |  (16,'bool','B'),(20,'int8','N'),(23,'int4','N'),(25,'text','S'),
        |  (701,'float8','N'),(1043,'varchar','S'),(1082,'date','D'),
        |  (1114,'timestamp','D'),(1184,'timestamptz','D'),(1700,'numeric','N'))
        |  AS t(oid, typname, typcategory) ORDER BY oid""".stripMargin) { (s, dir) =>
      PgCatalog.registerAll(s)
      s.sql(
        """SELECT CAST(oid AS INT) AS oid, typname, typcategory FROM pg_type
          |WHERE oid IN (16,20,23,25,701,1043,1082,1114,1184,1700)
          |ORDER BY oid""".stripMargin)
    },

    Q.df("q75_pg_attribute",
      """SELECT * FROM (VALUES
        |  ('nation','n_nationkey',23,1),('nation','n_name',25,2),
        |  ('nation','n_regionkey',23,3),
        |  ('region','r_regionkey',23,1),('region','r_name',25,2))
        |  AS t(relname, attname, atttypid, attnum)
        |ORDER BY relname, attnum""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      PgCatalog.registerAll(s)
      s.sql(
        """SELECT cl.relname, a.attname, CAST(a.atttypid AS INT) AS atttypid,
          |  CAST(a.attnum AS INT) AS attnum
          |FROM pg_attribute a JOIN pg_class cl ON a.attrelid = cl.oid
          |WHERE cl.relname IN ('region','nation')
          |ORDER BY cl.relname, attnum""".stripMargin)
    },

    // populated pg_proc: the function pack is introspectable the way
    // psql \df reads it (name + signature strings + kind); signatures
    // rendered by pg_get_function_arguments/result over the proc OID
    Q.df("q80_pg_proc",
      """SELECT * FROM (VALUES
        |  ('atan2d','double precision','double precision, double precision','f'),
        |  ('div','numeric','numeric, numeric','f'),
        |  ('lgamma','double precision','double precision','f'),
        |  ('ordered_string_agg','text','text, text','a'),
        |  ('quote_ident','text','text','f'),
        |  ('random_normal','double precision','double precision, double precision','f'),
        |  ('vec_fdot','double precision','real[], real[]','f'),
        |  ('version','text','','f'))
        |  AS t(proname, result_type, arg_types, prokind)
        |ORDER BY proname""".stripMargin) { (s, dir) =>
      PgFunctions.registerAll(s)
      PgCatalog.registerAll(s)
      s.sql(
        """SELECT proname, pg_get_function_result(oid) AS result_type,
          |  pg_get_function_arguments(oid) AS arg_types, prokind
          |FROM pg_proc
          |WHERE proname IN ('atan2d','div','lgamma','ordered_string_agg',
          |                  'quote_ident','random_normal','vec_fdot','version')
          |ORDER BY proname""".stripMargin)
    },

    // populated pg_operator/pg_cast: standard operator OIDs (public pg
    // catalog values) and the implicit/assignment cast lattice
    Q.df("q81_operator_cast",
      """SELECT * FROM (VALUES
        |  (96,'=','int4eq',23),(410,'=','int8eq',20),(98,'=','texteq',25),
        |  (670,'=','float8eq',701),(654,'||','textcat',25),(1209,'~~','textlike',25))
        |  AS t(oid, oprname, oprcode, oprleft) ORDER BY oid""".stripMargin) { (s, dir) =>
      PgCatalog.registerAll(s)
      s.sql(
        """SELECT CAST(oid AS INT) AS oid, oprname, oprcode, CAST(oprleft AS INT) AS oprleft
          |FROM pg_operator
          |WHERE oprcode IN ('int4eq','int8eq','texteq','float8eq','textcat','textlike')
          |ORDER BY oid""".stripMargin)
    },

    Q.df("q82_pg_cast_lattice",
      """SELECT * FROM (VALUES
        |  (21,20,'i'),(23,20,'i'),(20,23,'a'),(23,21,'a'),
        |  (700,701,'i'),(701,700,'a'),(1082,1114,'i'),(1114,1082,'a'),
        |  (25,1043,'i'),(1043,25,'i'))
        |  AS t(castsource, casttarget, castcontext)
        |ORDER BY castsource, casttarget""".stripMargin) { (s, dir) =>
      PgCatalog.registerAll(s)
      s.sql(
        """SELECT CAST(castsource AS INT) AS castsource,
          |  CAST(casttarget AS INT) AS casttarget, castcontext
          |FROM pg_cast
          |WHERE (castsource, casttarget) IN ((21,20),(23,20),(20,23),(23,21),
          |  (700,701),(701,700),(1082,1114),(1114,1082),(25,1043),(1043,25))
          |ORDER BY castsource, casttarget""".stripMargin)
    },

    // compat rewrites exercised through the server's query path
    // (Handlers.runSql = Compat.rewrite + spark.sql)
    Q.df("q76_regex_compat",
      """SELECT r_name FROM region
        |WHERE regexp_matches(r_name, '[AE]') AND NOT regexp_matches(r_name, '(?i)euro')
        |ORDER BY r_name""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      Handlers.runSql(s,
        "SELECT r_name FROM region WHERE r_name ~ '[AE]' AND r_name !~* 'euro' ORDER BY r_name")
    },

    Q.df("q77_any_compat",
      "SELECT n_name FROM nation WHERE n_nationkey IN (1,3,5) ORDER BY n_name") { (s, dir) =>
      Tables.register(s, dir)
      Handlers.runSql(s,
        "SELECT n_name FROM nation WHERE n_nationkey = ANY('{1,3,5}'::int4[]) ORDER BY n_name")
    },

    // file-source parity (reference CLI registers CSV/JSON/parquet —
    // datafusion-postgres-cli/src/main.rs:55-191): round-trip region
    // through each format and verify against the parquet oracle
    Q.df("q78_csv_source",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, dir) =>
      val reg = s.read.parquet(s"$dir/region.parquet")
      val tmp = fixture(dir, "csv") {
        val p = Files.createDirectories(
          Paths.get(sys.props("java.io.tmpdir"), "graft_csv_src")).toString
        reg.coalesce(1).write.mode("overwrite").option("header", "true").csv(p)
        p
      }
      s.read.option("header", "true").schema(reg.schema).csv(tmp)
        .orderBy("r_regionkey")
    },

    Q.df("q79_json_source",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, dir) =>
      val reg = s.read.parquet(s"$dir/region.parquet")
      val tmp = fixture(dir, "json") {
        val p = Files.createDirectories(
          Paths.get(sys.props("java.io.tmpdir"), "graft_json_src")).toString
        reg.coalesce(1).write.mode("overwrite").json(p)
        p
      }
      s.read.schema(reg.schema).json(tmp).orderBy("r_regionkey")
    },

    // arrow/avro source parity (reference CLI main.rs:132-182): write
    // region through each REAL format with the in-distribution libs,
    // read back via the CLI's source readers, verify against parquet
    Q.df("q108_arrow_source",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, dir) =>
      val path = fixture(dir, "arrow") {
        import org.apache.arrow.vector._
        import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASch}
        import scala.jdk.CollectionConverters._
        val rows = s.read.parquet(s"$dir/region.parquet")
          .select("r_regionkey", "r_name").collect()
        val p = Files.createTempFile("graft_q108", ".arrow")
        val alloc = new org.apache.arrow.memory.RootAllocator()
        val schema = new ASch(Seq(
          new Field("r_regionkey", FieldType.nullable(new ArrowType.Int(64, true)), null),
          new Field("r_name", FieldType.nullable(ArrowType.Utf8.INSTANCE), null)).asJava)
        val root = VectorSchemaRoot.create(schema, alloc)
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
        val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
        w.start()
        val k = root.getVector("r_regionkey").asInstanceOf[BigIntVector]
        val n = root.getVector("r_name").asInstanceOf[VarCharVector]
        k.allocateNew(rows.length); n.allocateNew()
        rows.zipWithIndex.foreach { case (r, i) =>
          k.setSafe(i, r.getAs[Number](0).longValue())
          n.setSafe(i, r.getString(1).getBytes("UTF-8"))
        }
        root.setRowCount(rows.length)
        w.writeBatch(); w.end(); w.close(); ch.close(); root.close(); alloc.close()
        p.toString
      }
      graft.sources.ArrowAvroSources.readArrow(s, path).orderBy("r_regionkey")
    },

    Q.df("q109_avro_source",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, dir) =>
      val path = fixture(dir, "avro") {
        import org.apache.avro.SchemaBuilder
        import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
        val rows = s.read.parquet(s"$dir/region.parquet")
          .select("r_regionkey", "r_name").collect()
        val aschema = SchemaBuilder.record("region").fields()
          .requiredLong("r_regionkey").requiredString("r_name").endRecord()
        val f = Files.createTempFile("graft_q109", ".avro").toFile
        val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](aschema))
        w.create(aschema, f)
        rows.foreach { r =>
          val rec = new GenericData.Record(aschema)
          rec.put("r_regionkey", r.getAs[Number](0).longValue())
          rec.put("r_name", r.getString(1))
          w.append(rec)
        }
        w.close()
        f.getPath
      }
      graft.sources.ArrowAvroSources.readAvro(s, path).orderBy("r_regionkey")
    },

    // ---- functions.md roadmap slice (round 7) --------------------------
    // Data-driven oracles: DuckDB re-expresses each pg template with its
    // native strftime/printf/format equivalents over the same rows.

    Q.df("q100_to_char_datetime",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso,
        |  strftime(o_orderdate, '%a, %d %b %Y') AS pretty,
        |  strftime(o_orderdate, '%j') AS doy,
        |  CAST(isodow(o_orderdate) AS VARCHAR) AS idow,
        |  printf('%02d', ((dayofyear(o_orderdate)-1)//7 + 1)) AS ww,
        |  CAST(quarter(o_orderdate) AS VARCHAR) AS q,
        |  strftime(to_timestamp(CAST(o_orderkey % 86400 AS DOUBLE)), '%H:%M:%S') AS epoch_hms,
        |  CAST(o_orderdate AS DATE) AS rt_date
        |FROM orders ORDER BY o_orderkey""".stripMargin) {
      // sort FIRST on the narrow (key, date) pair, format AFTER: the
      // range exchange then moves 16 bytes/row instead of nine
      // rendered strings — at 100 TB the formatted payload never
      // crosses the wire at all (round-8: 1.40 s -> 0.94 s at sf0.1)
      withUdfs((s, dir) => { Tables.register(s, dir)
        s.table("orders").orderBy("o_orderkey").selectExpr(
          "o_orderkey",
          "to_char(o_orderdate, 'YYYY-MM-DD HH24:MI:SS') AS iso",
          "to_char(o_orderdate, 'Dy, DD Mon YYYY') AS pretty",
          "to_char(o_orderdate, 'DDD') AS doy",
          "to_char(o_orderdate, 'ID') AS idow",
          "to_char(o_orderdate, 'WW') AS ww",
          "to_char(o_orderdate, 'Q') AS q",
          "to_char(to_timestamp(CAST(o_orderkey % 86400 AS DOUBLE)), 'HH24:MI:SS') AS epoch_hms",
          "to_date(to_char(o_orderdate, 'DD Mon YYYY'), 'DD Mon YYYY') AS rt_date") })
    },

    Q.df("q101_to_char_numeric",
      """SELECT o_orderkey,
        |  printf('%.2f', o_totalprice) AS plain,
        |  format('{:,}', o_orderkey) AS grouped,
        |  printf('%+d', CAST(o_custkey % 7 - 3 AS INT)) AS signed,
        |  printf('%05d', CAST(o_custkey AS INT)) AS padded,
        |  CAST(CAST(printf('%.2f', o_totalprice) AS DOUBLE) AS DOUBLE) AS rt_num
        |FROM orders ORDER BY o_orderkey""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        s.table("orders").orderBy("o_orderkey").selectExpr(
          "o_orderkey",
          "to_char(o_totalprice, 'FM9999990.00') AS plain",
          "to_char(o_orderkey, 'FM9,999,999') AS grouped",
          "to_char(CAST(o_custkey % 7 - 3 AS INT), 'SG9') AS signed",
          "to_char(o_custkey, 'FM00000') AS padded",
          "to_number(to_char(o_totalprice, 'FM9999990.00'), '9999990.99') AS rt_num") })
    },

    Q.df("q102_datetime_fns",
      """SELECT o_orderkey,
        |  regexp_replace(
        |    replace(CAST(age(TIMESTAMP '1998-12-01', o_orderdate) AS VARCHAR),
        |            'month', 'mon'),
        |    '-1 (year|mon|day)\b', '-1 \1s', 'g') AS age_txt,
        |  concat(CASE WHEN (o_orderkey % 90)//24 > 0
        |              THEN ((o_orderkey % 90)//24) ||
        |                (CASE WHEN (o_orderkey % 90)//24 > 1 THEN ' days' ELSE ' day' END) ||
        |                (CASE WHEN (o_orderkey % 90) % 24 > 0 THEN ' ' ELSE '' END)
        |              ELSE '' END,
        |         CASE WHEN (o_orderkey % 90) % 24 > 0 OR (o_orderkey % 90)//24 = 0
        |              THEN printf('%02d:00:00', CAST((o_orderkey % 90) % 24 AS INT))
        |              ELSE '' END) AS jh_txt,
        |  CAST(o_orderdate + INTERVAL 9 HOUR AS VARCHAR) AS tokyo,
        |  true AS fin
        |FROM orders ORDER BY o_orderkey""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        s.table("orders").orderBy("o_orderkey").selectExpr(
          "o_orderkey",
          "pg_interval_text(age(TIMESTAMP '1998-12-01', o_orderdate)) AS age_txt",
          """pg_interval_text(justify_hours(make_interval(0, 0, 0, 0,
            |    CAST(o_orderkey % 90 AS INT)))) AS jh_txt""".stripMargin,
          "CAST(CAST(timezone('Asia/Tokyo', o_orderdate) AS STRING) AS STRING) AS tokyo",
          "isfinite(o_orderdate) AS fin") })
    },

    // slice #2: binary-string pack, uuid properties, type
    // introspection, charset conversions. crc32/crc32c are pinned by
    // public check vectors in PgFunctionSlice2Spec (DuckDB lacks them).
    Q.df("q104_binary_uuid_fns",
      """SELECT p_partkey,
        |  lower(hex(encode(p_brand))) AS hexed,
        |  to_base64(encode(p_brand)) AS b64,
        |  CAST(ord(substr(p_brand, 1, 1)) AS INT) AS byte0,
        |  CAST((ord(substr(p_brand, 1, 1)) >> 1) & 1 AS INT) AS bit1,
        |  CAST(bit_count(ord(substr(p_brand, 1, 1))) AS BIGINT) AS bits0,
        |  p_brand AS rt_charset,
        |  CAST(7 AS INT) AS v7, CAST(4 AS INT) AS v4,
        |  true AS ts7_ok,
        |  'bigint' AS t_key, 'text' AS t_name, 'double precision' AS t_price,
        |  CASE WHEN p_partkey % 2 = 0 THEN true ELSE false END AS valid_even_int
        |FROM part ORDER BY p_partkey""".stripMargin) {
      // range-fanout part BEFORE the UDF-heavy projection: sort-last
      // re-executed every UDF during range-bound sampling and ran the
      // projection on the scan's single input split
      withUdfs((s, dir) => { Tables.register(s, dir)
        rangeFanout(s, s.table("part"), "p_partkey")
          .createOrReplaceTempView("q104_part")
        s.sql(
        """SELECT p_partkey,
          |  encode(CAST(p_brand AS BINARY), 'hex') AS hexed,
          |  encode(CAST(p_brand AS BINARY), 'base64') AS b64,
          |  get_byte(CAST(p_brand AS BINARY), 0) AS byte0,
          |  get_bit(CAST(p_brand AS BINARY), 1) AS bit1,
          |  pg_bit_count(CAST(substring(p_brand, 1, 1) AS BINARY)) AS bits0,
          |  convert_from(convert_to(p_brand, 'UTF8'), 'UTF8') AS rt_charset,
          |  uuid_extract_version(uuidv7()) AS v7,
          |  uuid_extract_version(gen_random_uuid()) AS v4,
          |  abs(unix_millis(uuid_extract_timestamp(uuidv7())) -
          |      unix_millis(clock_timestamp())) < 60000 AS ts7_ok,
          |  pg_typeof(p_partkey) AS t_key, pg_typeof(p_name) AS t_name,
          |  pg_typeof(p_retailprice) AS t_price,
          |  pg_input_is_valid(CAST(p_partkey % 2 AS STRING),
          |    CASE WHEN p_partkey % 2 = 0 THEN 'integer' ELSE 'date' END) AS valid_even_int
          |FROM q104_part""".stripMargin).sortWithinPartitions("p_partkey") })
    },

    // slice #2: SIMILAR TO through the server rewrite path, array P2
    // rows, P1 aggregate aliases (every/variance)
    Q.df("q105_similar_to_arrays",
      """SELECT p_brand,
        |  CAST(sum(CASE WHEN regexp_full_match(p_type, '.*(BRASS|STEEL).*')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_metal,
        |  bool_and(p_size > 0) AS all_sized,
        |  CAST(floor(var_samp(p_size) * 1000) AS BIGINT) AS var_q,
        |  CAST(max(len([p_size, p_size, p_size])) AS INT) AS fill3,
        |  CAST(max(len([p_partkey, p_partkey][:1])) AS INT) AS trim1
        |FROM part
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      PgFunctions.registerAll(s)
      Handlers.runSql(s,
        """SELECT p_brand,
          |  CAST(sum(CASE WHEN p_type SIMILAR TO '%(BRASS|STEEL)%'
          |      THEN 1 ELSE 0 END) AS BIGINT) AS n_metal,
          |  every(p_size > 0) AS all_sized,
          |  CAST(floor(variance(p_size) * 1000) AS BIGINT) AS var_q,
          |  CAST(max(cardinality(array_fill(p_size, array(3)))) AS INT) AS fill3,
          |  CAST(max(cardinality(trim_array(array(p_partkey, p_partkey), 1))) AS INT) AS trim1
          |FROM part
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    },

    // extract(epoch) rewrite + date_bin, data-driven through the
    // server path (DuckDB: epoch() and time_bucket are native)
    Q.df("q107_epoch_date_bin",
      """SELECT o_orderkey,
        |  CAST(epoch(o_orderdate) AS DOUBLE) AS ep,
        |  time_bucket(INTERVAL 7 DAY, o_orderdate,
        |    TIMESTAMP '1992-01-01') AS wk
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      PgFunctions.registerAll(s)
      Handlers.runSql(s,
        """SELECT o_orderkey,
          |  CAST(EXTRACT(EPOCH FROM o_orderdate) AS DOUBLE PRECISION) AS ep,
          |  date_bin(INTERVAL '7' DAY, o_orderdate,
          |    TIMESTAMP '1992-01-01') AS wk
          |FROM orders ORDER BY o_orderkey""".stripMargin)
    },

    // ordered-set aggregates (functions.md §Aggregate P3): pg's
    // WITHIN GROUP forms are Spark-4 native; the mode oracle is the
    // explicit smallest-most-frequent spec, so engine tie-break rules
    // can't flake the hash
    Q.df("q106_ordered_set_aggs",
      """SELECT p.p_brand,
        |  (SELECT x FROM (SELECT p2.p_size AS x, count(*) AS c FROM part p2
        |     WHERE p2.p_brand = p.p_brand
        |     GROUP BY 1 ORDER BY c DESC, x ASC LIMIT 1)) AS mode_size,
        |  CAST(floor(percentile_cont(0.25) WITHIN GROUP (ORDER BY p.p_size) * 1000000)
        |    AS BIGINT) AS p25_q,
        |  CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY p.p_size) * 1000000)
        |    AS BIGINT) AS p50_q,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY p.p_size) AS INT) AS p50d,
        |  bool_or(p.p_size > 45) AS has_large,
        |  CAST(bit_and(p.p_size) AS BIGINT) AS band,
        |  CAST(bit_or(p.p_size) AS BIGINT) AS bor,
        |  CAST(any_value(p.p_brand = p.p_brand) AS BOOLEAN) AS av
        |FROM part p
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) { (s, dir) =>
      Tables.register(s, dir)
      s.sql(
        """SELECT p_brand,
          |  mode() WITHIN GROUP (ORDER BY p_size) AS mode_size,
          |  CAST(floor(percentile_cont(0.25) WITHIN GROUP (ORDER BY p_size) * 1000000)
          |    AS BIGINT) AS p25_q,
          |  CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY p_size) * 1000000)
          |    AS BIGINT) AS p50_q,
          |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY p_size) AS INT) AS p50d,
          |  bool_or(p_size > 45) AS has_large,
          |  CAST(bit_and(p_size) AS BIGINT) AS band,
          |  CAST(bit_or(p_size) AS BIGINT) AS bor,
          |  any_value(true) AS av
          |FROM part
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    },

    Q.df("q103_string_fns",
      """SELECT p_partkey,
        |  array_to_string(list_transform(string_split(p_name, ' '),
        |    x -> upper(x[1]) || x[2:]), ' ') AS cap,
        |  strpos(p_name, 'o') AS pos,
        |  '''' || replace(p_name, '''', '''''') || '''' AS lit,
        |  p_brand || ': ' || p_type AS fmt,
        |  array_to_string(string_split_regex(p_type, '\s+'), '|') AS words,
        |  array_to_string(string_split(p_name, ' '), ',') AS s2a,
        |  lower(p_type) AS folded,
        |  strip_accents(p_name) AS ascii_name,
        |  bin(CAST(p_size AS INT)) AS b2,
        |  printf('%o', p_size) AS o8,
        |  lower(to_hex(p_size)) AS h16,
        |  CAST(2 - (p_partkey % 2) AS INT) AS nn
        |FROM part ORDER BY p_partkey""".stripMargin) {
      // measured both ways at sf0.1: q110's rangeFanout shape
      // parallelizes the 165 ms projection to ~65 ms but the range
      // sampler's extra stages cost ~90 ms — net slower at this
      // projection weight, so the plain plan stays (the residue vs the
      // oracle is per-job floor, not a plan defect)
      withUdfs((s, dir) => { Tables.register(s, dir); s.sql(
        """SELECT p_partkey,
          |  initcap(p_name) AS cap,
          |  strpos(p_name, 'o') AS pos,
          |  quote_literal(p_name) AS lit,
          |  format('%s: %s', p_brand, p_type) AS fmt,
          |  array_join(regexp_split_to_array(p_type, '\\s+'), '|') AS words,
          |  array_join(string_to_array(p_name, ' '), ',') AS s2a,
          |  casefold(p_type) AS folded,
          |  to_ascii(p_name) AS ascii_name,
          |  to_bin(p_size) AS b2,
          |  to_oct(p_size) AS o8,
          |  to_hex(p_size) AS h16,
          |  num_nonnulls(p_name, nullif(p_partkey % 2, 1)) AS nn
          |FROM part ORDER BY p_partkey""".stripMargin) })
    },

    // ---- JSON function pack (round 8) ---------------------------------
    // The reference blocks all 67 json fns upstream ("no JSON/JSONB
    // type in DataFusion", functions.md §functions-json); these are
    // the top-traffic ones, oracled against DuckDB's native json
    // extension over the same rows. Values travel as text; rendering
    // is jsonb-style compact (documented deviation from pg json's
    // cosmetic whitespace).

    Q.df("q110_json_scalars",
      """SELECT event_id,
        |  json_extract(props, '$.k')::VARCHAR AS jep,
        |  json_extract_string(props, '$.k') AS jept,
        |  lower(json_type(props)) AS jt,
        |  CASE WHEN json_type(json_extract(props, '$.k'))
        |         IN ('UBIGINT','BIGINT','HUGEINT','DOUBLE') THEN 'number'
        |       ELSE lower(json_type(json_extract(props, '$.k'))) END AS jtk,
        |  '{"id" : ' || event_id || ', "type" : ' || to_json(event_type)::VARCHAR
        |    || '}' AS jbo,
        |  '[' || event_id || ', ' || to_json(event_type)::VARCHAR || ']' AS jba,
        |  to_json(struct_pack(e := event_id, t := event_type))::VARCHAR AS rtj,
        |  json_object('a', event_id)::VARCHAR AS jsn,
        |  CAST(json_array_length(json_array(event_id, event_type, event_type))
        |    AS BIGINT) AS jal
        |FROM events ORDER BY event_id""".stripMargin) {
      // One range exchange on the NARROW scan (sampling raw rows is
      // cheap), with the expensive JSON projection placed BETWEEN the
      // exchange and the local sort: repartitionByRange with an
      // explicit partition count is exempt from AQE coalescing, so the
      // projection always runs at full parallelism (the 1 MiB AQE
      // floor serialized the old orderBy-then-project shape), and
      // sort-last would make the range sampler execute the projection
      // twice. sortWithinPartitions on range-partitioned data yields
      // exactly orderBy's global layout.
      withUdfs((s, dir) => { Tables.register(s, dir)
        rangeFanout(s, s.table("events"), "event_id").selectExpr(
          "event_id",
          "json_extract_path(props, 'k') AS jep",
          "json_extract_path_text(props, 'k') AS jept",
          "json_typeof(props) AS jt",
          "json_typeof(json_extract_path(props, 'k')) AS jtk",
          "json_build_object('id', event_id, 'type', event_type) AS jbo",
          "json_build_array(event_id, event_type) AS jba",
          "row_to_json(named_struct('e', event_id, 't', event_type)) AS rtj",
          "json_strip_nulls(json_build_object('a', event_id, 'b', NULL)) AS jsn",
          """CAST(json_array_length(json_build_array(event_id, event_type, event_type))
            |    AS BIGINT) AS jal""".stripMargin).sortWithinPartitions("event_id") })
    },

    // json aggregates, q32's ordered-UDAF pattern: pg guarantees
    // element order via ORDER BY inside the aggregate, which a
    // distributed partial-agg cannot see — ordered_json_agg carries
    // the sort key explicitly (DuckDB oracle composes string_agg of
    // to_json values, its json_group_* macros reject ORDER BY)
    Q.df("q112_json_aggs",
      """SELECT n_regionkey,
        |  '[' || string_agg(to_json(n_name)::VARCHAR, ', ' ORDER BY n_name) || ']'
        |    AS names_json,
        |  '{ ' || string_agg(to_json(n_name)::VARCHAR || ' : ' ||
        |      to_json(n_nationkey)::VARCHAR, ', ' ORDER BY n_name) || ' }'
        |    AS kv_json
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir); s.sql(
        """SELECT n_regionkey,
          |  ordered_json_agg(to_jsonb(n_name), n_name) AS names_json,
          |  ordered_json_object_agg(n_name, to_jsonb(n_nationkey)) AS kv_json
          |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) })
    },

    // jsonb containment (@>) and key-exists (?) — DuckDB's
    // json_contains verified against pg's documented §8.14.3 truth
    // table (incl. the top-level array-contains-scalar exception and
    // numeric equality) before being adopted as the oracle
    Q.df("q114_json_containment",
      """SELECT event_id,
        |  json_contains(props, '{"k": 42}') AS c_obj,
        |  json_contains(json_array(event_id % 5, event_type),
        |                json_array('view')) AS c_arr,
        |  (event_type = 'view') AS e_arr,
        |  json_extract(props, '$.k') IS NOT NULL AS e_key
        |FROM events ORDER BY event_id""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        rangeFanout(s, s.table("events"), "event_id").selectExpr(
          "event_id",
          """pg_contains(props, '{"k": 42}') AS c_obj""",
          """pg_contains(json_build_array(event_id % 5, event_type),
            |  json_build_array('view')) AS c_arr""".stripMargin,
          "jsonb_exists(json_build_array(event_type, 'extra'), 'view') AS e_arr",
          "jsonb_exists(props, 'k') AS e_key").sortWithinPartitions("event_id") })
    },

    // generate_subscripts (functions.md §SRF, P2 upstream): 1-based
    // subscript series per array, exploded to pg's set shape
    Q.df("q113_generate_subscripts",
      """SELECT p_partkey,
        |  CAST(generate_subscripts(string_split(p_name, ' '), 1) AS BIGINT) AS i
        |FROM part ORDER BY p_partkey, i""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        graft.Q.oracleOrder(s.sql(
          """SELECT p_partkey, CAST(i0 AS BIGINT) AS i FROM (
            |  SELECT p_partkey,
            |    explode(generate_subscripts(split(p_name, ' '), 1)) AS i0
            |  FROM part)""".stripMargin), "p_partkey", "i") })
    },

    // set-returning forms: pg's one-row-per-element/key shape via the
    // same explode rewrite the Compat layer applies to client SQL
    Q.df("q111_json_sets",
      """SELECT event_id, src, v FROM (
        |  SELECT event_id, 'elem' AS src,
        |    unnest(json_extract_string(json_array(event_id % 5, event_type), '$[*]')) AS v
        |  FROM events
        |  UNION ALL
        |  SELECT event_id, 'key' AS src, unnest(json_keys(props)) AS v
        |  FROM events)
        |ORDER BY event_id, src, v""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        graft.Q.oracleOrder(s.sql(
          """SELECT event_id, src, v FROM (
            |  SELECT event_id, 'elem' AS src,
            |    explode(json_array_elements_text(
            |      json_build_array(event_id % 5, event_type))) AS v
            |  FROM events
            |  UNION ALL
            |  SELECT event_id, 'key' AS src, explode(json_object_keys(props)) AS v
            |  FROM events)""".stripMargin), "event_id", "src", "v") })
    },

    // json mutator slice (round 8): jsonb_set/insert/delete[_path]/
    // concat/pretty/json_object. DuckDB has no jsonb mutators, so the
    // oracle composes each expected string independently from scalar
    // primitives (the q112 convention) — a construction-vs-mutation
    // cross-check, not a same-function echo
    Q.df("q115_jsonb_mutators",
      """SELECT event_id,
        |  '{"k": ' || (event_id % 7) || ', "id": ' || event_id || '}' AS s1,
        |  '{"t": ' || to_json(event_type)::VARCHAR || ', "id": ' || event_id || '}' AS s2,
        |  '[1, ' || (event_id % 5) || ', 2, 3]' AS ins,
        |  '{"a": 1, "b": ' || event_id || '}' AS cat,
        |  '{"t": ' || to_json(event_type)::VARCHAR || '}' AS del,
        |  '{"a": {"c": ' || event_id || '}}' AS delp,
        |  '{' || chr(10) || '    "k": ' || event_id || chr(10) || '}' AS pretty,
        |  '{"t" : ' || to_json(event_type)::VARCHAR || '}' AS jo
        |FROM events ORDER BY event_id""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        rangeFanout(s, s.table("events"), "event_id").selectExpr(
          "event_id",
          "jsonb_set(json_build_object('id', event_id, 'k', 1), array('k'), " +
            "to_jsonb(event_id % 7)) AS s1",
          "jsonb_set(json_build_object('id', event_id), array('t'), " +
            "to_jsonb(event_type), true) AS s2",
          "jsonb_insert(json_build_array(1, 2, 3), array('1'), " +
            "to_jsonb(event_id % 5)) AS ins",
          "jsonb_concat(json_build_object('a', 1), json_build_object('b', event_id)) AS cat",
          "jsonb_delete(json_build_object('a', 1, 't', event_type), 'a') AS del",
          "jsonb_delete_path(json_build_object('a', " +
            "json_build_object('b', 1, 'c', event_id)), array('a','b')) AS delp",
          "jsonb_pretty(json_build_object('k', event_id)) AS pretty",
          "json_object(array('t', event_type)) AS jo").sortWithinPartitions("event_id") })
    },

    // unistr / normalize / unicode_assigned plus the volatile array
    // randomizers: randomness is gated on its deterministic LAWS
    // (sample size, distinctness, shuffle-is-permutation) — the values
    // themselves are volatile by spec, exactly as in pg
    Q.df("q116_unicode_sample",
      """SELECT p_partkey,
        |  'h' || p_name AS uni,
        |  nfc_normalize('e' || chr(769)) || p_name AS nrm,
        |  TRUE AS ua,
        |  least(2, len(string_split(p_name, ' '))) AS ss,
        |  TRUE AS perm,
        |  TRUE AS dis
        |FROM part ORDER BY p_partkey""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        s.table("part").orderBy("p_partkey").selectExpr(
          "p_partkey",
          """unistr('\\0068') || p_name AS uni""",
          """normalize(unistr('e\\0301') || p_name) AS nrm""",
          "unicode_assigned(p_name) AS ua",
          "CAST(size(array_sample(split(p_name, ' '), " +
            "least(2, size(split(p_name, ' '))))) AS BIGINT) AS ss",
          "array_sort(array_shuffle(split(p_name, ' '))) = " +
            "array_sort(split(p_name, ' ')) AS perm",
          "size(array_distinct(array_sample(sequence(1, 10), 5))) = 5 AS dis") })
    },

    // SQL/JSON path family (PgJsonPathExpressions): filters with vars,
    // query_array/first, match, size(), and the real events.props
    // column; the DuckDB oracle recomputes each path's meaning from
    // list/json primitives (the q112 convention)
    Q.df("q117_jsonpath",
      """SELECT event_id,
        |  (event_id % 5 >= 4 OR event_id % 7 >= 4) AS ex,
        |  replace(to_json(list_filter([event_id % 3, event_id % 5, event_id % 7],
        |    x -> x > 1))::VARCHAR, ',', ', ') AS arr,
        |  CAST(list_filter([event_id % 3, event_id % 5, event_id % 7],
        |    x -> x > 1)[1] AS VARCHAR) AS fst,
        |  (event_id % 2 = 0) AS mt,
        |  to_json(event_type)::VARCHAR AS typ,
        |  '3' AS sz,
        |  json_extract(props, '$.k')::VARCHAR AS k,
        |  (json_extract(props, '$.k')::INT > 50) AS kx
        |FROM events ORDER BY event_id""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        // build each document ONCE in a lower projection (Catalyst's
        // CollapseProject keeps multi-use non-cheap expressions
        // un-inlined), then run the 4 path queries over it — the
        // shared-document parse memo in PgJsonExpressions turns the
        // repeated jsonb_path_* calls into one parse per doc per row.
        // Range-fan-out first (q110 comment), project parallel,
        // local-sort last.
        rangeFanout(s, s.table("events"), "event_id")
          .selectExpr("event_id", "props", "event_type",
            "json_build_object('vals', json_build_array(" +
              "event_id % 3, event_id % 5, event_id % 7)) AS vdoc")
          .selectExpr(
            "event_id",
            "jsonb_path_exists(vdoc, '$.vals[*] ? (@ >= $m)', '{\"m\":4}') AS ex",
            "jsonb_path_query_array(vdoc, '$.vals[*] ? (@ > 1)') AS arr",
            "jsonb_path_query_first(vdoc, '$.vals[*] ? (@ > 1)') AS fst",
            "jsonb_path_match(json_build_object('id', event_id), '$.id % 2 == 0') AS mt",
            "jsonb_path_query_first(json_build_object('t', event_type), '$.t') AS typ",
            "jsonb_path_query_first(vdoc, '$.vals.size()') AS sz",
            "jsonb_path_query_first(props, '$.k') AS k",
            "jsonb_path_exists(props, '$.k ? (@ > 50)') AS kx").sortWithinPartitions("event_id") })
    },

    // round-8 slice #3: jsonb_set_lax treatments, array_to_json
    // (compact + pretty + nested), oracled by string composition
    Q.df("q118_jsonb_lax",
      """SELECT event_id,
        |  '{"k": null}' AS sl1,
        |  '{}' AS sl2,
        |  '{"k": ' || event_id || '}' AS sl3,
        |  '[' || (event_id % 3) || ',' || (event_id % 5) || ']' AS atj,
        |  '[' || (event_id % 3) || ',' || chr(10) || ' ' || (event_id % 5) || ']' AS atjp
        |FROM events ORDER BY event_id""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        rangeFanout(s, s.table("events"), "event_id").selectExpr(
          "event_id",
          "jsonb_set_lax(json_build_object('k', event_id), array('k'), " +
            "CAST(NULL AS STRING)) AS sl1",
          "jsonb_set_lax(json_build_object('k', event_id), array('k'), " +
            "CAST(NULL AS STRING), true, 'delete_key') AS sl2",
          "jsonb_set_lax(json_build_object('k', event_id), array('k'), " +
            "CAST(NULL AS STRING), true, 'return_target') AS sl3",
          "array_to_json(array(event_id % 3, event_id % 5)) AS atj",
          "array_to_json(array(event_id % 3, event_id % 5), true) AS atjp").sortWithinPartitions("event_id") })
    },

    // round-9: json_to_record row expansion (functions.md §JSON,
    // blocked upstream) — runs the WIRE path end-to-end: the pg
    // implicit-lateral call shape goes through Compat.rewriteJsonToRecord
    // into CAST(json_extract_path_text(..)) columns, which carries
    // pg's per-field text-input coercion (missing key → NULL, string
    // number → int). Oracle recomposes each field from DuckDB json
    // primitives.
    Q.df("q119_json_to_record",
      """SELECT event_id,
        |  json_extract(props, '$.k')::INT AS k,
        |  CAST(NULL AS VARCHAR) AS missing_col,
        |  json_extract_string(props, '$.k') AS kt
        |FROM events ORDER BY event_id""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        s.sql(graft.pgwire.Compat.rewrite(
          """SELECT event_id, r.k, r.missing_col, r2.k AS kt
            |FROM events, json_to_record(props) AS r(k int, missing_col text),
            |  json_to_record(props) AS r2(k text)
            |ORDER BY event_id""".stripMargin)) })
    },

    // round-11: json[b]_populate_record[set] with pg's table-row-type
    // base (`null::region`) — Handlers supplies region's schema to
    // Compat.rewritePopulateRecord, which lowers to the to_record CAST
    // shape (missing key → NULL = pg's defaults-from-NULL-base). Runs
    // the WIRE path via Handlers.runSql. Oracle recomposes each field
    // from the same json primitives.
    Q.df("q120_json_populate_record",
      """SELECT event_id,
        |  CAST(event_id % 5 AS INTEGER) AS r_regionkey,
        |  event_type AS r_name
        |FROM events ORDER BY event_id""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        Handlers.runSql(s,
          """SELECT event_id, p.r_regionkey, p.r_name
            |FROM events, json_populate_record(null::region,
            |  json_build_object('r_regionkey', event_id % 5, 'r_name', event_type)) AS p
            |ORDER BY event_id""".stripMargin) })
    },

    // round-11: pg `SELECT DISTINCT ON (keys)` — keep the first row
    // per key group in ORDER BY order (Compat lowers it to a
    // row_number window). Ties broken by o_orderkey → deterministic.
    // Oracle is the equivalent window formulation.
    Q.df("q121_distinct_on",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        Handlers.runSql(s,
          """SELECT o_custkey, o_orderkey, o_totalprice
            |FROM (SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
            |      FROM orders ORDER BY o_custkey, o_orderdate DESC, o_orderkey) t
            |ORDER BY o_custkey""".stripMargin) })
    },

    // round-11: hypothetical-set aggregates (pg §9.22) — rank /
    // dense_rank / percent_rank / cume_dist WITHIN GROUP lower to
    // counting aggregates (Compat.rewriteHypotheticalSet, live-pg-
    // pinned in PgParitySpec). Oracle recomputes each from the same
    // exact counts.
    Q.df("q122_hypothetical_aggs",
      """SELECT o_orderpriority,
        |  CAST(1 + count(*) FILTER (WHERE o_totalprice < 150000.0) AS BIGINT) AS hrank,
        |  CAST(1 + count(DISTINCT CASE WHEN o_totalprice < 150000.0
        |                 THEN o_totalprice END) AS BIGINT) AS hdense,
        |  CAST(count(*) FILTER (WHERE o_totalprice < 150000.0) AS DOUBLE)
        |    / count(*) AS prank,
        |  CAST(count(*) FILTER (WHERE o_totalprice <= 150000.0) + 1 AS DOUBLE)
        |    / (count(*) + 1) AS cdist
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        Handlers.runSql(s,
          """SELECT o_orderpriority,
            |  CAST(rank(150000.0) WITHIN GROUP (ORDER BY o_totalprice) AS BIGINT) AS hrank,
            |  CAST(dense_rank(150000.0) WITHIN GROUP (ORDER BY o_totalprice) AS BIGINT) AS hdense,
            |  percent_rank(150000.0) WITHIN GROUP (ORDER BY o_totalprice) AS prank,
            |  cume_dist(150000.0) WITHIN GROUP (ORDER BY o_totalprice) AS cdist
            |FROM orders GROUP BY o_orderpriority
            |ORDER BY o_orderpriority""".stripMargin) })
    },

    // round-11: geo surface (SURVEY §2a#9; reference feature-gates the
    // same encoder in arrow-pg/src/geo_encoder.rs) — points built from
    // customer keys, WKT text, accessors, euclidean distance (IEEE
    // sqrt is correctly rounded, so cross-engine exact), strict
    // point-in-box containment. Runs the WIRE path (::geometry casts,
    // ST_* names through Compat). Oracle recomposes WKT by string
    // concat and the predicates by arithmetic — DuckDB has no spatial
    // extension in this environment, which is exactly why the
    // scalar-decomposed oracle shape is used.
    Q.df("q123_geo",
      """SELECT c_custkey,
        |  'POINT(' || (c_custkey % 97) || ' ' || c_nationkey || ')' AS wkt,
        |  CAST(c_custkey % 97 AS DOUBLE) AS x,
        |  CAST(c_nationkey AS DOUBLE) AS y,
        |  sqrt(CAST((c_custkey % 97) * (c_custkey % 97)
        |    + c_nationkey * c_nationkey AS DOUBLE)) AS dist,
        |  CAST(c_custkey % 97 > 5 AND c_custkey % 97 < 90
        |    AND c_nationkey > 2 AND c_nationkey < 22 AS BOOLEAN) AS inbox,
        |  CAST('ST_Point' AS VARCHAR) AS gtype
        |FROM customer ORDER BY c_custkey""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        Handlers.runSql(s,
          """SELECT c_custkey,
            |  st_astext(st_makepoint(CAST(c_custkey % 97 AS DOUBLE),
            |    CAST(c_nationkey AS DOUBLE))) AS wkt,
            |  st_x(st_makepoint(CAST(c_custkey % 97 AS DOUBLE),
            |    CAST(c_nationkey AS DOUBLE))) AS x,
            |  st_y(st_makepoint(CAST(c_custkey % 97 AS DOUBLE),
            |    CAST(c_nationkey AS DOUBLE))) AS y,
            |  st_distance(st_makepoint(CAST(c_custkey % 97 AS DOUBLE),
            |    CAST(c_nationkey AS DOUBLE)), 'POINT(0 0)'::geometry) AS dist,
            |  st_contains('POLYGON((5 2,90 2,90 22,5 22,5 2))'::geometry,
            |    st_makepoint(CAST(c_custkey % 97 AS DOUBLE),
            |      CAST(c_nationkey AS DOUBLE))) AS inbox,
            |  st_geometrytype(st_makepoint(CAST(c_custkey % 97 AS DOUBLE),
            |    CAST(c_nationkey AS DOUBLE))) AS gtype
            |FROM customer ORDER BY c_custkey""".stripMargin) })
    },

    // round-11 grammar batch over the WIRE path: single-column-SRF
    // alias rule (generate_series AS g names the column), pg array
    // slices incl. open bounds, multidim ARRAY literals + 1-based
    // subscripts, SQL-standard OFFSET/FETCH order. Oracle uses
    // DuckDB's native spellings of the same constructs (its list
    // slicing is 1-based inclusive like pg).
    Q.df("q124_grammar",
      """SELECT g AS n,
        |  array_to_string(([10,20,30,40])[2:3], ',') AS mid,
        |  array_to_string(([10,20,30,40])[2:], ',') AS tail,
        |  array_to_string(([10,20,30,40])[:2], ',') AS head,
        |  array_to_string(([[1,2],[3,4]])[2], ',') AS dim2,
        |  CAST(g * 2 AS BIGINT) AS dbl
        |FROM generate_series(2, 4) AS t(g)
        |ORDER BY g OFFSET 1 ROWS FETCH NEXT 2 ROWS ONLY""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        Handlers.runSql(s,
          """SELECT g AS n,
            |  array_to_string((ARRAY[10,20,30,40])[2:3], ',') AS mid,
            |  array_to_string((ARRAY[10,20,30,40])[2:], ',') AS tail,
            |  array_to_string((ARRAY[10,20,30,40])[:2], ',') AS head,
            |  array_to_string((ARRAY[[1,2],[3,4]])[2], ',') AS dim2,
            |  CAST(g * 2 AS BIGINT) AS dbl
            |FROM generate_series(2, 4) AS g
            |ORDER BY g OFFSET 1 ROWS FETCH NEXT 2 ROWS ONLY""".stripMargin) })
    },

    // Range types (pg §8.17/§9.19; graft.functions.PgRanges): the
    // engine side runs pg spellings through the full client path
    // (constructor canonicalization, @>/&&/-|- operator dispatch,
    // accessor resolution against the string builtins, range_merge,
    // a data-driven daterange); DuckDB has no range types, so the
    // oracle computes the same canonical text + predicate algebra
    // arithmetically. k ∈ [0,7) exercises 'empty' (k=0), adjacency
    // (k=3), and containment/overlap edges on real keys.
    Q.df("q125_ranges",
      """SELECT o_orderkey,
        |  CASE WHEN k = 0 THEN 'empty'
        |       ELSE '[' || a || ',' || (a + k) || ')' END AS r_txt,
        |  (a <= 25 AND 25 < a + k) AS contains25,
        |  (k > 0 AND a < 30 AND 20 < a + k) AS ovl,
        |  (k = 0) AS is_empty,
        |  CASE WHEN k = 0 THEN NULL ELSE a END AS lo,
        |  CASE WHEN k = 0 THEN NULL ELSE a + k END AS hi,
        |  (k = 3) AS adj,
        |  '[' || a || ',' || (a + 9) || ')' AS merged,
        |  '[' || strftime(od, '%Y-%m-%d') || ',' ||
        |    strftime(od + 7, '%Y-%m-%d') || ')' AS drng
        |FROM (SELECT o_orderkey, CAST(o_custkey % 50 AS INT) AS a,
        |        CAST(o_orderkey % 7 AS INT) AS k,
        |        CAST(o_orderdate AS DATE) AS od FROM orders) t
        |ORDER BY o_orderkey""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        // narrow-sort-first (the q100 pattern): range-partition the
        // 4-column input on the key, THEN project the ten computed
        // range columns at full parallelism, and sortWithinPartitions
        // — orderBy's layout without shuffling the wide strings.
        // Construct r ONCE per row (Spark doesn't CSE ScalaUDF calls);
        // the ops run on the canonical text via ::int4range, a valid
        // pg spelling that also drives the operator dispatch.
        val narrow = Handlers.runSql(s,
          """SELECT o_orderkey, a, k, od, int4range(a, a + k) AS r
            |FROM (SELECT o_orderkey, CAST(o_custkey % 50 AS INT) AS a,
            |        CAST(o_orderkey % 7 AS INT) AS k,
            |        CAST(o_orderdate AS DATE) AS od FROM orders) s""".stripMargin)
        rangeFanout(s, narrow, "o_orderkey").createOrReplaceTempView("q125_narrow")
        Handlers.runSql(s,
          """SELECT o_orderkey,
            |  r AS r_txt,
            |  r @> 25 AS contains25,
            |  r && int4range(20, 30) AS ovl,
            |  isempty(r::int4range) AS is_empty,
            |  CAST(lower(r::int4range) AS INT) AS lo,
            |  CAST(upper(r::int4range) AS INT) AS hi,
            |  int4range(a, a + 3) -|- int4range(a + k, a + k + 2) AS adj,
            |  range_merge(int4range(a, a + 2), int4range(a + 5, a + 9)) AS merged,
            |  daterange(od, od + 7) AS drng
            |FROM q125_narrow""".stripMargin)
          .sortWithinPartitions("o_orderkey") })
    },

    // Text search (pg ch. 12; graft.functions.TextSearch): the engine
    // side runs pg spellings through the full client path — config
    // arg defaulting, the @@ rewrite, length() dispatch, tsquery
    // parsing (& | ! <-> and plainto/phraseto). The oracle uses the
    // 'simple' config, which DuckDB can recompose with list functions
    // (lowercased tokens, distinct-lexeme count, containment,
    // consecutive-token phrases); 'english'-config stemming parity is
    // pinned by PgParitySpec sweep-14 + the 2980-word/150-doc
    // differential captures.
    Q.df("q126_textsearch",
      """SELECT doc_id,
        |  CAST(len(list_distinct(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS INT)
        |    AS nlex,
        |  list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'hash')
        |    AS m_hash,
        |  (list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'hash') AND
        |   list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'join'))
        |    AS m_hj,
        |  (list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'scan') OR
        |   list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'window'))
        |    AS m_sw,
        |  NOT list_contains(string_split_regex(lower(text), '[^a-z0-9]+'), 'batch')
        |    AS m_nb,
        |  (' ' || array_to_string(list_filter(
        |     string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), ' ')
        |   || ' ') LIKE '% merge sort %' AS m_ph
        |FROM documents ORDER BY doc_id""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        // the documents table is one small parquet split — fan out on
        // the key FIRST so tokenization runs at full parallelism (the
        // q100 narrow-sort pattern), tokenize ONCE per row (Spark does
        // not CSE ScalaUDF calls), then drive the operators off the
        // rendered vector — the ::tsvector marker keeps pg spelling
        // AND dispatches @@
        rangeFanout(s, Tables.t(s, dir, "documents").select("doc_id", "text"),
          "doc_id").createOrReplaceTempView("q126_docs")
        Handlers.runSql(s,
          """SELECT doc_id,
            |  length(v::tsvector) AS nlex,
            |  v::tsvector @@ plainto_tsquery('simple', 'hash') AS m_hash,
            |  v::tsvector @@ to_tsquery('simple', 'hash & join') AS m_hj,
            |  v::tsvector @@ to_tsquery('simple', 'scan | window') AS m_sw,
            |  v::tsvector @@ to_tsquery('simple', '!batch') AS m_nb,
            |  v::tsvector @@ phraseto_tsquery('simple', 'merge sort') AS m_ph
            |FROM (SELECT doc_id, to_tsvector('simple', text) AS v FROM q126_docs) d""".stripMargin)
          .sortWithinPartitions("doc_id") })
    },

    // pg_trgm scalar pack (graft.functions.Trigram): literal oracle
    // like q70/q71 — the values ARE the live-pg pins (float4-exact);
    // sweep-16 holds the full 26-case matrix
    Q.df("q127_trgm",
      """SELECT CAST(1000000 AS BIGINT) AS sim_self, CAST(363636 AS BIGINT) AS sim_words,
        |  CAST(181818 AS BIGINT) AS sim_gumbo, CAST(642857 AS BIGINT) AS sim_hello,
        |  CAST(800000 AS BIGINT) AS ws, CAST(571428 AS BIGINT) AS sws,
        |  CAST(300000 AS BIGINT) AS lim,
        |  '  c| ca|at |cat' AS tg""".stripMargin) {
      withUdfs((s, _) => Handlers.runSql(s,
        // floor(x*1e6) quantization per the QueryDef float contract
        // (float4 rendering differs between engines at the last digit)
        """SELECT CAST(floor(similarity('cat', 'cat') * 1000000) AS BIGINT) AS sim_self,
          |  CAST(floor(similarity('word', 'two words') * 1000000) AS BIGINT) AS sim_words,
          |  CAST(floor(similarity('GUMBO', 'gambol') * 1000000) AS BIGINT) AS sim_gumbo,
          |  CAST(floor(similarity('hello world', 'hello word') * 1000000) AS BIGINT) AS sim_hello,
          |  CAST(floor(word_similarity('word', 'two words') * 1000000) AS BIGINT) AS ws,
          |  CAST(floor(strict_word_similarity('word', 'two words') * 1000000) AS BIGINT) AS sws,
          |  CAST(floor(show_limit() * 1000000) AS BIGINT) AS lim,
          |  array_to_string(show_trgm('cat'), '|') AS tg""".stripMargin)) },

    // Network types (pg §8.9/§9.12; graft.functions.Inet): IPs
    // synthesized from order keys run the ::inet/::cidr casts and
    // the operator family through the full client path; DuckDB
    // recomposes the canonical text and containment arithmetic
    Q.df("q128_inet",
      """SELECT o_orderkey,
        |  '10.' || a || '.' || b || '.5/24' AS ip,
        |  '10.' || a || '.' || b || '.5' AS hostp,
        |  '10.' || a || '.' || b || '.0/24' AS net,
        |  '10.' || a || '.' || b || '.255/24' AS bcast,
        |  CAST(24 AS INT) AS mlen,
        |  (a >= 128) AS in_upper,
        |  '10.' || a || '.' || b || '.15/24' AS plus10,
        |  CAST(b * 256 + 4 AS BIGINT) AS addrdiff
        |FROM (SELECT o_orderkey, CAST(o_custkey % 256 AS INT) AS a,
        |        CAST(o_orderkey % 256 AS INT) AS b FROM orders) t
        |ORDER BY o_orderkey""".stripMargin) {
      withUdfs((s, dir) => { Tables.register(s, dir)
        rangeFanout(s, Handlers.runSql(s,
          """SELECT o_orderkey, a, b,
            |  ('10.' || a || '.' || b || '.5/24')::inet AS ip
            |FROM (SELECT o_orderkey, CAST(o_custkey % 256 AS INT) AS a,
            |        CAST(o_orderkey % 256 AS INT) AS b FROM orders) t""".stripMargin),
          "o_orderkey").createOrReplaceTempView("q128_narrow")
        Handlers.runSql(s,
          """SELECT o_orderkey,
            |  ip,
            |  host(ip::inet) AS hostp,
            |  network(ip::inet) AS net,
            |  broadcast(ip::inet) AS bcast,
            |  masklen(ip::inet) AS mlen,
            |  ip::inet << '10.128.0.0/9'::cidr AS in_upper,
            |  ip::inet + 10 AS plus10,
            |  ip::inet - ('10.' || a || '.0.1')::inet AS addrdiff
            |FROM q128_narrow""".stripMargin)
          .sortWithinPartitions("o_orderkey") })
    })
}
