package graft

import org.scalatest.BeforeAndAfterAll
import graft.pgwire.{Handlers, PgCatalog, PgFunctions, Session}

/** Client-tool regression corpus — real startup/introspection SQL
  * captured from psql \d, DBeaver, Metabase, Grafana and pgcli,
  * replayed through the full compat + handler path; asserts no error,
  * mirroring the reference's signature test strategy
  * (datafusion-postgres/tests/{psql,dbeaver,metabase,grafana}.rs).
  */
class ClientCorpusSpec extends SparkSpec with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    super.beforeAll()
    import spark.implicits._
    (0 until 5).map(i => (i, s"v$i")).toDF("id", "v").createOrReplaceTempView("tt")
    PgCatalog.registerAll(spark)
    PgFunctions.registerAll(spark)
  }

  private def run(sql: String): Unit = {
    val session = new Session(1, "postgres", "postgres")
    val result = Handlers.execute(spark, session, sql)
    result match {
      case graft.pgwire.RowSet(_, rows, _, _) => rows.size // drain
      case _ =>
    }
  }

  private val psqlQueries = Seq(
    // \d pattern lookup: OPERATOR() regex + COLLATE + visibility UDF
    """SELECT c.oid,
      |  n.nspname,
      |  c.relname
      |FROM pg_catalog.pg_class c
      |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |WHERE c.relname OPERATOR(pg_catalog.~) '^(tt)$' COLLATE pg_catalog.default
      |  AND pg_catalog.pg_table_is_visible(c.oid)
      |ORDER BY 2, 3""".stripMargin,
    // \d table header: reloftype::regtype::text chain + pg_am join
    """SELECT c.relchecks, c.relkind, c.relhasindex, c.relhasrules, c.relhastriggers,
      |  c.relrowsecurity, c.relforcerowsecurity, false AS relhasoids, c.relispartition,
      |  '', c.reltablespace,
      |  CASE WHEN c.reloftype = 0 THEN '' ELSE c.reloftype::pg_catalog.regtype::pg_catalog.text END,
      |  c.relpersistence, c.relreplident, am.amname
      |FROM pg_catalog.pg_class c
      | LEFT JOIN pg_catalog.pg_class tc ON (c.reltoastrelid = tc.oid)
      |LEFT JOIN pg_catalog.pg_am am ON (c.relam = am.oid)
      |WHERE c.oid = '16384'""".stripMargin,
    // \d columns: format_type + correlated pg_attrdef/pg_collation subqueries
    """SELECT a.attname,
      |  pg_catalog.format_type(a.atttypid, a.atttypmod),
      |  (SELECT pg_catalog.pg_get_expr(d.adbin, d.adrelid, true)
      |   FROM pg_catalog.pg_attrdef d
      |   WHERE d.adrelid = a.attrelid AND d.adnum = a.attnum AND a.atthasdef),
      |  a.attnotnull,
      |  (SELECT c.collname FROM pg_catalog.pg_collation c, pg_catalog.pg_type t
      |   WHERE c.oid = a.attcollation AND t.oid = a.atttypid AND a.attcollation <> t.typcollation) AS attcollation,
      |  a.attidentity,
      |  a.attgenerated
      |FROM pg_catalog.pg_attribute a
      |WHERE a.attrelid = '16384' AND a.attnum > 0 AND NOT a.attisdropped
      |ORDER BY a.attnum""".stripMargin,
    // \d policies / ext-stats / publications (blacklisted, canned empty)
    "SELECT pol.polname, pol.polpermissive FROM pg_catalog.pg_policy pol WHERE pol.polrelid = '16384' ORDER BY 1",
    "SELECT oid, stxrelid::pg_catalog.regclass FROM pg_catalog.pg_statistic_ext WHERE stxrelid = '16384'",
    "SELECT pubname , NULL , NULL FROM pg_catalog.pg_publication p WHERE TRUE",
    // \l database listing (locale provider + acl array handling)
    """SELECT
      |  d.datname as "Name",
      |  pg_catalog.pg_get_userbyid(d.datdba) as "Owner",
      |  pg_catalog.pg_encoding_to_char(d.encoding) as "Encoding",
      |  CASE d.datlocprovider WHEN 'b' THEN 'builtin' WHEN 'c' THEN 'libc' WHEN 'i' THEN 'icu' END AS "Locale Provider",
      |  d.datcollate as "Collate",
      |  d.datctype as "Ctype",
      |  d.daticulocale as "Locale",
      |  d.daticurules as "ICU Rules",
      |  CASE WHEN pg_catalog.array_length(d.datacl, 1) = 0 THEN '(none)' ELSE pg_catalog.array_to_string(d.datacl, E'\n') END AS "Access privileges"
      |FROM pg_catalog.pg_database d
      |ORDER BY 1""".stripMargin,
    // \d inheritance probes (column ::regclass casts dropped to int)
    """SELECT c.oid::pg_catalog.regclass
      |FROM pg_catalog.pg_class c, pg_catalog.pg_inherits i
      |WHERE c.oid = i.inhparent AND i.inhrelid = '16384'
      |  AND c.relkind != 'p' AND c.relkind != 'I'
      |ORDER BY inhseqno""".stripMargin,
    """SELECT c.oid::pg_catalog.regclass, c.relkind, inhdetachpending, pg_catalog.pg_get_expr(c.relpartbound, c.oid)
      |FROM pg_catalog.pg_class c, pg_catalog.pg_inherits i
      |WHERE c.oid = i.inhrelid AND i.inhparent = '16384'
      |ORDER BY pg_catalog.pg_get_expr(c.relpartbound, c.oid) = 'DEFAULT', c.oid""".stripMargin,
    // \d foreign keys on the table / referencing it
    """SELECT true as sametable, conname,
      |  pg_catalog.pg_get_constraintdef(r.oid, true) as condef,
      |  conrelid::pg_catalog.regclass AS ontable
      |FROM pg_catalog.pg_constraint r
      |WHERE r.conrelid = '16384' AND r.contype = 'f' AND conparentid = 0
      |ORDER BY conname""".stripMargin,
    // partition-ancestors variant (blacklisted, canned empty)
    """SELECT conname, conrelid::pg_catalog.regclass AS ontable,
      |  pg_catalog.pg_get_constraintdef(oid, true) AS condef
      |FROM pg_catalog.pg_constraint c
      |WHERE contype = 'f' AND conparentid = 0 ORDER BY conname""".stripMargin)

  private val dbeaverQueries = Seq(
    "SET extra_float_digits = 3",
    "SET application_name = 'PostgreSQL JDBC Driver'",
    "SELECT current_schema(),session_user",
    """SELECT n.oid,n.*,d.description FROM pg_catalog.pg_namespace n
      |LEFT OUTER JOIN pg_catalog.pg_description d ON d.objoid=n.oid
      |  AND d.objsubid=0 AND d.classoid='pg_namespace'::regclass
      |ORDER BY nspname""".stripMargin,
    """SELECT n.nspname = ANY(current_schemas(true)), n.nspname, t.typname
      |FROM pg_catalog.pg_type t JOIN pg_catalog.pg_namespace n ON t.typnamespace = n.oid
      |WHERE t.oid = 1034""".stripMargin,
    "SELECT typinput='pg_catalog.array_in'::regproc as is_array, typtype, typname, pg_type.oid FROM pg_catalog.pg_type WHERE pg_type.oid = 1034",
    "SHOW search_path",
    "SELECT db.oid,db.* FROM pg_catalog.pg_database db WHERE datname='postgres'",
    "SELECT * FROM pg_catalog.pg_settings where name='standard_conforming_strings'",
    """SELECT string_agg(word, ',' ) from pg_catalog.pg_get_keywords()
      |where word <> ALL ('{select,from,where,order,group,by,limit}'::text[])""".stripMargin,
    "SELECT version()",
    "SELECT * FROM pg_catalog.pg_enum WHERE 1<>1 LIMIT 1",
    "SELECT reltype FROM pg_catalog.pg_class WHERE 1<>1 LIMIT 1",
    """SELECT t.oid,t.*,c.relkind,
      |  format_type(nullif(t.typbasetype, 0), t.typtypmod) as base_type_name, d.description
      |FROM pg_catalog.pg_type t
      |LEFT OUTER JOIN pg_catalog.pg_type et ON et.oid=t.typelem
      |LEFT OUTER JOIN pg_catalog.pg_class c ON c.oid=t.typrelid
      |LEFT OUTER JOIN pg_catalog.pg_description d ON t.oid=d.objoid
      |WHERE t.typname IS NOT NULL AND (c.relkind IS NULL OR c.relkind = 'c')
      |  AND (et.typcategory IS NULL OR et.typcategory <> 'C')""".stripMargin,
    """SELECT c.oid,c.*,d.description,
      |  pg_catalog.pg_get_expr(c.relpartbound, c.oid) as partition_expr,
      |  pg_catalog.pg_get_partkeydef(c.oid) as partition_key
      |FROM pg_catalog.pg_class c
      |LEFT OUTER JOIN pg_catalog.pg_description d ON d.objoid=c.oid
      |  AND d.objsubid=0 AND d.classoid='pg_class'::regclass
      |WHERE c.relnamespace=11 AND c.relkind not in ('i','I','c')""".stripMargin,
    """select c.oid,pg_catalog.pg_total_relation_size(c.oid) as total_rel_size,
      |  pg_catalog.pg_relation_size(c.oid) as rel_size
      | FROM pg_class c
      | WHERE c.relnamespace='public'""".stripMargin,
    """SELECT i.*,i.indkey as keys,c.relname,c.relnamespace,c.relam,c.reltablespace,
      |  tc.relname as tabrelname,dsc.description,
      |  pg_catalog.pg_get_expr(i.indpred, i.indrelid) as pred_expr,
      |  pg_catalog.pg_get_expr(i.indexprs, i.indrelid, true) as expr,
      |  pg_catalog.pg_relation_size(i.indexrelid) as index_rel_size,
      |  pg_catalog.pg_stat_get_numscans(i.indexrelid) as index_num_scans
      |FROM pg_catalog.pg_index i
      |INNER JOIN pg_catalog.pg_class c ON c.oid=i.indexrelid
      |INNER JOIN pg_catalog.pg_class tc ON tc.oid=i.indrelid
      |LEFT OUTER JOIN pg_catalog.pg_description dsc ON i.indexrelid=dsc.objoid
      |WHERE  i.indrelid=1 ORDER BY tabrelname, c.relname""".stripMargin,
    """SELECT c.oid,c.*,t.relname as tabrelname,rt.relnamespace as refnamespace,d.description,
      |  case when c.contype='c' then "substring"(pg_get_constraintdef(c.oid), 7) else null end consrc_copy
      |FROM pg_catalog.pg_constraint c
      |INNER JOIN pg_catalog.pg_class t ON t.oid=c.conrelid
      |LEFT OUTER JOIN pg_catalog.pg_class rt ON rt.oid=c.confrelid
      |LEFT OUTER JOIN pg_catalog.pg_description d ON d.objoid=c.oid
      |  AND d.objsubid=0 AND d.classoid='pg_constraint'::regclass
      |WHERE c.conrelid=1
      |ORDER BY c.oid""".stripMargin)

  private val metabaseQueries = Seq(
    "SET extra_float_digits = 2",
    "SHOW TRANSACTION ISOLATION LEVEL",
    "SET SESSION CHARACTERISTICS AS TRANSACTION ISOLATION LEVEL READ UNCOMMITTED",
    """SELECT nspname AS "TABLE_SCHEM", current_database() AS "TABLE_CATALOG"
      |FROM pg_catalog.pg_namespace
      |WHERE nspname <> 'pg_toast'
      |  AND (nspname !~ '^pg_temp_'  OR nspname = (pg_catalog.current_schemas(true))[1])
      |  AND (nspname !~ '^pg_toast_temp_'  OR nspname = replace((pg_catalog.current_schemas(true))[1], 'pg_temp_', 'pg_toast_temp_'))
      |ORDER BY "TABLE_SCHEM"""".stripMargin,
    """with table_privileges as (
      | select
      |   NULL as role,
      |   t.schemaname as schema,
      |   t.objectname as table,
      |   pg_catalog.has_any_column_privilege(current_user, '"' || replace(t.schemaname, '"', '""') || '"' || '.' || '"' || replace(t.objectname, '"', '""') || '"',  'update') as update,
      |   pg_catalog.has_any_column_privilege(current_user, '"' || replace(t.schemaname, '"', '""') || '"' || '.' || '"' || replace(t.objectname, '"', '""') || '"',  'select') as select,
      |   pg_catalog.has_any_column_privilege(current_user, '"' || replace(t.schemaname, '"', '""') || '"' || '.' || '"' || replace(t.objectname, '"', '""') || '"',  'insert') as insert,
      |   pg_catalog.has_table_privilege(     current_user, '"' || replace(t.schemaname, '"', '""') || '"' || '.' || '"' || replace(t.objectname, '"', '""') || '"',  'delete') as delete
      | from (
      |   select schemaname, tablename as objectname from pg_catalog.pg_tables
      |   union
      |   select schemaname, viewname as objectname from pg_catalog.pg_views
      |   union
      |   select schemaname, matviewname as objectname from pg_catalog.pg_matviews
      | ) t
      | where t.schemaname !~ '^pg_'
      |   and t.schemaname <> 'information_schema'
      |   and pg_catalog.has_schema_privilege(current_user, t.schemaname, 'usage')
      |)
      |select t.*
      |from table_privileges t""".stripMargin,
    """SELECT "n"."nspname" AS "schema", "c"."relname" AS "name",
      |  CASE "c"."relkind" WHEN 'r' THEN 'TABLE' WHEN 'p' THEN 'PARTITIONED TABLE'
      |    WHEN 'v' THEN 'VIEW' WHEN 'f' THEN 'FOREIGN TABLE' WHEN 'm' THEN 'MATERIALIZED VIEW'
      |    ELSE NULL END AS "type",
      |  "d"."description" AS "description", "stat"."n_live_tup" AS "estimated_row_count"
      |FROM "pg_catalog"."pg_class" AS "c"
      |INNER JOIN "pg_catalog"."pg_namespace" AS "n" ON "c"."relnamespace" = "n"."oid"
      |LEFT JOIN "pg_catalog"."pg_description" AS "d" ON ("c"."oid" = "d"."objoid")
      |  AND ("d"."objsubid" = '0') AND ("d"."classoid" = 'pg_class'::regclass)
      |LEFT JOIN "pg_stat_user_tables" AS "stat" ON ("n"."nspname" = "stat"."schemaname")
      |  AND ("c"."relname" = "stat"."relname")
      |WHERE ("c"."relnamespace" = "n"."oid") AND ("n"."nspname" !~ '^pg_')
      |  AND ("n"."nspname" <> 'information_schema')
      |  AND c.relkind in ('r', 'p', 'v', 'f', 'm') AND ("n"."nspname" IN ('public'))
      |ORDER BY "type" ASC, "schema" ASC, "name" ASC""".stripMargin,
    "show timezone")

  private val grafanaQueries = Seq(
    "SELECT current_setting('search_path')",
    // table + column discovery (search_path lateral expansion — served
    // via the blacklist like the reference's partial entry)
    """SELECT
      |  CASE WHEN
      |      quote_ident(table_schema) IN (SELECT 'public')
      |  THEN quote_ident(table_name)
      |  ELSE quote_ident(table_schema) || '.' || quote_ident(table_name)
      |END AS "table"
      |FROM information_schema.tables
      |WHERE quote_ident(table_schema) NOT IN ('information_schema', 'pg_catalog')
      |ORDER BY CASE WHEN quote_ident(table_schema) IN (SELECT 'public') THEN 0 ELSE 1 END, 1""".stripMargin,
    """SELECT quote_ident(column_name) AS "column", data_type AS "type"
      |FROM information_schema.columns
      |WHERE quote_ident(table_name) = 'public.games'""".stripMargin)

  private val pgcliQueries = Seq(
    """SELECT s_p.nspname AS parentschema, t_p.relname AS parenttable
      |FROM pg_catalog.pg_constraint fk""".stripMargin)

  /** ORM-driver connection/bootstrap statements from public driver
    * sources: SQLAlchemy's pg dialect (version/schema probes,
    * has_table, get_table_names), psycopg2's hstore registration
    * probe, and ActiveRecord's pg adapter (time zone / identifier
    * length GUCs, data_sources listing, type preload). */
  private val ormQueries = Seq(
    // SQLAlchemy dialect initialization
    "select pg_catalog.version()",
    "select current_schema()",
    "show standard_conforming_strings",
    // SQLAlchemy has_table
    """SELECT 1 FROM pg_catalog.pg_class c
      |JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |WHERE pg_catalog.pg_table_is_visible(c.oid)
      |  AND c.relname = 'tt' AND c.relkind in ('r', 'p', 'f', 'v', 'm')""".stripMargin,
    // SQLAlchemy get_table_names
    """SELECT c.relname FROM pg_catalog.pg_class c
      |JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |WHERE n.nspname = 'public' AND c.relkind in ('r', 'p')""".stripMargin,
    // psycopg2 register_hstore probe (no hstore here: must return 0
    // rows cleanly, not error)
    """SELECT t.oid, typarray FROM pg_type t
      |JOIN pg_namespace ns ON typnamespace = ns.oid
      |WHERE typname = 'hstore'""".stripMargin,
    // ActiveRecord pg adapter session setup + schema reflection
    "SHOW TIME ZONE",
    "SHOW max_identifier_length",
    "SELECT current_database()",
    """SELECT c.relname FROM pg_class c
      |LEFT JOIN pg_namespace n ON n.oid = c.relnamespace
      |WHERE n.nspname = ANY (current_schemas(false))
      |  AND c.relkind IN ('r','v','m','p','f')""".stripMargin,
    // ActiveRecord OID type preload
    """SELECT t.oid, t.typname FROM pg_type as t
      |WHERE t.typname IN ('int2', 'int4', 'int8', 'oid', 'float4', 'float8', 'bool')""".stripMargin,
    """SELECT t.oid, t.typname, t.typelem, t.typdelim, t.typinput
      |FROM pg_type as t WHERE t.typname IN ('numeric', 'text', 'varchar', 'char', 'date', 'timestamp')""".stripMargin,
    // row-locking forms ORMs emit inside transactions
    // (Django select_for_update, SQLAlchemy with_for_update, Rails
    // lock) — lock-free no-ops here, must parse and return rows
    "SELECT id, v FROM tt WHERE id = 1 FOR UPDATE",
    "SELECT id FROM tt WHERE id = 2 FOR UPDATE SKIP LOCKED",
    "SELECT id FROM tt WHERE id = 3 FOR NO KEY UPDATE NOWAIT",
    "SELECT id FROM tt ORDER BY id LIMIT 1 FOR SHARE OF tt")

  test("psql \\d corpus runs clean") { psqlQueries.foreach(run) }
  test("dbeaver startup corpus runs clean") { dbeaverQueries.foreach(run) }
  test("metabase startup corpus runs clean") { metabaseQueries.foreach(run) }
  test("grafana corpus runs clean") { grafanaQueries.foreach(run) }
  test("pgcli corpus runs clean") { pgcliQueries.foreach(run) }
  test("ORM bootstrap corpus (SQLAlchemy/psycopg2/ActiveRecord) runs clean") {
    ormQueries.foreach(run)
  }

  test("psql \\df returns the registered function pack from pg_proc") {
    import graft.pgwire.RowSet
    val session = new Session(3, "postgres", "postgres")
    // psql \df's exact query (describe.c listFunctions), pattern-free
    val dfQuery =
      """SELECT n.nspname as "Schema",
        |  p.proname as "Name",
        |  pg_catalog.pg_get_function_result(p.oid) as "Result data type",
        |  pg_catalog.pg_get_function_arguments(p.oid) as "Argument data types",
        | CASE p.prokind
        |  WHEN 'a' THEN 'agg'
        |  WHEN 'w' THEN 'window'
        |  WHEN 'p' THEN 'proc'
        |  ELSE 'func'
        | END as "Type"
        |FROM pg_catalog.pg_proc p
        |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = p.pronamespace
        |WHERE pg_catalog.pg_function_is_visible(p.oid)
        |ORDER BY 1, 2, 4""".stripMargin
    Handlers.execute(spark, session, dfQuery) match {
      case RowSet(_, rows, _, _) =>
        val byName = rows.toSeq.map(r => r.getString(1) -> (r.getString(2), r.getString(3), r.getString(4))).toMap
        assert(byName("lgamma") === (("double precision", "double precision", "func")))
        assert(byName("atan2d") === (("double precision", "double precision, double precision", "func")))
        assert(byName("ordered_string_agg") === (("text", "text, text", "agg")))
        assert(byName("vec_ldot") === (("bigint", "bigint[], bigint[]", "func")))
        assert(byName.size >= 50)
      case other => fail(s"expected RowSet, got $other")
    }
  }

  test("pg_operator and pg_cast carry the standard rows") {
    import graft.pgwire.RowSet
    val session = new Session(4, "postgres", "postgres")
    Handlers.execute(spark, session,
      "SELECT oid, oprcode FROM pg_catalog.pg_operator WHERE oprname = '=' AND oprleft = 23") match {
      case RowSet(_, rows, _, _) =>
        assert(rows.toSeq.map(r => (r.getInt(0), r.getString(1))) === Seq((96, "int4eq")))
      case other => fail(s"expected RowSet, got $other")
    }
    Handlers.execute(spark, session,
      "SELECT castcontext FROM pg_catalog.pg_cast WHERE castsource = 23 AND casttarget = 20") match {
      case RowSet(_, rows, _, _) =>
        assert(rows.toSeq.map(_.getString(0)) === Seq("i")) // int4→int8 implicit
      case other => fail(s"expected RowSet, got $other")
    }
  }

  test("blacklisted grafana table query serves the public table list") {
    import graft.pgwire.RowSet
    val session = new Session(2, "postgres", "postgres")
    Handlers.execute(spark, session, grafanaQueries(1)) match {
      case RowSet(schema, rows, _, _) =>
        assert(schema.fields.map(_.name).toSeq === Seq("table"))
        assert(rows.toSeq.map(_.getString(0)).contains("tt"))
      case other => fail(s"expected RowSet, got $other")
    }
  }

  test("psql \\da, \\dC and \\do read the populated catalog") {
    import graft.pgwire.RowSet
    val session = new Session(5, "postgres", "postgres")
    def rows(sql: String): Seq[org.apache.spark.sql.Row] =
      Handlers.execute(spark, session, sql) match {
        case RowSet(_, rs, _, _) => rs.toSeq
        case other => fail(s"expected RowSet, got $other")
      }
    // \da (describe.c listAggregates)
    val da = rows(
      """SELECT n.nspname as "Schema", p.proname AS "Name",
        |  pg_catalog.format_type(p.prorettype, NULL) AS "Result data type",
        |  CASE WHEN p.pronargs = 0 THEN CAST('*' AS pg_catalog.text)
        |       ELSE pg_catalog.pg_get_function_arguments(p.oid) END AS "Argument data types",
        |  pg_catalog.obj_description(p.oid, 'pg_proc') as "Description"
        |FROM pg_catalog.pg_proc p
        |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = p.pronamespace
        |WHERE p.prokind = 'a'
        |  AND pg_catalog.pg_function_is_visible(p.oid)
        |ORDER BY 1, 2, 4""".stripMargin)
    assert(da.map(_.getString(1)).contains("ordered_string_agg"))
    // \dC (listCasts)
    val dc = rows(
      """SELECT pg_catalog.format_type(castsource, NULL) AS "Source type",
        |       pg_catalog.format_type(casttarget, NULL) AS "Target type",
        |       CASE WHEN c.castmethod = 'b' THEN '(binary coercible)'
        |            ELSE p.proname END AS "Function",
        |       CASE WHEN c.castcontext = 'e' THEN 'no'
        |            WHEN c.castcontext = 'a' THEN 'in assignment'
        |            ELSE 'yes' END AS "Implicit?"
        |FROM pg_catalog.pg_cast c
        |     LEFT JOIN pg_catalog.pg_proc p ON c.castfunc = p.oid
        |     LEFT JOIN pg_catalog.pg_type ts ON c.castsource = ts.oid
        |     LEFT JOIN pg_catalog.pg_type tt ON c.casttarget = tt.oid
        |WHERE pg_catalog.pg_type_is_visible(ts.oid) OR pg_catalog.pg_type_is_visible(tt.oid)
        |ORDER BY 1, 2""".stripMargin)
    assert(dc.exists(r => r.getString(0) == "integer" && r.getString(1) == "bigint" &&
      r.getString(3) == "yes"))
    assert(dc.exists(r => r.getString(0) == "text" &&
      r.getString(2) == "(binary coercible)"))
    // \do (listOperators)
    val dop = rows(
      """SELECT n.nspname as "Schema",
        |  o.oprname AS "Name",
        |  CASE WHEN o.oprkind='l' THEN NULL ELSE pg_catalog.format_type(o.oprleft, NULL) END AS "Left arg type",
        |  CASE WHEN o.oprkind='r' THEN NULL ELSE pg_catalog.format_type(o.oprright, NULL) END AS "Right arg type",
        |  pg_catalog.format_type(o.oprresult, NULL) AS "Result type",
        |  coalesce(pg_catalog.obj_description(o.oid, 'pg_operator'),
        |           pg_catalog.obj_description(o.oprcode::pg_catalog.regproc, 'pg_proc')) AS "Description"
        |FROM pg_catalog.pg_operator o
        |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = o.oprnamespace
        |WHERE pg_catalog.pg_operator_is_visible(o.oid)
        |ORDER BY 1, 2, 3, 4""".stripMargin)
    assert(dop.exists(r => r.getString(1) == "=" && r.getString(2) == "integer"))
    assert(dop.exists(r => r.getString(1) == "||" && r.getString(4) == "text"))
  }

  test("psql \\dF family reads the populated text-search catalog") {
    import graft.pgwire.RowSet
    val session = new Session(6, "postgres", "postgres")
    def rows(sql: String): Seq[org.apache.spark.sql.Row] =
      Handlers.execute(spark, session, sql) match {
        case RowSet(_, rs, _, _) => rs.toSeq
        case other => fail(s"expected RowSet, got $other")
      }
    // \dF (describe.c listTSConfigs)
    val dF = rows(
      """SELECT n.nspname as "Schema",
        |  c.cfgname as "Name",
        |  pg_catalog.obj_description(c.oid, 'pg_ts_config') as "Description"
        |FROM pg_catalog.pg_ts_config c
        |LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.cfgnamespace
        |ORDER BY 1, 2""".stripMargin)
    assert(dF.size === 29)
    assert(dF.map(_.getString(1)).contains("english"))
    // \dFd (listTSDictionaries)
    val dFd = rows(
      """SELECT n.nspname as "Schema", d.dictname as "Name",
        |  pg_catalog.obj_description(d.oid, 'pg_ts_dict') as "Description"
        |FROM pg_catalog.pg_ts_dict d
        |LEFT JOIN pg_catalog.pg_namespace n ON n.oid = d.dictnamespace
        |ORDER BY 1, 2""".stripMargin)
    assert(dFd.map(_.getString(1)).contains("english_stem"))
    // \dFp (listTSParsers)
    val dFp = rows(
      """SELECT n.nspname as "Schema", p.prsname as "Name",
        |  pg_catalog.obj_description(p.oid, 'pg_ts_parser') as "Description"
        |FROM pg_catalog.pg_ts_parser p
        |LEFT JOIN pg_catalog.pg_namespace n ON n.oid = p.prsnamespace
        |ORDER BY 1, 2""".stripMargin)
    assert(dFp.map(_.getString(1)) === Seq("default"))
    // \dFt (listTSTemplates)
    val dFt = rows(
      """SELECT n.nspname as "Schema", t.tmplname as "Name",
        |  pg_catalog.obj_description(t.oid, 'pg_ts_template') as "Description"
        |FROM pg_catalog.pg_ts_template t
        |LEFT JOIN pg_catalog.pg_namespace n ON n.oid = t.tmplnamespace
        |ORDER BY 1, 2""".stripMargin)
    assert(dFt.map(_.getString(1)).contains("snowball"))
    // config → parser → map → dict join chain (\dF+ walks this)
    val chain = rows(
      """SELECT c.cfgname, p.prsname, d.dictname, m.maptokentype
        |FROM pg_catalog.pg_ts_config c
        |JOIN pg_catalog.pg_ts_parser p ON c.cfgparser = p.oid
        |JOIN pg_catalog.pg_ts_config_map m ON m.mapcfg = c.oid
        |JOIN pg_catalog.pg_ts_dict d ON m.mapdict = d.oid
        |WHERE c.cfgname = 'english' AND m.maptokentype = 1""".stripMargin)
    assert(chain.size === 1)
    assert(chain.head.getString(2) === "english_stem")
  }
}
