package graft.pgwire

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Table constraints declared through the pg-dialect CREATE TABLE
  * path: NOT NULL, PRIMARY KEY, UNIQUE (column- and table-level).
  *
  * pg enforces these in the executor per written row (reference:
  * the engine surface has no DML at all — this is parity-plus, and
  * the semantics are live-pinned in PgDmlSpec: 23502 with the
  * failing row, 23505 with the pg constraint name and key detail,
  * NULL key members never conflict).
  *
  * NOT NULL and DEFAULT ride on column metadata (`pg.notnull`,
  * `pg.default`) so they survive in the catalog schema; the unique
  * set is ALSO serialized into metadata (`pg.uniques`, on the first
  * member column) and this registry is merely the parsed driver-JVM
  * cache — a lookup on a fresh JVM rebuilds it from the schema.
  */
object PgConstraints {

  /** One unique or primary-key constraint. `name` is pg's generated
    * (`t_pkey`, `t_a_b_key`) or user-declared constraint name. */
  final case class Unique(name: String, cols: Seq[String], isPrimary: Boolean)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Unique]]()

  def register(table: String, uniques: Seq[Unique]): Unit =
    cache.put(PgSequences.normName(table), uniques)

  def drop(table: String): Unit = cache.remove(PgSequences.normName(table))

  /** The serialized form stored in `pg.uniques` column metadata:
    * `name|P|c1,c2;name2|U|c3`. */
  def serialize(uniques: Seq[Unique]): String =
    uniques.map(u =>
      u.name + "|" + (if (u.isPrimary) "P" else "U") + "|" +
        u.cols.mkString(",")).mkString(";")

  private def deserialize(s: String): Seq[Unique] =
    s.split(";").toSeq.filter(_.nonEmpty).map { part =>
      val Array(n, k, cs) = part.split("\\|", 3)
      Unique(n, cs.split(",").toSeq, k == "P")
    }

  /** Uniques for a table — registry hit, else rebuilt from the
    * schema's `pg.uniques` metadata (fresh-JVM path). */
  def uniquesOf(table: String, schema: StructType): Seq[Unique] = {
    val key = PgSequences.normName(table)
    val hit = cache.get(key)
    if (hit != null) return hit
    val fromMeta = schema.fields.toSeq
      .filter(_.metadata.contains("pg.uniques"))
      .flatMap(f => deserialize(f.metadata.getString("pg.uniques")))
    cache.put(key, fromMeta)
    fromMeta
  }

  /** NOT NULL columns (metadata-carried; PRIMARY KEY members are
    * already marked at CREATE TABLE). */
  def notNullCols(schema: StructType): Seq[String] =
    schema.fields.toSeq
      .filter(f => f.metadata.contains("pg.notnull") &&
        f.metadata.getBoolean("pg.notnull"))
      .map(_.name)

  def hasAny(table: String, schema: StructType): Boolean =
    notNullCols(schema).nonEmpty || uniquesOf(table, schema).nonEmpty
}
