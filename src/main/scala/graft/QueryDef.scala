package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a named Spark query plus (optionally) the
  * equivalent ANSI SQL that DuckDB runs as the correctness oracle.
  *
  * Determinism contract (both sides MUST produce bit-identical values):
  *  - double aggregates go through exact decimal sums, then one final
  *    cast to double (`cast(sum(cast(x as decimal(30,10))) as double)`);
  *  - every result carries a total ORDER BY over a unique key;
  *  - engine-variant result types (count/rank/length/...) are cast to a
  *    common type on both sides;
  *  - float vectors are quantized with floor(x*10000) to exact integer
  *    arithmetic before any cross-engine comparison.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  /** Query defined by Spark SQL text, with distinct DuckDB oracle SQL. */
  def sql(name: String, sparkSql: String, duckSql: String): QueryDef =
    QueryDef(name, Some(duckSql), (s, dir) => { Tables.register(s, dir); s.sql(sparkSql) })

  /** Query whose SQL text is valid, and equivalent, in BOTH engines. */
  def sameSql(name: String, q: String): QueryDef = sql(name, q, q)

  /** DataFrame-API query with a DuckDB oracle. */
  def df(name: String, duckSql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(duckSql), fn)

  /** Query with no SQL-expressible oracle (driver records rows-only check). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, fn)
}
