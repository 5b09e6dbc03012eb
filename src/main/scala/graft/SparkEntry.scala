package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operators live in `graft.queries.*` modules as [[QueryDef]]s;
  * this object flattens them into the maps the driver consumes.
  */
object SparkEntry {

  /** Every registered operator, in declaration order. */
  def all: Seq[QueryDef] =
    queries_relational ++ queries_llm ++ queries_pg

  private def queries_relational: Seq[QueryDef] = graft.queries.Relational.queries
  private def queries_llm: Seq[QueryDef] = Seq(
    graft.queries.Dedup.queries,
    graft.queries.Similarity.queries,
    graft.queries.TextAnalysis.queries,
    graft.queries.Multimodal.queries,
    graft.queries.Streaming.queries
  ).flatten
  private def queries_pg: Seq[QueryDef] = graft.queries.PgCompat.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.run(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
