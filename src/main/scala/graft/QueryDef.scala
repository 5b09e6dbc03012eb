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

  /** Deterministic total order for ORACLE-SIZED results without a range
    * exchange: `orderBy` samples its child to pick range bounds, which
    * RE-EXECUTES the whole upstream plan when it carries no reusable
    * shuffle stage (broadcast-join pipelines — measured as +0.8 s of
    * the 1.7 s q68). A round-robin gather to one partition plus an
    * in-partition sort is one execution and, at the few-thousand-row
    * result sizes the oracle compares, strictly cheaper. NOT for
    * product-scale outputs — a 100 TB result keeps the parallel
    * orderBy. */
  def oracleOrder(df: DataFrame, cols: String*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.head, cols.tail: _*)

  /** [[oracleOrder]] for sort keys that need Column expressions
    * (descending keys, computed keys). */
  def oracleOrderC(df: DataFrame, first: org.apache.spark.sql.Column,
      rest: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions((first +: rest): _*)

  /** Range-partition `df` on `key` with an EXPLICIT partition count so
    * AQE never coalesces it (explicit numPartitions is exempt).
    * Callers place an expensive projection after this and finish with
    * `sortWithinPartitions(key)` — together exactly `orderBy(key)`'s
    * layout, but with the projection guaranteed to run at full
    * parallelism and the range sampler fed narrow raw rows instead of
    * re-executing the projection (which sort-last would). Inert at
    * production scale: defaultParallelism = total cores.
    */
  def rangeFanout(df: DataFrame, key: String): DataFrame = {
    // Width: at least 8 ways (a single-split table still fans out), at
    // most the core count, and never below the source's own split count
    // (a production-scale input with hundreds of splits keeps them).
    // The former flat defaultParallelism=32 spent more on per-task
    // scheduling than the 10-15k-row projections it parallelized.
    val spark = df.sparkSession
    // leaf input-file count as the scale proxy — reading it off the
    // (already-eager) analyzed plan costs nothing, where forcing
    // queryExecution.toRdd here would compile the physical plan and
    // its codegen per query construction
    val srcParts =
      try df.queryExecution.analyzed.collectLeaves().map {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              math.max(1, fs.location.inputFiles.length)
            case _ => 1
          }
        case _ => 1
      }.sum
      catch { case scala.util.control.NonFatal(_) => 1 }
    // Width from DATA SIZE, not split count: callers place CPU-heavy
    // projections (jsonpath / format evaluation) after this, and one
    // 2 MB single-split file can carry 150k rows' worth of per-row
    // work. One way per 128 KiB of estimated input, between the 8-way
    // floor (tiny tables still fan out) and the core count; never
    // below the source's own split count (a production-scale input
    // with hundreds of splits keeps them — the local knobs are inert
    // there).
    val bytes =
      try df.queryExecution.analyzed.stats.sizeInBytes.toLong
      catch { case scala.util.control.NonFatal(_) => 0L }
    val byData = (bytes / (128L * 1024)).toInt
    val n = math.max(math.max(8, srcParts),
      math.min(byData, spark.sparkContext.defaultParallelism))
    df.repartitionByRange(n, org.apache.spark.sql.functions.col(key))
  }

  /** [[rangeFanout]]'s width with a HASH exchange instead of range —
    * no sampling job, no ordering guarantee. For callers that only
    * need parallelism plus same-row contiguity (e.g. a per-record
    * flatMap whose consumers group by a row-unique key).
    *
    * Unlike rangeFanout (whose exchange IS the ordering), this one is
    * purely a parallelism repair — it does NOT guarantee key
    * co-location: when the source is already at least core-count
    * wide — every production-scale input — it returns `df` untouched,
    * because a corpus-sized text column must never pay a physical
    * shuffle just to re-establish a width the scan already has. The
    * exchange only fires for narrow local inputs (the single-split
    * test parquet). A caller that needs same-key rows on the same
    * partition (map-side per-key work with no downstream shuffle)
    * must pass `requireClustering = true`, which always exchanges.
    * Note `srcParts` counts leaf-scan splits, so it over-estimates
    * effective width after very selective filters — acceptable for a
    * width repair, another reason it is NOT a clustering guarantee. */
  /** `minWidth`: callers whose downstream per-row work is CPU-heavy
    * (the typed text passes — shingling, minhash/simhash folds, gram
    * walks) pass `defaultParallelism`: the byte-based width estimate
    * reads the COMPRESSED footprint, and zstd text compresses ~20×,
    * so a 600 KB documents file (10 MB of text, seconds of per-doc
    * hashing) would otherwise fan to the 8-way floor and leave 3/4 of
    * the cores idle (r18 profiling: q43's signature stages ran 6.3 s
    * of exec over 8 tasks). Still inert at production scale: a scan
    * already at core-count width returns untouched above. */
  def hashFanout(df: DataFrame, key: String,
      requireClustering: Boolean = false, minWidth: Int = 8): DataFrame = {
    if (requireClustering) {
      val n = math.max(8, df.sparkSession.sparkContext.defaultParallelism)
      return df.repartition(n, org.apache.spark.sql.functions.col(key))
    }
    val spark = df.sparkSession
    val srcParts =
      try df.queryExecution.analyzed.collectLeaves().map {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              math.max(1, fs.location.inputFiles.length)
            case _ => 1
          }
        case _ => 1
      }.sum
      catch { case scala.util.control.NonFatal(_) => 1 }
    if (srcParts >= spark.sparkContext.defaultParallelism) df
    else {
      val bytes =
        try df.queryExecution.analyzed.stats.sizeInBytes.toLong
        catch { case scala.util.control.NonFatal(_) => 0L }
      val byData = (bytes / (128L * 1024)).toInt
      val n = math.max(math.max(math.max(8, minWidth), srcParts),
        math.min(byData, spark.sparkContext.defaultParallelism))
      df.repartition(n, org.apache.spark.sql.functions.col(key))
    }
  }
}
