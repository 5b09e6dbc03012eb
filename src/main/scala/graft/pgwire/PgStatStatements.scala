package graft.pgwire

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** `pg_stat_statements`-shaped per-statement counters (r17 stretch —
  * monitoring clients ask for it; reference has no statement stats at
  * all). Rides the [[Handlers.execute]] wrapper: every SUCCESSFUL
  * statement records (normalized query, exec ms); row counts land
  * from the CommandComplete tag, and row-returning statements add
  * theirs at stream drain through the wrapped tag builder — so `rows`
  * is cumulative retrieved/affected, like pg.
  *
  * Normalization follows pg's fingerprinting shape: literals in
  * DML/SELECT collapse to `$n` in order of appearance (utility
  * statements keep their text verbatim, pg's track_utility rendering);
  * queryid is a stable FNV-1a 64 of the normalized text. Entry count
  * caps at pg_stat_statements.max's default (5000) with
  * least-called eviction. Everything is driver-side: the statement
  * hook IS on the driver, a few thousand stat rows render as a
  * LocalRelation.
  */
object PgStatStatements {

  final case class Stat(var calls: Long, var totalMs: Double,
      var minMs: Double, var maxMs: Double, var sumSqMs: Double,
      var rows: Long, var blksRead: Long = 0L, var recordsRead: Long = 0L)

  private val MaxEntries = 5000
  private val stats =
    new java.util.LinkedHashMap[String, Stat]()
  private val versionCounter = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var enabled = true

  // ---- scan metrics (r18): shared_blks_read / records_read ------------
  //
  // Driver-side SparkListener aggregating task INPUT metrics per job
  // group (the server names one group per connection, and the
  // statement runs under it on the connection's thread). The execute
  // wrapper snapshots the group's cumulative counters before the
  // statement and attaches the delta when the statement's rows drain
  // — the listener bus is asynchronous, so a task finishing after the
  // delta is read lands on the NEXT statement of the same connection
  // (totals are conserved per connection; pg attributes per-backend
  // the same way, just synchronously). bytesRead maps to pg's 8 kB
  // block unit for shared_blks_read; records_read is the engine's
  // honest extra column.
  private val groupOfStage =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  private val groupBytes =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val groupRecords =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val listenerInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  private final class ScanListener extends org.apache.spark.scheduler.SparkListener {
    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val group = js.properties.getProperty("spark.jobGroup.id")
      if (group != null && group.startsWith("pgwire-conn-"))
        js.stageIds.foreach(sid => groupOfStage.put(sid, group))
    }
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val g = groupOfStage.get(te.stageId)
      if (g != null && te.taskMetrics != null) {
        val im = te.taskMetrics.inputMetrics
        if (im.bytesRead > 0)
          groupBytes.computeIfAbsent(g, _ =>
            new java.util.concurrent.atomic.AtomicLong()).addAndGet(im.bytesRead)
        if (im.recordsRead > 0)
          groupRecords.computeIfAbsent(g, _ =>
            new java.util.concurrent.atomic.AtomicLong()).addAndGet(im.recordsRead)
      }
    }
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      groupOfStage.remove(sc.stageInfo.stageId)
  }

  /** Register the scan listener once per JVM (PgServer boot). */
  def installListener(spark: SparkSession): Unit =
    if (listenerInstalled.compareAndSet(false, true))
      spark.sparkContext.addSparkListener(new ScanListener)

  /** Cumulative (bytes, records) read under `group` so far. */
  def scanSnapshot(group: String): (Long, Long) =
    if (group == null) (0L, 0L)
    else (Option(groupBytes.get(group)).map(_.get).getOrElse(0L),
      Option(groupRecords.get(group)).map(_.get).getOrElse(0L))

  /** Attach a scan delta to a stat entry (blocks = pg's 8 kB unit). */
  def addScan(key: String, bytes: Long, records: Long): Unit =
    if (key.nonEmpty && (bytes > 0 || records > 0)) {
      stats.synchronized {
        val s = stats.get(key)
        if (s != null) {
          s.blksRead += (bytes + 8191) / 8192
          s.recordsRead += records
        }
      }
      versionCounter.incrementAndGet()
    }

  /** FNV-1a 64 over the normalized text — the stable queryid. */
  private def queryId(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  private val dmlHeads =
    Set("SELECT", "INSERT", "UPDATE", "DELETE", "WITH", "VALUES", "TABLE")

  /** pg-style fingerprint text: literals → `$n` (DML only), whitespace
    * collapsed. */
  def normalize(sql: String): String = {
    val trimmed = sql.trim.stripSuffix(";").trim
    val head = trimmed.takeWhile(!_.isWhitespace).toUpperCase
    if (!dmlHeads.contains(head)) return trimmed.replaceAll("\\s+", " ")
    val toks = Compat.tokenize(trimmed)
    val sb = new StringBuilder
    var n = 0
    toks.foreach { t =>
      t.kind match {
        case Compat.Ws => if (sb.nonEmpty && !sb.endsWith(" ")) sb.append(' ')
        case Compat.Str | Compat.Num => n += 1; sb.append("$").append(n)
        case _ => sb.append(t.text)
      }
    }
    sb.toString.trim
  }

  /** Record one successful execution; returns the stat key so the
    * caller can attach drained row counts later. */
  def record(rawSql: String, ms: Double): String = {
    if (!enabled) return ""
    val key = normalize(rawSql)
    stats.synchronized {
      val s = stats.get(key)
      if (s != null) {
        s.calls += 1; s.totalMs += ms
        s.minMs = math.min(s.minMs, ms); s.maxMs = math.max(s.maxMs, ms)
        s.sumSqMs += ms * ms
      } else {
        if (stats.size >= MaxEntries) {
          // pg deallocates the least-used entries
          var minKey: String = null; var minCalls = Long.MaxValue
          val it = stats.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue.calls < minCalls) {
              minCalls = e.getValue.calls; minKey = e.getKey
            }
          }
          if (minKey != null) stats.remove(minKey)
        }
        stats.put(key, Stat(1, ms, ms, ms, ms * ms, 0))
      }
    }
    versionCounter.incrementAndGet()
    key
  }

  def addRows(key: String, n: Long): Unit = if (key.nonEmpty) {
    stats.synchronized {
      val s = stats.get(key)
      if (s != null) s.rows += n
    }
    versionCounter.incrementAndGet()
  }

  def reset(): Unit = {
    stats.synchronized(stats.clear())
    versionCounter.incrementAndGet()
  }

  def version: Long = versionCounter.get()

  private val schema = StructType(Seq(
    StructField("userid", IntegerType), StructField("dbid", IntegerType),
    StructField("toplevel", BooleanType), StructField("queryid", LongType),
    StructField("query", StringType), StructField("calls", LongType),
    StructField("total_exec_time", DoubleType),
    StructField("min_exec_time", DoubleType),
    StructField("max_exec_time", DoubleType),
    StructField("mean_exec_time", DoubleType),
    StructField("stddev_exec_time", DoubleType),
    StructField("rows", LongType),
    StructField("shared_blks_hit", LongType),
    StructField("shared_blks_read", LongType),
    StructField("records_read", LongType)))

  /** (Re)build the view from the current counters — called by runSql
    * whenever a statement references pg_stat_statements, so the
    * snapshot is as of query start (pg shows live shared-memory
    * counters; per-query rebuild is the same read-your-writes shape). */
  def refreshView(spark: SparkSession): Unit = {
    val rows = stats.synchronized {
      val b = Seq.newBuilder[Row]
      stats.forEach { (q, s) =>
        val mean = s.totalMs / s.calls
        val variance = math.max(0.0, s.sumSqMs / s.calls - mean * mean)
        b += Row(10, 13757, true, queryId(q), q, s.calls, s.totalMs,
          s.minMs, s.maxMs, mean, math.sqrt(variance), s.rows, 0L,
          s.blksRead, s.recordsRead)
      }
      b.result()
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .createOrReplaceTempView("pg_stat_statements")
  }

  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("pg_stat_statements_reset",
      org.apache.spark.sql.functions.udf(() => { reset(); "" })
        .asNondeterministic())
  }
}
