package graft.pgwire

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** pg sequences: CREATE/DROP/ALTER SEQUENCE, nextval/currval/setval/
  * lastval, and serial-column auto-fill.
  *
  * The reference declares the whole family out of scope ("depends on
  * backend machinery DataFusion lacks — sequence state",
  * datafusion-pg-functions/functions.md:28,§Sequence) — parity-plus
  * here because ORM clients lean on `nextval`/serial for key
  * generation the moment they can write.
  *
  * State model (pg semantics, live-pinned in sweep-32):
  *  - a sequence is (lastValue, called): `nextval` returns lastValue
  *    when `called` is false (a fresh sequence yields START first),
  *    else lastValue+increment, then marks called;
  *  - overflow past MAXVALUE (or MINVALUE for a descending sequence)
  *    cycles when CYCLE, else raises 2200H;
  *  - `currval`/`lastval` are SESSION-scoped (keyed by connId here)
  *    and raise 55000 before any nextval/setval in the session;
  *  - `setval(name, v[, is_called])` pins (lastValue, called) and
  *    updates the session's currval, like pg.
  *
  * Scale/deployment note: the registry is driver-JVM state, same
  * caveat as the enum registry — `local[n]` shares it with every
  * task thread; a multi-JVM cluster needs the sequence allocator
  * centralized (pg itself serializes nextval through one buffer
  * lock, so a driver-side allocator IS the pg-equivalent design;
  * executors reach it only through the wire path's driver-evaluated
  * rewrites, never from distributed tasks at scale).
  */
object PgSequences extends Serializable {

  final case class SeqDef(increment: Long, minV: Long, maxV: Long,
      start: Long, cycle: Boolean)

  final class SeqState(@volatile var defn: SeqDef) {
    var lastValue: Long = defn.start
    var called: Boolean = false
  }

  private val seqs = new ConcurrentHashMap[String, SeqState]()
  private val sessionCurr = new ConcurrentHashMap[(Int, String), java.lang.Long]()
  private val sessionLast = new ConcurrentHashMap[Int, java.lang.Long]()

  /** pg identifier normalization for a sequence name appearing as a
    * string literal: strip a leading schema qualifier, strip quotes
    * (case preserved) or fold unquoted to lowercase. */
  def normName(raw0: String): String = {
    var raw = raw0.trim
    // public.seq / "Public"."Seq" — take the last dot-separated part
    // that is not inside quotes
    val lastDot = {
      var i = raw.length - 1; var inQ = false; var pos = -1
      while (i >= 0 && pos < 0) {
        val c = raw(i)
        if (c == '"') inQ = !inQ
        else if (c == '.' && !inQ) pos = i
        i -= 1
      }
      pos
    }
    if (lastDot >= 0) raw = raw.substring(lastDot + 1).trim
    if (raw.length >= 2 && raw.startsWith("\"") && raw.endsWith("\""))
      raw.substring(1, raw.length - 1)
    else raw.toLowerCase
  }

  def defaultsFor(increment: Long, minOpt: Option[Long], maxOpt: Option[Long],
      startOpt: Option[Long], cycle: Boolean): SeqDef = {
    val minV = minOpt.getOrElse(if (increment > 0) 1L else Long.MinValue)
    val maxV = maxOpt.getOrElse(if (increment > 0) Long.MaxValue else -1L)
    val start = startOpt.getOrElse(if (increment > 0) minV else maxV)
    SeqDef(increment, minV, maxV, start, cycle)
  }

  def create(name: String, defn: SeqDef, ifNotExists: Boolean): Unit = {
    if (defn.increment == 0)
      throw PgException("22023", "INCREMENT must not be zero")
    if (defn.start < defn.minV || defn.start > defn.maxV)
      throw PgException("22023",
        s"START value (${defn.start}) cannot be outside [${defn.minV}, ${defn.maxV}]")
    if (seqs.putIfAbsent(name, new SeqState(defn)) != null && !ifNotExists)
      throw PgException("42P07", s"""relation "$name" already exists""")
  }

  def drop(name: String, ifExists: Boolean): Unit =
    if (seqs.remove(name) == null && !ifExists)
      throw PgException("42P01", s"""sequence "$name" does not exist""")

  def exists(name: String): Boolean = seqs.containsKey(name)

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    seqs.keySet().asScala.toSeq.sorted
  }

  /** ALTER SEQUENCE … RESTART [WITH n] */
  def restart(name: String, withV: Option[Long]): Unit = {
    val s = state(name)
    s.synchronized {
      s.lastValue = withV.getOrElse(s.defn.start)
      s.called = false
    }
  }

  private def state(name: String): SeqState = {
    val s = seqs.get(name)
    if (s == null)
      throw PgException("42P01", s"""relation "$name" does not exist""")
    s
  }

  def nextval(name: String, connId: Int): Long = {
    val s = state(name)
    val v = s.synchronized {
      val d = s.defn
      val next =
        if (!s.called) s.lastValue
        else {
          val cand =
            try Math.addExact(s.lastValue, d.increment)
            catch { case _: ArithmeticException =>
              if (d.cycle) { if (d.increment > 0) d.minV else d.maxV }
              else throw overflow(name, d)
            }
          if (cand > d.maxV || cand < d.minV) {
            if (d.cycle) { if (d.increment > 0) d.minV else d.maxV }
            else throw overflow(name, d)
          } else cand
        }
      s.lastValue = next
      s.called = true
      next
    }
    sessionCurr.put((connId, name), v)
    sessionLast.put(connId, v)
    v
  }

  private def overflow(name: String, d: SeqDef) = PgException("2200H",
    s"""nextval: reached ${if (d.increment > 0) "maximum" else "minimum"} """ +
      s"""value of sequence "$name" (${if (d.increment > 0) d.maxV else d.minV})""")

  def currval(name: String, connId: Int): Long = {
    state(name) // 42P01 first, like pg
    val v = sessionCurr.get((connId, name))
    if (v == null) throw PgException("55000",
      s"""currval of sequence "$name" is not yet defined in this session""")
    v
  }

  def lastval(connId: Int): Long = {
    val v = sessionLast.get(connId)
    if (v == null)
      throw PgException("55000", "lastval is not yet defined in this session")
    v
  }

  def setval(name: String, v: Long, isCalled: Boolean, connId: Int): Long = {
    val s = state(name)
    s.synchronized {
      val d = s.defn
      if (v < d.minV || v > d.maxV) throw PgException("22003",
        s"""setval: value $v is out of bounds for sequence "$name" (${d.minV}..${d.maxV})""")
      s.lastValue = v
      s.called = isCalled
    }
    sessionCurr.put((connId, name), v)
    sessionLast.put(connId, v)
    v
  }

  def clearSession(connId: Int): Unit = {
    sessionLast.remove(connId)
    val it = sessionCurr.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == connId) it.remove()
  }

  /** Test hook: forget everything (suite isolation). */
  private[graft] def reset(): Unit = {
    seqs.clear(); sessionCurr.clear(); sessionLast.clear()
  }

  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** The session-bound UDF forms the wire rewrite targets. All
    * NONDETERMINISTIC: a folded/common-subexpression-eliminated
    * nextval would skip values pg hands out one per row. */
  def registerUdfs(spark: SparkSession): Unit = {
    if (!installed.add(spark)) return
    import org.apache.spark.sql.functions.udf
    spark.udf.register("pg_nextval",
      udf((n: String, cid: Int) => nextval(normName(n), cid)).asNondeterministic())
    spark.udf.register("pg_currval",
      udf((n: String, cid: Int) => currval(normName(n), cid)).asNondeterministic())
    spark.udf.register("pg_lastval",
      udf((cid: Int) => lastval(cid)).asNondeterministic())
    spark.udf.register("pg_setval",
      udf((n: String, v: Long, c: Boolean, cid: Int) =>
        setval(normName(n), v, c, cid)).asNondeterministic())
  }
}
