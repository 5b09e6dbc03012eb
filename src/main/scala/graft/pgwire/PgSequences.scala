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
  * lock, so a driver-side allocator IS the pg-equivalent design).
  * Both serial write paths now allocate ON THE DRIVER: literal
  * VALUES reserve per-row literals at canonicalize time (r15) and
  * INSERT … SELECT reserves a [[reserveBlock]] sized by a count
  * pass (r16) — executor tasks never call into this object except
  * through the legacy per-row UDF fallback (CYCLE sequences,
  * sources that call sequence functions themselves).
  */
object PgSequences extends Serializable {

  final case class SeqDef(increment: Long, minV: Long, maxV: Long,
      start: Long, cycle: Boolean, typid: Int = 20)

  final class SeqState(@volatile var defn: SeqDef) {
    var lastValue: Long = defn.start
    var called: Boolean = false
    // pg's WAL-prefetch counter, visible in `SELECT * FROM <seq>`:
    // 0 fresh / after setval·RESTART, 32 on a fetch that exhausts it,
    // decrementing per nextval (live-pinned: two nextvals show 31)
    var logCnt: Long = 0L
  }

  /** int2/int4/int8 → pg type oid; None for an unrecognized spelling. */
  def typidOf(ty: String): Option[Int] = ty.trim.toLowerCase match {
    case "smallint" | "int2" => Some(21)
    case "integer" | "int" | "int4" => Some(23)
    case "bigint" | "int8" => Some(20)
    case _ => None
  }

  def typeName(typid: Int): String = typid match {
    case 21 => "smallint"
    case 23 => "integer"
    case _ => "bigint"
  }

  private def typeMax(typid: Int): Long = typid match {
    case 21 => Short.MaxValue.toLong
    case 23 => Int.MaxValue.toLong
    case _ => Long.MaxValue
  }

  private def typeMin(typid: Int): Long = typid match {
    case 21 => Short.MinValue.toLong
    case 23 => Int.MinValue.toLong
    case _ => Long.MinValue
  }

  private val seqs = new ConcurrentHashMap[String, SeqState]()
  private val sessionCurr = new ConcurrentHashMap[(Int, String), java.lang.Long]()
  private val sessionLast = new ConcurrentHashMap[Int, java.lang.Long]()
  // table → (column name → owned sequence, None for plain columns),
  // recorded at wire CREATE TABLE. Backs pg_get_serial_sequence when
  // its arguments are not literals (the literal form is evaluated at
  // rewrite time against the real catalog — a UDF task cannot touch
  // SessionState in Spark 4).
  private val serialCols =
    new ConcurrentHashMap[String, Map[String, Option[String]]]()

  def registerTableSerials(table: String,
      cols: Seq[(String, Option[String])]): Unit = {
    serialCols.put(table, cols.toMap)
    PgMeta.saveSerials()
  }

  def dropTableSerials(table: String): Unit = {
    serialCols.remove(table)
    PgMeta.saveSerials()
  }

  /** Serial-ownership rows ordered by table — the PgMeta persistence
    * snapshot. */
  def serialsSnapshot: Seq[(String, Map[String, Option[String]])] = {
    val b = Seq.newBuilder[(String, Map[String, Option[String]])]
    serialCols.forEach((t, cols) => b += (t -> cols))
    b.result().sortBy(_._1)
  }

  /** Pre-attach migration: write every in-memory sequence into the
    * store (file state wins if already present). */
  private[pgwire] def flushToFiles(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    seqs.entrySet().asScala.foreach { e =>
      val s = e.getValue
      val rec = s.synchronized(
        PgMeta.SeqRec(s.defn, s.lastValue, s.called, s.logCnt))
      PgMeta.seqFlushDirect(root, e.getKey, rec)
    }
  }

  /** pg_get_serial_sequence semantics over the wire-DDL registry: the
    * column argument matches VERBATIM case-sensitively (live-pinned:
    * 'ID' finds column ID, 'LO' errors 42703 against column lo). */
  def serialSeqOf(table: String, col: String): Option[String] = {
    val t = normName(table)
    val cols = serialCols.get(t)
    if (cols == null)
      throw PgException("42P01", s"""relation "$t" does not exist""")
    cols.getOrElse(col, throw PgException("42703",
      s"""column "$col" of relation "$t" does not exist"""))
  }

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

  /** pg's default-bound rules: ascending sequences run 1..typeMax,
    * descending typeMin..-1 (live-pinned: `AS smallint INCREMENT -2`
    * shows -32768..-1 START -1). */
  def defaultsFor(increment: Long, minOpt: Option[Long], maxOpt: Option[Long],
      startOpt: Option[Long], cycle: Boolean, typid: Int = 20): SeqDef = {
    val minV = minOpt.getOrElse(if (increment > 0) 1L else typeMin(typid))
    val maxV = maxOpt.getOrElse(if (increment > 0) typeMax(typid) else -1L)
    val start = startOpt.getOrElse(if (increment > 0) minV else maxV)
    SeqDef(increment, minV, maxV, start, cycle, typid)
  }

  /** When a [[PgMeta]] root is attached, the FILES are the sequence
    * state (a cached counter in two JVMs would hand out duplicates)
    * and every transition is a read-modify-write under the
    * per-sequence file lock; detached, the in-memory map is
    * authoritative exactly as before r17. */
  private def fileMode: Boolean = PgMeta.attached

  /** The single-draw state transition, shared verbatim by the
    * in-memory and file paths. */
  private def nextOf(name: String, d: SeqDef, lastValue: Long,
      called: Boolean): Long =
    if (!called) lastValue
    else {
      val cand =
        try Math.addExact(lastValue, d.increment)
        catch { case _: ArithmeticException =>
          if (d.cycle) { if (d.increment > 0) d.minV else d.maxV }
          else throw overflow(name, d)
        }
      if (cand > d.maxV || cand < d.minV) {
        if (d.cycle) { if (d.increment > 0) d.minV else d.maxV }
        else throw overflow(name, d)
      } else cand
    }

  /** log_cnt after `draws` successive nextvals from `l0` — closed form
    * of the per-draw rule (`if (<=0) 32 else -1`; cycle length 33). */
  private def logCntAfter(l0: Long, draws: Long): Long =
    if (draws <= 0) l0
    else if (l0 <= 0) 32L - ((draws - 1) % 33L)
    else if (draws <= l0) l0 - draws
    else 32L - ((draws - l0 - 1) % 33L)

  def create(name: String, defn: SeqDef, ifNotExists: Boolean): Unit = {
    if (defn.increment == 0)
      throw PgException("22023", "INCREMENT must not be zero")
    if (defn.start < defn.minV || defn.start > defn.maxV)
      throw PgException("22023",
        s"START value (${defn.start}) cannot be outside [${defn.minV}, ${defn.maxV}]")
    if (fileMode) PgMeta.seqLocked(name) { f =>
      if (PgMeta.seqRead(f).isDefined) {
        if (!ifNotExists)
          throw PgException("42P07", s"""relation "$name" already exists""")
      } else PgMeta.seqWrite(f, PgMeta.SeqRec(defn, defn.start, called = false, 0L))
    }
    else if (seqs.putIfAbsent(name, new SeqState(defn)) != null && !ifNotExists)
      throw PgException("42P07", s"""relation "$name" already exists""")
  }

  def drop(name: String, ifExists: Boolean): Unit =
    if (fileMode) PgMeta.seqLocked(name) { f =>
      if (!PgMeta.seqDelete(f) && !ifExists)
        throw PgException("42P01", s"""sequence "$name" does not exist""")
    }
    else if (seqs.remove(name) == null && !ifExists)
      throw PgException("42P01", s"""sequence "$name" does not exist""")

  def exists(name: String): Boolean =
    if (fileMode) PgMeta.seqNames.contains(name)
    else seqs.containsKey(name)

  def names: Seq[String] =
    if (fileMode) PgMeta.seqNames
    else {
      import scala.jdk.CollectionConverters._
      seqs.keySet().asScala.toSeq.sorted
    }

  /** (name, defn, lastValue, called) ordered by name — one consistent
    * read per sequence for the catalog views. */
  def snapshot: Seq[(String, SeqDef, Long, Boolean)] =
    if (fileMode)
      PgMeta.seqNames.flatMap { n =>
        PgMeta.seqLocked(n)(f => PgMeta.seqRead(f))
          .map(r => (n, r.defn, r.lastValue, r.called))
      }
    else {
      import scala.jdk.CollectionConverters._
      seqs.entrySet().asScala.toSeq.sortBy(_.getKey).map { e =>
        val s = e.getValue
        val (lv, c) = s.synchronized((s.lastValue, s.called))
        (e.getKey, s.defn, lv, c)
      }
    }

  /** ALTER SEQUENCE … RESTART [WITH n] */
  def restart(name: String, withV: Option[Long]): Unit =
    if (fileMode) PgMeta.seqLocked(name) { f =>
      val rec = PgMeta.seqRead(f).getOrElse(throw missing(name))
      PgMeta.seqWrite(f, rec.copy(
        lastValue = withV.getOrElse(rec.defn.start), called = false, logCnt = 0L))
    }
    else {
      val s = state(name)
      s.synchronized {
        s.lastValue = withV.getOrElse(s.defn.start)
        s.called = false
        s.logCnt = 0L
      }
    }

  private def missing(name: String) =
    PgException("42P01", s"""relation "$name" does not exist""")

  private def state(name: String): SeqState = {
    val s = seqs.get(name)
    if (s == null) throw missing(name)
    s
  }

  /** One consistent (defn, lastValue, called, logCnt) read — the
    * catalog/UDF reader for both modes. */
  private def readRec(name: String): (SeqDef, Long, Boolean, Long) =
    if (fileMode)
      PgMeta.seqLocked(name) { f =>
        val r = PgMeta.seqRead(f).getOrElse(throw missing(name))
        (r.defn, r.lastValue, r.called, r.logCnt)
      }
    else {
      val s = state(name)
      s.synchronized((s.defn, s.lastValue, s.called, s.logCnt))
    }

  def nextval(name: String, connId: Int): Long = {
    val v =
      if (fileMode) PgMeta.seqLocked(name) { f =>
        val rec = PgMeta.seqRead(f).getOrElse(throw missing(name))
        val next = nextOf(name, rec.defn, rec.lastValue, rec.called)
        PgMeta.seqWrite(f, rec.copy(lastValue = next, called = true,
          logCnt = logCntAfter(rec.logCnt, 1)))
        next
      }
      else {
        val s = state(name)
        s.synchronized {
          val next = nextOf(name, s.defn, s.lastValue, s.called)
          s.lastValue = next
          s.called = true
          s.logCnt = logCntAfter(s.logCnt, 1)
          next
        }
      }
    sessionCurr.put((connId, name), v)
    sessionLast.put(connId, v)
    v
  }

  def isCycle(name: String): Boolean =
    if (fileMode)
      PgMeta.seqLocked(name)(f => PgMeta.seqRead(f)).exists(_.defn.cycle)
    else {
      val s = seqs.get(name)
      s != null && s.defn.cycle
    }

  /** Reserve `n` consecutive draws in one driver-side pass — the
    * INSERT … SELECT allocator (count + reserve two-pass): returns
    * (firstValue, increment). Implemented as n real [[nextval]] state
    * transitions so overflow (2200H), log_cnt, currval and lastval
    * keep their exact pinned semantics; the caller turns the block
    * into `first + (row_number - 1) * increment` arithmetic inside
    * the distributed write, so executor tasks never touch driver
    * sequence state. CYCLE sequences wrap mid-block (the values are
    * not an arithmetic progression) — callers must check [[isCycle]]
    * first and fall back to the per-row UDF path. */
  def reserveBlock(name: String, n: Long, connId: Int): (Long, Long) = {
    require(n > 0, "reserveBlock needs n > 0")
    if (fileMode) return reserveBlockFile(name, n, connId)
    val inc = state(name).defn.increment
    var last = 0L
    var i = 0L
    while (i < n) { last = nextval(name, connId); i += 1 }
    (last - (n - 1) * inc, inc)
  }

  /** File-mode block reservation: ONE lock round-trip per statement
    * (not n), with the n-draw state transition computed in closed form
    * for non-CYCLE sequences. Observable semantics match n nextvals
    * exactly, including the partial-draw-then-2200H behavior when the
    * block overruns MAXVALUE (pg burns the values it managed to draw
    * before erroring; sweep-36d pins the deviation shape). CYCLE
    * sequences (values not an arithmetic progression — callers check
    * [[isCycle]] first) fall back to looped transitions under the
    * same single lock. */
  private def reserveBlockFile(name: String, n: Long, connId: Int): (Long, Long) =
    PgMeta.seqLocked(name) { f =>
      val rec = PgMeta.seqRead(f).getOrElse(throw missing(name))
      val d = rec.defn
      if (d.cycle) {
        var lv = rec.lastValue; var called = rec.called
        var i = 0L; var last = 0L
        while (i < n) {
          last = nextOf(name, d, lv, called); lv = last; called = true; i += 1
        }
        PgMeta.seqWrite(f, rec.copy(lastValue = lv, called = true,
          logCnt = logCntAfter(rec.logCnt, n)))
        sessionCurr.put((connId, name), last)
        sessionLast.put(connId, last)
        (last - (n - 1) * d.increment, d.increment) // callers never take this arm
      } else {
        val first = nextOf(name, d, rec.lastValue, rec.called)
        // draws that fit: first + k*inc within [minV, maxV] for k < n
        val room =
          if (d.increment > 0) (d.maxV - first) / d.increment
          else (d.minV - first) / d.increment // both negative → positive
        val fits = math.min(n - 1, room) + 1 // first always fits (nextOf checked)
        val last = first + (fits - 1) * d.increment
        PgMeta.seqWrite(f, rec.copy(lastValue = last, called = true,
          logCnt = logCntAfter(rec.logCnt, fits)))
        sessionCurr.put((connId, name), last)
        sessionLast.put(connId, last)
        if (fits < n) throw overflow(name, d)
        (first, d.increment)
      }
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
    def check(d: SeqDef): Unit =
      if (v < d.minV || v > d.maxV) throw PgException("22003",
        s"""setval: value $v is out of bounds for sequence "$name" (${d.minV}..${d.maxV})""")
    if (fileMode) PgMeta.seqLocked(name) { f =>
      val rec = PgMeta.seqRead(f).getOrElse(throw missing(name))
      check(rec.defn)
      PgMeta.seqWrite(f, rec.copy(lastValue = v, called = isCalled, logCnt = 0L))
    }
    else {
      val s = state(name)
      s.synchronized {
        check(s.defn)
        s.lastValue = v
        s.called = isCalled
        s.logCnt = 0L
      }
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
    seqs.clear(); sessionCurr.clear(); sessionLast.clear(); serialCols.clear()
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
    // live-state readers behind the catalog surface: the per-sequence
    // relation view (`SELECT * FROM s` → last_value|log_cnt|is_called)
    // and pg_sequences.last_value (NULL until first nextval/setval).
    // Nondeterministic so no plan-time folding freezes a snapshot.
    spark.udf.register("pg_seq_last_value",
      udf((n: String) => readRec(n)._2).asNondeterministic())
    spark.udf.register("pg_seq_log_cnt",
      udf((n: String) => readRec(n)._4).asNondeterministic())
    spark.udf.register("pg_seq_is_called",
      udf((n: String) => readRec(n)._3).asNondeterministic())
    spark.udf.register("pg_seq_last_value_vis",
      udf((n: String) => {
        val (_, lv, called, _) = readRec(n)
        if (called) java.lang.Long.valueOf(lv) else null
      }).asNondeterministic())
    // pg_get_serial_sequence(table, column): the implicit sequence a
    // serial column owns, else NULL for a plain column (live-pinned);
    // 42P01/42703 for a missing relation/column like pg. This UDF is
    // the non-literal-argument fallback over the wire-DDL registry;
    // literal calls are folded at rewrite time against the catalog.
    spark.udf.register("pg_get_serial_sequence",
      udf((tbl: String, col: String) =>
        serialSeqOf(tbl, col).map("public." + _).orNull))
  }
}
