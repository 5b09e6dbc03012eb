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
    * (`t_pkey`, `t_a_b_key`) or user-declared constraint name.
    * `deferrable`/`initiallyDeferred` (r18) mirror pg_constraint's
    * condeferrable/condeferred — a deferrable unique skips its
    * statement-time 23505 probe inside a transaction block when the
    * session has it SET … DEFERRED (or it is INITIALLY DEFERRED) and
    * re-probes at COMMIT. */
  final case class Unique(name: String, cols: Seq[String], isPrimary: Boolean,
      deferrable: Boolean = false, initiallyDeferred: Boolean = false)

  /** One CHECK constraint: the raw pg expression text, ENFORCED on
    * every write path (23514 on FALSE; NULL passes, pg's rule). Name
    * is pg's generated (`t_a_check`, `t_check`, dup suffix `…1`) or
    * user-declared. */
  final case class Check(name: String, expr: String)

  /** One FOREIGN KEY: pg_get_constraintdef text (the canonical form
    * `FOREIGN KEY (a, b) REFERENCES t(c, d)[ ON UPDATE X][ ON DELETE
    * X]`, actions rendered only when not NO ACTION — pg's own
    * rendering) and ENFORCED at write time (r16): 23503 on
    * child-INSERT/UPDATE rows whose non-null key finds no parent, and
    * on parent-DELETE/UPDATE rows still referenced (MATCH SIMPLE —
    * any NULL member passes, pg's default). ON DELETE referential
    * actions EXECUTE (r17, sweep-42): CASCADE / SET NULL / SET
    * DEFAULT run as extra distributed DML steps inside the deleting
    * statement, recursively; ON UPDATE cascade-class actions remain
    * recorded + 0A000 at fire time. NO ACTION and RESTRICT behave
    * identically here (no deferred constraints). */
  final case class Fk(name: String, condef: String)

  /** [[Fk]] structurally decoded from its condef text (the condef IS
    * the storage format — it round-trips through `pg.fks` metadata
    * and the catalog surface already renders it verbatim). */
  final case class FkDef(cols: Seq[String], refTable: String,
      refCols: Seq[String], onDelete: Char, onUpdate: Char,
      deferrable: Boolean = false, initiallyDeferred: Boolean = false)

  private val fkDefRe =
    ("(?is)FOREIGN\\s+KEY\\s*\\(([^)]*)\\)\\s+REFERENCES\\s+" +
      "(\"[^\"]+\"|[\\w$.]+)\\s*(?:\\(([^)]*)\\))?(.*)").r

  private def unqIdent(s: String): String = {
    val t = s.trim
    if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
      t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t
  }

  def parseFk(fk: Fk): Option[FkDef] =
    fkDefRe.findFirstMatchIn(fk.condef).map { m =>
      val cols = m.group(1).split(",").toSeq.map(unqIdent).filter(_.nonEmpty)
      val refT = unqIdent(m.group(2)).split("\\.").last
      val refCols = Option(m.group(3)).map(
        _.split(",").toSeq.map(unqIdent).filter(_.nonEmpty)).getOrElse(cols)
      val (onDel, onUpd) = fkActions(m.group(4))
      val (defr, initDef) = deferFlags(m.group(4))
      FkDef(cols, refT, refCols, onDel, onUpd, defr, initDef)
    }

  /** `DEFERRABLE [INITIALLY DEFERRED]` flags harvested from raw
    * constraint clause text (NOT DEFERRABLE and INITIALLY IMMEDIATE
    * read back as the false defaults; INITIALLY DEFERRED implies
    * DEFERRABLE, pg's rule). */
  def deferFlags(tail: String): (Boolean, Boolean) = {
    val notDef = "(?is)NOT\\s+DEFERRABLE".r.findFirstIn(tail).isDefined
    val initDef = "(?is)INITIALLY\\s+DEFERRED".r.findFirstIn(tail).isDefined
    val defr = !notDef &&
      ("(?is)\\bDEFERRABLE\\b".r.findFirstIn(tail).isDefined || initDef)
    (defr, defr && initDef)
  }

  /** pg_get_constraintdef's deferral suffix (INITIALLY IMMEDIATE and
    * NOT DEFERRABLE are defaults and render as nothing). */
  def deferSuffix(deferrable: Boolean, initiallyDeferred: Boolean): String =
    (if (deferrable) " DEFERRABLE" else "") +
      (if (initiallyDeferred) " INITIALLY DEFERRED" else "")

  /** `ON DELETE/UPDATE <action>` letters harvested from raw FK clause
    * text (pg letters: a=no action, r=restrict, c=cascade,
    * n=set null, d=set default). */
  def fkActions(tail: String): (Char, Char) = {
    def act(kind: String): Char =
      ("(?is)ON\\s+" + kind +
        "\\s+(CASCADE|RESTRICT|NO\\s+ACTION|SET\\s+NULL|SET\\s+DEFAULT)").r
        .findFirstMatchIn(tail)
        .map(_.group(1).toLowerCase.replaceAll("\\s+", " ") match {
          case "cascade" => 'c'
          case "restrict" => 'r'
          case "set null" => 'n'
          case "set default" => 'd'
          case _ => 'a'
        }).getOrElse('a')
    (act("DELETE"), act("UPDATE"))
  }

  /** pg's pg_get_constraintdef action suffix rendering (NO ACTION is
    * omitted; ON UPDATE precedes ON DELETE). */
  def fkActionSuffix(onDelete: Char, onUpdate: Char): String = {
    def word(c: Char): String = c match {
      case 'c' => "CASCADE"
      case 'r' => "RESTRICT"
      case 'n' => "SET NULL"
      case 'd' => "SET DEFAULT"
      case _ => ""
    }
    (if (onUpdate != 'a') s" ON UPDATE ${word(onUpdate)}" else "") +
      (if (onDelete != 'a') s" ON DELETE ${word(onDelete)}" else "")
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Unique]]()
  private val checkCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Check]]()
  private val fkCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Fk]]()

  /** Bumps on every registry write — a cheap catalog-view
    * fingerprint component (pg_indexes lists constraint indexes). */
  private val versionCounter = new java.util.concurrent.atomic.AtomicLong(0)
  def version: Long = versionCounter.get()

  def register(table: String, uniques: Seq[Unique]): Unit = {
    cache.put(PgSequences.normName(table), uniques)
    versionCounter.incrementAndGet()
  }

  def drop(table: String): Unit = {
    cache.remove(PgSequences.normName(table))
    checkCache.remove(PgSequences.normName(table))
    fkCache.remove(PgSequences.normName(table))
    versionCounter.incrementAndGet()
  }

  def registerChecks(table: String, checks: Seq[Check]): Unit = {
    checkCache.put(PgSequences.normName(table), checks)
    versionCounter.incrementAndGet()
  }

  def registerFks(table: String, fks: Seq[Fk]): Unit = {
    fkCache.put(PgSequences.normName(table), fks)
    versionCounter.incrementAndGet()
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** `pg.checks` metadata form: `name|<urlencoded expr>;…` (the expr
    * may contain any character, so it travels encoded). */
  def serializeChecks(checks: Seq[Check]): String =
    checks.map(c => c.name + "|" + enc(c.expr)).mkString(";")

  private def deserializeChecks(s: String): Seq[Check] =
    s.split(";").toSeq.filter(_.nonEmpty).map { part =>
      val Array(n, e) = part.split("\\|", 2)
      Check(n, dec(e))
    }

  /** `pg.fks` metadata form: `name|<urlencoded condef>;…`. */
  def serializeFks(fks: Seq[Fk]): String =
    fks.map(f => f.name + "|" + enc(f.condef)).mkString(";")

  private def deserializeFks(s: String): Seq[Fk] =
    s.split(";").toSeq.filter(_.nonEmpty).map { part =>
      val Array(n, d) = part.split("\\|", 2)
      Fk(n, dec(d))
    }

  /** CHECKs for a table — registry hit, else rebuilt from `pg.checks`
    * metadata (fresh-JVM path), mirroring [[uniquesOf]]. */
  def checksOf(table: String, schema: StructType): Seq[Check] = {
    val key = PgSequences.normName(table)
    val hit = checkCache.get(key)
    if (hit != null) return hit
    val fromMeta = schema.fields.toSeq
      .filter(_.metadata.contains("pg.checks"))
      .flatMap(f => deserializeChecks(f.metadata.getString("pg.checks")))
    checkCache.put(key, fromMeta)
    fromMeta
  }

  /** Recorded FOREIGN KEYs (catalog-only). */
  def fksOf(table: String, schema: StructType): Seq[Fk] = {
    val key = PgSequences.normName(table)
    val hit = fkCache.get(key)
    if (hit != null) return hit
    val fromMeta = schema.fields.toSeq
      .filter(_.metadata.contains("pg.fks"))
      .flatMap(f => deserializeFks(f.metadata.getString("pg.fks")))
    fkCache.put(key, fromMeta)
    fromMeta
  }

  /** The serialized form stored in `pg.uniques` column metadata:
    * `name|P|c1,c2;name2|U|c3`; a deferrable constraint carries a
    * 4th field (`D` = deferrable, `DI` = + initially deferred) that
    * older entries simply lack. */
  def serialize(uniques: Seq[Unique]): String =
    uniques.map { u =>
      val base = u.name + "|" + (if (u.isPrimary) "P" else "U") + "|" +
        u.cols.mkString(",")
      if (u.deferrable)
        base + "|D" + (if (u.initiallyDeferred) "I" else "")
      else base
    }.mkString(";")

  private def deserialize(s: String): Seq[Unique] =
    s.split(";").toSeq.filter(_.nonEmpty).map { part =>
      val fs = part.split("\\|", 4)
      val flags = if (fs.length > 3) fs(3) else ""
      Unique(fs(0), fs(2).split(",").toSeq, fs(1) == "P",
        deferrable = flags.contains("D"),
        initiallyDeferred = flags.contains("I"))
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
    notNullCols(schema).nonEmpty || uniquesOf(table, schema).nonEmpty ||
      checksOf(table, schema).nonEmpty || fksOf(table, schema).nonEmpty
}

/** CREATE/DROP INDEX surface (pg §11). Spark has no secondary
  * indexes, so a plain index is pure CATALOG state: its name is
  * reserved (42P07 on reuse), it lists in `pg_indexes`, and it drops
  * with its table/column — the planner sees nothing. A UNIQUE index
  * is real: it registers in [[PgConstraints]] (pg implements unique
  * constraints AS unique indexes, same error text either way) and is
  * serialized into `pg.uniques` column metadata by the table rewrite.
  * Plain-index names live only in this driver-JVM registry —
  * re-creating one after a restart is accepted (documented; unique
  * indexes, the enforcing kind, DO survive via metadata). */
object PgIndexes {

  final case class Idx(name: String, table: String, colsText: String,
    unique: Boolean, method: String)

  private val byName =
    new java.util.concurrent.ConcurrentHashMap[String, Idx]()

  def register(i: Idx): Unit = { byName.put(i.name, i); PgMeta.saveIndexes() }
  def lookup(name: String): Option[Idx] = Option(byName.get(name))
  def drop(name: String): Option[Idx] = {
    val r = Option(byName.remove(name))
    if (r.isDefined) PgMeta.saveIndexes()
    r
  }
  /** All indexes, ordered — the PgMeta persistence snapshot. */
  def allIdx: Seq[Idx] = {
    val out = Seq.newBuilder[Idx]
    byName.forEach((_, i) => out += i)
    out.result().sortBy(_.name)
  }
  /** Fresh-JVM reload from the PgMeta store. */
  def restore(idxs: Seq[Idx]): Unit = idxs.foreach(i => byName.put(i.name, i))
  private[graft] def reset(): Unit = byName.clear()
  def names: Seq[String] = {
    val out = Seq.newBuilder[String]
    byName.forEach((k, _) => out += k)
    out.result().sorted
  }
  def forTable(table: String): Seq[Idx] = {
    val out = Seq.newBuilder[Idx]
    byName.forEach((_, i) => if (i.table.equalsIgnoreCase(table)) out += i)
    out.result().sortBy(_.name)
  }
  def dropTable(table: String): Unit = {
    forTable(table).foreach(i => byName.remove(i.name))
    PgMeta.saveIndexes()
  }
  def renameTable(oldT: String, newT: String): Unit = {
    forTable(oldT).foreach(i => byName.put(i.name, i.copy(table = newT)))
    PgMeta.saveIndexes()
  }
  /** Indexes referencing a dropped column drop with it (pg's
    * dependency cascade) — word-level match over the key text. */
  def dropColumn(table: String, col: String): Unit = {
    forTable(table).foreach { i =>
      if (("(?i)\\b" + java.util.regex.Pattern.quote(col) + "\\b").r
        .findFirstIn(i.colsText).isDefined) byName.remove(i.name)
    }
    PgMeta.saveIndexes()
  }
  /** A renamed column renames inside index key text (pg rewrites the
    * stored definition the same way). */
  def renameColumn(table: String, oldCol: String, newCol: String): Unit = {
    forTable(table).foreach { i =>
      val re = ("(?i)\\b" + java.util.regex.Pattern.quote(oldCol) + "\\b").r
      if (re.findFirstIn(i.colsText).isDefined)
        byName.put(i.name, i.copy(colsText = re.replaceAllIn(i.colsText,
          scala.util.matching.Regex.quoteReplacement(newCol))))
    }
    PgMeta.saveIndexes()
  }
}

/** Views created over the wire. Spark refuses a PERMANENT view over a
  * temp-view-registered data file, so pg CREATE VIEW lowers to a
  * session-catalog temp view — which the single shared SparkSession
  * makes visible to every connection, exactly pg's database-scoped
  * behavior — and this registry carries the pg-facing definition text
  * for pg_views / relkind 'v'. Wire-registered DATA files are also
  * temp views but are not registered here, so they keep playing pg's
  * table role. */
/** Materialized-view registry: pg-facing definition text, the
  * Compat-rewritten body REFRESH re-runs, and the populated flag
  * (WITH NO DATA creates empty; scans of an unpopulated matview raise
  * pg's 55000 until the first REFRESH). The backing storage is a
  * managed parquet table — matviews are physical in pg, and a table
  * write is exactly what a 100 TB refresh does. */
object PgMatViews {
  final case class MatView(definition: String, rewritten: String,
      populated: Boolean)
  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, MatView]()
  private val versionCounter = new java.util.concurrent.atomic.AtomicLong(0)
  def version: Long = versionCounter.get()
  def register(name: String, mv: MatView): Unit = {
    defs.put(name, mv); versionCounter.incrementAndGet()
    PgMeta.saveMatViews()
  }
  def setPopulated(name: String): Unit = {
    val mv = defs.get(name)
    if (mv != null) { defs.put(name, mv.copy(populated = true))
      versionCounter.incrementAndGet(); PgMeta.saveMatViews() }
  }
  def drop(name: String): Boolean = {
    val had = defs.remove(name) != null
    if (had) { versionCounter.incrementAndGet(); PgMeta.saveMatViews() }
    had
  }
  /** Fresh-JVM reload from the PgMeta store (backing tables are
    * restored separately from tables.tsv). */
  def restore(mvs: Map[String, MatView]): Unit = {
    mvs.foreach { case (n, mv) => defs.put(n, mv) }
    if (mvs.nonEmpty) versionCounter.incrementAndGet()
  }
  private[graft] def reset(): Unit = { defs.clear(); versionCounter.incrementAndGet() }
  def lookup(name: String): Option[MatView] = Option(defs.get(name))
  def unpopulated: Set[String] = {
    val b = Set.newBuilder[String]
    defs.forEach((k, v) => if (!v.populated) b += k)
    b.result()
  }
  def all: Map[String, MatView] = {
    val b = Map.newBuilder[String, MatView]
    defs.forEach((k, v) => b += (k -> v))
    b.result()
  }
}

/** COMMENT ON storage: (objoid, objsubid) → text, live-read by the
  * obj_description / col_description functions and rendered as
  * pg_description rows (classoid 1259 = pg_class; subid 0 = the
  * relation itself, n = column attnum). IS NULL removes, like pg. */
object PgComments {
  private val defs =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), String]()
  private val versionCounter = new java.util.concurrent.atomic.AtomicLong(0)
  def version: Long = versionCounter.get()
  def set(objoid: Int, subid: Int, text: Option[String]): Unit = {
    text match {
      case Some(t) => defs.put((objoid, subid), t)
      case None => defs.remove((objoid, subid))
    }
    versionCounter.incrementAndGet()
    PgMeta.saveComments()
  }
  /** Fresh-JVM reload from the PgMeta store. */
  def restore(rows: Seq[(Int, Int, String)]): Unit = {
    rows.foreach { case (o, s, t) => defs.put((o, s), t) }
    if (rows.nonEmpty) versionCounter.incrementAndGet()
  }
  private[graft] def reset(): Unit = { defs.clear(); versionCounter.incrementAndGet() }
  def get(objoid: Int, subid: Int): Option[String] =
    Option(defs.get((objoid, subid)))
  def all: Seq[(Int, Int, String)] = {
    val b = Seq.newBuilder[(Int, Int, String)]
    defs.forEach((k, v) => b += ((k._1, k._2, v)))
    b.result().sortBy(t => (t._1, t._2))
  }
}

object PgViews {
  /** `definition` is the pg-facing body (pg_views); `finalSql` is the
    * Compat-rewritten Spark text the temp view was created with — a
    * fresh JVM replays `CREATE OR REPLACE TEMPORARY VIEW … AS
    * <finalSql>` to re-materialize the view (PgMeta restore path). */
  final case class WireView(definition: String, finalSql: String)
  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, WireView]()
  private val versionCounter = new java.util.concurrent.atomic.AtomicLong(0)
  def version: Long = versionCounter.get()
  def register(name: String, definition: String, finalSql: String = ""): Unit = {
    defs.put(name, WireView(definition, finalSql))
    versionCounter.incrementAndGet()
    PgMeta.saveViews()
  }
  def drop(name: String): Boolean = {
    val had = defs.remove(name) != null
    if (had) { versionCounter.incrementAndGet(); PgMeta.saveViews() }
    had
  }
  def lookup(name: String): Option[String] =
    Option(defs.get(name)).map(_.definition)
  def all: Map[String, String] = allFull.map { case (k, v) => k -> v.definition }
  def allFull: Map[String, WireView] = {
    val b = Map.newBuilder[String, WireView]
    defs.forEach((k, v) => b += (k -> v))
    b.result()
  }
  private[graft] def reset(): Unit = { defs.clear(); versionCounter.incrementAndGet() }
}
