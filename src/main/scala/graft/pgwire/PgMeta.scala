package graft.pgwire

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Warehouse-backed persistence for the DDL registries (VERDICT r16
  * item 1 — the last single-JVM assumption): enums, sequences, plain
  * indexes, materialized views, views, comments, serial ownership,
  * stable OIDs, and the wire-created table catalog itself.
  *
  * Design: the in-memory registries stay the runtime representation
  * (UDF closures snapshot them per stage, catalog views read them),
  * but every mutation WRITES THROUGH to a metadata directory — one
  * TSV file per registry, URL-encoded fields, atomic tmp+rename — and
  * [[attach]] on a fresh JVM reloads them, so a second SparkSession
  * over the same warehouse sees every enum/index/matview/comment/
  * table and renders identical catalog state (PgMetaSpec proves it
  * value-for-value, including a REAL second JVM for sequences).
  *
  * SEQUENCES are the exception to write-through: two JVMs drawing
  * from a cached counter would hand out the same value, so when a
  * meta root is attached the sequence state lives ONLY in the files,
  * and every nextval/setval/reserveBlock is a read-modify-write under
  * a per-sequence file lock (java.nio FileLock for cross-process
  * exclusion + a JVM-local stripe for same-JVM threads, since POSIX
  * locks are per-process). pg itself serializes every nextval through
  * one buffer lock, so a centralized file allocator IS the
  * pg-equivalent design; the block-reservation bulk path
  * ([[PgSequences.reserveBlock]]) amortizes it to one lock per
  * INSERT…SELECT statement. Deployment note (r18): the cross-process
  * half is the pluggable [[SeqLockService]] — [[FileSeqLock]]
  * (default) needs a POSIX shared filesystem (NFS/local);
  * [[LocalSeqLock]] serves single-writer S3/HDFS deployments, and a
  * multi-writer object-store deployment provides the trait over a
  * real lock service (see the trait doc). Selected by
  * `spark.graft.seqLockService`.
  *
  * Activation: `spark.graft.metaDir=<dir>` at session build (PgServer
  * calls [[attachFromConf]]) or an explicit [[attach]]. Detached
  * (the default, and every pre-r17 test) nothing changes: all savers
  * are no-ops and sequences stay in-memory.
  */
object PgMeta {

  @volatile private var root: Option[Path] = None
  // restore-in-progress flag: registry mutators fire savers; during
  // attach() those would rewrite the files being read
  @volatile private var loading = false

  /** The attached root, if any. A plain volatile read — this sits on
    * the nextval hot path, so no sys.props (synchronized) lookups. */
  def currentRoot: Option[Path] = root

  def attached: Boolean = root.isDefined

  /** Point at a root WITHOUT loading registries — the sequence-drawing
    * child-JVM harness (and executor-side bootstrap on a shared FS)
    * only needs the file store, not the catalog restore. */
  def attachRootOnly(dir: String): Unit = {
    val r = Paths.get(dir)
    Files.createDirectories(r.resolve("seq"))
    root = Some(r)
  }

  def detach(): Unit = {
    root = None
    sys.props -= "graft.pg.metaDir"
  }

  // ---------------------------------------------------------------
  // encoding: TSV lines, URL-encoded fields (same convention as the
  // pg.uniques/pg.checks column-metadata serializers)
  // ---------------------------------------------------------------

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")

  private def writeAtomic(file: Path, lines: Seq[String]): Unit = {
    val tmp = file.resolveSibling(file.getFileName.toString + ".tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def readLines(file: Path): Seq[String] =
    if (!Files.exists(file)) Nil
    else new String(Files.readAllBytes(file), UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)

  private def saver(name: String)(lines: => Seq[String]): Unit = {
    val r = currentRoot
    if (r.isEmpty || loading) return
    writeAtomic(r.get.resolve(name), lines)
  }

  // ---------------------------------------------------------------
  // per-registry savers (write-through; called by registry mutators)
  // ---------------------------------------------------------------

  def saveEnums(spark: SparkSession): Unit = saver("enums.tsv") {
    graft.functions.PgEnums.snapshot(spark).map { case (n, d) =>
      s"${enc(n)}\t${d.oid}\t${d.labels.map(enc).mkString(",")}"
    }
  }

  def saveIndexes(): Unit = saver("indexes.tsv") {
    PgIndexes.allIdx.map(i =>
      s"${enc(i.name)}\t${enc(i.table)}\t${enc(i.colsText)}\t" +
        s"${if (i.unique) 1 else 0}\t${enc(i.method)}")
  }

  def saveMatViews(): Unit = saver("matviews.tsv") {
    PgMatViews.all.toSeq.sortBy(_._1).map { case (n, mv) =>
      s"${enc(n)}\t${enc(mv.definition)}\t${enc(mv.rewritten)}\t" +
        s"${if (mv.populated) 1 else 0}"
    }
  }

  def saveComments(): Unit = saver("comments.tsv") {
    PgComments.all.map { case (o, s, t) => s"$o\t$s\t${enc(t)}" }
  }

  def saveViews(): Unit = saver("views.tsv") {
    PgViews.allFull.toSeq.sortBy(_._1).map { case (n, v) =>
      s"${enc(n)}\t${enc(v.definition)}\t${enc(v.finalSql)}"
    }
  }

  def saveSerials(): Unit = saver("serials.tsv") {
    PgSequences.serialsSnapshot.flatMap { case (t, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, seq) =>
        s"${enc(t)}\t${enc(c)}\t${seq.map(enc).getOrElse("-")}"
      }
    }
  }

  def saveOids(counter: Int, entries: Seq[(String, Int)]): Unit =
    saver("oids.tsv") {
      s"#counter\t$counter" +: entries.sortBy(_._2).map { case (k, o) =>
        s"${enc(k)}\t$o"
      }
    }

  /** Snapshot every wire-created persistent table: name, location,
    * provider, and the FULL schema json (which carries pg.uniques /
    * pg.checks / pg.fks / pg.notnull / pg.default / pg.serial / pg.enum
    * column metadata — the constraint storage format). Called after
    * any CREATE/ALTER/DROP statement; a fresh JVM re-registers each
    * as an external table at the recorded location, so constraint
    * enforcement is value-for-value with the creating JVM. */
  def syncTables(spark: SparkSession): Unit = saver("tables.tsv") {
    val cat = spark.sessionState.catalog
    cat.listTables("default").flatMap { ident =>
      scala.util.Try(cat.getTableMetadata(ident)).toOption.map { m =>
        s"${enc(ident.table)}\t${enc(m.location.toString)}\t" +
          s"${enc(m.provider.getOrElse("parquet"))}\t${enc(m.schema.json)}"
      }
    }.sortBy(identity)
  }

  /** Post-statement hook from [[Handlers.execute]]: keeps tables.tsv
    * current after schema-shaping statements. Registry files are
    * written by their own mutators; only the Spark catalog has no
    * mutation hook of its own, hence this statement-level sync. */
  def afterStatement(spark: SparkSession, head: String): Unit = {
    if (!attached || loading) return
    head match {
      case "CREATE" | "DROP" | "ALTER" | "TRUNCATE" | "REFRESH" =>
        syncTables(spark)
      case _ => ()
    }
  }

  // ---------------------------------------------------------------
  // attach / restore
  // ---------------------------------------------------------------

  /** Attach from session conf (`spark.graft.metaDir`), if set. */
  def attachFromConf(spark: SparkSession): Unit =
    spark.conf.getOption("spark.graft.metaDir").foreach(attach(spark, _))

  def attach(spark: SparkSession, dir: String): Unit = synchronized {
    lockServiceFromConf(spark)
    val r = Paths.get(dir)
    Files.createDirectories(r.resolve("seq"))
    // flush any pre-attach in-memory sequence state into the store
    // (attach normally happens at session boot, before DDL; this makes
    // a late attach safe instead of silently forking the state)
    PgSequences.flushToFiles(r)
    root = Some(r)
    sys.props("graft.pg.metaDir") = dir
    loading = true
    try {
      // 1. stable OIDs first — comments key on them
      val oidLines = readLines(r.resolve("oids.tsv"))
      val counter = oidLines.collectFirst {
        case l if l.startsWith("#counter\t") => l.split("\t")(1).toInt
      }
      val oidEntries = oidLines.filterNot(_.startsWith("#")).map { l =>
        val Array(k, o) = l.split("\t", 2); dec(k) -> o.toInt
      }
      if (counter.isDefined) Oids.restore(counter.get, oidEntries)
      // 2. tables (carry constraint metadata in their schema json)
      readLines(r.resolve("tables.tsv")).foreach { l =>
        val Array(n, loc, prov, schemaJson) = l.split("\t", 4)
        val name = dec(n)
        if (!spark.catalog.tableExists(name)) {
          val schema = DataType.fromJson(dec(schemaJson)).asInstanceOf[StructType]
          spark.catalog.createTable(name, dec(prov), schema,
            Map("path" -> dec(loc)))
        }
      }
      // 3. enums (per-session registry)
      val enums = readLines(r.resolve("enums.tsv")).map { l =>
        val Array(n, oid, labels) = l.split("\t", 3)
        dec(n) -> graft.functions.PgEnums.EnumDef(oid.toInt,
          labels.split(",").toVector.filter(_.nonEmpty).map(dec))
      }
      graft.functions.PgEnums.restore(spark, enums)
      // 4. plain indexes
      PgIndexes.restore(readLines(r.resolve("indexes.tsv")).map { l =>
        val Array(n, t, cols, u, m) = l.split("\t", 5)
        PgIndexes.Idx(dec(n), dec(t), dec(cols), u == "1", dec(m))
      })
      // 5. matviews (backing tables restored in step 2)
      PgMatViews.restore(readLines(r.resolve("matviews.tsv")).map { l =>
        val Array(n, d, rw, pop) = l.split("\t", 4)
        dec(n) -> PgMatViews.MatView(dec(d), dec(rw), pop == "1")
      }.toMap)
      // 6. comments
      PgComments.restore(readLines(r.resolve("comments.tsv")).map { l =>
        val Array(o, s, t) = l.split("\t", 3)
        (o.toInt, s.toInt, dec(t))
      })
      // 7. serial ownership
      val serialRows = readLines(r.resolve("serials.tsv")).map { l =>
        val Array(t, c, s) = l.split("\t", 3)
        (dec(t), dec(c), if (s == "-") None else Some(dec(s)))
      }
      serialRows.groupBy(_._1).foreach { case (t, rows) =>
        PgSequences.registerTableSerials(t, rows.map(x => x._2 -> x._3))
      }
      // 8. views: recreate the temp view from the stored Spark-side
      // text, then register the pg-facing definition
      readLines(r.resolve("views.tsv")).foreach { l =>
        val Array(n, d, fin) = l.split("\t", 3)
        val name = dec(n)
        spark.sql("CREATE OR REPLACE TEMPORARY VIEW `" +
          name.replace("`", "``") + "` AS " + dec(fin))
        PgViews.register(name, dec(d), dec(fin))
      }
    } finally loading = false
    PgCatalog.invalidate()
  }

  // ---------------------------------------------------------------
  // sequence file store (authoritative when attached)
  // ---------------------------------------------------------------

  /** One sequence's persistent record. */
  final case class SeqRec(defn: PgSequences.SeqDef, lastValue: Long,
      called: Boolean, logCnt: Long)

  private def seqFile(r: Path, name: String): Path =
    r.resolve("seq").resolve(enc(name) + ".tsv")

  // JVM-local stripe: FileLock is per-process on POSIX — a second
  // lock attempt from another thread of THIS JVM throws
  // OverlappingFileLockException instead of blocking, so same-JVM
  // threads serialize here first, then the cross-process lock
  // service excludes other processes.
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Pluggable CROSS-PROCESS exclusion for a sequence's
    * read-modify-write (r18 — the VERDICT r17 lock-service seam).
    * The JVM-local stripe always runs; this trait adds the
    * between-processes half. [[FileSeqLock]] (default) is a
    * java.nio FileLock on a sibling `.lck` — correct on local disk
    * and POSIX shared filesystems (NFSv4+). [[LocalSeqLock]] is a
    * no-op beyond the stripe: for SINGLE-WRITER deployments where
    * exactly one driver process owns all DML — the practical S3/HDFS
    * story, since object stores have no file locks. A multi-writer
    * object-store deployment instead provides this trait over a real
    * lock service (ZooKeeper ephemeral nodes, etcd leases, DynamoDB
    * conditional puts); every allocator call is already funneled
    * through [[seqLocked]], so that is the only integration point.
    * Selected by `spark.graft.seqLockService=file|local` at attach.
    */
  trait SeqLockService {
    def withLock[T](lockPath: Path)(f: => T): T
  }

  object FileSeqLock extends SeqLockService {
    def withLock[T](lockPath: Path)(f: => T): T = {
      val ch = java.nio.channels.FileChannel.open(lockPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try f
        finally lock.release()
      } finally ch.close()
    }
  }

  object LocalSeqLock extends SeqLockService {
    def withLock[T](lockPath: Path)(f: => T): T = f
  }

  @volatile private var lockService: SeqLockService = FileSeqLock
  def currentLockService: SeqLockService = lockService
  def setLockService(s: SeqLockService): Unit = lockService = s
  private[pgwire] def lockServiceFromConf(spark: SparkSession): Unit =
    setLockService(
      spark.conf.getOption("spark.graft.seqLockService") match {
        case Some("local") => LocalSeqLock
        case _ => FileSeqLock
      })

  def seqLocked[T](name: String)(f: Path => T): T = {
    val r = currentRoot.getOrElse(
      throw new IllegalStateException("PgMeta not attached"))
    Files.createDirectories(r.resolve("seq"))
    val lockPath = r.resolve("seq").resolve(enc(name) + ".lck")
    val stripe = jvmLocks.computeIfAbsent(
      lockPath.toAbsolutePath.toString, _ => new Object)
    stripe.synchronized {
      lockService.withLock(lockPath)(f(seqFile(r, name)))
    }
  }

  def seqRead(file: Path): Option[SeqRec] =
    if (!Files.exists(file)) None
    else {
      val Array(inc, mn, mx, st, cyc, ty, lv, called, lc) =
        new String(Files.readAllBytes(file), UTF_8).trim.split("\t", 9)
      Some(SeqRec(
        PgSequences.SeqDef(inc.toLong, mn.toLong, mx.toLong, st.toLong,
          cyc == "1", ty.toInt),
        lv.toLong, called == "1", lc.toLong))
    }

  def seqWrite(file: Path, rec: SeqRec): Unit = {
    val d = rec.defn
    writeAtomic(file, Seq(
      s"${d.increment}\t${d.minV}\t${d.maxV}\t${d.start}\t" +
        s"${if (d.cycle) 1 else 0}\t${d.typid}\t${rec.lastValue}\t" +
        s"${if (rec.called) 1 else 0}\t${rec.logCnt}"))
  }

  def seqDelete(file: Path): Boolean = Files.deleteIfExists(file)

  /** Pre-attach flush: write an in-memory sequence into an explicit
    * root IF absent (attach() migrates pre-existing state this way —
    * file state, if present, wins). */
  def seqFlushDirect(r: Path, name: String, rec: SeqRec): Unit = {
    val f = seqFile(r, name)
    if (!Files.exists(f)) seqWrite(f, rec)
  }

  def seqNames: Seq[String] = currentRoot match {
    case None => Nil
    case Some(r) =>
      val dir = r.resolve("seq")
      if (!Files.exists(dir)) Nil
      else {
        val out = Seq.newBuilder[String]
        val s = Files.list(dir)
        try s.forEach { p =>
          val fn = p.getFileName.toString
          if (fn.endsWith(".tsv")) out += dec(fn.stripSuffix(".tsv"))
        } finally s.close()
        out.result().sorted
      }
  }
}
