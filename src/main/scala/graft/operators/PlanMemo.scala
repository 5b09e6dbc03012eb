package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded memo for small driver-side artifacts derived from a scan
  * (IVF centroids, mixture-sample group censuses).
  *
  * The r14 shape — a static ConcurrentHashMap keyed on (SparkSession,
  * queryExecution.logical) — had two defects: for `spark.table(name)`
  * the unresolved plan compares equal across data changes, so DML on
  * the underlying table silently served stale centroids/censuses; and
  * the map grew without bound while pinning session + plan references.
  *
  * Here the key is (session identity, canonicalized analyzed-plan
  * hash, sorted input-file list, per-file length⊕mtime stamps): any
  * append/overwrite of a file-backed table changes the file list or
  * stamps and misses the memo, and plan-less inputs (LocalRelation
  * test frames) embed their data in the canonicalized plan itself.
  * The store is a 64-entry access-order LRU holding no session or
  * plan references.
  */
private[graft] object PlanMemo {
  /** `SPARK_GRAFT_MEMO=0` disables the memo for the session — every
    * getOrCompute runs its cold path. Measurement knob (r18 verdict
    * item 4): the bench's min-of-N reports the warm/serve path for
    * memo-backed queries (sample 1 pays the build, samples 2+ hit the
    * memo); a bench run with the knob off reports the cold/build path
    * instead, so build and serve cost can be published separately.
    * Results are identical either way — the memo only caches
    * deterministic index state keyed on data fingerprints. */
  private val disabled = sys.env.get("SPARK_GRAFT_MEMO").contains("0")
  private val MaxEntries = 64
  private val store = new java.util.LinkedHashMap[Any, Any](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Any, Any]): Boolean =
      size() > MaxEntries
  }

  /** Data-fingerprinted key component for `df` (combine with the
    * operator's own parameters). */
  def dataKey(df: DataFrame): Any = {
    val files = df.inputFiles.sorted.toSeq
    val stamps = files.map { f =>
      try {
        val p = new java.io.File(new java.net.URI(f).getPath)
        p.lastModified() ^ (p.length() << 20)
      } catch { case scala.util.control.NonFatal(_) => f.hashCode.toLong }
    }
    (System.identityHashCode(df.sparkSession),
      df.queryExecution.analyzed.semanticHash(),
      files, stamps)
  }

  /** Memoized value if present — for callers whose COLD path needs
    * extra machinery (a persist feeding two consumers) that the warm
    * path should skip entirely. */
  def peek[V](key: Any): Option[V] =
    if (disabled) None
    else Option(store.synchronized(store.get(key))).map(_.asInstanceOf[V])

  /** Double-checked get-or-compute; `compute` runs outside the lock
    * (a concurrent duplicate compute is cheaper than holding the lock
    * through a Spark job). */
  def getOrCompute[V](key: Any)(compute: => V): V = {
    if (disabled) return compute
    val hit = store.synchronized(store.get(key))
    if (hit != null) hit.asInstanceOf[V]
    else {
      val v = compute
      store.synchronized(store.put(key, v))
      v
    }
  }
}
