package graft.operators

/** Aho–Corasick multi-pattern string matching automaton (Aho & Corasick,
  * CACM 1975 — public algorithm). Built once on the driver over the
  * pattern set (an eval-benchmark snippet list), broadcast to executors,
  * and run as ONE linear pass per document regardless of pattern count —
  * the scale replacement for the naive per-pattern `indexOf` loop, which
  * is O(patterns × text) and melts once the decontamination snippet set
  * reaches the tens of thousands.
  *
  * Representation: goto as one HashMap[(state << 16) | char] would box;
  * instead each state holds a sorted char array + child array (binary
  * search per step), fail links and a per-state matched-pattern bitset
  * index are flat int arrays. Memory is O(total pattern chars).
  *
  * Matching is case-sensitive over UTF-16 code units (the same units
  * both Spark's `contains`/`position` and DuckDB's `position` compare,
  * so an exact SQL oracle reproduces the result set).
  */
final class AhoCorasick private (
    charKeys: Array[Array[Char]],
    children: Array[Array[Int]],
    fail: Array[Int],
    // patterns ending at each state (via output links): stored as the
    // head of a linked list into (patIdx, nextOutput)
    outPat: Array[Int],
    outNext: Array[Int],
    outHead: Array[Int],
    val patternCount: Int) extends Serializable {

  private def step(state0: Int, c: Char): Int = {
    var state = state0
    while (true) {
      val keys = charKeys(state)
      val i = java.util.Arrays.binarySearch(keys, c)
      if (i >= 0) return children(state)(i)
      if (state == 0) return 0
      state = fail(state)
    }
    0
  }

  /** Count of DISTINCT patterns occurring in `text` (each pattern counted
    * once no matter how many occurrences). One pass, O(text + matches).
    */
  def distinctMatches(text: String): Int = {
    if (text == null || patternCount == 0) return 0
    val seen = new java.util.BitSet(patternCount)
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      state = step(state, text.charAt(i))
      var o = outHead(state)
      while (o != -1) {
        seen.set(outPat(o))
        o = outNext(o)
      }
      i += 1
    }
    seen.cardinality()
  }
}

object AhoCorasick {

  /** Build the automaton (trie + BFS fail links + output-link merge)
    * over `patterns`. Empty patterns are ignored; duplicates collapse
    * to one pattern index (so distinct-match counts treat them once).
    */
  def build(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.filter(p => p != null && p.nonEmpty).distinct.toArray
    // --- trie with growable per-node sorted edge lists
    val keys = scala.collection.mutable.ArrayBuffer(Array.empty[Char])
    val kids = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    val patAt = scala.collection.mutable.ArrayBuffer(-1) // pattern ending exactly here
    def childOf(s: Int, c: Char): Int = {
      val i = java.util.Arrays.binarySearch(keys(s), c)
      if (i >= 0) kids(s)(i) else -1
    }
    def addChild(s: Int, c: Char): Int = {
      val node = keys.length
      keys += Array.empty[Char]
      kids += Array.empty[Int]
      patAt += -1
      val i = java.util.Arrays.binarySearch(keys(s), c)
      val ins = -i - 1
      val ck = keys(s); val cc = kids(s)
      val nk = new Array[Char](ck.length + 1)
      val nc = new Array[Int](cc.length + 1)
      System.arraycopy(ck, 0, nk, 0, ins); System.arraycopy(cc, 0, nc, 0, ins)
      nk(ins) = c; nc(ins) = node
      System.arraycopy(ck, ins, nk, ins + 1, ck.length - ins)
      System.arraycopy(cc, ins, nc, ins + 1, cc.length - ins)
      keys(s) = nk; kids(s) = nc
      node
    }
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val t = childOf(s, c)
        s = if (t >= 0) t else addChild(s, c)
        i += 1
      }
      patAt(s) = pi
    }
    val n = keys.length
    val fail = new Array[Int](n)
    // output linked lists: state -> chain of pattern indexes
    val outHead = Array.fill(n)(-1)
    val outPat = scala.collection.mutable.ArrayBuffer.empty[Int]
    val outNext = scala.collection.mutable.ArrayBuffer.empty[Int]
    def pushOut(s: Int, pi: Int): Unit = {
      outPat += pi; outNext += outHead(s); outHead(s) = outPat.length - 1
    }
    // --- BFS fail links; merge fail-state outputs by CHAINING to the
    // fail state's list (classic output-link trick — O(1) per state,
    // matches walk the chain)
    val queue = new java.util.ArrayDeque[Int]()
    var ri = 0
    while (ri < keys(0).length) { // depth-1 states fail to root
      val s = kids(0)(ri)
      fail(s) = 0
      if (patAt(s) >= 0) pushOut(s, patAt(s))
      queue.add(s)
      ri += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll()
      var ei = 0
      while (ei < keys(s).length) {
        val c = keys(s)(ei)
        val t = kids(s)(ei)
        var f = fail(s)
        var ft = childOf(f, c)
        while (ft < 0 && f != 0) { f = fail(f); ft = childOf(f, c) }
        fail(t) = if (ft >= 0 && ft != t) ft else 0
        if (patAt(t) >= 0) pushOut(t, patAt(t))
        // chain the fail state's output list after t's own entries
        if (outHead(t) == -1) outHead(t) = outHead(fail(t))
        else {
          var tail = outHead(t)
          while (outNext(tail) != -1) tail = outNext(tail)
          outNext(tail) = outHead(fail(t))
        }
        queue.add(t)
        ei += 1
      }
    }
    new AhoCorasick(keys.toArray, kids.toArray, fail,
      outPat.toArray, outNext.toArray, outHead, pats.length)
  }
}
