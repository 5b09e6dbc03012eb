package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSession

/** Native string expressions for the fuzzy-match hot path.
  *
  * `lev_banded(a, b, k)` is threshold-limited edit distance: exactly
  * `levenshtein(a, b)` whenever that distance is <= k, and k+1
  * otherwise. The DP visits only the |i-j| <= k band (Ukkonen), so a
  * candidate pair costs O(k·len) instead of O(len²), with an early
  * exit the moment a whole band row exceeds k — on a blocked fuzzy
  * join almost every rejected pair aborts after two or three rows.
  * The generated code calls [[StringExpressions.levBanded]] (a static
  * JVM method) from inside whole-stage codegen, so pairs never leave
  * the codegen'd loop.
  *
  * Semantics notes: NULL if any input is NULL (TernaryExpression
  * null-intolerant default); `k` must be a non-negative integer;
  * distances are over UTF-16 code units, which matches
  * `levenshtein()` for all BMP text (the engine's corpora are BMP).
  */
object StringExpressions {

  /** Per-thread DP scratch rows — a blocked fuzzy join calls levBanded
    * millions of times per task; two fresh Int arrays per pair were a
    * measurable share of the q68 profile. */
  private final class LevBuf {
    var prev = new Array[Int](96)
    var cur = new Array[Int](96)
    def ensure(cap: Int): Unit = if (prev.length < cap) {
      prev = new Array[Int](cap); cur = new Array[Int](cap)
    }
  }
  private val levBuf = ThreadLocal.withInitial[LevBuf](() => new LevBuf)

  /** Threshold-limited Levenshtein: exact value if <= k, else k+1.
    * ASCII inputs run over the raw UTF-8 bytes (identical distances —
    * one byte per UTF-16 code unit); anything else decodes to chars. */
  def levBanded(sa: UTF8String, sb: UTF8String, k: Int): Int = {
    val na = sa.numBytes
    val nb = sb.numBytes
    // cheap ASCII probe: UTF-8 multibyte sequences set the high bit
    var ascii = true
    var p = 0
    while (ascii && p < na) { if ((sa.getByte(p) & 0x80) != 0) ascii = false; p += 1 }
    p = 0
    while (ascii && p < nb) { if ((sb.getByte(p) & 0x80) != 0) ascii = false; p += 1 }
    if (ascii) levBandedAscii(sa, sb, k)
    else levBandedChars(sa.toString, sb.toString, k)
  }

  private def levBandedAscii(sa: UTF8String, sb: UTF8String, k: Int): Int = {
    var aLo = 0; var bLo = 0
    var aHi = sa.numBytes; var bHi = sb.numBytes
    val inf = k + 1
    if (math.abs(aHi - bHi) > k) return inf
    // strip common prefix/suffix: pure wins for the near-identical
    // pairs a blocked join feeds here
    while (aLo < aHi && bLo < bHi && sa.getByte(aLo) == sb.getByte(bLo)) { aLo += 1; bLo += 1 }
    while (aHi > aLo && bHi > bLo && sa.getByte(aHi - 1) == sb.getByte(bHi - 1)) { aHi -= 1; bHi -= 1 }
    val n = aHi - aLo
    val m = bHi - bLo
    if (n == 0) return math.min(m, inf)
    if (m == 0) return math.min(n, inf)
    val buf = levBuf.get()
    buf.ensure(m + 2)
    var prev = buf.prev
    var cur = buf.cur
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(0) = if (i <= k) i else inf
      if (lo > 1) cur(lo - 1) = inf // stale cell from two rows ago
      var rowMin = cur(0)
      val ca = sa.getByte(aLo + i - 1)
      j = lo
      while (j <= hi) {
        var v = prev(j - 1) + (if (ca == sb.getByte(bLo + j - 1)) 0 else 1)
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf // right edge guard for next row's prev(j)
      if (rowMin >= inf) return inf // whole band over threshold: abort
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), inf)
  }

  private def levBandedChars(a: String, b: String, k: Int): Int = {
    val n = a.length
    val m = b.length
    val inf = k + 1
    if (math.abs(n - m) > k) return inf
    if (n == 0) return math.min(m, inf)
    if (m == 0) return math.min(n, inf)
    val buf = levBuf.get()
    buf.ensure(m + 2)
    var prev = buf.prev
    var cur = buf.cur
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(0) = if (i <= k) i else inf
      if (lo > 1) cur(lo - 1) = inf // stale cell from two rows ago
      var rowMin = cur(0)
      val ca = a.charAt(i - 1)
      j = lo
      while (j <= hi) {
        var v = prev(j - 1) + (if (ca == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf // right edge guard for next row's prev(j)
      if (rowMin >= inf) return inf // whole band over threshold: abort
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), inf)
  }

  case class LevBanded(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (first.dataType != StringType || second.dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string arguments, got " +
            s"${first.dataType.simpleString}, ${second.dataType.simpleString}")
      else if (third.dataType != IntegerType || !third.foldable)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a literal integer threshold")
      else third.eval() match {
        // k is foldable, so validate its VALUE at analysis time: k < 0
        // would make inf = k+1 <= 0 and the length pre-check always
        // true, silently reporting every pair as distance 0; k near
        // Int.MaxValue overflows inf = k+1.
        case null => TypeCheckResult.TypeCheckFailure(
          s"$prettyName threshold must not be NULL")
        case k: Int if k < 0 => TypeCheckResult.TypeCheckFailure(
          s"$prettyName threshold must be non-negative, got $k")
        case k: Int if k == Int.MaxValue => TypeCheckResult.TypeCheckFailure(
          s"$prettyName threshold must be < ${Int.MaxValue} (k+1 must not overflow)")
        case _ => TypeCheckResult.TypeCheckSuccess
      }

    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "lev_banded"

    override def nullSafeEval(a: Any, b: Any, k: Any): Any =
      levBanded(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
        k.asInstanceOf[Int])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, k) =>
        s"${ev.value} = graft.functions.StringExpressions.levBanded($a, $b, $k);")

    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): LevBanded =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n,
        s"$name requires exactly $n arguments, got ${args.length}")
      build(args)
    }

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((FunctionIdentifier("lev_banded"),
      new ExpressionInfo(classOf[LevBanded].getName, "lev_banded"),
      arity("lev_banded", 3)(args => LevBanded(args(0), args(1), args(2)))))

  /** Idempotent registration on an already-built session (same
    * contract as [[VectorExpressions.install]]).
    */
  def install(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    descriptions.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
  }
}
