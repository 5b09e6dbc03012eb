package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pg string functions that need real expressions: variadic arity
  * (`format`, `num_nonnulls`/`num_nulls`), optional arguments
  * (`string_to_array`, `regexp_split_to_array`, `normalize`), or
  * builtin-shadowing semantics (`initcap`'s pg word rule). Sourced
  * from the reference's roadmap (datafusion-pg-functions/functions.md
  * §String, all P2 planned; src/string.rs:13 is an empty stub) and
  * implemented from the public pg docs §9.4/§9.7.
  */
object PgStringExpressions {

  // ---- pg format() -------------------------------------------------------

  /** pg `format(formatstr, args...)`: %s / %I / %L conversions with
    * optional `n$` argument position, `-` flag and minimum width.
    * Arguments arrive cast to string by the builder (same value the
    * type's output function would give). */
  case class PgFormatStr(children: Seq[Expression])
      extends Expression with PgVariadicDirectGen {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "format"

    override def checkInputDataTypes(): TypeCheckResult =
      if (children.isEmpty)
        TypeCheckResult.TypeCheckFailure("format requires a format string")
      else if (children.head.dataType != StringType)
        TypeCheckResult.TypeCheckFailure("format string must be text")
      else TypeCheckResult.TypeCheckSuccess

    override def evalVals(vs: Array[Any]): Any = {
      val fmtRaw = vs(0)
      if (fmtRaw == null) return null
      val fmt = fmtRaw.asInstanceOf[UTF8String].toString
      val args = vs.toIndexedSeq.tail
      val sb = new StringBuilder
      var i = 0
      var nextArg = 0
      val n = fmt.length
      while (i < n) {
        val c = fmt.charAt(i)
        if (c != '%') { sb.append(c); i += 1 }
        else if (i + 1 < n && fmt.charAt(i + 1) == '%') { sb.append('%'); i += 2 }
        else {
          i += 1
          // [n$][-][width]{s|I|L}
          var j = i
          while (j < n && Character.isDigit(fmt.charAt(j))) j += 1
          var argPos = -1
          if (j < n && j > i && fmt.charAt(j) == '$') {
            argPos = fmt.substring(i, j).toInt - 1; i = j + 1
          }
          var leftAlign = false
          if (i < n && fmt.charAt(i) == '-') { leftAlign = true; i += 1 }
          j = i
          while (j < n && Character.isDigit(fmt.charAt(j))) j += 1
          val width = if (j > i) fmt.substring(i, j).toInt else 0
          i = j
          if (i >= n) throw new IllegalArgumentException(
            "unterminated format() type specifier")
          val conv = fmt.charAt(i); i += 1
          val idx = if (argPos >= 0) argPos else { val k = nextArg; nextArg += 1; k }
          if (idx >= args.length) throw new IllegalArgumentException(
            s"too few arguments for format()")
          val raw = args(idx)
          val s = conv match {
            case 's' => if (raw == null) "" else raw.asInstanceOf[UTF8String].toString
            case 'I' =>
              if (raw == null) throw new IllegalArgumentException(
                "null values cannot be formatted as an SQL identifier")
              graft.pgwire.PgFunctions.quoteIdent(raw.asInstanceOf[UTF8String].toString)
            case 'L' =>
              if (raw == null) "NULL"
              else quoteLiteral(raw.asInstanceOf[UTF8String].toString)
            case other => throw new IllegalArgumentException(
              s"unrecognized format() type specifier: $other")
          }
          val padded =
            if (s.length >= width) s
            else if (leftAlign) s + (" " * (width - s.length))
            else (" " * (width - s.length)) + s
          sb.append(padded)
        }
      }
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): PgFormatStr = copy(children = newChildren)
  }

  /** pg quote_literal: single quotes doubled; backslash-containing
    * strings use the E'' form (standard_conforming_strings=on). */
  def quoteLiteral(s: String): String = {
    val body = s.replace("'", "''")
    if (s.contains("\\")) "E'" + body.replace("\\", "\\\\") + "'"
    else "'" + body + "'"
  }

  // ---- num_nonnulls / num_nulls -----------------------------------------

  case class NumNonNulls(children: Seq[Expression], negate: Boolean)
      extends Expression with PgVariadicDirectGen {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false
    override def prettyName: String = if (negate) "num_nulls" else "num_nonnulls"
    override def checkInputDataTypes(): TypeCheckResult = TypeCheckResult.TypeCheckSuccess

    override def evalVals(vs: Array[Any]): Any = {
      var nonnull = 0
      vs.foreach(v => if (v != null) nonnull += 1)
      if (negate) children.length - nonnull else nonnull
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): NumNonNulls = copy(children = newChildren)
  }

  // ---- string_to_array ---------------------------------------------------

  /** pg string_to_array(string, delimiter[, null_string]):
    *  - NULL delimiter → one element per character
    *  - empty delimiter → the whole string as a single element
    *  - fields equal to null_string become NULL elements
    * (pg docs §9.4 Table 9.10; Spark's split() is regex-based and has
    * none of these rules, hence a native expression.) */
  case class PgStringToArray(str: Expression, delim: Expression, nullStr: Expression)
      extends TernaryExpression with PgVariadicDirectGen {
    override def first: Expression = str
    override def second: Expression = delim
    override def third: Expression = nullStr
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = true
    override def prettyName: String = "string_to_array"

    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(str, delim, nullStr).forall(_.dataType == StringType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("string_to_array(text, text[, text])")

    // NULL delimiter and NULL null-string are meaningful (per-char
    // split / no null marker), so this overrides evalVals, not
    // nullSafeEval
    override def evalVals(vs: Array[Any]): Any = {
      val sRaw = vs(0)
      if (sRaw == null) return null
      val s = sRaw.asInstanceOf[UTF8String].toString
      val dRaw = vs(1)
      val nullRaw = vs(2)
      val nullMark = if (nullRaw == null) null else nullRaw.asInstanceOf[UTF8String].toString
      val fields: Array[String] =
        if (dRaw == null) // pg: one element per CHARACTER (code point,
          // not UTF-16 unit — surrogate halves are not valid text)
          s.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
        else {
          val d = dRaw.asInstanceOf[UTF8String].toString
          if (d.isEmpty) Array(s)
          else s.split(Pattern.quote(d), -1)
        }
      new GenericArrayData(fields.map { f =>
        if (nullMark != null && f == nullMark) null else UTF8String.fromString(f)
      }.asInstanceOf[Array[Any]])
    }

    override protected def withNewChildrenInternal(
        f: Expression, s2: Expression, t: Expression): PgStringToArray =
      copy(str = f, delim = s2, nullStr = t)
  }

  // ---- regexp_split_to_array / regexp_matches ---------------------------

  private def pgFlags(flags: String): Int = {
    var f = 0
    flags.foreach {
      case 'i' => f |= Pattern.CASE_INSENSITIVE
      case 'm' | 'n' => f |= Pattern.MULTILINE
      case 's' => f |= Pattern.DOTALL
      case 'x' => f |= Pattern.COMMENTS
      case 'g' => // handled by callers
      case _ =>
    }
    f
  }

  case class PgRegexpSplit(str: Expression, pat: Expression, flags: Expression)
      extends TernaryExpression with PgTernaryDirectGen {
    override def first: Expression = str
    override def second: Expression = pat
    override def third: Expression = flags
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "regexp_split_to_array"

    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(str, pat, flags).forall(_.dataType == StringType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("regexp_split_to_array(text, text[, text])")

    // one volatile (key, pattern) pair: concurrent evaluators never see
    // a flags/pattern string paired with a stale compiled regex
    @transient @volatile private var cached: ((String, String), Pattern) = null

    override def nullSafeEval(s: Any, p: Any, fl: Any): Any = {
      val ps = p.asInstanceOf[UTF8String].toString
      val fs = fl.asInstanceOf[UTF8String].toString
      val c = cached
      val compiled =
        if (c != null && c._1 == ((ps, fs))) c._2
        else {
          val pat = Pattern.compile(ps, pgFlags(fs))
          cached = ((ps, fs), pat)
          pat
        }
      new GenericArrayData(compiled.split(s.asInstanceOf[UTF8String].toString, -1)
        .map(x => UTF8String.fromString(x): Any))
    }

    override protected def withNewChildrenInternal(
        f: Expression, s2: Expression, t: Expression): PgRegexpSplit =
      copy(str = f, pat = s2, flags = t)
  }

  /** First-match capture groups as text[] (whole match when the
    * pattern has no groups); NULL when no match. pg's set-returning
    * 'g' flag is rejected — use regexp_split/regexp_count for global
    * work (documented deviation). */
  case class PgRegexpMatches(str: Expression, pat: Expression, flags: Expression)
      extends TernaryExpression with PgTernaryDirectGen {
    override def first: Expression = str
    override def second: Expression = pat
    override def third: Expression = flags
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = true
    override def prettyName: String = "regexp_matches"

    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(str, pat, flags).forall(_.dataType == StringType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("regexp_matches(text, text[, text])")

    @transient @volatile private var cached: ((String, String), Pattern) = null

    override def nullSafeEval(s: Any, p: Any, fl: Any): Any = {
      val fs = fl.asInstanceOf[UTF8String].toString
      if (fs.contains('g')) throw new IllegalArgumentException(
        "regexp_matches 'g' flag is set-returning; not supported as a scalar")
      val ps = p.asInstanceOf[UTF8String].toString
      val c = cached
      val compiled =
        if (c != null && c._1 == ((ps, fs))) c._2
        else {
          val pat = Pattern.compile(ps, pgFlags(fs))
          cached = ((ps, fs), pat)
          pat
        }
      val m = compiled.matcher(s.asInstanceOf[UTF8String].toString)
      if (!m.find()) null
      else if (m.groupCount() == 0)
        new GenericArrayData(Array[Any](UTF8String.fromString(m.group())))
      else new GenericArrayData((1 to m.groupCount()).map { g =>
        val v = m.group(g)
        if (v == null) null else UTF8String.fromString(v): Any
      }.toArray)
    }

    override protected def withNewChildrenInternal(
        f: Expression, s2: Expression, t: Expression): PgRegexpMatches =
      copy(str = f, pat = s2, flags = t)
  }

  // ---- initcap (pg word rule) -------------------------------------------

  /** pg initcap: a word starts after any non-alphanumeric ("hi-there"
    * → "Hi-There"); Spark's builtin only splits on spaces. */
  case class PgInitcap(child: Expression)
      extends UnaryExpression with PgUnaryDirectGen {
    override def dataType: DataType = StringType
    override def prettyName: String = "initcap"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("initcap(text)")

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val out = new StringBuilder(s.length)
      var prevAlnum = false
      s.foreach { c =>
        val alnum = Character.isLetterOrDigit(c)
        out.append(
          if (alnum && !prevAlnum) Character.toUpperCase(c)
          else if (alnum) Character.toLowerCase(c)
          else c)
        prevAlnum = alnum
      }
      UTF8String.fromString(out.toString)
    }

    override protected def withNewChildInternal(c: Expression): PgInitcap = copy(child = c)
  }

  // ---- normalize ---------------------------------------------------------

  case class PgNormalize(left: Expression, right: Expression)
      extends BinaryExpression with PgBinaryDirectGen {
    override def dataType: DataType = StringType
    override def prettyName: String = "normalize"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("normalize(text[, form])")

    override def nullSafeEval(v: Any, form: Any): Any = {
      val f = form.asInstanceOf[UTF8String].toString.toUpperCase match {
        case "NFC" => java.text.Normalizer.Form.NFC
        case "NFD" => java.text.Normalizer.Form.NFD
        case "NFKC" => java.text.Normalizer.Form.NFKC
        case "NFKD" => java.text.Normalizer.Form.NFKD
        case other => throw new IllegalArgumentException(
          s"invalid normalization form: $other")
      }
      UTF8String.fromString(
        java.text.Normalizer.normalize(v.asInstanceOf[UTF8String].toString, f))
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): PgNormalize =
      copy(left = l, right = r)
  }

  // ---- unistr / unicode_assigned -----------------------------------------

  /** pg `unistr(text)` — decode Unicode escapes: `\XXXX` (4 hex),
    * `\+XXXXXX` (6 hex), `\uXXXX`, `\UXXXXXXXX`; `\\` is a literal
    * backslash. Separately-written surrogate halves combine, as in pg. */
  case class PgUnistr(child: Expression)
      extends UnaryExpression with PgUnaryDirectGen {
    override def dataType: DataType = StringType
    override def prettyName: String = "unistr"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("unistr(text)")

    private def hex(s: String, from: Int, len: Int): Int = {
      if (from + len > s.length) throw new IllegalArgumentException(
        "invalid Unicode escape")
      var v = 0
      var i = from
      while (i < from + len) {
        val d = Character.digit(s.charAt(i), 16)
        if (d < 0) throw new IllegalArgumentException("invalid Unicode escape")
        v = (v << 4) | d
        i += 1
      }
      v
    }

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val out = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c != '\\') { out.append(c); i += 1 }
        else if (i + 1 < s.length && s.charAt(i + 1) == '\\') { out.append('\\'); i += 2 }
        else {
          val (cp, used) = s.charAt(if (i + 1 < s.length) i + 1 else i) match {
            case 'u' => (hex(s, i + 2, 4), 6)
            case 'U' => (hex(s, i + 2, 8), 10)
            case '+' => (hex(s, i + 2, 6), 8)
            case _ => (hex(s, i + 1, 4), 5)
          }
          if (cp > 0x10FFFF) throw new IllegalArgumentException(
            "invalid Unicode escape")
          // append surrogate halves as chars so split pairs combine
          if (cp < 0x10000) out.append(cp.toChar) else out.appendCodePoint(cp)
          i += used
        }
      }
      UTF8String.fromString(out.toString)
    }

    override protected def withNewChildInternal(c: Expression): PgUnistr = copy(child = c)
  }

  /** pg `unicode_assigned(text)` — true when every character is an
    * assigned Unicode codepoint. */
  case class PgUnicodeAssigned(child: Expression)
      extends UnaryExpression with PgUnaryDirectGen {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "unicode_assigned"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("unicode_assigned(text)")

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      var ok = true
      while (ok && i < s.length) {
        val cp = s.codePointAt(i)
        ok = Character.isDefined(cp)
        i += Character.charCount(cp)
      }
      ok
    }

    override protected def withNewChildInternal(c: Expression): PgUnicodeAssigned =
      copy(child = c)
  }

  // ---- registration ------------------------------------------------------

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(PgStringExpressions.getClass.getName, name)

  private val emptyStr = Literal(UTF8String.fromString(""), StringType)
  private val nullStr = Literal(null, StringType)

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("format"), info("format"), { args =>
      require(args.nonEmpty, "format requires at least the format string")
      // each arg renders via its pg OUTPUT function: booleans are
      // 't'/'f' (Spark's cast would say 'true'/'false')
      PgFormatStr(args.head +: args.tail.map {
        case a if a.dataType == BooleanType =>
          CaseWhen(Seq((IsNull(a), nullStr), (a, Literal("t"))), Some(Literal("f")))
        case a => Cast(a, StringType)
      })
    }),
    (FunctionIdentifier("num_nonnulls"), info("num_nonnulls"),
      args => NumNonNulls(args, negate = false)),
    (FunctionIdentifier("num_nulls"), info("num_nulls"),
      args => NumNonNulls(args, negate = true)),
    (FunctionIdentifier("string_to_array"), info("string_to_array"), { args =>
      // NULL literals arrive as NullType: cast so `string_to_array(s, NULL)`
      // (pg's split-to-characters form) type-checks. Unconditional —
      // args may be unresolved here, and SimplifyCasts drops identities.
      val cast = args.map(a => Cast(a, StringType))
      cast.length match {
        case 2 => PgStringToArray(cast(0), cast(1), nullStr)
        case 3 => PgStringToArray(cast(0), cast(1), cast(2))
        case n => throw new IllegalArgumentException(s"string_to_array: $n args")
      }
    }),
    (FunctionIdentifier("regexp_split_to_array"), info("regexp_split_to_array"), { args =>
      args.length match {
        case 2 => PgRegexpSplit(args(0), args(1), emptyStr)
        case 3 => PgRegexpSplit(args(0), args(1), args(2))
        case n => throw new IllegalArgumentException(s"regexp_split_to_array: $n args")
      }
    }),
    (FunctionIdentifier("regexp_matches"), info("regexp_matches"), { args =>
      args.length match {
        case 2 => PgRegexpMatches(args(0), args(1), emptyStr)
        case 3 => PgRegexpMatches(args(0), args(1), args(2))
        case n => throw new IllegalArgumentException(s"regexp_matches: $n args")
      }
    }),
    // pg 10+ regexp_match: the scalar first-match form — exactly what
    // PgRegexpMatches computes (it rejects the set-returning 'g' flag)
    (FunctionIdentifier("regexp_match"), info("regexp_match"), { args =>
      args.length match {
        case 2 => PgRegexpMatches(args(0), args(1), emptyStr)
        case 3 => PgRegexpMatches(args(0), args(1), args(2))
        case n => throw new IllegalArgumentException(s"regexp_match: $n args")
      }
    }),
    (FunctionIdentifier("initcap"), info("initcap"), { args =>
      require(args.length == 1, "initcap requires 1 argument")
      PgInitcap(args(0))
    }),
    (FunctionIdentifier("normalize"), info("normalize"), { args =>
      args.length match {
        case 1 => PgNormalize(args(0), Literal(UTF8String.fromString("NFC"), StringType))
        case 2 => PgNormalize(args(0), args(1))
        case n => throw new IllegalArgumentException(s"normalize: $n args")
      }
    }),
    (FunctionIdentifier("unistr"), info("unistr"), { args =>
      require(args.length == 1, "unistr requires 1 argument")
      PgUnistr(args(0))
    }),
    (FunctionIdentifier("unicode_assigned"), info("unicode_assigned"), { args =>
      require(args.length == 1, "unicode_assigned requires 1 argument")
      PgUnicodeAssigned(args(0))
    }))

  /** Shadows `initcap`; adds the rest. Idempotent per session. */
  def install(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    descriptions.foreach { case (ident, i, builder) =>
      reg.registerFunction(ident, i, builder)
    }
  }
}
