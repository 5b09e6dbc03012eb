package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, BooleanNode, DecimalNode, JsonNodeFactory, NullNode, TextNode}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL/JSON path language (pg `jsonpath`, Functions and Operators
  * §9.16.2) — the last named block of the reference's JSON roadmap
  * (`datafusion-pg-functions/functions.md` lists the `jsonb_path_*`
  * family; `src/json.rs` is an empty stub, so this is parity-plus;
  * semantics are implemented from the public PostgreSQL docs).
  *
  * Supported grammar: `lax`/`strict` modes, `$`, `@`, `$var` (from the
  * `vars` argument), member access `.key` / `."quoted key"` / `.*`,
  * subscripts `[n]`, `[last]`, `[a to b]`, `[n, m]`, `[*]`, filters
  * `?(pred)` with `==/!=/<>/</<=/>/>=`, `&&`, `||`, `!`, `exists()`,
  * `like_regex` (flags i s m q x), `starts with`, `is unknown`,
  * arithmetic `+ - * / %`, item methods `.type()`, `.size()`,
  * `.double()`, `.abs()`, `.floor()`, `.ceiling()`, `.keyvalue()`,
  * `.datetime()` / `.datetime(template)`, and the recursive descent
  * accessor `.**` / `.**{n}` / `.**{n to m}` (bounds may be `last`).
  *
  * Deviation from pg (documented): `.keyvalue()` emits sequential
  * per-document object ids (0, 1, 2, …) where pg emits jsonb
  * byte-offset ids — pg's docs call the id "an implementation-
  * dependent unique identifier", and the offsets are unportable.
  *
  * Error semantics follow pg: structural errors are suppressed in lax
  * mode, errors inside filter predicates collapse to `unknown`, and
  * the `silent` argument suppresses what remains.
  */
object PgJsonPath {

  private val F = JsonNodeFactory.instance

  final class PathError(msg: String) extends RuntimeException(msg)

  /** Missing-variable errors are never suppressed — not by lax mode,
    * not inside filter predicates, not by the `silent` argument
    * (pinned against PostgreSQL 15: `$nope` errors in all of them). */
  final class VarError(msg: String) extends RuntimeException(msg)

  /** Datetime comparisons that would need a session time zone are
    * hard errors in pg — not suppressed by filters or `silent`
    * (pinned: date vs timestamptz errors through both). */
  final class TzError(msg: String) extends RuntimeException(msg)

  // ---- AST -----------------------------------------------------------------

  sealed trait PExpr
  case object Root extends PExpr
  case object Current extends PExpr
  case object Last extends PExpr
  final case class Variable(name: String) extends PExpr
  final case class LitNum(v: java.math.BigDecimal) extends PExpr
  final case class LitStr(v: String) extends PExpr
  final case class LitBool(v: Boolean) extends PExpr
  case object LitNull extends PExpr
  final case class Member(base: PExpr, key: String) extends PExpr
  final case class WildMember(base: PExpr) extends PExpr
  final case class WildIndex(base: PExpr) extends PExpr
  final case class Index(base: PExpr, subs: Seq[(PExpr, Option[PExpr])]) extends PExpr
  final case class Filter(base: PExpr, pred: PExpr) extends PExpr
  final case class Method(base: PExpr, name: String) extends PExpr
  /** `.**{lo to hi}`; -1 encodes the `last` keyword (lower bound:
    * deepest level of each branch = leaves; upper bound: unbounded). */
  final case class AnyPath(base: PExpr, lo: Int, hi: Int) extends PExpr
  final case class Datetime(base: PExpr, template: Option[String]) extends PExpr
  final case class Arith(op: Char, l: PExpr, r: PExpr) extends PExpr
  final case class Neg(e: PExpr) extends PExpr
  final case class Cmp(op: String, l: PExpr, r: PExpr) extends PExpr
  final case class And(l: PExpr, r: PExpr) extends PExpr
  final case class Or(l: PExpr, r: PExpr) extends PExpr
  final case class Not(e: PExpr) extends PExpr
  final case class Exists(e: PExpr) extends PExpr
  final case class IsUnknown(e: PExpr) extends PExpr
  final case class LikeRegex(e: PExpr, pattern: java.util.regex.Pattern) extends PExpr
  final case class StartsWith(e: PExpr, prefix: PExpr) extends PExpr

  final case class Path(lax: Boolean, expr: PExpr) {
    val isPredicate: Boolean = expr match {
      case _: Cmp | _: And | _: Or | _: Not | _: Exists | _: IsUnknown |
           _: LikeRegex | _: StartsWith => true
      case _ => false
    }
  }

  // ---- parser (recursive descent over the raw string) ----------------------

  final class Parser(s: String) {
    private var p = 0
    private def err(msg: String): Nothing =
      throw new PathError(s"""syntax error in jsonpath at position $p: $msg""")
    private def ws(): Unit = while (p < s.length && s.charAt(p).isWhitespace) p += 1
    private def peekCh: Char = if (p < s.length) s.charAt(p) else '\u0000'
    private def eat(c: Char): Unit =
      if (peekCh == c) p += 1 else err(s"expected '$c'")
    private def tryWord(w: String): Boolean = {
      ws()
      if (s.regionMatches(p, w, 0, w.length) &&
        (p + w.length >= s.length || !isIdentChar(s.charAt(p + w.length)))) {
        p += w.length; true
      } else false
    }
    private def isIdentChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '$'

    private def ident(): String = {
      ws()
      val st = p
      while (p < s.length && isIdentChar(s.charAt(p)) && s.charAt(p) != '$') p += 1
      if (p == st) err("expected identifier")
      s.substring(st, p)
    }

    private def quotedString(): String = {
      eat('"')
      val sb = new java.lang.StringBuilder()
      while (p < s.length && s.charAt(p) != '"') {
        val c = s.charAt(p)
        if (c == '\\' && p + 1 < s.length) {
          p += 1
          s.charAt(p) match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              if (p + 4 >= s.length) err("bad \\u escape")
              sb.append(Integer.parseInt(s.substring(p + 1, p + 5), 16).toChar)
              p += 4
            case other => sb.append(other)
          }
        } else sb.append(c)
        p += 1
      }
      eat('"')
      sb.toString
    }

    def parse(): Path = {
      ws()
      val lax =
        if (tryWord("lax")) true
        else if (tryWord("strict")) false
        else true
      val e = orExpr()
      ws()
      if (p < s.length) err(s"trailing input '${s.substring(p)}'")
      Path(lax, e)
    }

    private def orExpr(): PExpr = {
      var l = andExpr()
      ws()
      while (s.regionMatches(p, "||", 0, 2)) { p += 2; l = Or(l, andExpr()); ws() }
      l
    }

    private def andExpr(): PExpr = {
      var l = cmpExpr()
      ws()
      while (s.regionMatches(p, "&&", 0, 2)) { p += 2; l = And(l, cmpExpr()); ws() }
      l
    }

    private def cmpExpr(): PExpr = {
      ws()
      if (peekCh == '!' && p + 1 < s.length && s.charAt(p + 1) != '=') {
        p += 1; return Not(cmpExpr())
      }
      if (tryWord("exists")) { ws(); eat('('); val e = orExpr(); ws(); eat(')'); return postPred(Exists(e)) }
      val l = addExpr()
      ws()
      val two = if (p + 1 < s.length) s.substring(p, p + 2) else ""
      val op =
        if (two == "==" || two == "!=" || two == "<>" || two == "<=" || two == ">=") { p += 2; two }
        else if (peekCh == '<' || peekCh == '>') { val c = peekCh.toString; p += 1; c }
        else ""
      if (op.nonEmpty) return Cmp(if (op == "<>") "!=" else op, l, addExpr())
      if (tryWord("like_regex")) {
        ws()
        val pat = quotedString()
        var flags = 0
        if (tryWord("flag")) {
          ws()
          quotedString().foreach {
            case 'i' => flags |= java.util.regex.Pattern.CASE_INSENSITIVE
            case 's' => flags |= java.util.regex.Pattern.DOTALL
            case 'm' => flags |= java.util.regex.Pattern.MULTILINE
            case 'x' => flags |= java.util.regex.Pattern.COMMENTS
            case 'q' => flags |= java.util.regex.Pattern.LITERAL
            case f => throw new PathError(s"unsupported like_regex flag '$f'")
          }
        }
        return postPred(LikeRegex(l, java.util.regex.Pattern.compile(pat, flags)))
      }
      if (tryWord("starts")) {
        if (!tryWord("with")) err("expected 'with' after 'starts'")
        ws()
        return postPred(StartsWith(l, primary()))
      }
      postPred(l)
    }

    /** `(pred) is unknown` postfix. */
    private def postPred(e: PExpr): PExpr = {
      if (tryWord("is")) {
        if (!tryWord("unknown")) err("expected 'unknown' after 'is'")
        IsUnknown(e)
      } else e
    }

    private def addExpr(): PExpr = {
      var l = mulExpr()
      ws()
      while (peekCh == '+' || peekCh == '-') {
        val op = peekCh; p += 1
        l = Arith(op, l, mulExpr()); ws()
      }
      l
    }

    private def mulExpr(): PExpr = {
      var l = unary()
      ws()
      while (peekCh == '*' || peekCh == '/' || peekCh == '%') {
        // `*` only binds as multiplication when an operand follows —
        // `[*]` and `.*` never reach here (consumed by accessors)
        val op = peekCh; p += 1
        l = Arith(op, l, unary()); ws()
      }
      l
    }

    private def unary(): PExpr = {
      ws()
      if (peekCh == '-') { p += 1; return Neg(unary()) }
      if (peekCh == '+') { p += 1; return unary() }
      accessors(primary())
    }

    private def primary(): PExpr = {
      ws()
      peekCh match {
        case '$' =>
          p += 1
          if (peekCh == '"') Variable(quotedString())
          else if (p < s.length && isIdentChar(s.charAt(p)) && s.charAt(p) != '$')
            Variable(ident())
          else Root
        case '@' => p += 1; Current
        case '"' => LitStr(quotedString())
        case '(' => p += 1; val e = orExpr(); ws(); eat(')'); e
        case c if c.isDigit || c == '.' && p + 1 < s.length && s.charAt(p + 1).isDigit =>
          val st = p
          while (p < s.length && (s.charAt(p).isDigit || s.charAt(p) == '.' ||
            s.charAt(p) == 'e' || s.charAt(p) == 'E' ||
            ((s.charAt(p) == '+' || s.charAt(p) == '-') && p > st &&
              (s.charAt(p - 1) == 'e' || s.charAt(p - 1) == 'E')))) p += 1
          LitNum(new java.math.BigDecimal(s.substring(st, p)))
        case _ =>
          if (tryWord("true")) LitBool(true)
          else if (tryWord("false")) LitBool(false)
          else if (tryWord("null")) LitNull
          else if (tryWord("last")) Last
          else err(s"unexpected '${peekCh}'")
      }
    }

    private val methods =
      Set("type", "size", "double", "abs", "floor", "ceiling", "keyvalue")

    /** `{n}` / `{n to m}` after `**`; `last` → -1. */
    private def levelBounds(): (Int, Int) = {
      ws()
      if (peekCh != '{') (0, -1)
      else {
        p += 1
        def bound(): Int = {
          ws()
          if (tryWord("last")) -1
          else {
            val st = p
            while (p < s.length && s.charAt(p).isDigit) p += 1
            if (p == st) err("expected level in .**{}")
            s.substring(st, p).toInt
          }
        }
        val lo = bound()
        val hi = if (tryWord("to")) bound() else lo
        ws(); eat('}')
        (lo, hi)
      }
    }

    private def accessors(base0: PExpr): PExpr = {
      var base = base0
      var done = false
      while (!done) {
        ws()
        peekCh match {
          case '.' =>
            p += 1; ws()
            if (peekCh == '*') {
              p += 1
              if (peekCh == '*') {
                p += 1
                val (lo, hi) = levelBounds()
                base = AnyPath(base, lo, hi)
              } else base = WildMember(base)
            }
            else if (peekCh == '"') base = Member(base, quotedString())
            else {
              val name = ident()
              ws()
              if (peekCh == '(' && name == "datetime") {
                p += 1; ws()
                val tpl = if (peekCh == '"') Some(quotedString()) else None
                ws(); eat(')')
                base = Datetime(base, tpl)
              } else if (peekCh == '(' && methods.contains(name)) {
                p += 1; ws(); eat(')')
                base = Method(base, name)
              } else if (peekCh == '(') err(s"unsupported jsonpath method .$name()")
              else base = Member(base, name)
            }
          case '[' =>
            p += 1; ws()
            if (peekCh == '*') { p += 1; ws(); eat(']'); base = WildIndex(base) }
            else {
              val subs = scala.collection.mutable.ArrayBuffer.empty[(PExpr, Option[PExpr])]
              var more = true
              while (more) {
                val a = addExpr()
                val b = if (tryWord("to")) Some(addExpr()) else None
                subs += ((a, b))
                ws()
                if (peekCh == ',') { p += 1 } else more = false
              }
              eat(']')
              base = Index(base, subs.toSeq)
            }
          case '?' =>
            p += 1; ws(); eat('(')
            val pred = orExpr()
            ws(); eat(')')
            base = Filter(base, pred)
          case _ => done = true
        }
      }
      base
    }
  }

  def compile(path: String): Path = new Parser(path).parse()

  // ---- evaluator -----------------------------------------------------------

  private sealed trait T3
  private case object TTrue extends T3
  private case object TFalse extends T3
  private case object TUnknown extends T3

  private final class Ctx(val root: JsonNode, val vars: JsonNode, val lax: Boolean,
      val tzAware: Boolean = false) {
    // sequential per-document object ids for .keyvalue() (documented
    // deviation: pg emits jsonb byte offsets); lazily allocated — a
    // Ctx is built per CALL per row, and almost no path uses
    // .keyvalue(), so the map must not cost the common case
    private var nextObjId = 0
    private var objIds: java.util.IdentityHashMap[JsonNode, Integer] = null
    def objId(n: JsonNode): Int = {
      if (objIds == null) objIds = new java.util.IdentityHashMap[JsonNode, Integer]()
      val cached = objIds.get(n)
      if (cached != null) cached.intValue()
      else { val id = nextObjId; nextObjId += 1; objIds.put(n, id); id }
    }
  }

  // ---- datetime items (.datetime()) ----------------------------------------

  /** Kinds: 0 date, 1 time, 2 timetz, 3 timestamp, 4 timestamptz.
    * `sortMicros` is UTC-normalized for the tz kinds; the node renders
    * (and string-compares, when it leaks into text context) as the
    * canonical pg text. Extends TextNode so `.toString` quotes. */
  final class DtVal(text: String, val kind: Int, val sortMicros: Long)
    extends TextNode(text)

  private val kindNames = Array("date", "time without time zone",
    "time with time zone", "timestamp without time zone",
    "timestamp with time zone")

  private val reDate = "(\\d{4})-(\\d{2})-(\\d{2})".r
  private val reTime = "(\\d{2}):(\\d{2}):(\\d{2})(\\.\\d{1,6})?([+-]\\d{2}(?::?\\d{2})?|Z)?".r
  private val reTs =
    "(\\d{4})-(\\d{2})-(\\d{2})[ T](\\d{2}):(\\d{2}):(\\d{2})(\\.\\d{1,6})?([+-]\\d{2}(?::?\\d{2})?|Z)?".r

  private def fracMicros(f: String): Int =
    if (f == null) 0 else (f.drop(1).padTo(6, '0')).toInt

  private def fracText(usec: Int): String =
    if (usec == 0) ""
    else "." + f"$usec%06d".reverse.dropWhile(_ == '0').reverse

  private def offSeconds(o: String): Int = {
    if (o == "Z") return 0
    val sign = if (o.charAt(0) == '-') -1 else 1
    val digits = o.substring(1).replace(":", "")
    val h = digits.substring(0, 2).toInt
    val m = if (digits.length >= 4) digits.substring(2, 4).toInt else 0
    sign * (h * 3600 + m * 60)
  }

  private def offText(sec: Int): String = {
    val s = math.abs(sec)
    f"${if (sec < 0) "-" else "+"}%s${s / 3600}%02d:${s % 3600 / 60}%02d"
  }

  private def timeText(h: Int, mi: Int, se: Int, usec: Int): String =
    f"$h%02d:$mi%02d:$se%02d" + fracText(usec)

  /** ISO parse for the argless `.datetime()` — pg's recognized set
    * (seconds are required; pinned: "2023-08-15 12:34" errors). */
  private def parseIsoDt(s: String): DtVal = s match {
    case reDate(y, m, d) =>
      val days = java.time.LocalDate.of(y.toInt, m.toInt, d.toInt).toEpochDay
      new DtVal(s, 0, days * 86_400_000_000L)
    case reTs(y, mo, d, h, mi, se, fr, off) =>
      val usec = fracMicros(fr)
      val ld = java.time.LocalDate.of(y.toInt, mo.toInt, d.toInt)
      val base = ld.toEpochDay * 86_400_000_000L +
        (h.toInt * 3600L + mi.toInt * 60L + se.toInt) * 1_000_000L + usec
      val body = s"${ld}T" + timeText(h.toInt, mi.toInt, se.toInt, usec)
      if (off == null) new DtVal(body, 3, base)
      else {
        val o = offSeconds(off)
        new DtVal(body + offText(o), 4, base - o * 1_000_000L)
      }
    case reTime(h, mi, se, fr, off) =>
      val usec = fracMicros(fr)
      val base = (h.toInt * 3600L + mi.toInt * 60L + se.toInt) * 1_000_000L + usec
      val body = timeText(h.toInt, mi.toInt, se.toInt, usec)
      if (off == null) new DtVal(body, 1, base)
      else {
        val o = offSeconds(off)
        new DtVal(body + offText(o), 2, base - o * 1_000_000L)
      }
    case _ => throw new PathError(
      s"""datetime format is not recognized: "$s"""")
  }

  /** Template-argument `.datetime(tpl)` via the to_timestamp engine;
    * the result kind follows which field families the template sets. */
  private def parseTplDt(s: String, tpl: String): DtVal = {
    val compiled =
      try PgFormat.compileDtParse(tpl)
      catch { case e: Exception => throw new PathError(e.getMessage) }
    val keys = compiled.nodes.collect { case t: PgFormat.DtTok => t.key }.toSet
    val dateKeys = Set("YYYY", "YYY", "YY", "Y", "Y,YYY", "IYYY", "MM", "MON",
      "MONTH", "DD", "DDD", "J", "RM", "CC", "WW", "IW", "W", "D", "ID", "Q")
    val timeKeys = Set("HH24", "HH12", "HH", "MI", "SS", "SSSS", "SSSSS", "MS",
      "US", "FF1", "FF2", "FF3", "FF4", "FF5", "FF6", "AM", "PM", "A.M.", "P.M.")
    val hasDate = keys.exists(dateKeys)
    val hasTime = keys.exists(timeKeys)
    val hasTz = keys.contains("TZH") || keys.contains("TZM") || keys.contains("OF")
    val micros =
      try PgFormat.parseDt(compiled, s, java.time.ZoneOffset.UTC)
      catch { case e: Exception => throw new PathError(
        s"""datetime format is not recognized: "$s"""") }
    val days = Math.floorDiv(micros, 86_400_000_000L)
    val tod = Math.floorMod(micros, 86_400_000_000L)
    val ld = java.time.LocalDate.ofEpochDay(days)
    val h = (tod / 3_600_000_000L).toInt
    val mi = (tod % 3_600_000_000L / 60_000_000L).toInt
    val se = (tod % 60_000_000L / 1_000_000L).toInt
    val usec = (tod % 1_000_000L).toInt
    if (hasDate && hasTime)
      new DtVal(s"${ld}T" + timeText(h, mi, se, usec) +
        (if (hasTz) offText(0) else ""), if (hasTz) 4 else 3, micros)
    else if (hasDate) new DtVal(ld.toString, 0, days * 86_400_000_000L)
    else new DtVal(timeText(h, mi, se, usec), if (hasTz) 2 else 1, tod)
  }

  /** Compare two datetime items: Some(sign) if comparable, None if
    * unknown, TzError if the pair needs a session time zone (pinned
    * matrix: date↔timestamp promote; date/timestamp↔timestamptz and
    * time↔timetz are hard errors; the rest are unknown). */
  private def compareDt(a: DtVal, b: DtVal, tzAware: Boolean): Option[Int] = {
    def tzErr(x: DtVal, y: DtVal): Nothing = {
      val n = Array("date", "time", "timetz", "timestamp", "timestamptz")
      throw new TzError(s"cannot convert value from ${n(x.kind)} to " +
        s"${n(y.kind)} without time zone usage")
    }
    val (ka, kb) = (a.kind, b.kind)
    if (ka == kb) Some(java.lang.Long.compare(a.sortMicros, b.sortMicros))
    else if ((ka == 0 && kb == 3) || (ka == 3 && kb == 0))
      Some(java.lang.Long.compare(a.sortMicros, b.sortMicros))
    else if ((ka == 0 || ka == 3) && kb == 4)
      // the *_tz family treats the session zone as UTC (the engine's
      // pinned zone), making the conversion well-defined
      if (tzAware) Some(java.lang.Long.compare(a.sortMicros, b.sortMicros)) else tzErr(a, b)
    else if (ka == 4 && (kb == 0 || kb == 3))
      if (tzAware) Some(java.lang.Long.compare(a.sortMicros, b.sortMicros)) else tzErr(a, b)
    else if ((ka == 1 && kb == 2) || (ka == 2 && kb == 1))
      if (tzAware) Some(java.lang.Long.compare(a.sortMicros, b.sortMicros)) else tzErr(a, b)
    else None
  }

  private def unwrap1(n: JsonNode): Seq[JsonNode] =
    if (n.isArray) (0 until n.size()).map(n.get) else Seq(n)

  private def num(n: JsonNode): java.math.BigDecimal =
    if (n.isNumber) n.decimalValue()
    else throw new PathError(s"operand is not a number: $n")

  /** Evaluate to the item sequence, binding `@` to `item`. */
  private def evalSeq(e: PExpr, ctx: Ctx, item: JsonNode): Seq[JsonNode] = e match {
    case Root => Seq(ctx.root)
    case Current => Seq(item)
    case Last => throw new PathError("'last' is only allowed inside a subscript")
    case Variable(name) =>
      val v = if (ctx.vars != null && ctx.vars.isObject) ctx.vars.get(name) else null
      if (v == null) throw new VarError(s"could not find jsonpath variable \"$name\"")
      Seq(v)
    case LitNum(v) => Seq(DecimalNode.valueOf(v))
    case LitStr(v) => Seq(TextNode.valueOf(v))
    case LitBool(v) => Seq(BooleanNode.valueOf(v))
    case LitNull => Seq(NullNode.getInstance())

    case Member(base, key) =>
      evalSeq(base, ctx, item).flatMap { n0 =>
        val nodes = if (ctx.lax) unwrap1(n0) else Seq(n0)
        nodes.flatMap { n =>
          if (n.isObject) {
            val v = n.get(key)
            if (v != null) Seq(v)
            else if (ctx.lax) Nil
            else throw new PathError(s"""JSON object does not contain key "$key"""")
          } else if (ctx.lax) Nil
          else throw new PathError("jsonpath member accessor can only be applied to an object")
        }
      }

    case WildMember(base) =>
      evalSeq(base, ctx, item).flatMap { n0 =>
        val nodes = if (ctx.lax) unwrap1(n0) else Seq(n0)
        nodes.flatMap { n =>
          if (n.isObject) {
            val it = n.fields()
            val out = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
            while (it.hasNext) out += it.next().getValue
            out.toSeq
          } else if (ctx.lax) Nil
          else throw new PathError("jsonpath wildcard member accessor can only be applied to an object")
        }
      }

    case WildIndex(base) =>
      evalSeq(base, ctx, item).flatMap { n =>
        if (n.isArray) (0 until n.size()).map(n.get)
        else if (ctx.lax) Seq(n)
        else throw new PathError("jsonpath wildcard array accessor can only be applied to an array")
      }

    case Index(base, subs) =>
      evalSeq(base, ctx, item).flatMap { n0 =>
        val (arr, size) =
          if (n0.isArray) (n0, n0.size())
          else if (ctx.lax) (null, 1) // scalar behaves as a 1-element array
          else throw new PathError("jsonpath array accessor can only be applied to an array")
        def elem(i: Int): JsonNode = if (arr == null) n0 else arr.get(i)
        subs.flatMap { case (a, bOpt) =>
          val ia = subscriptInt(a, ctx, item, size)
          val ib = bOpt.map(subscriptInt(_, ctx, item, size)).getOrElse(ia)
          if (ia > ib) Nil
          else (ia to ib).flatMap { i =>
            if (i >= 0 && i < size) Seq(elem(i))
            else if (ctx.lax) Nil
            else throw new PathError("jsonpath array subscript is out of bounds")
          }
        }
      }

    case Filter(base, pred) =>
      evalSeq(base, ctx, item).flatMap { n0 =>
        val nodes = if (ctx.lax) unwrap1(n0) else Seq(n0)
        nodes.filter(n => evalPred(pred, ctx, n) == TTrue)
      }

    case AnyPath(base, lo, hi) =>
      // recursive descent, preorder, no lax unwrapping (pg pins:
      // `$.**` on [] yields the root itself)
      evalSeq(base, ctx, item).flatMap { root =>
        val out = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
        val hiB = if (hi < 0) Int.MaxValue else hi
        def kids(x: JsonNode): Seq[JsonNode] =
          if (x.isObject) {
            val it = x.fields()
            val b = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
            while (it.hasNext) b += it.next().getValue
            b.toSeq
          } else if (x.isArray) (0 until x.size()).map(x.get)
          else Nil
        def walk(x: JsonNode, level: Int): Unit = {
          val ks = kids(x)
          // lower bound `last` = the deepest level of each branch,
          // i.e. the nodes with no children (pinned: `$.**{last}` on
          // {"a":1,"b":{"c":2}} yields [1, 2], not just depth-max)
          val emit = if (lo < 0) ks.isEmpty else level >= lo
          if (emit && level <= hiB) out += x
          if (level < hiB) ks.foreach(walk(_, level + 1))
        }
        walk(root, 0)
        out.toSeq
      }

    case Datetime(base, tplOpt) =>
      evalSeq(base, ctx, item).flatMap { n0 =>
        val nodes = if (ctx.lax) unwrap1(n0) else Seq(n0)
        nodes.map {
          case dt: DtVal => dt // idempotent
          case n if n.isTextual =>
            tplOpt match {
              case Some(tpl) => parseTplDt(n.textValue(), tpl)
              case None => parseIsoDt(n.textValue())
            }
          case _ => throw new PathError(
            "jsonpath item method .datetime() can only be applied to a string")
        }
      }

    case Method(base, "keyvalue") =>
      evalSeq(base, ctx, item).flatMap { n0 =>
        val nodes = if (ctx.lax) unwrap1(n0) else Seq(n0)
        nodes.flatMap { n =>
          if (n.isObject) {
            val id = ctx.objId(n)
            val it = n.fields()
            val out = scala.collection.mutable.ArrayBuffer.empty[JsonNode]
            while (it.hasNext) {
              val e = it.next()
              val o = F.objectNode()
              o.put("id", id)
              o.put("key", e.getKey)
              o.set[JsonNode]("value", e.getValue)
              out += o
            }
            out.toSeq
          } else throw new PathError(
            "jsonpath item method .keyvalue() can only be applied to an object")
        }
      }

    case Method(base, name) =>
      evalSeq(base, ctx, item).map { n =>
        name match {
          case "type" =>
            TextNode.valueOf(
              if (n.isInstanceOf[DtVal]) kindNames(n.asInstanceOf[DtVal].kind)
              else if (n.isObject) "object"
              else if (n.isArray) "array"
              else if (n.isTextual) "string"
              else if (n.isNumber) "number"
              else if (n.isBoolean) "boolean"
              else "null")
          case "size" =>
            if (n.isArray) DecimalNode.valueOf(java.math.BigDecimal.valueOf(n.size().toLong))
            else if (ctx.lax) DecimalNode.valueOf(java.math.BigDecimal.ONE)
            else throw new PathError("jsonpath item method .size() can only be applied to an array")
          case "double" =>
            if (n.isNumber) DecimalNode.valueOf(n.decimalValue())
            else if (n.isTextual)
              try DecimalNode.valueOf(new java.math.BigDecimal(n.textValue()))
              catch {
                case _: NumberFormatException => throw new PathError(
                  s"string argument of jsonpath item method .double() is not a valid representation of a double precision number")
              }
            else throw new PathError(".double() can only be applied to a string or numeric value")
          case "abs" => DecimalNode.valueOf(num(n).abs())
          case "floor" =>
            DecimalNode.valueOf(num(n).setScale(0, java.math.RoundingMode.FLOOR))
          case "ceiling" =>
            DecimalNode.valueOf(num(n).setScale(0, java.math.RoundingMode.CEILING))
          case other => throw new PathError(s"unsupported jsonpath method .$other()")
        }
      }

    case Arith(op, l, r) =>
      val a = singleNum(l, ctx, item)
      val b = singleNum(r, ctx, item)
      val v = op match {
        case '+' => a.add(b)
        case '-' => a.subtract(b)
        case '*' => a.multiply(b)
        case '/' =>
          if (b.signum() == 0) throw new PathError("division by zero")
          a.divide(b, java.math.MathContext.DECIMAL128)
        case '%' =>
          if (b.signum() == 0) throw new PathError("division by zero")
          a.remainder(b)
      }
      Seq(DecimalNode.valueOf(v))

    case Neg(x) =>
      // pg applies unary minus to EVERY numeric item of the operand
      evalSeq(x, ctx, item).map(n => DecimalNode.valueOf(num(n).negate()))

    // a predicate in item position yields its ternary result as an item
    case pred =>
      Seq(evalPred(pred, ctx, item) match {
        case TTrue => BooleanNode.TRUE
        case TFalse => BooleanNode.FALSE
        case TUnknown => NullNode.getInstance()
      })
  }

  /** A subscript operand must evaluate to a single number; `last`
    * binds to size-1 of the array being indexed. */
  private def subscriptInt(e: PExpr, ctx: Ctx, item: JsonNode, size: Int): Int = {
    def subst(x: PExpr): PExpr = x match {
      case Last => LitNum(java.math.BigDecimal.valueOf((size - 1).toLong))
      case Arith(op, l, r) => Arith(op, subst(l), subst(r))
      case Neg(v) => Neg(subst(v))
      case other => other
    }
    singleNum(subst(e), ctx, item).intValue()
  }

  private def singleNum(e: PExpr, ctx: Ctx, item: JsonNode): java.math.BigDecimal = {
    val vs = evalSeq(e, ctx, item)
    val items = if (ctx.lax) vs.flatMap(unwrap1) else vs
    if (items.length != 1) throw new PathError(
      "operand of jsonpath arithmetic is not a single numeric value")
    num(items.head)
  }

  private def evalPred(e: PExpr, ctx: Ctx, item: JsonNode): T3 = e match {
    case And(l, r) =>
      (evalPred(l, ctx, item), evalPred(r, ctx, item)) match {
        case (TTrue, TTrue) => TTrue
        case (TFalse, _) | (_, TFalse) => TFalse
        case _ => TUnknown
      }
    case Or(l, r) =>
      (evalPred(l, ctx, item), evalPred(r, ctx, item)) match {
        case (TTrue, _) | (_, TTrue) => TTrue
        case (TFalse, TFalse) => TFalse
        case _ => TUnknown
      }
    case Not(x) =>
      evalPred(x, ctx, item) match {
        case TTrue => TFalse
        case TFalse => TTrue
        case TUnknown => TUnknown
      }
    case IsUnknown(x) =>
      if (evalPred(x, ctx, item) == TUnknown) TTrue else TFalse
    case Exists(x) =>
      try { if (evalSeq(x, ctx, item).nonEmpty) TTrue else TFalse }
      catch { case _: PathError => TUnknown }
    case Cmp(op, l, r) =>
      try {
        val ls0 = evalSeq(l, ctx, item)
        val rs0 = evalSeq(r, ctx, item)
        val ls = if (ctx.lax) ls0.flatMap(unwrap1) else ls0
        val rs = if (ctx.lax) rs0.flatMap(unwrap1) else rs0
        var sawUnknown = false
        var sawTrue = false
        for (a <- ls; b <- rs) cmpPair(op, a, b, ctx) match {
          case TTrue => sawTrue = true
          case TUnknown => sawUnknown = true
          case TFalse =>
        }
        if (sawTrue) TTrue else if (sawUnknown) TUnknown else TFalse
      } catch { case _: PathError => TUnknown }
    case LikeRegex(x, pat) =>
      try {
        val vs = evalSeq(x, ctx, item)
        val items = if (ctx.lax) vs.flatMap(unwrap1) else vs
        if (items.exists(n => !n.isTextual)) TUnknown
        else if (items.exists(n => pat.matcher(n.textValue()).find())) TTrue
        else TFalse
      } catch { case _: PathError => TUnknown }
    case StartsWith(x, prefix) =>
      try {
        val ps = evalSeq(prefix, ctx, item)
        if (ps.length != 1 || !ps.head.isTextual) TUnknown
        else {
          val pfx = ps.head.textValue()
          val vs = evalSeq(x, ctx, item)
          val items = if (ctx.lax) vs.flatMap(unwrap1) else vs
          if (items.exists(n => !n.isTextual)) TUnknown
          else if (items.exists(n => n.textValue().startsWith(pfx))) TTrue
          else TFalse
        }
      } catch { case _: PathError => TUnknown }
    case other =>
      // bare path in boolean position: jsonpath requires a predicate
      try {
        val vs = evalSeq(other, ctx, item)
        if (vs.length == 1 && vs.head.isBoolean)
          if (vs.head.booleanValue()) TTrue else TFalse
        else TUnknown
      } catch { case _: PathError => TUnknown }
  }

  /** pg jsonpath comparison: null == null is true, null against
    * non-null is false for == (true for !=), ordering with null is
    * false; cross-type comparisons are unknown; numbers numerically,
    * strings by code point, booleans false < true. */
  private def cmpPair(op: String, a: JsonNode, b: JsonNode, ctx: Ctx): T3 = {
    val aNull = a.isNull
    val bNull = b.isNull
    if (aNull || bNull) {
      val eq = aNull && bNull
      return op match {
        case "==" => if (eq) TTrue else TFalse
        case "!=" => if (eq) TFalse else TTrue
        case _ => TFalse
      }
    }
    val cmp: Option[Int] = (a, b) match {
      // datetime items compare by instant (and intercept BEFORE the
      // textual branch — DtVal extends TextNode); a datetime against
      // a plain string is a type mismatch -> unknown
      case (da: DtVal, db: DtVal) => compareDt(da, db, ctx.tzAware)
      case (_: DtVal, _) | (_, _: DtVal) => None
      case _ =>
        if (a.isNumber && b.isNumber) Some(a.decimalValue().compareTo(b.decimalValue()))
        else if (a.isTextual && b.isTextual) Some(a.textValue().compareTo(b.textValue()))
        else if (a.isBoolean && b.isBoolean)
          Some(java.lang.Boolean.compare(a.booleanValue(), b.booleanValue()))
        else None
    }
    cmp match {
      case None => TUnknown
      case Some(c) =>
        val r = op match {
          case "==" => c == 0
          case "!=" => c != 0
          case "<" => c < 0
          case "<=" => c <= 0
          case ">" => c > 0
          case ">=" => c >= 0
        }
        if (r) TTrue else TFalse
    }
  }

  // ---- public entry points (used by the expressions) -----------------------

  /** Run the path; a predicate path yields its single ternary item
    * (pg behavior: `jsonb_path_query('{}', '$.a == 1')` → null item). */
  def query(json: JsonNode, path: Path, vars: JsonNode,
      tzAware: Boolean = false): Seq[JsonNode] = {
    val ctx = new Ctx(json, vars, path.lax, tzAware)
    if (path.isPredicate)
      Seq(evalPred(path.expr, ctx, json) match {
        case TTrue => BooleanNode.TRUE
        case TFalse => BooleanNode.FALSE
        case TUnknown => NullNode.getInstance()
      })
    else evalSeq(path.expr, ctx, json)
  }

  /** jsonb_path_exists: does the path yield any item. */
  def exists(json: JsonNode, path: Path, vars: JsonNode,
      tzAware: Boolean = false): Boolean =
    query(json, path, vars, tzAware).nonEmpty

  /** jsonb_path_match: the path must yield a single boolean;
    * unknown → SQL NULL; anything else errors (silent → null). */
  def matches(json: JsonNode, path: Path, vars: JsonNode,
      tzAware: Boolean = false): java.lang.Boolean = {
    val ctx = new Ctx(json, vars, path.lax, tzAware)
    if (path.isPredicate)
      evalPred(path.expr, ctx, json) match {
        case TTrue => java.lang.Boolean.TRUE
        case TFalse => java.lang.Boolean.FALSE
        case TUnknown => null
      }
    else {
      val vs = evalSeq(path.expr, ctx, json)
      if (vs.length == 1 && vs.head.isBoolean) java.lang.Boolean.valueOf(vs.head.booleanValue())
      else if (vs.length == 1 && vs.head.isNull) null
      else throw new PathError("single boolean result is expected")
    }
  }
}

/** The `jsonb_path_*` function family over text-encoded json (same
  * representation as the rest of [[PgJsonExpressions]]).
  * Children: (target, path[, vars[, silent]]). STRICT: null in →
  * null out. The compiled path is memoized behind a single immutable
  * tuple reference so concurrent evaluation stays consistent. */
abstract class PgJsonPathFunction extends Expression with PgVariadicDirectGen {
  def children: Seq[Expression]
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length >= 2 && children.length <= 4 &&
      children(0).dataType == StringType && children(1).dataType == StringType &&
      (children.length < 3 || children(2).dataType == StringType) &&
      (children.length < 4 || children(3).dataType == BooleanType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName(jsonb, jsonpath[, vars jsonb[, silent boolean]])")

  // (pathBytes, compiled) — one volatile ref, consistent under races;
  // keyed on the UTF8String so the per-row hit path allocates nothing
  @volatile private var memo: (UTF8String, PgJsonPath.Path) = null
  @volatile private var varsMemo: (UTF8String, JsonNode) = null

  protected def compiled(path: UTF8String): PgJsonPath.Path = {
    val m = memo
    if (m != null && m._1 == path) m._2
    else {
      val c = PgJsonPath.compile(path.toString)
      memo = (path.clone(), c)
      c
    }
  }

  /** The vars argument is almost always a literal — cache its parse.
    * Callers only read the returned tree, never mutate it. */
  protected def parsedVars(vars: UTF8String): JsonNode = {
    val m = varsMemo
    if (m != null && m._1 == vars) m._2
    else {
      val v = PgJsonExpressions.parse(vars)
      varsMemo = (vars.clone(), v)
      v
    }
  }

  /** The typed result from the evaluated path. */
  protected def run(json: JsonNode, path: PgJsonPath.Path, vars: JsonNode): Any

  /** What a `silent`-suppressed error yields (pg: SQL NULL, except
    * jsonb_path_query_array which yields an empty array). */
  protected def suppressed: Any = null

  override def evalVals(vs: Array[Any]): Any = {
    var i = 0
    while (i < vs.length) { if (vs(i) == null) return null; i += 1 }
    val silent = children.length == 4 && vs(3).asInstanceOf[Boolean]
    try {
      // path evaluation never mutates the document → the shared
      // per-thread parse memo applies (8 jsonb_path_* calls over the
      // same column parse the row's document once)
      val json = PgJsonExpressions.parseCached(vs(0).asInstanceOf[UTF8String])
      val path = compiled(vs(1).asInstanceOf[UTF8String])
      val vars =
        if (children.length >= 3) parsedVars(vs(2).asInstanceOf[UTF8String])
        else null
      run(json, path, vars)
    } catch {
      case _: PgJsonPath.PathError if silent => suppressed
    }
  }
}

case class PgJsonbPathExists(children: Seq[Expression], tz: Boolean = false)
    extends PgJsonPathFunction {
  override def dataType: DataType = BooleanType
  override def prettyName: String = if (tz) "jsonb_path_exists_tz" else "jsonb_path_exists"
  override protected def run(json: JsonNode, path: PgJsonPath.Path, vars: JsonNode): Any =
    PgJsonPath.exists(json, path, vars, tz)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PgJsonbPathExists = copy(children = newChildren)
}

case class PgJsonbPathMatch(children: Seq[Expression], tz: Boolean = false)
    extends PgJsonPathFunction {
  override def dataType: DataType = BooleanType
  override def prettyName: String = if (tz) "jsonb_path_match_tz" else "jsonb_path_match"
  override protected def run(json: JsonNode, path: PgJsonPath.Path, vars: JsonNode): Any = {
    val r = PgJsonPath.matches(json, path, vars, tz)
    if (r == null) null else r.booleanValue()
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PgJsonbPathMatch = copy(children = newChildren)
}

case class PgJsonbPathQueryFirst(children: Seq[Expression], tz: Boolean = false)
    extends PgJsonPathFunction {
  override def dataType: DataType = StringType
  override def prettyName: String =
    if (tz) "jsonb_path_query_first_tz" else "jsonb_path_query_first"
  override protected def run(json: JsonNode, path: PgJsonPath.Path, vars: JsonNode): Any =
    PgJsonPath.query(json, path, vars, tz).headOption match {
      case Some(n) => PgJsonExpressions.jsonbOut(n)
      case None => null
    }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PgJsonbPathQueryFirst = copy(children = newChildren)
}

case class PgJsonbPathQueryArray(children: Seq[Expression], tz: Boolean = false)
    extends PgJsonPathFunction {
  override def dataType: DataType = StringType
  override def prettyName: String =
    if (tz) "jsonb_path_query_array_tz" else "jsonb_path_query_array"
  // pg: a silent-suppressed error wraps the empty sequence -> '[]'
  override protected def suppressed: Any = UTF8String.fromString("[]")
  override protected def run(json: JsonNode, path: PgJsonPath.Path, vars: JsonNode): Any = {
    val sb = new java.lang.StringBuilder(32)
    sb.append('[')
    val items = PgJsonPath.query(json, path, vars, tz)
    var i = 0
    while (i < items.length) {
      // jsonb canonical spacing — the result is a jsonb array
      if (i > 0) sb.append(", ")
      sb.append(PgJsonExpressions.jsonbText(items(i)))
      i += 1
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PgJsonbPathQueryArray = copy(children = newChildren)
}

/** jsonb_path_query is set-returning in pg — exposed as text[] and
  * rewritten to explode(...) by Compat, like json_array_elements. */
case class PgJsonbPathQuery(children: Seq[Expression], tz: Boolean = false)
    extends PgJsonPathFunction {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = if (tz) "jsonb_path_query_tz" else "jsonb_path_query"
  override protected def run(json: JsonNode, path: PgJsonPath.Path, vars: JsonNode): Any = {
    val items = PgJsonPath.query(json, path, vars, tz)
    val out = new Array[Any](items.length)
    var i = 0
    while (i < items.length) { out(i) = PgJsonExpressions.jsonbOut(items(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PgJsonbPathQuery = copy(children = newChildren)
}

object PgJsonPathExpressions {
  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(PgJsonPathExpressions.getClass.getName, name)

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("jsonb_path_exists"), info("jsonb_path_exists"),
      (args: Seq[Expression]) => PgJsonbPathExists(args)),
    (FunctionIdentifier("jsonb_path_match"), info("jsonb_path_match"),
      (args: Seq[Expression]) => PgJsonbPathMatch(args)),
    (FunctionIdentifier("jsonb_path_query_first"), info("jsonb_path_query_first"),
      (args: Seq[Expression]) => PgJsonbPathQueryFirst(args)),
    (FunctionIdentifier("jsonb_path_query_array"), info("jsonb_path_query_array"),
      (args: Seq[Expression]) => PgJsonbPathQueryArray(args)),
    (FunctionIdentifier("jsonb_path_query"), info("jsonb_path_query"),
      (args: Seq[Expression]) => PgJsonbPathQuery(args)),
    // *_tz twins: identical except tz-requiring datetime comparisons
    // resolve against the engine's pinned UTC session zone
    (FunctionIdentifier("jsonb_path_exists_tz"), info("jsonb_path_exists_tz"),
      (args: Seq[Expression]) => PgJsonbPathExists(args, tz = true)),
    (FunctionIdentifier("jsonb_path_match_tz"), info("jsonb_path_match_tz"),
      (args: Seq[Expression]) => PgJsonbPathMatch(args, tz = true)),
    (FunctionIdentifier("jsonb_path_query_first_tz"), info("jsonb_path_query_first_tz"),
      (args: Seq[Expression]) => PgJsonbPathQueryFirst(args, tz = true)),
    (FunctionIdentifier("jsonb_path_query_array_tz"), info("jsonb_path_query_array_tz"),
      (args: Seq[Expression]) => PgJsonbPathQueryArray(args, tz = true)),
    (FunctionIdentifier("jsonb_path_query_tz"), info("jsonb_path_query_tz"),
      (args: Seq[Expression]) => PgJsonbPathQuery(args, tz = true)))

  def install(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    descriptions.foreach { case (ident, i, builder) =>
      reg.registerFunction(ident, i, builder)
    }
  }
}
