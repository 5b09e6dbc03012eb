package graft.pgwire

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.graftshim.DatasetShim
import org.apache.spark.sql.types._

/** Type-directed pg semantics that a TEXT rewrite cannot express —
  * operand types are only known at analysis time. Two delivery layers:
  *
  *  1. [[PgSemantics.Resolution]] — an analyzer rule (injected by
  *     `graft.GraftExtensions`) active ONLY inside
  *     [[PgSemantics.withPg]]'s dynamic extent on the calling thread.
  *     [[Handlers.runSql]] wraps every wire-path query in it, so pg
  *     dialect semantics apply exactly to server/client SQL while
  *     queries run through the plain Spark API (the oracle suite,
  *     library users) keep Spark semantics. Running inside the
  *     analyzer lets the rewritten types COMPOSE: `(d1 - d2) - 1`
  *     resolves as int arithmetic because date−date becomes an int
  *     before the outer subtraction resolves.
  *  2. [[PgSemantics.apply]] — the same rewrites as a post-analysis
  *     transform, for sessions built without the extension (terminal
  *     positions only; composition needs layer 1).
  *
  * The rules (all live-pg-15-pinned, PgParitySpec sweep #6):
  *
  *  - `int / int` → truncating integer division in the wider operand
  *    type (pg `7/2 = 3`, `-7/2 = -3`, `pg_typeof(7/2) = integer`).
  *    Spark's analyzer coerces both sides to DOUBLE; the rule detects
  *    that exact coercion shape and requires the casts to be
  *    analyzer-inserted (no [[Cast.USER_SPECIFIED_CAST]] tag), so an
  *    explicit `a::float8 / b` keeps float division.
  *  - numeric → int casts round half-away-from-zero (pg
  *    `2.5::int = 3`, `(-2.5)::int = -3`; Spark truncates). String
  *    sources are untouched (documented deviation: pg ERRORS on
  *    `'2.5'::int`, Spark's non-ANSI cast truncates).
  *  - `date - date` → integer day count (pg int4; Spark makes an
  *    INTERVAL DAY).
  *  - `date ± interval` → timestamp WITHOUT time zone (pg returns
  *    timestamp; Spark's DateAddInterval stays DATE, truncating the
  *    time-of-day part).
  *
  * Reference anchor: the reference engine inherits these from
  * DataFusion's pg-style arithmetic; here they are reconstructed
  * against the live pg 15 oracle (PgDiffTool sweep #6).
  */
object PgSemantics {

  private val activeFlag = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  def active: Boolean = activeFlag.get().booleanValue()

  /** Run `body` with pg dialect semantics active on this thread —
    * every plan ANALYZED inside (analysis is eager in `spark.sql`)
    * carries the rewrites for its lifetime. */
  def withPg[T](body: => T): T = {
    val prev = activeFlag.get()
    activeFlag.set(java.lang.Boolean.TRUE)
    try body finally activeFlag.set(prev)
  }

  /** Analyzer rule — a no-op unless [[withPg]] is active on the
    * current thread (so the shared GraftExtensions session keeps
    * Spark semantics for everything else). */
  object Resolution extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (!active) plan else rewriteExpressions(plan)
  }

  /** Post-analysis fallback for sessions without GraftExtensions. */
  def apply(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val newPlan = rewriteExpressions(plan)
    if (newPlan eq plan) df else DatasetShim.ofRows(df.sparkSession, newPlan)
  }

  private def rewriteExpressions(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // int / int (both casts analyzer-inserted) → truncating division
      case Divide(
            lc @ Cast(l, DoubleType, _, _),
            rc @ Cast(r, DoubleType, _, _), _)
          if l.resolved && r.resolved &&
            isIntegral(l.dataType) && isIntegral(r.dataType) &&
            notUserCast(lc) && notUserCast(rc) =>
        Cast(new IntegralDivide(l, r), widerInt(l.dataType, r.dataType))

      // fractional-numeric → integral cast: round half-away-from-zero
      case c @ Cast(child, target, tz, mode)
          if child.resolved && isIntegral(target) &&
            isFractional(child.dataType) &&
            c.getTagValue(roundedTag).isEmpty => {
        val inner = new Round(child, Literal(0))
        val rounded = Cast(inner, target, tz, mode)
        rounded.setTagValue(roundedTag, ())
        c.getTagValue(Cast.USER_SPECIFIED_CAST)
          .foreach(_ => rounded.setTagValue(Cast.USER_SPECIFIED_CAST, ()))
        rounded
      }

      // array/record → text cast renders pg composite text
      // ('{1,2,3}', '(1,x)'), never Spark's '[1, 2, 3]' (sweep-27)
      case Cast(child, StringType, _, _)
          if child.resolved && (child.dataType.isInstanceOf[ArrayType] ||
            child.dataType.isInstanceOf[StructType]) =>
        graft.functions.PgMiscExpressions.PgCompositeText(child)

      // date - date → int day count
      case SubtractDates(l, r, _) if l.resolved && r.resolved =>
        DateDiff(l, r)

      // date ± interval → timestamp without time zone.
      // Three analyzer shapes cover pg's one rule: CalendarInterval
      // (pg_interval casts) resolves to DateAddInterval; a native
      // day-time interval literal resolves to TimestampAddInterval
      // over an implicit date→timestamp cast (session-zoned — retarget
      // it to NTZ); a year-month interval resolves to DateAddYMInterval
      // (stays DATE, dropping pg's midnight time part).
      case DateAddInterval(d, itvl, tz, _) if d.resolved && itvl.resolved =>
        new TimestampAddInterval(Cast(d, TimestampNTZType), itvl, tz)
      case TimestampAddInterval(c @ Cast(d, TimestampType, _, _), itvl, tz)
          if d.resolved && d.dataType == DateType && notUserCast(c) =>
        new TimestampAddInterval(Cast(d, TimestampNTZType), itvl, tz)
      case DateAddYMInterval(d, itvl) if d.resolved && itvl.resolved =>
        new TimestampAddYMInterval(Cast(d, TimestampNTZType), itvl, None)

      // timezone(zone, ts) / AT TIME ZONE with a timestamp-WITHOUT-tz
      // operand: pg's overload interprets the naive value IN the zone
      // → timestamptz. The registered builder pins the tz→ntz
      // direction via an implicit cast; undo it when the source is NTZ
      case graft.functions.PgFormatExpressions.PgTimezone(
            z, c @ Cast(x, TimestampType, _, _))
          if x.resolved && x.dataType == TimestampNTZType && notUserCast(c) =>
        graft.functions.PgFormatExpressions.PgTimezoneToTz(z, x)

      // date_trunc over timestamp-WITHOUT-tz or DATE input: pg
      // returns plain timestamp (sweep #8, live-pg-pinned), but
      // Spark's TruncTimestamp coerces to the session-zoned type via
      // an analyzer cast. Retarget the result back to NTZ.
      case t @ TruncTimestamp(_, c @ Cast(x, TimestampType, _, _), _)
          if x.resolved &&
            (x.dataType == TimestampNTZType || x.dataType == DateType) &&
            notUserCast(c) && t.getTagValue(truncNtzTag).isEmpty => {
        t.setTagValue(truncNtzTag, ())
        Cast(t, TimestampNTZType)
      }

      // float → text casts ride pg's output function (shortest
      // precise form), not Spark's Double.toString
      case Cast(f, StringType, _, _)
          if f.resolved &&
            (f.dataType == DoubleType || f.dataType == FloatType) =>
        PgFloatText(f, f.dataType == FloatType)

      // pg avg(int/numeric) returns numeric and RENDERS at least 16
      // fractional digits (live pg: avg of 2,3 → 2.5000000000000000);
      // Spark's DECIMAL average keeps input-scale+4. Cast the result
      // to scale max(16, input scale). float8 input stays float8 (pg
      // too). (sweep #10)
      case ae @ org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
            avg: org.apache.spark.sql.catalyst.expressions.aggregate.Average, _, _, _, _)
          if avg.child.resolved && ae.getTagValue(avgScaleTag).isEmpty &&
            (avg.child.dataType match {
              case ByteType | ShortType | IntegerType | LongType | _: DecimalType => true
              case _ => false
            }) => {
        ae.setTagValue(avgScaleTag, ())
        val scale = avg.child.dataType match {
          case d: DecimalType => math.max(16, d.scale)
          case _ => 16
        }
        Cast(ae, DecimalType(38, scale))
      }

      // bytea string-function dispatch (sweep #12): the pg-named
      // string UDFs (pg_substr, pg_ltrim/pg_rtrim, btrim) are
      // string-typed, so a BYTEA argument would round-trip through
      // UTF-8 and mangle the bytes. Retarget to byte-level
      // expressions when the first argument is binary (possibly
      // behind the analyzer's implicit binary→string cast).
      case u: ScalaUDF
          if u.udfName.exists(n => Set("pg_substr", "pg_ltrim", "pg_rtrim",
            "btrim").contains(n.toLowerCase)) &&
            u.children.nonEmpty && byteaArg(u.children.head).isDefined &&
            u.children.forall(_.resolved) => {
        val name = u.udfName.get.toLowerCase
        val arg0 = byteaArg(u.children.head).get
        name match {
          case "pg_substr" =>
            graft.functions.PgMiscExpressions.PgByteaSubstr(
              arg0 +: u.children.tail)
          case "pg_ltrim" | "pg_rtrim" | "btrim" =>
            val arg1 = u.children.tail.headOption.flatMap(byteaArg)
              .getOrElse(Cast(u.children(1), BinaryType))
            graft.functions.PgMiscExpressions.PgByteaTrim(arg0, arg1,
              trimLeft = name != "pg_rtrim", trimRight = name != "pg_ltrim")
        }
      }

      // (btrim resolves to Spark's BUILTIN StringTrimBoth, not the
      // registered UDF — same bytea retarget)
      case StringTrimBoth(src, Some(tr), _)
          if src.resolved && tr.resolved && byteaArg(src).isDefined =>
        graft.functions.PgMiscExpressions.PgByteaTrim(
          byteaArg(src).get,
          byteaArg(tr).getOrElse(Cast(tr, BinaryType)),
          trimLeft = true, trimRight = true)

      // pg composite null tests: `row IS NULL` ⟺ every field null,
      // `row IS NOT NULL` ⟺ every field non-null (a mixed row fails
      // both — pg docs §9.2). Spark checks only the struct reference.
      case IsNull(e) if e.resolved && e.dataType.isInstanceOf[StructType] =>
        graft.functions.PgMiscExpressions.PgRowNullTest(e, wantAllNull = true)
      case IsNotNull(e) if e.resolved && e.dataType.isInstanceOf[StructType] =>
        graft.functions.PgMiscExpressions.PgRowNullTest(e, wantAllNull = false)

      // round(float8) is half-to-EVEN in pg (2.5 → 2; numeric stays
      // half-away) — Spark's Round is half-up for doubles; BRound IS
      // banker's rounding (sweep #9, live-pg-pinned). This also
      // retargets the Round the fractional-cast rule above inserts,
      // so `2.5::float8::int` = 2 exactly like pg.
      case r: Round
          if r.child.resolved &&
            (r.child.dataType == DoubleType || r.child.dataType == FloatType) =>
        BRound(r.child, r.scale)

      // interval → text rides pg's interval output function
      // ("1 year 2 mons", not Spark's "1 years 2 months")
      case Cast(iv, StringType, _, _)
          if iv.resolved && (iv.dataType match {
            case CalendarIntervalType | _: DayTimeIntervalType |
                 _: YearMonthIntervalType => true
            case _ => false
          }) =>
        graft.functions.PgMiscExpressions.PgIntervalText(iv)

      // interval ± interval with a CalendarInterval side: pg keeps
      // year-month and day-time fields independent; Spark's native
      // arithmetic rejects the mixed pair
      case Add(l, r, _)
          if l.resolved && r.resolved && isIvPair(l.dataType, r.dataType) =>
        graft.functions.PgMiscExpressions.PgIntervalAdd(
          ivOperand(l), ivOperand(r), negate = false)
      case Subtract(l, r, _)
          if l.resolved && r.resolved && isIvPair(l.dataType, r.dataType) =>
        graft.functions.PgMiscExpressions.PgIntervalAdd(
          ivOperand(l), ivOperand(r), negate = true)
      // the parser sugars `x ± INTERVAL '…'` into TimeAdd assuming a
      // datetime left side — when x is itself an interval, it's the
      // same interval-arithmetic case (negation already folded into
      // the interval operand)
      // (the parser also wraps the sugar in a cast back to the left
      // operand's interval type — drop it, the result is pg's
      // CalendarInterval carrier)
      case Cast(TimestampAddInterval(l, itv, _), target, _, _)
          if l.resolved && itv.resolved && isIvPair(l.dataType, itv.dataType) &&
            (target match {
              case CalendarIntervalType | _: YearMonthIntervalType |
                   _: DayTimeIntervalType => true
              case _ => false
            }) =>
        graft.functions.PgMiscExpressions.PgIntervalAdd(l, itv, negate = false)
      case TimestampAddInterval(l, itv, _)
          if l.resolved && itv.resolved && isIvPair(l.dataType, itv.dataType) =>
        graft.functions.PgMiscExpressions.PgIntervalAdd(l, itv, negate = false)
      case DateAddInterval(l, itv, _, _)
          if l.resolved && itv.resolved && isIvPair(l.dataType, itv.dataType) =>
        graft.functions.PgMiscExpressions.PgIntervalAdd(l, itv, negate = false)

      // concat's argument conversion uses pg's OUTPUT function for
      // booleans ('t'/'f'), not the text cast ('true'/'false') —
      // live-pg: concat('a', true) = 'at' but true::text = 'true'
      case cw: ConcatWs
          if cw.resolved && cw.children.exists(isImplicitBoolStr) =>
        ConcatWs(cw.children.map(pgBoolText))
      case cc: Concat
          if cc.resolved && cc.children.exists(isImplicitBoolStr) =>
        Concat(cc.children.map(pgBoolText))

      // ---- unknown-literal coercion (sweep-32, live-pg-pinned) ----
      // pg coerces an UNKNOWN (bare string literal) operand to the
      // other operand's type through that type's input function.
      // Spark's coercion never produces these conversions, so the
      // shapes arrive here unresolved.

      // array `||` with a string literal: pg runs array_in on the
      // literal — `'{1,2}'::int[] || '{3}'` = {1,2,3}; a non-array-
      // shaped literal is 22P02 ("... || '3'" included, live-pinned)
      case c: Concat
          if !c.resolved && c.children.forall(_.resolved) &&
            c.children.exists(_.dataType.isInstanceOf[ArrayType]) &&
            c.children.exists(isStringLit) =>
        val at = c.children.find(_.dataType.isInstanceOf[ArrayType]).get
          .dataType.asInstanceOf[ArrayType]
        Concat(c.children.map(ch =>
          if (isStringLit(ch)) pgArrayLiteralExpr(litText(ch), at) else ch))

      // array `||` element / element `||` array → append / prepend
      // (typed non-array side; the token layer handles syntactically
      // marked shapes, this covers type-revealed ones)
      case c: Concat
          if !c.resolved && c.children.length == 2 &&
            c.children.forall(_.resolved) &&
            c.children.count(_.dataType.isInstanceOf[ArrayType]) == 1 &&
            !c.children.exists(isStringLit) =>
        val Seq(l, r) = c.children
        if (l.dataType.isInstanceOf[ArrayType]) {
          val et = l.dataType.asInstanceOf[ArrayType].elementType
          ArrayAppend(l, castTo(r, et))
        } else {
          val et = r.dataType.asInstanceOf[ArrayType].elementType
          ArrayPrepend(r, castTo(l, et))
        }

      // `@>` / `<@` / `&&` with a string literal beside an array
      case p @ graft.functions.PgJsonExpressions.PgContains(l, r)
          if !p.resolved && l.resolved && r.resolved &&
            arrayAndStrLit(l, r) =>
        if (l.dataType.isInstanceOf[ArrayType])
          graft.functions.PgJsonExpressions.PgContains(l,
            pgArrayLiteralExpr(litText(r), l.dataType.asInstanceOf[ArrayType]))
        else
          graft.functions.PgJsonExpressions.PgContains(
            pgArrayLiteralExpr(litText(l), r.dataType.asInstanceOf[ArrayType]), r)
      case p @ ArraysOverlap(l, r)
          if !p.resolved && l.resolved && r.resolved &&
            arrayAndStrLit(l, r) =>
        if (l.dataType.isInstanceOf[ArrayType])
          ArraysOverlap(l,
            pgArrayLiteralExpr(litText(r), l.dataType.asInstanceOf[ArrayType]))
        else
          ArraysOverlap(
            pgArrayLiteralExpr(litText(l), r.dataType.asInstanceOf[ArrayType]), r)

      // timestamp + unknown → the literal is an INTERVAL (pg's only
      // addition candidate); timestamp - unknown → the literal is a
      // TIMESTAMP (pg prefers ts-ts over ts-interval: live-pinned
      // `ts - '1 hour'` = "invalid input syntax for type timestamp")
      case a @ Add(l, r, _)
          if !a.resolved && l.resolved && r.resolved &&
            isTsType(l.dataType) && isStringLit(r) =>
        Add(l, graft.functions.PgFormatExpressions.PgIntervalLiteral(r))
      case a @ Add(l, r, _)
          if !a.resolved && l.resolved && r.resolved &&
            isStringLit(l) && isTsType(r.dataType) =>
        Add(graft.functions.PgFormatExpressions.PgIntervalLiteral(l), r)
      case s @ Subtract(l, r, _)
          if !s.resolved && l.resolved && r.resolved &&
            isTsType(l.dataType) && isStringLit(r) =>
        Subtract(l, taggedCast(r, l.dataType))

      // interval ± unknown → the literal is an interval
      case a @ Add(l, r, _)
          if !a.resolved && l.resolved && r.resolved &&
            (isIvType(l.dataType) && isStringLit(r)) =>
        Add(l, graft.functions.PgFormatExpressions.PgIntervalLiteral(r))
      case a @ Add(l, r, _)
          if !a.resolved && l.resolved && r.resolved &&
            (isStringLit(l) && isIvType(r.dataType)) =>
        Add(graft.functions.PgFormatExpressions.PgIntervalLiteral(l), r)
      case s @ Subtract(l, r, _)
          if !s.resolved && l.resolved && r.resolved &&
            isIvType(l.dataType) && isStringLit(r) =>
        Subtract(l, graft.functions.PgFormatExpressions.PgIntervalLiteral(r))

      // the same shapes AFTER Spark's own coercion got there first —
      // an analyzer-inserted Cast over the unknown literal (to a
      // timestamp for `ts + 'x'`, to a day-time interval for
      // `interval + 'x'`): pg reads the literal as an INTERVAL for
      // addition; the cast may even resolve and then fail or
      // misbehave at runtime on pg-only spellings
      case Add(l, r, _)
          if l.resolved && (isTsType(l.dataType) || isIvType(l.dataType)) &&
            implicitStrLit(r).isDefined =>
        Add(l, graft.functions.PgFormatExpressions.PgIntervalLiteral(
          implicitStrLit(r).get))
      case Add(l, r, _)
          if r.resolved && (isTsType(r.dataType) || isIvType(r.dataType)) &&
            implicitStrLit(l).isDefined =>
        Add(graft.functions.PgFormatExpressions.PgIntervalLiteral(
          implicitStrLit(l).get), r)
      case Subtract(l, r, _)
          if l.resolved && isTsType(l.dataType) && implicitStrLit(r).isDefined =>
        Subtract(l, taggedCast(implicitStrLit(r).get, l.dataType))
      case Subtract(l, r, _)
          if r.resolved && isTsType(r.dataType) && implicitStrLit(l).isDefined =>
        Subtract(taggedCast(implicitStrLit(l).get, r.dataType), r)
      case Subtract(l, r, _)
          if l.resolved && isIvType(l.dataType) && implicitStrLit(r).isDefined =>
        Subtract(l, graft.functions.PgFormatExpressions.PgIntervalLiteral(
          implicitStrLit(r).get))

      // EXTRACT(EPOCH FROM x) where x turned out interval-typed
      // (`ts - 'lit'` subtraction): the text rewrite wrapped the
      // operand as unix_micros(CAST(x AS TIMESTAMP)), and the failing
      // inner cast keeps the unix_micros parent unresolved — so the
      // CAST itself retargets to the timestamp whose unix micros ARE
      // pg's interval epoch (pg has no interval→timestamp cast at
      // all, so no legitimate query carries this shape)
      case Cast(iv, TimestampType, _, _)
          if iv.resolved && isIvType(iv.dataType) =>
        MicrosToTimestamp(Cast(Multiply(
          graft.functions.PgFormatExpressions.PgIntervalPart(
            Literal("epoch"), iv),
          Literal(1000000L)), LongType))

      // interval + unknown AFTER Spark's datetime coercion flipped it
      // into TimestampAddInterval(cast(lit AS TIMESTAMP), interval)
      case TimestampAddInterval(l, itv, _)
          if itv.resolved && isIvType(itv.dataType) &&
            implicitStrLit(l).isDefined =>
        graft.functions.PgMiscExpressions.PgIntervalAdd(
          graft.functions.PgFormatExpressions.PgIntervalLiteral(
            implicitStrLit(l).get), itv, negate = false)

      // greatest/least with string literals among typed arguments:
      // the unknowns coerce to the known type (greatest('1', 2.5) = 2.5)
      case g: Greatest
          if !g.resolved && g.children.forall(_.resolved) &&
            mixedStrLit(g.children) && widerKnown(g.children).isDefined =>
        Greatest(coerceStrLits(g.children))
      case l: Least
          if !l.resolved && l.children.forall(_.resolved) &&
            mixedStrLit(l.children) && widerKnown(l.children).isDefined =>
        Least(coerceStrLits(l.children))

      // 1-arg to_timestamp is pg's epoch→timestamptz (Compat renames
      // it to timestamp_seconds); an unknown literal argument coerces
      // to double precision
      case st @ SecondsToTimestamp(child)
          if !st.resolved && child.resolved && child.dataType == StringType =>
        SecondsToTimestamp(Cast(child, DoubleType))

      // ---- pg.type metadata operator dispatch (round 13) ----
      // Stored columns created by pg-dialect DDL carry pg.oid_alias /
      // pg.oid_num / pg.enum metadata. Operators over BARE such
      // columns were token-dispatched to the json/array defaults (or
      // left as string comparisons) because the text rewrite cannot
      // see types — the attribute metadata IS the type here, so
      // re-dispatch to the family functions without requiring a cast.

      // `@>` / `<@` between range-text columns: pg_contains is the
      // anyarray/jsonb default the token layer picked
      case e: Expression
          if e.children.length == 2 && e.children.forall(_.resolved) &&
            Set("pg_contains", "pg_contained").contains(e.prettyName) &&
            e.children.exists(c => metaAliasOf(c).exists(Compat.rangeTypeNames.contains)) =>
        fnCall(
          if (e.prettyName == "pg_contains") "range_contains" else "range_contained",
          e.children.map(stripImplicitCasts))

      // `&&` between range-text columns resolved to ArraysOverlap
      case ArraysOverlap(l, r)
          if l.resolved && r.resolved &&
            Seq(l, r).exists(c => metaAliasOf(c).exists(Compat.rangeTypeNames.contains)) =>
        fnCall("range_overlaps", Seq(stripImplicitCasts(l), stripImplicitCasts(r)))

      // `@@` over a tsvector/tsquery column went to the jsonpath match
      case e: Expression
          if e.children.length >= 2 && e.children.take(2).forall(_.resolved) &&
            e.prettyName == "jsonb_path_match" &&
            e.children.take(2).exists(c =>
              metaAliasOf(c).exists(a => a == "tsvector" || a == "tsquery")) => {
        val Seq(l, r) = e.children.take(2).map(stripImplicitCasts)
        if (metaAliasOf(e.children.head).contains("tsvector")) fnCall("ts_match", Seq(l, r))
        else if (metaAliasOf(e.children(1)).contains("tsvector")) fnCall("ts_match", Seq(r, l))
        else if (metaAliasOf(e.children.head).contains("tsquery")) fnCall("ts_match", Seq(r, l))
        else fnCall("ts_match", Seq(l, r))
      }

      // `->` / `#>` over a stored jsonb column: the token layer emits
      // the json (text-preserving) variant; jsonb re-serializes
      // canonically (sweep-28)
      case x: graft.functions.PgJsonExpressions.PgJsonExtractPath
          if !x.jsonb && x.children.nonEmpty && x.children.head.resolved &&
            metaAliasOf(x.children.head).contains("jsonb") =>
        x.copy(jsonb = true)
      case x: graft.functions.PgJsonExpressions.PgJsonArrayElements
          if !x.jsonb && x.child.resolved &&
            metaAliasOf(x.child).contains("jsonb") =>
        x.copy(jsonb = true)
      case x: graft.functions.PgJsonExpressions.PgJsonEach
          if !x.jsonb && x.child.resolved &&
            metaAliasOf(x.child).contains("jsonb") =>
        x.copy(jsonb = true)

      // inet containment `<<` / `>>` parsed as integer shifts
      case ShiftLeft(l, r)
          if Seq(l, r).exists(c => metaAliasOf(c).exists(inetAliases.contains)) =>
        fnCall("inet_contained_strict", Seq(stripImplicitCasts(l), stripImplicitCasts(r)))
      case ShiftRight(l, r)
          if Seq(l, r).exists(c => metaAliasOf(c).exists(inetAliases.contains)) =>
        fnCall("inet_contains_strict", Seq(stripImplicitCasts(l), stripImplicitCasts(r)))

      // order comparisons over enum-typed columns: declared-label
      // order via the session ordinal map (pg §8.7.2)
      case cmp: BinaryComparison
          if cmp.left.resolved && cmp.right.resolved &&
            !cmp.isInstanceOf[EqualTo] && !cmp.isInstanceOf[EqualNullSafe] &&
            Seq(cmp.left, cmp.right).exists(c => enumNameOf(c).isDefined) => {
        val name = Seq(cmp.left, cmp.right).flatMap(enumNameOf).head
        cmp.withNewChildren(Seq(
          fnCall("enum_ord", Seq(Literal(name), stripImplicitCasts(cmp.left))),
          fnCall("enum_ord", Seq(Literal(name), stripImplicitCasts(cmp.right)))))
      }

      // ORDER BY an enum column sorts by declared order
      case so @ SortOrder(child, _, _, _)
          if child.resolved && enumNameOf(child).isDefined =>
        so.copy(child = fnCall("enum_ord",
          Seq(Literal(enumNameOf(child).get), stripImplicitCasts(child))))

      // min/max over an enum column: ordinal-space agg mapped back to
      // its label
      case ae @ org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
            mf, _, _, _, _)
          if (mf.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.Min] ||
            mf.isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.Max]) &&
            mf.children.length == 1 && mf.children.head.resolved &&
            enumNameOf(mf.children.head).isDefined => {
        val name = enumNameOf(mf.children.head).get
        val ord = fnCall("enum_ord",
          Seq(Literal(name), stripImplicitCasts(mf.children.head)))
        fnCall("enum_label_at",
          Seq(Literal(name), ae.copy(aggregateFunction =
            mf.withNewChildren(Seq(ord))
              .asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction])))
      }
    }

  private val inetAliases = Set("inet", "cidr")

  /** The pg.oid_alias of the attribute behind an expression (looking
    * through analyzer-inserted casts and aliases). */
  private def metaAliasOf(e: Expression): Option[String] = {
    val m = attrMeta(e)
    if (m.contains(PgType.OID_ALIAS_KEY)) Some(m.getString(PgType.OID_ALIAS_KEY))
    else None
  }

  /** The session enum type name of an enum-tagged column. */
  private def enumNameOf(e: Expression): Option[String] = {
    val m = attrMeta(e)
    if (m.contains("pg.enum")) Some(m.getString("pg.enum")) else None
  }

  private def attrMeta(e: Expression): Metadata = e match {
    case a: AttributeReference => a.metadata
    case Alias(c, _) => attrMeta(c)
    case c @ Cast(child, _, _, _) if notUserCast(c) => attrMeta(child)
    case _ => Metadata.empty
  }

  private def stripImplicitCasts(e: Expression): Expression = e match {
    case c @ Cast(child, _, _, _) if notUserCast(c) => stripImplicitCasts(child)
    case other => other
  }

  private def fnCall(name: String, args: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
      Seq(name), args, isDistinct = false)

  /** pg float4/float8 → text uses the Ryu-style output function
    * (shortest precise form: `1e3::text` = '1000', not '1000.0') —
    * the SAME renderer the wire codec uses for top-level floats. */
  case class PgFloatText(child: Expression, isFloat4: Boolean)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "pg_float_text"
    override def nullSafeEval(v: Any): Any =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        TextEncoder.formatFloat(
          if (isFloat4) v.asInstanceOf[Float].toDouble else v.asInstanceOf[Double],
          isFloat4))
    override protected def withNewChildInternal(c: Expression): PgFloatText =
      copy(child = c)
  }

  private def isImplicitBoolStr(e: Expression): Boolean = e match {
    case c @ Cast(b, StringType, _, _) =>
      b.resolved && b.dataType == BooleanType && notUserCast(c)
    case _ => false
  }

  private def pgBoolText(e: Expression): Expression = e match {
    case c @ Cast(b, StringType, _, _)
        if b.resolved && b.dataType == BooleanType && notUserCast(c) =>
      If(b, Literal("t"), Literal("f"))
    case other => other
  }

  // ---- unknown-literal coercion helpers (sweep-32) ----

  private def isStringLit(e: Expression): Boolean = e match {
    case Literal(_, StringType) => true
    case _ => false
  }

  private def litText(e: Expression): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
        if s != null => s.toString
    case Literal(null, StringType) => null
    case _ => null
  }

  /** The string LITERAL behind an operand — bare, or wrapped in an
    * ANALYZER-inserted cast (Spark's coercion may claim the unknown
    * before the pg rules see it). */
  private def implicitStrLit(e: Expression): Option[Expression] = e match {
    case l @ Literal(_, StringType) => Some(l)
    case c @ Cast(l @ Literal(_, StringType), _, _, _) if notUserCast(c) => Some(l)
    case _ => None
  }

  private def arrayAndStrLit(l: Expression, r: Expression): Boolean =
    (l.dataType.isInstanceOf[ArrayType] && isStringLit(r)) ||
      (isStringLit(l) && r.dataType.isInstanceOf[ArrayType])

  /** pg array_in over a literal: '{…}' text → a typed array literal
    * expression (re-parsed through the analyzer); anything else is
    * pg's malformed-array-literal. */
  private def pgArrayLiteralExpr(text: String, at: ArrayType): Expression = {
    if (text == null) return Literal(null, at)
    val t = text.trim
    if (!(t.startsWith("{") && t.endsWith("}")))
      throw PgException("22P02", s"""malformed array literal: "$text"""")
    var elem: DataType = at.elementType
    while (elem.isInstanceOf[ArrayType])
      elem = elem.asInstanceOf[ArrayType].elementType
    val sql = Compat.arrayLiteralSql(t, elem.sql)
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(sql)
  }

  private def castTo(e: Expression, dt: DataType): Expression =
    if (e.dataType == dt) e else Cast(e, dt)

  /** An interval operand, with a coercion-claimed unknown literal
    * rerouted through pg's interval input parser. */
  private def ivOperand(e: Expression): Expression =
    implicitStrLit(e)
      .map(graft.functions.PgFormatExpressions.PgIntervalLiteral(_))
      .getOrElse(e)

  /** A cast TAGGED user-specified so the implicit-literal rules never
    * re-match their own output (fixpoint safety). */
  private def taggedCast(e: Expression, dt: DataType): Expression = {
    val c = Cast(e, dt)
    c.setTagValue(Cast.USER_SPECIFIED_CAST, ())
    c
  }

  private def isTsType(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private def isIvType(dt: DataType): Boolean = dt match {
    case CalendarIntervalType | _: DayTimeIntervalType |
         _: YearMonthIntervalType => true
    case _ => false
  }

  private def mixedStrLit(children: Seq[Expression]): Boolean =
    children.exists(isStringLit) &&
      children.exists(c => !isStringLit(c) && c.dataType != StringType)

  /** Widest common type of the NON-string-literal arguments. */
  private def widerKnown(children: Seq[Expression]): Option[DataType] = {
    val known = children.filterNot(isStringLit).map(_.dataType).distinct
    known match {
      case Seq(one) => Some(one)
      case many if many.forall(_.isInstanceOf[NumericType]) =>
        // mixed numeric categories render through float8: pg's numeric
        // keeps PER-VALUE scale (greatest('1', 2.5, 3) prints "3"),
        // which a fixed-scale decimal column cannot reproduce — the
        // shortest-precise float text form can
        if (many.exists(t => t == DoubleType || t == FloatType) ||
          many.exists(_.isInstanceOf[DecimalType])) Some(DoubleType)
        else Some(LongType)
      case _ => None
    }
  }

  private def coerceStrLits(children: Seq[Expression]): Seq[Expression] = {
    val target = widerKnown(children).get
    children.map(c => if (isStringLit(c)) Cast(c, target) else c)
  }

  private val roundedTag = new TreeNodeTag[Unit]("graft.pg.roundedCast")
  private val truncNtzTag = new TreeNodeTag[Unit]("graft.pg.truncNtz")
  private val avgScaleTag = new TreeNodeTag[Unit]("graft.pg.avgScale")

  /** The BYTEA expression behind an argument, unwrapping the
    * analyzer's implicit binary→string cast. */
  private def byteaArg(e: Expression): Option[Expression] = e match {
    case c @ Cast(b, StringType, _, _)
        if b.resolved && b.dataType == BinaryType && notUserCast(c) => Some(b)
    case b if b.resolved && b.dataType == BinaryType => Some(b)
    case _ => None
  }

  /** Both interval-typed AND not a pair Spark's native ± supports —
    * a CalendarInterval side, or mixed year-month + day-time (pg
    * keeps the fields independent; Spark rejects the combination). */
  private def isIvPair(l: DataType, r: DataType): Boolean = {
    def iv(dt: DataType): Boolean = dt match {
      case CalendarIntervalType | _: DayTimeIntervalType |
           _: YearMonthIntervalType => true
      case _ => false
    }
    def ym(dt: DataType): Boolean = dt.isInstanceOf[YearMonthIntervalType]
    def dt0(dt: DataType): Boolean = dt.isInstanceOf[DayTimeIntervalType]
    iv(l) && iv(r) && !((ym(l) && ym(r)) || (dt0(l) && dt0(r)))
  }

  private def notUserCast(c: Cast): Boolean =
    c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def isFractional(t: DataType): Boolean = t match {
    case DoubleType | FloatType | _: DecimalType => true
    case _ => false
  }

  private def widerInt(a: DataType, b: DataType): DataType = {
    def rank(t: DataType): Int = t match {
      case ByteType => 0
      case ShortType => 1
      case IntegerType => 2
      case _ => 3
    }
    // pg's common division results: int⊗int → int4, anything with an
    // int8 side → int8 (int2/int2 → int2 in pg; int4 here renders
    // identically in text and keeps one wire OID for the common cases)
    if (rank(a) <= 2 && rank(b) <= 2) IntegerType else LongType
  }
}
