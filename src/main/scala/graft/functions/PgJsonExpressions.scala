package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL JSON function pack — the largest remaining block of the
  * reference's hand-maintained roadmap (67 functions, ALL marked
  * "Blocked: no JSON/JSONB type in DataFusion" in
  * datafusion-pg-functions/functions.md §functions-json; src/json.rs
  * is an empty stub). Clients hit json_build_object / row_to_json /
  * jsonb_extract_path / json_array_elements constantly, so this is
  * parity-plus: semantics implemented from the public PostgreSQL docs
  * (Functions and Operators §9.16).
  *
  * Representation: JSON values travel as TEXT (Spark has no JSON
  * type either — same position as the reference's engine). Rendering
  * is COMPACT (RFC-style, `{"a":1}`): pg's `json` type preserves
  * cosmetic whitespace (`{"a" : 1}` from json_build_object) while
  * `jsonb` normalizes; we normalize everywhere — the jsonb convention
  * — as the documented deviation.
  *
  * Parsing uses the Jackson shipped inside the Spark distribution;
  * object key order is preserved (pg json/DuckDB behavior). Invalid
  * JSON input errors, matching pg's "invalid input syntax for type
  * json".
  */
object PgJsonExpressions {

  // ObjectMapper is thread-safe after configuration
  private val mapper = new ObjectMapper()

  private[functions] def parse(s: String): JsonNode =
    try mapper.readTree(s)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"invalid input syntax for type json: ${e.getMessage}")
    }

  // ---- pg-style compact rendering of Catalyst values ---------------------

  private def escapeTo(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Render a Catalyst-internal value of `dt` as compact JSON. */
  private[functions] def render(sb: java.lang.StringBuilder, v: Any, dt: DataType): Unit = {
    if (v == null) { sb.append("null"); return }
    dt match {
      case StringType => escapeTo(sb, v.asInstanceOf[UTF8String].toString)
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
        sb.append(v.toString)
      case _: DecimalType => sb.append(v.asInstanceOf[Decimal].toJavaBigDecimal.toPlainString)
      case DateType =>
        val f = PgFormat.DtF.fromEpochDay(v.asInstanceOf[Int].toLong)
        sb.append('"').append(f"${f.year}%04d-${f.month}%02d-${f.day}%02d").append('"')
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < a.numElements()) {
          if (i > 0) sb.append(',')
          render(sb, if (a.isNullAt(i)) null else a.get(i, et), et)
          i += 1
        }
        sb.append(']')
      case st: StructType =>
        val row = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        sb.append('{')
        var i = 0
        while (i < st.length) {
          if (i > 0) sb.append(',')
          escapeTo(sb, st(i).name)
          sb.append(':')
          render(sb, if (row.isNullAt(i)) null else row.get(i, st(i).dataType), st(i).dataType)
          i += 1
        }
        sb.append('}')
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        sb.append('{')
        val ks = m.keyArray(); val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(',')
          val k = ks.get(i, kt)
          escapeTo(sb, if (k == null) "null" else k.toString)
          sb.append(':')
          render(sb, if (vs.isNullAt(i)) null else vs.get(i, vt), vt)
          i += 1
        }
        sb.append('}')
      case other => throw new IllegalArgumentException(
        s"json rendering does not support ${other.simpleString}")
    }
  }

  private def supported(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | NullType => true
    case _: DecimalType => true
    case ArrayType(et, _) => supported(et)
    case st: StructType => st.fields.forall(f => supported(f.dataType))
    case MapType(_, vt, _) => supported(vt)
    case _ => false
  }

  // ---- scalar expressions ------------------------------------------------

  /** json_build_object(k1, v1, ...) — alternating keys and values.
    * NULL keys error (pg: "argument N cannot be null"). */
  case class PgJsonBuildObject(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "json_build_object"

    override def checkInputDataTypes(): TypeCheckResult =
      if (children.length % 2 != 0)
        TypeCheckResult.TypeCheckFailure(
          "json_build_object requires an even number of arguments")
      else if (!children.forall(c => supported(c.dataType)))
        TypeCheckResult.TypeCheckFailure("json_build_object: unsupported argument type")
      else TypeCheckResult.TypeCheckSuccess

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val sb = new java.lang.StringBuilder(64)
      sb.append('{')
      var i = 0
      while (i < children.length) {
        if (i > 0) sb.append(',')
        val k = children(i).eval(input)
        if (k == null) throw new IllegalArgumentException(
          s"json_build_object: argument ${i + 1} cannot be null")
        val kStr = children(i).dataType match {
          case StringType => k.asInstanceOf[UTF8String].toString
          case _ => k.toString
        }
        escapeTo(sb, kStr)
        sb.append(':')
        render(sb, children(i + 1).eval(input), children(i + 1).dataType)
        i += 2
      }
      sb.append('}')
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): PgJsonBuildObject = copy(children = newChildren)
  }

  /** json_build_array(v1, v2, ...). */
  case class PgJsonBuildArray(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "json_build_array"

    override def checkInputDataTypes(): TypeCheckResult =
      if (!children.forall(c => supported(c.dataType)))
        TypeCheckResult.TypeCheckFailure("json_build_array: unsupported argument type")
      else TypeCheckResult.TypeCheckSuccess

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val sb = new java.lang.StringBuilder(64)
      sb.append('[')
      var i = 0
      while (i < children.length) {
        if (i > 0) sb.append(',')
        render(sb, children(i).eval(input), children(i).dataType)
        i += 1
      }
      sb.append(']')
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): PgJsonBuildArray = copy(children = newChildren)
  }

  /** row_to_json(record) — render a struct with its field names. */
  case class PgRowToJson(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "row_to_json"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case st: StructType if supported(st) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("row_to_json(record)")
    }

    override def nullSafeEval(v: Any): Any = {
      val sb = new java.lang.StringBuilder(64)
      render(sb, v, child.dataType)
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildInternal(c: Expression): PgRowToJson = copy(child = c)
  }

  /** Walk `path` elements through a parsed tree: object fields by
    * name, array elements by integer index. Null when absent (pg). */
  private def walk(root: JsonNode, path: Seq[String]): JsonNode = {
    var node = root
    var i = 0
    while (i < path.length) {
      if (node == null) return null
      if (node.isObject) node = node.get(path(i))
      else if (node.isArray) {
        val idx =
          try path(i).trim.toInt
          catch { case _: NumberFormatException => return null }
        node = if (idx >= 0 && idx < node.size()) node.get(idx) else null
      } else return null
      i += 1
    }
    node
  }

  /** json_extract_path[_text](json, VARIADIC path). `text=false`
    * returns the element as json text; `text=true` unquotes strings
    * and maps json null to SQL NULL (pg's ->>/#>> semantics). */
  case class PgJsonExtractPath(children: Seq[Expression], text: Boolean)
      extends Expression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String =
      if (text) "json_extract_path_text" else "json_extract_path"

    override def checkInputDataTypes(): TypeCheckResult =
      if (children.isEmpty || !children.forall(_.dataType == StringType))
        TypeCheckResult.TypeCheckFailure(s"$prettyName(json, text...)")
      else TypeCheckResult.TypeCheckSuccess

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val j = children.head.eval(input)
      if (j == null) return null
      val path = new Array[String](children.length - 1)
      var i = 1
      while (i < children.length) {
        val p = children(i).eval(input)
        if (p == null) return null
        path(i - 1) = p.asInstanceOf[UTF8String].toString
        i += 1
      }
      val node = walk(parse(j.asInstanceOf[UTF8String].toString), path.toSeq)
      if (node == null || (text && node.isNull)) null
      else if (text && node.isTextual) UTF8String.fromString(node.textValue())
      else UTF8String.fromString(node.toString)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): PgJsonExtractPath = copy(children = newChildren)
  }

  /** json_typeof(json) → object|array|string|number|boolean|null. */
  case class PgJsonTypeof(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "json_typeof"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("json_typeof(json)")

    override def nullSafeEval(v: Any): Any = {
      val node = parse(v.asInstanceOf[UTF8String].toString)
      val t =
        if (node.isObject) "object"
        else if (node.isArray) "array"
        else if (node.isTextual) "string"
        else if (node.isNumber) "number"
        else if (node.isBoolean) "boolean"
        else "null"
      UTF8String.fromString(t)
    }

    override protected def withNewChildInternal(c: Expression): PgJsonTypeof = copy(child = c)
  }

  /** json_array_elements[_text](json) → the elements as text[]; the
    * pg original is set-returning — Compat rewrites the call to
    * explode(json_array_elements(x)). Non-arrays error like pg. */
  case class PgJsonArrayElements(child: Expression, text: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String =
      if (text) "json_array_elements_text" else "json_array_elements"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName(json)")

    override def nullSafeEval(v: Any): Any = {
      val node = parse(v.asInstanceOf[UTF8String].toString)
      if (!node.isArray) throw new IllegalArgumentException(
        s"cannot extract elements from a ${if (node.isObject) "object" else "scalar"}")
      val out = new Array[Any](node.size())
      var i = 0
      while (i < node.size()) {
        val e = node.get(i)
        out(i) =
          if (text && e.isNull) null
          else if (text && e.isTextual) UTF8String.fromString(e.textValue())
          else UTF8String.fromString(e.toString)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): PgJsonArrayElements =
      copy(child = c)
  }

  /** JSON-quote a string (for aggregate key rendering). */
  def jsonQuote(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    escapeTo(sb, s)
    sb.toString
  }

  /** to_jsonb(anyelement): any supported value rendered as compact
    * json text; SQL NULL → SQL NULL (pg). Named to_jsonb, NOT to_json:
    * Spark's own to_json(struct|map|array) keeps its native meaning —
    * for record inputs use row_to_json. */
  case class PgToJsonb(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "to_jsonb"

    override def checkInputDataTypes(): TypeCheckResult =
      if (supported(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"to_jsonb: unsupported type ${child.dataType.simpleString}")

    override def nullSafeEval(v: Any): Any = {
      val sb = new java.lang.StringBuilder(32)
      render(sb, v, child.dataType)
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildInternal(c: Expression): PgToJsonb = copy(child = c)
  }

  /** json_strip_nulls(json): remove null-valued OBJECT fields at every
    * depth; array nulls are kept (pg semantics). */
  case class PgJsonStripNulls(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "json_strip_nulls"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("json_strip_nulls(json)")

    private def strip(node: JsonNode): Unit = node match {
      case o: ObjectNode =>
        val it = o.fields()
        val dead = new java.util.ArrayList[String]()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isNull) dead.add(e.getKey)
          else strip(e.getValue)
        }
        dead.forEach(k => { o.remove(k); () })
      case a: ArrayNode =>
        var i = 0
        while (i < a.size()) { strip(a.get(i)); i += 1 }
      case _ =>
    }

    override def nullSafeEval(v: Any): Any = {
      val node = parse(v.asInstanceOf[UTF8String].toString)
      strip(node)
      UTF8String.fromString(node.toString)
    }

    override protected def withNewChildInternal(c: Expression): PgJsonStripNulls =
      copy(child = c)
  }

  /** pg jsonb containment (`@>`), from the documented §8.14.3 rules:
    * objects contain every RHS key with a containing value, arrays
    * contain every RHS element in some LHS element, scalars compare
    * equal — with pg's special exception that a top-level array
    * contains a top-level scalar. */
  /** jsonb equality: numbers compare numerically (pg jsonb: 1 = 1.0),
    * everything else by structural equality. */
  private def nodeEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNumber && b.isNumber) a.decimalValue.compareTo(b.decimalValue) == 0
    else a == b

  private[functions] def jsonContains(h: JsonNode, n: JsonNode, top: Boolean): Boolean = {
    if (h.isObject && n.isObject) {
      val it = n.fields()
      var ok = true
      while (ok && it.hasNext) {
        val e = it.next()
        val hv = h.get(e.getKey)
        ok = hv != null && jsonContains(hv, e.getValue, top = false)
      }
      ok
    } else if (h.isArray && n.isArray) {
      var ok = true
      var i = 0
      while (ok && i < n.size()) {
        val e = n.get(i)
        var found = false
        var j = 0
        while (!found && j < h.size()) {
          val x = h.get(j)
          found =
            if (e.isObject || e.isArray) x.getNodeType == e.getNodeType &&
              jsonContains(x, e, top = false)
            else nodeEq(x, e)
          j += 1
        }
        ok = found
        i += 1
      }
      ok
    } else if (h.isArray && !n.isContainerNode && top) {
      // top-level special exception: array contains scalar
      var found = false
      var j = 0
      while (!found && j < h.size()) { found = nodeEq(h.get(j), n); j += 1 }
      found
    } else nodeEq(h, n)
  }

  /** pg_contains(l, r): pg's `@>` for BOTH meanings — anyarray @>
    * anyarray (every RHS element appears in LHS) and jsonb @> jsonb
    * (structural containment). The wire operator rewrite cannot see
    * types, so this expression dispatches on the analyzed input type. */
  case class PgContains(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "pg_contains"

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if a == b => TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pg_contains(anyarray, anyarray) or pg_contains(json, json)")
    }

    override def nullSafeEval(l: Any, r: Any): Any = left.dataType match {
      case ArrayType(et, _) =>
        val h = l.asInstanceOf[ArrayData]
        val n = r.asInstanceOf[ArrayData]
        var ok = true
        var i = 0
        while (ok && i < n.numElements()) {
          val e = if (n.isNullAt(i)) null else n.get(i, et)
          var found = false
          var j = 0
          while (!found && j < h.numElements()) {
            val x = if (h.isNullAt(j)) null else h.get(j, et)
            found = (x == null && e == null) || (x != null && x == e)
            j += 1
          }
          ok = found
          i += 1
        }
        ok
      case _ =>
        jsonContains(parse(l.asInstanceOf[UTF8String].toString),
          parse(r.asInstanceOf[UTF8String].toString), top = true)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): PgContains =
      copy(left = l, right = r)
  }

  /** jsonb_exists(json, key) — pg's `?`: object has the key, array
    * has the string element, or a string scalar equals it. */
  case class PgJsonbExists(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "jsonb_exists"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("jsonb_exists(json, text)")

    override def nullSafeEval(l: Any, r: Any): Any = {
      val node = parse(l.asInstanceOf[UTF8String].toString)
      val key = r.asInstanceOf[UTF8String].toString
      if (node.isObject) node.has(key)
      else if (node.isArray) {
        var found = false
        var i = 0
        while (!found && i < node.size()) {
          found = node.get(i).isTextual && node.get(i).textValue() == key
          i += 1
        }
        found
      } else node.isTextual && node.textValue() == key
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): PgJsonbExists =
      copy(left = l, right = r)
  }

  // ---- registration ------------------------------------------------------

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(PgJsonExpressions.getClass.getName, name)

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("json_build_object"), info("json_build_object"),
      (args: Seq[Expression]) => PgJsonBuildObject(args)),
    (FunctionIdentifier("jsonb_build_object"), info("jsonb_build_object"),
      (args: Seq[Expression]) => PgJsonBuildObject(args)),
    (FunctionIdentifier("json_build_array"), info("json_build_array"),
      (args: Seq[Expression]) => PgJsonBuildArray(args)),
    (FunctionIdentifier("jsonb_build_array"), info("jsonb_build_array"),
      (args: Seq[Expression]) => PgJsonBuildArray(args)),
    (FunctionIdentifier("row_to_json"), info("row_to_json"),
      (args: Seq[Expression]) => { require(args.length == 1); PgRowToJson(args.head) }),
    (FunctionIdentifier("json_extract_path"), info("json_extract_path"),
      (args: Seq[Expression]) => PgJsonExtractPath(args, text = false)),
    (FunctionIdentifier("jsonb_extract_path"), info("jsonb_extract_path"),
      (args: Seq[Expression]) => PgJsonExtractPath(args, text = false)),
    (FunctionIdentifier("json_extract_path_text"), info("json_extract_path_text"),
      (args: Seq[Expression]) => PgJsonExtractPath(args, text = true)),
    (FunctionIdentifier("jsonb_extract_path_text"), info("jsonb_extract_path_text"),
      (args: Seq[Expression]) => PgJsonExtractPath(args, text = true)),
    (FunctionIdentifier("json_typeof"), info("json_typeof"),
      (args: Seq[Expression]) => { require(args.length == 1); PgJsonTypeof(args.head) }),
    (FunctionIdentifier("jsonb_typeof"), info("jsonb_typeof"),
      (args: Seq[Expression]) => { require(args.length == 1); PgJsonTypeof(args.head) }),
    (FunctionIdentifier("json_array_elements"), info("json_array_elements"),
      (args: Seq[Expression]) => { require(args.length == 1)
        PgJsonArrayElements(args.head, text = false) }),
    (FunctionIdentifier("json_array_elements_text"), info("json_array_elements_text"),
      (args: Seq[Expression]) => { require(args.length == 1)
        PgJsonArrayElements(args.head, text = true) }),
    (FunctionIdentifier("pg_contains"), info("pg_contains"),
      (args: Seq[Expression]) => { require(args.length == 2); PgContains(args(0), args(1)) }),
    (FunctionIdentifier("jsonb_contains"), info("jsonb_contains"),
      (args: Seq[Expression]) => { require(args.length == 2); PgContains(args(0), args(1)) }),
    (FunctionIdentifier("pg_contained"), info("pg_contained"),
      (args: Seq[Expression]) => { require(args.length == 2); PgContains(args(1), args(0)) }),
    (FunctionIdentifier("jsonb_exists"), info("jsonb_exists"),
      (args: Seq[Expression]) => { require(args.length == 2); PgJsonbExists(args(0), args(1)) }),
    (FunctionIdentifier("to_jsonb"), info("to_jsonb"),
      (args: Seq[Expression]) => { require(args.length == 1); PgToJsonb(args.head) }),
    (FunctionIdentifier("json_strip_nulls"), info("json_strip_nulls"),
      (args: Seq[Expression]) => { require(args.length == 1); PgJsonStripNulls(args.head) }),
    (FunctionIdentifier("jsonb_strip_nulls"), info("jsonb_strip_nulls"),
      (args: Seq[Expression]) => { require(args.length == 1); PgJsonStripNulls(args.head) }))
  // json_array_length and json_object_keys are Spark builtins with the
  // same names and compatible semantics — not re-registered here.

  def install(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    descriptions.foreach { case (ident, i, builder) =>
      reg.registerFunction(ident, i, builder)
    }
  }
}
