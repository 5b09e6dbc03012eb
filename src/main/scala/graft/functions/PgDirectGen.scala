package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, EmptyBlock, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Direct-call whole-stage codegen for variadic pg expressions.
  *
  * `CodegenFallback` disqualifies the ENTIRE enclosing physical
  * operator from whole-stage codegen (`CollapseCodegenStages.
  * supportCodegen` rejects any plan whose expressions contain one), so
  * a projection mixing one pg JSON call with ordinary arithmetic runs
  * every expression through the interpreted path and loses fusion
  * with the scan/sort around it. This trait instead emits a real
  * `doGenCode`: children are evaluated by the surrounding generated
  * code (staying fused), their values are boxed into one `Object[]`,
  * and a single virtual call lands in [[evalVals]]. Same move as
  * `PgFormatExpressions.genDirect` (round 7, −2.3 s on to_char), but
  * arity-generic so the `Seq[Expression]`-children JSON family can use
  * it. Implementors define [[evalVals]] — including its own null
  * semantics, since pg's JSON builders treat NULL arguments as values
  * while the STRICT functions return NULL — and inherit `eval`.
  */
trait PgVariadicDirectGen extends Expression {

  /** Evaluate over already-evaluated child values (entries may be
    * null). Called per row from both interpreted and generated code. */
  def evalVals(vs: Array[Any]): Any

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val vs = new Array[Any](n)
    var i = 0
    while (i < n) { vs(i) = children(i).eval(input); i += 1 }
    evalVals(vs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pgExpr", this, classOf[PgVariadicDirectGen].getName)
    val gens = children.map(_.genCode(ctx))
    val arr = ctx.freshName("pgArgs")
    val res = ctx.freshName("pgRes")
    val boxed = CodeGenerator.boxedType(dataType)
    val unbox = dataType match {
      case LongType | TimestampType | TimestampNTZType => ".longValue()"
      case IntegerType | DateType => ".intValue()"
      case DoubleType => ".doubleValue()"
      case FloatType => ".floatValue()"
      case BooleanType => ".booleanValue()"
      case ShortType => ".shortValue()"
      case ByteType => ".byteValue()"
      case _ => ""
    }
    val childCode = gens.map(_.code).foldLeft[
      org.apache.spark.sql.catalyst.expressions.codegen.Block](EmptyBlock)(_ + _)
    val setArgs = gens.zipWithIndex.map { case (g, i) =>
      s"$arr[$i] = ${g.isNull} ? null : (Object) ${g.value};"
    }.mkString("\n")
    val javaType = CodeGenerator.javaType(dataType)
    if (nullable) {
      ev.copy(code = childCode + code"""
        |Object[] $arr = new Object[${children.length}];
        |$setArgs
        |Object $res = $ref.evalVals($arr);
        |boolean ${ev.isNull} = ($res == null);
        |$javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        |if (!${ev.isNull}) { ${ev.value} = (($boxed) $res)$unbox; }""".stripMargin)
    } else {
      ev.copy(code = childCode + code"""
        |Object[] $arr = new Object[${children.length}];
        |$setArgs
        |$javaType ${ev.value} = (($boxed) $ref.evalVals($arr))$unbox;""".stripMargin,
        isNull = FalseLiteral)
    }
  }
}

/** Fixed-arity delegators: a `UnaryExpression`/`BinaryExpression`
  * whose logic lives in `nullSafeEval` gets direct-call codegen by
  * swapping `CodegenFallback` for one of these — null-strict like the
  * base class's interpreted `eval`. */
trait PgUnaryDirectGen extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with PgVariadicDirectGen {
  override def evalVals(vs: Array[Any]): Any =
    if (vs(0) == null) null else nullSafeEval(vs(0))
}

trait PgBinaryDirectGen extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with PgVariadicDirectGen {
  override def evalVals(vs: Array[Any]): Any =
    if (vs(0) == null || vs(1) == null) null else nullSafeEval(vs(0), vs(1))
}

trait PgTernaryDirectGen extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with PgVariadicDirectGen {
  override def evalVals(vs: Array[Any]): Any =
    if (vs(0) == null || vs(1) == null || vs(2) == null) null
    else nullSafeEval(vs(0), vs(1), vs(2))
}
