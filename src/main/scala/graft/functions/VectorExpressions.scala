package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Native Catalyst expressions for the vector hot path (SURVEY §0
  * LLM-pipeline ops). The similarity operators score candidate pairs
  * with integer dot products; as `zip_with` + `aggregate` higher-order
  * functions those run on the interpreted lambda path and allocate an
  * intermediate array per pair. These expressions participate in
  * whole-stage codegen (`doGenCode` emits a tight primitive loop, no
  * allocation), which is the preference order the engine is built on:
  * native expression > HOF > UDF.
  *
  * Semantics are pinned to the HOF formulation they replace (see
  * VectorExpressionsSpec for the bit-identical equivalence property):
  *  - NULL input array → NULL;
  *  - length mismatch → NULL (zip_with null-pads, and the sum of a
  *    null-padded product is NULL);
  *  - elements are assumed non-null (quantization output). A NULL
  *    element makes the product NULL, matching the HOF.
  *
  * Overflow: inputs are quantized to floor(x*1000)/floor(x*10000) longs
  * (see SimilarityOps), so products of unit-norm embedding components
  * stay far inside int64; the generated loop uses plain `*`/`+` and
  * does not re-check (ANSI overflow on genuinely unbounded input is the
  * caller's contract to keep).
  */
object VectorExpressions {

  /** Analysis-time input check shared by the expressions below:
    * every child must be ArrayType(elem) (any nullability).
    */
  private def checkArrayInputs(fn: String, children: Seq[Expression],
      elem: DataType): TypeCheckResult = {
    val bad = children.find(c => c.dataType match {
      case ArrayType(e, _) => e != elem
      case _ => true
    })
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$fn requires array<${elem.simpleString}> arguments, got ${c.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  /** Exact integer dot product over two ArrayType(LongType) columns. */
  case class VecLongDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayInputs(prettyName, Seq(left, right), LongType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "vec_ldot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var s = 0L
        var i = 0
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) return null
          s += x.getLong(i) * y.getLong(i)
          i += 1
        }
        s
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $s = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += $a.getLong($i) * $b.getLong($i);
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $s; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecLongDot =
      copy(left = newLeft, right = newRight)
  }

  /** Squared L2 norm of an ArrayType(LongType) column: vec_ldot(v, v)
    * without evaluating the child twice.
    */
  case class VecLongNorm2(child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayInputs(prettyName, Seq(child), LongType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "vec_lnorm2"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getLong(i)
        s += v * v
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val v = ctx.freshName("v")
        s"""
           |final int $n = $a.numElements();
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  final long $v = $a.getLong($i);
           |  $s += $v * $v;
           |}
           |if (!${ev.isNull}) { ${ev.value} = $s; }
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): VecLongNorm2 =
      copy(child = newChild)
  }

  /** Double-precision dot product over two ArrayType(FloatType)
    * columns (each element widened to double before multiply, matching
    * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, _+_)` on
    * float-cast-to-double columns). The non-quantized scoring baseline.
    */
  case class VecFloatDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      checkArrayInputs(prettyName, Seq(left, right), FloatType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "vec_fdot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var s = 0d
        var i = 0
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) return null
          s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
          i += 1
        }
        s
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0d;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $s; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecFloatDot =
      copy(left = newLeft, right = newRight)
  }

  /** (identifier, info, builder) triples for SparkSessionExtensions
    * `injectFunction` and for direct FunctionRegistry registration.
    */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n,
        s"$name requires exactly $n arguments, got ${args.length}")
      build(args)
    }

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("vec_ldot"),
        new ExpressionInfo(classOf[VecLongDot].getName, "vec_ldot"),
        arity("vec_ldot", 2)(args => VecLongDot(args(0), args(1)))),
      (FunctionIdentifier("vec_lnorm2"),
        new ExpressionInfo(classOf[VecLongNorm2].getName, "vec_lnorm2"),
        arity("vec_lnorm2", 1)(args => VecLongNorm2(args(0)))),
      (FunctionIdentifier("vec_fdot"),
        new ExpressionInfo(classOf[VecFloatDot].getName, "vec_fdot"),
        arity("vec_fdot", 2)(args => VecFloatDot(args(0), args(1)))))

  /** Optimizer rule: `vec_ldot(x, x)` → `vec_lnorm2(x)` whenever both
    * sides are semantically the same expression — the dot-with-self
    * shape evaluates its child twice (and, under whole-stage codegen,
    * materializes the quantized array twice); the norm form evaluates
    * it once. Injected via [[graft.GraftExtensions]], so any caller
    * writing the natural `vec_ldot(v, v)` gets the cheaper plan
    * without knowing vec_lnorm2 exists.
    */
  object SelfDotToNorm extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      plan.transformAllExpressions {
        case VecLongDot(a, b) if a.semanticEquals(b) => VecLongNorm2(a)
      }
  }

  /** Idempotently register on an already-built session (the extensions
    * route below is preferred when the caller controls the builder).
    * Skips names that already resolve, so operator-level install calls
    * on a long-lived session don't spam 'function replaced' warnings.
    */
  def install(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    descriptions.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
  }
}
