package graft.pgwire

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamedParameter, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{BinaryArithmetic, BinaryComparison, Cast, Expression, In, Like}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertIntoStatement, LogicalPlan}
import org.apache.spark.sql.types.DataType

/** Plan-walk `$N` parameter-type inference — the full version of the
  * reference's placeholder typing (reference:
  * datafusion-postgres/src/planner.rs:9-66, which combines DataFusion's
  * usage-context `get_parameter_types` with an explicit
  * `Cast(Placeholder)` sweep). Token-level `$N::type` casts are handled
  * cheaply in [[Compat.inferParamOids]]; this pass runs only when
  * parameters remain untyped, so an untyped JDBC `WHERE o_orderkey = $1`
  * still describes as INT8.
  *
  * Mechanism: rewrite `$N` to Spark named parameter markers `:gpN`,
  * parse (not analyze — analysis would fail on the unbound parameter),
  * then walk the unresolved plan for
  *  - `Cast(:gpN AS type)` → that type (strongest signal, wins),
  *  - comparisons / IN with a column on the other side → column type,
  *  - `UPDATE ... SET col = :gpN` assignments → column type,
  *  - `INSERT INTO t (cols) VALUES (... :gpN ...)` → target column type,
  * resolving column names against the schemas of the relations the
  * statement references.
  */
object ParamInfer {

  private val Marker = "gp"

  /** OIDs for `$1..$nParams`; 0 where nothing could be inferred. */
  def infer(spark: SparkSession, pgSql: String, nParams: Int): Seq[Int] = {
    if (nParams == 0) return Nil
    val out = new Array[Int](nParams)
    try {
      val plan = spark.sessionState.sqlParser.parsePlan(
        dollarsToMarkers(Compat.rewrite(pgSql)))
      val colType = columnTypes(spark, plan)

      def attrType(e: Expression): Option[DataType] = e match {
        case a: UnresolvedAttribute => colType.get(a.nameParts.last.toLowerCase)
        case c: Cast => Some(c.dataType)
        case _ => None
      }
      def record(i: Int, dt: DataType): Unit =
        if (i >= 0 && i < nParams && out(i) == 0) out(i) = PgType.oidOf(dt)

      // usage pass: comparisons, arithmetic, LIKE, IN lists, UPDATE
      // assignments, INSERT rows
      foreachExpr(plan) {
        case b: BinaryComparison =>
          (param(b.left), param(b.right)) match {
            case (Some(i), _) => attrType(b.right).foreach(record(i, _))
            case (_, Some(i)) => attrType(b.left).foreach(record(i, _))
            case _ =>
          }
        case b: BinaryArithmetic =>
          (param(b.left), param(b.right)) match {
            case (Some(i), _) => attrType(b.right).foreach(record(i, _))
            case (_, Some(i)) => attrType(b.left).foreach(record(i, _))
            case _ =>
          }
        case l: Like =>
          param(l.right).foreach(record(_, org.apache.spark.sql.types.StringType))
        case In(v, list) =>
          param(v).foreach(i => list.view.flatMap(attrType).headOption.foreach(record(i, _)))
          attrType(v).foreach(dt => list.flatMap(param).foreach(record(_, dt)))
        case a: Assignment =>
          param(a.value).foreach(i => attrType(a.key).foreach(record(i, _)))
        case _ =>
      }
      plan.foreach {
        case ins: InsertIntoStatement => inferInsert(spark, ins, record)
        case _ =>
      }
      // cast pass runs last and overrides usage (reference keeps a
      // casted_placeholders set with exactly this precedence)
      foreachExpr(plan) {
        case c: Cast => param(c.child).foreach { i =>
          if (i >= 0 && i < nParams) out(i) = PgType.oidOf(c.dataType)
        }
        case _ =>
      }
    } catch { case NonFatal(_) => /* non-query or unparseable: all 0 */ }
    out.toSeq
  }

  private def param(e: Expression): Option[Int] = e match {
    case NamedParameter(n) if n.startsWith(Marker) =>
      n.substring(Marker.length).toIntOption.map(_ - 1)
    case c: Cast => param(c.child) // $1::x compared to a column: still $1
    case _ => None
  }

  /** `$N` word tokens → `:gpN` named parameter markers. */
  private def dollarsToMarkers(sql: String): String =
    Compat.render(Compat.tokenize(sql).map { t =>
      if (t.kind == Compat.Word && t.text.matches("\\$\\d+"))
        t.copy(text = s":$Marker${t.text.substring(1)}")
      else t
    })

  private def foreachExpr(plan: LogicalPlan)(f: Expression => Unit): Unit =
    plan.foreach(node => node.expressions.foreach(_.foreach(f)))

  /** lowercase column name → type, over every relation the plan reads.
    * Schema-only lookups (parquet footer / view definition), no scans.
    * First binding wins on cross-table name collisions — same-named
    * columns that differ in type across tables are ambiguous anyway.
    */
  private def columnTypes(spark: SparkSession, plan: LogicalPlan): Map[String, DataType] = {
    val names = scala.collection.mutable.LinkedHashSet.empty[String]
    plan.foreach {
      case r: UnresolvedRelation => names += r.multipartIdentifier.mkString(".")
      case ins: InsertIntoStatement => ins.table.foreach {
        case r: UnresolvedRelation => names += r.multipartIdentifier.mkString(".")
        case _ =>
      }
      case _ =>
    }
    val m = scala.collection.mutable.Map.empty[String, DataType]
    names.foreach { n =>
      try spark.table(n).schema.fields.foreach { f =>
        val k = f.name.toLowerCase
        if (!m.contains(k)) m(k) = f.dataType
      } catch { case NonFatal(_) => }
    }
    m.toMap
  }

  /** `INSERT INTO t (a, b) VALUES ($1, $2)`: positional map of VALUES
    * cells to target columns. */
  private def inferInsert(spark: SparkSession, ins: InsertIntoStatement,
      record: (Int, DataType) => Unit): Unit = {
    val tableSchema = ins.table match {
      case r: UnresolvedRelation =>
        try spark.table(r.multipartIdentifier.mkString(".")).schema
        catch { case NonFatal(_) => return }
      case _ => return
    }
    val targets: Seq[DataType] =
      if (ins.userSpecifiedCols.nonEmpty)
        ins.userSpecifiedCols.map(c =>
          tableSchema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType).orNull)
      else tableSchema.fields.toSeq.map(_.dataType)
    // VALUES rows parse to an inline table; map cells to target columns
    ins.query.collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedInlineTable =>
        u.rows.foreach { row =>
          row.zipWithIndex.foreach { case (cell, ci) =>
            param(cell).foreach { pi =>
              if (ci < targets.length && targets(ci) != null) record(pi, targets(ci))
            }
          }
        }
    }
  }
}
