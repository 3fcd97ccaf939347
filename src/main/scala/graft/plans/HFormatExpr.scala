package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PvFunctions

/** F4 `hformat` (util.py:427-491) as a native Catalyst expression: the
  * fixed-width float format sits on every exported row, and a native
  * expression stays inside whole-stage codegen — no UDF closure, no
  * catalyst↔Scala value conversion, null-handling for free.
  *
  * Inputs are coerced by [[HFormatExpr.apply]]; the expression itself
  * expects (double, int).
  */
case class HFormatExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_hformat"

  override protected def nullSafeEval(value: Any, len: Any): Any =
    UTF8String.fromString(PvFunctions.hformat(value.asInstanceOf[Double], len.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, l) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PvFunctions$$.MODULE$$.hformat($v, $l))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HFormatExpr {

  /** Coercing builder used by the function registry. */
  def build(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"graft_hformat expects 2 arguments, got ${children.length}")
    HFormatExpr(
      Cast(children.head, DoubleType),
      Cast(children(1), IntegerType))
  }

  /** Column form for the DataFrame API (via the registered SQL function —
    * [[graft.Engine.tune]] or [[GraftExtensions]] must have run).
    */
  def hformat(value: Column, length: Column): Column =
    call_function("graft_hformat", value, length)
}
