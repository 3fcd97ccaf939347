package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PvFunctions

/** F11 `hashname` (archiver.py:25-32) as a native Catalyst expression: the
  * sha256→base64→charsum bucket hash runs on EVERY ingested row
  * ([[graft.store.SampleStore.normalize]]), and a native expression stays
  * inside whole-stage codegen — no UDF closure serialization, no
  * catalyst↔Scala row conversion, null-handling for free. Same treatment
  * F4 got in [[HFormatExpr]].
  */
case class HashNameExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hashname"

  override protected def nullSafeEval(name: Any): Any =
    PvFunctions.hashname(name.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PvFunctions$$.MODULE$$.hashname($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashNameExpr {

  /** Coercing builder used by the function registry. */
  def build(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"graft_hashname expects 1 argument, got ${children.length}")
    HashNameExpr(Cast(children.head, StringType))
  }

  /** Column form for the DataFrame API (via the registered SQL function —
    * [[graft.Engine.tune]] or [[GraftExtensions]] must have run).
    */
  def hashname(name: Column): Column = call_function("graft_hashname", name)
}
