package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C4/ftfy-lite text normalization as a native Catalyst expression — the
  * first pass of every text-curation pipeline, run on every document, so it
  * gets the same whole-stage-codegen treatment as F4/F11:
  *
  *  1. Unicode NFC composition (Java and utf8proc implement the same
  *     Unicode normalization spec, so results are engine-reproducible);
  *  2. control/format characters (`\p{Cc}\p{Cf}` — tabs, newlines, zero-
  *     width joiners, BOMs) become spaces;
  *  3. space runs collapse to one; leading/trailing space trimmed.
  *
  * Deliberately NOT locale-dependent (no case folding) and NOT lossy
  * beyond layout (no punctuation stripping) — those are scoring concerns,
  * not normalization.
  */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override protected def nullSafeEval(text: Any): Any =
    UTF8String.fromString(
      NormalizeTextExpr.normalizeString(text.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(graft.plans.NormalizeTextExpr$.MODULE$" +
        s".normalizeString($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeTextExpr {

  private val controlOrFormat = Pattern.compile("[\\p{Cc}\\p{Cf}]")
  private val spaceRuns = Pattern.compile(" +")

  def normalizeString(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val spaced = controlOrFormat.matcher(nfc).replaceAll(" ")
    spaceRuns.matcher(spaced).replaceAll(" ").trim
  }

  /** Coercing builder used by the function registry. */
  def build(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"graft_normalize_text expects 1 argument, got ${children.length}")
    NormalizeTextExpr(Cast(children.head, StringType))
  }

  /** Column form (requires [[GraftExtensions]] /
    * [[graft.Engine.registerFunctions]] to have run).
    */
  def normalizeText(text: Column): Column = call_function("graft_normalize_text", text)
}
