package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.export.LightFormatter

/** Codegen'd Catalyst expression wrapping
  * [[graft.export.LightFormatter.render]] (reference exporter E9,
  * exporter.py:45-91) so light formatting can run inside whole-stage
  * codegen instead of as an opaque Scala UDF: no extra serialization,
  * stays in the same generated loop as the surrounding projections.
  */
// input type is enforced by callers (we only apply it to string cols);
// ExpectsInputTypes is not accessible outside org.apache.spark.sql
case class RenderLightMarkdown(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      LightFormatter.render(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.export.LightFormatter.render($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): RenderLightMarkdown = copy(child = newChild)

  override def prettyName: String = "render_light_md"
}

object RenderLightMarkdown {

  /** Register as a SQL/callable function so DataFrame code can use
    * `call_function("render_light_md", col)` without touching
    * Column internals. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "render_light_md",
      (exprs: Seq[Expression]) => RenderLightMarkdown(exprs.head),
      "built-in")
}
