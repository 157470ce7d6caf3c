package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 canonicalization as a native codegen'd Expression: URL
  * normalization is the first projection of every frontier job (dedup by
  * canonical URL runs on EVERY crawled row), so it earns the same
  * treatment as [[Hash60]] — a static kernel call emitted inside
  * whole-stage codegen instead of a typed map that would break the stage
  * in two and force row serialization around it. Value-identical to
  * [[Url.canonicalize]] (UrlExprSpec pins the equality on the url01 mess
  * classes and on fuzz strings).
  */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_canonicalize"

  override protected def nullSafeEval(input: Any): Any =
    UrlKernel.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.UrlKernel.canonicalize($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

object UrlCanonicalize {
  def apply(c: Column): Column =
    Bridge.column(UrlCanonicalize(Bridge.expression(c.cast("string"))))
}

object UrlKernel {
  /** UTF8String bridge for codegen call sites. */
  def canonicalize(s: UTF8String): UTF8String =
    UTF8String.fromString(Url.canonicalize(s.toString))
}
