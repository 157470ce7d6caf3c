package graft.etl

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused `normalize_value` as a single custom Catalyst Expression.
  *
  * The Column-chain form (NormalizeCol) re-evaluates the branch predicates
  * for every output column — ~5 regex passes per cell. This expression runs
  * the whole branch chain ONCE per cell and emits a struct
  * (branch, out_s, out_b, out_i, out_d) with identical semantics (same
  * DuckDB oracle passes on both). `doGenCode` emits a direct call into the
  * static kernel, so it participates in whole-stage codegen like Spark's own
  * regexp expressions (compiled patterns cached per JVM, no interpreter
  * fallback, no UDF serialization).
  */
case class NormalizeValue(child: Expression) extends UnaryExpression {

  override def dataType: DataType = NormalizeValue.schema
  override def nullable: Boolean = false
  override def prettyName: String = "normalize_value"

  override def eval(input: InternalRow): Any =
    NormalizeKernel.eval(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        InternalRow ${ev.value} = graft.etl.NormalizeKernel.eval(
          ${childGen.isNull} ? null : ${childGen.value});
        boolean ${ev.isNull} = false;
      """,
      isNull = ev.isNull, value = ev.value)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeValue =
    copy(child = newChild)
}

object NormalizeValue {
  val schema: StructType = StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("out_s", StringType, nullable = true),
    StructField("out_b", BooleanType, nullable = true),
    StructField("out_i", LongType, nullable = true),
    StructField("out_d", DoubleType, nullable = true)))

  /** Column builder. */
  def apply(c: Column): Column = Bridge.column(NormalizeValue(Bridge.expression(c)))

  /** SQL registration: `SELECT normalize_value(x).branch ...` */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerExpression(spark, "normalize_value", exprs => NormalizeValue(exprs.head))
}

/** The scalar kernel: one pass over the input string, precompiled patterns,
  * semantics identical to [[NormalizeCol]] (branch order from the reference,
  * backend/etl_pipeline.py:167-207).
  */
object NormalizeKernel {
  private val Percent = Pattern.compile(NormalizeCol.PercentRe)
  private val Email = Pattern.compile(NormalizeCol.EmailRe)
  private val Phone = Pattern.compile(NormalizeCol.PhoneRe)
  private val IntP = Pattern.compile(NormalizeCol.IntRe)
  private val FloatP = Pattern.compile(NormalizeCol.FloatRe)
  private val IsoDt = Pattern.compile(NormalizeCol.IsoDtRe)
  private val NonDigit = Pattern.compile("[^\\d]")
  private val NullTokens = NormalizeCol.NullTokens.toSet
  private val u = UTF8String.fromString _

  private def row(branch: String, s: String = null, b: java.lang.Boolean = null,
      i: java.lang.Long = null, d: java.lang.Double = null): InternalRow =
    InternalRow(u(branch), if (s == null) null else u(s), b, i, d)

  def eval(input: UTF8String): InternalRow = {
    if (input == null) return row("null")
    val raw = input.toString
    val t = raw.trim
    val l = t.toLowerCase(java.util.Locale.ROOT)
    if (NullTokens.contains(l)) return row("null")
    if (l == "true" || l == "yes" || l == "1") return row("bool_true", b = true)
    if (l == "false" || l == "no" || l == "0") return row("bool_false", b = false)
    val pm = Percent.matcher(t)
    if (pm.find()) return row("percent", d = pm.group(1).toDouble / 100.0)
    if (Email.matcher(t).find()) return row("email", s = l)
    if (Phone.matcher(t).find())
      return row("phone", s = NonDigit.matcher(t).replaceAll(""))
    val noCur = t.replace(",", "").replace("$", "").replace("₹", "").trim
    if (IntP.matcher(noCur).find()) {
      // branch stays "int" even when the value overflows long (the Column
      // form's cast yields null there too)
      val v: java.lang.Long =
        try java.lang.Long.valueOf(noCur.toLong)
        catch { case _: NumberFormatException => null }
      return row("int", i = v)
    }
    if (FloatP.matcher(noCur).find())
      try return row("float", d = noCur.toDouble)
      catch { case _: NumberFormatException => }
    if (IsoDt.matcher(t).find()) {
      val iso = t.replace(" ", "T")
      val norm = if (iso.endsWith("Z")) iso.dropRight(1) + "+00:00" else iso
      return row("date", s = norm)
    }
    row("str", s = l)
  }
}
