package graft.etl

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused `infer_type` as a single custom Catalyst Expression — the hot
  * path behind [[NormalizeCol.inferType]] (reference semantics:
  * backend/etl_pipeline.py:209-218 + the dateutil vote).
  *
  * The Column-chain form ([[NormalizeCol.inferTypeColumnChain]]) spells
  * the identical logic declaratively, but its 8-step `regexp_replace`
  * jump-token chain pays an UTF8String→String→UTF8String round-trip and
  * a fresh Matcher per step per row — ~40 µs for every date-shaped cell
  * at sf0.1 (the round-9 etl02 regression's floor). This kernel runs the
  * whole decision in ONE Java pass over the cell with precompiled
  * patterns: trim → integer/float/boolean probes → charset gate →
  * jump-token normalization → prefix-gated date battery
  * (`InferDateMainRe`, then `TimeFirstRe` only behind the cheap clock
  * gate). `doGenCode` emits a direct static call, so it rides inside
  * whole-stage codegen like Spark's own regexp expressions.
  *
  * Semantics are pinned three ways: InferTypeSpec replays the fused
  * kernel against the Column chain cell-for-cell on the parity corpus,
  * DateParitySpec pins the gated split ≡ the union battery, and the
  * etl02/etl03/etl17 oracles diff the end result against DuckDB running
  * [[NormalizeCol.sqlInferType]].
  */
case class InferTypeTag(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "infer_type"

  override def eval(input: InternalRow): Any =
    InferTypeKernel.tag(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = graft.etl.InferTypeKernel.tag(
          ${childGen.isNull} ? null : ${childGen.value});
        boolean ${ev.isNull} = false;
      """,
      isNull = ev.isNull, value = ev.value)
  }

  override protected def withNewChildInternal(newChild: Expression): InferTypeTag =
    copy(child = newChild)
}

object InferTypeTag {
  def apply(c: Column): Column = Bridge.column(InferTypeTag(Bridge.expression(c)))

  /** SQL registration: `SELECT infer_type(x)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerExpression(spark, "infer_type", exprs => InferTypeTag(exprs.head))
}

/** Scalar kernel. Every probe uses `find()` on an anchored pattern —
  * `rlike` semantics, where `$` also matches before a trailing line
  * terminator — and trimming strips ' ' only, mirroring Spark's `trim`.
  */
object InferTypeKernel {
  private val IntP = Pattern.compile("^\\d+$")
  private val FloatP = Pattern.compile("^\\d*\\.\\d+$")
  private val CharsetP = Pattern.compile(NormalizeCol.CharsetGateRe)
  private val MainP = Pattern.compile(NormalizeCol.InferDateMainRe)
  private val GateP = Pattern.compile(NormalizeCol.TimeFirstGateRe)
  private val TimeFirstP = Pattern.compile(NormalizeCol.TimeFirstRe)

  // the voteNormalizeCol chain, step for step (regexp_replace replaces
  // ALL occurrences, so replaceAll throughout; the anchored weekday strip
  // makes all ≡ first there)
  private val Ws = Pattern.compile("\\s+")
  private val TailJumps = Pattern.compile("( ?[.,])+$")
  private val Weekday = Pattern.compile(NormalizeCol.WeekdayStripRe)
  private val Ordinal = Pattern.compile(NormalizeCol.OrdinalStripRe)
  private val QuoteDD = Pattern.compile("(\\d)'+(\\d)")
  private val QuoteLead = Pattern.compile("(^| )'+(\\d)")
  private val QuoteAD = Pattern.compile("([A-Za-z])'+(\\d)")
  private val QuoteDA = Pattern.compile("(\\d)'+([A-Za-z])")

  private val TagNull = UTF8String.fromString("null")
  private val TagInt = UTF8String.fromString("integer")
  private val TagFloat = UTF8String.fromString("float")
  private val TagBool = UTF8String.fromString("boolean")
  private val TagDate = UTF8String.fromString("date")
  private val TagString = UTF8String.fromString("string")

  /** Spark `trim`: ASCII space only. */
  private def trimSpaces(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  def tag(v: UTF8String): UTF8String =
    if (v == null) TagNull else tagOf(v.toString)

  /** Scalar entry for JVM-side mirrors (ProfileBuffer.rawTag): identical
    * decision chain, returned as the interned tag's String.
    */
  def tagString(v: String): String =
    if (v == null) "null" else tagOf(v).toString

  private def tagOf(s0: String): UTF8String = {
    val t = trimSpaces(s0)
    if (t.isEmpty) return TagNull
    if (IntP.matcher(t).find()) return TagInt
    if (FloatP.matcher(t).find()) return TagFloat
    val lower = t.toLowerCase(java.util.Locale.ROOT)
    if (lower == "true" || lower == "false") return TagBool
    if (CharsetP.matcher(t).find()) {
      var s = Ws.matcher(t).replaceAll(" ")
      s = TailJumps.matcher(s).replaceAll("")
      s = Weekday.matcher(s).replaceAll("")
      s = Ordinal.matcher(s).replaceAll("$1")
      s = QuoteDD.matcher(s).replaceAll("$1/$2")
      s = QuoteLead.matcher(s).replaceAll("$1$2")
      s = QuoteAD.matcher(s).replaceAll("$1 $2")
      s = QuoteDA.matcher(s).replaceAll("$1 $2")
      if (MainP.matcher(s).find() ||
        (GateP.matcher(s).find() && TimeFirstP.matcher(s).find())) return TagDate
    }
    TagString
  }
}
