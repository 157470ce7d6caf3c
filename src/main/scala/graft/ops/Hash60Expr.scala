package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's 60-bit md5-prefix hash as a native codegen'd Expression.
  *
  * [[TextAnalysis.hash60]]'s composed form —
  * `conv(substring(md5(x), 1, 15), 16, 10)` — materializes a 32-char hex
  * string, copies a 15-char substring, and re-parses it base-16 for EVERY
  * hash. This expression computes the same value straight off the digest
  * bytes (bytes 0–6 plus the high nibble of byte 7 ≡ the first 15 hex
  * digits), one thread-local digest, zero intermediate strings. It is the
  * hot primitive of the dedup/sketch/sampling families (every shingle,
  * minhash seed, simhash token, sketch key and sample gate goes through
  * it), so it earns the custom-Expression treatment; `doGenCode` emits a
  * direct static call inside whole-stage codegen.
  *
  * Value-identical to the composed form (Hash60Spec fuzzes the equality)
  * and to the DuckDB oracle mirror
  * `CAST(concat('0x', substring(md5(x),1,15)) AS BIGINT)` — the oracles
  * are untouched.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60Kernel.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Hash60Kernel.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  /** Column builder (casts the input to string like the composed form,
    * where md5 took the string's UTF-8 bytes).
    */
  def apply(c: Column): Column =
    Bridge.column(Hash60(Bridge.expression(c.cast("string"))))
}

object Hash60Kernel {
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** the thread-local digest, reset — for callers (MinhashKernel) that
    * stream bytes in without building a UTF8String per hash.
    */
  def digest(): java.security.MessageDigest = {
    val md = md5Local.get()
    md.reset()
    md
  }

  /** fold digest bytes to the 60-bit value (first 15 hex digits). */
  def fold(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xffL) >>> 4)
  }

  /** first 15 hex digits of md5(utf8 bytes) as a 60-bit long. */
  def hash(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    fold(md.digest(s.getBytes))
  }
}
