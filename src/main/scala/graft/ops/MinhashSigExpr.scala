package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The full MinHash signature — text straight to the `seeds`-long signature
  * array — as one codegen'd Expression.
  *
  * The composed form ([[Dedup.minhash]] over [[Dedup.shingleHashes]])
  * materializes the distinct shingle-hash array, then runs `seeds`
  * independent `transform`+`array_min` traversals over it: per document
  * that is one boxed array build plus 32 more array walks, each allocating
  * a transformed copy. This kernel makes ONE pass over the shingle
  * positions, hashes each k-gram once ([[Hash60Kernel]], no hex strings),
  * and folds all `seeds` running minima in a tight loop — no intermediate
  * arrays, no boxing until the final signature. Signature semantics are
  * IDENTICAL: min over the multiset equals min over the distinct set, so
  * skipping `array_distinct` changes nothing (`MinhashSigSpec` fuzzes
  * equality against the composed form, unicode included), and the DuckDB
  * oracles — which recompute the same a·x+b mod P chain — are untouched.
  * Short texts (fewer chars than k) yield the composed form's all-null
  * signature, and the Column builders coalesce NULL text to '' so NULL
  * input ALSO matches the composed form (whose when() falls through to
  * the empty-shingle branch on NULL) instead of propagating NULL.
  */
case class MinhashSig(child: Expression, k: Int, seeds: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashKernel.sig(input.asInstanceOf[UTF8String], k, seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.MinhashKernel.sig($c, $k, $seeds)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  def apply(c: Column, k: Int, seeds: Int): Column =
    Bridge.column(MinhashSig(
      Bridge.expression(org.apache.spark.sql.functions.coalesce(
        c.cast("string"), org.apache.spark.sql.functions.lit(""))), k, seeds))
}

/** The distinct 31-bit shingle-hash set — [[Dedup.shingleHashes]] — as one
  * codegen'd Expression, for the operators that need the SET itself
  * (exact Jaccard, band-index probes) rather than just the signature.
  * Same byte-slice hashing as [[MinhashKernel]]; first-seen order matches
  * `array_distinct`'s, and short texts yield the composed form's empty
  * array.
  */
case class ShingleSet(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    MinhashKernel.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.MinhashKernel.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  def apply(c: Column, k: Int): Column =
    Bridge.column(ShingleSet(
      Bridge.expression(org.apache.spark.sql.functions.coalesce(
        c.cast("string"), org.apache.spark.sql.functions.lit(""))), k))
}

object MinhashKernel {
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]

  private def coeffs(seeds: Int): (Array[Long], Array[Long]) =
    tables.computeIfAbsent(seeds, _ =>
      (Array.tabulate(seeds)(Dedup.minhashA), Array.tabulate(seeds)(Dedup.minhashB)))

  /** code-point start offsets into the UTF-8 bytes (n+1 entries; null when
    * the text has fewer than `k` code points).
    */
  private def charStarts(bytes: Array[Byte], k: Int): Array[Int] = {
    var n = 0
    var off = 0
    while (off < bytes.length) {
      n += 1
      off += UTF8String.numBytesForFirstByte(bytes(off))
    }
    if (n < k) return null
    val starts = new Array[Int](n + 1)
    off = 0
    var ci = 0
    while (off < bytes.length) {
      starts(ci) = off
      ci += 1
      off += UTF8String.numBytesForFirstByte(bytes(off))
    }
    starts(n) = bytes.length
    starts
  }

  /** distinct k-char shingle hashes in first-seen order (array_distinct
    * parity); empty array when the text is shorter than k.
    */
  def shingles(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = charStarts(bytes, k)
    if (starts == null) return new GenericArrayData(Array.empty[Long])
    val n = starts.length - 1
    val p = Dedup.MinhashP
    val seen = new java.util.HashSet[java.lang.Long](Math.min(n, 1024))
    val out = new java.util.ArrayList[Any](Math.min(n, 1024))
    val md = Hash60Kernel.digest()
    var pos = 0
    while (pos <= n - k) {
      md.update(bytes, starts(pos), starts(pos + k) - starts(pos))
      val h = java.lang.Long.valueOf(Hash60Kernel.fold(md.digest()) % p)
      if (seen.add(h)) out.add(h)
      pos += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** signature of `s` over k-char shingles; all-null array when s is
    * shorter than k (mirrors the composed form's empty-shingle case).
    *
    * Hashes each k-char window straight off the document's UTF-8 bytes
    * (code-point offsets computed once) — no per-position UTF8String or
    * byte-array copies; the only per-window allocation is the digest
    * itself.
    */
  def sig(s: UTF8String, k: Int, seeds: Int): ArrayData = {
    val bytes = s.getBytes
    val starts = charStarts(bytes, k)
    if (starts == null) return new GenericArrayData(new Array[Any](seeds))
    val n = starts.length - 1
    val (as, bs) = coeffs(seeds)
    val p = Dedup.MinhashP
    val mins = Array.fill(seeds)(Long.MaxValue)
    val md = Hash60Kernel.digest()
    var pos = 0
    while (pos <= n - k) {
      md.update(bytes, starts(pos), starts(pos + k) - starts(pos))
      val h = Hash60Kernel.fold(md.digest()) % p
      var i = 0
      while (i < seeds) {
        val v = (as(i) * h + bs(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      pos += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf: Long => Any))
  }
}
