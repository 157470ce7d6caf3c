package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{LongType, StringType}

/** SparkSessionExtensions injector: registers the engine's custom Catalyst
  * expression AND SQL forms of its scalar text functions so any session
  * built with `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) gets them in SQL:
  *
  * {{{
  *   SELECT normalize_value(col).branch, normalize_value(col).out_d FROM t
  *   SELECT graft_fingerprint(text), graft_token_count(text) FROM docs
  * }}}
  *
  * The `graft_*` builders assemble the SAME catalyst trees the Column API
  * produces (pure built-ins, codegen'd end to end). Lambda-based operators
  * (quality score, lang-id, simhash, minhash) stay Column-API-only — their
  * higher-order-function trees aren't worth hand-building, and SQL users
  * compose them from these primitives.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("normalize_value"),
      new ExpressionInfo(classOf[graft.etl.NormalizeValue].getName, "normalize_value"),
      (exprs: Seq[Expression]) => graft.etl.NormalizeValue(exprs.head)))
    GraftExtensions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(GraftExtensions.getClass.getName, name),
        (exprs: Seq[Expression]) => GraftExtensions.oneArg(name, exprs, builder)))
    }
    ext.injectFunction((
      FunctionIdentifier("graft_morton"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_morton"),
      (exprs: Seq[Expression]) => GraftExtensions.mortonTree(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[graft.ops.MinhashSig].getName, "graft_minhash_sig"),
      (exprs: Seq[Expression]) => GraftExtensions.minhashSigTree(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_set"),
      new ExpressionInfo(classOf[graft.ops.ShingleSet].getName, "graft_shingle_set"),
      (exprs: Seq[Expression]) => GraftExtensions.shingleSetTree(exprs)))
  }
}

object GraftExtensions {

  /** catalyst builders mirroring TextAnalysis' Column definitions. */
  val sqlBuilders: Seq[(String, Expression => Expression)] = Seq(
    // md5 of whitespace-normalized lowercase text (TextAnalysis.fingerprint)
    "graft_fingerprint" -> (c => new Md5(
      RegExpReplace(Lower(StringTrim(c)), Literal("\\s+"), Literal(" ")))),
    // 60-bit md5-prefix integer (TextAnalysis.hash60) — the codegen'd
    // Hash60 Expression, same value as the composed
    // conv(substring(md5(x),1,15),16,10) form without the hex round-trip
    "graft_hash60" -> (c => graft.ops.Hash60(Cast(c, StringType))),
    // whitespace token count (TextAnalysis.tokenCount)
    "graft_token_count" -> (c =>
      Size(StringSplit(StringTrim(c), Literal("\\s+"), Literal(-1)))),
    // BPE-ish subword count (TextAnalysis.regexTokenCount)
    "graft_subword_count" -> (c =>
      Size(RegExpExtractAll(c, Literal("[A-Za-z]+|\\d+|[^A-Za-z\\d\\s]"), Literal(0)))),
    // RFC 3986 canonicalization (round 11 — the codegen'd UrlCanonicalize
    // Expression behind url01/url05)
    "graft_url_canonicalize" -> (c =>
      graft.ops.UrlCanonicalize(Cast(c, StringType))))

  /** reject wrong arity at ANALYSIS time — `exprs.head` alone would
    * silently ignore extra arguments (plausible wrong results) and throw a
    * bare NoSuchElementException on zero.
    */
  private[graft] def oneArg(name: String, exprs: Seq[Expression],
      builder: Expression => Expression): Expression = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${exprs.length}")
    builder(exprs.head)
  }

  /** Z-order bit interleave of two 16-bit-ranged long expressions as a
    * hand-built catalyst tree (mirror of Sketches.sparkMorton — same
    * disjoint-bit SUM so no OR node is needed): the data-layout primitive
    * exposed to SQL as `graft_morton(x16, y16)`.
    */
  private[graft] def mortonTree(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_morton expects exactly 2 arguments, got ${exprs.length}")
    def bits(e: Expression, off: Int): Seq[Expression] = (0 until 16).map { i =>
      ShiftLeft(
        BitwiseAnd(ShiftRight(Cast(e, LongType), Literal(i)), Literal(1L)),
        Literal(2 * i + off))
    }
    (bits(exprs.head, 0) ++ bits(exprs(1), 1)).reduce[Expression](Add(_, _))
  }

  /** a FOLDABLE int parameter (literal or constant-foldable expression) —
    * the shingle width / seed count of the fused dedup expressions.
    */
  private def intParam(name: String, e: Expression): Int = e match {
    case f if f.foldable => f.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$name expects an integer literal parameter, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$name expects a foldable integer parameter, got $e")
  }

  /** `graft_minhash_sig(text, k, seeds)` — the fused one-pass MinHash
    * signature (codegen Expression) in SQL.
    */
  private[graft] def minhashSigTree(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"graft_minhash_sig expects (text, k, seeds), got ${exprs.length} args")
    graft.ops.MinhashSig(
      Coalesce(Seq(Cast(exprs.head, StringType), Literal.create("", StringType))),
      intParam("graft_minhash_sig", exprs(1)), intParam("graft_minhash_sig", exprs(2)))
  }

  /** `graft_shingle_set(text, k)` — the fused distinct shingle-hash set. */
  private[graft] def shingleSetTree(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"graft_shingle_set expects (text, k), got ${exprs.length} args")
    graft.ops.ShingleSet(
      Coalesce(Seq(Cast(exprs.head, StringType), Literal.create("", StringType))),
      intParam("graft_shingle_set", exprs(1)))
  }

  /** temp-function registration for an ALREADY-built session (specs, REPL —
    * extensions otherwise apply only at builder time).
    */
  def registerAll(spark: SparkSession): Unit = {
    graft.etl.NormalizeValue.register(spark)
    graft.etl.InferTypeTag.register(spark)
    sqlBuilders.foreach { case (name, builder) =>
      Bridge.registerExpression(spark, name, exprs => oneArg(name, exprs, builder))
    }
    Bridge.registerExpression(spark, "graft_morton", mortonTree)
    Bridge.registerExpression(spark, "graft_minhash_sig", minhashSigTree)
    Bridge.registerExpression(spark, "graft_shingle_set", shingleSetTree)
  }
}
