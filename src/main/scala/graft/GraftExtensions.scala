package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector: registers the engine's custom Catalyst
  * expressions so any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) gets them in SQL:
  *
  * {{{
  *   SELECT normalize_value(col).branch, normalize_value(col).out_d FROM t
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("normalize_value"),
      new ExpressionInfo(classOf[graft.etl.NormalizeValue].getName, "normalize_value"),
      (exprs: Seq[Expression]) => graft.etl.NormalizeValue(exprs.head)))
  }
}
