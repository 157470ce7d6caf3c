package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable operator: a Spark DataFrame program plus (when expressible)
  * an equivalent ANSI-SQL oracle the driver runs under DuckDB on the same
  * parquet tables. Column names MUST match between the two (the driver's
  * compare sorts columns by name before hashing).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the headline Bench set (sf0.1) */
    bench: Boolean = true,
)

object Determinism {
  /** Cross-engine-deterministic sum of a fixed-point-ish double column.
    *
    * Plain `sum(double)` accumulates in different orders in Spark vs DuckDB
    * and diverges by far more than any rounding can hide at sf0.1 (~600k
    * rows). Instead: scale each VALUE to an exact integer (the inputs carry
    * at most `scale` decimal digits), sum as 64-bit integers (exact,
    * associative, order-independent), divide once at the end. Both engines
    * perform identical IEEE ops per value, so results are bit-identical.
    */
  def intSum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")) / lit(f)
  }

  /** Same trick for an average. */
  def intAvg(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")) / lit(f) / count(c)
  }

  /** SQL fragment mirroring [[intSum]] for the DuckDB oracle. */
  def sqlIntSum(expr: String, scale: Int = 2): String = {
    val f = math.pow(10, scale).toLong
    s"sum(CAST(round(($expr)*$f) AS BIGINT))/$f.0"
  }

  def sqlIntAvg(expr: String, scale: Int = 2): String = {
    val f = math.pow(10, scale).toLong
    s"sum(CAST(round(($expr)*$f) AS BIGINT))/$f.0/count($expr)"
  }

}
