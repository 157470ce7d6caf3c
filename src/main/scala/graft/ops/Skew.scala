package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (fact) side's key into `factor`
  * sub-keys and explode the dimension side across all salt values, so one
  * hot key spreads over `factor` shuffle partitions instead of one straggler
  * task. Result is row-identical to the plain join (verified by oracle) —
  * only the partitioning changes. AQE's skew-join handles moderate skew
  * automatically; explicit salting is for the pathological keys a 100 TB
  * fact table meets (null-ish defaults, bot traffic, etc).
  */
object Skew {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factor: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
    val exploded = dim.withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
