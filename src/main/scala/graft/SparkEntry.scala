package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full document-ETL pipeline (extract → pivot → normalize →
    * flatten → profile) over the sf0.001 documents table; driver smoke-checks
    * rows>0 (every document yields ≥1 row via the E9 error fallback).
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    graft.etl.DocumentEtl.run(spark, docs).table
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
