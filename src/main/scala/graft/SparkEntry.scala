package graft

import graft.queries.{CoreQueries, LlmQueries, PipelineQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in graft.queries.* (one entry per implemented SURVEY §2
  * operator plus the LLM-data-pipeline extensions), each paired with an
  * exactly-reproducible DuckDB oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Runs the SURVEY §7.3 minimum end-to-end slice: scan →
    * clean → weekly resample w/ gap-fill → gates → split → MA forecast
    * → inventory.
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.e2eSlice(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries ++ LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ PipelineQueries.oracle ++ LlmQueries.oracle
}
