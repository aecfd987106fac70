package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline operator queries (dedup, similarity search, text
  * analysis, multimodal) — filled incrementally.
  */
object LlmQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
