package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling beyond AQE (SURVEY §7.5.5): retail group keys are
  * Zipfian (one country dominates Online Retail), and a sort-merge
  * join or aggregation on the raw key puts the hot key's rows in one
  * task. Salting splits a hot key across `saltFactor` partitions.
  */
object Skew {

  /** Salted equi-join of a skewed big side against a small-ish right
    * side: the big side gets a deterministic salt in [0, saltFactor)
    * (hash of all columns — spread, but reproducible), the right side
    * is exploded saltFactor× so every (key, salt) bucket finds its
    * match. Right-side blow-up is the price; use only when AQE's
    * skew-join split isn't available (e.g. aggregations feeding a
    * join, or pre-AQE Spark).
    */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val exploded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: partial-aggregate on (key, salt), then final
    * on key — two small shuffles instead of one hot-key shuffle.
    * `aggs` maps output column name → (partial expr over the raw
    * column, final expr over the partial column). For algebraic
    * aggregates Spark's own map-side combine already does this;
    * explicit salting helps holistic aggregates (collect_list,
    * percentile) whose partial state concentrates on the hot key.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFactor: Int): DataFrame =
    df.withColumn("__salt",
      pmod(hash(col(valueCol)), lit(saltFactor)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))

  /** Key-frequency probe for choosing salting candidates: top-k keys
    * by row count with their share of the table.
    */
  def hotKeys(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
      .withColumn("share", round(col("rows") / total, 4))
      .orderBy(col("rows").desc)
      .limit(k)
  }
}
