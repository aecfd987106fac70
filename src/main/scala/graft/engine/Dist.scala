package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ordered-scan primitives.
  *
  * The textbook `SUM(...) OVER (ORDER BY ...)` is a SINGLE-PARTITION
  * sort in Spark — the one window shape that cannot scale. This
  * primitive computes the same inclusive running total with range
  * partitioning: per-partition subtotals (one row per partition) get
  * an exclusive prefix over a ≤ numParts-row frame, broadcast back as
  * offsets, and every real sort stays partition-local. Exact for any
  * exactly-summable type (integers, longs, decimals); used by the
  * Pareto/ABC classification and the token-budget corpus cut.
  */
object Dist {

  /** Adds `out` = inclusive running total of `value` under the TOTAL
    * order `orderCols` (the caller must make it strict — include a
    * unique tiebreaker). With `withTotal`, also attaches the grand
    * total as column `<out>_total` (computed from the per-partition
    * subtotals — no extra pass over the data). The ranged frame is
    * locally checkpointed: subtotals, offsets, and the final window
    * all read the pinned frame instead of re-running upstream.
    */
  def prefixSum(df: DataFrame, orderCols: Seq[Column], value: String,
      out: String, numParts: Int = 32,
      withTotal: Boolean = false): DataFrame = {
    val ranged = df
      .repartitionByRange(numParts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val ptots = ranged.groupBy("__pid")
      .agg(sum(col(value)).as("__ptot"))
    val zero = lit(0).cast(ptots.schema("__ptot").dataType)
    // exclusive prefix over the <= numParts-row subtotal frame as a
    // predecessor-sum self-join (numParts^2 predicate evals, all
    // broadcast) — the round-15 form used Window.orderBy over the
    // same tiny frame, which is correct but executes as an
    // unpartitioned WindowExec and logs the scary "moving all data
    // to a single partition" warning on every run
    val offsets = ptots
      .join(broadcast(ptots.select(col("__pid").as("__qid"),
        col("__ptot").as("__qtot"))), col("__qid") < col("__pid"),
        "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__qtot")), zero).as("__offset"))
    val local = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = ranged
      .join(broadcast(offsets.select("__pid", "__offset")), "__pid")
      .withColumn(out, col("__offset") + sum(col(value)).over(local))
      .drop("__pid", "__offset")
    if (!withTotal) base
    else base.crossJoin(broadcast(
      ptots.agg(sum(col("__ptot")).as(s"${out}_total"))))
  }
}
