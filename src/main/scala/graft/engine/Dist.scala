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

  /** Grouped distributed prefix-rank: `out` = `row_number()` within
    * `group` under the TOTAL order `orderCols` (the caller must make
    * it strict — include a unique tiebreaker), WITHOUT ever sorting a
    * whole group in one task. `row_number().over(Window.partitionBy
    * (group))` puts each group's entire frame through a single-task
    * sort — fine for high-cardinality keys, a scale-killer when the
    * group is a handful of corpus-sized sources (the round-20 verdict
    * flag on interleaveSchedule). Same machinery as [[prefixSum]],
    * generalized with the group key: range-partition on
    * (group, orderCols) so each group spans contiguous partitions,
    * count rows per (group, partition), broadcast each partition's
    * per-group predecessor total back as an offset, and rank locally
    * inside each (partition, group) slice. The offsets frame is
    * ≤ #groups × numParts rows — broadcast-safe by construction; the
    * subtotal prefix is the same predecessor-sum self-join shape as
    * [[prefixSum]] (no unpartitioned window on the tiny frame).
    */
  def groupedRank(df: DataFrame, group: String, orderCols: Seq[Column],
      out: String, numParts: Int = 32,
      withGroupTotal: Boolean = false): DataFrame = {
    val ranged = df
      .repartitionByRange(numParts, (col(group) +: orderCols): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val ptots = ranged.groupBy(col(group), col("__pid"))
      .agg(count(lit(1)).as("__ptot"))
    val offsets = ptots
      .join(broadcast(ptots.select(col(group).as("__qg"),
        col("__pid").as("__qid"), col("__ptot").as("__qtot"))),
        col(group) === col("__qg") && col("__qid") < col("__pid"),
        "left")
      .groupBy(col(group), col("__pid"))
      .agg(coalesce(sum(col("__qtot")), lit(0L)).as("__offset"))
    val local = Window.partitionBy(col("__pid"), col(group))
      .orderBy(orderCols: _*)
    val base = ranged
      .join(broadcast(offsets), Seq(group, "__pid"))
      .withColumn(out,
        col("__offset") + row_number().over(local).cast("long"))
      .drop("__pid", "__offset")
    // `<out>_n` = the group's row count, from the SAME subtotal frame
    // (no extra pass over the data) — the ntile / percent_rank closed
    // forms need (rank, group total) together, and computing the
    // total separately would re-run the whole upstream chain
    if (!withGroupTotal) base
    else base.join(broadcast(ptots.groupBy(col(group))
      .agg(sum(col("__ptot")).as(s"${out}_n"))), Seq(group))
  }

  /** Broadcast 1-row aggregate cross: attaches `aggs(of)` to every
    * row of `onto`. The bounded substitute for `agg OVER ()` — which
    * Spark executes as an unpartitioned WindowExec (the optimizer
    * folds even `partitionBy(lit(1))` out of the spec) at ANY frame
    * size. When `of` is a subtree of `onto`, pin the shared frame
    * first (or use [[selfScalarCross]]) so the cross stays
    * single-scan.
    */
  def scalarCross(onto: DataFrame, of: DataFrame,
      aggs: Column*): DataFrame =
    onto.crossJoin(broadcast(of.agg(aggs.head, aggs.tail: _*)))

  /** Self scalar cross: attaches aggregate(s) of a frame to each of
    * its OWN rows. Pins `df` with `localCheckpoint` so the row scan
    * and the 1-row aggregate both read the pinned blocks — one
    * upstream execution, where a bare self-cross would re-run the
    * whole upstream subtree twice (the regression mode this helper
    * exists to prevent: five round-16 hand-rolled copies each had to
    * remember the checkpoint independently). Used by the PSI total,
    * host-share denominator, and ECE cross among others.
    */
  def selfScalarCross(df: DataFrame, aggs: Column*): DataFrame = {
    val pinned = df.localCheckpoint()
    pinned.crossJoin(broadcast(pinned.agg(aggs.head, aggs.tail: _*)))
  }

  /** Predecessor-count rank join over a broadcastable top frame:
    * `rank` = 1 + #rows of `frame` sorting strictly before the row
    * under (cnt DESC, key ASC), attached to each row of `rows` by ONE
    * broadcast self-join + aggregate (≤ |rows|·|frame| predicate
    * evals, all broadcast-local) — the bounded substitute for a
    * global `row_number()` window, which executes as a single-task
    * sort of the whole frame. Exact whenever `frame` is a PREFIX of
    * the global order containing every predecessor of every row in
    * `rows` (e.g. both equal to a top-k cut). Left join so the rank-1
    * row (no predecessor) survives; `count(col)` skips its nulls.
    * With `cum`, also emits the inclusive running sum of `cnt` under
    * the same order (prefix sums inside a prefix frame are exact).
    * The INVERTED variant — few probe rows ranked against a LARGE
    * streamed frame (broadcast the probes, flip the predicate, count
    * successors-of-probe) — is shape-specific and stays at its call
    * site (TextAnalysis.rankedVocabCut's single-char floor).
    */
  def topFrameRank(rows: DataFrame, frame: DataFrame, key: String,
      cnt: String, cum: Option[String] = None): DataFrame = {
    val joined = rows.join(
      broadcast(frame.select(col(key).as("__qk"), col(cnt).as("__qc"))),
      col(cnt) < col("__qc") ||
        (col(cnt) === col("__qc") && col(key) > col("__qk")),
      "left")
    val grouped = joined.groupBy(col(key), col(cnt))
    cum match {
      case None =>
        grouped.agg((count(col("__qk")) + lit(1L)).as("rank"))
      case Some(c) =>
        grouped.agg((count(col("__qk")) + lit(1L)).as("rank"),
          (coalesce(sum(col("__qc")), lit(0L)) + col(cnt)).as(c))
    }
  }
}
