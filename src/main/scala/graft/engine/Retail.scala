package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retail portfolio analytics over the sales frame — the classic
  * inventory-management classifications the reference's retail domain
  * implies (reference: the per-product aggregation frames of
  * PRACTICA2.py:33-40 feed exactly this kind of ranking).
  *
  * The interesting scale problem here is the Pareto CUMULATIVE SHARE:
  * the textbook form is one global window (`SUM OVER (ORDER BY revenue
  * DESC)`), which Spark executes as a SINGLE-PARTITION sort — a
  * non-starter at 1e8+ items. `cumulativeShare` instead computes a
  * distributed prefix sum:
  *
  *   1. aggregate to per-item revenue (the only full-data shuffle);
  *   2. `repartitionByRange` on (revenue DESC, key) — Spark's range
  *      partitioner guarantees partition i holds strictly-earlier rows
  *      than partition i+1 under that total order, while each
  *      partition stays executor-sized;
  *   3. per-partition totals → a TINY frame (one row per partition);
  *      its exclusive prefix sum is the per-partition offset — a
  *      global window over ≤ num-partitions rows, trivially safe;
  *   4. broadcast the offsets back and window only WITHIN partitions
  *      (`PARTITION BY partition-id`), so every sort is local.
  *
  * All revenue arithmetic stays in DECIMAL until the final share
  * division, so the prefix sum is order-independent and bit-exact —
  * the distributed result equals the single-window result exactly
  * (pinned by RetailSpec).
  */
object Retail {

  /** Per-item revenue with exact decimal money sums. Each FACTOR is
    * cast to decimal (price 2 dp, discount 2 dp) BEFORE the product,
    * so the multiply itself is exact decimal arithmetic — rounding a
    * double product would instead hit engine-specific tie behavior.
    */
  def itemRevenue(lineitem: DataFrame, key: String): DataFrame =
    lineitem
      .groupBy(col(key))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1.0).cast("decimal(3,2)") -
          col("l_discount").cast("decimal(3,2)"))).as("revenue"))

  /** Distributed cumulative revenue share (see object doc). Output:
    * key, revenue (decimal), cum_share (double, 6 dp). `numParts`
    * bounds each local sort; at 100 TB set it so one partition's
    * items fit an executor (the per-item frame is already small
    * relative to raw sales — one row per item).
    */
  def cumulativeShare(perItem: DataFrame, key: String,
      numParts: Int = 32): DataFrame = {
    val ranged = perItem
      .repartitionByRange(numParts, col("revenue").desc, col(key))
      .withColumn("__pid", spark_partition_id())
    // tiny frame: one row per range partition; the global window over
    // it is over ≤ numParts rows by construction
    val offsets = ranged.groupBy("__pid")
      .agg(sum("revenue").as("__ptot"))
      .withColumn("__offset",
        coalesce(sum(col("__ptot")).over(
          Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast("decimal(38,4)")))
    val total = perItem.agg(
      sum("revenue").cast("decimal(38,4)").as("__total"))
    val local = Window.partitionBy("__pid")
      .orderBy(col("revenue").desc, col(key))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offsets.select("__pid", "__offset")), "__pid")
      .withColumn("__cum", col("__offset") + sum("revenue").over(local))
      .crossJoin(broadcast(total))
      .select(col(key), col("revenue"),
        round(col("__cum").cast("double") /
          col("__total").cast("double"), 6).as("cum_share"),
        round((col("__cum") - col("revenue")).cast("double") /
          col("__total").cast("double"), 6).as("prev_share"))
  }

  /** ABC classification: A = items covering the first `aCut` of
    * revenue, B = up to `bCut`, C = the tail. Band is decided on the
    * EXCLUSIVE cumulative share (revenue of strictly-higher-ranked
    * items), so the item that crosses a boundary keeps the higher
    * band — with include-self banding a single dominant item (say
    * 82% of all revenue) would absurdly class as B. */
  def abcClassify(lineitem: DataFrame, key: String,
      aCut: Double = 0.80, bCut: Double = 0.95,
      numParts: Int = 32): DataFrame =
    cumulativeShare(itemRevenue(lineitem, key), key, numParts)
      .withColumn("abc_band",
        when(col("prev_share") < aCut, "A")
          .when(col("prev_share") < bCut, "B")
          .otherwise("C"))
      .drop("prev_share")

  /** Days-of-supply projection: on-hand stock divided by trailing
    * average daily demand, with a stockout-risk flag when cover is
    * below the replenishment lead time. Demand is an exact decimal
    * mean (sum/decimal ÷ day-count); items that never sold get NULL
    * cover and are flagged (cannot estimate demand ⇒ review). One
    * shuffle (the per-item aggregate); the stock side joins on the
    * item key — broadcast when the item dimension is small, shuffle
    * join on the same key otherwise.
    */
  def daysOfSupply(lineitem: DataFrame, stock: DataFrame,
      key: String, stockCol: String, leadTimeDays: Int): DataFrame = {
    val span = lineitem.agg(
      (datediff(max(col("l_shipdate")), min(col("l_shipdate"))) + 1)
        .cast("long").as("__days"))
    val demand = lineitem.groupBy(col(key))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("__qty"))
      .crossJoin(broadcast(span))
      .select(col(key),
        round(col("__qty").cast("double") / col("__days"), 6)
          .as("daily_demand"))
    stock.join(demand, Seq(key), "left")
      .select(col(key), col(stockCol).as("on_hand"),
        col("daily_demand"),
        round(col(stockCol) / col("daily_demand"), 6)
          .as("days_of_supply"))
      .withColumn("stockout_risk",
        coalesce(col("days_of_supply") < leadTimeDays, lit(true)))
  }
}
