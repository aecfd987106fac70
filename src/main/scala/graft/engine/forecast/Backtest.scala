package graft.engine.forecast

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-origin backtest: the forecast-evaluation harness that
  * answers "how good would the moving-average forecast have been at
  * each of the last K week-ends?" — one relational plan, NO
  * per-origin refits (reference evaluates one fixed split,
  * PRACTICA3.py:143-150; rolling origins are the standard
  * generalization).
  *
  * Shape: on the dense weekly frame, the trailing-window MA at every
  * row IS the 1-step-ahead forecast made at that row's origin — one
  * per-key window pass computes every origin's forecast
  * simultaneously, so K origins cost the same shuffle as one. The
  * per-origin error aggregate then folds over series. MAPE uses the
  * masked convention (zero-demand weeks carry no percentage error),
  * and each APE is rounded to 6 dp and summed in DECIMAL so the
  * cross-series mean is order-independent (a plain double avg would
  * drift with partition count at scale).
  */
object Backtest {

  /** Top-down hierarchical forecast reconciliation: forecast ONCE at
    * the stable aggregate level (total weekly demand — where MA/ETS
    * models are reliable), then disaggregate to items by historical
    * demand share. This is the classic answer to "item-level series
    * are too intermittent to forecast directly" — and the
    * reconciled item forecasts sum back to the top forecast by
    * construction. ONE raw scan: the (item, week) base aggregate is
    * checkpointed and reused for the weekly totals, the top-level
    * last-4-weeks MA (sort+limit — TakeOrdered, never a global
    * window), the item shares, and the grand total. Quantities are
    * integral, so every sum is exact in doubles and the
    * disaggregation is engine-exact without decimal routing.
    */
  def topDownReconcile(lineitem: DataFrame, key: String,
      ts: String, value: String, nMa: Int = 4): DataFrame = {
    val base = lineitem
      .groupBy(col(key),
        graft.engine.Resample.weekEndingSunday(col(ts)).as("week"))
      .agg(sum(col(value)).as("units"))
      .localCheckpoint()
    val weeklyTotal = base.groupBy(col("week"))
      .agg(sum(col("units")).as("units"))
    val topFc = weeklyTotal.orderBy(col("week").desc).limit(nMa)
      .agg(avg(col("units")).as("top_fc"))
    val perItem = base.groupBy(col(key))
      .agg(sum(col("units")).as("tot"))
    val grand = perItem.agg(sum(col("tot")).as("grand"))
    perItem
      .crossJoin(broadcast(grand))
      .crossJoin(broadcast(topFc))
      .select(col(key),
        round(col("tot") / col("grand"), 6).as("share"),
        round(col("top_fc"), 6).as("top_fc"),
        round(col("top_fc") * col("tot") / col("grand"), 6)
          .as("fc_reconciled"))
  }

  /** @param dense  per-key dense weekly frame (keys, week, units)
    * @param nMa    trailing moving-average window (weeks)
    * @param origins how many most-recent week-origins to score
    */
  def rollingOriginMa(dense: DataFrame, keys: Seq[String],
      nMa: Int = 3, origins: Int = 8): DataFrame = {
    val kcols = keys.map(col)
    val wMa = Window.partitionBy(kcols: _*).orderBy(col("week"))
      .rowsBetween(-nMa, -1)
    val wRn = Window.partitionBy(kcols: _*)
      .orderBy(col("week").desc)
    dense
      .withColumn("__ma", avg(col("units")).over(wMa))
      .withColumn("__cnt", count(col("units")).over(wMa))
      .withColumn("origin", row_number().over(wRn).cast("long"))
      // score only full-history forecasts at the last K origins
      .filter(col("origin") <= origins && col("__cnt") === nMa)
      .withColumn("__ape",
        when(col("units") > 0,
          round(abs(col("units") - col("__ma")) / col("units"), 6)))
      .groupBy(col("origin"))
      .agg(count(lit(1)).as("n_series"),
        count(col("__ape")).as("n_scored"),
        round(sum(col("__ape").cast("decimal(28,6)")).cast("double")
          / count(col("__ape")) * 100, 6).as("mape_pct"))
  }
}
