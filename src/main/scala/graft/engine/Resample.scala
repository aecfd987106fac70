package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time resampling (SURVEY §2 rows E2/E3) — the keystone operator.
  *
  * pandas `resample("W-SUN").sum().fillna(0)` (ref: PRACTICA3.py:91-94)
  * buckets rows into calendar weeks labeled by the ending Sunday and
  * materializes EMPTY weeks between each group's min and max as explicit
  * zero rows. Those zero weeks then count toward the ≥12-week gate, the
  * population std-dev and the moving average — so densification is a
  * semantic requirement, not cosmetics.
  *
  * Scale design: the densify step is built from ONE aggregation per
  * grain (no self-join). After the (keys, week) partial-agg we collapse
  * to one row per key carrying a week→units map, then explode a
  * `sequence(min, max, 7 days)`; week counts are bounded by the calendar
  * (52/yr), not by data volume, so the map/array stays small even at
  * 100 TB input. Both aggregations hash-partition on the group keys and
  * benefit from map-side partial aggregation.
  *
  * Spark's `window(ts, "7 days")` is epoch(Thursday)-anchored and
  * closed-left — NOT the W-SUN labeling. The exact mapping is
  * `next_day(date_sub(to_date(ts), 1), 'Sun')`: the first Sunday on or
  * after the timestamp's date (including an intraday Sunday).
  */
object Resample {

  /** Week-ending-Sunday label for a timestamp/date column (E2 bucket). */
  def weekEndingSunday(ts: Column): Column =
    next_day(date_sub(to_date(ts), 1), "Sun")

  /** E2 step 1 — bucket into W-SUN weeks and sum (sparse: only weeks
    * with data).
    */
  def weeklySparse(df: DataFrame, keys: Seq[String], ts: String,
      value: String): DataFrame =
    df.filter(col(ts).isNotNull) // pandas resample drops NaT rows; a null
      // week key would also crash map_from_entries in densify
      .groupBy((keys.map(col) :+ weekEndingSunday(col(ts)).as("week")): _*)
      .agg(sum(col(value)).as("units"))

  /** E2 step 2 — densify: explicit 0 rows for every missing bucket
    * between each group's min and max label (pandas resample
    * semantics). One extra keys-grain aggregation, no join; per-key
    * state is calendar-bounded.
    */
  def densify(sparse: DataFrame, keys: Seq[String],
      labelCol: String = "week", stepDays: Int = 7): DataFrame = {
    val byKey = sparse
      .groupBy(keys.map(col): _*)
      .agg(
        min($(labelCol)).as("w0"),
        max($(labelCol)).as("w1"),
        map_from_entries(collect_list(struct($(labelCol), $("units"))))
          .as("wk_map"))
    byKey
      .select((keys.map(col) :+
        explode(sequence($("w0"), $("w1"),
          expr(s"interval $stepDays days"))).as(labelCol) :+
        $("wk_map")): _*)
      .withColumn("units",
        coalesce(element_at($("wk_map"), $(labelCol)), lit(0.0)))
      .drop("wk_map")
  }

  /** E2 — full weekly resample with gap-fill (sparse + densify). */
  def weeklyDense(df: DataFrame, keys: Seq[String], ts: String,
      value: String): DataFrame =
    densify(weeklySparse(df, keys, ts, value), keys)

  /** E6 — materialized week-date labels for the forecast horizon:
    * `horizon` consecutive W-SUN dates after each group's last observed
    * week (ref: PRACTICA3.py:150-169 keeps the horizon implicit as
    * array position; this makes the dates explicit for consumers).
    */
  def futureWeeks(weekly: DataFrame, keys: Seq[String],
      horizon: Int): DataFrame =
    weekly
      .groupBy(keys.map(col): _*)
      .agg(max($("week")).as("__wmax"))
      .select((keys.map(col) :+
        explode(sequence(
          date_add($("__wmax"), 7),
          date_add($("__wmax"), 7 * horizon),
          expr("interval 7 days"))).as("future_week")): _*)

  /** E3 — daily resample (ref: limpieza_de_datos.py:23). */
  def daily(df: DataFrame, keys: Seq[String], ts: String,
      value: String): DataFrame =
    df.filter(col(ts).isNotNull)
      .groupBy((keys.map(col) :+
        to_date(date_trunc("DAY", col(ts))).as("day")): _*)
      .agg(sum(col(value)).as("units"))

  /** E3 with gap-fill: pandas `resample("D").agg(sum)` materializes
    * empty days as zero rows — required before positional lags/splits
    * (ref: limpieza_de_datos.py:23-33).
    */
  def dailyDense(df: DataFrame, keys: Seq[String], ts: String,
      value: String): DataFrame =
    densify(daily(df, keys, ts, value), keys, labelCol = "day",
      stepDays = 1)

  private def $(n: String): Column = col(n)
}
