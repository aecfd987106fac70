package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group gates, winsorize, train/test split, lags
  * (SURVEY §2 rows C4, D8/D10, E4, E5).
  */
object Series {

  /** C4 — HAVING-style series eligibility gates
    * (ref: PRACTICA3.py:96-100): keep groups with ≥ minWeeks weekly bins
    * (densified zeros count!) and ≥ minTotalSales total units. Input is
    * the densified weekly frame. Implemented with a window so the rows
    * survive (the kernel consumes them), without a second shuffle — the
    * window partitions on the same keys as the resample aggregation.
    */
  def eligible(weekly: DataFrame, keys: Seq[String],
      cfg: PipelineConfig = PipelineConfig()): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    weekly
      .withColumn("__weeks", count(lit(1)).over(w))
      .withColumn("__total", sum(col("units")).over(w))
      .filter(col("__weeks") >= cfg.minWeeks &&
        col("__total") >= cfg.minTotalSales)
      .drop("__weeks", "__total")
  }

  /** C4 decided BEFORE densify: the densified row count of a group
    * equals its week-span ((max-min)/7 + 1) and gap-zeros add nothing
    * to the total, so both gates are computable on the SPARSE weekly
    * frame. Filtering first means densification (the pipeline's row
    * amplifier — ~20× at fine grains) materializes zero rows only for
    * groups that survive; at 100 TB with selective gates this is the
    * difference between exploding the corpus and exploding the kept
    * slice. The window partitions on the resample keys, the same hash
    * partitioning the subsequent densify aggregation reuses.
    */
  def eligibleSparse(sparse: DataFrame, keys: Seq[String],
      cfg: PipelineConfig = PipelineConfig(),
      labelCol: String = "week"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    sparse
      .withColumn("__span",
        datediff(max(col(labelCol)).over(w),
          min(col(labelCol)).over(w)) / 7 + 1)
      .withColumn("__total", sum(col("units")).over(w))
      .filter(col("__span") >= cfg.minWeeks &&
        col("__total") >= cfg.minTotalSales)
      .drop("__span", "__total")
  }

  /** C4 relational form — group-level gate as a plain HAVING aggregate
    * (one row per eligible group).
    */
  def eligibleGroups(weekly: DataFrame, keys: Seq[String],
      cfg: PipelineConfig = PipelineConfig()): DataFrame =
    weekly.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("weeks"), sum(col("units")).as("total"))
      .filter(col("weeks") >= cfg.minWeeks &&
        col("total") >= cfg.minTotalSales)

  /** D8+D10 — winsorize to the [q01, q99] quantiles of the POSITIVE
    * values, applied to the WHOLE series (ref: PRACTICA3.py:103-107).
    * Semantic trap preserved: gap-filled zero weeks are raised to q01
    * when the group has > 5 positive weeks. Quantiles are exact with
    * linear interpolation (pandas default == Spark `percentile`).
    */
  def winsorize(weekly: DataFrame, keys: Seq[String],
      value: String = "units"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val pos = when(col(value) > 0, col(value))
    weekly
      .withColumn("__npos", count(pos).over(w))
      .withColumn("__q01", percentile(pos, lit(0.01)).over(w))
      .withColumn("__q99", percentile(pos, lit(0.99)).over(w))
      .withColumn(value,
        when(col("__npos") > 5,
          least(greatest(col(value), col("__q01")), col("__q99")))
          .otherwise(col(value)))
      .drop("__npos", "__q01", "__q99")
  }

  /** E5 — positional train/test split on the time-ordered series
    * (ref: PRACTICA3.py:110-111): last `horizon` rows are test.
    * Adds `rn_desc` (1 = latest week) and `is_test`.
    */
  def markSplit(weekly: DataFrame, keys: Seq[String], ts: String,
      horizon: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts).desc)
    weekly
      .withColumn("rn_desc", row_number().over(w))
      .withColumn("is_test", col("rn_desc") <= horizon)
  }

  /** E4 — lag features + dropna (ref: limpieza_de_datos.py:27-29). */
  def withLags(df: DataFrame, keys: Seq[String], ts: String,
      value: String, lags: Seq[Int]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts))
    val withL = lags.foldLeft(df) { (d, k) =>
      d.withColumn(s"lag_$k", lag(col(value), k).over(w))
    }
    withL.na.drop(lags.map(k => s"lag_$k"))
  }

  /** D11 — last element of the time-ordered group (the reference's
    * "current stock" proxy, ref: PRACTICA3.py:75).
    */
  def lastByTime(value: String, ts: String): Column =
    max_by(col(value), col(ts))

  /** D12 — mean of the last k rows, full mean when shorter
    * (ref: PRACTICA3.py:144).
    */
  def tailMean(df: DataFrame, keys: Seq[String], ts: String,
      value: String, k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts).desc)
    df.withColumn("__rn", row_number().over(w))
      .groupBy(keys.map(col): _*)
      .agg(avg(when(col("__rn") <= k, col(value))).as(s"tail${k}_mean"))
  }

  /** Exponential weighted moving average per series, seeded at the
    * first observation: ewma_1 = x_1, ewma_t = α·x_t + (1−α)·ewma_t-1
    * — the classic smoothed-level signal. The fold runs over each
    * series' collected, time-sorted value array with one prefix fold
    * per row (O(len²) per series, like any exact EWMA re-derivation;
    * fine at daily/weekly grain, and the per-row shape means BOTH
    * engines execute the same multiply-add order, so results are
    * bit-comparable). α is a BigDecimal so 1−α is exact in decimal
    * before either engine parses it (1−0.3 as doubles is
    * 0.7000000000000001 — a silent cross-engine divergence).
    * One shuffle on the series key; the dense per-key state is the
    * series itself, the same boundedness contract as the forecast
    * kernel.
    */
  def ewma(df: DataFrame, keys: Seq[String], ts: String,
      value: String, alpha: BigDecimal = BigDecimal("0.3"))
      : DataFrame = {
    val aS = alpha.toString + "D"
    val bS = (BigDecimal(1) - alpha).toString + "D"
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"sort_array(collect_list(struct($ts, $value)))")
        .as("__sv"))
      .withColumn("__xs",
        expr(s"transform(__sv, s -> CAST(s.$value AS DOUBLE))"))
      .select(keys.map(col) :+ col("__xs") :+
        posexplode(col("__sv")).as(Seq("__i", "__e")): _*)
      .select(keys.map(col) :+ col(s"__e.$ts").as(ts) :+
        col(s"__e.$value").as(value) :+
        // 2dp, not 6: at money magnitudes (~1e6) a 6dp round needs
        // value×1e6 ≈ 1e12-1e13 digits beyond double's exact range,
        // where engines' rounding algorithms legitimately disagree
        // within an ulp; value×100 stays exactly representable, so
        // identical folds round identically everywhere (and a true
        // .005 binary tie cannot exist)
        round(expr(
          s"""aggregate(slice(__xs, 2, __i), element_at(__xs, 1),
              (acc, x) -> $aS * x + $bS * acc)"""), 2).as("ewma"): _*)
  }

  /** Croston's method for INTERMITTENT demand (the slow-mover
    * forecast the MA/Holt-Winters family handles badly: series that
    * are mostly zeros with occasional demand spikes). Works on the
    * SPARSE weekly frame directly — demand events are exactly the
    * observed buckets, and inter-demand intervals come from label
    * gaps, so no densify / zero-fill pass is ever paid (at 100 TB
    * the dense grid is ~20× the sparse one for slow movers — this
    * operator's whole point).
    *
    * Two exponential smoothings, both seeded at their first
    * observation and folded in event order (the exact `ewma`
    * machinery above — identical multiply-add order on any engine):
    * z over demand SIZES, p over inter-demand INTERVALS (in weeks).
    * Forecast per period = z/p; `sba_fc` is the Syntetos-Boylan
    * bias-corrected (1 − α/2)·z/p. Series with a single demand
    * event report sizes but NULL interval/forecast (no interval
    * evidence). One shuffle on the series key; per-key state is the
    * series' own events, calendar-bounded.
    */
  def croston(df: DataFrame, keys: Seq[String], ts: String,
      value: String, alpha: BigDecimal = BigDecimal("0.3"))
      : DataFrame = {
    val aS = alpha.toString + "D"
    val bS = (BigDecimal(1) - alpha).toString + "D"
    val sbaS = (BigDecimal(1) - alpha / 2).toString + "D"
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"sort_array(collect_list(struct($ts, $value)))")
        .as("__sv"))
      .withColumn("__ys",
        expr(s"transform(__sv, s -> CAST(s.$value AS DOUBLE))"))
      .withColumn("__m", size(col("__sv")))
      // sequence(2,1) would count DOWN; guard keeps single-event
      // series on an empty gap list
      .withColumn("__gaps", expr(
        s"""IF(__m >= 2, transform(sequence(2, __m), i ->
            CAST(datediff(element_at(__sv, i).$ts,
                          element_at(__sv, i - 1).$ts) AS DOUBLE)
              / 7.0D), array())"""))
      .withColumn("__z", expr(
        s"""aggregate(slice(__ys, 2, __m - 1), element_at(__ys, 1),
            (acc, x) -> $aS * x + $bS * acc)"""))
      .withColumn("__p", when(col("__m") >= 2, expr(
        s"""aggregate(slice(__gaps, 2, __m - 2),
            element_at(__gaps, 1),
            (acc, x) -> $aS * x + $bS * acc)""")))
      .select(keys.map(col) :+
        col("__m").cast("long").as("n_events") :+
        round(col("__z"), 6).as("z_size") :+
        round(col("__p"), 6).as("p_interval") :+
        when(col("__m") >= 2, round(col("__z") / col("__p"), 6))
          .as("croston_fc") :+
        when(col("__m") >= 2,
          round(expr(s"$sbaS * __z / __p"), 6)).as("sba_fc"): _*)
  }
}
