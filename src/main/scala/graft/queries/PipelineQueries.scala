package graft.queries

import graft.engine._
import graft.engine.forecast.Kernel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composed end-to-end pipeline queries (SURVEY §7.3 minimum slice, the
  * typed forecast kernel, and the §3.2 notebook flow) — all oracled.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.BenchGrain.input(s.read.parquet(s"$dir/$name.parquet"))

  /** Sales frame with the flagship pipeline's column contract:
    * (sku, store, ts, units). sku = l_suppkey, store = l_returnflag —
    * ~300 series at ~120-360 weeks each, the reference's grain shape.
    */
  private def sales(s: SparkSession, dir: String,
      skuCol: String = "l_suppkey"): DataFrame =
    t(s, dir, "lineitem")
      .select(col(skuCol).cast("string").as("sku"),
        col("l_returnflag").as("store"),
        col("l_shipdate").as("ts"),
        col("l_quantity").as("units"))

  /** Exact linear-interpolated quantile over a sorted array column,
    * reproducing Spark `percentile` (and DuckDB `quantile_cont`)
    * arithmetic bit-for-bit: position h = (n-1)*p; when h is integral
    * the element itself, else (ceil(h)-h)*a[floor(h)+1] +
    * (h-floor(h))*a[ceil(h)+1] — that exact product order, verified
    * against PercentileBase.getPercentile, so the array form below
    * hashes identically to the window form it replaced.
    */
  private def quantileCont(sorted: String, n: String,
      p: Double): org.apache.spark.sql.Column = expr(
    s"""CASE WHEN $n = 0 THEN NULL ELSE (
       |  CASE WHEN floor(($n - 1) * ${p}D) = ceil(($n - 1) * ${p}D)
       |    THEN element_at($sorted, CAST(($n - 1) * ${p}D AS INT) + 1)
       |    ELSE (ceil(($n - 1) * ${p}D) - ($n - 1) * ${p}D)
       |       * element_at($sorted, CAST(floor(($n - 1) * ${p}D) AS INT) + 1)
       |       + (($n - 1) * ${p}D - floor(($n - 1) * ${p}D))
       |       * element_at($sorted, CAST(ceil(($n - 1) * ${p}D) AS INT) + 1)
       |  END) END""".stripMargin)

  /** §7.3 minimum end-to-end slice, fully relational (J3-only model so
    * every step is SQL-expressible): clean → E2 → C4 → winsorize → E5 →
    * MA forecast → G1 MAPE → H1-H5 inventory.
    *
    * Physical shape: ONE per-series aggregation straight off the sparse
    * weekly frame; gates, densify, winsorize and split are array
    * expressions on the collapsed row. The dense calendar grid (the
    * pipeline's ~20× row amplifier at fine grains) exists only inside
    * per-series arrays — never as shuffled rows — which is the typed
    * kernel's (Kernel.run) strategy expressed relationally. The three
    * window passes the previous form pushed ~12M dense rows through
    * (winsorize quantiles, split row_number, gate counts) are gone;
    * per-series state stays calendar-bounded (52 cells/yr), so the
    * shape survives a 100 TB fine-grain run.
    */
  def e2eSlice(s: SparkSession, dir: String,
      cfg: PipelineConfig = PipelineConfig(),
      skuCol: String = "l_suppkey"): DataFrame =
    e2eSliceFrom(Clean.nonNegative(
      t(s, dir, "lineitem").select(col(skuCol).cast("string").as("sku"),
        col("l_returnflag").as("store"),
        col("l_shipdate").as("ts"),
        col("l_quantity").as("units")), "units"), cfg)

  /** [[e2eSlice]] over an arbitrary cleaned sales frame
    * (sku, store, ts, units) — the DataFrame-in core, also the seam
    * the array-form-vs-window-form equivalence property test uses.
    */
  def e2eSliceFrom(cleaned: DataFrame,
      cfg: PipelineConfig = PipelineConfig()): DataFrame = {
    val keys = Seq("sku", "store")
    val sparse = Resample.weeklySparse(cleaned, keys, "ts", "units")
    val h = cfg.horizonWeeks

    val perSeries = sparse
      .groupBy(keys.map(col): _*)
      // ONE aggregate expression, exactly the kernel's shape: bounds
      // and total derive from the sorted entries afterwards (sorted
      // ends are the min/max; units are integral-valued doubles so the
      // fold total is exact in any order). Mixing min/max/sum into the
      // same ObjectHashAggregate as collect_list measured ~0.9 s
      // slower at sf0.1 than deriving them post-agg.
      .agg(sort_array(collect_list(struct(col("week"), col("units"))))
        .as("__ent"))
      .withColumn("w0", expr("__ent[0].week"))
      .withColumn("w1", expr("element_at(__ent, -1).week"))
      .withColumn("__total",
        expr("aggregate(__ent, 0D, (a, e) -> a + e.units)"))
      // C4 gates are densify-invariant (span == dense row count, gap
      // zeros add nothing to the total — see Series.eligibleSparse), so
      // they apply on the collapsed sparse row before any densification
      .filter((datediff(col("w1"), col("w0")) / 7 + 1) >= cfg.minWeeks &&
        col("__total") >= cfg.minTotalSales)
      // Span bound (PLANS.md "remains UNBOUNDED" close-out): the
      // scatter below emits one cell per calendar week of span, so a
      // single corrupted timestamp would amplify one series into
      // ~400k gap-zero cells. Assert the calendar bound in-plan —
      // the guard rides the existing projection (no extra pass) and
      // a pathological series fails loudly instead of inflating
      // executor memory. Normal data is untouched: the testdata
      // span is ~350 weeks vs the 2600-week (50 yr) default.
      .withColumn("__ent", when(
        datediff(col("w1"), col("w0")) < lit(7 * cfg.maxSpanWeeks),
        col("__ent"))
        .otherwise(raise_error(concat(
          lit(s"e2eSlice: series span exceeds maxSpanWeeks=" +
            s"${cfg.maxSpanWeeks} for "),
          col("sku"), lit("/"), col("store"),
          lit(" — corrupted timestamps?")))))
      // E2 densify as an array SCATTER over the week-sorted entries:
      // each entry emits its units followed by (gap-1) zeros up to the
      // next observed week. O(total cells), unlike an element_at(map)
      // lookup per grid cell which is O(cells × entries) — the map form
      // measured ~2× slower at the fine grain
      .withColumn("dense", expr(
        """flatten(transform(__ent, (e, i) ->
          |  CASE WHEN i = size(__ent) - 1 THEN array(e.units)
          |  ELSE concat(array(e.units), array_repeat(0D, CAST(
          |    (datediff(element_at(__ent, i + 2).week, e.week) div 7) - 1
          |    AS INT)))
          |  END))""".stripMargin))
      // D8+D10 winsorize: [q01, q99] of the POSITIVE values (gap zeros
      // excluded from the quantile, raised by the clamp — the
      // reference's semantic trap, see Series.winsorize). Both bounds
      // live in ONE staged array column: referenced twice below, so
      // CollapseProject keeps the projection instead of inlining the
      // quantile CASEs into the clamp lambda (which would re-evaluate
      // them per dense cell — measured ~2× the whole query)
      .withColumn("__pos", expr(
        "array_sort(filter(transform(__ent, e -> e.units), x -> x > 0D))"))
      .withColumn("__npos", size(col("__pos")))
      .withColumn("__qb", array(
        quantileCont("__pos", "__npos", 0.01),
        quantileCont("__pos", "__npos", 0.99)))
      .withColumn("wins", when(col("__npos") > 5, expr(
        "transform(dense, x -> least(greatest(x, __qb[0]), __qb[1]))"))
        .otherwise(col("dense")))
      // E5 positional split: last `horizon` cells are test
      .withColumn("__n", size(col("wins")))
      .select(col("sku"), col("store"),
        expr(s"slice(wins, 1, greatest(__n - $h, 0))").as("train"),
        expr(s"slice(wins, greatest(__n - $h, 0) + 1, least($h, __n))")
          .as("test"))

    val withFc = perSeries
      // J3 moving average: mean of last 4 train weeks (full mean when
      // shorter), repeated over the horizon (ref: PRACTICA3.py:143-147)
      .withColumn("ma", round(expr(
        """aggregate(slice(train, greatest(size(train) - 3, 1),
          |          least(size(train), 4)), 0D, (a, x) -> a + x)
          |/ least(size(train), 4)""".stripMargin), 6))
      .withColumn("forecast",
        expr(s"array_repeat(greatest(ma, 0D), ${cfg.horizonWeeks})"))

    val stats = withFc
      .withColumn("train_mean", expr(
        "aggregate(train, 0D, (a, x) -> a + x) / size(train)"))
      .withColumn("train_std", round(sqrt(greatest(expr(
        """aggregate(train, 0D, (a, x) -> a + x * x) / size(train)
          |- pow(aggregate(train, 0D, (a, x) -> a + x) / size(train), 2)
          |""".stripMargin), lit(0.0))), 6))
      .withColumn("last_units", expr("element_at(train, -1)"))
      .withColumn("mape",
        round(Metrics.safeMapeArr(col("test"), col("forecast")), 3))

    val z = cfg.serviceLevelZ
    val lt = cfg.leadTimeWeeks
    val sqlt = math.sqrt(lt)
    stats
      .withColumn("ss", when(expr("size(train)") > 1,
        round(lit(z) * col("train_std") * lit(sqlt), 6))
        .otherwise(lit(0.0)))
      .withColumn("dlt", round(col("ma") * lit(lt), 6))
      .withColumn("rop", Inventory.reorderPoint(col("dlt"), col("ss")))
      .withColumn("qty",
        Inventory.orderQty(col("rop"), col("last_units")))
      .select(col("sku"), col("store"), col("mape"), col("forecast"),
        // raw winsorized values can differ between Spark percentile,
        // the kernel quantile, and DuckDB quantile_cont in the last
        // ulp — round for exact hash compare
        expr("transform(test, x -> round(x, 6))").as("test"),
        Inventory.intClamp(col("ss")).cast("long").as("safety_stock"),
        Inventory.intClamp(col("rop")).cast("long").as("reorder_point"),
        Inventory.intClamp(col("qty")).cast("long").as("qty_to_order"))
      .orderBy("sku", "store")
  }

  /** The typed kernel (J3-only config ⇒ deterministic, same semantics
    * as e2eSlice) — exercises Kernel.run end to end.
    */
  def kernelMa(s: SparkSession, dir: String,
      skuCol: String = "l_suppkey",
      oracleCompat: Boolean = false): DataFrame = {
    val cfg = PipelineConfig(useTrendSeasonal = false,
      useHoltWinters = false, oracleCompat = oracleCompat)
    Kernel.run(Clean.nonNegative(sales(s, dir, skuCol), "units"), cfg)
      .drop("runtime_sec")
      .withColumn("forecast",
        expr("transform(forecast, x -> round(x, 6))"))
      .withColumn("test", expr("transform(test, x -> round(x, 6))"))
      .withColumn("mape", round(col("mape"), 3))
      .withColumn("safety_stock", col("safety_stock").cast("long"))
      .withColumn("reorder_point", col("reorder_point").cast("long"))
      .withColumn("qty_to_order", col("qty_to_order").cast("long"))
      .orderBy("sku", "store")
  }

  /** §3.2 notebook flow (limpieza_de_datos.py): filter one series →
    * daily resample → lags → dropna → split → constant forecast →
    * G5 align join → G4/G3 metrics. One output row.
    *
    * SINGLE-SERIES ONLY, join form (round 16): the notebook's
    * positional lag/split semantics are reproduced WITHOUT any
    * window — on the DENSE daily grid `lag k rows` is exactly
    * `value at day − k` (a self-join on date arithmetic) and the
    * last-7 split is a broadcast max(day) cross — so even this
    * one-series, ~150-row flow plans with zero WindowExec. The
    * grouped pipeline operators ([[graft.engine.Series.withLags]]/
    * `markSplit`) keep their per-key window form; do NOT call those
    * with keys = Seq() on a multi-series frame — an empty partition
    * spec is a single-task global sort.
    */
  def notebookFlow(s: SparkSession, dir: String): DataFrame = {
    val ev = Ingest.tableNanos(s, dir, "events", Seq("ts"))
      .filter(col("event_type") === "click" && col("user_id") < 50)
    // pandas resample("D") materializes empty days as zeros — they
    // must exist before the positional lags and split
    val daily = Resample.dailyDense(ev, Seq(), "ts", "value")
      .withColumn("units", round(col("units"), 6))
      // pinned: the lag self-joins below read the frame three times
      .localCheckpoint()
    // E4/E5 on the single notebook series, join form (round 16): on
    // a DENSE daily grid, `lag k rows` is exactly `value at day − k`
    // and `last 7 rows` is exactly `day > max(day) − 7`, so the
    // keyless positional forms — which execute as unpartitioned
    // WindowExec — are replaced by date-arithmetic joins with
    // identical output (inner joins reproduce the lag-null na.drop).
    // The grouped pipeline operators (Series.withLags/markSplit)
    // keep their per-key window form.
    val lagged = daily
      .join(daily.select(col("day").as("__d1"),
        col("units").as("lag_1")),
        col("day") === date_add(col("__d1"), 1))
      .join(daily.select(col("day").as("__d7"),
        col("units").as("lag_7")),
        col("day") === date_add(col("__d7"), 7))
      .drop("__d1", "__d7")
      .localCheckpoint()
    val split = lagged
      .crossJoin(broadcast(lagged.agg(max(col("day")).as("__mx"))))
      .withColumn("is_test", col("day") > date_sub(col("__mx"), 7))
      .drop("__mx")
    val train = split.filter(!col("is_test"))
    val test = split.filter(col("is_test")).select("day", "units")
    // constant forecast = train mean (stand-in for the notebook's
    // Prophet fit, which is excluded from oracles per SURVEY §5.3)
    val fc = train.agg(round(avg(col("units")), 6).as("yhat"))
    val joined = test.crossJoin(fc) // G5 degenerate: constant yhat
    joined.agg(
      round(Metrics.maeRows(col("units"), col("yhat")), 6).as("mae"),
      round(Metrics.rmseRows(col("units"), col("yhat")), 6).as("rmse"),
      count(lit(1)).as("n_test"))
  }

  /** forecast_results-shaped frame built deterministically from
    * lineitem (the §3.3 report job's input: stringified forecast
    * arrays, fractional inventory columns, some zero order
    * quantities). Array elements are integral-valued so the
    * stringified form is identical across engines.
    */
  private def reportInput(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"), col("l_returnflag"))
      .agg(
        round(avg(col("l_discount")) * 1000.0, 3).as("MAPE"),
        sum(col("l_quantity")).as("__sq"),
        max(col("l_quantity")).as("__mq"),
        round(stddev_pop(col("l_quantity")), 3).as("Safety_Stock"),
        round(avg(col("l_quantity")), 2).as("__avgq"),
        round(sum(col("l_discount")), 3).as("Runtime_sec"))
      .select(
        col("l_suppkey").cast("string").as("SKU"),
        col("l_returnflag").as("Store"),
        col("MAPE"),
        concat(lit("["), col("__sq").cast("bigint").cast("string"),
          lit(".0, "), col("__mq").cast("bigint").cast("string"),
          lit(".0]")).as("Forecast"),
        col("Safety_Stock"),
        (col("Safety_Stock") + col("__avgq")).as("Reorder_Point"),
        when(col("l_suppkey") % 3 === 0, lit(0.0))
          .otherwise(col("__avgq")).as("Qty_to_Order"),
        col("Runtime_sec"))

  /** §3.3 report stage end to end: rename → coerce → parse stringified
    * arrays → derived/base columns → bround int casts → quality bands
    * + interpretation text columns (generador.py:31-158 semantics).
    */
  def reportStage(s: SparkSession, dir: String): DataFrame = {
    val cleaned = Report.clean(reportInput(s, dir))
    Report.withInterpretation(cleaned)
      .select("StockCode", "StoreID", "MAPE", "Forecast_Total",
        "Forecast_Weeks", "Need_Reorder", "RMSE", "Safety_Stock",
        "Reorder_Point", "Qty_to_Order", "Duracion_sec", "Quality_Band",
        "Quality_Color", "Pedido_Text", "Logistica_Text", "Header_Text")
      .orderBy("StockCode", "StoreID")
  }

  /** §3.3 global header aggregates (generador.py:180-183). */
  def reportGlobal(s: SparkSession, dir: String): DataFrame =
    Report.globalStats(Report.clean(reportInput(s, dir)))
      .select(col("n_series"), col("n_reorder"),
        round(col("mean_mape"), 6).as("mean_mape"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_slice" -> ((s, d) => Canon.stringifyArrays(e2eSlice(s, d))),
    "kernel_ma" -> ((s, d) => Canon.stringifyArrays(kernelMa(s, d))),
    "notebook_flow" -> ((s, d) => notebookFlow(s, d)),
    // same pipeline at the fine grain ((part, flag) series — stresses
    // group parallelism and densification amplification rather than
    // series length). UNBOUNDED: gates filter on the sparse frame
    // before densify, so the ~20x zero-row amplification (600k -> ~12M
    // at sf0.1) is paid only for surviving groups.
    "e2e_slice_partkey" -> ((s, d) => Canon.stringifyArrays(
      e2eSlice(s, d, skuCol = "l_partkey"))),
    // the same fine-grain workload through the TYPED KERNEL: per-series
    // calendar-bounded densify inside flatMap instead of materializing
    // dense rows through window passes — the physical strategy a 100 TB
    // fine-grain run should pick. Runs with oracleCompat=true (6dp MA
    // rounding + Spark-percentile product order, PipelineConfig doc) so
    // EVERY column, mape included, hash-matches the SQL oracle exactly
    // even at ~6000 series where the reference's unrounded-MA floats
    // land on .0005 banker's boundaries.
    "kernel_ma_partkey" -> ((s, d) => Canon.stringifyArrays(
      kernelMa(s, d, skuCol = "l_partkey", oracleCompat = true))),
    "report_stage" -> ((s, d) => reportStage(s, d)),
    "report_global" -> ((s, d) => reportGlobal(s, d)),
    // A5 paragraph columns (round-15): the reference's per-SKU
    // <para> inner markup — header+runtime, pedido, logística,
    // precisión with the F5 color band — as oracled engine strings;
    // Report.renderDocument assembles the self-contained document
    // from exactly these columns (spec-pinned equality)
    "report_render" -> ((s, d) => {
      Report.withReportParas(
        Report.withInterpretation(Report.clean(reportInput(s, d))))
        .select("StockCode", "StoreID", "Quality_Color",
          "Para_Header", "Para_Pedido", "Para_Logistica",
          "Para_Precision")
        .orderBy("StockCode", "StoreID")
    }),
    // as-of join: every click gets the user's latest purchase value
    // at-or-before the click time (DuckDB's native ASOF JOIN is the
    // oracle for the composed union+window form)
    "asof_join" -> ((s, d) => {
      val ev = Ingest.tableNanos(s, d, "events", Seq("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      Joins.asOfJoin(clicks, purchases, Seq("user_id"), "ts",
        Seq("value"))
        .orderBy("event_id")
    }),
    // Full J1+J2+J3 ensemble kernel. The iterative model fits (OLS,
    // Holt-Winters grid search) are not SQL-expressible (SURVEY §5.3),
    // so the oracle checks what IS: per-series membership (gates),
    // the winsorized/split test arrays, and safety_stock (train-only
    // math), plus invariant booleans over the model-dependent outputs
    // (forecast length/nonnegativity, mape >= 0, the H3/H4 orderings
    // rop >= ss and qty <= rop that hold by construction). Model
    // VALUES are pinned by ModelsSpec/KernelSpec unit tests.
    "kernel_full" -> ((s, d) => {
      Kernel.run(Clean.nonNegative(sales(s, d), "units"),
        PipelineConfig())
        .select(col("sku"), col("store"),
          expr("transform(test, x -> round(x, 6))").as("test"),
          col("safety_stock").cast("long").as("safety_stock"),
          (size(col("forecast")) === 4).as("n_fc_ok"),
          expr("forall(forecast, x -> x >= 0D)").as("fc_nonneg"),
          (col("mape") >= 0.0).as("mape_ok"),
          (col("reorder_point") >= col("safety_stock")).as("rop_ge_ss"),
          (col("qty_to_order") <= col("reorder_point")).as("qty_le_rop"))
        .transform(Canon.stringifyArrays)
        .orderBy("sku", "store")
    }))

  /** Shared oracle SQL for the e2e semantics (both the relational form
    * and the typed kernel must match it).
    */
  private val wsun =
    "CAST(l_shipdate AS DATE) + to_days(CAST((7 - isodow(CAST(l_shipdate AS DATE))) % 7 AS INT))"

  /** @param mapeRound "round" for the relational slice (Spark `round` =
    *   half-away); "round_even" for the typed kernel, whose
    *   `math.rint(mape*1000)/1000` is banker's like the reference's
    *   Python round().
    */
  /** CTE chain shared by the e2e-slice oracles and the kernel_full
    * invariant oracle: sales → weekly dense → gates → winsorize →
    * split → series arrays → MA forecast → stats → mape → inventory.
    */
  private def e2eCtes(mapeRound: String,
      skuCol: String = "l_suppkey",
      where: String = "WHERE l_quantity >= 0"): String =
    s"""WITH sales AS (
       |  SELECT CAST($skuCol AS VARCHAR) AS sku, l_returnflag AS store,
       |         l_shipdate, l_quantity AS units
       |  FROM lineitem $where),
       |wk AS (
       |  SELECT sku, store, $wsun AS week, sum(units) AS units
       |  FROM sales GROUP BY 1, 2, 3),
       |bounds AS (SELECT sku, store, min(week) AS w0, max(week) AS w1
       |           FROM wk GROUP BY 1, 2),
       |grid AS (SELECT sku, store,
       |           CAST(unnest(generate_series(w0, w1, INTERVAL 7 DAY)) AS DATE) AS week
       |         FROM bounds),
       |dense AS (SELECT g.sku, g.store, g.week,
       |                 coalesce(wk.units, 0.0) AS units
       |          FROM grid g LEFT JOIN wk USING (sku, store, week)),
       |gated AS (
       |  SELECT * FROM (
       |    SELECT sku, store, week, units,
       |      count(*) OVER (PARTITION BY sku, store) AS wks,
       |      sum(units) OVER (PARTITION BY sku, store) AS tot
       |    FROM dense)
       |  WHERE wks >= 12 AND tot >= 10),
       |wins AS (
       |  SELECT sku, store, week,
       |    CASE WHEN npos > 5
       |         THEN least(greatest(units, q01), q99) ELSE units END AS units
       |  FROM (
       |    SELECT sku, store, week, units,
       |      count(CASE WHEN units > 0 THEN 1 END)
       |        OVER (PARTITION BY sku, store) AS npos,
       |      quantile_cont(CASE WHEN units > 0 THEN units END, 0.01)
       |        OVER (PARTITION BY sku, store) AS q01,
       |      quantile_cont(CASE WHEN units > 0 THEN units END, 0.99)
       |        OVER (PARTITION BY sku, store) AS q99
       |    FROM gated)),
       |split AS (
       |  SELECT sku, store, week, units,
       |    row_number() OVER (PARTITION BY sku, store ORDER BY week DESC)
       |      AS rn_desc
       |  FROM wins),
       |series AS (
       |  SELECT sku, store,
       |    list(units ORDER BY week) FILTER (WHERE rn_desc > 4) AS train,
       |    list(units ORDER BY week) FILTER (WHERE rn_desc <= 4) AS test
       |  FROM split GROUP BY 1, 2),
       |fc AS (
       |  SELECT sku, store, train, test,
       |    round(list_sum(list_slice(train,
       |            greatest(len(train) - 3, 1), len(train)))
       |          / least(len(train), 4), 6) AS ma
       |  FROM series),
       |stats AS (
       |  SELECT sku, store, train, test, ma,
       |    [greatest(ma, 0.0) FOR i IN range(4)] AS forecast,
       |    round(sqrt(greatest(
       |      list_sum(list_transform(train, x -> x * x)) / len(train)
       |      - pow(list_sum(train) / len(train), 2), 0.0)), 6) AS train_std,
       |    train[-1] AS last_units
       |  FROM fc),
       |mape0 AS (
       |  SELECT sku, store, forecast, test, train, train_std, last_units, ma,
       |    CASE
       |      WHEN len(list_filter(test, x -> x != 0)) > 0
       |      THEN list_sum(list_transform(range(1, len(test) + 1),
       |             i -> CASE WHEN test[i] != 0
       |                  THEN abs((test[i] - forecast[i]) / test[i]) END))
       |           / len(list_filter(test, x -> x != 0)) * 100
       |      ELSE list_sum(list_transform(range(1, len(test) + 1),
       |             i -> abs(test[i] - forecast[i]))) / len(test)
       |      END AS mape_raw
       |  FROM stats),
       |mape AS (
       |  SELECT sku, store, forecast, test, train, train_std, last_units,
       |    ma, mape_raw, $mapeRound(mape_raw, 3) AS mape
       |  FROM mape0),
       |inv AS (
       |  SELECT sku, store, mape, mape_raw, forecast, test,
       |    CASE WHEN len(train) > 1
       |         THEN round(1.645 * train_std * sqrt(0.4285), 6)
       |         ELSE 0.0 END AS ss,
       |    round(ma * 0.4285, 6) AS dlt,
       |    last_units
       |  FROM mape)""".stripMargin

  /** Array columns serialize to the same canonical strings as
    * [[Canon.stringifyArrays]] (`%.6f` elements, comma-joined).
    */
  private def e2eOracle(mapeRound: String,
      skuCol: String = "l_suppkey",
      where: String = "WHERE l_quantity >= 0"): String =
    s"""${e2eCtes(mapeRound, skuCol, where)}
       |SELECT sku, store, mape,
       |  array_to_string(list_transform(forecast,
       |    x -> printf('%.6f', x + 0.0)), ',') AS forecast,
       |  array_to_string(list_transform(test,
       |    x -> printf('%.6f', round(x, 6) + 0.0)), ',') AS test,
       |  CAST(round_even(greatest(ss, 0.0), 0) AS BIGINT) AS safety_stock,
       |  CAST(round_even(greatest(dlt + ss, 0.0), 0) AS BIGINT) AS reorder_point,
       |  CAST(round_even(greatest(greatest(0.0, dlt + ss - last_units), 0.0), 0)
       |    AS BIGINT) AS qty_to_order
       |FROM inv ORDER BY sku, store""".stripMargin

  /** kernel_ma_partkey oracle: every column exact, mape included —
    * the query runs the kernel with oracleCompat=true.
    */
  private def kernelMaPartkeyOracle: String =
    s"""${e2eCtes("round_even", "l_partkey")}
       |SELECT sku, store,
       |  CAST(round_even(CAST(mape_raw AS DECIMAL(28,12)), 3) AS DOUBLE)
       |    AS mape,
       |  array_to_string(list_transform(forecast,
       |    x -> printf('%.6f', x + 0.0)), ',') AS forecast,
       |  array_to_string(list_transform(test,
       |    x -> printf('%.6f', round(x, 6) + 0.0)), ',') AS test,
       |  CAST(round_even(greatest(ss, 0.0), 0) AS BIGINT) AS safety_stock,
       |  CAST(round_even(greatest(dlt + ss, 0.0), 0) AS BIGINT) AS reorder_point,
       |  CAST(round_even(greatest(greatest(0.0, dlt + ss - last_units), 0.0), 0)
       |    AS BIGINT) AS qty_to_order
       |FROM inv ORDER BY sku, store""".stripMargin

  /** kernel_full oracle: exact on membership, test arrays, and
    * safety_stock; literal TRUE for the model-dependent invariants the
    * Spark side computes (see the `kernel_full` query comment).
    */
  private def kernelFullOracle: String =
    s"""${e2eCtes("round_even")}
       |SELECT sku, store,
       |  array_to_string(list_transform(test,
       |    x -> printf('%.6f', round(x, 6) + 0.0)), ',') AS test,
       |  CAST(round_even(greatest(ss, 0.0), 0) AS BIGINT) AS safety_stock,
       |  TRUE AS n_fc_ok, TRUE AS fc_nonneg, TRUE AS mape_ok,
       |  TRUE AS rop_ge_ss, TRUE AS qty_le_rop
       |FROM inv ORDER BY sku, store""".stripMargin

  private val reportBaseCte =
    """base AS (
      |  SELECT CAST(l_suppkey AS VARCHAR) AS StockCode,
      |    l_returnflag AS StoreID,
      |    round(avg(l_discount) * 1000.0, 3) AS mape,
      |    sum(l_quantity) AS sq, max(l_quantity) AS mq,
      |    round(stddev_pop(l_quantity), 3) AS ss_raw,
      |    round(avg(l_quantity), 2) AS avgq,
      |    round(sum(l_discount), 3) AS dur,
      |    l_suppkey AS sk
      |  FROM lineitem GROUP BY l_suppkey, l_returnflag),
      |derived AS (
      |  SELECT StockCode, StoreID, mape,
      |    sq + mq AS fc_total_raw,
      |    ss_raw, ss_raw + avgq AS rop_raw,
      |    CASE WHEN sk % 3 = 0 THEN 0.0 ELSE avgq END AS qty_raw,
      |    dur
      |  FROM base),
      |cleaned AS (
      |  SELECT StockCode, StoreID, mape AS MAPE,
      |    CAST(round_even(fc_total_raw, 0) AS INT) AS Forecast_Total,
      |    CAST(2 AS INT) AS Forecast_Weeks,
      |    qty_raw > 0 AS Need_Reorder,
      |    CAST(0.0 AS DOUBLE) AS RMSE,
      |    CAST(round_even(ss_raw, 0) AS INT) AS Safety_Stock,
      |    CAST(round_even(rop_raw, 0) AS INT) AS Reorder_Point,
      |    CAST(round_even(qty_raw, 0) AS INT) AS Qty_to_Order,
      |    dur AS Duracion_sec
      |  FROM derived)""".stripMargin

  val oracle: Map[String, String] = Map(
    "e2e_slice" -> e2eOracle("round"),
    "e2e_slice_partkey" -> e2eOracle("round", "l_partkey"),
    "kernel_ma" -> e2eOracle("round_even"),
    "kernel_ma_partkey" -> kernelMaPartkeyOracle,
    "kernel_full" -> kernelFullOracle,
    "report_stage" ->
      s"""WITH $reportBaseCte
         |SELECT StockCode, StoreID, MAPE, Forecast_Total,
         |  Forecast_Weeks, Need_Reorder, RMSE, Safety_Stock,
         |  Reorder_Point, Qty_to_Order, Duracion_sec,
         |  CASE WHEN MAPE < 10.0 THEN 'alta precisión'
         |       WHEN MAPE < 50.0 THEN 'aceptable'
         |       ELSE 'baja precisión' END AS Quality_Band,
         |  CASE WHEN MAPE < 10.0 THEN 'green'
         |       WHEN MAPE < 50.0 THEN 'orange'
         |       ELSE 'red' END AS Quality_Color,
         |  CASE WHEN Need_Reorder THEN printf(
         |    'RECOMENDACIÓN CLAVE: Se debe realizar un pedido de %d unidades para evitar una posible rotura de stock.',
         |    Qty_to_Order)
         |  ELSE 'RECOMENDACIÓN CLAVE: No se requiere realizar un pedido inmediato (el inventario actual está por encima del ROP).'
         |  END AS Pedido_Text,
         |  printf(
         |    'El punto de reorden (ROP) es de %d unidades. El stock de seguridad (SS) calculado es de %d unidades. La demanda pronosticada para las %d semanas siguientes es de %d unidades.',
         |    Reorder_Point, Safety_Stock, Forecast_Weeks, Forecast_Total)
         |    AS Logistica_Text,
         |  printf('Análisis Detallado de SKU: %s en %s', StockCode,
         |    StoreID) AS Header_Text
         |FROM cleaned ORDER BY StockCode, StoreID""".stripMargin,
    "report_render" ->
      s"""WITH $reportBaseCte
         |SELECT StockCode, StoreID,
         |  CASE WHEN MAPE < 10.0 THEN 'green'
         |       WHEN MAPE < 50.0 THEN 'orange'
         |       ELSE 'red' END AS Quality_Color,
         |  printf('<font size="14"><b>Análisis Detallado de SKU: %s en %s</b></font><br/><font size="10">Duración del procesamiento: %.2f segundos</font>',
         |    StockCode, StoreID, round(Duracion_sec, 2)) AS Para_Header,
         |  concat('<font size="12"><b>1. Decisión de Pedido:</b></font><br/>',
         |    CASE WHEN Need_Reorder THEN printf(
         |      'RECOMENDACIÓN CLAVE: Se debe realizar un pedido de <b>%d unidades</b> para evitar una posible rotura de stock.',
         |      Qty_to_Order)
         |    ELSE 'RECOMENDACIÓN CLAVE: No se requiere realizar un pedido inmediato (el inventario actual está por encima del ROP).'
         |    END) AS Para_Pedido,
         |  printf('<font size="12"><b>2. Parámetros Logísticos:</b></font><br/>El punto de reorden (ROP) es de <b>%d unidades</b>.<br/>El stock de seguridad (SS) calculado es de <b>%d unidades</b>.<br/>La demanda pronosticada para las %d semanas siguientes es de <b>%d unidades</b>.',
         |    Reorder_Point, Safety_Stock, Forecast_Weeks,
         |    Forecast_Total) AS Para_Logistica,
         |  printf('<font size="12"><b>3. Calidad del Pronóstico:</b></font><br/><font color="%s"> %s (RMSE: %.2f).</font>',
         |    CASE WHEN MAPE < 10.0 THEN 'green'
         |         WHEN MAPE < 50.0 THEN 'orange'
         |         ELSE 'red' END,
         |    CASE WHEN MAPE < 10.0 THEN printf(
         |      'El modelo muestra una <b>alta precisión</b> (MAPE: %.2f%%). Las predicciones son muy fiables.',
         |      round(MAPE, 2))
         |    WHEN MAPE < 50.0 THEN printf(
         |      'La precisión del modelo es <b>aceptable</b> (MAPE: %.2f%%). Requiere monitorización.',
         |      round(MAPE, 2))
         |    ELSE printf(
         |      'El modelo tuvo una <b>baja precisión</b> (MAPE: %.2f%%), lo que indica demanda intermitente o volátil. La decisión se basa fuertemente en el Stock de Seguridad.',
         |      round(MAPE, 2))
         |    END,
         |    round(RMSE, 2)) AS Para_Precision
         |FROM cleaned ORDER BY StockCode, StoreID""".stripMargin,
    "asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT c.user_id, c.ts, c.event_id,
        |  p.ts AS matched_ts, p.value AS matched_value
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "report_global" ->
      s"""WITH $reportBaseCte
         |SELECT count(*) AS n_series,
         |  count(*) FILTER (WHERE Need_Reorder) AS n_reorder,
         |  round(avg(MAPE), 6) AS mean_mape
         |FROM cleaned""".stripMargin,
    "notebook_flow" ->
      """WITH ev AS (
        |  SELECT * FROM events
        |  WHERE event_type = 'click' AND user_id < 50),
        |sparse AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    sum(value) AS units
        |  FROM ev GROUP BY 1),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM sparse),
        |grid AS (SELECT CAST(unnest(generate_series(d0, d1,
        |           INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |daily AS (
        |  SELECT g.day, round(coalesce(s.units, 0.0), 6) AS units
        |  FROM grid g LEFT JOIN sparse s USING (day)),
        |lagged AS (
        |  SELECT day, units,
        |    lag(units, 1) OVER w AS lag_1, lag(units, 7) OVER w AS lag_7
        |  FROM daily WINDOW w AS (ORDER BY day)),
        |clean AS (
        |  SELECT * FROM lagged
        |  WHERE lag_1 IS NOT NULL AND lag_7 IS NOT NULL),
        |split AS (
        |  SELECT day, units,
        |    row_number() OVER (ORDER BY day DESC) <= 7 AS is_test
        |  FROM clean),
        |fc AS (SELECT round(avg(units), 6) AS yhat FROM split
        |       WHERE NOT is_test)
        |SELECT round(avg(abs(units - yhat)), 6) AS mae,
        |  round(sqrt(avg(pow(units - yhat, 2))), 6) AS rmse,
        |  count(*) AS n_test
        |FROM split, fc WHERE is_test""".stripMargin)
}
