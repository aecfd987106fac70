package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      numParts: Int = 32): DataFrame =
    Dist.prefixSum(perItem,
        Seq(col("revenue").desc, col(key)), "revenue", "__cum",
        numParts, withTotal = true)
      .select(col(key), col("revenue"),
        round(col("__cum").cast("double") /
          col("__cum_total").cast("double"), 6).as("cum_share"),
        round((col("__cum") - col("revenue")).cast("double") /
          col("__cum_total").cast("double"), 6).as("prev_share"))

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

  /** Syntetos-Boylan demand classification: each item lands in one of
    * the four forecastability quadrants from (ADI, CV²) — smooth
    * (frequent, regular), intermittent (infrequent, regular), erratic
    * (frequent, variable), lumpy (infrequent AND variable) — the
    * standard routing signal for which forecast model to run (MA/ES
    * for smooth, Croston/SBA for intermittent and lumpy). ADI = mean
    * inter-demand interval in weeks ((last − first) / (n − 1) over
    * demand weeks); CV² = (σ/μ)² of the NONZERO demand sizes
    * (population σ); cutoffs 1.32 / 0.49 (Syntetos, Boylan &
    * Croston 2005 — public literature constants). Items with one
    * demand week have no interval: class "single", null ADI/CV².
    * One map-side-combined aggregate per item over the SPARSE weekly
    * frame (the dense grid is never built — zeros carry no
    * information here), no window, no join: the cheapest possible
    * shape at any scale.
    */
  def demandClass(weekly: DataFrame, key: String,
      adiCut: Double = 1.32, cv2Cut: Double = 0.49,
      weekCol: String = "week", valueCol: String = "units")
      : DataFrame =
    weekly.filter(col(valueCol) > 0)
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("__n"),
        min(col(weekCol)).as("__w0"),
        max(col(weekCol)).as("__w1"),
        // integral moments, not avg/stddev_pop: weekly units are
        // integral-valued doubles, so n, Σx, Σx² are EXACT and the
        // closed form below is bit-identical in any engine — builtin
        // stddev_pop implementations differ in the last ulp, which
        // flips a 6dp rounding boundary (same trick as demandAnomaly)
        sum(col(valueCol)).as("__s1"),
        sum(col(valueCol) * col(valueCol)).as("__s2"))
      .withColumn("__mu", col("__s1") / col("__n"))
      .withColumn("adi", when(col("__n") > 1,
        round((datediff(col("__w1"), col("__w0")) / lit(7.0)) /
          (col("__n") - 1), 6)))
      .withColumn("cv2", when(col("__n") > 1,
        round((col("__s2") / col("__n") - col("__mu") * col("__mu")) /
          (col("__mu") * col("__mu")), 6)))
      .withColumn("demand_class",
        when(col("__n") === 1, "single")
          .when(col("adi") < adiCut && col("cv2") < cv2Cut, "smooth")
          .when(col("adi") >= adiCut && col("cv2") < cv2Cut,
            "intermittent")
          .when(col("adi") < adiCut, "erratic")
          .otherwise("lumpy"))
      .select(col(key), col("__n").as("n_demand_weeks"), col("adi"),
        col("cv2"), col("demand_class"))

  /** Return rate per product group with a Wilson score interval —
    * the uncertainty-aware ranking that stops a 1-of-2-returned item
    * from outranking a 400-of-1000 one (a plain rate sort does
    * exactly that). Counts come from one map-side-combined
    * aggregate; the interval is closed-form double arithmetic over
    * integer counts, spelled identically on both engines, so the
    * result is engine-exact. The dimension join broadcasts.
    */
  def returnRateCI(lineitem: DataFrame, part: DataFrame,
      groupCol: String = "p_brand", z: Double = 1.96): DataFrame = {
    val counts = lineitem
      .join(broadcast(part.select(col("p_partkey"), col(groupCol))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returns"))
    val nD = col("n").cast("double")
    val phat = col("n_returns").cast("double") / nD
    val z2 = lit(z) * lit(z)
    val denom = lit(1.0) + z2 / nD
    val center = (phat + z2 / (lit(2.0) * nD)) / denom
    val margin = lit(z) *
      sqrt(phat * (lit(1.0) - phat) / nD +
        z2 / (lit(4.0) * nD * nD)) / denom
    counts.select(col(groupCol), col("n"), col("n_returns"),
      round(phat, 6).as("return_rate"),
      round(center - margin, 6).as("ci_lo"),
      round(center + margin, 6).as("ci_hi"))
  }

  /** Log-log price elasticity of demand per product group: the OLS
    * slope of ln(quantity) on ln(unit price), computed from moment
    * sums (n, Σx, Σy, Σxy, Σx²) in ONE aggregation pass — the
    * closed-form regression, no iterative fitting. Each ln() term is
    * cast to DECIMAL(28,6) before summing (the corr_pairs recipe):
    * the sums are then order-independent and bit-identical on any
    * engine/partitioning, where a double accumulation would drift
    * with partition count. The product dimension broadcasts; the
    * only shuffle is the per-group moment aggregate, map-side
    * combined.
    */
  def elasticity(lineitem: DataFrame, part: DataFrame,
      groupCol: String = "p_brand"): DataFrame = {
    val j = lineitem
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .join(broadcast(part.select(col("p_partkey"), col(groupCol))),
        col("l_partkey") === col("p_partkey"))
      .select(col(groupCol),
        log(col("l_extendedprice") / col("l_quantity")).as("__x"),
        log(col("l_quantity")).as("__y"))
    def dsum(c: Column) = sum(c.cast("decimal(28,6)"))
    j.groupBy(col(groupCol)).agg(
        count(lit(1)).as("__n"),
        dsum(col("__x")).as("__sx"), dsum(col("__y")).as("__sy"),
        dsum(col("__x") * col("__y")).as("__sxy"),
        dsum(col("__x") * col("__x")).as("__sxx"))
      .select(col(groupCol), col("__n").as("n_obs"),
        round(
          (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double") /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double"), 6).as("elasticity"))
  }

  /** Seasonal demand ENVELOPE: p10/p50/p90 of per-series weekly
    * demand grouped by ISO week-of-year — the percentile band a
    * planner overlays on this year's actuals ("is week 47 running
    * hot against its own history?"), where [[Retail.demandClass]]
    * summarizes a series and the seasonality index only the mean.
    * One grouped exact-percentile aggregate over the sparse weekly
    * frame; 53 output rows regardless of scale.
    */
  def demandEnvelope(weekly: DataFrame, weekCol: String = "week",
      valueCol: String = "units"): DataFrame =
    weekly.groupBy(weekofyear(col(weekCol)).cast("long").as("woy"))
      .agg(count(lit(1)).as("n_obs"),
        round(expr(s"percentile($valueCol, 0.1)"), 6).as("p10"),
        round(expr(s"percentile($valueCol, 0.5)"), 6).as("p50"),
        round(expr(s"percentile($valueCol, 0.9)"), 6).as("p90"))

  /** Series coverage gaps: the missing-week INTERVALS between each
    * series' observed weeks — the data-quality complement of densify
    * (which silently fills them with zeros): a 12-week hole in a
    * top-seller is a pipeline incident, not twelve zero-sales weeks.
    * One `lag` window per series key (doc-local, uniform partition),
    * gap rows only — output is bounded by observation count, the
    * dense grid is never built.
    */
  def coverageGaps(weekly: DataFrame, keys: Seq[String],
      weekCol: String = "week"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(weekCol))
    weekly.select((keys.map(col) :+ col(weekCol)): _*)
      .withColumn("__prev", lag(col(weekCol), 1).over(w))
      .filter(datediff(col(weekCol), col("__prev")) > 7)
      .select((keys.map(col) :+
        date_add(col("__prev"), 7).as("gap_start") :+
        date_sub(col(weekCol), 7).as("gap_end") :+
        (datediff(col(weekCol), col("__prev")) / 7 - 1).cast("long")
          .as("missing_weeks")): _*)
  }

  /** Robust per-series outliers via the MAD modified z-score
    * (Iglewicz-Hoaglin): |0.6745 · (x − median) / MAD| > thresh,
    * where MAD = median(|x − median|). Unlike the trailing-σ
    * [[demandAnomaly]], the median/MAD baseline is immune to the
    * outliers it is hunting — one 500-unit spike inflates a stddev
    * baseline enough to hide itself, but moves the median not at
    * all. Degenerate MAD = 0 (at least half the weeks identical):
    * the z-score is undefined — any differing value flags, mz null.
    * Scale shape: two grouped exact-percentile aggregates (median,
    * then MAD over the deviations) + two key joins, all on the
    * series key; no global window. Emits ONLY the outlier rows.
    */
  def madOutliers(weekly: DataFrame, keys: Seq[String],
      valueCol: String = "units", thresh: Double = 3.5,
      weekCol: String = "week"): DataFrame = {
    val kc = keys.map(col)
    val med = weekly.groupBy(kc: _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withDev = weekly.join(med, keys)
      .withColumn("__ad", abs(col(valueCol) - col("med")))
    val mad = withDev.groupBy(kc: _*)
      .agg(expr("percentile(__ad, 0.5)").as("mad"))
    withDev.join(mad, keys)
      // threshold compares the UNROUNDED score — filtering on the 6dp
      // display round would flip rows within half an ulp of the cutoff
      // against an oracle that filters raw
      .withColumn("__mzr",
        lit(0.6745) * (col(valueCol) - col("med")) / col("mad"))
      .withColumn("mz", when(col("mad") > 0, round(col("__mzr"), 6)))
      .filter(
        (col("mad") > 0 && abs(col("__mzr")) > thresh) ||
        (col("mad") === 0 && col(valueCol) =!= col("med")))
      .select((kc :+ col(weekCol) :+ col(valueCol) :+
        round(col("med"), 6).as("med") :+
        round(col("mad"), 6).as("mad") :+ col("mz")): _*)
  }

  /** Demand-spike detection: each day's demand scored against the
    * TRAILING `windowDays`-day baseline (event-time RANGE frame that
    * EXCLUDES the current day — the spike must not contaminate its
    * own baseline). Moments are computed manually (n, Σx, Σx²) so
    * both engines evaluate the identical closed form: daily demand
    * sums are integral-valued doubles, making the window sums exact
    * regardless of accumulation order — a built-in `stddev` would
    * instead hit engine-specific streaming-variance accumulation.
    * Per-key windows: the shuffle is one hash exchange on the series
    * key; no global sort anywhere. Days with fewer than `minObs`
    * baseline points score NULL (cold start is not an anomaly).
    */
  def demandAnomaly(lineitem: DataFrame, keys: Seq[String],
      tsCol: String, qtyCol: String, windowDays: Int = 28,
      minObs: Int = 7, zThresh: Double = 3.0): DataFrame = {
    val daily = lineitem
      .groupBy((keys.map(col) :+ col(tsCol)): _*)
      .agg(sum(col(qtyCol)).as("qty"))
    // NTZ won't cast straight to long; session TZ is UTC so the LTZ
    // hop is identity and unix seconds are a faithful range key
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).cast("timestamp_ltz").cast("long"))
      .rangeBetween(-windowDays.toLong * 86400, -86400)
    val scored = daily
      .withColumn("__n", count(col("qty")).over(w))
      .withColumn("__s", sum(col("qty")).over(w))
      .withColumn("__ss", sum(col("qty") * col("qty")).over(w))
      .withColumn("__mean", col("__s") / col("__n"))
      // clamp at 0: identical-valued baselines can go epsilon-negative
      .withColumn("__std", sqrt(greatest(
        (col("__ss") - col("__s") * col("__s") / col("__n")) /
          col("__n"), lit(0.0))))
      .withColumn("z",
        when(col("__n") >= minObs && col("__std") > 0,
          round((col("qty") - col("__mean")) / col("__std"), 6)))
    scored.select((keys.map(col) :+ col(tsCol) :+ col("qty") :+
      when(col("__n") >= minObs, round(col("__mean"), 6))
        .as("base_mean") :+
      when(col("__n") >= minObs, round(col("__std"), 6))
        .as("base_std") :+
      col("z") :+
      coalesce(abs(col("z")) > zThresh, lit(false))
        .as("is_anomaly")): _*)
  }

  /** Market-basket co-occurrence with support and lift. Shape chosen
    * for scale:
    *
    *   - ONE shuffle builds per-order item sets (`collect_set` after a
    *     distinct on (order, item) — the same distinct frame also
    *     yields the per-item marginals, so the raw table is scanned
    *     once);
    *   - pairs are generated ROW-LOCALLY from each sorted basket with
    *     nested `transform` + `flatten` (i<j), never via an
    *     order-keyed self-join — a self-join would shuffle the full
    *     frame twice and blow up k² inside the join for hot orders;
    *   - `maxBasket` drops pathological mega-baskets BEFORE pair
    *     explosion, deterministically bounding the k² term (a B2B
    *     order with 10⁴ items would otherwise emit 5·10⁷ pairs);
    *   - the marginal join is keyed on the item id — broadcast when
    *     the item dimension fits, hash-shuffle on the same key
    *     otherwise; both sides are already aggregated (≪ raw rows).
    *
    * lift = P(a,b) / (P(a)·P(b)) with probabilities over orders.
    */
  def basketLift(lineitem: DataFrame, key: String = "l_partkey",
      orderCol: String = "l_orderkey", minSupport: Long = 2,
      maxBasket: Int = 64): DataFrame = {
    // ONE shuffle + ONE raw-table scan: collect_set dedups line items
    // into the per-order basket, and the checkpoint pins the small
    // aggregated frame (one row per order) so the three consumers
    // below (order count, marginals, pairs) don't each re-scan the
    // raw table — without it Spark re-executes the diamond DAG from
    // the source once per branch
    val baskets = lineitem
      .select(col(orderCol).as("__ord"), col(key).as("__item"))
      .groupBy("__ord")
      .agg(sort_array(collect_set(col("__item"))).as("__basket"))
      .localCheckpoint()
    val nOrders = baskets.agg(count(lit(1)).as("__n_orders"))
    val marginals = baskets
      .select(explode(col("__basket")).as("__item"))
      .groupBy(col("__item"))
      .agg(count(lit(1)).as("__item_count"))
    val pairs = baskets
      .filter(size(col("__basket")) <= maxBasket)
      .select(explode(flatten(expr(
        """transform(__basket, (x, i) ->
          |  transform(slice(__basket, i + 2, size(__basket)),
          |    y -> struct(x AS a, y AS b)))""".stripMargin)))
        .as("__p"))
      .groupBy(col("__p.a").as("item_a"), col("__p.b").as("item_b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minSupport)
    pairs
      .join(broadcast(marginals
        .withColumnRenamed("__item", "item_a")
        .withColumnRenamed("__item_count", "__cnt_a")), "item_a")
      .join(broadcast(marginals
        .withColumnRenamed("__item", "item_b")
        .withColumnRenamed("__item_count", "__cnt_b")), "item_b")
      .crossJoin(broadcast(nOrders))
      .select(col("item_a"), col("item_b"), col("pair_count"),
        round(col("pair_count").cast("double") / col("__n_orders"), 6)
          .as("support"),
        round(col("pair_count").cast("double") * col("__n_orders") /
          (col("__cnt_a") * col("__cnt_b")), 6).as("lift"))
  }

  /** Multi-period inventory projection: simulate `horizon` weeks of
    * a (reorder-point, order-quantity) replenishment policy with a
    * `leadWeeks`-week supply lead time, per item. The recurrence
    * (arrivals → demand draw → position check → order) is unrolled
    * into `horizon` chained column expressions — ENTIRELY row-local
    * after one per-item aggregate, so the simulation costs one
    * narrow projection regardless of horizon, and every quantity is
    * INTEGER arithmetic (ceil-divided weekly demand), making the
    * projection bit-exact on any engine. Policy parameters are the
    * simple cover rules (rop = d·(lead+1), oq = d·4); the reference's
    * full H1–H4 stats-based parameters live in [[Inventory]] and
    * plug in the same way. Stockout weeks record lost demand
    * (stock floors at zero, the lost-sales model).
    */
  def inventoryProjection(lineitem: DataFrame, stock: DataFrame,
      key: String, stockCol: String, horizon: Int = 8,
      leadWeeks: Int = 2): DataFrame = {
    require(leadWeeks == 2, "recurrence is unrolled for 2-week lead")
    // DIV, never `/`: Column./ on bigints is DOUBLE division, which
    // silently rounds above 2^53 (the packed-id lesson)
    val base = lineitem.groupBy(col(key)).agg(
      sum(col("l_quantity")).cast("bigint").as("__tot"),
      datediff(max(col("l_shipdate")), min(col("l_shipdate")))
        .cast("bigint").as("__span"))
    var df = stock
      .join(base, Seq(key))
      .withColumn("__nw", expr("__span DIV 7") + 1)
      .withColumn("d", expr("(__tot + __nw - 1) DIV __nw"))
      .withColumn("rop", col("d") * (leadWeeks + 1))
      .withColumn("oq", col("d") * 4)
      .withColumn("__s_0", col(stockCol).cast("bigint"))
      .withColumn("__o1_0", lit(0L))
      .withColumn("__o2_0", lit(0L))
    for (t <- 1 to horizon) {
      df = df
        .withColumn(s"__avail_$t",
          col(s"__s_${t - 1}") + col(s"__o1_${t - 1}") - col("d"))
        .withColumn(s"__s_$t", greatest(col(s"__avail_$t"), lit(0L)))
        .withColumn(s"__lost_$t", col(s"__avail_$t") < 0)
        .withColumn(s"__ord_$t",
          when(col(s"__s_$t") + col(s"__o2_${t - 1}") < col("rop"),
            col("oq")).otherwise(lit(0L)))
        .withColumn(s"__o1_$t", col(s"__o2_${t - 1}"))
        .withColumn(s"__o2_$t", col(s"__ord_$t"))
    }
    val stackArgs = (1 to horizon).map(t =>
      s"CAST($t AS BIGINT), __s_$t, __ord_$t, __lost_$t")
      .mkString(", ")
    df.select(col(key), col("d"), col("rop"), col("oq"),
        expr(s"stack($horizon, $stackArgs)" +
          " AS (week, stock, ordered, stockout)"))
      .select(key, "week", "stock", "ordered", "stockout", "d")
  }

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
