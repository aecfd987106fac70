package graft.queries

import graft.engine._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-contract queries for the SURVEY §2 core operators (A/B/C/D/E/
  * F/G rows), each paired with an exactly-reproducible DuckDB oracle.
  *
  * Reproducibility rules used throughout:
  *   - every query ORDER BYs a unique key on both sides;
  *   - double aggregates whose value depends on summation order are
  *     either computed over integral values (exact in IEEE double) or
  *     rounded to 6 dp on both sides;
  *   - money sums go through decimal(18,2) on both sides (exact);
  *   - integer-ish outputs are cast to bigint on both sides (Spark
  *     row_number is int, DuckDB's is bigint).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.BenchGrain.input(s.read.parquet(s"$dir/$name.parquet"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A: scans ----
    "a1_scan_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // A4+F4 round-trip: the CSV sink's pandas-style array form
    // ("[1.0, 2.0]", the exact expression writeCsvCompat applies) fed
    // back through Clean.parseDoubleArray, proving sink serialization
    // and parse are inverses under the oracle. Array elements are
    // integral-valued doubles so the JSON rendering is byte-identical
    // across engines (fractional shortest-repr can differ between
    // Java 17 Double.toString and DuckDB's Ryu). MAGNITUDE BOUND: the
    // hand-built "[N.0, M.0]" oracle string assumes values < 1e7 —
    // Java renders integral doubles >= 1e7 as "1.0E7" scientific form
    // and the byte compare would break. Holds at any TPC-H sf for
    // per-suppkey quantity sums (~6e5 at sf100); revisit if the
    // grouping key or measure changes.
    "a4_roundtrip" -> ((s, d) => {
      val base = t(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).cast("bigint").cast("double")
            .as("__s"),
          max(col("l_quantity")).cast("bigint").cast("double")
            .as("__m"))
        .select(col("l_suppkey"),
          array(col("__s"), col("__m")).as("__arr"))
      base
        .withColumn("csv_form", Ingest.csvArrayForm(col("__arr")))
        .withColumn("__parsed", Clean.parseDoubleArray(col("csv_form")))
        .select(col("l_suppkey"), col("csv_form"),
          round(Clean.arrayTotal(col("__parsed")), 6).as("total"),
          Clean.arrayWeeks(col("__parsed")).cast("long").as("weeks"),
          (col("__parsed") === col("__arr")).as("roundtrip_ok"))
        .orderBy("l_suppkey")
    }),

    // ---- B: projection / rename / coercion ----
    "b1_rename" -> ((s, d) => {
      Ingest.rename(t(s, d, "lineitem"), Map(
        "l_partkey" -> "product_id", "l_returnflag" -> "store_id",
        "l_quantity" -> "units_sold", "l_missing_col" -> "nope"))
        .select("l_orderkey", "l_linenumber", "product_id", "store_id",
          "units_sold")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "b3_coerce_fill" -> ((s, d) => {
      Ingest.coerceNumeric(
        Ingest.tableNanos(s, d, "events", Seq("ts")).select("event_id", "props", "value"),
        Seq("props", "value"))
        .orderBy("event_id")
    }),
    "b4_b5_b6_derived" -> ((s, d) => {
      val base = t(s, d, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .withColumn("status_str", Ingest.fillStr(
          when(col("o_orderstatus") === "O", lit(null))
            .otherwise(col("o_orderstatus")), "[]"))
        .withColumn("need_reorder",
          Clean.needReorder(col("o_totalprice") - 150000))
      Ingest.withColumnIfAbsent(base, "rmse", lit(0.0))
        .orderBy("o_orderkey")
    }),
    "b7_round_int" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          Clean.roundToInt(col("l_extendedprice") / 100.0)
            .cast("long").as("price_int"),
          Inventory.intClamp(col("l_quantity") / 2.0)
            .cast("long").as("qty_int"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- C: filters ----
    "c1_filter_nonneg" -> ((s, d) => {
      Clean.nonNegative(
        Ingest.tableNanos(s, d, "events", Seq("ts"))
          .select(col("event_id"), (col("value") - 2.5).as("value_c")),
        "value_c")
        .orderBy("event_id")
    }),
    "c2_eq_filter" -> ((s, d) => {
      Ingest.tableNanos(s, d, "events", Seq("ts"))
        .filter(col("event_type") === "click" && col("user_id") === 7)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),
    "c3_dropna_subset" -> ((s, d) => {
      Clean.dropNa(
        t(s, d, "documents").select(col("doc_id"),
          when(col("lang") === "en", lit(null).cast("string"))
            .otherwise(col("lang")).as("lang_nn")),
        Seq("lang_nn"))
        .orderBy("doc_id")
    }),
    "c4_having_gates" -> ((s, d) => {
      val weekly = Resample.weeklyDense(t(s, d, "lineitem"),
        Seq("l_partkey"), "l_shipdate", "l_quantity")
      Series.eligibleGroups(weekly, Seq("l_partkey"),
        PipelineConfig(minWeeks = 250, minTotalSales = 800))
        .withColumn("weeks", col("weeks").cast("long"))
        .orderBy("l_partkey")
    }),
    "c5_masked_mape" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"),
          when(col("l_linenumber") === 7, lit(0.0))
            .otherwise(col("l_quantity")).as("y"),
          (col("l_quantity") * (lit(1.0) - col("l_discount"))).as("yhat"))
      li.groupBy("l_returnflag")
        .agg(round(Metrics.safeMapeRows(col("y"), col("yhat")), 6)
          .as("mape"))
        .orderBy("l_returnflag")
    }),
    "c6_empty_guard" -> ((s, d) => {
      val df = t(s, d, "lineitem").filter(col("l_quantity") < 0)
      s.range(1).select(lit(df.isEmpty).as("is_empty"))
    }),

    // ---- Skew (SURVEY §7.5.5): Zipfian hot key through the salted
    // operators. ~90% of lineitem rows are remapped onto ONE 'HOT'
    // store (the Online-Retail one-dominant-country shape), then a
    // salted dim join (hot key spread over saltFactor buckets, dim
    // exploded to match) feeds a salted two-stage aggregation
    // (partial on (store, salt), final on store). The oracle computes
    // the same result UNSALTED — proving the skew machinery is
    // semantics-preserving, the whole point of Skew.*. Plan audit in
    // PLANS.md shows the split exchanges.
    "skew_salted_agg" -> ((s, d) => {
      val skewed = t(s, d, "lineitem").select(
        when(col("l_orderkey") % 10 < 9, lit("HOT"))
          .otherwise(col("l_returnflag")).as("store"),
        col("l_quantity").as("units"))
      val dim = skewed.select(col("store")).distinct()
        .withColumn("w", length(col("store")).cast("double"))
      val joined = Skew.saltedJoin(skewed, dim, "store", saltFactor = 8)
        .withColumn("wu", col("units") * col("w"))
      Skew.saltedSum(joined, Seq("store"), "wu", saltFactor = 8)
        .orderBy("store")
    }),

    // gap-based sessionization over the event stream (30-minute gap):
    // Spark's native session_window — same code runs on a streaming
    // frame with a watermark. Boundary semantics (merge at exactly
    // the gap, break strictly beyond) mirrored in the oracle's
    // lag/cumsum formulation
    "sessionize" -> ((s, d) => {
      Sessions.sessionAgg(
        Ingest.tableNanos(s, d, "events", Seq("ts"))
          .filter(col("user_id") < 200),
        Seq("user_id"), "ts", "value", "30 minutes")
        .orderBy("user_id", "s_start")
    }),

    // event-time RANGE window frame: trailing 7-day average — frames
    // defined by time distance, not row counts (gaps in the calendar
    // shrink the frame, unlike rowsBetween)
    "rolling_7d" -> ((s, d) => {
      val daily = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_shipdate"))
        .agg(sum(col("l_quantity")).as("qty"))
      // NTZ won't cast straight to long; session TZ is UTC so the
      // LTZ hop is identity and unix seconds are a faithful order key
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_shipdate").cast("timestamp_ltz").cast("long"))
        .rangeBetween(-6L * 86400, 0)
      daily
        .withColumn("qty7", round(avg(col("qty")).over(w), 6))
        .orderBy("l_returnflag", "l_shipdate")
    }),
    // semi-structured extraction: parse the JSON props column with a
    // declared schema (from_json — schema projection, malformed rows
    // null out) and aggregate on the extracted field
    "json_props" -> ((s, d) => {
      Ingest.tableNanos(s, d, "events", Seq("ts"))
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k"))
        .groupBy(pmod(col("k"), lit(10)).cast("long").as("k_mod"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy("k_mod")
    }),
    // ordered funnel over the event log: users completing
    // view -> click -> purchase strictly in order, one row per stage
    "funnel_stages" -> ((s, d) => {
      Sessions.funnel(
        Ingest.tableNanos(s, d, "events", Seq("ts")),
        "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
        .orderBy("stage")
    }),
    // weekly retention cohorts: first-activity week x weeks-later
    // return counts — the standard growth-analytics matrix
    "retention_cohorts" -> ((s, d) => {
      Sessions.retentionCohorts(
        Ingest.tableNanos(s, d, "events", Seq("ts")),
        "user_id", "ts")
        .orderBy("cohort_week", "week_offset")
    }),
    // point-in-interval range join with NO equi key, binned into an
    // equi join (naive form is a broadcast nested loop — n·m at any
    // scale). Intervals derive deterministically from orders; DuckDB's
    // native range join is the oracle
    "range_join" -> ((s, d) => {
      val points = Ingest.tableNanos(s, d, "events", Seq("ts"))
        .select(col("event_id"), col("value"))
      val intervals = t(s, d, "orders")
        .filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"),
          (col("o_orderkey") % 490).cast("double").as("lo"))
        .withColumn("hi", col("lo") + 2.5)
      Joins.rangeJoinBinned(points, intervals, "value", "lo", "hi",
        binWidth = 5.0)
        .select(col("event_id"), col("o_orderkey"), col("value"),
          col("lo"))
        .orderBy("event_id", "o_orderkey")
    }),

    // pandas pct_change over the dense weekly series: week-over-week
    // growth per store — lag window on the resampled frame, null for
    // the first week, null growth on a zero base (pandas inf is not
    // SQL-portable; the mask IS the documented divergence)
    "wow_growth" -> ((s, d) => {
      val weekly = Resample.weeklyDense(t(s, d, "lineitem"),
        Seq("l_returnflag"), "l_shipdate", "l_quantity")
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("week"))
      weekly
        .withColumn("prev", lag(col("units"), 1).over(w))
        .withColumn("growth",
          when(col("prev") > 0,
            round((col("units") - col("prev")) / col("prev"), 6)))
        .select(col("l_returnflag"), col("week"), col("units"),
          col("growth"))
        .orderBy("l_returnflag", "week")
    }),

    // ---- D: grouping / aggregation ----
    // pivot (pandas pivot_table): one column per pivoted key value.
    // Values enumerated explicitly — at scale an un-enumerated pivot
    // runs a distinct scan first AND an unbounded column blowup is a
    // schema hazard; enumerating keeps it one pass
    "pivot_returns" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0.0)).as("qty_f"),
          coalesce(col("O"), lit(0.0)).as("qty_o"))
        .orderBy("l_returnflag")
    }),
    // rollup subtotals: (flag, status), per-flag, and grand total in
    // one pass (partial-aggregating, no union of three scans). NULL
    // grouping slots are labeled so the oracle compare is total-order
    // bucketed ingest + co-located join: both fact tables are written
    // bucketed on the join key, so the join back out of the catalog
    // plans with NO Exchange on either side (spec-pinned in
    // EngineExtrasSpec); at 100 TB this converts the recurring
    // fact-join shuffle into a one-time ingest cost. The oracle runs
    // the same join straight off the raw parquet — equal results
    // prove the bucketed path changes the plan, not the data.
    "bucketed_join" -> ((s, d) => {
      Ingest.writeBucketed(t(s, d, "orders"), "graft_bk_orders", 16,
        Seq("o_orderkey"))
      Ingest.writeBucketed(t(s, d, "lineitem"), "graft_bk_lineitem",
        16, Seq("l_orderkey"))
      s.table("graft_bk_lineitem")
        .join(s.table("graft_bk_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    }),
    // SCD-1 merge/upsert: updates override base rows (priced-up
    // orders get status U), unseen keys insert (status N). The
    // union+arg-min implementation is checked against a full-outer-
    // join oracle — two independent formulations of MERGE.
    "merge_upsert" -> ((s, d) => {
      val base = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice")
      val upd = base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + 10.0)
      val ins = base.filter(col("o_orderkey") % 1000 === 1)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_orderstatus", lit("N"))
      Joins.mergeUpsert(base, upd.unionByName(ins), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),
    // SCD-2 apply: updates close the key's current row at the update
    // timestamp and append a new open version — history stays
    // append-only and as-of-queryable
    "scd2_apply" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val hist = orders.select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val upd = orders.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("C").as("o_orderstatus"),
          (col("o_totalprice") + 5.0).as("o_totalprice"),
          expr("o_orderdate + INTERVAL 30 DAY").as("ts"))
      Joins.scd2Apply(hist, upd, "o_orderkey", "ts")
        .orderBy("o_orderkey", "valid_from")
    }),
    // SCD-2 point-in-time lookup, the read side: each fact joins the
    // dimension version valid at the fact's own timestamp (key
    // equi-join + validity-range predicate). Lookups at +15 days hit
    // the original version, +45 days the post-update one
    "scd2_lookup" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val hist = Joins.scd2Apply(
        orders.select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to")),
        orders.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), lit("C").as("o_orderstatus"),
            (col("o_totalprice") + 5.0).as("o_totalprice"),
            expr("o_orderdate + INTERVAL 30 DAY").as("ts")),
        "o_orderkey", "ts")
      val facts = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"),
          expr("""o_orderdate + CASE WHEN o_orderkey % 2 = 0
                  THEN INTERVAL 15 DAY ELSE INTERVAL 45 DAY END""")
            .as("fact_ts"))
      Joins.scd2Lookup(hist, facts, "o_orderkey", "fact_ts")
        .select("o_orderkey", "fact_ts", "o_orderstatus",
          "o_totalprice", "valid_from")
        .orderBy("o_orderkey", "fact_ts")
    }),
    // Hive-style partitioned sink + pruned read-back: the filter on
    // the partition key becomes a directory skip (PartitionFilters),
    // the first scan-reduction lever at 100 TB
    "partition_prune" -> ((s, d) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_part_li"
      Ingest.writePartitioned(
        t(s, d, "lineitem").select("l_orderkey", "l_quantity",
          "l_extendedprice", "l_linestatus", "l_returnflag"),
        tmp, Seq("l_returnflag"))
      s.read.parquet(tmp).filter(col("l_returnflag") === "R")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
        .orderBy("l_linestatus")
    }),
    // range-clustered sorted layout + range-predicate read-back: each
    // file covers a disjoint key interval, so the parquet min/max
    // stats prune non-matching files (spec asserts disjointness; the
    // oracle pins the read-back result)
    "sorted_layout" -> ((s, d) => {
      val tmp =
        s"${System.getProperty("java.io.tmpdir")}/graft_sorted_li"
      Ingest.writeSorted(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber",
          "l_quantity", "l_extendedprice"),
        tmp, numFiles = 8, Seq("l_orderkey"))
      s.read.parquet(tmp)
        .filter(col("l_orderkey").between(1000, 2000))
        .groupBy()
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
    }),
    // Z-ordered 2-D layout + boxed read-back: bit-interleaved
    // clustering keeps BOTH keys' per-file ranges narrow (spec
    // asserts the file-skip win); the oracle pins the read-back
    "zorder_layout" -> ((s, d) => {
      val tmp =
        s"${System.getProperty("java.io.tmpdir")}/graft_zorder_li"
      Ingest.writeZOrdered(
        t(s, d, "lineitem").select("l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice"),
        tmp, numFiles = 8, "l_partkey", "l_suppkey")
      s.read.parquet(tmp)
        .filter(col("l_partkey").between(100, 300) &&
          col("l_suppkey").between(10, 40))
        .groupBy()
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
    }),
    // JSONL sink + schema-explicit source roundtrip: write the docs
    // table as JSON lines, read it back with a declared schema (no
    // inference pre-scan), and pin every row against the parquet
    // original — the crawl-dump interchange path, lossless
    "jsonl_roundtrip" -> ((s, d) => {
      val tmp =
        s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_docs"
      val docs = t(s, d, "documents")
      Ingest.writeJsonl(docs, tmp)
      Ingest.readJsonl(s, tmp, docs.schema).orderBy("doc_id")
    }),
    // exact per-series EWMA (seeded at first obs, identical fold
    // order on both engines) over daily revenue per return flag
    "ewma_daily" -> ((s, d) => {
      val daily = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_shipdate"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      graft.engine.Series.ewma(daily, Seq("l_returnflag"),
        "l_shipdate", "revenue")
        .orderBy("l_returnflag", "l_shipdate")
    }),
    // declarative data-quality audit: one scan evaluates every
    // expectation; per-rule pass/fail counts gate dataset promotion
    "dq_checks" -> ((s, d) => {
      graft.engine.Profile.dqChecks(t(s, d, "lineitem"), Seq(
        "qty_in_range" -> col("l_quantity").between(1, 50),
        "price_positive" -> (col("l_extendedprice") > 0),
        "discount_band" -> col("l_discount").between(0.0, 0.1),
        "ship_not_null" -> col("l_shipdate").isNotNull))
        .orderBy("rule")
    }),
    // exact pairwise Pearson correlations via decimal moment sums —
    // order-independent, unlike streaming-covariance corr; one pass
    // for all pairs
    "corr_pairs" -> ((s, d) => {
      graft.engine.Profile.corrPairs(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("col_x", "col_y")
    }),
    // small-file compaction: fragment the docs table into 32 files,
    // compact to 4 with a shuffle-free coalesce rewrite, pin every
    // row against the original (spec asserts the file counts)
    "compact_files" -> ((s, d) => {
      val frag =
        s"${System.getProperty("java.io.tmpdir")}/graft_frag_docs"
      val comp =
        s"${System.getProperty("java.io.tmpdir")}/graft_comp_docs"
      t(s, d, "documents").repartition(32)
        .write.mode("overwrite").parquet(frag)
      Ingest.compact(s, frag, comp, targetFiles = 4)
      s.read.parquet(comp).orderBy("doc_id")
    }),
    // ORC sink + source roundtrip: the Hive-lineage columnar
    // container, full-row pinned against the parquet original
    "orc_roundtrip" -> ((s, d) => {
      val tmp =
        s"${System.getProperty("java.io.tmpdir")}/graft_orc_docs"
      Ingest.writeOrc(t(s, d, "documents"), tmp)
      Ingest.readOrc(s, tmp).orderBy("doc_id")
    }),
    // exact top-10 hot keys, each cross-checked against a count-min
    // sketch of the same scan (sound: never undercounts; tight:
    // within eps*N) — the fixed-memory hot-key path for 100 TB scans
    "heavy_hitters" -> ((s, d) => {
      graft.llm.TextAnalysis.heavyHitters(
        t(s, d, "lineitem").select(col("l_partkey")), "l_partkey",
        k = 10)
        .orderBy("rank")
    }),
    // schema-aligned union (pandas concat with mismatched columns):
    // missing columns null-fill per side, no shuffle at all
    "union_align" -> ((s, d) => {
      val a = t(s, d, "orders").select(
        col("o_orderkey").as("key"),
        col("o_totalprice").as("amount"),
        col("o_orderstatus").as("status"),
        lit("orders").as("src"))
      val b = t(s, d, "lineitem").select(
        col("l_orderkey").as("key"),
        col("l_extendedprice").as("amount"),
        lit("lineitem").as("src"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy("key", "src", "amount")
    }),
    // top-k per group in the retail core: top-3 parts by revenue per
    // return flag — the rank filter pushes into WindowGroupLimit, so
    // each shuffle partition forwards only k rows per group
    "topk_per_group" -> ((s, d) => {
      val rev = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("revenue").desc, col("l_partkey"))
      rev.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy("l_returnflag", "rank")
    }),
    // edit-distance fuzzy matching: the classic small-dim dedup
    // verifier (supplier names against nation names here) — the
    // right side broadcasts, levenshtein runs codegen'd per pair
    "fuzzy_pairs" -> ((s, d) => {
      val a = t(s, d, "nation")
        .select(col("n_nationkey").as("id1"),
          lower(col("n_name")).as("s1"))
      val b = t(s, d, "nation")
        .select(col("n_nationkey").as("id2"),
          lower(col("n_name")).as("s2"))
      a.crossJoin(broadcast(b))
        .filter(col("id1") < col("id2"))
        .withColumn("dist",
          levenshtein(col("s1"), col("s2")).cast("long"))
        .filter(col("dist") <= 5)
        .select("id1", "id2", "s1", "s2", "dist")
        .orderBy("id1", "id2")
    }),
    // unpivot / melt (the pandas wide→long reshape, inverse of
    // pivot_returns): native Dataset.unpivot — plan-level row
    // expansion, no shuffle
    "unpivot_measures" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    }),
    // one-pass data-quality profile: per-column row/null/distinct
    // counts — the ingest sanity report, one scan + one reduce
    "profile_table" -> ((s, d) => {
      Profile.profile(t(s, d, "orders"),
        Seq("o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy("col_name")
    }),
    // full grouping-set lattice (cube): every (flag × status) margin
    // in one pass — the one-level-up sibling of rollup_sales
    "cube_sales" -> ((s, d) => {
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy("flag", "status")
    }),
    // fixed-width histogram: pure per-row bucket arithmetic + one
    // count shuffle — the scalable distribution profile (no global
    // sort, unlike ntile)
    "histogram_qty" -> ((s, d) => {
      t(s, d, "lineitem")
        .withColumn("bucket",
          floor((col("l_quantity") - 1) / 5).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("l_quantity")).as("lo"),
          max(col("l_quantity")).as("hi"))
        .orderBy("bucket")
    }),
    "rollup_sales" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy("flag", "status")
    }),
    "d1_multikey_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "d5_stddev_pop" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(round(stddev_pop(col("l_quantity")), 6).as("std_qty"))
        .orderBy("l_suppkey")
    }),
    "d7_count_if" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(count_if(col("o_totalprice") > 100000).as("n_big"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),
    "d8_percentile" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_quantity"), lit(0.99)), 6).as("p99"),
          round(percentile(col("l_quantity"), lit(0.01)), 6).as("p01"))
        .orderBy("l_returnflag")
    }),
    // newsvendor order quantity (round-17): q* = F^-1(cr) of the
    // per-part empirical demand distribution at critical ratio 0.8 —
    // the distribution-free cousin of the reference's z-score safety
    // stock (PRACTICA3.py:70-80 assumes normality; the critical
    // fractile doesn't). One groupBy on the part key; exact linear-
    // interp percentile on both engines
    "newsvendor" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).cast("long").as("n_obs"),
          round(percentile(col("l_quantity"), lit(0.8)), 6)
            .as("q_star"),
          round(avg(col("l_quantity")), 6).as("mean_demand"))
        .filter(col("n_obs") >= 20)
        .orderBy("l_partkey")
    }),
    "d9_row_median" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          element_at(array_sort(array(col("l_quantity"),
            col("l_extendedprice") / 1000.0,
            col("l_discount") * 100.0)), 2).as("med"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "d10_clip" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          least(greatest(col("l_quantity"), lit(5.0)), lit(45.0))
            .as("clipped"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "d11_last_by_time" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
          col("l_linenumber").desc)
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_suppkey"), col("l_quantity").as("last_qty"),
          col("l_shipdate").as("last_ship"))
        .orderBy("l_suppkey")
    }),
    "d12_tail_mean" -> ((s, d) => {
      val weekly = Resample.weeklySparse(t(s, d, "lineitem"),
        Seq("l_suppkey"), "l_shipdate", "l_quantity")
      Series.tailMean(weekly, Seq("l_suppkey"), "week", "units", 4)
        .orderBy("l_suppkey")
    }),

    // Sketch aggregates (the approx forms a 100 TB deployment swaps in
    // for exact percentile / count-distinct — SURVEY D8 tolerance
    // note). Sketch internals differ across engines, so the oracle
    // checks exact values plus tolerance booleans the Spark side
    // computes: |approx − exact| within 5%+1.0 for the percentile
    // (default accuracy 10000 ⇒ rank error ≪ that) and 15% for
    // HLL++ count-distinct (3× the default rsd 0.05).
    "d8b_approx_aggs" -> ((s, d) => {
      // two separate aggregations joined on the group key: a distinct
      // aggregate (countDistinct) mixed into the same Aggregate as the
      // sort-based exact percentile plans as an Expand (2x input rows
      // through the percentile sort — measured 18.5s vs 2s at sf0.1)
      val li = t(s, d, "lineitem")
      val pct = li.groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_quantity"), lit(0.99)), 6)
            .as("p99_exact"),
          expr("approx_percentile(l_quantity, 0.99)").as("__p99a"))
      val nd = li.groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("nparts_exact"),
          approx_count_distinct(col("l_partkey")).as("__nda"))
      pct.join(nd, "l_returnflag")
        .select(col("l_returnflag"), col("p99_exact"),
          col("nparts_exact"),
          (abs(col("__p99a") - col("p99_exact"))
            <= abs(col("p99_exact")) * 0.05 + 1.0).as("p99_ok"),
          (abs(col("__nda") - col("nparts_exact"))
            <= col("nparts_exact") * 0.15).as("nd_ok"))
        .orderBy("l_returnflag")
    }),

    // ---- E: time series ----
    "e2_weekly_dense" -> ((s, d) => {
      Resample.weeklyDense(t(s, d, "lineitem"), Seq("l_suppkey"),
        "l_shipdate", "l_quantity")
        .orderBy("l_suppkey", "week")
    }),
    "e3_daily" -> ((s, d) => {
      Resample.daily(Ingest.tableNanos(s, d, "events", Seq("ts")), Seq("event_type"), "ts", "value")
        .withColumn("units", round(col("units"), 6))
        .orderBy("event_type", "day")
    }),
    "e4_lags" -> ((s, d) => {
      val daily = Resample.daily(Ingest.tableNanos(s, d, "events", Seq("ts")), Seq("event_type"),
        "ts", "value")
        .withColumn("units", round(col("units"), 6))
      Series.withLags(daily, Seq("event_type"), "day", "units", Seq(1, 7))
        .orderBy("event_type", "day")
    }),
    "e5_split_mark" -> ((s, d) => {
      val weekly = Resample.weeklyDense(t(s, d, "lineitem"),
        Seq("l_suppkey"), "l_shipdate", "l_quantity")
      Series.markSplit(weekly, Seq("l_suppkey"), "week", 4)
        .withColumn("rn_desc", col("rn_desc").cast("long"))
        .orderBy("l_suppkey", "week")
    }),
    "e6_future_weeks" -> ((s, d) => {
      val weekly = Resample.weeklySparse(t(s, d, "lineitem"),
        Seq("l_suppkey"), "l_shipdate", "l_quantity")
      Resample.futureWeeks(weekly, Seq("l_suppkey"), 4)
        .orderBy("l_suppkey", "future_week")
    }),

    // ---- F: scalar functions ----
    "f1_f2_math" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(log1p(col("l_quantity")), 6).as("log1p_qty"),
          round(expm1(col("l_discount")), 6).as("expm1_disc"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
          abs(col("l_quantity") - 25).as("abs_dev"),
          round(pow(col("l_discount"), 2.0), 6).as("disc_sq"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "f3_bround_ties" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          bround(col("l_quantity") + 0.5).as("bround_tie"),
          bround(col("l_extendedprice") / 7.0, 2).as("bround_2dp"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "f5_case_bands" -> ((s, d) => {
      val df = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_discount") * 1000.0).as("mape"))
      val (band, color) = Report.mapeBand(col("mape"))
      df.withColumn("quality_band", band)
        .withColumn("quality_color", color)
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "f6_format_string" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          format_string("SKU %s-%d: qty %d", col("l_returnflag"),
            col("l_suppkey"), col("l_quantity").cast("long"))
            .as("label"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "f7_ts_format" -> ((s, d) => {
      Ingest.tableNanos(s, d, "events", Seq("ts"))
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .withColumn("ts_rt",
          to_timestamp(col("ts_str"), "yyyy-MM-dd HH:mm:ss"))
        .orderBy("event_id")
    }),

    // ---- G: metrics ----
    "g2_smape" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"),
          when(col("l_linenumber") === 7, lit(0.0))
            .otherwise(col("l_quantity")).as("y"),
          (col("l_quantity") * (lit(1.0) - col("l_discount"))).as("yhat"))
      li.groupBy("l_returnflag")
        .agg(round(Metrics.smapeRows(col("y"), col("yhat")), 6)
          .as("smape"))
        .orderBy("l_returnflag")
    }),
    "g3_g4_rmse_mae" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").as("y"),
          (col("l_quantity") * (lit(1.0) - col("l_discount"))).as("yhat"))
      li.groupBy("l_returnflag")
        .agg(round(Metrics.rmseRows(col("y"), col("yhat")), 6).as("rmse"),
          round(Metrics.maeRows(col("y"), col("yhat")), 6).as("mae"))
        .orderBy("l_returnflag")
    }),
    "g5_align_join" -> ((s, d) => {
      val actual = Resample.daily(t(s, d, "lineitem"), Seq(),
        "l_shipdate", "l_quantity")
        .withColumnRenamed("units", "y")
      val fcast = Resample.daily(t(s, d, "orders"), Seq(),
        "o_orderdate", "o_totalprice")
        .select(col("day"), (col("units") / 10000.0).as("yhat"))
      actual.join(fcast, "day")
        .agg(round(Metrics.maeRows(col("y"), col("yhat")), 6).as("mae"),
          round(Metrics.rmseRows(col("y"), col("yhat")), 6).as("rmse"))
    }),

    // ---- retail portfolio analytics ----
    // ABC inventory classification: Pareto cumulative revenue share
    // computed as a DISTRIBUTED prefix sum (range-repartition →
    // per-partition offsets → local windows) — never a single-
    // partition global sort. The oracle is the textbook one-window
    // form, so the hash match proves the distributed decomposition
    // is exact.
    "abc_class" -> ((s, d) => {
      Retail.abcClassify(t(s, d, "lineitem"), "l_partkey")
        .select(col("l_partkey"),
          col("revenue").cast("double").as("revenue"),
          col("cum_share"), col("abc_band"))
        .orderBy("l_partkey")
    }),
    // weekly seasonality profile: avg demand per ISO week-of-year
    // over the overall weekly avg — two aggregates over the weekly
    // frame plus a broadcast scalar, exact integral sums throughout
    "seasonality_idx" -> ((s, d) => {
      val wk = t(s, d, "lineitem")
        .groupBy(Resample.weekEndingSunday(col("l_shipdate"))
          .as("week"))
        .agg(sum(col("l_quantity")).as("units"))
      val overall = wk.agg(
        (sum(col("units")) / count(lit(1))).as("__avg_all"))
      wk.groupBy(weekofyear(col("week")).cast("long").as("woy"))
        .agg(count(lit(1)).as("n_weeks"),
          (sum(col("units")) / count(lit(1))).as("__avg_woy"))
        .crossJoin(broadcast(overall))
        .select(col("woy"), col("n_weeks"),
          round(col("__avg_woy"), 6).as("avg_units"),
          round(col("__avg_woy") / col("__avg_all"), 6)
            .as("season_idx"))
        .orderBy("woy")
    }),
    // promo uplift: discounted vs undiscounted demand per brand from
    // ONE conditional-sum aggregate (no self-join, no second scan)
    "promo_uplift" -> ((s, d) => {
      val deep = col("l_discount") > 0.05
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(when(deep, 1)).as("n_promo"),
          count(when(!deep, 1)).as("n_base"),
          sum(when(deep, col("l_quantity")).otherwise(0.0))
            .as("__q_promo"),
          sum(when(!deep, col("l_quantity")).otherwise(0.0))
            .as("__q_base"))
        .select(col("p_brand"), col("n_promo"), col("n_base"),
          round(col("__q_promo") / col("n_promo"), 6)
            .as("avg_qty_promo"),
          round(col("__q_base") / col("n_base"), 6)
            .as("avg_qty_base"),
          round((col("__q_promo") / col("n_promo") /
            (col("__q_base") / col("n_base")) - 1) * 100, 6)
            .as("uplift_pct"))
        .orderBy("p_brand")
    }),
    // top-down forecast reconciliation: forecast the stable total,
    // disaggregate by historical share — one raw scan via the
    // checkpointed (item, week) base
    "forecast_reconcile" -> ((s, d) => {
      graft.engine.forecast.Backtest.topDownReconcile(
        t(s, d, "lineitem"), "l_partkey", "l_shipdate",
        "l_quantity")
        .orderBy("l_partkey")
    }),
    // rolling-origin MA backtest: every origin's 1-step forecast in
    // ONE window pass (K origins cost one shuffle), masked MAPE with
    // decimal-summed APEs
    "backtest_ma" -> ((s, d) => {
      graft.engine.forecast.Backtest.rollingOriginMa(
        Resample.weeklyDense(t(s, d, "lineitem"), Seq("l_partkey"),
          "l_shipdate", "l_quantity"),
        Seq("l_partkey"))
        .orderBy("origin")
    }),
    // Croston intermittent-demand forecast per part, straight off
    // the SPARSE weekly frame (no densify: intervals come from week
    // label gaps) — exact seeded folds, ewma machinery
    "croston" -> ((s, d) => {
      Series.croston(
        Resample.weeklySparse(t(s, d, "lineitem"), Seq("l_partkey"),
          "l_shipdate", "l_quantity"),
        Seq("l_partkey"), "week", "units")
        .orderBy("l_partkey")
    }),
    // global top-k WITHOUT a global sort: orderBy+limit compiles to
    // TakeOrderedAndProject (per-partition heaps merged on the
    // driver, k rows moved) — plan-asserted in EngineExtrasSpec; a
    // window-rank formulation would instead single-partition-sort
    // the whole per-item frame
    "top_revenue" -> ((s, d) => {
      Retail.itemRevenue(t(s, d, "lineitem"), "l_partkey")
        .select(col("l_partkey"),
          col("revenue").cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey"))
        .limit(100)
    }),
    // seasonal demand envelope: p10/p50/p90 of per-series weekly
    // demand by ISO week-of-year — the percentile band actuals are
    // judged against
    "demand_envelope" -> ((s, d) => {
      Retail.demandEnvelope(
        Resample.weeklySparse(t(s, d, "lineitem"), Seq("l_partkey"),
          "l_shipdate", "l_quantity"))
        .orderBy("woy")
    }),
    // missing-week gap intervals per series: the data-quality
    // complement of densify — holes surfaced as incidents, not
    // silently zero-filled
    "coverage_gaps" -> ((s, d) => {
      Retail.coverageGaps(
        Resample.weeklySparse(t(s, d, "lineitem"), Seq("l_partkey"),
          "l_shipdate", "l_quantity"),
        Seq("l_partkey"))
        .orderBy("l_partkey", "gap_start")
    }),
    // robust MAD outliers per series (Iglewicz-Hoaglin modified
    // z-score): the median/MAD baseline a 500-unit spike cannot
    // inflate to hide itself, unlike the trailing-σ demand_anomaly
    "mad_outliers" -> ((s, d) => {
      Retail.madOutliers(
        Resample.weeklySparse(t(s, d, "lineitem"), Seq("l_partkey"),
          "l_shipdate", "l_quantity"),
        Seq("l_partkey"))
        .orderBy("l_partkey", "week")
    }),
    // snapshot CDC: diff two table versions into a change feed
    // (insert/delete/update + changed-column list) — what an
    // incremental consumer wants when the source only snapshots
    "snapshot_cdc" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val mutated = o.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 11 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
      val inserts = o.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
      Joins.cdcDiff(o, mutated.unionByName(inserts),
          Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),
    // interval×interval overlap join via time-bucketization: shipment
    // windows × promo windows with NO equi key — the bucket explode
    // turns a cartesian theta-join into a hash join, and canonical-
    // bucket emission needs no distinct pass
    "interval_join" -> ((s, d) => {
      val events = t(s, d, "lineitem").select(col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_shipdate").as("ev_start"),
        expr("""l_shipdate + make_dt_interval(
                CAST(l_linenumber % 5 + 1 AS INT))""").as("ev_end"))
      val promos = t(s, d, "orders")
        .filter(col("o_orderkey") % 199 === 0)
        .select(col("o_orderkey").as("promo_id"),
          col("o_orderdate").as("pr_start"),
          expr("o_orderdate + INTERVAL 14 DAY").as("pr_end"))
      Joins.intervalJoin(events, promos, "ev_start", "ev_end",
          "pr_start", "pr_end")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("promo_id"),
          (datediff(least(col("ev_end"), col("pr_end")),
            greatest(col("ev_start"), col("pr_start"))) + 1)
            .cast("long").as("overlap_days"))
        .orderBy("l_orderkey", "l_linenumber", "promo_id")
    }),
    // PSI distribution drift between two date slices of l_quantity:
    // the snapshot-over-snapshot drift monitor (fixed equal-width
    // bins, eps-floored proportions, per-bin terms + total)
    "dist_drift" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Profile.psiDrift(
        li.filter(col("l_shipdate") < "1998-07-01"),
        li.filter(col("l_shipdate") >= "1998-07-01"),
        "l_quantity", lo = 1.0, hi = 51.0, bins = 10)
        .orderBy("bin")
    }),
    // Syntetos-Boylan forecastability quadrants from (ADI, CV²) —
    // the routing signal for model choice (smooth -> MA/ES,
    // intermittent/lumpy -> Croston/SBA). One aggregate over the
    // sparse weekly frame, no window, no join
    "demand_class" -> ((s, d) => {
      Retail.demandClass(
        Resample.weeklySparse(t(s, d, "lineitem"), Seq("l_partkey"),
          "l_shipdate", "l_quantity"),
        "l_partkey")
        .orderBy("l_partkey")
    }),
    // return rate per brand with Wilson interval: uncertainty-aware
    // ranking from one map-side-combined count aggregate
    "return_rate_ci" -> ((s, d) => {
      Retail.returnRateCI(t(s, d, "lineitem"), t(s, d, "part"))
        .orderBy("p_brand")
    }),
    // log-log price elasticity per brand: closed-form OLS slope from
    // decimal moment sums, one aggregation pass, broadcast dimension
    "elasticity" -> ((s, d) => {
      Retail.elasticity(t(s, d, "lineitem"), t(s, d, "part"))
        .orderBy("p_brand")
    }),
    // equi-depth histogram over price: exact decile boundaries from
    // one tiny aggregate + broadcast row-local bucket assignment —
    // the scale-correct form of NTILE's single-partition global sort
    "equidepth_hist" -> ((s, d) => {
      Profile.equiDepthHistogram(t(s, d, "lineitem"),
        "l_extendedprice", buckets = 10)
        .orderBy("bucket")
    }),
    // demand-spike detection: trailing 28-day z-score per supplier,
    // baseline excludes the scored day; manual moments keep both
    // engines on the identical closed form
    "demand_anomaly" -> ((s, d) => {
      Retail.demandAnomaly(t(s, d, "lineitem"), Seq("l_suppkey"),
        "l_shipdate", "l_quantity")
        .orderBy("l_suppkey", "l_shipdate")
    }),
    // market-basket pair lift: co-occurrence mined from row-local
    // pair explosion over per-order item sets — one shuffle to build
    // baskets, never an order-keyed self-join
    "basket_lift" -> ((s, d) => {
      Retail.basketLift(t(s, d, "lineitem"))
        .orderBy("item_a", "item_b")
    }),
    // multi-period (ROP, OQ) replenishment simulation: 8 weeks
    // unrolled into row-local integer recurrences after one per-item
    // aggregate — the projection costs one narrow projection
    "inventory_projection" -> ((s, d) => {
      val stock = t(s, d, "part").select(
        col("p_partkey").as("l_partkey"),
        (col("p_size") * 100).cast("long").as("on_hand_units"))
      Retail.inventoryProjection(t(s, d, "lineitem"), stock,
        "l_partkey", "on_hand_units")
        .orderBy("l_partkey", "week")
    }),
    // days-of-supply stockout projection: trailing average daily
    // demand vs a deterministic on-hand proxy (p_size × 100); parts
    // with no sales history get NULL cover and are flagged for review
    "days_of_supply" -> ((s, d) => {
      val stock = t(s, d, "part").select(
        col("p_partkey").as("l_partkey"),
        (col("p_size") * 100).cast("long").as("on_hand_units"))
      Retail.daysOfSupply(t(s, d, "lineitem"), stock,
        "l_partkey", "on_hand_units", leadTimeDays = 30)
        .orderBy("l_partkey")
    }))

  /** DuckDB-equivalent SQL per query above. The W-SUN week label
    * `next_day(date_sub(to_date(ts),1),'Sun')` maps to
    * `CAST(ts AS DATE) + to_days(CAST((7 - isodow(CAST(ts AS DATE))) % 7 AS INT))`.
    */
  private val wsun =
    "CAST(l_shipdate AS DATE) + to_days(CAST((7 - isodow(CAST(l_shipdate AS DATE))) % 7 AS INT))"

  private def weeklyCte(key: String): String =
    s"SELECT $key, $wsun AS week, sum(l_quantity) AS units FROM lineitem GROUP BY 1, 2"

  private def denseCte(key: String): String =
    s"""wk AS (${weeklyCte(key)}),
       |bounds AS (SELECT $key, min(week) AS w0, max(week) AS w1 FROM wk GROUP BY 1),
       |grid AS (SELECT $key,
       |           CAST(unnest(generate_series(w0, w1, INTERVAL 7 DAY)) AS DATE) AS week
       |         FROM bounds),
       |dense AS (SELECT g.$key, g.week, coalesce(wk.units, 0.0) AS units
       |          FROM grid g LEFT JOIN wk USING ($key, week))""".stripMargin

  /** Chained-CTE mirror of [[Retail.inventoryProjection]]'s unrolled
    * integer recurrence — per-level suffixed names (s0→s8 …) so no
    * engine's lateral-alias precedence rules are in play.
    */
  private def invProjOracle(horizon: Int = 8): String = {
    val steps = (1 to horizon).map { t =>
      val p = t - 1
      s"""w$t AS (
         |  SELECT l_partkey, d, rop, oq,
         |    greatest(s$p + o1$p - d, CAST(0 AS BIGINT)) AS s$t,
         |    (s$p + o1$p - d) < 0 AS lost$t,
         |    CASE WHEN greatest(s$p + o1$p - d, CAST(0 AS BIGINT))
         |           + o2$p < rop
         |         THEN oq ELSE CAST(0 AS BIGINT) END AS ord$t,
         |    o2$p AS o1$t,
         |    CASE WHEN greatest(s$p + o1$p - d, CAST(0 AS BIGINT))
         |           + o2$p < rop
         |         THEN oq ELSE CAST(0 AS BIGINT) END AS o2$t
         |  FROM w$p)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to horizon).map { t =>
      s"""SELECT l_partkey, CAST($t AS BIGINT) AS week,
         |  s$t AS stock, ord$t AS ordered, lost$t AS stockout, d
         |FROM w$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS tot,
       |    date_diff('day', CAST(min(l_shipdate) AS DATE),
       |      CAST(max(l_shipdate) AS DATE)) // 7 + 1 AS nw
       |  FROM lineitem GROUP BY 1),
       |pol AS (
       |  SELECT l_partkey, (tot + nw - 1) // nw AS d FROM base),
       |w0 AS (
       |  SELECT pol.l_partkey, d, d * 3 AS rop, d * 4 AS oq,
       |    CAST(p_size * 100 AS BIGINT) AS s0,
       |    CAST(0 AS BIGINT) AS o10, CAST(0 AS BIGINT) AS o20
       |  FROM pol JOIN part ON pol.l_partkey = p_partkey),
       |$steps
       |$unions
       |ORDER BY l_partkey, week""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "inventory_projection" -> invProjOracle(),
    "a1_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "a4_roundtrip" ->
      """WITH agg AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(sum(l_quantity) AS BIGINT) AS DOUBLE) AS s,
        |    CAST(CAST(max(l_quantity) AS BIGINT) AS DOUBLE) AS m
        |  FROM lineitem GROUP BY 1)
        |SELECT l_suppkey,
        |  '[' || CAST(CAST(s AS BIGINT) AS VARCHAR) || '.0, ' ||
        |    CAST(CAST(m AS BIGINT) AS VARCHAR) || '.0]' AS csv_form,
        |  round(s + m, 6) AS total,
        |  CAST(2 AS BIGINT) AS weeks,
        |  TRUE AS roundtrip_ok
        |FROM agg ORDER BY l_suppkey""".stripMargin,
    "b1_rename" ->
      """SELECT l_orderkey, l_linenumber, l_partkey AS product_id,
        |  l_returnflag AS store_id, l_quantity AS units_sold
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "b3_coerce_fill" ->
      """SELECT event_id,
        |  coalesce(TRY_CAST(props AS DOUBLE), 0.0) AS props,
        |  coalesce(TRY_CAST(value AS DOUBLE), 0.0) AS value
        |FROM events ORDER BY event_id""".stripMargin,
    "b4_b5_b6_derived" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus,
        |  coalesce(CAST(CASE WHEN o_orderstatus = 'O' THEN NULL
        |                     ELSE o_orderstatus END AS VARCHAR), '[]')
        |    AS status_str,
        |  (o_totalprice - 150000) > 0 AS need_reorder,
        |  CAST(0.0 AS DOUBLE) AS rmse
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "b7_round_int" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round_even(greatest(l_extendedprice / 100.0, 0.0), 0) AS BIGINT) AS price_int,
        |  CAST(round_even(greatest(l_quantity / 2.0, 0.0), 0) AS BIGINT) AS qty_int
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "c1_filter_nonneg" ->
      """SELECT event_id, value - 2.5 AS value_c FROM events
        |WHERE (value - 2.5) >= 0 ORDER BY event_id""".stripMargin,
    "c2_eq_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'click' AND user_id = 7
        |ORDER BY event_id""".stripMargin,
    "c3_dropna_subset" ->
      """SELECT doc_id,
        |  CASE WHEN lang = 'en' THEN NULL ELSE lang END AS lang_nn
        |FROM documents WHERE lang != 'en' ORDER BY doc_id""".stripMargin,
    "c4_having_gates" ->
      s"""WITH ${denseCte("l_partkey")}
         |SELECT l_partkey, count(*) AS weeks, sum(units) AS total
         |FROM dense GROUP BY 1
         |HAVING count(*) >= 250 AND sum(units) >= 800
         |ORDER BY l_partkey""".stripMargin,
    "c5_masked_mape" ->
      """SELECT l_returnflag,
        |  round(coalesce(
        |    avg(CASE WHEN y != 0 THEN abs((y - yhat) / y) END) * 100,
        |    avg(abs(y - yhat))), 6) AS mape
        |FROM (SELECT l_returnflag,
        |        CASE WHEN l_linenumber = 7 THEN 0.0 ELSE l_quantity END AS y,
        |        l_quantity * (1.0 - l_discount) AS yhat
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c6_empty_guard" ->
      "SELECT (count(*) = 0) AS is_empty FROM lineitem WHERE l_quantity < 0",
    // the UNSALTED form — the salted join + two-stage agg must
    // reproduce it exactly (units integral ⇒ double sums exact in any
    // order)
    "skew_salted_agg" ->
      """WITH skewed AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 'HOT'
        |              ELSE l_returnflag END AS store,
        |         l_quantity AS units
        |  FROM lineitem),
        |dimw AS (
        |  SELECT store, CAST(length(store) AS DOUBLE) AS w
        |  FROM (SELECT DISTINCT store FROM skewed))
        |SELECT s.store, sum(s.units * d.w) AS sum_wu
        |FROM skewed s JOIN dimw d USING (store)
        |GROUP BY s.store ORDER BY s.store""".stripMargin,
    "rolling_7d" ->
      """WITH daily AS (
        |  SELECT l_returnflag, l_shipdate, sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_shipdate, qty,
        |  round(avg(qty) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_shipdate
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 6)
        |    AS qty7
        |FROM daily ORDER BY 1, 2""".stripMargin,
    "json_props" ->
      """WITH p AS (
        |  SELECT CAST(regexp_extract(props, '[0-9]+') AS INT) AS k,
        |    value
        |  FROM events)
        |SELECT CAST(k % 10 AS BIGINT) AS k_mod, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_value
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "funnel_stages" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT s1.user_id, min(e.ts) AS t2
        |  FROM s1 JOIN events e ON e.user_id = s1.user_id
        |   AND e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT s2.user_id, min(e.ts) AS t3
        |  FROM s2 JOIN events e ON e.user_id = s2.user_id
        |   AND e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS stage, 'view' AS stage_name,
        |    (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL
        |  SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL
        |  SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |ORDER BY stage""".stripMargin,
    "retention_cohorts" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        |  FROM events),
        |c AS (SELECT user_id, min(w) AS c FROM w GROUP BY 1)
        |SELECT c.c AS cohort_week,
        |  CAST(date_diff('day', c.c, w.w) // 7 AS BIGINT)
        |    AS week_offset,
        |  count(DISTINCT w.user_id) AS n_users
        |FROM w JOIN c ON w.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WHERE user_id < 200
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, min(ts) AS s_start,
        |  max(ts) + INTERVAL '30 minutes' AS s_end,
        |  count(*) AS n_events, round(sum(value), 6) AS total
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,
    "range_join" ->
      """WITH intervals AS (
        |  SELECT o_orderkey,
        |    CAST(o_orderkey % 490 AS DOUBLE) AS lo,
        |    CAST(o_orderkey % 490 AS DOUBLE) + 2.5 AS hi
        |  FROM orders WHERE o_orderkey % 20 = 0)
        |SELECT e.event_id, i.o_orderkey, e.value, i.lo
        |FROM events e JOIN intervals i
        |  ON i.lo <= e.value AND e.value <= i.hi
        |ORDER BY event_id, o_orderkey""".stripMargin,
    "wow_growth" ->
      s"""WITH ${denseCte("l_returnflag")},
         |lagged AS (
         |  SELECT l_returnflag, week, units,
         |    lag(units, 1) OVER (PARTITION BY l_returnflag
         |      ORDER BY week) AS prev
         |  FROM dense)
         |SELECT l_returnflag, week, units,
         |  CASE WHEN prev > 0
         |       THEN round((units - prev) / prev, 6) + 0.0 END AS growth
         |FROM lagged ORDER BY l_returnflag, week""".stripMargin,
    "pivot_returns" ->
      """SELECT l_returnflag,
        |  coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0.0)
        |    AS qty_f,
        |  coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0.0)
        |    AS qty_o
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "merge_upsert" ->
      """WITH b AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |u AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 10.0 AS o_totalprice
        |  FROM b WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice
        |  FROM b WHERE o_orderkey % 1000 = 1)
        |SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  coalesce(u.o_custkey, b.o_custkey) AS o_custkey,
        |  coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
        |  coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice
        |FROM b FULL OUTER JOIN u ON b.o_orderkey = u.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "scd2_apply" ->
      """WITH h AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    o_orderdate AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM orders),
        |u AS (
        |  SELECT o_orderkey, 'C' AS o_orderstatus,
        |    o_totalprice + 5.0 AS o_totalprice,
        |    o_orderdate + INTERVAL 30 DAY AS ts
        |  FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT h.o_orderkey, h.o_orderstatus, h.o_totalprice,
        |  h.valid_from,
        |  CASE WHEN u.o_orderkey IS NOT NULL THEN u.ts
        |       ELSE NULL END AS valid_to
        |FROM h LEFT JOIN u USING (o_orderkey)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        |FROM u
        |ORDER BY o_orderkey, valid_from""".stripMargin,
    "scd2_lookup" ->
      """WITH h AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    o_orderdate AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM orders),
        |u AS (
        |  SELECT o_orderkey, 'C' AS o_orderstatus,
        |    o_totalprice + 5.0 AS o_totalprice,
        |    o_orderdate + INTERVAL 30 DAY AS ts
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |scd AS (
        |  SELECT h.o_orderkey, h.o_orderstatus, h.o_totalprice,
        |    h.valid_from,
        |    CASE WHEN u.o_orderkey IS NOT NULL THEN u.ts
        |         ELSE NULL END AS valid_to
        |  FROM h LEFT JOIN u USING (o_orderkey)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM u),
        |f AS (
        |  SELECT o_orderkey,
        |    o_orderdate + CASE WHEN o_orderkey % 2 = 0
        |      THEN INTERVAL 15 DAY ELSE INTERVAL 45 DAY END AS fact_ts
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT f.o_orderkey, f.fact_ts, s.o_orderstatus,
        |  s.o_totalprice, s.valid_from
        |FROM f LEFT JOIN scd s
        |  ON s.o_orderkey = f.o_orderkey
        | AND s.valid_from <= f.fact_ts
        | AND (s.valid_to IS NULL OR f.fact_ts < s.valid_to)
        |ORDER BY f.o_orderkey, f.fact_ts""".stripMargin,
    "partition_prune" ->
      """SELECT l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sorted_layout" ->
      """SELECT count(*) AS n, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 2000""".stripMargin,
    "zorder_layout" ->
      """SELECT count(*) AS n, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 300
        |  AND l_suppkey BETWEEN 10 AND 40""".stripMargin,
    "jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "compact_files" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ewma_daily" ->
      """WITH g AS (
        |  SELECT l_returnflag, l_shipdate,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |      AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY 1, 2),
        |arr AS (
        |  SELECT l_returnflag,
        |    list(revenue ORDER BY l_shipdate) AS xs,
        |    list(l_shipdate ORDER BY l_shipdate) AS ds
        |  FROM g GROUP BY 1),
        |e AS (
        |  SELECT l_returnflag, unnest(ds) AS l_shipdate,
        |    unnest(xs) AS revenue,
        |    unnest(generate_series(1, len(xs))) AS t, xs
        |  FROM arr)
        |SELECT l_returnflag, l_shipdate, revenue,
        |  round(list_reduce(list_slice(xs, 1, t),
        |    (acc, x) -> 0.3 * x + 0.7 * acc), 2) AS ewma
        |FROM e ORDER BY l_returnflag, l_shipdate""".stripMargin,
    "dq_checks" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    count(*) FILTER (WHERE l_quantity BETWEEN 1 AND 50)
        |      AS p_qty,
        |    count(*) FILTER (WHERE l_extendedprice > 0) AS p_price,
        |    count(*) FILTER (WHERE l_discount BETWEEN 0.0 AND 0.1)
        |      AS p_disc,
        |    count(*) FILTER (WHERE l_shipdate IS NOT NULL) AS p_ship
        |  FROM lineitem)
        |SELECT rule, CAST(n AS BIGINT) AS n_rows,
        |  CAST(n_pass AS BIGINT) AS n_pass,
        |  CAST(n - n_pass AS BIGINT) AS n_fail,
        |  round(CAST(n_pass AS DOUBLE) / n, 6) AS pass_ratio
        |FROM (
        |  SELECT 'qty_in_range' AS rule, n, p_qty AS n_pass FROM m
        |  UNION ALL SELECT 'price_positive', n, p_price FROM m
        |  UNION ALL SELECT 'discount_band', n, p_disc FROM m
        |  UNION ALL SELECT 'ship_not_null', n, p_ship FROM m
        |) ORDER BY rule""".stripMargin,
    "corr_pairs" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(28,6))) AS s_q,
        |    sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS s_e,
        |    sum(CAST(l_discount AS DECIMAL(28,6))) AS s_d,
        |    sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))
        |      AS ss_q,
        |    sum(CAST(l_extendedprice * l_extendedprice
        |      AS DECIMAL(28,6))) AS ss_e,
        |    sum(CAST(l_discount * l_discount AS DECIMAL(28,6)))
        |      AS ss_d,
        |    sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6)))
        |      AS sp_qe,
        |    sum(CAST(l_quantity * l_discount AS DECIMAL(28,6)))
        |      AS sp_qd,
        |    sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
        |      AS sp_ed
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
        |    round(CAST(n * sp_qe - s_q * s_e AS DOUBLE) /
        |      sqrt(CAST(n * ss_q - s_q * s_q AS DOUBLE) *
        |           CAST(n * ss_e - s_e * s_e AS DOUBLE)), 6) + 0.0 AS r
        |  FROM m
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount',
        |    round(CAST(n * sp_qd - s_q * s_d AS DOUBLE) /
        |      sqrt(CAST(n * ss_q - s_q * s_q AS DOUBLE) *
        |           CAST(n * ss_d - s_d * s_d AS DOUBLE)), 6) + 0.0
        |  FROM m
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount',
        |    round(CAST(n * sp_ed - s_e * s_d AS DOUBLE) /
        |      sqrt(CAST(n * ss_e - s_e * s_e AS DOUBLE) *
        |           CAST(n * ss_d - s_d * s_d AS DOUBLE)), 6) + 0.0
        |  FROM m
        |) ORDER BY col_x, col_y""".stripMargin,
    "heavy_hitters" ->
      """WITH c AS (
        |  SELECT l_partkey, count(*) AS cnt
        |  FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT l_partkey, CAST(cnt AS BIGINT) AS cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, l_partkey)
        |      AS BIGINT) AS rank
        |  FROM c)
        |SELECT l_partkey, cnt, rank, TRUE AS cms_sound,
        |  TRUE AS cms_tight
        |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "union_align" ->
      """SELECT o_orderkey AS key, o_totalprice AS amount,
        |  o_orderstatus AS status, 'orders' AS src FROM orders
        |UNION ALL BY NAME
        |SELECT l_orderkey AS key, l_extendedprice AS amount,
        |  'lineitem' AS src FROM lineitem
        |ORDER BY key, src, amount""".stripMargin,
    "topk_per_group" ->
      """WITH rev AS (
        |  SELECT l_returnflag, l_partkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |      AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY revenue DESC, l_partkey) AS BIGINT) AS rank
        |  FROM rev)
        |SELECT l_returnflag, l_partkey, revenue, rank FROM r
        |WHERE rank <= 3 ORDER BY l_returnflag, rank""".stripMargin,
    "fuzzy_pairs" ->
      """SELECT a.n_nationkey AS id1, b.n_nationkey AS id2,
        |  lower(a.n_name) AS s1, lower(b.n_name) AS s2,
        |  CAST(levenshtein(lower(a.n_name), lower(b.n_name))
        |    AS BIGINT) AS dist
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |WHERE levenshtein(lower(a.n_name), lower(b.n_name)) <= 5
        |ORDER BY id1, id2""".stripMargin,
    "unpivot_measures" ->
      """SELECT l_orderkey, l_linenumber,
        |  'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber,
        |  'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "profile_table" ->
      """SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
        |  count(o_custkey) AS n_nonnull,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  count(*) - count(o_custkey) AS n_null FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(o_orderstatus),
        |  count(DISTINCT o_orderstatus),
        |  count(*) - count(o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(o_totalprice),
        |  count(DISTINCT o_totalprice),
        |  count(*) - count(o_totalprice) FROM orders
        |ORDER BY col_name""".stripMargin,
    "cube_sales" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "histogram_qty" ->
      """SELECT CAST(floor((l_quantity - 1) / 5) AS BIGINT) AS bucket,
        |  count(*) AS n, min(l_quantity) AS lo, max(l_quantity) AS hi
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "rollup_sales" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "d1_multikey_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  avg(l_quantity) AS avg_qty,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "d5_stddev_pop" ->
      """SELECT l_suppkey, round(stddev_pop(l_quantity), 6) AS std_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "d7_count_if" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "d8_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.99), 6) AS p99,
        |  round(quantile_cont(l_quantity, 0.01), 6) AS p01
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "newsvendor" ->
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_obs,
        |  round(quantile_cont(l_quantity, 0.8), 6) AS q_star,
        |  round(avg(l_quantity), 6) AS mean_demand
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 20
        |ORDER BY 1""".stripMargin,
    "d8b_approx_aggs" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.99), 6) AS p99_exact,
        |  count(DISTINCT l_partkey) AS nparts_exact,
        |  TRUE AS p99_ok, TRUE AS nd_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "d9_row_median" ->
      """SELECT l_orderkey, l_linenumber,
        |  list_sort([l_quantity, l_extendedprice / 1000.0,
        |             l_discount * 100.0])[2] AS med
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "d10_clip" ->
      """SELECT l_orderkey, l_linenumber,
        |  least(greatest(l_quantity, 5.0), 45.0) AS clipped
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "d11_last_by_time" ->
      """SELECT l_suppkey, l_quantity AS last_qty, l_shipdate AS last_ship
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey
        |        ORDER BY l_shipdate DESC, l_orderkey DESC,
        |                 l_linenumber DESC) AS rn
        |      FROM lineitem)
        |WHERE rn = 1 ORDER BY l_suppkey""".stripMargin,
    "d12_tail_mean" ->
      s"""WITH wk AS (${weeklyCte("l_suppkey")})
         |SELECT l_suppkey,
         |  avg(units) FILTER (WHERE rn <= 4) AS tail4_mean
         |FROM (SELECT l_suppkey, units, row_number() OVER
         |        (PARTITION BY l_suppkey ORDER BY week DESC) AS rn
         |      FROM wk)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "e2_weekly_dense" ->
      s"""WITH ${denseCte("l_suppkey")}
         |SELECT l_suppkey, week, units FROM dense
         |ORDER BY l_suppkey, week""".stripMargin,
    "e3_daily" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  round(sum(value), 6) AS units
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e4_lags" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    round(sum(value), 6) AS units
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, day, units,
        |    lag(units, 1) OVER w AS lag_1,
        |    lag(units, 7) OVER w AS lag_7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT * FROM lagged
        |WHERE lag_1 IS NOT NULL AND lag_7 IS NOT NULL
        |ORDER BY event_type, day""".stripMargin,
    "e5_split_mark" ->
      s"""WITH ${denseCte("l_suppkey")}
         |SELECT l_suppkey, week, units,
         |  row_number() OVER (PARTITION BY l_suppkey ORDER BY week DESC)
         |    AS rn_desc,
         |  (row_number() OVER (PARTITION BY l_suppkey ORDER BY week DESC))
         |    <= 4 AS is_test
         |FROM dense ORDER BY l_suppkey, week""".stripMargin,
    "e6_future_weeks" ->
      s"""WITH wk AS (${weeklyCte("l_suppkey")}),
         |mx AS (SELECT l_suppkey, max(week) AS wmax FROM wk GROUP BY 1)
         |SELECT l_suppkey,
         |  CAST(unnest(generate_series(wmax + to_days(7),
         |    wmax + to_days(28), INTERVAL 7 DAY)) AS DATE) AS future_week
         |FROM mx
         |ORDER BY l_suppkey, future_week""".stripMargin,
    "f1_f2_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(ln(1.0 + l_quantity), 6) AS log1p_qty,
        |  round(exp(l_discount) - 1.0, 6) AS expm1_disc,
        |  round(sqrt(l_extendedprice), 6) AS sqrt_price,
        |  abs(l_quantity - 25) AS abs_dev,
        |  round(pow(l_discount, 2.0), 6) AS disc_sq
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f3_bround_ties" ->
      """SELECT l_orderkey, l_linenumber,
        |  round_even(l_quantity + 0.5, 0) AS bround_tie,
        |  round_even(l_extendedprice / 7.0, 2) AS bround_2dp
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f5_case_bands" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_discount * 1000.0 AS mape,
        |  CASE WHEN l_discount * 1000.0 < 10.0 THEN 'alta precisión'
        |       WHEN l_discount * 1000.0 < 50.0 THEN 'aceptable'
        |       ELSE 'baja precisión' END AS quality_band,
        |  CASE WHEN l_discount * 1000.0 < 10.0 THEN 'green'
        |       WHEN l_discount * 1000.0 < 50.0 THEN 'orange'
        |       ELSE 'red' END AS quality_color
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f6_format_string" ->
      """SELECT l_orderkey, l_linenumber,
        |  printf('SKU %s-%d: qty %d', l_returnflag, l_suppkey,
        |    CAST(l_quantity AS BIGINT)) AS label
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "f7_ts_format" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
        |    '%Y-%m-%d %H:%M:%S') AS ts_rt
        |FROM events ORDER BY event_id""".stripMargin,
    "g2_smape" ->
      """SELECT l_returnflag,
        |  round(coalesce(
        |    avg(CASE WHEN abs(y) + abs(yhat) != 0
        |             THEN abs(yhat - y) * 2 / (abs(y) + abs(yhat)) END) * 100,
        |    avg(abs(y - yhat))), 6) AS smape
        |FROM (SELECT l_returnflag,
        |        CASE WHEN l_linenumber = 7 THEN 0.0 ELSE l_quantity END AS y,
        |        l_quantity * (1.0 - l_discount) AS yhat
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g3_g4_rmse_mae" ->
      """SELECT l_returnflag,
        |  round(sqrt(avg(pow(y - yhat, 2))), 6) AS rmse,
        |  round(avg(abs(y - yhat)), 6) AS mae
        |FROM (SELECT l_returnflag, l_quantity AS y,
        |        l_quantity * (1.0 - l_discount) AS yhat
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g5_align_join" ->
      """WITH actual AS (
        |  SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
        |    sum(l_quantity) AS y
        |  FROM lineitem GROUP BY 1),
        |fcast AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
        |    sum(o_totalprice) / 10000.0 AS yhat
        |  FROM orders GROUP BY 1)
        |SELECT round(avg(abs(y - yhat)), 6) AS mae,
        |  round(sqrt(avg(pow(y - yhat, 2))), 6) AS rmse
        |FROM actual JOIN fcast USING (day)""".stripMargin,
    "abc_class" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1.0 AS DECIMAL(3,2)) -
        |         CAST(l_discount AS DECIMAL(3,2)))) AS revenue
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT l_partkey, revenue,
        |    round(CAST(sum(revenue) OVER (
        |        ORDER BY revenue DESC, l_partkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) /
        |      CAST((SELECT sum(revenue) FROM rev) AS DOUBLE), 6)
        |      AS cum_share,
        |    round(CAST(sum(revenue) OVER (
        |        ORDER BY revenue DESC, l_partkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - revenue AS DOUBLE) /
        |      CAST((SELECT sum(revenue) FROM rev) AS DOUBLE), 6)
        |      AS prev_share
        |  FROM rev)
        |SELECT l_partkey, CAST(revenue AS DOUBLE) AS revenue,
        |  cum_share,
        |  CASE WHEN prev_share < 0.80 THEN 'A'
        |       WHEN prev_share < 0.95 THEN 'B'
        |       ELSE 'C' END AS abc_band
        |FROM c ORDER BY l_partkey""".stripMargin,
    "seasonality_idx" ->
      s"""WITH wk AS (
        |  SELECT $wsun AS week, sum(l_quantity) AS units
        |  FROM lineitem GROUP BY 1),
        |o AS (SELECT sum(units) / count(*) AS avg_all FROM wk),
        |w AS (
        |  SELECT CAST(weekofyear(week) AS BIGINT) AS woy,
        |    count(*) AS n_weeks,
        |    sum(units) / count(*) AS avg_woy
        |  FROM wk GROUP BY 1)
        |SELECT woy, n_weeks,
        |  round(avg_woy, 6) AS avg_units,
        |  round(avg_woy / avg_all, 6) AS season_idx
        |FROM w CROSS JOIN o ORDER BY woy""".stripMargin,
    "promo_uplift" ->
      """WITH c AS (
        |  SELECT p_brand,
        |    count(CASE WHEN l_discount > 0.05 THEN 1 END)
        |      AS n_promo,
        |    count(CASE WHEN NOT (l_discount > 0.05) THEN 1 END)
        |      AS n_base,
        |    sum(CASE WHEN l_discount > 0.05 THEN l_quantity
        |             ELSE 0.0 END) AS q_promo,
        |    sum(CASE WHEN NOT (l_discount > 0.05) THEN l_quantity
        |             ELSE 0.0 END) AS q_base
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT p_brand, CAST(n_promo AS BIGINT) AS n_promo,
        |  CAST(n_base AS BIGINT) AS n_base,
        |  round(q_promo / n_promo, 6) AS avg_qty_promo,
        |  round(q_base / n_base, 6) AS avg_qty_base,
        |  round((q_promo / n_promo / (q_base / n_base) - 1) * 100, 6) + 0.0
        |    AS uplift_pct
        |FROM c ORDER BY p_brand""".stripMargin,
    "forecast_reconcile" ->
      s"""WITH base AS (
        |  SELECT l_partkey, $wsun AS week, sum(l_quantity) AS units
        |  FROM lineitem GROUP BY 1, 2),
        |wt AS (SELECT week, sum(units) AS units FROM base GROUP BY 1),
        |tf AS (SELECT avg(units) AS top_fc FROM
        |       (SELECT units FROM wt ORDER BY week DESC LIMIT 4)),
        |pt AS (SELECT l_partkey, sum(units) AS tot
        |       FROM base GROUP BY 1),
        |g AS (SELECT sum(tot) AS grand FROM pt)
        |SELECT l_partkey,
        |  round(tot / grand, 6) AS share,
        |  round(top_fc, 6) AS top_fc,
        |  round(top_fc * tot / grand, 6) AS fc_reconciled
        |FROM pt CROSS JOIN g CROSS JOIN tf
        |ORDER BY l_partkey""".stripMargin,
    "backtest_ma" ->
      s"""WITH ${denseCte("l_partkey")},
        |m AS (
        |  SELECT l_partkey, week, units,
        |    avg(units) OVER tw AS ma,
        |    count(units) OVER tw AS cnt,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY week DESC) AS origin
        |  FROM dense
        |  WINDOW tw AS (PARTITION BY l_partkey ORDER BY week
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)),
        |s AS (
        |  SELECT origin, units, ma,
        |    CASE WHEN units > 0
        |      THEN round(abs(units - ma) / units, 6) END AS ape
        |  FROM m WHERE origin <= 8 AND cnt = 3)
        |SELECT CAST(origin AS BIGINT) AS origin,
        |  count(*) AS n_series,
        |  count(ape) AS n_scored,
        |  round(CAST(sum(CAST(ape AS DECIMAL(28,6))) AS DOUBLE)
        |    / count(ape) * 100, 6) AS mape_pct
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "croston" ->
      s"""WITH wk AS (${weeklyCte("l_partkey")}),
        |arr AS (
        |  SELECT l_partkey,
        |    list(CAST(units AS DOUBLE) ORDER BY week) AS ys,
        |    list(week ORDER BY week) AS ws
        |  FROM wk GROUP BY 1),
        |c AS (
        |  SELECT l_partkey, len(ys) AS m, ys,
        |    list_transform(generate_series(2, len(ys)), i ->
        |      CAST(date_diff('day', ws[i-1], ws[i]) AS DOUBLE)
        |        / 7.0) AS gaps
        |  FROM arr),
        |f AS (
        |  SELECT l_partkey, m,
        |    list_reduce(ys, (acc, x) -> 0.3 * x + 0.7 * acc) AS z,
        |    CASE WHEN m >= 2 THEN
        |      list_reduce(gaps, (acc, x) -> 0.3 * x + 0.7 * acc)
        |    END AS p
        |  FROM c)
        |SELECT l_partkey, CAST(m AS BIGINT) AS n_events,
        |  round(z, 6) AS z_size,
        |  round(p, 6) AS p_interval,
        |  CASE WHEN m >= 2 THEN round(z / p, 6) END AS croston_fc,
        |  CASE WHEN m >= 2 THEN round(0.85 * z / p, 6) END AS sba_fc
        |FROM f ORDER BY l_partkey""".stripMargin,
    "top_revenue" ->
      """SELECT l_partkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1.0 AS DECIMAL(3,2)) -
        |       CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem GROUP BY 1
        |ORDER BY revenue DESC, l_partkey LIMIT 100""".stripMargin,
    "demand_envelope" ->
      s"""WITH wk AS (${weeklyCte("l_partkey")})
        |SELECT CAST(weekofyear(week) AS BIGINT) AS woy,
        |  count(*) AS n_obs,
        |  round(quantile_cont(units, 0.1), 6) AS p10,
        |  round(quantile_cont(units, 0.5), 6) AS p50,
        |  round(quantile_cont(units, 0.9), 6) AS p90
        |FROM wk GROUP BY 1 ORDER BY woy""".stripMargin,
    "coverage_gaps" ->
      s"""WITH wk AS (${weeklyCte("l_partkey")}),
        |lg AS (
        |  SELECT l_partkey, week,
        |    lag(week) OVER (PARTITION BY l_partkey ORDER BY week)
        |      AS prev
        |  FROM wk)
        |SELECT l_partkey,
        |  CAST(prev + INTERVAL 7 DAY AS DATE) AS gap_start,
        |  CAST(week - INTERVAL 7 DAY AS DATE) AS gap_end,
        |  CAST(date_diff('day', prev, week) / 7 - 1 AS BIGINT)
        |    AS missing_weeks
        |FROM lg WHERE date_diff('day', prev, week) > 7
        |ORDER BY l_partkey, gap_start""".stripMargin,
    "mad_outliers" ->
      s"""WITH wk AS (${weeklyCte("l_partkey")}),
        |md AS (
        |  SELECT l_partkey, quantile_cont(units, 0.5) AS med
        |  FROM wk GROUP BY 1),
        |dv AS (
        |  SELECT w.l_partkey, w.week, w.units, md.med,
        |    abs(w.units - md.med) AS ad
        |  FROM wk w JOIN md USING (l_partkey)),
        |md2 AS (
        |  SELECT l_partkey, quantile_cont(ad, 0.5) AS mad
        |  FROM dv GROUP BY 1),
        |j AS (
        |  SELECT dv.l_partkey, dv.week, dv.units, dv.med, md2.mad
        |  FROM dv JOIN md2 USING (l_partkey))
        |SELECT l_partkey, week, units,
        |  round(med, 6) AS med, round(mad, 6) AS mad,
        |  CASE WHEN mad > 0
        |    THEN round(0.6745 * (units - med) / mad, 6) + 0.0 END AS mz
        |FROM j
        |WHERE (mad > 0 AND abs(0.6745 * (units - med) / mad) > 3.5)
        |   OR (mad = 0 AND units != med)
        |ORDER BY l_partkey, week""".stripMargin,
    "snapshot_cdc" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |n AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'X'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 97 != 0
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |j AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    o.o_orderstatus AS os, o.o_totalprice AS op,
        |    n.o_orderstatus AS ns, n.o_totalprice AS np,
        |    (o.o_orderkey IS NOT NULL) AS in_o,
        |    (n.o_orderkey IS NOT NULL) AS in_n
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey,
        |  CASE WHEN NOT in_o THEN 'insert'
        |       WHEN NOT in_n THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  CASE WHEN in_o AND in_n THEN array_to_string(list_filter([
        |      CASE WHEN os IS DISTINCT FROM ns
        |           THEN 'o_orderstatus' END,
        |      CASE WHEN op IS DISTINCT FROM np
        |           THEN 'o_totalprice' END], x -> x IS NOT NULL), ',')
        |    ELSE '' END AS changed_cols,
        |  os AS old_o_orderstatus, ns AS new_o_orderstatus,
        |  op AS old_o_totalprice, np AS new_o_totalprice
        |FROM j
        |WHERE (NOT in_o) OR (NOT in_n)
        |   OR os IS DISTINCT FROM ns OR op IS DISTINCT FROM np
        |ORDER BY o_orderkey""".stripMargin,
    "interval_join" ->
      """WITH ev AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT)
        |      AS l_linenumber,
        |    l_shipdate AS ev_start,
        |    l_shipdate + (l_linenumber % 5 + 1) * INTERVAL 1 DAY
        |      AS ev_end
        |  FROM lineitem),
        |pr AS (
        |  SELECT o_orderkey AS promo_id, o_orderdate AS pr_start,
        |    o_orderdate + INTERVAL 14 DAY AS pr_end
        |  FROM orders WHERE o_orderkey % 199 = 0)
        |SELECT e.l_orderkey, e.l_linenumber, p.promo_id,
        |  CAST(date_diff('day', greatest(e.ev_start, p.pr_start),
        |    least(e.ev_end, p.pr_end)) + 1 AS BIGINT) AS overlap_days
        |FROM ev e JOIN pr p
        |  ON e.ev_start <= p.pr_end AND p.pr_start <= e.ev_end
        |ORDER BY 1, 2, 3""".stripMargin,
    "dist_drift" ->
      """WITH t AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CASE WHEN l_shipdate < TIMESTAMP '1998-07-01'
        |         THEN 0 ELSE 1 END AS side
        |  FROM lineitem),
        |b AS (
        |  SELECT least(greatest(CAST(floor((x - 1.0) / 5.0) AS BIGINT),
        |    0), 9) AS bin, side FROM t),
        |c AS (
        |  SELECT bin,
        |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS n_ref,
        |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS n_cur
        |  FROM b GROUP BY 1),
        |tt AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM c),
        |p AS (
        |  SELECT bin, n_ref, n_cur,
        |    round(greatest(CAST(n_ref AS DOUBLE) / tr, 1e-6), 6)
        |      AS p_ref,
        |    round(greatest(CAST(n_cur AS DOUBLE) / tc, 1e-6), 6)
        |      AS p_cur
        |  FROM c, tt),
        |e AS (
        |  SELECT bin, n_ref, n_cur, p_ref, p_cur,
        |    round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
        |  FROM p)
        |SELECT bin, CAST(n_ref AS BIGINT) AS n_ref,
        |  CAST(n_cur AS BIGINT) AS n_cur, p_ref, p_cur, psi_term,
        |  round(sum(psi_term) OVER (), 6) AS psi
        |FROM e ORDER BY bin""".stripMargin,
    "demand_class" ->
      s"""WITH wk AS (${weeklyCte("l_partkey")}),
        |st AS (
        |  SELECT l_partkey, count(*) AS n,
        |    min(week) AS w0, max(week) AS w1,
        |    sum(units) AS s1, sum(units * units) AS s2
        |  FROM wk WHERE units > 0 GROUP BY 1),
        |m AS (
        |  SELECT l_partkey, n,
        |    CASE WHEN n > 1 THEN
        |      round((date_diff('day', w0, w1) / 7.0) / (n - 1), 6)
        |    END AS adi,
        |    CASE WHEN n > 1 THEN
        |      round((s2 / n - (s1 / n) * (s1 / n))
        |        / ((s1 / n) * (s1 / n)), 6)
        |    END AS cv2
        |  FROM st)
        |SELECT l_partkey, CAST(n AS BIGINT) AS n_demand_weeks,
        |  adi, cv2,
        |  CASE WHEN n = 1 THEN 'single'
        |       WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
        |       WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
        |       WHEN adi < 1.32 THEN 'erratic'
        |       ELSE 'lumpy' END AS demand_class
        |FROM m ORDER BY l_partkey""".stripMargin,
    "return_rate_ci" ->
      """WITH c AS (
        |  SELECT p_brand, count(*) AS n,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS n_returns
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |w AS (
        |  SELECT p_brand, n, n_returns,
        |    CAST(n_returns AS DOUBLE) / CAST(n AS DOUBLE) AS phat,
        |    CAST(n AS DOUBLE) AS nd
        |  FROM c)
        |SELECT p_brand, CAST(n AS BIGINT) AS n,
        |  CAST(n_returns AS BIGINT) AS n_returns,
        |  round(phat, 6) AS return_rate,
        |  round((phat + 1.96 * 1.96 / (2.0 * nd))
        |      / (1.0 + 1.96 * 1.96 / nd)
        |    - 1.96 * sqrt(phat * (1.0 - phat) / nd
        |        + 1.96 * 1.96 / (4.0 * nd * nd))
        |      / (1.0 + 1.96 * 1.96 / nd), 6) AS ci_lo,
        |  round((phat + 1.96 * 1.96 / (2.0 * nd))
        |      / (1.0 + 1.96 * 1.96 / nd)
        |    + 1.96 * sqrt(phat * (1.0 - phat) / nd
        |        + 1.96 * 1.96 / (4.0 * nd * nd))
        |      / (1.0 + 1.96 * 1.96 / nd), 6) AS ci_hi
        |FROM w ORDER BY p_brand""".stripMargin,
    "elasticity" ->
      """WITH j AS (
        |  SELECT p_brand,
        |    ln(l_extendedprice / l_quantity) AS x,
        |    ln(l_quantity) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_quantity > 0 AND l_extendedprice > 0),
        |m AS (
        |  SELECT p_brand, count(*) AS n,
        |    sum(CAST(x AS DECIMAL(28,6))) AS sx,
        |    sum(CAST(y AS DECIMAL(28,6))) AS sy,
        |    sum(CAST(x * y AS DECIMAL(28,6))) AS sxy,
        |    sum(CAST(x * x AS DECIMAL(28,6))) AS sxx
        |  FROM j GROUP BY 1)
        |SELECT p_brand, CAST(n AS BIGINT) AS n_obs,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |        CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0 AS elasticity
        |FROM m ORDER BY p_brand""".stripMargin,
    "equidepth_hist" ->
      """WITH b AS (
        |  SELECT quantile_cont(l_extendedprice,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
        |    AS bounds
        |  FROM lineitem)
        |SELECT
        |  CAST(1 + len(list_filter(bounds,
        |    x -> l_extendedprice > x)) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  min(l_extendedprice) AS min_v,
        |  max(l_extendedprice) AS max_v,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) AS sum_v
        |FROM lineitem CROSS JOIN b
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "demand_anomaly" ->
      """WITH daily AS (
        |  SELECT l_suppkey, l_shipdate, sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (
        |  SELECT l_suppkey, l_shipdate, qty,
        |    count(qty) OVER tw AS n,
        |    sum(qty) OVER tw AS s,
        |    sum(qty * qty) OVER tw AS ss
        |  FROM daily
        |  WINDOW tw AS (PARTITION BY l_suppkey ORDER BY l_shipdate
        |    RANGE BETWEEN INTERVAL 28 DAY PRECEDING
        |    AND INTERVAL 1 DAY PRECEDING)),
        |z AS (
        |  SELECT l_suppkey, l_shipdate, qty, n, s / n AS mean,
        |    sqrt(greatest((ss - s * s / n) / n, 0.0)) AS std
        |  FROM m)
        |SELECT l_suppkey, l_shipdate, qty,
        |  CASE WHEN n >= 7 THEN round(mean, 6) END AS base_mean,
        |  CASE WHEN n >= 7 THEN round(std, 6) END AS base_std,
        |  CASE WHEN n >= 7 AND std > 0
        |    THEN round((qty - mean) / std, 6) + 0.0 END AS z,
        |  coalesce(abs(CASE WHEN n >= 7 AND std > 0
        |    THEN round((qty - mean) / std, 6) END) > 3.0, FALSE)
        |    AS is_anomaly
        |FROM z ORDER BY l_suppkey, l_shipdate""".stripMargin,
    "basket_lift" ->
      """WITH di AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ok AS (
        |  SELECT l_orderkey FROM di GROUP BY 1
        |  HAVING count(*) <= 64),
        |n AS (
        |  SELECT count(*) AS n_orders
        |  FROM (SELECT DISTINCT l_orderkey FROM lineitem)),
        |m AS (
        |  SELECT l_partkey, count(*) AS item_count
        |  FROM di GROUP BY 1),
        |p AS (
        |  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
        |    count(*) AS pair_count
        |  FROM di a
        |  JOIN di b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  JOIN ok ON a.l_orderkey = ok.l_orderkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b,
        |  CAST(pair_count AS BIGINT) AS pair_count,
        |  round(CAST(pair_count AS DOUBLE) / n_orders, 6)
        |    AS support,
        |  round(CAST(pair_count AS DOUBLE) * n_orders /
        |    (ma.item_count * mb.item_count), 6) AS lift
        |FROM p
        |CROSS JOIN n
        |JOIN m ma ON p.item_a = ma.l_partkey
        |JOIN m mb ON p.item_b = mb.l_partkey
        |ORDER BY item_a, item_b""".stripMargin,
    "days_of_supply" ->
      """WITH span AS (
        |  SELECT date_diff('day', CAST(min(l_shipdate) AS DATE),
        |           CAST(max(l_shipdate) AS DATE)) + 1 AS days
        |  FROM lineitem),
        |dem AS (
        |  SELECT l_partkey,
        |    round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |        AS DOUBLE) / (SELECT days FROM span), 6)
        |      AS daily_demand
        |  FROM lineitem GROUP BY 1),
        |stock AS (
        |  SELECT p_partkey AS l_partkey,
        |    CAST(p_size * 100 AS BIGINT) AS on_hand
        |  FROM part)
        |SELECT s.l_partkey, s.on_hand, d.daily_demand,
        |  round(s.on_hand / d.daily_demand, 6) AS days_of_supply,
        |  coalesce(round(s.on_hand / d.daily_demand, 6) < 30, TRUE)
        |    AS stockout_risk
        |FROM stock s LEFT JOIN dem d USING (l_partkey)
        |ORDER BY l_partkey""".stripMargin)
}
