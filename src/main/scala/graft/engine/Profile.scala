package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column row/null/distinct counts in ONE
  * aggregation pass over the table (the ingest-time sanity report
  * every pipeline runs before trusting a new drop of data).
  *
  * Shape: a single global aggregate computes every column's stats
  * together — one scan, one reduce — then a `stack` unpivot turns the
  * 1-row result into one row per column. The multiple exact
  * count(DISTINCT) aggregates expand into one Expand + aggregate pair
  * (Spark's standard multi-distinct plan): per distinct column the
  * input is replicated once, keyed by the column's own value — still
  * map-side combining, no driver involvement. At 100 TB swap
  * `exact = false` to route distincts through HyperLogLog
  * (`approx_count_distinct`), the constant-memory form of the same
  * report.
  */
object Profile {

  /** Exact pairwise Pearson correlations over `cols`: one aggregate
    * computes every moment (n, Σx, Σx², Σxy) through DECIMAL sums —
    * order-independent and bit-identical on any engine/partitioning,
    * unlike streaming-covariance `corr` implementations whose float
    * accumulation order differs engine to engine. One pass over the
    * data regardless of pair count; the closed-form combine happens
    * on the 1-row result. Output: one row per (col_x, col_y) pair.
    */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    def s(c: String) = sum(col(c).cast("decimal(28,6)"))
    val moments = df.agg(
      count(lit(1)).as("__n"),
      cols.map(c => s(c).as(s"__s_$c")) ++
        cols.map(c => sum((col(c) * col(c)).cast("decimal(28,6)"))
          .as(s"__ss_$c")) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum((col(a) * col(b)).cast("decimal(28,6)"))
            .as(s"__sp_${a}_$b")
        }.toSeq: _*)
    // each variance term stays decimal-exact; the cast to double
    // happens BEFORE their product (decimal×decimal here would
    // overflow 38 digits), and both engines cast the same exact
    // decimal to the same double
    def r(a: String, b: String) =
      round(
        (col("__n") * col(s"__sp_${a}_$b") -
          col(s"__s_$a") * col(s"__s_$b")).cast("double") /
          sqrt((col("__n") * col(s"__ss_$a") -
            col(s"__s_$a") * col(s"__s_$a")).cast("double") *
            (col("__n") * col(s"__ss_$b") -
              col(s"__s_$b") * col(s"__s_$b")).cast("double")),
        6)
    // one row of all pair correlations, unpivoted row-locally with
    // stack — a union of per-pair selects would plan one full
    // scan+aggregate PER PAIR (no subtree reuse at static planning)
    val pairs = cols.combinations(2).toSeq
    val wide = moments.select(pairs.map { case Seq(a, b) =>
      r(a, b).as(s"__r_${a}_$b")
    }: _*)
    val stackArgs = pairs.map { case Seq(a, b) =>
      s"'$a', '$b', __r_${a}_$b"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${pairs.size}, $stackArgs) AS (col_x, col_y, r)")
  }

  /** Declarative data-quality audit: each named rule is a boolean
    * predicate; the output is one row per rule with pass/fail counts
    * and the pass ratio — the expectation-suite gate a pipeline runs
    * before promoting a dataset. ONE aggregate evaluates every rule
    * in a single scan (conditional sums), unpivoted row-locally with
    * stack. Null predicate results count as failures (a rule that
    * cannot evaluate did not pass).
    */
  def dqChecks(df: DataFrame, rules: Seq[(String, Column)])
      : DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("__n") +:
      rules.map { case (name, pred) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"__p_$name")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) =>
      s"'$name', __p_$name"
    }.mkString(", ")
    wide.selectExpr("__n",
        s"stack(${rules.size}, $stackArgs) AS (rule, n_pass)")
      .select(col("rule"), col("__n").as("n_rows"), col("n_pass"),
        (col("__n") - col("n_pass")).as("n_fail"),
        round(col("n_pass") / col("__n"), 6).as("pass_ratio"))
  }

  /** Equi-depth histogram in TWO aggregate passes, neither a global
    * sort: pass 1 computes the `buckets-1` interior quantile
    * boundaries as ONE tiny aggregate row; pass 2 broadcasts the
    * boundaries, assigns each row its bucket with a row-local fold
    * over the boundary array (`1 + #{b : x > b}` — ties go to the
    * lower bucket), and aggregates per-bucket stats. This is the
    * scale-correct alternative to `NTILE(n) OVER (ORDER BY x)`,
    * which Spark would execute as a SINGLE-PARTITION global sort of
    * the whole table. At 100 TB flip `exact = false` to compute the
    * boundaries with `approx_percentile` (t-digest, one pass,
    * constant memory) — bucket depths then wobble by the sketch
    * error instead of being exactly n/buckets.
    */
  def equiDepthHistogram(df: DataFrame, c: String, buckets: Int = 10,
      exact: Boolean = true): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val qList = qs.mkString(", ")
    val bounds = df.agg(
      (if (exact) expr(s"percentile(`$c`, array($qList))")
       else expr(s"approx_percentile(`$c`, array($qList), 10000)"))
        .as("__bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        expr(s"1 + aggregate(__bounds, 0, (acc, b) -> acc + " +
          s"IF(`$c` > b, 1, 0))").cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col(c)).as("min_v"), max(col(c)).as("max_v"),
        sum(col(c).cast("decimal(18,2)")).cast("double").as("sum_v"))
  }

  /** Population Stability Index between a reference and a current
    * slice of the same column — the standard drift monitor a data
    * pipeline runs between snapshots (rule of thumb: PSI < 0.1
    * stable, 0.1-0.25 shifting, > 0.25 drifted). Fixed equal-width
    * bins over [lo, hi) (under/overflow clamp into the edge bins) so
    * the binning is deterministic and engine-portable; per-bin
    * PSI term = (p_cur − p_ref) · ln(p_cur / p_ref), with an `eps`
    * floor on both proportions so empty bins contribute a finite
    * term. Output: one row per bin (counts, proportions, term) plus
    * the running total in `psi` on every row (scalar broadcast — the
    * bin frame is `bins` rows).
    * Scale shape: one conditional aggregate per side over a tagged
    * union — ONE pass over each input, bin assignment row-local, no
    * window, no join beyond the broadcast totals row.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, c: String,
      lo: Double, hi: Double, bins: Int = 10,
      eps: Double = 1e-6): DataFrame = {
    require(bins >= 2 && hi > lo, "need bins >= 2 and hi > lo")
    val tagged = ref.select(col(c).cast("double").as("__x"),
        lit(0).as("__side"))
      .unionByName(cur.select(col(c).cast("double").as("__x"),
        lit(1).as("__side")))
    val width = (hi - lo) / bins
    val binned = tagged.withColumn("bin",
      least(greatest(floor((col("__x") - lo) / width), lit(0)),
        lit(bins - 1)).cast("long"))
    val counts = binned.groupBy(col("bin"))
      .agg(count_if(col("__side") === 0).as("n_ref"),
        count_if(col("__side") === 1).as("n_cur"))
    val totals = counts.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"))
    // pinned: the psi-total cross reads the bins-row term frame twice
    val terms = counts.crossJoin(broadcast(totals))
      .withColumn("p_ref", round(greatest(
        col("n_ref") / col("__tr"), lit(eps)), 6))
      .withColumn("p_cur", round(greatest(
        col("n_cur") / col("__tc"), lit(eps)), 6))
      .withColumn("psi_term", round(
        (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")),
        6))
    // running total as a pinned broadcast 1-row cross (round 16: was
    // a Window.partitionBy(lit(1)) — the optimizer folds the literal
    // out of the partition spec, leaving an unpartitioned WindowExec)
    Dist.selfScalarCross(terms,
        round(sum(col("psi_term")), 6).as("psi"))
      .select("bin", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term",
        "psi")
  }

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      val nd =
        if (exact) count_distinct(col(c))
        else approx_count_distinct(col(c))
      Seq(count(col(c)).as(s"__nn_$c"), nd.as(s"__nd_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackArgs = cols
      .map(c => s"'$c', __nn_$c, __nd_$c").mkString(", ")
    row.select(col("__total"),
        expr(s"stack(${cols.size}, $stackArgs)" +
          " AS (col_name, n_nonnull, n_distinct)"))
      .select(col("col_name"), col("__total").as("n_rows"),
        col("n_nonnull"), col("n_distinct"),
        (col("__total") - col("n_nonnull")).as("n_null"))
  }
}
