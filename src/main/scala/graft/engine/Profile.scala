package graft.engine

import org.apache.spark.sql.DataFrame
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
