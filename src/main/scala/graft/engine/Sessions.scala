package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the event-stream operator class the
  * reference lacks but any clickstream/telemetry consumer of this
  * engine needs. Built on Spark's native `session_window`, which runs
  * the SAME code on batch and streaming frames (streaming needs a
  * watermark upstream): events merge into one session while each gap
  * to the previous event is ≤ `gap` (boundary pinned empirically and
  * in SessionsSpec: an event exactly `gap` after the previous one
  * still merges; strictly greater starts a new session), and the
  * emitted window is [first event, last event + gap).
  *
  * Scale shape: one shuffle keyed on the session keys; per-key state
  * during the merge is the open-session set, bounded by activity —
  * never the event history. On streaming, the watermark closes
  * sessions and evicts their state.
  */
object Sessions {

  /** Per-session aggregates: (keys..., s_start, s_end, n_events,
    * total) — one row per merged session.
    */
  def sessionAgg(df: DataFrame, keys: Seq[String], ts: String,
      value: String, gap: String): DataFrame =
    df.groupBy((session_window(col(ts), gap) +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(value)), 6).as("total"))
      .select(keys.map(col) :+
        col("session_window.start").as("s_start") :+
        col("session_window.end").as("s_end") :+
        col("n_events") :+ col("total"): _*)
}
