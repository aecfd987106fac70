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

  /** Ordered funnel: how many users complete each prefix of `stages`
    * IN ORDER (each stage's event strictly after the user's earliest
    * completion of the previous stage). Returns one row per stage:
    * (stage, stage_name, n_users).
    *
    * Per stage: one equi-join on the user key + one min-aggregation —
    * both co-partitioned on the same key across stages, so a k-stage
    * funnel is k small shuffles of per-user rows (never event-count
    * rows after stage 1), not a k-way self-join of the event log.
    */
  def funnel(events: DataFrame, user: String, ts: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(user)).agg(min(col(ts)).as("__t1"))
    val perUser = stages.zipWithIndex.drop(1)
      .foldLeft(first) { case (acc, (st, i)) =>
        val prev = s"__t$i"
        val cur = s"__t${i + 1}"
        val stEv = events.filter(col(typeCol) === st)
          .select(col(user), col(ts).as("__e"))
        acc.join(stEv, Seq(user), "left")
          .groupBy((col(user) +: (1 to i).map(j => col(s"__t$j")))
            .toSeq: _*)
          .agg(min(when(col("__e") > col(prev), col("__e")))
            .as(cur))
      }
    val counts = perUser.agg(
      count(col("__t1")).as("__n1"),
      stages.indices.drop(1).toSeq
        .map(i => count(col(s"__t${i + 1}")).as(s"__n${i + 1}")): _*)
    val stackArgs = stages.zipWithIndex
      .map { case (st, i) => s"${i + 1}L, '$st', __n${i + 1}" }
      .mkString(", ")
    counts.select(expr(s"stack(${stages.size}, $stackArgs)" +
      " AS (stage, stage_name, n_users)"))
  }

  /** Weekly retention cohorts: users grouped by their first-activity
    * week, counted in each later week they return. One distinct
    * (user, week) pass, one per-user min, one count-distinct — all
    * keyed on the user id; output is cohort-week × offset, bounded by
    * weeks², never user count.
    */
  def retentionCohorts(events: DataFrame, user: String,
      ts: String): DataFrame = {
    val weeks = events
      .select(col(user), date_trunc("week", col(ts)).as("__w"))
      .distinct()
    val cohort = weeks.groupBy(col(user)).agg(min(col("__w")).as("__c"))
    weeks.join(cohort, Seq(user))
      .select(col("__c").as("cohort_week"),
        floor(datediff(col("__w"), col("__c")) / 7).cast("long")
          .as("week_offset"),
        col(user))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col(user)).as("n_users"))
  }
}
