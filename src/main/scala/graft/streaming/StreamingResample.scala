package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming variant of the E2 weekly resample (SURVEY
  * §7.2.8): the same W-SUN bucketing as the batch operator, computed
  * incrementally with watermark-driven state cleanup.
  *
  * W-SUN mapping on a stream: `window(ts, "7 days")` is epoch-anchored
  * and the epoch was a THURSDAY, so the default windows run Thu→Thu.
  * `startTime = "4 days"` shifts them to Mon 00:00 → next Mon 00:00
  * (closed-left), which is exactly the pandas W-SUN bin; the label is
  * the window's last day, `date(window.end) - 1` = the ending Sunday.
  * Verified equal to the batch `next_day(date_sub(to_date(ts),1),'Sun')`
  * in StreamingSpec.
  *
  * Scale design: state is one row per (keys, week) — bounded by the
  * watermark horizon, not the stream length; late events inside the
  * watermark update their week's sum, older ones are dropped.
  */
object StreamingResample {

  /** Watermarked stream-stream interval join: match each right-stream
    * event to left-stream events with the same key whose timestamp
    * falls within `[left.ts, left.ts + within]` — the
    * impression→click attribution shape. Both sides carry watermarks
    * and the join condition bounds event-time distance, so Spark can
    * PROVE when a buffered row can never match again and evict it:
    * state is (rate × (watermark + within))-bounded on both sides,
    * never stream-length-bounded. Without the time-range conjunct
    * this would be an unbounded-state join — the thing you must never
    * ship on an infinite stream.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within"))
      .drop(r(key))
  }

  /** Stream-static dimension enrichment: broadcast-join the (small)
    * dim table onto the event stream — stateless, no watermark, works
    * in every output mode. The standard first stage of a live
    * pipeline (attach store/product attributes at ingest); at scale
    * the dim side must stay broadcastable, which is exactly the same
    * contract as the batch broadcast join.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Weekly W-SUN sums over a (possibly streaming) frame. In append
    * mode a week emits once its watermark passes; `watermarkDelay`
    * bounds both lateness tolerance and state size.
    */
  def weeklyStream(events: DataFrame, keys: Seq[String], ts: String,
      value: String, watermarkDelay: String = "14 days"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(ts, watermarkDelay)
      else events
    withWm
      .groupBy((keys.map(col) :+
        window(col(ts), "7 days", "7 days", "4 days").as("__w")): _*)
      .agg(sum(col(value)).as("units"))
      .select((keys.map(col) :+
        date_sub(to_date(col("__w.end")), 1).as("week") :+
        col("units")): _*)
  }

  /** Running per-key event count + sum with explicit state and a
    * processing-time timeout — the `mapGroupsWithState` surface for
    * custom streaming state (e.g. sessionization, dedup-by-key).
    */
  case class KeyTotals(key: String, n: Long, total: Double)

  def runningTotals(events: Dataset[(String, Double)])
      : Dataset[KeyTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[KeyTotals, KeyTotals](
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[KeyTotals]) =>
          val prev = state.getOption.getOrElse(KeyTotals(key, 0L, 0.0))
          val buf = rows.toSeq
          val next = KeyTotals(key, prev.n + buf.size,
            prev.total + buf.map(_._2).sum)
          state.update(next)
          next
      }
  }

  /** Streaming per-key EWMA: the stateful smoothed level over a live
    * series, state = (last ewma, last event time). Within a batch,
    * events fold in event-time order; across batches the carried
    * state makes the result identical to the batch
    * [[graft.engine.Series.ewma]] fold WHEN events arrive
    * time-ordered across batches (the monotone-ingest contract —
    * pinned by the parity spec; out-of-order arrivals need the
    * watermarked resample upstream). State per key is two numbers,
    * so a million live series cost megabytes.
    */
  case class EwmaEvent(key: String, t: Long, v: Double)
  case class EwmaState(ewma: Double, lastT: Long)
  case class EwmaOut(key: String, t: Long, v: Double, ewma: Double)

  def ewmaStream(events: Dataset[EwmaEvent],
      alpha: BigDecimal = BigDecimal("0.3")): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val a = alpha.toDouble
    val b = (BigDecimal(1) - alpha).toDouble
    events.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[EwmaState]) =>
          val sorted = rows.toSeq.sortBy(_.t)
          var st = state.getOption
          val out = sorted.map { e =>
            val next = st match {
              case Some(s) => a * e.v + b * s.ewma
              case None    => e.v
            }
            st = Some(EwmaState(next, e.t))
            // HALF_UP at 2dp — the exact rounding Series.ewma's
            // round(col, 2) applies, so batch parity is bitwise
            EwmaOut(key, e.t, e.v, BigDecimal(next)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming Croston: the intermittent-demand smoothings advanced
    * event-by-event with the same multiply-add order as the batch
    * [[graft.engine.Series.croston]] fold, so the LAST emitted row
    * per key is bitwise-equal to the batch result on the same
    * events (pinned by the parity spec; monotone-ingest contract as
    * ewmaStream). `t` is the epoch DAY of the demand week label —
    * gaps are (t−lastT)/7.0 weeks, matching the batch datediff/7.0.
    * State per key is four numbers: a million slow-mover series
    * cost megabytes, and each demand event does O(1) work — the
    * streaming replenishment planner's shape.
    */
  case class CrostonEvent(key: String, t: Long, v: Double)
  case class CrostonState(z: Double, p: Double, hasP: Boolean,
    lastT: Long, n: Long)
  case class CrostonOut(key: String, t: Long, v: Double,
    nEvents: Long, zSize: Double, pInterval: Option[Double],
    crostonFc: Option[Double], sbaFc: Option[Double])

  def crostonStream(events: Dataset[CrostonEvent],
      alpha: BigDecimal = BigDecimal("0.3")): Dataset[CrostonOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val a = alpha.toDouble
    val b = (BigDecimal(1) - alpha).toDouble
    val sbaF = (BigDecimal(1) - alpha / 2).toDouble
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    events.groupByKey(_.key)
      .flatMapGroupsWithState[CrostonState, CrostonOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[CrostonState]) =>
          val sorted = rows.toSeq.sortBy(_.t)
          var st = state.getOption
          val out = sorted.map { e =>
            val next = st match {
              case None =>
                CrostonState(e.v, 0.0, hasP = false, e.t, 1L)
              case Some(s) =>
                val gap = (e.t - s.lastT).toDouble / 7.0
                val p = if (s.hasP) a * gap + b * s.p else gap
                CrostonState(a * e.v + b * s.z, p, hasP = true,
                  e.t, s.n + 1)
            }
            st = Some(next)
            val (pOut, fc, sba) =
              if (next.hasP)
                (Some(r6(next.p)), Some(r6(next.z / next.p)),
                  Some(r6(sbaF * next.z / next.p)))
              else (None, None, None)
            CrostonOut(key, e.t, e.v, next.n, r6(next.z), pOut, fc,
              sba)
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming demand-spike detection: the trailing 28-day z-score
    * (batch twin [[graft.engine.Retail.demandAnomaly]]) advanced
    * per daily-demand event. State per key is ONLY the baseline
    * window's entries (≤ `windowDays` (day, qty) pairs, pruned on
    * every event) — bounded regardless of stream length. The
    * baseline is summed in day order, the same accumulation order
    * as the batch RANGE frame, and rounding matches round(…, 6)
    * HALF_UP, so on ordered ingest of per-day demand rows the
    * emitted scores are bitwise-equal to the batch operator
    * (parity-pinned in StreamingSpec). Events must arrive one per
    * (key, day), time-ordered across batches — run the daily
    * resample upstream, as with ewmaStream.
    */
  case class DemandEvent(key: String, t: Long, qty: Double)
  case class DemandWindow(entries: Seq[DemandEvent])
  case class AnomalyOut(key: String, t: Long, qty: Double,
    baseMean: Option[Double], baseStd: Option[Double],
    z: Option[Double], isAnomaly: Boolean)

  def demandAnomalyStream(events: Dataset[DemandEvent],
      windowDays: Int = 28, minObs: Int = 7,
      zThresh: Double = 3.0): Dataset[AnomalyOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    events.groupByKey(_.key)
      .flatMapGroupsWithState[DemandWindow, AnomalyOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[DemandWindow]) =>
          val sorted = rows.toSeq.sortBy(_.t)
          var win = state.getOption.map(_.entries).getOrElse(Seq())
          val out = sorted.map { e =>
            val base = win.filter(p =>
              p.t >= e.t - windowDays && p.t <= e.t - 1)
            val n = base.size
            val res =
              if (n >= minObs) {
                // fold in day order — the batch frame's sum order
                val s = base.foldLeft(0.0)(_ + _.qty)
                val ss = base.foldLeft(0.0)((a, p) =>
                  a + p.qty * p.qty)
                val mean = s / n
                val std = math.sqrt(
                  math.max((ss - s * s / n) / n, 0.0))
                val z = if (std > 0) Some(r6((e.qty - mean) / std))
                        else None
                AnomalyOut(key, e.t, e.qty, Some(r6(mean)),
                  Some(r6(std)), z,
                  z.exists(v => math.abs(v) > zThresh))
              } else AnomalyOut(key, e.t, e.qty, None, None, None,
                isAnomaly = false)
            win = (win :+ e).filter(_.t > e.t - windowDays)
            res
          }
          state.update(DemandWindow(win))
          out.iterator
      }
  }

  /** Streaming exact dedup: emit only the first occurrence of each
    * key (the streaming form of the batch exact-dedup operator — e.g.
    * dedup-by-fingerprint on a document firehose). State is one
    * boolean per seen key; on a production stream bound it with
    * `GroupStateTimeout.ProcessingTimeTimeout` + a TTL matched to the
    * dedup horizon.
    */
  case class Keyed(key: Long, payload: String)

  def dedupFirstSeen(events: Dataset[Keyed]): Dataset[Keyed] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Keyed](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
  }

  /** Convenience: run a weekly aggregation stream from a parquet
    * directory into an in-memory table, processing everything
    * currently available (complete mode — every week emitted).
    */
  def runWeeklyOnce(spark: org.apache.spark.sql.SparkSession,
      sourceDir: String, schema: org.apache.spark.sql.types.StructType,
      keys: Seq[String], ts: String, value: String,
      sinkTable: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val weekly = weeklyStream(stream, keys, ts, value)
    val q = weekly.writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode(OutputMode.Complete())
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
