package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond the reference's single equi-join (G5) —
  * notably the as-of join a forecasting/inventory engine wants for
  * "latest observation at or before t" alignment.
  *
  * Spark has no ASOF JOIN; the composed form here follows the
  * SURVEY §7.4 preference order (compose built-ins before custom
  * plans): union both sides tagged, ONE sort per key on (ts, side),
  * and a last-non-null window carries the most recent right-side value
  * forward onto each left row. Cost is a single shuffle+sort of
  * |L|+|R| — no range-condition join (which Spark would execute as a
  * broadcast nested loop), no per-row probing, skew handled by AQE
  * like any other sort. State per key is one carried value.
  */
object Joins {

  /** For every left row, attach the right side's latest `valueCols`
    * at-or-before the left row's `ts` (per `keys`). Left rows with no
    * prior right row get nulls (left-outer semantics). Also emits
    * `matched_ts` = the matched right row's timestamp.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // tag and align schemas: right contributes (ts + valueCols) only
    val rTagged = right.select(
      (keys.map(col) :+ col(ts) :+ lit(0).as("__side")) ++
        (col(ts).as("__r_ts") +: valueCols.map(c =>
          col(c).as(s"__r_$c"))): _*)
    val lTagged = left.select(
      (keys.map(col) :+ col(ts) :+ lit(1).as("__side")) ++
        (lit(null).cast(rTagged.schema("__r_ts").dataType).as("__r_ts") +:
          valueCols.map(c => lit(null).cast(right.schema(c).dataType)
            .as(s"__r_$c"))) ++
        leftCols.filterNot(c => keys.contains(c) || c == ts)
          .map(c => col(c).as(s"__l_$c")): _*)
    val rAligned = rTagged.select(
      (keys.map(col) :+ col(ts) :+ col("__side") :+ col("__r_ts")) ++
        valueCols.map(c => col(s"__r_$c")) ++
        leftCols.filterNot(c => keys.contains(c) || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType)
            .as(s"__l_$c")): _*)
    // right rows sort BEFORE left rows at equal ts: at-or-before
    // includes a same-timestamp right observation
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rAligned)
      .withColumn("matched_ts",
        last(col("__r_ts"), ignoreNulls = true).over(w))
    val withVals = valueCols.foldLeft(carried) { (d, c) =>
      d.withColumn(s"matched_$c",
        last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    withVals
      .filter(col("__side") === 1)
      .select((keys.map(col) :+ col(ts)) ++
        leftCols.filterNot(c => keys.contains(c) || c == ts)
          .map(c => col(s"__l_$c").as(c)) ++
        (col("matched_ts") +: valueCols.map(c => col(s"matched_$c"))): _*)
  }

  /** Point-in-interval range join WITHOUT an equi key, binned: Spark
    * plans a bare `lo <= x AND x <= hi` join as a broadcast
    * nested-loop (every point against every interval — n·m at any
    * cluster size). Binning turns it into an EQUI join: each interval
    * is exploded to the `binWidth`-sized bins it overlaps, each point
    * hashes to exactly one bin, and the range predicate survives only
    * as a residual filter after the hash join. Shuffle is keyed on
    * the bin — uniformly distributed when points are — and interval
    * replication is length/binWidth + 1, the caller-visible knob
    * (size bins near the median interval length). No dedup needed:
    * a point's single bin meets each interval at most once.
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    points
      .withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(col(loCol) <= col(pointCol) &&
        col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** SCD-1 merge/upsert (the Delta/Iceberg MERGE shape, engine-level):
    * rows in `updates` override same-key rows in `base`; new keys are
    * inserted. Both sides must be key-unique (standard MERGE
    * precondition).
    *
    * Implemented as tagged-union + one per-key arg-min aggregation
    * rather than a full-outer join: ONE shuffle on the key, no join
    * at all, and it generalizes to N prioritized sources (base <
    * updates < corrections) for free. At 100 TB the base side should
    * be bucketed on the key ([[graft.engine.Ingest.writeBucketed]])
    * so only the (much smaller) update side moves.
    */
  /** SCD-2 apply: the time-versioned complement of [[mergeUpsert]].
    * `history` carries validity intervals (`validTo` null = current
    * row); each update (at most one per key per batch — standard
    * MERGE precondition) CLOSES the key's current row at the update
    * timestamp and appends a new open version; unseen keys insert an
    * open row. Closed rows pass through untouched, so history is
    * append-only — the warehouse pattern that keeps every past state
    * queryable "as of" any time.
    *
    * Cost: one key-shuffle join of history against the (small) update
    * batch plus a plan-level union — updates broadcast when they fit,
    * and with the history bucketed on the key nothing but the batch
    * moves.
    */
  def scd2Apply(history: DataFrame, updates: DataFrame, key: String,
      ts: String, validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val payload = history.columns
      .filterNot(c => c == key || c == validFrom || c == validTo)
    // no forced broadcast: the update batch is usually tiny (AQE
    // broadcasts it on its own), but a backfill-sized batch must be
    // free to shuffle-join instead of OOMing the driver
    val closed = history
      .join(updates.select(col(key), col(ts).as("__uts")),
        Seq(key), "left")
      .withColumn(validTo,
        when(col(validTo).isNull && col("__uts").isNotNull,
          col("__uts")).otherwise(col(validTo)))
      .drop("__uts")
    val inserts = updates.select(
      (col(key) +: payload.toSeq.map(col)) :+
        col(ts).as(validFrom) :+
        lit(null).cast(history.schema(validTo).dataType)
          .as(validTo): _*)
    closed.unionByName(inserts)
  }

  /** SCD-2 point-in-time LOOKUP, the read side of [[scd2Apply]]: join
    * each fact row to the dimension version that was valid at the
    * fact's own timestamp — key equality plus the validity-range
    * predicate `valid_from <= ts AND (valid_to IS NULL OR
    * ts < valid_to)`. Returns the fact key/ts plus the history
    * payload columns as of that instant; facts predating the key's
    * first version (or with no history at all) keep nulls.
    *
    * Scale shape: this is an EQUI-join on the key (the range
    * predicate rides along as a join-time filter), so it shuffles or
    * broadcasts exactly like any key join — never an interval-only
    * cross. Keys carry few versions each, so the per-key match
    * amplification is the version count, not the corpus.
    */
  def scd2Lookup(history: DataFrame, facts: DataFrame, key: String,
      ts: String, validFrom: String = "valid_from",
      validTo: String = "valid_to"): DataFrame = {
    val payload = history.columns
      .filterNot(c => c == key || c == validFrom || c == validTo)
    val h = history.select(
      col(key).as("__hk") +: (payload :+ validFrom :+ validTo)
        .map(col): _*)
    facts.join(h,
        facts(key) === h("__hk") &&
          h(validFrom) <= facts(ts) &&
          (h(validTo).isNull || facts(ts) < h(validTo)),
        "left")
      .drop("__hk", validTo)
  }

  /** Interval×interval OVERLAP join via time-bucketization — the
    * scale-correct plan for "which events overlap which windows" when
    * NEITHER side is small enough to broadcast and there is no equi
    * key. Each interval explodes into the `bucketDays`-wide buckets
    * it covers (explode factor = interval length / bucket + 1, small
    * for short intervals); the join is then a plain EQUI-join on the
    * bucket id, followed by the true overlap predicate. A naive theta
    * join is |A|×|B| — a cartesian nested-loop at any scale; this is
    * a hash join whose build side is bounded per bucket by the
    * intervals genuinely active in that window. Each overlapping
    * pair is emitted exactly ONCE — at the bucket containing the
    * overlap's start (`greatest(aStart, bStart)`) — so no distinct
    * pass is needed afterwards.
    */
  def intervalJoin(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketDays: Int = 7): DataFrame = {
    val epoch = lit(java.sql.Date.valueOf("1970-01-01"))
    def bkt(c: Column): Column =
      floor(datediff(c, epoch) / bucketDays).cast("long")
    val ae = a.withColumn("__bkt",
      explode(sequence(bkt(col(aStart)), bkt(col(aEnd)))))
    val be = b.withColumn("__bkt",
      explode(sequence(bkt(col(bStart)), bkt(col(bEnd)))))
    ae.join(be, Seq("__bkt"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      // canonical-bucket emission: keep the pair only in the bucket
      // where its overlap starts
      .filter(col("__bkt") === bkt(greatest(col(aStart), col(bStart))))
      .drop("__bkt")
  }

  /** Snapshot CDC: diff two versions of the same keyed table into a
    * change feed — one row per key that changed, classified
    * insert / delete / update, with the list of changed payload
    * columns (null-safe compare, so null→value and value→null both
    * count). Unchanged keys are dropped. This is the change-data
    * feed a downstream incremental consumer wants when the source
    * can only provide full snapshots. One full-outer key join —
    * shuffles on the key like any join; with both snapshots bucketed
    * on the key it is exchange-free.
    */
  def cdcDiff(old: DataFrame, neu: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(old.columns.sameElements(neu.columns),
      "snapshots must share a schema")
    val payload = old.columns.filterNot(keys.contains)
    val o = old.select(old.columns.map(c =>
      col(c).as(if (keys.contains(c)) c else s"__o_$c")): _*)
    val n = neu.select(neu.columns.map(c =>
      col(c).as(if (keys.contains(c)) c else s"__n_$c")): _*)
    val joined = o
      .withColumn("__in_o", lit(true))
      .join(n.withColumn("__in_n", lit(true)), keys.toSeq, "full_outer")
    val changed = array_compact(array(payload.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*))
    joined
      .withColumn("change_type",
        when(col("__in_o").isNull, "insert")
          .when(col("__in_n").isNull, "delete")
          .when(size(changed) > 0, "update")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      // only meaningful for updates (inserts/deletes "change" every
      // column by construction — noise, not signal)
      .withColumn("changed_cols",
        when(col("change_type") === "update", array_join(changed, ","))
          .otherwise(lit("")))
      .select((keys.map(col) :+ col("change_type") :+
        col("changed_cols")) ++
        payload.flatMap(c => Seq(col(s"__o_$c").as(s"old_$c"),
          col(s"__n_$c").as(s"new_$c"))): _*)
  }

  def mergeUpsert(base: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      "base and updates must share a schema")
    val payload = base.columns.filterNot(keys.contains)
    base.withColumn("__prio", lit(1))
      .unionByName(updates.withColumn("__prio", lit(0)))
      .groupBy(keys.map(col): _*)
      .agg(min_by(col(payload.head), col("__prio")).as(payload.head),
        payload.tail.toSeq
          .map(c => min_by(col(c), col("__prio")).as(c)): _*)
  }
}
