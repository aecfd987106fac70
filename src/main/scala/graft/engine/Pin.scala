package graft.engine

import org.apache.spark.sql.DataFrame

/** Eager-pinning helpers.
  *
  * `df.localCheckpoint()` (eager) runs one Spark job and BLOCKS the
  * driver thread — a chain of INDEPENDENT pins therefore serializes
  * on the driver even though the scheduler could overlap them
  * (actions are only sequential because driver code calls them
  * sequentially; with FIFO scheduling a later job's tasks back-fill
  * executor slots freed by the earlier job's straggler tail). For
  * multi-arm queries that pin two or three independent corpus passes
  * (the retrieval arm scoreboard's dense/lexical shortlists), running
  * the pins concurrently removes most of the serialized stage-floor.
  */
object Pin {

  /** Materialize independent frames CONCURRENTLY, one eager
    * `localCheckpoint()` each, and return the pinned frames in input
    * order. Each pin still completes before this method returns, so
    * every consumer plan built afterwards reads checkpointed blocks —
    * the eager-pin discipline (see Dedup.winnowPairs' measured
    * lazy-persist race) is preserved; only the driver-side
    * serialization between INDEPENDENT pins is removed. Spark job
    * groups are thread-inherited (localProperties is an
    * InheritableThreadLocal), so a bench clamp or cancellation on the
    * calling thread's group still reaches every child job. Any
    * failure is rethrown on the calling thread.
    */
  /** Run two INDEPENDENT driver-side computations concurrently and
    * return both results. The [[parallel]] rationale generalized past
    * eager pins: a multi-round FIT LOOP (BPE merges, EM rounds) is a
    * chain of driver-blocking collects, so two independent fits
    * serialize end-to-end even though every stage of one could
    * back-fill executor slots the other's straggler tail leaves idle
    * (guide §2.6). `fa` runs on the CALLING thread (keeping its job
    * group/description for the bench clamp); `fb` runs on a daemon
    * thread that INHERITS the caller's localProperties
    * (InheritableThreadLocal), so cancellation reaches both. Either
    * failure is rethrown after both sides have stopped submitting
    * work. Results must not depend on scheduling — callers pass
    * deterministic, independent computations only.
    */
  def concurrently[A, B](fa: => A, fb: => B): (A, B) = {
    @volatile var bOut: Option[B] = None
    val err =
      new java.util.concurrent.atomic.AtomicReference[Throwable]
    val t = new Thread({ () =>
      try bOut = Some(fb)
      catch { case e: Throwable => err.compareAndSet(null, e) }
    }: Runnable, "pin-concurrently")
    t.setDaemon(true)
    t.start()
    val a =
      try fa
      catch { case e: Throwable => t.join(); throw e }
    t.join()
    if (err.get != null) throw err.get
    (a, bOut.get)
  }

  def parallel(dfs: DataFrame*): Seq[DataFrame] = {
    if (dfs.size <= 1) dfs.map(_.localCheckpoint())
    else {
      val out = new Array[DataFrame](dfs.size)
      val err =
        new java.util.concurrent.atomic.AtomicReference[Throwable]
      val threads = dfs.zipWithIndex.map { case (df, i) =>
        val t = new Thread({ () =>
          try out(i) = df.localCheckpoint()
          catch { case e: Throwable => err.compareAndSet(null, e) }
        }: Runnable, s"pin-parallel-$i")
        t.setDaemon(true)
        t.start()
        t
      }
      threads.foreach(_.join())
      if (err.get != null) throw err.get
      out.toSeq
    }
  }
}
