package graft

import org.apache.spark.sql.catalyst.plans.logical.Window
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide physical-shape guards.
  *
  * The repo-wide posture after round 16 is "zero unpartitioned
  * WindowExec anywhere, including bounded frames" — every global
  * rank/prefix-sum either rides [[graft.engine.Dist]]'s range-
  * partitioned prefix sum, a [[graft.engine.Dist.topFrameRank]]
  * broadcast predecessor join, or a window partitioned by a real
  * key. Round 16 established that posture by hand audit; this spec
  * keeps it as the registry grows: it builds EVERY registered query
  * against sf0.001 and fails on any logical Window whose partition
  * spec is empty or all-foldable (a literal-only spec is folded out
  * by the optimizer, leaving the same single-task sort).
  *
  * Caveat: a `localCheckpoint()` inside a query builder truncates
  * the downstream plan at a LogicalRDD, so windows in pinned
  * subtrees are invisible here — those sites are each covered by
  * their own operator-level plan pin (LlmSpec), and the helpers
  * they share (Dist.prefixSum / topFrameRank / selfScalarCross) are
  * window-free by construction.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("no registered query plans an unpartitioned window") {
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sfDir).queryExecution.optimizedPlan
          .collect {
            case w: Window if !w.partitionSpec.exists(!_.foldable) =>
              s"$name: Window(${w.windowExpressions.map(_.name).mkString(",")})"
          }
        bad
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows:\n${offenders.mkString("\n")}")
  }

  /** Round-21 extension of the posture to LOW-CARDINALITY partition
    * keys: interleave_schedule's per-source rank used to be a window
    * partitioned by `source` — cardinality = the mixture-weight map,
    * so ONE task sorted each source's entire corpus slice. After the
    * Dist.groupedRank rewrite, every window the query plans must be
    * partition-local (a `__pid` spark_partition_id attribute in its
    * partition spec): no single task ever sorts a whole source.
    * kmv_distinct / kmv_sample keep their per-source windows but
    * feed them through the sketchOverlap hash-threshold prefilter —
    * asserted here as a Filter on __h strictly below the window.
    */
  test("interleave_schedule plans no whole-source window; kmv windows " +
      "sit above the hash-threshold prefilter") {
    val sfDir = "/root/testdata/sf0.001"
    val wins = SparkEntry.queries("interleave_schedule")(spark, sfDir)
      .queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(wins.nonEmpty, "expected partition-local rank windows")
    wins.foreach { w =>
      assert(w.partitionSpec.exists(
        _.references.exists(_.name == "__pid")),
        s"window not partition-local: ${w.partitionSpec}")
    }
    // round-21 wave 2: the grouped-rank sweep's other two
    // low-cardinality windows — any window partitioned by the
    // corpus-sized grouping key (pred_lang / source) must be
    // partition-local (__pid alongside it); windows on other keys
    // (bounded frames, high-cardinality ids) are exempt
    for ((q, key) <- Seq("ppl_buckets" -> "pred_lang",
        "quality_pct_rank" -> "source")) {
      val wins = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.optimizedPlan.collect { case w: Window => w }
      val offenders = wins.filter { w =>
        w.partitionSpec.exists(_.references.exists(_.name == key)) &&
          !w.partitionSpec.exists(
            _.references.exists(_.name == "__pid"))
      }
      assert(offenders.isEmpty,
        s"$q: whole-$key window: ${offenders.map(_.partitionSpec)}")
    }
    for (q <- Seq("kmv_distinct", "kmv_sample")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.optimizedPlan
      val winsQ = plan.collect { case w: Window => w }
      assert(winsQ.nonEmpty, s"$q: expected a per-group window")
      // every window's child subtree must contain the __h threshold
      // predicate (as a Filter, or pushed into the counts join), so
      // the sorted set is the ~4k-row survivor frame, never the corpus
      winsQ.foreach { w =>
        val conds = w.child.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.toString
          case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
            j.condition.map(_.toString).getOrElse("")
        }
        assert(conds.exists(c => c.contains("__h") && c.contains("<")),
          s"$q: window sorts an unfiltered per-group frame")
      }
    }
  }
}
