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
}
