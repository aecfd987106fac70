package graft

import graft.engine.{Inventory, Metrics, PipelineConfig}
import graft.engine.forecast.{Kernel, Models}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property invariants (SURVEY §5.2), hand-rolled with a seeded
  * generator (scalatestplus-scalacheck is not in the offline cache;
  * plain scalacheck's Prop runner doesn't integrate with funsuite).
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private def arr(n: Int, lo: Double = 0.0, hi: Double = 1e6): Array[Double] =
    Array.fill(n)(lo + rnd.nextDouble() * (hi - lo))
  private val trials = 200

  test("eligibleSparse = eligible after densify (gate-before-densify equivalence)") {
    // randomized sparse weekly frames: the groups surviving the gates
    // must be identical whether gates run on the sparse frame (span
    // arithmetic) or on the densified frame (dense row count)
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cfg = PipelineConfig()
    (1 to 10).foreach { _ =>
      val rows = (0 until 40).map { _ =>
        val key = s"k${rnd.nextInt(6)}"
        val week = java.sql.Date.valueOf(
          java.time.LocalDate.of(2024, 1, 7).plusWeeks(rnd.nextInt(30)))
        (key, week, rnd.nextInt(12).toDouble)
      }
      val sparse = rows.toDF("sku", "week", "units")
        .groupBy("sku", "week")
        .agg(org.apache.spark.sql.functions.sum("units").as("units"))
      val viaSparse = graft.engine.Resample.densify(
        graft.engine.Series.eligibleSparse(sparse, Seq("sku"), cfg),
        Seq("sku"))
        .select("sku", "week", "units").collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
        .sorted
      val viaDense = graft.engine.Series.eligible(
        graft.engine.Resample.densify(sparse, Seq("sku")), Seq("sku"),
        cfg)
        .select("sku", "week", "units").collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
        .sorted
      assert(viaSparse.toSeq === viaDense.toSeq)
    }
  }

  test("safeMape is non-negative and finite") {
    (1 to trials).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val m = Metrics.safeMape(arr(n), arr(n))
      assert(m >= 0.0 && !m.isNaN && !m.isInfinite)
    }
  }

  test("smape within [0, 200]") {
    (1 to trials).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val s = Metrics.smape(arr(n), arr(n))
      assert(s >= 0.0 && s <= 200.0 + 1e-9)
    }
  }

  test("rmse >= mae") {
    (1 to trials).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val (y, yh) = (arr(n), arr(n))
      assert(Metrics.rmse(y, yh) >= Metrics.mae(y, yh) - 1e-9)
    }
  }

  test("quantile is monotone in q and bounded by min/max") {
    (1 to trials).foreach { _ =>
      val xs = arr(1 + rnd.nextInt(50)).sorted
      val q1 = Kernel.quantile(xs, 0.01)
      val q9 = Kernel.quantile(xs, 0.99)
      assert(q1 <= q9 + 1e-9)
      assert(q1 >= xs.head - 1e-9 && q9 <= xs.last + 1e-9)
    }
  }

  test("winsorize-style clip is idempotent") {
    (1 to trials).foreach { _ =>
      val xs = arr(20)
      val pos = xs.filter(_ > 0).sorted
      if (pos.length > 5) {
        val lo = Kernel.quantile(pos, 0.01)
        val hi = Kernel.quantile(pos, 0.99)
        val once = xs.map(x => math.min(math.max(x, lo), hi))
        val twice = once.map(x => math.min(math.max(x, lo), hi))
        assert(once.toSeq === twice.toSeq)
      }
    }
  }

  test("ensemble median bounded above by model max (cap only lowers)") {
    (1 to trials).foreach { _ =>
      val h = 1 + rnd.nextInt(8)
      val k = 1 + rnd.nextInt(3)
      val preds = Seq.fill(k)(arr(h))
      val fc = Models.ensemble(preds, Array(1e5, 1e5), h)
      (0 until h).foreach { i =>
        assert(fc(i) <= preds.map(_(i)).max + 1e-9)
      }
    }
  }

  test("inventory outputs are non-negative") {
    (1 to trials).foreach { _ =>
      val inv = Inventory.compute(arr(10), arr(4), PipelineConfig())
      assert(inv.safetyStock >= 0 && inv.reorderPoint >= 0 && inv.qty >= 0)
    }
  }

  test("movingAverage constant over horizon and >= 0") {
    (1 to trials).foreach { _ =>
      val h = 1 + rnd.nextInt(8)
      val fc = Models.movingAverage(arr(10, -100, 100), h)
      assert(fc.length === h)
      assert(fc.distinct.length === 1)
      assert(fc.head >= 0.0)
    }
  }

  test("processSeries deterministic: same input, same output") {
    (1 to 20).foreach { _ =>
      val s = arr(20, 0, 50)
      val a = Kernel.processSeries("k", "s", s)
      val b = Kernel.processSeries("k", "s", s)
      assert(a.map(_.forecast.toSeq) === b.map(_.forecast.toSeq))
      assert(a.map(_.mape) === b.map(_.mape))
    }
  }
}
