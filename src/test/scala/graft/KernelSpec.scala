package graft

import graft.engine.{Inventory, Metrics, PipelineConfig}
import graft.engine.forecast.{Kernel, Models}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Unit pins for the typed kernel semantics (SURVEY §5.1): pandas
  * quantile parity, densify gap-fill, gates, winsorize-raises-zeros,
  * banker's rounding.
  */
class KernelSpec extends AnyFunSuite {

  test("quantile matches pandas linear interpolation (q99 of 1..10 = 9.91)") {
    val xs = (1 to 10).map(_.toDouble).toArray
    assert(math.abs(Kernel.quantile(xs, 0.99) - 9.91) < 1e-12)
    assert(math.abs(Kernel.quantile(xs, 0.01) - 1.09) < 1e-12)
    assert(Kernel.quantile(xs, 0.5) === 5.5)
    assert(Kernel.quantile(Array(7.0), 0.99) === 7.0)
  }

  private def e(d: String, u: Double) =
    Kernel.SeriesEntry(Date.valueOf(d), u)

  test("densify fills missing weeks with explicit zeros") {
    // Sundays 3 weeks apart -> 2 zero weeks in between
    val dense = Kernel.densify(Seq(
      e("2024-01-07", 5.0), e("2024-01-28", 3.0)))
    assert(dense.toSeq === Seq(5.0, 0.0, 0.0, 3.0))
  }

  test("densify drops null weeks (pandas NaT semantics)") {
    val dense = Kernel.densify(Seq(
      Kernel.SeriesEntry(null, 9.0), e("2024-01-07", 5.0)))
    assert(dense.toSeq === Seq(5.0))
  }

  test("densify rejects a pathological multi-decade span instead of " +
      "inflating memory (one corrupted timestamp)") {
    // 2 sale weeks 75 years apart: ~3900 gap cells — over the 2600
    // (50 yr) calendar bound, so this is corruption, not history
    val bad = Seq(e("2024-01-07", 5.0), e("2099-01-04", 3.0))
    val ex = intercept[IllegalArgumentException](Kernel.densify(bad))
    assert(ex.getMessage.contains("maxSpanWeeks"))
    // an explicitly raised bound restores the old behavior unchanged
    val dense = Kernel.densify(bad, maxSpanWeeks = 10000)
    assert(dense.length === 3914 && dense.sum === 8.0)
    // and a span exactly AT the bound passes (boundary inclusive)
    val edge = Seq(e("2024-01-07", 1.0),
      e(java.time.LocalDate.parse("2024-01-07").plusWeeks(2599)
        .toString, 1.0))
    assert(Kernel.densify(edge).length === 2600)
  }

  test("MIN_WEEKS gate counts gap-filled zero weeks") {
    // 2 sale weeks spanning 13 weeks -> densified length 13 >= 12 passes
    val series = Array(5.0) ++ Array.fill(11)(0.0) ++ Array(6.0)
    val r = Kernel.processSeries("s", "t", series,
      PipelineConfig(useTrendSeasonal = false, useHoltWinters = false))
    assert(r.isDefined)
    // same sales in only 11 bins -> rejected
    val short = Array(5.0) ++ Array.fill(9)(0.0) ++ Array(6.0)
    assert(Kernel.processSeries("s", "t", short).isEmpty)
  }

  test("MIN_TOTAL_SALES gate rejects low-volume series") {
    val series = Array.fill(13)(0.5) // 13 weeks, total 6.5 < 10
    assert(Kernel.processSeries("s", "t", series).isEmpty)
  }

  test("winsorize raises gap-filled zeros to q01 of positive values") {
    // 8 positive weeks (>5 positives) + zeros; zeros must rise to q01
    val series = Array(10.0, 0.0, 12.0, 11.0, 0.0, 13.0, 10.0, 12.0,
      11.0, 13.0, 0.0, 10.0, 9.0)
    val r = Kernel.processSeries("s", "t", series,
      PipelineConfig(useTrendSeasonal = false, useHoltWinters = false))
      .get
    // test = last 4 winsorized weeks: zeros raised to q01 > 0
    assert(r.test.forall(_ > 0.0))
  }

  test("winsorize skipped with <= 5 positive weeks") {
    // 5 positive weeks up front, zeros in the test window: with <= 5
    // positives the clip must NOT raise them
    val series = Array(10.0, 11.0, 12.0, 13.0, 9.0, 0.0, 0.0, 0.0, 0.0,
      0.0, 0.0, 0.0, 0.0)
    val r = Kernel.processSeries("s", "t", series,
      PipelineConfig(useTrendSeasonal = false, useHoltWinters = false))
      .get
    assert(r.test.contains(0.0)) // zeros survive untouched
  }

  test("inventory clamp uses banker's rounding (2.5 -> 2, 3.5 -> 4)") {
    assert(math.rint(2.5).toInt === 2)
    assert(math.rint(3.5).toInt === 4)
    val inv = Inventory.compute(
      train = Array(10.0, 10.0), forecast = Array.empty,
      PipelineConfig())
    assert(inv.safetyStock === 0) // zero stddev -> ss 0
  }

  test("J3-only forecast is the tail-4 train mean repeated") {
    val series = (1 to 16).map(_.toDouble).toArray // no winsorize effect? q01/q99 clip
    val r = Kernel.processSeries("s", "t", series,
      PipelineConfig(useTrendSeasonal = false, useHoltWinters = false))
      .get
    // train = winsorized first 12; last 4 of train = winsorized 9..12
    val pos = series.filter(_ > 0).sorted
    val lo = Kernel.quantile(pos, 0.01)
    val hi = Kernel.quantile(pos, 0.99)
    val wins = series.map(x => math.min(math.max(x, lo), hi))
    val expected = wins.dropRight(4).takeRight(4).sum / 4
    assert(r.forecast.forall(f => math.abs(f - expected) < 1e-9))
  }
}

class ModelsSpec extends AnyFunSuite {

  test("movingAverage: tail-4 mean, full mean when shorter, floor 0") {
    assert(Models.movingAverage(Array(1, 2, 3, 4, 5), 3).toSeq
      === Seq(3.5, 3.5, 3.5))
    assert(Models.movingAverage(Array(2.0, 4.0), 2).toSeq === Seq(3.0, 3.0))
    assert(Models.movingAverage(Array(-8.0, -8.0, -8.0, -8.0), 1).toSeq
      === Seq(0.0))
  }

  test("holtWinters gated on >= 8 train weeks") {
    assert(Models.holtWinters(Array.fill(7)(5.0), 4).isEmpty)
    assert(Models.holtWinters(Array.fill(8)(5.0), 4).isDefined)
  }

  test("holtWinters constant series forecasts ~constant") {
    val fc = Models.holtWinters(Array.fill(20)(10.0), 4).get
    fc.foreach(f => assert(math.abs(f - 10.0) < 0.5))
  }

  test("holtWinters seasonal branch requires two full cycles") {
    // 60 weeks (>= 52 but < 104): must NOT take the seasonal branch
    // (statsmodels raises there; our gate returns the non-seasonal fit)
    val y = Array.tabulate(60)(i => 10.0 + 5 * math.sin(i / 8.0))
    val fc = Models.holtWinters(y, 4).get
    fc.foreach(f => assert(f >= 0 && f.isFinite && f < 1e4))
  }

  test("trendSeasonal gated on configurable minTrain") {
    assert(Models.trendSeasonal(Array.fill(11)(5.0), 4).isEmpty)
    assert(Models.trendSeasonal(Array.fill(11)(5.0), 4, minTrain = 8)
      .isDefined)
  }

  test("trendSeasonal recovers a linear trend") {
    val y = Array.tabulate(30)(i => 2.0 * i + 5.0)
    val fc = Models.trendSeasonal(y, 2).get
    // log1p-space fit of an exact linear series still extrapolates up
    assert(fc(0) > y.last * 0.8)
  }

  test("ensemble: element-wise median, capped, floored at 0") {
    val preds = Seq(Array(1.0, 10.0), Array(3.0, 20.0), Array(2.0, 300.0))
    val train = Array(2.0, 2.0, 2.0, 2.0)
    val fc = Models.ensemble(preds, train, 2)
    assert(fc(0) === 2.0) // median of 1,3,2
    assert(fc(1) === 20.0) // median of 10,20,300
    // cap = max(10 * max(1, mean(train)), max(median)) = max(20, 20)
    val one = Models.ensemble(Seq(Array(100.0)), train, 1)
    assert(one(0) === 100.0) // cap >= max(ensemble) never clips the median
  }

  test("ensemble cap floors historical average at 1.0 (PRACTICA3.py:152)") {
    // tiny train mean: cap = max(10*1.0, max(med))
    val fc = Models.ensemble(Seq(Array(7.0)), Array(0.1, 0.1), 1)
    assert(fc(0) === 7.0)
  }
}

class MetricsSpec extends AnyFunSuite {

  test("safeMape masks zero actuals") {
    // y=(0,10), yhat=(5,11): only y=10 counted -> |1/10|*100 = 10
    assert(Metrics.safeMape(Array(0.0, 10.0), Array(5.0, 11.0)) === 10.0)
  }

  test("safeMape all-zero actuals falls back to plain MAE (not pct)") {
    assert(Metrics.safeMape(Array(0.0, 0.0), Array(3.0, 5.0)) === 4.0)
  }

  test("smape masked denominator and bounds") {
    val s = Metrics.smape(Array(10.0, 0.0), Array(10.0, 0.0))
    assert(s === 0.0) // all-masked -> MAE fallback = 0
    val s2 = Metrics.smape(Array(1.0), Array(3.0))
    assert(math.abs(s2 - 100.0) < 1e-9) // 2*2/(1+3)=1 -> 100
  }

  test("rmse and mae") {
    assert(Metrics.rmse(Array(1.0, 2.0), Array(1.0, 4.0))
      === math.sqrt(2.0))
    assert(Metrics.mae(Array(1.0, 2.0), Array(1.0, 4.0)) === 1.0)
  }

  test("identical arrays give zero error") {
    val a = Array(1.5, 2.5, 3.5)
    assert(Metrics.safeMape(a, a) === 0.0)
    assert(Metrics.rmse(a, a) === 0.0)
    assert(Metrics.mae(a, a) === 0.0)
  }
}

class InventorySpec extends AnyFunSuite {

  test("stddevPop is population (ddof=0), 0 for short arrays") {
    assert(Inventory.stddevPop(Array(2.0, 4.0)) === 1.0)
    assert(Inventory.stddevPop(Array(5.0)) === 0.0)
  }

  test("compute matches reference formulas") {
    val cfg = PipelineConfig()
    val train = Array(10.0, 20.0, 30.0, 40.0)
    val fc = Array(25.0, 25.0)
    val inv = Inventory.compute(train, fc, cfg)
    val ss = cfg.serviceLevelZ * Inventory.stddevPop(train) *
      math.sqrt(cfg.leadTimeWeeks)
    val dlt = 25.0 * cfg.leadTimeWeeks
    val rop = dlt + ss
    assert(inv.safetyStock === math.rint(ss).toInt)
    assert(inv.reorderPoint === math.rint(rop).toInt)
    assert(inv.qty === math.rint(math.max(0.0, rop - 40.0)).toInt)
  }

  test("qty floors at zero when last sales exceed ROP") {
    val inv = Inventory.compute(Array(5.0, 5.0, 1000.0), Array(1.0), PipelineConfig())
    assert(inv.qty === 0)
  }

  test("monotonicity: higher dispersion raises safety stock") {
    val lo = Inventory.compute(Array(10.0, 10.0, 10.0, 10.0), Array(5.0),
      PipelineConfig())
    val hi = Inventory.compute(Array(0.0, 20.0, 0.0, 20.0), Array(5.0),
      PipelineConfig())
    assert(hi.safetyStock > lo.safetyStock)
  }
}
