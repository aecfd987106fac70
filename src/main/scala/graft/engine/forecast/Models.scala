package graft.engine.forecast

/** Per-series forecast models (SURVEY §2 rows J1-J4) — plain Scala run
  * inside the typed kernel; deliberately NOT Catalyst work (model fits
  * are sequential per series).
  *
  * All models fit in log1p space and invert with expm1, flooring at 0,
  * exactly as the reference (ref: PRACTICA3.py:114-147).
  */
object Models {

  /** J3 — moving average: constant forecast = mean of the last 4 train
    * weeks (full mean when shorter), repeated over the horizon
    * (ref: PRACTICA3.py:143-147). Always succeeds, so the ensemble is
    * never empty.
    */
  def movingAverage(train: Array[Double], horizon: Int): Array[Double] = {
    val tail = if (train.length >= 4) train.takeRight(4) else train
    val m = if (tail.isEmpty) 0.0 else tail.sum / tail.length
    Array.fill(horizon)(math.max(0.0, m))
  }

  /** J2 — additive Holt(-Winters) on log1p(train): level+trend
    * recursions, optional additive seasonality when len ≥ 52 (weekly
    * data → period 52), smoothing params fitted by grid search on
    * in-sample SSE (the reference lets statsmodels optimize; we match
    * the model form, not the optimizer — SURVEY §7.5.2). Gated on ≥ 8
    * train weeks like the reference (ref: PRACTICA3.py:129-140).
    */
  def holtWinters(train: Array[Double], horizon: Int): Option[Array[Double]] = {
    if (train.length < 8) return None
    val y = train.map(v => math.log1p(math.max(0.0, v)))
    // statsmodels raises with < 2 full seasonal cycles (the reference's
    // try/except then drops HW from the ensemble); with one cycle our
    // trend init would divide an empty second-period slice. Require two.
    val period = 52
    val seasonal = y.length >= 2 * period

    def fit(alpha: Double, beta: Double, gamma: Double)
        : (Double, Array[Double], Double, Double) = {
      val n = y.length
      var level = y.head
      var trend = if (n > 1) y(1) - y(0) else 0.0
      val seas = Array.fill(period)(0.0)
      if (seasonal) {
        // init seasonal indices from first-period deviations vs linear fit
        val firstMean = y.take(period).sum / period
        var i = 0
        while (i < period) { seas(i) = y(i) - firstMean; i += 1 }
        level = firstMean
        trend = (y.slice(period, math.min(2 * period, n)).sum /
          math.max(1, math.min(period, n - period)) - firstMean) /
          math.max(1, period)
      }
      var sse = 0.0
      var t = 0
      while (t < n) {
        val s = if (seasonal) seas(t % period) else 0.0
        val pred = level + trend + s
        val err = y(t) - pred
        sse += err * err
        val newLevel = alpha * (y(t) - s) + (1 - alpha) * (level + trend)
        trend = beta * (newLevel - level) + (1 - beta) * trend
        if (seasonal) seas(t % period) = gamma * (y(t) - newLevel) +
          (1 - gamma) * s
        level = newLevel
        t += 1
      }
      (sse, seas, level, trend)
    }

    val grid = Seq(0.05, 0.1, 0.2, 0.3, 0.5, 0.8)
    val betas = Seq(0.01, 0.05, 0.1, 0.3)
    val gammas = if (seasonal) Seq(0.05, 0.2) else Seq(0.0)
    var best: (Double, Array[Double], Double, Double) = null
    var bestSse = Double.MaxValue
    for (a <- grid; b <- betas; g <- gammas) {
      val r = fit(a, b, g)
      if (r._1 < bestSse) { bestSse = r._1; best = r }
    }
    val (_, seas, level, trend) = best
    val n = y.length
    Some(Array.tabulate(horizon) { h =>
      val s = if (seasonal) seas((n + h) % period) else 0.0
      math.max(0.0, math.expm1(level + (h + 1) * trend + s))
    })
  }

  /** J1 substitute — deterministic additive trend + Fourier seasonality
    * fitted by ordinary least squares on log1p(train): the published
    * Prophet model form (piecewise-linear trend reduced to single
    * linear; yearly seasonality as Fourier pairs), no Stan. Gated on
    * ≥ 12 train weeks like the reference gates Prophet
    * (ref: PRACTICA3.py:114-127). Divergence from Prophet's MAP fit is
    * expected and documented (SURVEY §7.5.3); the ensemble median
    * tolerates it.
    */
  def trendSeasonal(train: Array[Double], horizon: Int,
      fourierOrder: Int = 3, minTrain: Int = 12): Option[Array[Double]] = {
    val n = train.length
    if (n < minTrain) return None
    val y = train.map(v => math.log1p(math.max(0.0, v)))
    val periodWeeks = 365.25 / 7.0 // yearly seasonality on weekly grid
    val k = math.min(fourierOrder, math.max(1, n / 8))
    val p = 2 + 2 * k // intercept, slope, k sin/cos pairs

    def features(t: Double): Array[Double] = {
      val f = new Array[Double](p)
      f(0) = 1.0; f(1) = t
      var j = 0
      while (j < k) {
        val w = 2.0 * math.Pi * (j + 1) * t / periodWeeks
        f(2 + 2 * j) = math.sin(w)
        f(3 + 2 * j) = math.cos(w)
        j += 1
      }
      f
    }

    // normal equations X'X b = X'y with ridge eps for stability
    val xtx = Array.ofDim[Double](p, p)
    val xty = new Array[Double](p)
    var t = 0
    while (t < n) {
      val f = features(t.toDouble)
      var i = 0
      while (i < p) {
        xty(i) += f(i) * y(t)
        var j = 0
        while (j < p) { xtx(i)(j) += f(i) * f(j); j += 1 }
        i += 1
      }
      t += 1
    }
    var d = 0
    while (d < p) { xtx(d)(d) += 1e-8; d += 1 }
    val beta = solve(xtx, xty).getOrElse(return None)
    Some(Array.tabulate(horizon) { h =>
      val f = features((n + h).toDouble)
      var pred = 0.0
      var i = 0
      while (i < p) { pred += beta(i) * f(i); i += 1 }
      math.max(0.0, math.expm1(pred))
    })
  }

  /** Gaussian elimination with partial pivoting. */
  private def solve(a: Array[Array[Double]], b: Array[Double])
      : Option[Array[Double]] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) {
        if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r
        r += 1
      }
      if (math.abs(m(piv)(col)) < 1e-12) return None
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      r = col + 1
      while (r < n) {
        val f = m(r)(col) / m(col)(col)
        var c = col
        while (c <= n) { m(r)(c) -= f * m(col)(c); c += 1 }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = m(i)(n)
      var j = i + 1
      while (j < n) { s -= m(i)(j) * x(j); j += 1 }
      x(i) = s / m(i)(i)
      i -= 1
    }
    Some(x)
  }

  /** J4 — element-wise median ensemble + cap to
    * [0, max(10·mean(train), max(ensemble))] (ref: PRACTICA3.py:149-154).
    * Clip bounds from the TRAIN mean; MA is always present so the stack
    * is non-empty.
    */
  def ensemble(preds: Seq[Array[Double]], train: Array[Double],
      horizon: Int): Array[Double] = {
    val med = Array.tabulate(horizon) { h =>
      val vals = preds.map(_(h)).sorted
      val m = vals.length
      if (m % 2 == 1) vals(m / 2) else (vals(m / 2 - 1) + vals(m / 2)) / 2.0
    }
    // ref floors the historical average at 1.0 (PRACTICA3.py:152)
    val histAvg =
      math.max(1.0, if (train.nonEmpty) train.sum / train.length else 0.0)
    val cap = math.max(10.0 * histAvg, med.max)
    med.map(x => math.min(math.max(0.0, x), cap))
  }
}
