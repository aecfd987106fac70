package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-data and model-evaluation operators for a training-data
  * curation stack: pairwise preference extraction, Bradley-Terry
  * strength fitting (the statistical core of RLHF reward-data QA and
  * of LLM-judge win-rate leaderboards), inter-annotator agreement
  * (Cohen's kappa — the labeling-QA gate in front of any supervised
  * quality classifier), and exact Mann-Whitney ROC/AUC for the linear
  * quality gate ([[TextAnalysis.withLrGate]]).
  *
  * The reference pipeline has no preference/evaluation stage; these
  * extend the engine the same way the dedup/tokenizer families do
  * (SURVEY §7's LLM-pipeline extension mandate). Shared design rules:
  *   - corpus-size work is ONE bounded-key aggregate (pairs →
  *     item×item counts; labels → class×class confusion; scores →
  *     ≤2e6+1-row micro-score histogram) — never an all-pairs or
  *     per-row model step;
  *   - everything after the aggregate is integer micro/ppm arithmetic
  *     (the [[TextAnalysis.lrCalibration]] contract: clamp before any
  *     integer division so truncate-vs-floor semantics never see a
  *     negative operand), or a FIXED-ORDER IEEE double op sequence
  *     from exact integers (bit-identical across engines);
  *   - iterative fits run driver-side over the broadcastable counts
  *     frame in BigInt (the established driver-side-selection pattern
  *     of the BPE merge loop and the Hamilton quota allocation), so
  *     the fit costs zero extra Spark jobs per iteration.
  */
object Preference {

  /** Deterministic pairwise preferences from a scored corpus: for
    * each stride `k`, row `id` is matched against row `id + k`; the
    * higher `score` wins, exact ties go to the lexicographically
    * smaller item (a total rule, so the pair frame is reproducible
    * bit-for-bit). Same-item pairs carry no preference signal and are
    * dropped. `score` must be integral-valued (it is compared after a
    * long cast — exact ties on doubles are engine lottery).
    *
    * Scale shape: one equi-join per stride on the id key (both sides
    * hash-partition on the key — a co-partitioned shuffle join, never
    * a cross), unioned. At N rows and S strides the output is ≤ N·S
    * pairs.
    */
  def prefPairs(df: DataFrame, id: String, item: String,
      score: String, strides: Seq[Long] = Seq(1L, 7L)): DataFrame = {
    require(strides.nonEmpty && strides.forall(_ > 0) &&
      strides.distinct.size == strides.size,
      "strides must be distinct positive offsets")
    val left = df.select(col(id).as("id_a"), col(item).as("item_a"),
      col(score).cast("long").as("__sa"))
    val right = df.select(col(id).as("id_b"), col(item).as("item_b"),
      col(score).cast("long").as("__sb"))
    strides.map { k =>
      left.join(right, col("id_b") === col("id_a") + lit(k))
    }.reduce(_ unionByName _)
      .filter(col("item_a") =!= col("item_b"))
      .withColumn("winner_item",
        when(col("__sa") > col("__sb"), col("item_a"))
          .when(col("__sa") < col("__sb"), col("item_b"))
          .when(col("item_a") < col("item_b"), col("item_a"))
          .otherwise(col("item_b")))
      .withColumn("loser_item",
        when(col("winner_item") === col("item_a"), col("item_b"))
          .otherwise(col("item_a")))
      .select("id_a", "id_b", "item_a", "item_b", "winner_item",
        "loser_item")
  }

  /** Number of MM iterations [[bradleyTerry]] runs; shared with the
    * DuckDB oracle generator so both replay the identical fixed-point
    * prefix.
    */
  val btIters = 10

  /** Shared plan-time-bounded (winner, loser) fit-collect for the
    * pairwise-preference fits: LIMIT caps what the driver can ever
    * pull to maxItems² + 1 rows (pairs <= items², so ANY overflow of
    * the pair bound implies the item bound is blown too), the
    * require turns a hit cap into a named contract error instead of
    * a driver OOM, and NULL keys fail loudly instead of NPE-ing in
    * the downstream sort.
    */
  private def boundedPairCollect(pairs: DataFrame, winner: String,
      loser: String, maxItems: Int, op: String)
      : Array[(String, String, Long)] = {
    val pairCap = math.min(maxItems.toLong * maxItems,
      Int.MaxValue.toLong - 1).toInt
    val wl = pairs.groupBy(col(winner).as("w"), col(loser).as("l"))
      .agg(count(lit(1)).as("wins"))
      .limit(pairCap + 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(wl.length <= pairCap,
      s"$op: over $pairCap distinct (winner, loser) pairs — more " +
        s"than maxItems=$maxItems items; the fit must stay bounded")
    wl.foreach { case (w, l, _) =>
      require(w != null && l != null,
        s"$op: NULL in '$winner'/'$loser' — item keys must be " +
          "non-null (filter or coalesce upstream)")
    }
    wl
  }

  /** Bradley-Terry strength fit from a pair frame: the
    * maximum-likelihood "skill" per item under P(i beats j) =
    * s_i / (s_i + s_j), via the classic minorize-maximize update
    * s_i ← W_i / Σ_j n_ij / (s_i + s_j) (Hunter 2004), run for a
    * FIXED [[btIters]] iterations in pure integer micro units:
    * every term is (n_ij · 10^12) / (s_i + s_j) with BigInt
    * truncating division, summed exactly (order-independent), so the
    * output is bit-reproducible on any engine that replays the same
    * integer recurrence — which is exactly what the DuckDB oracle
    * does with HUGEINT arithmetic. Strengths start at 10^6 and stay
    * O(10^6·iters) (each update is a wins-weighted harmonic blend of
    * opponent strengths), so nothing approaches the 10^38 HUGEINT
    * ceiling. A winless item fixes at 0 from the first iteration; an
    * undefeated item grows ~linearly per iteration (the BT MLE
    * genuinely diverges there — the fixed iteration count IS the
    * regularizer, and it is part of the output contract).
    *
    * Scale shape: ONE corpus-size aggregate (groupBy on the bounded
    * (winner, loser) key) whose result is ≤ items² rows; the fit
    * itself replays driver-side over that broadcast-scale frame (a
    * bounded fit-collect, the BPE-merge-loop / Hamilton-quota
    * pattern — zero Spark jobs per MM iteration). `maxItems` bounds
    * the collect at plan time.
    */
  def bradleyTerry(pairs: DataFrame, winner: String = "winner_item",
      loser: String = "loser_item", maxItems: Int = 1024): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val wl = boundedPairCollect(pairs, winner, loser, maxItems,
      "bradleyTerry")
    val items = (wl.map(_._1) ++ wl.map(_._2)).distinct.sorted
    require(items.length <= maxItems,
      s"bradleyTerry: ${items.length} distinct items exceeds " +
        s"maxItems=$maxItems — the counts matrix must stay broadcastable")
    val winsOf = wl.groupBy(_._1).view
      .mapValues(ws => BigInt(ws.map(_._3).sum)).toMap
      .withDefaultValue(BigInt(0))
    val lossOf = wl.groupBy(_._2).view
      .mapValues(ws => BigInt(ws.map(_._3).sum)).toMap
      .withDefaultValue(BigInt(0))
    // symmetric pair totals n_ij, adjacency as sorted neighbor lists
    val nij = scala.collection.mutable.Map.empty[(String, String), BigInt]
      .withDefaultValue(BigInt(0))
    wl.foreach { case (w, l, n) =>
      nij((w, l)) += n; nij((l, w)) += n
    }
    val neighbors: Map[String, Seq[String]] = items.map { i =>
      i -> items.filter(j => j != i && nij((i, j)) > 0).toSeq
    }.toMap
    val scale = BigInt(10).pow(12)
    var s: Map[String, BigInt] = items.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to btIters) {
      s = items.map { i =>
        val den = neighbors(i).map { j =>
          (nij((i, j)) * scale) / (s(i) + s(j)).max(BigInt(1))
        }.sum
        i -> (if (den <= 0) BigInt(0) else (winsOf(i) * scale) / den)
      }.toMap
    }
    items.toSeq.map { i =>
      (i, winsOf(i).toLong, lossOf(i).toLong, s(i).toLong)
    }.toDF("item", "wins", "losses", "strength_micro")
  }

  /** Transitivity audit of the preference win graph: per item, the
    * majority-digraph degrees and the number of decided/cyclic
    * triangles through it, plus corpus scalars — the intransitivity
    * (Condorcet-cycle) rate is the standard noise gauge for judge or
    * annotator preference data before fitting anything on it (a
    * perfectly consistent judge yields 0 cycles; random preferences
    * approach 250000 ppm). A pair is DECIDED when its two ordered win
    * counts differ; the majority direction is its edge. A triangle is
    * three mutually decided items; it is either transitive or a
    * 3-cycle.
    *
    * Scale shape: ONE corpus aggregate on the bounded (winner, loser)
    * key; the ≤ items² win matrix is a bounded fit-collect
    * (`maxItems` guard, default tighter than [[bradleyTerry]]'s
    * because the triangle walk is O(items³) driver-side — 4·10^6
    * triples at 256 items, microseconds) and the digraph audit
    * replays driver-side. The DuckDB oracle replays it relationally
    * over the same tiny frames.
    */
  def prefCycles(pairs: DataFrame, winner: String = "winner_item",
      loser: String = "loser_item", maxItems: Int = 256): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val wl = boundedPairCollect(pairs, winner, loser, maxItems,
      "prefCycles")
    val items = (wl.map(_._1) ++ wl.map(_._2)).distinct.sorted
    require(items.length <= maxItems,
      s"prefCycles: ${items.length} distinct items exceeds " +
        s"maxItems=$maxItems — the triangle walk must stay bounded")
    val wins = wl.map { case (w, l, n) => (w, l) -> n }.toMap
      .withDefaultValue(0L)
    def edge(i: String, j: String): Boolean = wins((i, j)) > wins((j, i))
    def decided(i: String, j: String): Boolean =
      wins((i, j)) != wins((j, i))
    val outDeg = items.map(i =>
      i -> items.count(j => j != i && edge(i, j))).toMap
    val inDeg = items.map(i =>
      i -> items.count(j => j != i && edge(j, i))).toMap
    // per-item triangle counts over unordered co-member pairs {j, k}
    val tri = scala.collection.mutable.Map(items.map(_ -> 0L): _*)
    val cyc = scala.collection.mutable.Map(items.map(_ -> 0L): _*)
    for {
      a <- items.indices; b <- (a + 1) until items.length
      c <- (b + 1) until items.length
      (i, j, k) = (items(a), items(b), items(c))
      if decided(i, j) && decided(j, k) && decided(i, k)
    } {
      tri(i) += 1; tri(j) += 1; tri(k) += 1
      // a decided triangle is cyclic iff no vertex beats both others
      val cyclic = !((edge(i, j) && edge(i, k)) ||
        (edge(j, i) && edge(j, k)) || (edge(k, i) && edge(k, j)))
      if (cyclic) { cyc(i) += 1; cyc(j) += 1; cyc(k) += 1 }
    }
    val nEdges = items.map(outDeg(_).toLong).sum
    val nTri = tri.values.sum / 3
    val nCyc = cyc.values.sum / 3
    val cycPpm = if (nTri == 0) 0L else nCyc * 1000000L / nTri
    items.toSeq.map { i =>
      (i, outDeg(i).toLong, inDeg(i).toLong, tri(i), cyc(i),
        items.length.toLong, nEdges, nTri, nCyc, cycPpm)
    }.toDF("item", "out_deg", "in_deg", "n_tri", "n_cyc", "n_items",
      "n_edges", "n_triangles", "n_cycles", "cycle_ppm")
  }

  /** Judge position-bias audit: win rate of the FIRST-PRESENTED
    * (position-A) response per judge, with the Wilson 95% interval
    * and the binomial z statistic against the unbiased 0.5 — the
    * order-effect check an RLHF/LLM-judge pipeline runs before
    * trusting pairwise labels (judges measurably prefer whichever
    * answer is shown first; a leaderboard built on un-audited pairs
    * inherits that bias). A judge is flagged `position_biased` when
    * the whole interval sits on one side of 0.5.
    *
    * Determinism contract: one count aggregate per judge (exact
    * longs, map-side combined), then `a_win_ppm` as truncating
    * integer division and the same fixed-order Wilson double tree as
    * [[graft.engine.Retail.returnRateCI]] (+,-,*,/,sqrt are each
    * IEEE correctly rounded, so the sequence is bit-identical on any
    * engine fed the same integers), rounded to 6 decimals. The z
    * statistic is (2·p̂ − 1)·√n — the score test against p = 0.5.
    *
    * Scale shape: ONE corpus aggregate on the judge key; judges are
    * bounded in practice (a judge pool, not a corpus dimension), and
    * nothing downstream of the aggregate touches corpus-sized data.
    */
  def positionBias(pairs: DataFrame, judge: Column, aWin: Column,
      z: Double = 1.96): DataFrame = {
    val agg = pairs
      .select(judge.cast("string").as("judge"),
        aWin.cast("boolean").as("__aw"))
      .groupBy(col("judge"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(when(col("__aw"), 1L).otherwise(0L)).cast("long")
          .as("n_a_wins"))
    val nD = col("n_pairs").cast("double")
    val phat = col("n_a_wins").cast("double") / nD
    val z2 = lit(z) * lit(z)
    val denom = lit(1.0) + z2 / nD
    val center = (phat + z2 / (lit(2.0) * nD)) / denom
    val margin = lit(z) *
      sqrt(phat * (lit(1.0) - phat) / nD +
        z2 / (lit(4.0) * nD * nD)) / denom
    agg.select(col("judge"), col("n_pairs"), col("n_a_wins"),
      expr("n_a_wins * 1000000L DIV n_pairs").as("a_win_ppm"),
      round(center - margin, 6).as("ci_lo"),
      round(center + margin, 6).as("ci_hi"),
      round((lit(2.0) * phat - lit(1.0)) * sqrt(nD), 6).as("z_stat"),
      (round(center - margin, 6) > 0.5 ||
        round(center + margin, 6) < 0.5).as("position_biased"))
  }

  /** Cohen's kappa between two deterministic labelers, with the full
    * confusion matrix: per (label_a, label_b) cell counts plus the
    * agreement scalars attached to every row. po_ppm is exact integer
    * (agree·10^6 / total, both non-negative, truncating); pe and
    * kappa are a FIXED-ORDER IEEE double sequence from the exact
    * integer counts — pe = peNum / (total · total),
    * kappa = (po − pe) / (1 − pe) — identical bit-for-bit on any IEEE
    * engine fed the same integers (peNum is exact in BigInt; the
    * DuckDB oracle's HUGEINT cast rounds the same way past 2^53).
    * Degenerate case pe = 1 (a single observed class on both sides)
    * yields kappa NULL — chance agreement saturates and the statistic
    * is undefined.
    *
    * Scale shape: ONE corpus aggregate on the bounded class-pair key;
    * the ≤ classes² cell frame is a bounded fit-collect (`maxCells`
    * plan-time guard) and the marginal/kappa tail replays DRIVER-SIDE
    * (the BPE-merge-loop / Hamilton-quota pattern — the relational
    * form spent ~8 tiny jobs on a frame of a dozen rows; the
    * driver replay is one corpus job + one local result).
    */
  def annotatorKappa(df: DataFrame, labelA: Column, labelB: Column,
      maxCells: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = df
      .select(labelA.cast("string").as("label_a"),
        labelB.cast("string").as("label_b"))
      .groupBy("label_a", "label_b")
      .agg(count(lit(1)).cast("long").as("n"))
      .limit(maxCells + 1) // plan-time bound: driver pulls <= maxCells+1
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(conf.length <= maxCells,
      s"annotatorKappa: ${conf.length} confusion cells exceeds " +
        s"maxCells=$maxCells — the label frame must stay tiny")
    val total = conf.map(_._3).sum
    val agree = conf.filter(c => c._1 == c._2).map(_._3).sum
    // peNum = sum_k rowsum_k * colsum_k over the UNION of observed
    // classes (a class only one labeler emits contributes 0); exact
    // in BigInt, order-independent
    val rowN = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      .toMap.withDefaultValue(0L)
    val colN = conf.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      .toMap.withDefaultValue(0L)
    val classes = (conf.map(_._1) ++ conf.map(_._2)).distinct
    val peNum = classes.map(k => BigInt(rowN(k)) * BigInt(colN(k))).sum
    // the same fixed-order IEEE sequence the DuckDB oracle runs
    val poPpm = if (total == 0) 0L else agree * 1000000L / total
    val pe = peNum.toDouble / (total.toDouble * total.toDouble)
    val kappa: Option[Double] =
      if (1.0 - pe == 0.0) None
      else Some((agree.toDouble / total.toDouble - pe) / (1.0 - pe))
    conf.toSeq.map { case (a, b, n) =>
      (a, b, n, total, agree, poPpm, pe, kappa)
    }.toDF("label_a", "label_b", "n", "n_total", "n_agree", "po_ppm",
      "pe", "kappa")
  }

  /** Fleiss' kappa: chance-corrected agreement among `raters.size`
    * (≥ 2) deterministic labelers over a FIXED category vocabulary —
    * the multi-rater generalization of [[annotatorKappa]], the
    * labeling-QA number reported when a gate ensemble (or an
    * annotator pool) votes per document. Per item the category tally
    * vector n_ij is row-local (each rater contributes one vote);
    * the corpus reduces to ONE aggregate: N, S = Σ_i Σ_j n_ij², and
    * the per-category vote totals c_j. Then
    * P̄ = (S − N·n) / (N·n·(n−1)), P̄e = Σ_j c_j² / (N·n)², and
    * kappa = (P̄ − P̄e)/(1 − P̄e) — a fixed-order IEEE sequence from
    * exact integers (c_j² summed in BigInt; the oracle's HUGEINT
    * matches), NULL when chance agreement saturates. A row where any
    * rater votes OUTSIDE `categories` would silently skew the
    * tallies, so the aggregate carries a violation counter and the
    * operator fails loudly if it is nonzero.
    *
    * Output: one row per category (votes + vote share in ppm) with
    * the corpus scalars attached.
    */
  def fleissKappa(df: DataFrame, raters: Seq[Column],
      categories: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(raters.size >= 2, "need >= 2 raters")
    require(categories.nonEmpty &&
      categories.distinct.size == categories.size,
      "categories must be non-empty and distinct")
    val n = raters.size
    val tallies = categories.map { cat =>
      raters.map(r => when(r === lit(cat), lit(1L)).otherwise(lit(0L)))
        .reduce(_ + _)
    }
    val sumsq = tallies.map(t => t * t).reduce(_ + _)
    val rowTot = tallies.reduce(_ + _)
    val aggs = Seq(
      count(lit(1)).cast("long").as("__N"),
      sum(sumsq).as("__S"),
      sum(when(rowTot =!= lit(n.toLong), lit(1L)).otherwise(lit(0L)))
        .as("__bad")) ++
      categories.zipWithIndex.map { case (_, i) =>
        sum(tallies(i)).as(s"__c$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nItems = row.getLong(0)
    val s = if (row.isNullAt(1)) 0L else row.getLong(1)
    val bad = if (row.isNullAt(2)) 0L else row.getLong(2)
    require(bad == 0L,
      s"fleissKappa: $bad row(s) carry a vote outside the declared " +
        s"categories ${categories.mkString("{", ", ", "}")}")
    val c = categories.indices.map(i =>
      if (row.isNullAt(3 + i)) 0L else row.getLong(3 + i))
    val nn = nItems * n
    val peNum = c.map(cj => BigInt(cj) * BigInt(cj)).sum
    val (pbar, pe, kappa): (Option[Double], Option[Double],
        Option[Double]) =
      if (nItems == 0) (None, None, None)
      else {
        val pb = (s - nn).toDouble / (nn * (n - 1)).toDouble
        val p = peNum.toDouble / (nn.toDouble * nn.toDouble)
        (Some(pb), Some(p),
          if (1.0 - p == 0.0) None else Some((pb - p) / (1.0 - p)))
      }
    categories.zipWithIndex.map { case (cat, i) =>
      (cat, c(i), if (nn == 0) 0L else c(i) * 1000000L / nn,
        nItems, n.toLong, s, pbar, pe, kappa)
    }.toDF("category", "votes", "share_ppm", "n_items", "n_raters",
      "sum_sq", "pbar", "pe", "kappa")
  }

  /** Kendall's tau-b rank agreement between two scorers, exact over
    * BUCKETED scores: the caller quantizes both scores to integer
    * buckets in [0, `buckets`) (the documented contract — tau over a
    * 256-bucket quantization is the standard diagnostic for "do two
    * quality scorers ORDER the corpus the same way", robust to
    * monotone rescaling by construction), and the corpus reduces to
    * ONE aggregate on the bounded (bx, by) key — ≤ buckets² cells at
    * any corpus size. The concordant/discordant/tie pair counts then
    * come from 2-D suffix sums over the dense bucket matrix
    * driver-side (O(buckets²), exact in BigInt), and
    * tau_b = (C − D) / sqrt((n0 − n1)·(n0 − n2)) is the pinned IEEE
    * sequence (sqrt is correctly rounded, so both engines agree
    * bit-for-bit on the same integers). Pair counts are emitted as
    * DOUBLE (exact below 2^53; beyond that both engines round the
    * same integer the same way).
    */
  def kendallTauB(df: DataFrame, bx: Column, by: Column,
      buckets: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(buckets >= 2 && buckets <= 1024,
      "need 2 <= buckets <= 1024")
    val cells = df.select(bx.cast("int").as("bx"),
        by.cast("int").as("by"))
      .groupBy("bx", "by").agg(count(lit(1)).cast("long").as("n"))
      .collect() // bounded fit-collect: <= buckets^2 rows
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    cells.foreach { case (x, y, _) =>
      require(x >= 0 && x < buckets && y >= 0 && y < buckets,
        s"kendallTauB: bucket ($x, $y) outside [0, $buckets)")
    }
    val m = Array.ofDim[Long](buckets, buckets)
    cells.foreach { case (x, y, cnt) => m(x)(y) = cnt }
    // suffix(x, y) = total count in the strict upper-right quadrant
    val suf = Array.ofDim[BigInt](buckets + 1, buckets + 1)
    for (r <- 0 to buckets; cl <- 0 to buckets)
      suf(r)(cl) = BigInt(0)
    for (r <- buckets - 1 to 0 by -1; cl <- buckets - 1 to 0 by -1)
      suf(r)(cl) = suf(r + 1)(cl) + suf(r)(cl + 1) -
        suf(r + 1)(cl + 1) + BigInt(m(r)(cl))
    // pre(x, y): strict lower-right quadrant (bx' > x, by' < y)
    var cPairs = BigInt(0); var dPairs = BigInt(0)
    for (x <- 0 until buckets; y <- 0 until buckets if m(x)(y) > 0) {
      val nCell = BigInt(m(x)(y))
      cPairs += nCell * suf(x + 1)(y + 1)
      // discordant: bx' > x AND by' < y = (all with bx' > x) minus
      // (bx' > x, by' >= y)
      val right = suf(x + 1)(0)
      val rightGe = suf(x + 1)(y)
      dPairs += nCell * (right - rightGe)
    }
    val nItems = cells.map(c => BigInt(c._3)).sum
    def choose2(v: BigInt): BigInt = v * (v - 1) / 2
    val n0 = choose2(nItems)
    val rowTot = (0 until buckets).map(x =>
      (0 until buckets).map(y => BigInt(m(x)(y))).sum)
    val colTot = (0 until buckets).map(y =>
      (0 until buckets).map(x => BigInt(m(x)(y))).sum)
    val n1 = rowTot.map(choose2).sum
    val n2 = colTot.map(choose2).sum
    val tau: Option[Double] =
      if ((n0 - n1) == 0 || (n0 - n2) == 0) None
      else Some((cPairs - dPairs).toDouble /
        math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble))
    Seq((nItems.toLong, cells.length.toLong, cPairs.toDouble,
      dPairs.toDouble, n0.toDouble, n1.toDouble, n2.toDouble, tau))
      .toDF("n_items", "n_cells", "concordant", "discordant",
        "pairs_total", "ties_x_pairs", "ties_y_pairs", "tau_b")
  }

  /** Exact Gini concentration of a non-negative mass across groups —
    * "how unbalanced is the corpus across sources", the one-number
    * companion a mixture planner reads next to the full mix_weights
    * table (G = 0 perfectly balanced, → 1 as one source dominates).
    * Computed from the sorted group masses by the rank identity
    * G = Σ_i (2i − n − 1)·x_(i) / (n·Σx) with ties broken by group
    * name (a total order, so the sum is reproducible): the numerator
    * is exact in BigInt (can be negative only transiently; the total
    * is ≥ 0), emitted in ppm by truncating division. Per-group rows
    * carry the Lorenz coordinates (cumulative mass share at the
    * group's rank, in ppm) with the scalar Gini attached.
    *
    * Scale shape: ONE corpus aggregate on the group key; the ≤
    * `maxGroups` mass vector replays driver-side (Hamilton pattern).
    */
  def giniConcentration(df: DataFrame, group: Column, mass: Column,
      maxGroups: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(group.cast("string").as("g"),
        mass.cast("long").as("m"))
      .groupBy("g").agg(sum(col("m")).as("mm"))
      .limit(maxGroups + 1) // plan-time bound: driver pulls <= maxGroups+1
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
    require(rows.length <= maxGroups,
      s"giniConcentration: ${rows.length} groups exceeds $maxGroups")
    rows.foreach { case (g, _) =>
      require(g != null,
        "giniConcentration: NULL group key — filter or coalesce upstream")
    }
    rows.foreach { case (g, m) =>
      require(m >= 0, s"giniConcentration: negative mass for '$g'")
    }
    val sorted = rows.sortBy { case (g, m) => (m, g) }
    val n = sorted.length
    val total = sorted.map(r => BigInt(r._2)).sum
    val giniNum = sorted.zipWithIndex.map { case ((_, m), i0) =>
      BigInt(2 * (i0 + 1) - n - 1) * BigInt(m)
    }.sum
    val giniPpm: Option[Long] =
      if (total == 0 || n == 0) None
      else Some((giniNum * 1000000 / (BigInt(n) * total)).toLong)
    var cum = BigInt(0)
    sorted.zipWithIndex.map { case ((g, m), i0) =>
      cum += BigInt(m)
      (g, m, (i0 + 1).toLong,
        if (total == 0) None: Option[Long]
        else Some((cum * 1000000 / total).toLong),
        n.toLong, total.toLong, giniPpm)
    }.toSeq.toDF("grp", "mass", "rank", "lorenz_ppm", "n_groups",
      "total_mass", "gini_ppm")
  }

  /** Exact two-sample Kolmogorov-Smirnov drift, each group vs the
    * REST of the corpus: D = max_b |CDF_g(b) − CDF_rest(b)| over an
    * integer-bucketed value — the nonparametric sibling of the PSI
    * drift report (PSI needs binning choices to mean anything; KS is
    * the distribution-free "did this source's length/score profile
    * move" number a curation stack tracks across snapshots). Exact
    * integer contract: D's numerator is max |cum_g·N_rest −
    * cum_rest·N_g| in BigInt (no division until the final ppm), the
    * argmax bucket ties to the SMALLEST bucket, and
    * d_ppm = num·10^6 / (N_g·N_rest) truncates non-negative on both
    * engines (HUGEINT in the oracle).
    *
    * Scale shape: ONE corpus aggregate on the bounded (group, bucket)
    * key — the caller pre-buckets the value into [0, `buckets`) so
    * the frame is ≤ groups·buckets cells at any corpus size — then a
    * bounded fit-collect (`maxCells` guard) and a driver-side CDF
    * walk (the Hamilton/BT pattern).
    */
  def ksDrift(df: DataFrame, group: Column, bucket: Column,
      buckets: Int = 4096, maxCells: Int = 262144): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(buckets >= 2, "need >= 2 buckets")
    val cells = df.select(group.cast("string").as("g"),
        bucket.cast("int").as("b"))
      .groupBy("g", "b").agg(count(lit(1)).cast("long").as("n"))
      .limit(maxCells + 1) // plan-time bound: driver pulls <= maxCells+1
      .collect()
      .map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          "ksDrift: NULL group/bucket key — filter or coalesce upstream")
        (r.getString(0), r.getInt(1), r.getLong(2))
      }
    require(cells.length <= maxCells,
      s"ksDrift: ${cells.length} cells exceeds maxCells=$maxCells")
    cells.foreach { case (_, b, _) =>
      require(b >= 0 && b < buckets,
        s"ksDrift: bucket $b outside [0, $buckets)")
    }
    val groups = cells.map(_._1).distinct.sorted
    val total = cells.map(c => BigInt(c._3)).sum
    val byGroup = cells.groupBy(_._1)
    val globalByBucket = cells.groupBy(_._2).view
      .mapValues(cs => BigInt(cs.map(_._3).sum)).toMap
      .withDefaultValue(BigInt(0))
    val allBuckets = cells.map(_._2).distinct.sorted
    groups.map { g =>
      val mine = byGroup(g).map(c => c._2 -> BigInt(c._3)).toMap
        .withDefaultValue(BigInt(0))
      val nG = mine.values.sum
      val nRest = total - nG
      var cumG = BigInt(0); var cumRest = BigInt(0)
      var best = BigInt(-1); var bestBucket = -1
      // the CDF is a step function changing only at occupied buckets,
      // so scanning the distinct occupied buckets is exact
      allBuckets.foreach { b =>
        cumG += mine(b)
        cumRest += globalByBucket(b) - mine(b)
        val num = (cumG * nRest - cumRest * nG).abs
        if (num > best) { best = num; bestBucket = b }
      }
      val dPpm =
        if (nG == 0 || nRest == 0) None
        else Some((best * 1000000 / (nG * nRest)).toLong)
      (g, nG.toLong, nRest.toLong, bestBucket.toLong, dPpm)
    }.toSeq.toDF("grp", "n_grp", "n_rest", "d_at_bucket", "d_ppm")
  }

  /** Exact Mann-Whitney AUC + a `bins`-point ROC curve from a frame
    * carrying an integral micro score in [−10^6, 10^6] (column
    * `scoreMicro`, pre-clamped by the caller) and a boolean `label`.
    * U is computed from the SCORE HISTOGRAM, never from a global
    * rank: group to ≤ 2·10^6+1 distinct-score rows (bounded at any
    * corpus size), prefix-sum the negatives (hash-bucketed subtotal +
    * broadcast predecessor offsets + bucket-partitioned local window —
    * zero unpartitioned windows, zero range-sampling passes), and fold
    * 2U = Σ_s n_pos(s)·(2·negBelow(s) + n_neg(s)) — the tie term is
    * the standard half-credit, kept integral by working with 2U.
    * Products accumulate in decimal(38,0) (Spark) / HUGEINT (DuckDB)
    * so the fold is exact far past long range; AUC itself is the
    * single fixed-order double sequence u2 / (2·nPos·nNeg) from
    * those exact integers. ROC rows: per score-bin suffix totals
    * ("predict positive at or above this bin") with integer ppm
    * TPR/FPR.
    */
  def aucFromScores(scored: DataFrame, scoreMicro: String,
      label: String, bins: Int = 16): DataFrame = {
    require(bins >= 2 && bins <= 1000, "need 2 <= bins <= 1000")
    // ONE pin, placed BEFORE any prefix machinery: the histogram's
    // upstream (the caller's scoring chain) is the expensive part,
    // and Dist.prefixSum's repartitionByRange would execute it TWICE
    // (the RangePartitioner's sampling pass + the materializing
    // pass — measured 20 jobs / 6.0 s vs lr_calibration's 8 / 2.5 at
    // sf0.1). The micro-score key is integer-bucketable, so the
    // prefix runs as prefixSum's own shape with a HASH-partitioned
    // derived bucket instead of a sampled range: ≤ ~977 buckets of
    // ≤ 2048 keys each, subtotals + broadcast predecessor offsets +
    // a bucket-partitioned local window. Zero unpartitioned windows,
    // zero extra passes over the scoring chain.
    val hist = scored.groupBy(col(scoreMicro).as("smc"))
      .agg(expr(s"CAST(count_if($label) AS BIGINT)").as("n_pos"),
        expr(s"CAST(count_if(NOT $label) AS BIGINT)").as("n_neg"))
      .withColumn("__bkt", expr("(smc + 1000000L) DIV 2048L"))
      .localCheckpoint()
    val bsub = hist.groupBy(col("__bkt"))
      .agg(sum(col("n_neg")).as("__bneg"))
    val boff = bsub
      .join(broadcast(bsub.select(col("__bkt").as("__qb"),
        col("__bneg").as("__qn"))), col("__qb") < col("__bkt"), "left")
      .groupBy(col("__bkt"))
      .agg(coalesce(sum(col("__qn")), lit(0L)).as("__boff"))
    val local = Window.partitionBy("__bkt").orderBy("smc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h2 = hist.join(broadcast(boff), Seq("__bkt"))
      .withColumn("cum_neg",
        col("__boff") + sum(col("n_neg")).over(local))
    val scal = h2.agg(
        sum(col("n_pos")).cast("long").as("n_pos_total"),
        sum(col("n_neg")).cast("long").as("n_neg_total"),
        sum(expr("CAST(n_pos AS DECIMAL(19,0)) * " +
          "CAST(2L * (cum_neg - n_neg) + n_neg AS DECIMAL(19,0))"))
          .as("__u2"))
      .withColumn("auc", expr(
        "CASE WHEN n_pos_total = 0 OR n_neg_total = 0 " +
          "THEN CAST(NULL AS DOUBLE) " +
          "ELSE CAST(__u2 AS DOUBLE) / (2.0D * " +
          "CAST(n_pos_total AS DOUBLE) * " +
          "CAST(n_neg_total AS DOUBLE)) END"))
      .drop("__u2")
    // ROC bins don't need the prefix — they read the pinned histogram
    // directly; the tiny bin frame feeds both sides of the suffix
    // self-join as a cheap post-pin recompute (no extra checkpoint)
    val binned = hist.groupBy(expr(
        s"least((smc + 1000000L) * $bins DIV 2000000L, " +
          s"${bins - 1}L)").as("bin"))
      .agg(sum(col("n_pos")).cast("long").as("n_pos"),
        sum(col("n_neg")).cast("long").as("n_neg"))
    binned.join(
        broadcast(binned.select(col("bin").as("__qb"),
          col("n_pos").as("__qp"), col("n_neg").as("__qn"))),
        col("__qb") >= col("bin"), "inner") // self-row always matches
      .groupBy("bin", "n_pos", "n_neg")
      .agg(sum(col("__qp")).cast("long").as("cum_pos_ge"),
        sum(col("__qn")).cast("long").as("cum_neg_ge"))
      .crossJoin(broadcast(scal))
      .withColumn("tpr_ppm", expr("CASE WHEN n_pos_total = 0 " +
        "THEN CAST(NULL AS BIGINT) " +
        "ELSE cum_pos_ge * 1000000L DIV n_pos_total END"))
      .withColumn("fpr_ppm", expr("CASE WHEN n_neg_total = 0 " +
        "THEN CAST(NULL AS BIGINT) " +
        "ELSE cum_neg_ge * 1000000L DIV n_neg_total END"))
      .select("bin", "n_pos", "n_neg", "cum_pos_ge", "cum_neg_ge",
        "tpr_ppm", "fpr_ppm", "n_pos_total", "n_neg_total", "auc")
  }

  /** ROC/AUC report for the linear quality gate: scores every
    * document through [[TextAnalysis.withLrGate]] (row-local, the
    * weights ride in the plan), micro-quantizes and clamps the score
    * exactly as [[TextAnalysis.lrCalibration]] does (round to ±10^6
    * BEFORE any integer op), labels by the heuristic quality cut, and
    * hands the frame to [[aucFromScores]]. Together with the
    * calibration report this completes the model-gate evaluation
    * pair: calibration says whether p̂ means what it claims; AUC says
    * whether the ranking separates the classes at all.
    */
  def lrAuc(df: DataFrame, text: String, id: String, dim: Int = 32,
      bins: Int = 16, qualityCut: Double = 0.5): DataFrame = {
    val scored = TextAnalysis
      .withLrGate(df.select(col(id), col(text)), text, dim)
      .withColumn("__sm", expr(
        "CAST(round(lr_score * 1000000) AS BIGINT)"))
      .withColumn("__smc", expr(
        "least(greatest(__sm, -1000000L), 1000000L)"))
      .withColumn("__label",
        TextAnalysis.qualityScoreExpr(text) >= lit(qualityCut))
    aucFromScores(scored, "__smc", "__label", bins)
  }
}
