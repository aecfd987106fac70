package graft.llm

import graft.engine.Dist
import org.apache.spark.sql.{Column, DataFrame}
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
    val wl = pairs.groupBy(col(winner).as("w"), col(loser).as("l"))
      .agg(count(lit(1)).as("wins"))
      .collect() // bounded fit-collect: <= maxItems^2 rows by require
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
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

  /** Cohen's kappa between two deterministic labelers, with the full
    * confusion matrix: per (label_a, label_b) cell counts plus the
    * agreement scalars attached to every row (the
    * [[TextAnalysis.lrCalibration]] reporting shape — cell grain +
    * pinned broadcast scalar cross). po_ppm is exact integer
    * (agree·10^6 DIV total, both non-negative); pe and kappa are a
    * FIXED-ORDER IEEE double sequence from the exact integer counts —
    * pe = peNum / (total · total), kappa = (po − pe) / (1 − pe) —
    * identical bit-for-bit on any IEEE engine fed the same integers
    * (peNum is exact while below 2^53; beyond that both engines round
    * the same cast). Degenerate case pe = 1 (a single observed class
    * on both sides) yields kappa NULL — chance agreement saturates
    * and the statistic is undefined.
    *
    * Scale shape: ONE corpus aggregate on the bounded class-pair key;
    * marginals, peNum, and the scalars all derive from the pinned
    * ≤ classes² confusion frame (broadcast-scale).
    */
  def annotatorKappa(df: DataFrame, labelA: Column, labelB: Column)
      : DataFrame = {
    val conf = df
      .select(labelA.cast("string").as("label_a"),
        labelB.cast("string").as("label_b"))
      .groupBy("label_a", "label_b")
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint() // cell frame feeds marginals + scalars + output
    val rows = conf.groupBy(col("label_a").as("__cls"))
      .agg(sum(col("n")).as("__row_n"))
    val cols = conf.groupBy(col("label_b").as("__cls"))
      .agg(sum(col("n")).as("__col_n"))
    // peNum = sum_k rowsum_k * colsum_k over the UNION of observed
    // classes (a class only one labeler emits contributes 0)
    val peNum = rows.join(cols, Seq("__cls"), "full_outer")
      .select((coalesce(col("__row_n"), lit(0L)).cast("decimal(19,0)") *
        coalesce(col("__col_n"), lit(0L)).cast("decimal(19,0)"))
        .as("__prod"))
      .agg(sum(col("__prod")).as("__pe_num"))
    val scal = conf.agg(
        sum(col("n")).cast("long").as("n_total"),
        sum(when(col("label_a") === col("label_b"), col("n"))
          .otherwise(lit(0L))).cast("long").as("n_agree"))
      .crossJoin(broadcast(peNum))
      .withColumn("po_ppm", expr("n_agree * 1000000L DIV n_total"))
      .withColumn("pe", expr(
        "CAST(__pe_num AS DOUBLE) / " +
          "(CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE))"))
      .withColumn("kappa", expr(
        "CASE WHEN 1.0D - pe = 0.0D THEN CAST(NULL AS DOUBLE) " +
          "ELSE (CAST(n_agree AS DOUBLE) / CAST(n_total AS DOUBLE) " +
          "- pe) / (1.0D - pe) END"))
      .drop("__pe_num")
    conf.crossJoin(broadcast(scal))
  }

  /** Exact Mann-Whitney AUC + a `bins`-point ROC curve from a frame
    * carrying an integral micro score in [−10^6, 10^6] (column
    * `scoreMicro`, pre-clamped by the caller) and a boolean `label`.
    * U is computed from the SCORE HISTOGRAM, never from a global
    * rank: group to ≤ 2·10^6+1 distinct-score rows (bounded at any
    * corpus size), prefix-sum the negatives ([[Dist.prefixSum]] —
    * range-partitioned, zero unpartitioned windows), and fold
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
    val hist = scored.groupBy(col(scoreMicro).as("smc"))
      .agg(expr(s"CAST(count_if($label) AS BIGINT)").as("n_pos"),
        expr(s"CAST(count_if(NOT $label) AS BIGINT)").as("n_neg"))
    val h2 = Dist.prefixSum(hist, Seq(col("smc")), "n_neg", "cum_neg")
      .localCheckpoint() // feeds the AUC fold AND the ROC binning
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
    val binned = h2.groupBy(expr(
        s"least((smc + 1000000L) * $bins DIV 2000000L, " +
          s"${bins - 1}L)").as("bin"))
      .agg(sum(col("n_pos")).cast("long").as("n_pos"),
        sum(col("n_neg")).cast("long").as("n_neg"))
      .localCheckpoint() // tiny; pins the frame feeding both join sides
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
