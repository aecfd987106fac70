package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical (BM25) arm and a dense (cosine)
  * arm with reciprocal-rank fusion — the standard RAG-retriever
  * composition (Cormack/Clarke/Buettcher RRF, SIGIR'09).
  *
  * Engine-determinism contract: every cross-engine-hashed value is a
  * BIGINT. Per-term BM25 weights are the same rational no-libm double
  * tree as [[TextAnalysis.bm25TopK]] (only +,-,*,/ — each IEEE
  * correctly rounded, so bit-identical on any engine), pinned to
  * exact micro-unit longs via floor(w*1e6) BEFORE the per-document
  * sum — the distributed aggregation is then order-independent
  * integer arithmetic. Dense similarities come from the native
  * fixed-order dot ([[VectorExpressions]]) rounded to 6 decimals
  * before ranking. Fusion scores are truncating integer division:
  * rrf_ppm = Σ_arms 1_000_000 div (rrfK + rank) — no double ever
  * crosses the fusion stage.
  *
  * Scale shape (100 TB posture): the query side (nQueries · terms,
  * nQueries · vectors) is broadcast; the corpus is scanned once per
  * arm (tf/df with map-side combine; one pass for the dense scores
  * against broadcast query vectors); each arm emits a per-query
  * shortlist of m rows, so the fusion full-outer join and final
  * top-k touch O(nQueries · m) rows — query-proportional, never
  * corpus-proportional.
  */
object Retrieval {

  /** The standalone lexical arm of [[hybridRrf]]: query-by-example
    * BM25 shortlist — one row per (query_id, doc_id, lex_rank ≤ m),
    * the same rational Robertson tree micro-pinned to longs before
    * the per-document sum. Factored out so the per-arm scoreboard
    * ([[retrievalEval]] over bm25-only vs dense-only vs fused) can
    * never drift from the arm the fusion actually used.
    */
  def lexicalTopK(docs: DataFrame, queryIds: Seq[Long],
      text: String = "text", docId: String = "doc_id",
      m: Int = 50, minTermLen: Int = 5): DataFrame = {
    val qSet = queryIds.map(lit(_))
    val toks = docs.select(col(docId).cast("long").as("doc_id"),
      expr(s"filter(split(lower($text), ' '), t -> t != '')")
        .as("toks"))
    val lens = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("len"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val totals = lens.agg(count(lit(1)).as("n"), sum("len").as("tot"))
    // query terms (distinct per query doc), enriched with df: join the
    // corpus-sized df frame against the tiny query-term set, then the
    // small RESULT is what gets broadcast into the corpus tf scan
    val qterms = tf.filter(col("doc_id").isin(qSet: _*))
      .filter(length(col("term")) >= minTermLen)
      .select(col("doc_id").as("query_id"), col("term"))
    val qtermsDf = dfreq.join(broadcast(qterms), Seq("term"))
      .select("query_id", "term", "df")
    // same rational Robertson tree as bm25TopK (D suffixes pin DOUBLE:
    // a bare 0.5 parses as DECIMAL and the tree would change type),
    // pinned to micro-longs before the order-sensitive sum
    val scoredTerms = tf
      .join(broadcast(qtermsDf), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .withColumn("w", expr(
        "CAST(floor(((n - df + 0.5D) / (df + 0.5D)) * ((tf * 2.2D) / " +
          "(tf + 0.3D + 0.9D * (len * 1.0D * n / tot))) * 1000000.0D) " +
          "AS BIGINT)"))
    scoredTerms.groupBy("query_id", "doc_id")
      .agg(sum("w").as("lex_micro"))
      .withColumn("lex_rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("lex_micro").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("lex_rank") <= m)
      .select("query_id", "doc_id", "lex_rank")
  }

  /** The standalone dense arm of [[hybridRrf]]: brute-force cosine
    * shortlist (self excluded) reshaped to (query_id, doc_id,
    * dense_rank ≤ m) — factored out, like [[lexicalTopK]], so arm
    * consumers score the arm the fusion actually used.
    */
  def denseTopK(emb: DataFrame, queryIds: Seq[Long],
      vecId: String = "vec_id", vecCol: String = "embedding",
      m: Int = 50): DataFrame =
    Similarity.bruteForceTopK(emb,
        emb.filter(col(vecId).isin(queryIds.map(lit(_)): _*)),
        vecId, vecCol, m)
      .select(col("query_id").cast("long").as("query_id"),
        col("cand_id").cast("long").as("doc_id"),
        col("rank").as("dense_rank"))

  /** Fusion-only half of [[hybridRrf]]: fuse two PRECOMPUTED arm
    * shortlists. Taking the arms as inputs lets a caller that also
    * consumes an arm standalone ([[rankOverlap]] vs the dense arm,
    * the per-arm scoreboard) compute each arm ONCE — both ranking
    * columns are rank-prefix-stable, so the standalone top-k is a
    * filter of the same frame the fusion reads, not a recompute.
    */
  def rrfFuse(dense: DataFrame, lex: DataFrame, k: Int = 10,
      rrfK: Int = 60): DataFrame = {
    require(k >= 1, "need k >= 1")
    dense.join(lex, Seq("query_id", "doc_id"), "full_outer")
      .na.fill(0L, Seq("dense_rank", "lex_rank"))
      .withColumn("rrf_ppm", expr(
        s"CAST(CASE WHEN dense_rank > 0 THEN ${1000000}L DIV " +
          s"(${rrfK}L + dense_rank) ELSE 0L END + " +
          s"CASE WHEN lex_rank > 0 THEN ${1000000}L DIV " +
          s"(${rrfK}L + lex_rank) ELSE 0L END AS BIGINT)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf_ppm").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf_ppm",
        "dense_rank", "lex_rank")
  }

  /** Query-by-example hybrid top-k: each query id must exist in both
    * `docs` (its text drives the lexical arm) and `emb` (its vector
    * drives the dense arm). Returns one row per (query_id, rank≤k):
    * `query_id, rank, doc_id, rrf_ppm, dense_rank, lex_rank` — all
    * BIGINT; a 0 rank means the doc was outside that arm's shortlist.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, queryIds: Seq[Long],
      text: String = "text", docId: String = "doc_id",
      vecId: String = "vec_id", vecCol: String = "embedding",
      m: Int = 50, k: Int = 10, rrfK: Int = 60,
      minTermLen: Int = 5): DataFrame = {
    require(m >= k && k >= 1, "need m >= k >= 1")
    rrfFuse(
      denseTopK(emb, queryIds, vecId, vecCol, m),
      lexicalTopK(docs, queryIds, text, docId, m, minTermLen),
      k, rrfK)
  }

  /** One fitted query term with its corpus document frequency. */
  case class QTerm(t: String, df: Long)

  /** One fitted hybrid query: its BM25 term table and dense vector. */
  case class HybridQuery(query_id: Long, terms: Seq[QTerm],
      vec: Seq[Double])

  /** Fitted hybrid-retrieval model: per-query term tables + vectors
    * plus the corpus stats the BM25 length norm needs — queries ×
    * (terms + dims) scalars, a plan literal at any corpus size (the
    * [[graft.llm.TextAnalysis.Bm25Model]] fit/apply pattern).
    */
  case class HybridModel(queries: Seq[HybridQuery], n: Long, tot: Long)

  /** Fit [[hybridRrf]]'s query-side state OFFLINE so a live feed can
    * be scored against it ([[graft.streaming.StreamingDedup
    * .hybridScoreStage]]): per query, the distinct terms (length ≥
    * `minTermLen`) of its document with their corpus-wide df, and
    * its dense vector; plus (n, tot). Collects only query-term and
    * query-vector rows — the sanctioned fit-collect class.
    */
  def hybridFit(docs: DataFrame, emb: DataFrame, queryIds: Seq[Long],
      text: String = "text", docId: String = "doc_id",
      vecId: String = "vec_id", vecCol: String = "embedding",
      minTermLen: Int = 5): HybridModel = {
    val qSet = queryIds.map(lit(_))
    val toks = docs.select(col(docId).cast("long").as("doc_id"),
      expr(s"filter(split(lower($text), ' '), t -> t != '')")
        .as("toks"))
    val totals = toks
      .agg(count(lit(1)).as("n"),
        sum(size(col("toks")).cast("long")).as("tot"))
      .collect()(0)
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val qterms = tf.filter(col("doc_id").isin(qSet: _*))
      .filter(length(col("term")) >= minTermLen)
      .select(col("doc_id").as("query_id"), col("term"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qtd = dfreq.join(broadcast(qterms), Seq("term"))
      .select("query_id", "term", "df")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val vecs = emb.filter(col(vecId).isin(qSet: _*))
      .select(col(vecId).cast("long"),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val queries = queryIds.sorted.map { qid =>
      HybridQuery(qid,
        qtd.getOrElse(qid, Array.empty[(Long, String, Long)])
          .map { case (_, t, df) => QTerm(t, df) }.sortBy(_.t).toSeq,
        vecs.getOrElse(qid,
          throw new IllegalArgumentException(
            s"hybridFit: query $qid has no embedding")))
    }
    HybridModel(queries, totals.getLong(0), totals.getLong(1))
  }

  /** Pinned rank-biased-overlap weight table: `w_nano(d) =
    * floor((1−p)·p^(d−1)·10^9)` for 1-based depth d at persistence
    * p = pPpm/10^6. Computed ONCE and shipped as integer literals to
    * both engines (the [[dcgDiscountMicro]] discipline), so no pow()
    * crosses the cross-engine contract.
    */
  def rboWeightsNano(k: Int, pPpm: Long): Seq[Long] = {
    require(k >= 1 && k <= 100, "need 1 <= k <= 100")
    require(pPpm >= 1L && pPpm < 1000000L, "need 0 < p < 1")
    val p = pPpm.toDouble / 1e6
    (1 to k).map(d =>
      math.floor((1.0 - p) * math.pow(p, d - 1) * 1e9).toLong)
  }

  /** Rank-biased overlap @ k (Webber/Moffat/Zobel 2010, the
    * truncated base form) between two per-query rankings — the
    * QREL-FREE retriever diagnostic: how much do two arms (or two
    * versions of one retriever) agree, with top ranks weighted
    * hardest? The companion to [[retrievalEval]]: eval needs
    * relevance labels, RBO only needs the two shortlists, so it runs
    * on every corpus and every A/B.
    *
    * rbo_nano = Σ_{d=1..k} w_nano(d) · |A_{1..d} ∩ B_{1..d}| / d
    * with the pinned [[rboWeightsNano]] literals and truncating
    * integer division per depth term — exact integers end to end.
    * Also emits overlap@k and agree_ppm = overlap_k·10^6 / k. A
    * query present in only one run scores overlap 0 (disjoint
    * shortlists), not NULL — absence of the other arm IS complete
    * disagreement.
    *
    * Scale shape: both runs are top-k per query; the intersection is
    * one equi-join on (query, doc) — a shared doc enters every depth
    * d ≥ max(rank_a, rank_b), so per query only the ≤ k max-rank
    * values are kept (one bounded collect_list aggregate) and the
    * depth sum unrolls as a generated integer expression over those
    * literals. Query-proportional, no windows.
    */
  def rankOverlap(runA: DataFrame, runB: DataFrame, k: Int = 10,
      pPpm: Long = 900000L): DataFrame = {
    val w = rboWeightsNano(k, pPpm)
    // each side is collapsed to its best (min) rank per (query, doc):
    // a duplicated run row would otherwise multiply through the
    // intersection equi-join and push overlap counts past d (so
    // rbo_nano could exceed the weight-sum ceiling)
    def side(run: DataFrame, r: String): DataFrame = run
      .select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as(r))
      .filter(col(r) <= k && col(r) >= 1)
      .groupBy("query_id", "doc_id")
      .agg(min(col(r)).as(r))
    val a = side(runA, "__ra")
    val b = side(runB, "__rb")
    val shared = a.join(b, Seq("query_id", "doc_id"))
      .select(col("query_id"),
        greatest(col("__ra"), col("__rb")).as("__m"))
      .groupBy("query_id")
      .agg(collect_list(col("__m")).as("__ms"))
    val qs = a.select("query_id").union(b.select("query_id"))
      .distinct()
    // unrolled depth sum from the pinned weights — the identical
    // generated arithmetic runs in the DuckDB mirror
    val rboExpr = (1 to k).map { d =>
      s"${w(d - 1)}L * size(filter(__ms, m -> m <= $d)) DIV ${d}L"
    }.mkString(" + ")
    qs.join(shared, Seq("query_id"), "left")
      .withColumn("__ms", coalesce(col("__ms"),
        expr("CAST(array() AS ARRAY<BIGINT>)")))
      .select(col("query_id"),
        expr(s"CAST(size(filter(__ms, m -> m <= $k)) AS BIGINT)")
          .as("overlap_k"),
        expr(s"CAST(size(filter(__ms, m -> m <= $k)) AS BIGINT) * " +
          s"1000000L DIV ${k}L").as("agree_ppm"),
        expr(s"CAST($rboExpr AS BIGINT)").as("rbo_nano"))
  }

  /** One query's fitted eval-side state: total relevant count, the
    * precomputed ideal DCG (exact integers, same arithmetic as the
    * batch ideal side), and the graded qrel map for run-row lookup.
    */
  case class QueryQrels(nRel: Long, idcgMicro: Long,
      rels: Map[Long, Long])

  /** Fitted retrieval-eval model: per-query qrel state plus the
    * pinned discount table — queries × qrels scalars (an eval set,
    * bounded), shipped to a streaming stage as plan-side literals
    * ([[graft.streaming.StreamingDedup.retrievalEvalStage]]).
    */
  case class RetrievalEvalModel(k: Int,
      disc: Seq[Long], queries: Map[Long, QueryQrels])

  /** Fit [[retrievalEval]]'s qrel side OFFLINE so a live run feed can
    * be scored against it: per query, the max-grade-collapsed qrel
    * map, n_rel, and idcg_micro replayed with the batch operator's
    * exact integer arithmetic (grades sorted descending fill
    * contiguous discount-prefix spans). Collects only the qrel set —
    * the sanctioned fit-collect class — with a plan-time LIMIT bound
    * and named contract errors for NULL keys / over-range grades.
    */
  def retrievalEvalFit(qrels: DataFrame, k: Int = 10,
      maxRel: Int = 20, maxQrels: Int = 1000000): RetrievalEvalModel = {
    require(maxRel >= 1 && maxRel <= 62,
      "maxRel must fit a long gain: 1 <= maxRel <= 62")
    val disc = dcgDiscountMicro(k)
    require((1L << maxRel) - 1L <= Long.MaxValue / disc.sum,
      s"retrievalEvalFit: maxRel=$maxRel overflows the integer DCG " +
        s"tree at k=$k")
    val rows = qrels
      .select(col("query_id").cast("long").as("q"),
        col("doc_id").cast("long").as("d"),
        col("rel").cast("long").as("rel"))
      .filter(col("rel") > 0)
      .groupBy("q", "d").agg(max(col("rel")).as("rel"))
      .limit(maxQrels + 1)
      .collect()
    require(rows.length <= maxQrels,
      s"retrievalEvalFit: over $maxQrels distinct qrels — the fit " +
        "must stay bounded; raise maxQrels only for a genuine " +
        "eval set")
    val triples = rows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        "retrievalEvalFit: NULL query_id/doc_id in qrels — keys " +
          "must be non-null (filter or coalesce upstream)")
      val rel = r.getLong(2)
      require(rel <= maxRel,
        s"retrievalEvalFit: rel $rel exceeds maxRel=$maxRel")
      (r.getLong(0), r.getLong(1), rel)
    }
    val discPrefix = disc.scanLeft(0L)(_ + _)
    val queries = triples.groupBy(_._1).map { case (q, qs) =>
      // ideal side: grades descending fill contiguous rank spans —
      // identical to the batch aggregate's prefix-sum fold
      val byGrade = qs.groupBy(_._3).toSeq.sortBy(-_._1)
      var used = 0L
      var idcg = 0L
      byGrade.foreach { case (g, rs) =>
        val end = math.min(used + rs.length, k.toLong)
        idcg += ((1L << g.toInt) - 1L) *
          (discPrefix(end.toInt) - discPrefix(math.min(used, k.toLong).toInt))
        used = end
      }
      q -> QueryQrels(qs.length.toLong, idcg,
        qs.map(t => t._2 -> t._3).toMap)
    }
    RetrievalEvalModel(k, disc, queries)
  }

  /** Paired sign test between scored systems on a shared per-unit
    * metric — the significance layer over the per-arm scoreboard:
    * "arm A's mean nDCG is higher" means nothing at 8 queries unless
    * the PAIRED per-query comparison says the direction is
    * consistent. Input: one row per (system, unit) with an integer
    * metric (e.g. [[retrievalEval]]'s ndcg_ppm tagged by arm); NULL
    * metrics drop that unit for every pair involving the system
    * (a no-qrels query cannot vote). Output: one row per unordered
    * system pair (sys_a < sys_b lexicographically) with n_pairs,
    * wins_a, wins_b, ties, mean_diff_ppm (truncating integer mean of
    * a−b), and the sign-test z = (wins_a − wins_b)/√(wins_a+wins_b)
    * (ties excluded, the standard correction-free form; 0 when no
    * untied pair), rounded to 6dp — the [[Preference.positionBias]]
    * fixed-order double tail, so cross-engine exact.
    *
    * Duplicated (system, unit) score rows are collapsed to their MAX
    * metric before the pairing — the [[retrievalEval]] run/qrel
    * discipline: the test is a function of the score SET, so an
    * accidentally doubled row must not inflate n_pairs, wins, or z.
    *
    * Scale shape: the self-join is keyed on `unit` — safe only while
    * the frame is eval-sized (systems × units), so the bound is a
    * CONTRACT, not a caveat: an in-plan guard (folded into the
    * consumed metric, the fit-collect discipline) raises loudly when
    * distinct units exceed `maxUnits` or distinct systems exceed
    * `maxSystems` — a caller passing a corpus-sized unit gets an
    * error, never a silent O(S²·U) blowup. Within the bound: one
    * collapse aggregate, one tiny-aggregate broadcast, one unit-keyed
    * join, one map-side-combined aggregate per pair — never
    * corpus-proportional.
    */
  def pairedSignTest(scores: DataFrame, system: String, unit: String,
      metric: String, maxUnits: Long = 1000000L,
      maxSystems: Long = 1000L): DataFrame = {
    require(maxUnits >= 1L && maxSystems >= 2L,
      "need maxUnits >= 1 and maxSystems >= 2")
    val one = scores.select(col(system).cast("string").as("__s"),
        col(unit).as("__u"), col(metric).cast("long").as("__m"))
      .filter(col("__m").isNotNull)
      .groupBy(col("__s"), col("__u"))
      .agg(max(col("__m")).as("__m"))
    val bounds = one.agg(
      countDistinct(col("__u")).cast("long").as("__uc"),
      countDistinct(col("__s")).cast("long").as("__sc"))
    val bounded = one.crossJoin(broadcast(bounds))
      .select(col("__s"), col("__u"), expr(
        s"""CASE WHEN __uc > ${maxUnits}L THEN raise_error(concat(
           |  'pairedSignTest: ', CAST(__uc AS STRING),
           |  ' distinct units exceed maxUnits=$maxUnits -- the',
           |  ' unit-keyed self-join is eval-sized by contract;',
           |  ' raise maxUnits explicitly if the eval set really',
           |  ' is this large'))
           |WHEN __sc > ${maxSystems}L THEN raise_error(concat(
           |  'pairedSignTest: ', CAST(__sc AS STRING),
           |  ' distinct systems exceed maxSystems=$maxSystems'))
           |ELSE __m END""".stripMargin).as("__m"))
    val a = bounded.select(col("__s").as("__sa"), col("__u"),
      col("__m").as("__ma"))
    val b = bounded.select(col("__s").as("__sb"), col("__u"),
      col("__m").as("__mb"))
    a.join(b, Seq("__u"))
      .filter(col("__sa") < col("__sb"))
      .groupBy(col("__sa").as("sys_a"), col("__sb").as("sys_b"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(when(col("__ma") > col("__mb"), 1L).otherwise(0L))
          .cast("long").as("wins_a"),
        sum(when(col("__mb") > col("__ma"), 1L).otherwise(0L))
          .cast("long").as("wins_b"),
        sum(when(col("__ma") === col("__mb"), 1L).otherwise(0L))
          .cast("long").as("ties"),
        expr("CAST(sum(__ma - __mb) AS BIGINT)").as("__dsum"))
      .withColumn("mean_diff_ppm",
        expr("CAST(__dsum DIV n_pairs AS BIGINT)"))
      .withColumn("z_sign", expr(
        "CASE WHEN wins_a + wins_b = 0 THEN 0.0D ELSE " +
          "round((CAST(wins_a AS DOUBLE) - CAST(wins_b AS DOUBLE)) " +
          "/ sqrt(CAST(wins_a + wins_b AS DOUBLE)), 6) END"))
      .select("sys_a", "sys_b", "n_pairs", "wins_a", "wins_b",
        "ties", "mean_diff_ppm", "z_sign")
  }

  /** Pinned DCG discount table: `discount_micro(r) = floor(10^6 /
    * log2(r + 1))` for 1-based rank r. Computed ONCE here and shipped
    * as integer literals into both engines' plans (the mojibakeMap
    * discipline), so no libm log ever crosses the cross-engine
    * contract — the standard Järvelin-Kekäläinen discount, micro-
    * pinned.
    */
  def dcgDiscountMicro(k: Int): Seq[Long] = {
    require(k >= 1 && k <= 1000, "need 1 <= k <= 1000")
    (1 to k).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)
  }

  /** Graded-relevance retrieval evaluation — nDCG@k, reciprocal rank,
    * recall@k per query: the scoreboard every retrieval change
    * (BM25 weights, fusion constants, ANN recall trade-offs) is
    * actually judged by, closing the loop the ann_recall telemetry
    * opened. `run` carries (query_id, doc_id, rank) — any arm's
    * shortlist ([[hybridRrf]], [[TextAnalysis.bm25TopK]] reshaped,
    * [[Similarity.bruteForceTopK]]); `qrels` carries graded
    * (query_id, doc_id, rel) with rel > 0 meaning relevant (rel = 0
    * rows are dropped — absent pairs ARE the zero grade).
    *
    * Pure-integer contract: gain = 2^rel − 1 exactly (shiftleft on
    * longs; rel is clamped-checked to ≤ `maxRel`, and `maxRel` itself
    * must satisfy (2^maxRel − 1) · Σ discounts ≤ Long.MaxValue so the
    * whole DCG/IDCG tree fits), discount = the pinned
    * [[dcgDiscountMicro]] literals, so
    * DCG/IDCG are exact integer sums (order-independent) and
    * `ndcg_ppm` / `recall_ppm` / `rr_ppm` are truncating integer
    * divisions — bit-identical on any engine.
    *
    * Per query: `n_ret` hits scored, `n_rel` total relevant in
    * qrels, `n_rel_ret` relevant retrieved within k, `recall_ppm`,
    * `rr_ppm` (10^6 / first relevant rank, 0 if none), `ap_ppm`
    * (average precision @ k: Σ over relevant ranks i of P@i in
    * truncated micro units, divided by min(n_rel, k) — the MAP
    * numerator per query), `dcg_micro`, `idcg_micro` (ideal = qrels
    * sorted rel-descending, top k), `ndcg_ppm` (NULL when the query
    * has no relevant documents, as is `ap_ppm`). Duplicate qrel rows
    * are collapsed to their max grade per (query, doc), and duplicate
    * RUN rows to their best (min) rank — metrics are a function of
    * the two SETS, never of accidental row multiplicity.
    *
    * Scale shape: the run is top-k per query (query-proportional,
    * never corpus-proportional); qrels joins are equi-joins on
    * (query_id, doc_id); the ideal side reduces qrels with ONE
    * map-side-combined groupBy whose collect_list is capped by
    * qrels-per-query (an eval set, bounded in practice — and only
    * the top k survive the slice). No window anywhere.
    */
  def retrievalEval(run: DataFrame, qrels: DataFrame, k: Int = 10,
      maxRel: Int = 20): DataFrame = {
    require(maxRel >= 1 && maxRel <= 62,
      "maxRel must fit a long gain: 1 <= maxRel <= 62")
    val disc = dcgDiscountMicro(k)
    // Static overflow guard — what it actually bounds (round-20
    // correction): run dedup is per (query, doc), NOT per rank, so a
    // feed where many docs share one rank can hold arbitrarily many
    // rows per query and the per-query DCG SUM is unbounded by any
    // maxRel cut. This require guarantees (a) every single
    // gain·discount TERM fits a long (gain ≤ Long.Max / Σdisc ≤
    // Long.Max / disc(1)) and (b) the IDCG side exactly (qrels ARE
    // per-(query,doc) deduped and grade spans cap at k, so
    // idcg ≤ gain · prefix.last). The per-query DCG sum itself is
    // guarded DYNAMICALLY below: summed in exact decimal and raised
    // loudly past Long.Max — Spark (non-ANSI) would wrap silently
    // while DuckDB BIGINT errors, and both failure modes must be a
    // loud error, not cross-engine divergence. At the k=10 defaults
    // this caps maxRel at 40.
    val discTotal = disc.sum
    require((1L << maxRel) - 1L <= Long.MaxValue / discTotal,
      s"retrievalEval: maxRel=$maxRel overflows the integer DCG " +
        s"terms at k=$k — (2^maxRel - 1) * ${discTotal}L exceeds " +
        "Long.MaxValue; lower maxRel or k")
    val discSql = disc.map(d => s"${d}L").mkString("array(", ", ", ")")
    val rel = qrels
      .select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rel").cast("long").as("rel"))
      .filter(col("rel") > 0)
      // a duplicated qrel row would JOIN twice into the run and
      // double-count its gain/recall — dedupe to the max grade per
      // (query, doc) so the metrics are a function of the qrel SET
      // (one aggregate over the eval-sized frame, map-side combined)
      .groupBy("query_id", "doc_id")
      .agg(max(col("rel")).as("rel"))
      // guard folded INTO the consumed column (a side-column would be
      // pruned away): an over-range grade overflows the 2^rel gain,
      // so fail loudly instead
      .withColumn("rel", expr(
        s"CASE WHEN rel <= ${maxRel}L THEN rel ELSE " +
          s"raise_error(concat('retrievalEval: rel ', " +
          s"CAST(rel AS STRING), ' exceeds maxRel=$maxRel')) END"))
    val hits = run
      .select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank"))
      // rank >= 1 too: a 0/negative sentinel ("not ranked by this
      // arm") must drop out — element_at would otherwise read the
      // discount table from the END on a negative index
      .filter(col("rank") <= k && col("rank") >= 1)
      // run-side twin of the qrel max-grade collapse: a duplicated
      // (query, doc) run row would multiply through the rel join and
      // double-count gain/recall — collapse to the best (min) rank
      // so metrics are a function of the run SET (top-k-per-query
      // sized frame, map-side combined)
      .groupBy("query_id", "doc_id")
      .agg(min(col("rank")).as("rank"))
      .join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("__gain", expr(
        "shiftleft(1L, CAST(coalesce(rel, 0L) AS INT)) - 1L"))
      .withColumn("__disc", expr(
        s"element_at($discSql, CAST(rank AS INT))"))
    val perQ = hits.groupBy("query_id")
      .agg(count(lit(1)).cast("long").as("n_ret"),
        // each TERM fits a long (static require above); the SUM is
        // accumulated in exact decimal(38,0) — 10^19 terms away from
        // decimal overflow — and raised loudly if the total leaves
        // the long range, because rank ties mean rows-per-query is
        // not bounded by k
        expr(
          """CASE WHEN sum(CAST(__gain * __disc AS DECIMAL(38,0)))
            |  > CAST(9223372036854775807 AS DECIMAL(38,0))
            |THEN raise_error(concat('retrievalEval: per-query DCG ',
            |  'sum overflows BIGINT for query ',
            |  CAST(query_id AS STRING),
            |  ' -- too many tied-rank rows at high grades'))
            |ELSE CAST(sum(CAST(__gain * __disc AS DECIMAL(38,0)))
            |  AS BIGINT) END""".stripMargin).as("dcg_micro"),
        sum(when(col("rel").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_rel_ret"),
        min(when(col("rel").isNotNull, col("rank")))
          .as("__first_rel"),
        // average-precision numerator: Σ over relevant ranks i of
        // P@i in truncated micro units (P@i = hits-through-i / i) —
        // a rank-sorted integer fold inside the aggregate, so no
        // window and the sum is deterministic
        expr("""aggregate(
            sort_array(collect_list(struct(rank,
              CASE WHEN rel IS NOT NULL THEN 1L ELSE 0L END AS ir))),
            named_struct('h', 0L, 's', 0L),
            (a, x) -> named_struct('h', a.h + x.ir,
              's', a.s + CASE WHEN x.ir = 1L
                THEN (a.h + 1L) * 1000000L DIV x.rank ELSE 0L END),
            a -> a.s)""").as("__ap_num"))
    // Ideal side WITHOUT a per-query qrel collect: grades are
    // bounded (<= maxRel values), so reduce qrels to (query, grade)
    // COUNTS first — map-side combining, output bounded by
    // queries × maxRel — then fold the <= maxRel grade rows per
    // query against a pinned discount PREFIX-SUM table: the ideal
    // ranking fills positions highest-grade-first, so each grade
    // occupies one contiguous discount span and
    // idcg = Σ_grades gain(g) · (prefix[end] − prefix[start]).
    // This keeps the ideal side exact at ANY qrels-per-query (a
    // collect_list buffer would grow with the eval set).
    val discPrefix = disc.scanLeft(0L)(_ + _)
    val discPrefixSql =
      discPrefix.map(d => s"${d}L").mkString("array(", ", ", ")")
    val ideal = rel.groupBy("query_id", "rel")
      .agg(count(lit(1)).cast("long").as("__cnt"))
      .groupBy("query_id")
      .agg(sum(col("__cnt")).cast("long").as("n_rel"),
        // bounded: one struct per distinct grade (<= maxRel)
        expr("sort_array(collect_list(struct(rel, __cnt)), false)")
          .as("__grades"))
      .withColumn("idcg_micro", expr(
        s"""aggregate(__grades, named_struct('used', 0L, 's', 0L),
           |  (a, g) -> named_struct(
           |    'used', least(a.used + g.__cnt, ${k}L),
           |    's', a.s + (shiftleft(1L, CAST(g.rel AS INT)) - 1L) *
           |      (element_at($discPrefixSql,
           |         CAST(least(a.used + g.__cnt, ${k}L) AS INT) + 1)
           |       - element_at($discPrefixSql,
           |           CAST(least(a.used, ${k}L) AS INT) + 1))),
           |  a -> a.s)""".stripMargin))
      .select(col("query_id"), col("n_rel"), col("idcg_micro"))
    perQ.join(ideal, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_rel_ret"), lit(0L)).as("n_rel_ret"),
        expr("CASE WHEN coalesce(n_rel, 0L) = 0L THEN " +
          "CAST(NULL AS BIGINT) ELSE coalesce(n_rel_ret, 0L) * " +
          "1000000L DIV n_rel END").as("recall_ppm"),
        expr("CASE WHEN __first_rel IS NULL THEN 0L ELSE " +
          "1000000L DIV __first_rel END").as("rr_ppm"),
        expr(s"CASE WHEN coalesce(n_rel, 0L) = 0L THEN " +
          s"CAST(NULL AS BIGINT) ELSE coalesce(__ap_num, 0L) DIV " +
          s"least(n_rel, ${k}L) END").as("ap_ppm"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"),
        expr("CASE WHEN coalesce(idcg_micro, 0L) = 0L THEN " +
          "CAST(NULL AS BIGINT) ELSE coalesce(dcg_micro, 0L) * " +
          "1000000L DIV idcg_micro END").as("ndcg_ppm"))
  }

  /** Multi-arm [[retrievalEval]] in ONE plan (round 21, an
    * optimization-only rewrite): scoring N tagged runs against ONE
    * qrel set used to be N independent retrievalEval plans unioned —
    * the qrel dedup + grade guard, the ideal (IDCG) chain, and the
    * final join each ran once PER ARM even though they depend only on
    * the qrels. Here the runs are tagged and unioned FIRST, every
    * run-side aggregate is keyed (arm, query) instead of (query), the
    * qrel side is computed once and pinned (two consumers: the hits
    * join and the ideal chain), and the ideal rows fan out to the
    * arms by an explode over the literal arm list. Row-for-row
    * identical to `runs.map((a, r) => retrievalEval(r, qrels, k,
    * maxRel).withColumn("arm", lit(a))).reduce(unionByName)` — pinned
    * by spec — with aggregates 3× fewer and one final join instead of
    * three. Formulas are copied verbatim from [[retrievalEval]]; any
    * change must land in both.
    */
  def retrievalEvalArms(runs: Seq[(String, DataFrame)],
      qrels: DataFrame, k: Int = 10, maxRel: Int = 20): DataFrame = {
    require(runs.nonEmpty, "need at least one tagged run")
    require(runs.map(_._1).distinct.size == runs.size,
      "arm tags must be distinct")
    require(maxRel >= 1 && maxRel <= 62,
      "maxRel must fit a long gain: 1 <= maxRel <= 62")
    val disc = dcgDiscountMicro(k)
    val discTotal = disc.sum
    require((1L << maxRel) - 1L <= Long.MaxValue / discTotal,
      s"retrievalEvalArms: maxRel=$maxRel overflows the integer DCG " +
        s"terms at k=$k — (2^maxRel - 1) * ${discTotal}L exceeds " +
        "Long.MaxValue; lower maxRel or k")
    val discSql = disc.map(d => s"${d}L").mkString("array(", ", ", ")")
    // qrel side: dedup + grade guard ONCE for all arms, pinned — the
    // hits join and the ideal chain both read it
    val rel = qrels
      .select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rel").cast("long").as("rel"))
      .filter(col("rel") > 0)
      .groupBy("query_id", "doc_id")
      .agg(max(col("rel")).as("rel"))
      .withColumn("rel", expr(
        s"CASE WHEN rel <= ${maxRel}L THEN rel ELSE " +
          s"raise_error(concat('retrievalEval: rel ', " +
          s"CAST(rel AS STRING), ' exceeds maxRel=$maxRel')) END"))
      .localCheckpoint()
    val run = runs.map { case (arm, r) =>
      r.select(lit(arm).as("arm"),
        col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank"))
    }.reduce(_.unionByName(_))
    val hits = run
      .filter(col("rank") <= k && col("rank") >= 1)
      .groupBy("arm", "query_id", "doc_id")
      .agg(min(col("rank")).as("rank"))
      .join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("__gain", expr(
        "shiftleft(1L, CAST(coalesce(rel, 0L) AS INT)) - 1L"))
      .withColumn("__disc", expr(
        s"element_at($discSql, CAST(rank AS INT))"))
    val perQ = hits.groupBy("arm", "query_id")
      .agg(count(lit(1)).cast("long").as("n_ret"),
        expr(
          """CASE WHEN sum(CAST(__gain * __disc AS DECIMAL(38,0)))
            |  > CAST(9223372036854775807 AS DECIMAL(38,0))
            |THEN raise_error(concat('retrievalEval: per-query DCG ',
            |  'sum overflows BIGINT for query ',
            |  CAST(query_id AS STRING),
            |  ' -- too many tied-rank rows at high grades'))
            |ELSE CAST(sum(CAST(__gain * __disc AS DECIMAL(38,0)))
            |  AS BIGINT) END""".stripMargin).as("dcg_micro"),
        sum(when(col("rel").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_rel_ret"),
        min(when(col("rel").isNotNull, col("rank")))
          .as("__first_rel"),
        expr("""aggregate(
            sort_array(collect_list(struct(rank,
              CASE WHEN rel IS NOT NULL THEN 1L ELSE 0L END AS ir))),
            named_struct('h', 0L, 's', 0L),
            (a, x) -> named_struct('h', a.h + x.ir,
              's', a.s + CASE WHEN x.ir = 1L
                THEN (a.h + 1L) * 1000000L DIV x.rank ELSE 0L END),
            a -> a.s)""").as("__ap_num"))
    val discPrefix = disc.scanLeft(0L)(_ + _)
    val discPrefixSql =
      discPrefix.map(d => s"${d}L").mkString("array(", ", ", ")")
    // ideal side once per QUERY (arm-independent), fanned out to the
    // arms by an explode over the literal tag list
    val ideal = rel.groupBy("query_id", "rel")
      .agg(count(lit(1)).cast("long").as("__cnt"))
      .groupBy("query_id")
      .agg(sum(col("__cnt")).cast("long").as("n_rel"),
        expr("sort_array(collect_list(struct(rel, __cnt)), false)")
          .as("__grades"))
      .withColumn("idcg_micro", expr(
        s"""aggregate(__grades, named_struct('used', 0L, 's', 0L),
           |  (a, g) -> named_struct(
           |    'used', least(a.used + g.__cnt, ${k}L),
           |    's', a.s + (shiftleft(1L, CAST(g.rel AS INT)) - 1L) *
           |      (element_at($discPrefixSql,
           |         CAST(least(a.used + g.__cnt, ${k}L) AS INT) + 1)
           |       - element_at($discPrefixSql,
           |           CAST(least(a.used, ${k}L) AS INT) + 1))),
           |  a -> a.s)""".stripMargin))
      .withColumn("arm",
        explode(array(runs.map(t => lit(t._1)): _*)))
      .select(col("arm"), col("query_id"), col("n_rel"),
        col("idcg_micro"))
    perQ.join(ideal, Seq("arm", "query_id"), "full_outer")
      .select(col("query_id"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_rel_ret"), lit(0L)).as("n_rel_ret"),
        expr("CASE WHEN coalesce(n_rel, 0L) = 0L THEN " +
          "CAST(NULL AS BIGINT) ELSE coalesce(n_rel_ret, 0L) * " +
          "1000000L DIV n_rel END").as("recall_ppm"),
        expr("CASE WHEN __first_rel IS NULL THEN 0L ELSE " +
          "1000000L DIV __first_rel END").as("rr_ppm"),
        expr(s"CASE WHEN coalesce(n_rel, 0L) = 0L THEN " +
          s"CAST(NULL AS BIGINT) ELSE coalesce(__ap_num, 0L) DIV " +
          s"least(n_rel, ${k}L) END").as("ap_ppm"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"),
        expr("CASE WHEN coalesce(idcg_micro, 0L) = 0L THEN " +
          "CAST(NULL AS BIGINT) ELSE coalesce(dcg_micro, 0L) * " +
          "1000000L DIV idcg_micro END").as("ndcg_ppm"),
        // arm is a join KEY of the full outer — present on whichever
        // side produced the row, so never null; the coalesce only
        // restores the non-nullable schema the per-arm lit() had
        coalesce(col("arm"), lit("")).as("arm"))
  }
}
