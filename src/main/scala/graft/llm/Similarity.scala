package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Scale design: brute-force top-k broadcasts the (small) query set
  * against the corpus — one narrow pass, no shuffle of the corpus, the
  * right plan when |queries| ≪ |corpus|. The scale path is
  * random-hyperplane LSH: each vector gets a small integer bucket from
  * deterministic hyperplanes (a per-row codegen'd expression), then
  * search/join happens within buckets — shuffle keyed on the bucket
  * id, candidate count governed by bucket occupancy, never n².
  */
object Similarity {

  /** Left-fold dot product of two double arrays (exact fold order —
    * reproducible across engines). Native ([[DotProductExpr]]): the
    * equivalent `aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
    * (acc, v) -> acc + v)` HOF — which the DuckDB oracles replay —
    * runs interpreted and allocates the zipped array per row; the
    * native loop is the identical IEEE operation sequence compiled
    * (value-pinned against the HOF in LlmSpec).
    */
  private def dot(a: Column, b: Column): Column =
    VectorColumns.dot(a, b)

  /** Cosine similarity between two array<double> columns. */
  def cosineExpr(a: String, b: String): Column =
    dot(col(a), col(b)) /
      (sqrt(dot(col(a), col(a))) * sqrt(dot(col(b), col(b))))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded). Ties broken by candidate id for
    * determinism; similarity rounded before ranking so rank order is
    * reproducible bit-for-bit.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__qv"))
    val c = corpus.select(col(id).as("cand_id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("sim", round(cosineExpr("__qv", "__cv"), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "sim", "rank")
  }

  /** Deterministic pseudo-random hyperplane component w(j, i) in
    * [-0.5, 0.5): integer LCG scramble, exact in both Spark and
    * DuckDB ((j*dim+i)*2654435761 < 2^42 — no overflow).
    */
  def planeCoef(j: Int, i: String): String =
    s"(CAST(((($j * 64 + $i) * 2654435761) % 2147483647) AS DOUBLE) / 2147483647.0 - 0.5)"

  /** Random-hyperplane LSH bucket id from `planes` sign bits
    * (planes = 0 ⇒ single bucket 0, useful as a brute-force fallback).
    */
  def lshBucketExpr(vec: String, planes: Int): Column = {
    if (planes <= 0) return expr("0")
    val bits = (0 until planes).map { j =>
      val d = s"""aggregate(zip_with($vec, sequence(0, 63),
                  (x, i) -> CAST(x AS DOUBLE) * ${planeCoef(j, "i")}),
                  0D, (acc, v) -> acc + v)"""
      s"(CASE WHEN $d >= 0 THEN ${1 << j} ELSE 0 END)"
    }
    expr(bits.mkString("(", " + ", ")"))
  }

  /** Bucket assignment for a corpus — the pre-partitioning step of the
    * LSH similarity join.
    */
  def lshBuckets(df: DataFrame, id: String, vec: String,
      planes: Int = 8): DataFrame =
    df.select(col(id), lshBucketExpr(vec, planes).as("bucket"))

  /** IVF cell assignment: nearest centroid by cosine (ties to the
    * higher cell id, deterministically). Centroids are a small frame
    * (cell: long, cvec: array<double>) — broadcast, so assignment is
    * one narrow pass over the corpus; a k-means fit would produce the
    * same frame. The inverted-file layout IS the partitioning:
    * searches touch only probed cells, never the whole corpus.
    */
  def ivfAssign(df: DataFrame, id: String, vec: String,
      centroids: DataFrame): DataFrame = {
    val v = df.select(col(id),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__v"))
    val scored = v.crossJoin(broadcast(centroids))
      .withColumn("__sim", cosineExpr("__v", "cvec"))
    // max_by over the (sim, cell) struct = argmax with ties to the
    // higher cell. An equivalent row_number window would shuffle and
    // sort all |corpus| x |centroids| scored rows; the aggregation's
    // map-side combine collapses each vector's candidates before the
    // exchange (the scores for one vector are co-located — they come
    // from one input row).
    scored.groupBy(col(id))
      .agg(max_by(col("cell"), struct(col("__sim"), col("cell")))
        .as("cell"))
  }

  /** Deterministic centroid frame: the `cells` SMALLEST-ID vectors
    * present in `df` serve as fixed seeds, each labeled by its own
    * id (stand-in for a k-means fit). Rank-based rather than the
    * id < cells cut so rows excluded upstream — zero-norm embeddings
    * in [[semDedup]], a sparse id space — can never under-seed the
    * cell count; on a dense 0-based id space the two rules pick the
    * same seeds. orderBy+limit plans as a distributed top-k
    * (TakeOrdered), no single-partition window.
    */
  def seedCentroids(df: DataFrame, id: String, vec: String,
      cells: Int): DataFrame =
    df.orderBy(col(id).asc).limit(cells)
      .select(col(id).cast("long").as("cell"),
        expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("cvec"))

  /** Deterministic Lloyd's k-means refinement of the IVF centroids:
    * each iteration broadcast-assigns every vector to its nearest
    * centroid (one narrow corpus pass — [[ivfAssign]]), then takes the
    * component-wise mean per cell. Component sums route through
    * `decimal(28,10)` — decimal addition is exact, so the mean is
    * ORDER-INDEPENDENT and bit-reproducible on any partitioning and
    * in the DuckDB oracle (a double sum would drift with shuffle
    * order). Cells that lose all members keep their previous centroid.
    * Per iteration: one broadcast pass + one (cell, dim)-keyed
    * aggregation — both map-side combining, nothing driver-side, the
    * same cost profile at any corpus size.
    */
  def kmeansCentroids(df: DataFrame, id: String, vec: String,
      cells: Int, iters: Int): DataFrame = {
    val v = df.select(col(id),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__v"))
    var cents = seedCentroids(df, id, vec, cells)
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(df, id, vec, cents).join(v, Seq(id))
      val means = assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("__i", "__x")))
        .groupBy(col("cell"), col("__i"))
        .agg((sum(col("__x").cast("decimal(28,10)")).cast("double")
          / count(lit(1))).as("__m"))
      val refreshed = means.groupBy(col("cell"))
        .agg(expr("transform(sort_array(collect_list(struct(__i, __m))), s -> s.__m)")
          .as("__cv"))
      cents = cents
        .join(refreshed, Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("__cv"), col("cvec")).as("cvec"))
        // truncate lineage: without this each iteration's plan embeds
        // every previous one, and each action recomputes the full
        // history — fine at iters=2, quadratic blowup beyond
        .localCheckpoint()
    }
    cents
  }

  /** IVF top-k: probe each query's `nprobe` nearest cells, brute-force
    * cosine only within them. Both the probe map and the query set are
    * broadcast; the corpus is scanned once.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, centroids: DataFrame, k: Int,
      nprobe: Int = 2): DataFrame = {
    val q = queries.select(col(id).as("query_id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__qv"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__sim", cosineExpr("__qv", "cvec"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("cell").desc)
    val probed = probes.withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cell"))
    val cands = ivfAssign(corpus, id, vec, centroids)
      .join(corpus.select(col(id),
        expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__cv")),
        Seq(id))
      .select(col(id).as("cand_id"), col("cell"), col("__cv"))
    val joined = cands.join(broadcast(probed), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("sim", round(cosineExpr("__qv", "__cv"), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "sim", "rank")
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max|x|/127, code_i = round-half-even(x_i/scale), in
    * [-127, 127] by construction. The rounding routes through
    * DECIMAL(28,12) — Spark `bround` on decimal and DuckDB
    * `round_even` on decimal agree exactly, where float round_even is
    * unpredictable within an ulp of a tie. Zero vectors get scale 0
    * and zero codes. Dequantization is code * scale; 4× smaller
    * vectors is the standard ANN-at-scale memory trade.
    */
  def quantizeInt8(df: DataFrame, id: String, vec: String): DataFrame =
    df.select(col(id),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__v"))
      .withColumn("scale",
        expr("array_max(transform(__v, x -> abs(x))) / 127.0D"))
      .withColumn("qvec", when(col("scale") > 0, expr(
        """transform(__v, x ->
          |  CAST(bround(CAST(x / scale AS DECIMAL(28,12)), 0) AS INT))"""
          .stripMargin))
        .otherwise(expr("transform(__v, x -> 0)")))
      .select(col(id), round(col("scale"), 6).as("scale"), col("qvec"))

  /** Matryoshka-style truncation: keep the FIRST `k` dimensions and
    * L2-renormalize — the standard way to trade recall for a
    * k/d-times smaller index when embeddings were trained with
    * nested (matryoshka) objectives. Emits the truncated-prefix norm
    * (the informativeness signal of the kept prefix) and the
    * renormalized vector. Pure row-local projection — no shuffle,
    * scales with the scan.
    */
  def truncateRenorm(df: DataFrame, id: String, vec: String,
      k: Int): DataFrame =
    df.select(col(id), expr(
        s"transform(slice($vec, 1, $k), x -> CAST(x AS DOUBLE))")
        .as("__v"))
      .withColumn("__norm",
        expr("sqrt(aggregate(__v, 0D, (acc, x) -> acc + x * x))"))
      .select(col(id), round(col("__norm"), 6).as("tnorm"),
        when(col("__norm") > 0,
          expr("transform(__v, x -> round(x / __norm, 6))"))
          .otherwise(expr("transform(__v, x -> 0.0D)")).as("tvec"))

  /** LSH similarity join: cosine scored only within buckets.
    *
    * Shaped as ONE shuffle — groupBy(bucket) collecting (id, vec,
    * norm) members, then within-bucket pairs by expression — instead
    * of a self-join: a self-join of the derived bucketed frame gets no
    * exchange reuse (the two legs project differently), so it would
    * compute the bucket projection and shuffle the corpus twice.
    * Norms are staged per MEMBER (not per pair); the per-pair work is
    * one dot product. Per-bucket state is its member list — bounded
    * by occupancy ≈ n / 2^planes, so `planes` must scale with the
    * corpus (the caller-visible recall/cost knob), exactly like any
    * LSH join at 100 TB.
    */
  /** Embedding-cosine near-dup dedup: verified sim-join pairs at
    * cosine ≥ τ, drop the higher id of each pair, keep survivors —
    * the embedding-space analogue of the text near-dup flow. LSH
    * bucketing bounds the candidate set (recall is governed by
    * `planes`, the standard trade at corpus scale; the oracle mirrors
    * the same buckets so results are exact w.r.t. the declared
    * algorithm).
    */
  def dedupByCosine(df: DataFrame, id: String, vec: String,
      planes: Int, minSim: Double,
      maxBucket: Int = 4096): DataFrame = {
    val drops = lshSimilarityJoin(df, id, vec, planes, minSim, maxBucket)
      .select(col("id2").as(id)).distinct()
    df.select(col(id)).join(drops, Seq(id), "left_anti")
  }

  /** `maxBucket` caps each bucket's member list (lowest ids kept, the
    * same deterministic rule as Dedup.candidatePairs): a hot bucket in
    * a skewed embedding corpus would otherwise emit k²/2 pairs inside
    * one task. Recall on the dropped tail is governed by `planes`,
    * like every other occupancy knob in this file.
    */
  def lshSimilarityJoin(df: DataFrame, id: String, vec: String,
      planes: Int = 8, minSim: Double = 0.0,
      maxBucket: Int = 4096): DataFrame = {
    val members = df.select(
      lshBucketExpr(vec, planes).as("bucket"),
      col(id).as("__id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__v"))
      .withColumn("__n", sqrt(dot(col("__v"), col("__v"))))
    members
      .groupBy(col("bucket"))
      .agg(slice(sort_array(collect_list(
        struct(col("__id"), col("__v"), col("__n")))), 1, maxBucket)
        .as("__ms"))
      .filter(size(col("__ms")) > 1)
      // the pair lambda only PAIRS members — the 64-dim dot product
      // happens AFTER the explode through the native codegen'd
      // [[dot]] expression. Computing the cosine inside the HOF
      // lambda (the previous form) ran a 64-step interpreted
      // zip_with/aggregate fold per candidate pair, which dominated
      // the whole sim-join family; the native dot is spec-pinned
      // bit-identical to that fold, so values are unchanged.
      .select(col("bucket"), explode(expr(
        s"""flatten(transform(sequence(1, size(__ms) - 1),
            i -> transform(slice(__ms, i + 1, size(__ms) - i),
                 y -> named_struct(
                   'x', element_at(__ms, i), 'y', y))))"""))
        .as("p"))
      .select(col("bucket"),
        col("p.x.__id").as("id1"), col("p.y.__id").as("id2"),
        round(dot(col("p.x.__v"), col("p.y.__v")) /
          (col("p.x.__n") * col("p.y.__n")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Margin-based BITEXT MINING (Artetxe & Schwenk 2019 ratio
    * margin; the CCMatrix/LASER recipe): find cross-side embedding
    * pairs whose cosine stands OUT relative to each end's own
    * neighborhood — margin(x, y) = cos(x, y) / ((mean top-k NN
    * cos of x + mean top-k NN cos of y) / 2). Raw-cosine thresholds
    * fail on hubness (some vectors are near everything); the margin
    * normalizes by local density, which is what made mined bitext
    * usable as training data.
    *
    * Candidates come from [[lshSimilarityJoin]] (bucketed, capped —
    * never n²); pairs repeated across buckets collapse first. The
    * NN-mean denominators are computed from the SAME candidate set
    * (the standard approximation at scale — exact k-NN would need
    * the search this operator replaces). After the 6dp cosine,
    * everything is EXACT integer ppm: sim_ppm from a decimal cast,
    * means as `sum DIV count`, margin as `sim·2e6 DIV (ma + mb)` —
    * bit-identical across engines. Emits each side-0 id's best
    * match by margin (deterministic tiebreak) above
    * `minMarginPpm`.
    */
  def bitextMine(df: DataFrame, id: String, vec: String,
      side: String, planes: Int = 6, k: Int = 4,
      minMarginPpm: Long = 1050000L, maxBucket: Int = 4096)
      : DataFrame = {
    val sides = df.select(col(id).as("__sid"), col(side).as("__side"))
    val cands = lshSimilarityJoin(df, id, vec, planes, 0.0, maxBucket)
      .groupBy(col("id1"), col("id2")).agg(max(col("sim")).as("sim"))
    val lab = cands
      .join(sides.select(col("__sid").as("id1"),
        col("__side").as("__s1")), "id1")
      .join(sides.select(col("__sid").as("id2"),
        col("__side").as("__s2")), "id2")
      .filter(col("__s1") =!= col("__s2"))
      .select(
        when(col("__s1") === 0, col("id1")).otherwise(col("id2"))
          .as("a"),
        when(col("__s1") === 0, col("id2")).otherwise(col("id1"))
          .as("b"),
        expr("CAST(CAST(sim AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
          .as("sim_ppm"))
    def nnMean(key: String, other: String, out: String) = {
      val w = Window.partitionBy(col(key))
        .orderBy(col("sim_ppm").desc, col(other).asc)
      lab.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .groupBy(col(key))
        .agg(expr("sum(sim_ppm) DIV count(1)").as(out))
    }
    val best = Window.partitionBy(col("a"))
      .orderBy(col("margin_ppm").desc, col("b").asc)
    lab.join(nnMean("a", "b", "nn_a_ppm"), Seq("a"))
      .join(nnMean("b", "a", "nn_b_ppm"), Seq("b"))
      .withColumn("margin_ppm", expr(
        "sim_ppm * 2000000L DIV greatest(nn_a_ppm + nn_b_ppm, 1L)"))
      .withColumn("__bk", row_number().over(best))
      .filter(col("__bk") === 1 && col("margin_ppm") >= minMarginPpm)
      .select(col("a"), col("b"), col("sim_ppm"), col("nn_a_ppm"),
        col("nn_b_ppm"), col("margin_ppm"))
  }

  /** SemDedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): CLUSTER-then-
    * prune — embeddings are Lloyd-clustered ([[kmeansCentroids]] +
    * [[ivfAssign]]) and pairwise cosines are evaluated only WITHIN
    * each fitted cell; a member with an earlier-id cell-mate at
    * cosine ≥ `minCos` is marked a semantic duplicate
    * (first-occurrence-wins — the paper's greedy ε-ball sweep
    * relaxed to earlier-neighbor dominance, a pure pairwise
    * predicate). [[dedupByCosine]] is the LSH-bucketed variant of
    * this flow; SemDedup trades hash collisions for LEARNED cells —
    * candidates are semantic neighbors by construction, which is
    * what makes the prune effective at a loose threshold.
    * Scale shape: centroids broadcast (assignment is one narrow
    * corpus pass), members aggregate per cell with the deterministic
    * `maxCell` lowest-id cap (the [[lshSimilarityJoin]] rule) so a
    * hot cell cannot emit k²/2 pairs, and `cells` scales with the
    * corpus (k ∝ n in the paper) keeping occupancy bounded.
    *
    * `cells <= 0` (the default) derives k = max(16, ceil(sqrt(n)))
    * from a corpus count — the committed sf1 k-scaling study's rule:
    * a FIXED k goes quadratic at 10x data (229 s at k=16/sf1 vs 37 s
    * at k=500, <2% change in the drop set), so auto-scaling is the
    * scale-safe default and a fixed k must be an explicit opt-in
    * (the oracle pins cells=16 for determinism). Note `maxCell` is a
    * pair-explosion guard, not a correctness knob: members of an
    * overfull cell beyond the cap are EXEMPT from dedup (always
    * kept), which is another reason k must grow with n.
    *
    * Zero-norm embeddings have no defined cosine; they are excluded
    * from pair generation (never dropped, never drop others) rather
    * than relying on NaN (Spark) / NULL-division (DuckDB) comparison
    * semantics that only coincidentally agree on keep.
    */
  def autoCells(n: Long): Int =
    math.max(16L, math.min(Int.MaxValue.toLong,
      math.ceil(math.sqrt(math.max(n, 0L).toDouble)).toLong)).toInt

  def semDedup(df: DataFrame, id: String, vec: String,
      cells: Int = 0, iters: Int = 2, minCos: Double = 0.35,
      maxCell: Int = 4096): DataFrame = {
    // Split zero-norm vectors out BEFORE clustering: under ANSI mode
    // a zero vector crashes cosineExpr (DIVIDE_BY_ZERO) inside
    // ivfAssign/kmeans, and a zero SEED would poison its whole cell.
    // They come back as always-kept rows with cell = -1. Seeding is
    // rank-based over the remaining NON-ZERO rows (seedCentroids
    // takes the k smallest ids present), so zero vectors at low ids
    // cannot under-seed the cell count.
    val dv = expr(s"transform($vec, x -> CAST(x AS DOUBLE))")
    val normed = df.withColumn("__n0", sqrt(dot(dv, dv)))
    val nz = normed.filter(col("__n0") > 0).drop("__n0")
    val zeros = normed.filter(!(col("__n0") > 0))
      .select(col(id), lit(-1L).as("cell"), lit(true).as("keep"))
    val k = if (cells > 0) cells else autoCells(nz.count())
    val cents = kmeansCentroids(nz, id, vec, k, iters)
    val member = ivfAssign(nz, id, vec, cents)
      .join(nz.select(col(id), expr(
        s"transform($vec, x -> CAST(x AS DOUBLE))").as("__v")), Seq(id))
      .select(col(id).as("__id"), col("cell"), col("__v"))
      .withColumn("__n", sqrt(dot(col("__v"), col("__v"))))
    // pair-then-native-dot, the [[lshSimilarityJoin]] restructure:
    // the lambda only pairs cell-mates; the cosine runs codegen'd
    // after the explode (bit-identical to the HOF fold, spec-pinned)
    val drops = member
      .groupBy(col("cell"))
      .agg(slice(sort_array(collect_list(
        struct(col("__id"), col("__v"), col("__n")))), 1, maxCell)
        .as("__ms"))
      .filter(size(col("__ms")) > 1)
      .select(explode(expr(
        s"""flatten(transform(sequence(1, size(__ms) - 1),
            i -> transform(slice(__ms, i + 1, size(__ms) - i),
                 y -> named_struct(
                   'x', element_at(__ms, i), 'y', y))))"""))
        .as("p"))
      .select(col("p.y.__id").as("__dup_id"),
        round(dot(col("p.x.__v"), col("p.y.__v")) /
          (col("p.x.__n") * col("p.y.__n")), 6).as("__sim"))
      .filter(col("__sim") >= minCos)
      .select(col("__dup_id")).distinct()
    member
      .join(drops, col("__id") === col("__dup_id"), "left")
      .select(col("__id").as(id), col("cell"),
        col("__dup_id").isNull.as("keep"))
      .unionByName(zeros)
  }

  /** Semantic near-dup CLUSTERING over embeddings: transitive closure
    * of the LSH-bucketed cosine similarity graph. Where
    * [[dedupByCosine]] greedily drops the higher id of each similar
    * pair, this labels every vector with the minimum id reachable
    * through sim >= minSim relations — so a chain A~B~C (A not
    * directly similar to C) lands in ONE cluster and a keep-one-per-
    * cluster policy sees it whole, matching the text-side
    * [[Dedup.dedupClusters]] semantics on the embedding side.
    * Scale shape: edges come from the bucketed sim-join (never
    * all-pairs; `maxBucket` caps hot buckets), and the component
    * labeling is the shared pointer-jumping loop — O(log diameter)
    * rounds over an edge list orders of magnitude below corpus size.
    */
  def embedClusters(df: DataFrame, id: String, vec: String,
      planes: Int = 8, minSim: Double = 0.0): DataFrame = {
    val edges = lshSimilarityJoin(df, id, vec, planes, minSim)
      .select(col("id1"), col("id2"))
    Dedup.connectedComponents(edges, df.select(col(id)), id)
  }

  /** PageRank over the LSH-bucketed cosine similarity graph: the
    * authority/centrality scores that corpus-curation recipes use to
    * weight well-connected (canonical, widely-duplicated-near-miss)
    * documents — computed with an ALL-INTEGER contract so the result
    * is bit-identical across engines with no float-summation-order
    * caveat anywhere: ranks are parts-per-million longs, each node
    * starts at 1_000_000, and one power-iteration step is
    *
    *   pr'(v) = 150_000 + (850 · Σ_{u∈N(v)} (pr(u) div deg(u))) div 1000
    *
    * — the classic 0.15/0.85 damping in ppm with truncating integer
    * division (operands always non-negative, so Spark `div`, Scala
    * `/`, and DuckDB `//` coincide). Dangling nodes (no similarity
    * neighbors) keep the 150_000 teleport floor; mass truncated by
    * the divisions is dropped, not redistributed (documented
    * divergence from the stochastic-matrix formulation — this is a
    * RANKING signal, and the contract buys exactness).
    *
    * Scale shape: edges come from the bucketed sim-join (never
    * all-pairs, `maxBucket`-capped), the adjacency+degree frame is
    * built once and persisted across the `iters` (fixed, small)
    * power steps, and each step is one join + one map-side-combined
    * aggregation on the edge list — the standard distributed
    * PageRank shape, edge-partitioned, no driver-side state. At a
    * 100 TB corpus you would checkpoint `ranks` every few
    * iterations to cut lineage; at iters=5 the single composed plan
    * is fine.
    */
  def pagerankSim(df: DataFrame, id: String, vec: String,
      planes: Int = 8, minSim: Double = 0.0, iters: Int = 5)
      : DataFrame = {
    // persist + materialize the sim-join FIRST: adj references it
    // twice (the union's two directions) and deg a further two times
    // through adj — without the cut, one action computes the
    // bucketed-cosine explode ~4x (measured 26.6x wall at 10x data;
    // 5.5x with the cut, on a 101x-larger candidate set)
    val edges = lshSimilarityJoin(df, id, vec, planes, minSim)
      .select(col("id1"), col("id2")).persist()
    edges.count()
    val adj = edges.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(
        edges.select(col("id2").as("src"), col("id1").as("dst")))
    val deg = adj.groupBy("src").agg(count(lit(1)).as("deg"))
    // one (src, dst, deg) frame reused by every power step
    val adjDeg = adj.join(deg, "src").persist()
    adjDeg.count()
    val nodes = df.select(col(id).cast("long").as("node"))
    var ranks = nodes.withColumn("pr", lit(1000000L))
    for (_ <- 1 to iters) {
      val sums = adjDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("pr div deg").as("share"))
        .groupBy("dst").agg(sum("share").as("t"))
      ranks = nodes.join(sums, col("node") === col("dst"), "left")
        .select(col("node"), expr(
          "CAST(150000 + (850 * coalesce(t, CAST(0 AS BIGINT)))" +
            " div 1000 AS BIGINT)").as("pr"))
    }
    ranks.join(deg, col("node") === col("src"), "left")
      .select(col("node").as(id),
        coalesce(col("deg"), lit(0L)).as("deg"), col("pr"))
  }

  /** Top-principal-direction projection (uncentered PCA / top
    * singular direction) over an embedding corpus — the standard
    * embedding-analytics primitive for drift dashboards, coarse
    * 1-D curriculum ordering, and explained-variance telemetry.
    * Bit-reproducible by construction:
    *
    *  1. Each coordinate is quantized x·2^18 → BIGINT via the
    *     DECIMAL(28,12) `bround`/`round_even` rule [[quantizeInt8]]
    *     established (×2^18 is a power of two, so the double product
    *     is EXACT and the decimal tie-round is engine-identical).
    *  2. The 64×64 second-moment (Gram) matrix is summed in
    *     DECIMAL(38,0) — exact integer arithmetic, order-independent
    *     (products ≤ 2^42; exact up to ~2^20 rows at this scale —
    *     at a larger corpus widen the quantization step).
    *  3. The 2080-cell upper triangle is collected (the DSIR-fit
    *     small-collect pattern), each cell cast to double once
    *     (correctly rounded in both engines), and `iters` power
    *     steps run driver-side from v0 = 1/8·1 with LEFT-FOLD sums
    *     in index order and IEEE sqrt — every step engine-exact, so
    *     the DuckDB oracle replays the iteration as unrolled CTEs
    *     with ordered list_reduce folds.
    *  4. Every document's pc1 score is the native fixed-order [[dot]]
    *     against the fitted direction riding the plan as a literal.
    *
    * The CONTRACT is "`iters` power steps from v0", not "the
    * converged eigenvector" — deterministic whether or not the
    * iteration has converged; uncentered (Gram, not covariance)
    * avoids the mean-division rounding a centered fit would need.
    * Scale shape: one narrow corpus pass for the moment sums
    * (map-side combined to 2080 groups), a 2080-row collect, one
    * row-local projection pass — the two-pass fit/apply shape every
    * fitted operator here shares.
    */
  def pcaProject(df: DataFrame, id: String, vec: String,
      iters: Int = 10): DataFrame = {
    val dim = 64
    val q = df.select(
      expr(s"""transform($vec, x -> CAST(bround(CAST(
           CAST(x AS DOUBLE) * 262144.0D AS DECIMAL(28,12)), 0)
           AS BIGINT))""").as("qv"))
    val cells = q.select(explode(expr(
        s"""flatten(transform(sequence(0, ${dim - 1}), i ->
             transform(sequence(i, ${dim - 1}), j ->
               named_struct('i', i, 'j', j,
                 'p', CAST(element_at(qv, i + 1) *
                      element_at(qv, j + 1) AS DECIMAL(38,0))))))"""))
        .as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.p")).as("m"))
      .collect() // 2080 rows — the sanctioned fit-collect pattern
    val mat = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val d = r.getDecimal(2).doubleValue()
      mat(i)(j) = d; mat(j)(i) = d
    }
    var v = Array.fill(dim)(0.125)
    for (_ <- 1 to iters) {
      // left folds in index order — the oracle's ordered list_reduce
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => mat(i)(j) * v(j)).reduceLeft(_ + _))
      val norm = math.sqrt(w.map(x => x * x).reduceLeft(_ + _))
      v = w.map(_ / norm)
    }
    val vCol = array(v.map(lit).toIndexedSeq: _*)
    df.select(col(id).cast("long").as("vec_id"),
      dot(expr(s"transform($vec, x -> CAST(x AS DOUBLE))"), vCol)
        .as("pc1"))
  }

  // ---- Product quantization (PQ) ----------------------------------
  // The fourth ANN family member next to brute-force, LSH, and IVF:
  // split each vector into `m` subspaces, k-means each subspace
  // independently, store each vector as m small codes (m bytes at
  // k<=256 — a 256× memory cut on a 64-dim float vector), and answer
  // queries via asymmetric distance computation (ADC): per query, a
  // (m × k) table of exact subspace distances, each candidate scored
  // by m table lookups instead of a 64-dim dot product.

  /** Exact left-fold squared-L2 between two array<double> columns —
    * fixed evaluation order, bit-reproducible across engines.
    * Native ([[SqDistExpr]]), same contract as [[dot]].
    */
  private def sqDistExpr(a: String, b: String): Column =
    VectorColumns.sqDist(col(a), col(b))

  /** One row per (id, subspace): the vector's `subDim`-wide slice.
    * Narrow explode — rows scale with m, never corpus² — and every
    * subspace travels together with its vector row, so downstream
    * per-subspace work needs no extra shuffle.
    */
  def subVectors(df: DataFrame, id: String, vec: String, m: Int,
      subDim: Int): DataFrame =
    df.select(col(id),
        expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__v"))
      .select(col(id), explode(expr(
        s"""transform(sequence(0, ${m - 1}), j ->
            struct(j AS j, slice(__v, j * $subDim + 1, $subDim) AS sv))"""))
        .as("__s"))
      .select(col(id), col("__s.j").as("subspace"), col("__s.sv").as("sv"))

  /** Nearest PQ cell per (vector, subspace): broadcast the (m × k)
    * centroid table, argmin squared-L2 with ties to the LOWER cell.
    * The max_by-free aggregation shape mirrors [[ivfAssign]]: scored
    * candidates for one (vector, subspace) come from one input row,
    * so the map-side combine collapses them before any exchange.
    */
  def pqAssign(sub: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = sub.join(broadcast(centroids), Seq("subspace"))
      .withColumn("__d", sqDistExpr("sv", "cvec"))
    scored.groupBy(col(sub.columns.head), col("subspace"))
      .agg(min_by(col("cell"), struct(col("__d"), col("cell")))
        .as("cell"))
  }

  /** Deterministic per-subspace Lloyd's fit of the PQ codebook
    * (seeds = subvectors of the first k ids, component sums routed
    * through decimal — the same order-independence contract as
    * [[kmeansCentroids]]). Returns (subspace, cell, cvec). Per
    * iteration: one broadcast assign pass over the subvector frame +
    * one (subspace, cell, dim)-keyed aggregation, both map-side
    * combining; all m sub-codebooks fit in the SAME pass — m never
    * multiplies the number of jobs.
    */
  def pqCentroids(df: DataFrame, id: String, vec: String, m: Int,
      subDim: Int, k: Int, iters: Int): DataFrame = {
    val sub = subVectors(df, id, vec, m, subDim)
    var cents = sub.filter(col(id) < k)
      .select(col("subspace"), col(id).cast("long").as("cell"),
        col("sv").as("cvec"))
    for (_ <- 1 to iters) {
      val assigned = pqAssign(sub, cents)
        .join(sub, Seq(id, "subspace"))
      val means = assigned
        .select(col("subspace"), col("cell"),
          posexplode(col("sv")).as(Seq("__i", "__x")))
        .groupBy(col("subspace"), col("cell"), col("__i"))
        .agg((sum(col("__x").cast("decimal(28,10)")).cast("double")
          / count(lit(1))).as("__m"))
      val refreshed = means.groupBy(col("subspace"), col("cell"))
        .agg(expr(
          "transform(sort_array(collect_list(struct(__i, __m))), s -> s.__m)")
          .as("__cv"))
      cents = cents
        .join(refreshed, Seq("subspace", "cell"), "left")
        .select(col("subspace"), col("cell"),
          coalesce(col("__cv"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    cents
  }

  /** PQ codes: each vector as an m-long array of cell ids (subspace
    * order). This is the stored representation — the full vector can
    * be dropped after encoding.
    */
  def pqEncode(df: DataFrame, id: String, vec: String,
      centroids: DataFrame, m: Int, subDim: Int): DataFrame =
    pqAssign(subVectors(df, id, vec, m, subDim), centroids)
      .groupBy(col(id))
      .agg(expr(
        "transform(sort_array(collect_list(struct(subspace, cell))), s -> s.cell)")
        .as("codes"))

  /** PQ top-k via ADC. Per query: an exact (m × k) distance table to
    * every subspace centroid (tiny — computed on the broadcast
    * query×centroid cross), shipped as a nested array. Each corpus
    * vector is scored by m array lookups over its codes, summed in
    * fixed subspace order (bit-reproducible). The corpus is never
    * shuffled — codes are scored in place; only the per-query top-k
    * window moves data, and rank-pushdown (WindowGroupLimit) bounds
    * it at k rows per query per partition.
    */
  /** Per-query ADC distance tables. The GENERAL table is a subspace
    * -> (cell -> distance) MAP: an array lookup by `codes[j] + 1`
    * silently misaligns whenever cell ids are sparse or not 0-based
    * (externally-built centroids). Both map levels are tiny (m and k
    * entries), so the linear-scan element_at costs m+k ops per
    * subspace — correct for ANY id space. When the cell ids are
    * verifiably DENSE 0-based ([[cellsAreDense]] — the common case;
    * [[pqCentroids]] always produces 0..k-1), the per-candidate
    * lookups switch to the O(1) indexed-array form
    * ([[adcTablesDense]]): the centroid frame is broadcast-scale, so
    * the density check is one tiny driver action at plan-build time,
    * and both paths sum the SAME distances in the same j = 1..m
    * order — bit-identical `adist` either way (spec-pinned).
    */
  private def adcTables(queries: DataFrame, id: String, vec: String,
      centroids: DataFrame, m: Int, subDim: Int): DataFrame =
    subVectors(queries, id, vec, m, subDim)
      .withColumnRenamed(id, "query_id")
      .join(broadcast(centroids), Seq("subspace"))
      .withColumn("__d", sqDistExpr("sv", "cvec"))
      .groupBy(col("query_id"), col("subspace"))
      .agg(expr(
        "map_from_entries(sort_array(collect_list(struct(cell, __d))))")
        .as("__row"))
      .groupBy(col("query_id"))
      .agg(expr(
        "map_from_entries(collect_list(struct(subspace, __row)))")
        .as("dtab"))

  /** Dense-id fast path of [[adcTables]]: subspace-ordered array of
    * cell-ordered distance arrays — `dtab[j][codes[j] + 1]` is two
    * O(1) array reads. Only valid when every subspace's cell ids are
    * exactly 0..k-1 (callers gate on [[cellsAreDense]]).
    */
  private def adcTablesDense(queries: DataFrame, id: String,
      vec: String, centroids: DataFrame, m: Int, subDim: Int)
      : DataFrame =
    subVectors(queries, id, vec, m, subDim)
      .withColumnRenamed(id, "query_id")
      .join(broadcast(centroids), Seq("subspace"))
      .withColumn("__d", sqDistExpr("sv", "cvec"))
      .groupBy(col("query_id"), col("subspace"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(cell, __d))), s -> s.__d)")
        .as("__row"))
      .groupBy(col("query_id"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(subspace, __row))), s -> s.__row)")
        .as("dtab"))

  /** True iff every subspace's cell ids are exactly 0..n-1. One tiny
    * aggregate over the broadcast-scale centroid frame (m·k rows).
    */
  private def cellsAreDense(centroids: DataFrame): Boolean = {
    val stats = centroids.groupBy(col("subspace"))
      .agg(min(col("cell").cast("long")).as("mn"),
        max(col("cell").cast("long")).as("mx"),
        count(lit(1)).as("n"),
        countDistinct(col("cell")).as("nd"))
      .collect()
    stats.nonEmpty && stats.forall { r =>
      val n = r.getLong(r.fieldIndex("n"))
      r.getLong(r.fieldIndex("mn")) == 0L &&
        r.getLong(r.fieldIndex("mx")) == n - 1 &&
        r.getLong(r.fieldIndex("nd")) == n
    }
  }

  /** The ADC distance sum for whichever table form `dense` selected.
    * Both iterate j = 1..m (fixed subspace order) over the same
    * distance values — bit-reproducible and path-independent.
    */
  private def adcSumExpr(m: Int, dense: Boolean): Column =
    if (dense) expr(
      s"""aggregate(sequence(1, $m), 0D, (acc, j) ->
          acc + element_at(element_at(dtab, j),
                CAST(element_at(codes, j) + 1 AS INT)))""")
    else expr(
      s"""aggregate(sequence(1, $m), 0D, (acc, j) ->
          acc + element_at(element_at(dtab, j - 1),
                element_at(codes, j)))""")

  def pqTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, centroids: DataFrame, m: Int, subDim: Int,
      k: Int): DataFrame = {
    // The distance sum iterates j = 1..m, so it stays in fixed
    // subspace order (bit-reproducible).
    val dense = cellsAreDense(centroids)
    val dtab =
      if (dense) adcTablesDense(queries, id, vec, centroids, m, subDim)
      else adcTables(queries, id, vec, centroids, m, subDim)
    val codes = pqEncode(corpus, id, vec, centroids, m, subDim)
      .withColumnRenamed(id, "cand_id")
    val scored = codes.crossJoin(broadcast(dtab))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("adist", round(adcSumExpr(m, dense), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "adist", "rank")
  }

  /** Two-stage ANN serving path: PQ/ADC shortlist → EXACT re-rank.
    * Stage 1 scores the whole corpus by quantized distance and keeps
    * a `shortlist`-sized candidate set per query ([[pqTopK]] — the
    * corpus is never shuffled, codes score in place); stage 2 fetches
    * only the shortlist's full vectors (a key join, `shortlist` ×
    * queries rows) and re-ranks by exact cosine, returning the final
    * `k`. This is the standard recall-repair architecture: the cheap
    * quantized scan bounds the candidate set, the exact pass fixes
    * its ranking errors, and full vectors are touched for a
    * vanishing fraction of the corpus.
    */
  def pqRerank(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, centroids: DataFrame, m: Int, subDim: Int,
      shortlist: Int, k: Int): DataFrame = {
    val short = pqTopK(corpus, queries, id, vec, centroids, m, subDim,
        shortlist)
      .select(col("query_id"), col("cand_id"))
    val cv = corpus.select(col(id).as("cand_id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__cv"))
    val qv = queries.select(col(id).as("query_id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__qv"))
    val scored = short
      .join(cv, Seq("cand_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("sim", round(cosineExpr("__qv", "__cv"), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "sim", "rank")
  }

  /** The composed IVF+PQ index (the classic FAISS `IVFx,PQy` shape):
    * the coarse IVF level restricts each query to its `nprobe`
    * nearest cells, and only the vectors IN those cells are scored —
    * by quantized ADC distance over their stored codes, never their
    * full vectors. Versus [[pqTopK]] (which ADC-scans the whole
    * corpus) the candidate set shrinks by ~cells/nprobe; versus
    * [[ivfTopK]] (exact cosine within probed cells) the per-candidate
    * cost drops from a d-dim dot product to m map lookups. At 100 TB
    * this is the only memory-feasible combination: codes are ~d/8
    * bytes per vector and full vectors are never shuffled or fetched.
    * Probe maps and ADC tables broadcast (queries × nprobe and
    * queries × m × k — tiny); the corpus-side frame carries only
    * (cell, codes).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, ivfCentroids: DataFrame, pqCentroids: DataFrame,
      m: Int, subDim: Int, k: Int, nprobe: Int = 2): DataFrame = {
    val q = queries.select(col(id).as("query_id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__qv"))
    val probes = q.crossJoin(broadcast(ivfCentroids))
      .withColumn("__sim", cosineExpr("__qv", "cvec"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("cell").desc)
    val probed = probes.withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cell"))
    val dense = cellsAreDense(pqCentroids)
    val dtab =
      if (dense)
        adcTablesDense(queries, id, vec, pqCentroids, m, subDim)
      else adcTables(queries, id, vec, pqCentroids, m, subDim)
    val cands = ivfAssign(corpus, id, vec, ivfCentroids)
      .join(pqEncode(corpus, id, vec, pqCentroids, m, subDim), Seq(id))
      .select(col(id).as("cand_id"), col("cell"), col("codes"))
    val scored = cands.join(broadcast(probed), Seq("cell"))
      .join(broadcast(dtab), Seq("query_id"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("adist", round(adcSumExpr(m, dense), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "adist", "rank")
  }

  /** The [[planeCoef]] LCG coefficient as a Scala double — the exact
    * value the SQL expression produces (integer ops exact, one
    * correctly-rounded division, exact subtraction), so Spark-side
    * literals and the DuckDB mirror agree bit-for-bit.
    */
  def planeCoefValue(j: Int, i: Int): Double =
    (((j * 64 + i).toLong * 2654435761L) % 2147483647L).toDouble /
      2147483647.0 - 0.5

  /** Johnson–Lindenstrauss random projection to `dims` dimensions
    * using the SAME deterministic LCG hyperplanes as the LSH family
    * (here keeping the real-valued dots instead of sign bits) — the
    * cheap-ANN path: distances survive approximately, index cost
    * drops 4×. Each output coordinate is a native fixed-order dot
    * against a literal coefficient array — codegen'd, row-local,
    * broadcast-free.
    */
  def rpProject(df: DataFrame, id: String, vec: String,
      dims: Int = 16): DataFrame = {
    val v = expr(s"transform($vec, x -> CAST(x AS DOUBLE))")
    val pcols = (0 until dims).map { j =>
      dot(v, array((0 until 64).map(i =>
        lit(planeCoefValue(j, i))): _*))
    }
    df.select(col(id), array(pcols: _*).as("pvec"))
  }

  /** Declared recall floor (ppm) for the planted-cluster telemetry
    * queries: on [[plantedEmbeddings]] data, every query's exact
    * top-5 is its 5 cluster-mates by construction, and both the JL
    * projection and the IVF probe must recover at least 4 of 5.
    * Spec-pinned; the oracle queries report the actual per-query
    * number (1e6 on the committed fixtures).
    */
  val RecallFloorPpm = 800000L

  /** Deterministic PLANTED-cluster embedding derivation — the recall
    * -telemetry fixture. The corpus `embeddings` table is
    * near-isotropic synthetic noise, so an "exact top-k" of it is
    * itself noise and recall against it validates plumbing, not
    * quality (the round-13 honest-caveat finding). This derives,
    * from ids alone, a frame with RECOVERABLE structure:
    * consecutive ids form micro-clusters of `clusterSize` (default
    * 6 = one query + exactly k=5 mates), each cluster at a
    * hash-derived centroid (component range ±10, inter-centroid
    * cosine ≈ 0) plus integer noise of ±1e-4 — so every query's
    * exact cosine top-5 IS its cluster-mates by construction
    * (mates round-6 to cos 1.000000, everything else is far), and
    * any index worth shipping recovers them. All-integer
    * arithmetic with ONE final constant division: bit-identical
    * across engines at any SF, no stored fixture needed.
    */
  def plantedEmbeddings(df: DataFrame, id: String,
      clusterSize: Int = 6, dim: Int = 64): DataFrame =
    df.select(col(id).cast("long").as("vec_id"))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${dim - 1}), i ->
           |  CAST(((vec_id DIV $clusterSize * 2654435761L
           |           + i * 40503L) % 2001L - 1000L) * 1000L
           |       + (vec_id * 1103515245L + i * 12345L) % 21L - 10L
           |       AS DOUBLE) / 100000.0D)""".stripMargin))

  /** 1-bit (sign) quantization: a 64-dim embedding packs into ONE
    * BIGINT (bit i set ⇔ component i > 0) — a 32× memory cut over
    * float32 and the aggressive end of the quantization ladder
    * ([[quantizeInt8]] is the 4× rung). At 100 TB this is the
    * difference between an index that fits executor memory and one
    * that doesn't; Hamming distance over the packed words
    * ([[hammingTopK]]) is a single xor+popcount per candidate.
    * All-integer: bit-identical on both engines (the shiftleft/or
    * fold runs in index order; bit 63 lands in the BIGINT sign bit
    * identically).
    */
  def binaryQuantize(df: DataFrame, id: String, vec: String,
      dim: Int = 64): DataFrame = {
    // One packed word holds at most 64 sign bits; a vector SHORTER
    // than `dim` would read past its end — null bits (silent wrong
    // signatures) in non-ANSI mode, a confusing ANSI throw otherwise.
    // Fail loudly with the actual size instead; hammingTopK /
    // hammingRerank inherit the guard.
    require(dim >= 1 && dim <= 64,
      s"binaryQuantize: dim must be in [1, 64], got $dim")
    df.select(col(id),
      expr(
        s"""CASE WHEN size($vec) >= $dim THEN
           |  aggregate(sequence(0, ${dim - 1}), CAST(0 AS BIGINT),
           |    (acc, i) -> acc | CASE
           |      WHEN CAST(element_at($vec, i + 1) AS DOUBLE) > 0D
           |      THEN shiftleft(CAST(1 AS BIGINT), i)
           |      ELSE CAST(0 AS BIGINT) END)
           |ELSE raise_error(concat('binaryQuantize: vector has ',
           |  CAST(size($vec) AS STRING), ' dims, need >= $dim'))
           |END""".stripMargin)
        .as("sig"))
  }

  /** Hamming top-k over [[binaryQuantize]]d signatures: per query,
    * the k candidates with the fewest differing sign bits
    * (bit_count(xor), distance asc, id-asc ties), self excluded.
    * Scale shape: the query signatures broadcast; the corpus is one
    * scan emitting (query, cand, dist) with WindowGroupLimit
    * truncating to k per query map-side — the brute-force-cosine
    * plan with the per-candidate cost cut from 64 multiplies to one
    * xor+popcount and the scan payload cut 32×.
    */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    val c = binaryQuantize(corpus, id, vec)
      .select(col(id).cast("long").as("cand_id"),
        col("sig").as("__cs"))
    val q = binaryQuantize(queries, id, vec)
      .select(col(id).cast("long").as("query_id"),
        col("sig").as("__qs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("cand_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("dist",
        expr("CAST(bit_count(__cs ^ __qs) AS BIGINT)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "dist", "rank")
  }

  /** The binary-quantization SERVING path ([[pqRerank]]'s twin on
    * the 1-bit rung): a Hamming top-`shortlist` scan over the packed
    * signatures (one xor+popcount per candidate, 32×-smaller scan
    * payload) followed by exact cosine re-rank of just the shortlist
    * — full vectors are fetched for O(queries × shortlist) rows,
    * never scanned corpus-wide.
    */
  def hammingRerank(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k && k >= 1, "need shortlist >= k >= 1")
    val short = hammingTopK(corpus, queries, id, vec, shortlist)
      .select(col("query_id"), col("cand_id"))
    val cv = corpus.select(col(id).cast("long").as("cand_id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__cv"))
    val qv = queries.select(col(id).cast("long").as("query_id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__qv"))
    val scored = short
      .join(cv, Seq("cand_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("sim", round(cosineExpr("__qv", "__cv"), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "sim", "rank")
  }

  /** Projection-quality telemetry: recall@k of brute-force cosine
    * top-k in the [[rpProject]]ed space against the exact 64-d top-k
    * — the number that decides whether the 4×-cheaper index is good
    * enough. Pure-integer output (hits, recall ppm).
    */
  def rpRecall(df: DataFrame, id: String, vec: String,
      k: Int = 5, dims: Int = 16): DataFrame = {
    val q = df.filter(col(id) < 8)
    val exact = bruteForceTopK(df, q, id, vec, k)
      .select("query_id", "cand_id")
    val proj = rpProject(df, id, vec, dims)
    val approx = bruteForceTopK(proj, proj.filter(col(id) < 8),
      id, "pvec", k).select("query_id", "cand_id")
    val hits = exact.join(approx, Seq("query_id", "cand_id"),
        "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    q.select(col(id).cast("long").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("hits"))
      .withColumn("recall_ppm",
        expr(s"CAST((hits * 1000000L) DIV ${k}L AS BIGINT)"))
      .select("query_id", "hits", "recall_ppm")
  }

  /** IVF index-health telemetry: per-cell occupancy with uniformity
    * skew — `skew_ppm` = n·cells·1e6 div total (1e6 = perfectly
    * balanced; a hot cell's probe cost scales with its occupancy, so
    * this is the number an index operator alerts on). Empty cells
    * surface with 0 via the broadcast centroid scaffold — a silently
    * dead cell is exactly what the dashboard must show. One
    * broadcast-assign corpus pass + a cells-sized aggregate.
    */
  def ivfBalance(df: DataFrame, id: String, vec: String,
      centroids: DataFrame): DataFrame = {
    val occ = ivfAssign(df, id, vec, centroids)
      .groupBy("cell").agg(count(lit(1)).as("n_members"))
    val cells = centroids.select(col("cell")).distinct()
    // scaffold first (empty cells contribute 0 to the total and 1 to
    // __k either way), then BOTH scalars ride one pinned self-cross —
    // round 17: the previous form computed `occ` twice (its own total
    // agg + the join), i.e. two corpus assign passes
    val filled = cells.join(broadcast(occ), Seq("cell"), "left")
      .na.fill(0L, Seq("n_members"))
    graft.engine.Dist.selfScalarCross(filled,
        count(lit(1)).as("__k"),
        sum(col("n_members")).as("__tot"))
      .withColumn("share_ppm",
        expr("CAST((n_members * 1000000L) DIV __tot AS BIGINT)"))
      .withColumn("skew_ppm",
        expr("CAST((n_members * __k * 1000000L) DIV __tot AS BIGINT)"))
      .select("cell", "n_members", "share_ppm", "skew_ppm")
  }

  /** Contrastive triplet mining for embedding-model training: per
    * anchor, the strongest same-bucket neighbor at cos ≥ `posMin` is
    * the POSITIVE and the weakest at cos ≤ `negMax` the HARD
    * NEGATIVE — same-bucket-but-dissimilar is exactly the "looks
    * related, isn't" pair a contrastive loss learns most from
    * (random negatives are trivially separable). Anchors missing
    * either side emit nothing (an inner join — a triplet needs both).
    *
    * Determinism: round-6 native cosines, id tiebreaks on both rank
    * windows; posMin > negMax guarantees the two sides are distinct
    * partners. Scale shape: candidate pairs come from the capped
    * banded LSH join (bucket-bounded, never n²); the pair list is
    * pinned (localCheckpoint) before the two-direction symmetrize so
    * the sim join runs once (the pagerank edge-frame lesson); both
    * rank windows partition by anchor over bucket-bounded rows.
    */
  def tripletMine(df: DataFrame, id: String, vec: String,
      planes: Int = 6, posMin: Double = 0.35,
      negMax: Double = 0.1): DataFrame = {
    require(posMin > negMax,
      "tripletMine: posMin must exceed negMax")
    val pairs = lshSimilarityJoin(df, id, vec, planes,
        minSim = -1.0)
      .select("id1", "id2", "sim")
      .localCheckpoint()
    val sym = pairs
      .select(col("id1").as("anchor"), col("id2").as("other"),
        col("sim"))
      .unionByName(pairs.select(col("id2").as("anchor"),
        col("id1").as("other"), col("sim")))
    val byAnchor = Window.partitionBy("anchor")
    val ranked = sym
      .withColumn("__pr", row_number().over(
        byAnchor.orderBy(col("sim").desc, col("other").asc)))
      .withColumn("__nr", row_number().over(
        byAnchor.orderBy(col("sim").asc, col("other").asc)))
    val pos = ranked.filter(col("__pr") === 1 && col("sim") >= posMin)
      .select(col("anchor"), col("other").as("pos_id"),
        col("sim").as("pos_sim"))
    val neg = ranked.filter(col("__nr") === 1 && col("sim") <= negMax)
      .select(col("anchor"), col("other").as("neg_id"),
        col("sim").as("neg_sim"))
    pos.join(neg, Seq("anchor"))
      .select("anchor", "pos_id", "pos_sim", "neg_id", "neg_sim")
  }

  /** Late-interaction (ColBERT MaxSim) retrieval: each vector is
    * viewed as `nSub` sub-vectors (the multi-vector stand-in — with
    * real per-token embeddings the identical plan applies to an
    * array-of-vectors column) and
    * score(q, d) = Σ_i max_j cos(q_i, d_j) — each query sub-vector
    * matches its best candidate sub-vector, the soft-alignment
    * scoring dual-encoder cosines can't express.
    *
    * Determinism contract: per-pair cosines use the native
    * fixed-order dot over staged sub-vector slices, round-6 before
    * the max; `greatest` is an exact max; the outer sum is the
    * unrolled left fold i = 0..nSub-1 — every double bit-identical
    * across engines. Zero-norm sub-vectors score 0 on both engines
    * (no NaN/NULL divergence).
    *
    * Scale shape: sub-vectors and norms are staged ONCE per row (the
    * winsorize-bounds lesson: per-pair references are cheap
    * element_at attribute reads, never re-sliced); the query side is
    * broadcast and the corpus scanned once; per-pair work is the
    * inherent O(nSub²) of late interaction — at index scale an ANN
    * arm shortlists first and this re-ranks.
    */
  def maxSimTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int, nSub: Int = 8, subDim: Int = 8): DataFrame = {
    def staged(df: DataFrame, idAs: String): DataFrame = {
      val v = expr(s"transform($vec, x -> CAST(x AS DOUBLE))")
      val subs = array((0 until nSub).map(i =>
        slice(v, i * subDim + 1, subDim)): _*)
      val base = df.select(col(id).as(idAs), subs.as("__subs"))
      val norms = array((0 until nSub).map(i =>
        sqrt(dot(element_at(col("__subs"), i + 1),
          element_at(col("__subs"), i + 1)))): _*)
      base.select(col(idAs), col("__subs"), norms.as("__sn"))
    }
    val q = staged(queries, "query_id")
      .withColumnRenamed("__subs", "__qsubs")
      .withColumnRenamed("__sn", "__qsn")
    val c = staged(corpus, "cand_id")
    val cosIJ = (i: Int, j: Int) => {
      val d = dot(element_at(col("__qsubs"), i + 1),
        element_at(col("__subs"), j + 1))
      val qn = element_at(col("__qsn"), i + 1)
      val cn = element_at(col("__sn"), j + 1)
      round(when(qn > lit(0.0) && cn > lit(0.0), d / (qn * cn))
        .otherwise(lit(0.0)), 6)
    }
    val maxsim = (0 until nSub).map { i =>
      greatest((0 until nSub).map(j => cosIJ(i, j)): _*)
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("maxsim").desc, col("cand_id"))
    c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("maxsim", maxsim)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "maxsim")
  }

  /** EMBEDDING-SPACE DECONTAMINATION (round-15): flag corpus
    * documents whose embedding is near-identical to an EVAL-SET
    * member — the semantic complement of the n-gram `decontaminate`
    * pass (paraphrased or reformatted benchmark leakage survives
    * n-gram overlap; it does not survive a 0.9+ cosine to the eval
    * embedding — the phi-series "decontamination by embedding
    * similarity" recipe). Candidates come from ONE
    * [[lshSimilarityJoin]] over the union (bucketed, capped — never
    * corpus×eval); cross-side pairs are recognized by the id space
    * (`evalOffset` — eval ids must live at or above it, corpus ids
    * below), and each contaminated corpus doc reports its BEST eval
    * match by (sim desc, eval id asc). Emits
    * (doc id, eval_id, sim) — the drop list an anti-join consumes.
    */
  def decontaminateEmbed(corpus: DataFrame, evalSet: DataFrame,
      id: String, vec: String, evalOffset: Long,
      planes: Int = 8, minSim: Double = 0.9,
      maxBucket: Int = 1024): DataFrame = {
    val all = corpus
      .select(col(id).cast("long").as(id),
        expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as(vec))
      .unionByName(evalSet
        .select(col(id).cast("long").as(id),
          expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as(vec)))
    // planes=8 / cap 1024 (the hnsw local-edge lesson): a 0.9+
    // cosine match collides at any plane count, while background
    // bucket skew grows ~sum(bucket²) — 6 planes measured 26.6x at
    // 10x data before this change
    val pairs = lshSimilarityJoin(all, id, vec, planes, minSim,
      maxBucket)
    // lshSimilarityJoin emits id1 < id2, so a cross-side pair always
    // has the corpus doc at id1 and the eval member at id2
    pairs
      .filter(col("id1") < evalOffset && col("id2") >= evalOffset)
      .groupBy(col("id1").as(id))
      .agg(max_by(col("id2"), struct(col("sim"), -col("id2")))
        .as("eval_id"),
        max(col("sim")).as("sim"))
  }

  /** Seeded level-assignment hash for [[hnswTopK]]: a node is a
    * level-1 "hub" iff its scrambled id folds to 0 mod `hubMod` —
    * the HNSW trick (each node's max layer drawn from a geometric
    * distribution at insert time) made deterministic and
    * engine-mirrorable. All-integer: (id·2654435761 + 40503) stays
    * far below 2^63 at any realistic id range.
    */
  def hnswLevelExpr(id: String, hubMod: Int): Column =
    expr(s"($id * 2654435761L + 40503L) % 1000003L % $hubMod = 0")

  /** HNSW-class hierarchical navigable-graph ANN (Malkov & Yashunin
    * 2016's structure, re-expressed as unrolled relational joins):
    *
    *   - LEVELS: seeded hash assignment ([[hnswLevelExpr]]) promotes
    *     ~1/hubMod of the corpus to the upper layer ("hubs") — the
    *     deterministic analogue of HNSW's geometric level draw.
    *   - EDGES: every node keeps `mHub` links to its nearest hubs
    *     (the LONG-RANGE links upper layers give HNSW; reverse
    *     adjacency capped at `revCap` per hub against hub-skew) and
    *     up to `mLocal` LSH-bucket nearest neighbours
    *     ([[lshSimilarityJoin]] — the LOCAL links of the base layer,
    *     built bucketed, never all-pairs).
    *   - SEARCH: greedy descent unrolled to fixed relational steps —
    *     scan the broadcast-small hub layer for the query's `efHub`
    *     best entry points, expand their reverse hub edges (drop to
    *     layer 0), expand once more through local edges (the beam
    *     step), then exact-cosine top-k over the candidate set.
    *
    * Scale shape: the hub layer is broadcast-bounded BY CONSTRUCTION
    * (|corpus|/hubMod — size it like an IVF centroid set; at 100 TB
    * you add a third level so every layer's fan-in stays bounded,
    * exactly HNSW's log-level growth). Edge build is one broadcast
    * pass (hub links) + the bucketed LSH join (local links); search
    * touches candidate rows only — per query O(efHub·revCap·mLocal)
    * candidates, never the corpus. Everything is deterministic
    * (6 dp-rounded cosines, id-asc ties) and oracle-mirrorable.
    */
  def hnswTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int, hubMod: Int = 16, mHub: Int = 2,
      mLocal: Int = 8, efHub: Int = 3, planes: Int = 8,
      revCap: Int = 64, localMaxBucket: Int = 1024): DataFrame = {
    // repartition BEFORE the |corpus|×|hubs| broadcast expansion: the
    // expansion multiplies per-partition work ~|hubs|-fold, so input
    // partitioning IS the parallelism (a single-file local scan would
    // otherwise run 25M cosines on one core); the exchange moves only
    // the slim (id, vec) corpus rows
    val v = corpus.select(col(id).cast("long").as("__nid"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__v"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val hubs = v.filter(hnswLevelExpr("__nid", hubMod))
      .select(col("__nid").as("__hub"), col("__v").as("__hv"))
    // Top-k-by-cosine over a BROADCAST candidate frame as k repeated
    // max_by aggregations (the ivfAssign discipline, generalized from
    // top-1 to top-k). Both one-pass alternatives blow up at scale —
    // measured at 20k nodes × 1250 hubs: a row_number window shuffles
    // |left|·|hubs| scored rows (OOM), and a collect_list-then-slice
    // aggregation buffers |rows-per-task|·|hubs| structs in the
    // partial-agg hash map (also OOM) — while max_by's buffer is ONE
    // struct per group with full map-side combine, so pass i streams
    // the scored rows and materializes only |left| winners. k passes
    // re-score k·|left|·|hubs| cosines through the codegen'd dot —
    // compute is the cheap axis here; memory boundedness is the
    // constraint. Ties: sim desc, id asc via max over (sim, -id).
    def topByCos(left: DataFrame, leftId: String, leftVec: String,
        k: Int): DataFrame = {
      def pass(exclude: Option[DataFrame]): DataFrame = {
        val scored = left.crossJoin(broadcast(hubs))
          .withColumn("__hsim", round(cosineExpr(leftVec, "__hv"), 6))
        val remaining = exclude match {
          case Some(ex) =>
            scored.join(broadcast(ex), Seq(leftId, "__hub"), "left_anti")
          case None => scored
        }
        remaining.groupBy(col(leftId))
          .agg(max_by(struct(col("__hub"), col("__hsim")),
            struct(col("__hsim"), -col("__hub"))).as("__b"))
          .select(col(leftId), col("__b.__hub").as("__hub"),
            col("__b.__hsim").as("__hsim"))
      }
      // Pin each pass's output (round 21): without the pins the fold
      // embeds pass i's whole subtree TWICE in pass i+1's plan (once
      // as the union leg, once under the exclusion anti-join's
      // broadcast), so pass 1's corpus×hubs scoring re-executed
      // ~2^(k-1)-fold — explain showed 42 BroadcastNestedLoopJoin
      // occurrences in one hnsw_topk plan, 0 reused. Each pinned
      // frame is |left| rows of (id, hub, sim) — linear, the same
      // slim-assignment class pagerankSim pins. Values are unchanged:
      // the pins materialize exactly the pass outputs.
      (2 to k).foldLeft(pass(None).localCheckpoint()) { (acc, _) =>
        acc.unionByName(
          pass(Some(acc.select(col(leftId), col("__hub"))))
            .localCheckpoint())
      }
    }
    // hub links: node → its mHub nearest hubs (broadcast pass)
    val asg = topByCos(v, "__nid", "__v", mHub)
    // reverse adjacency, capped per hub (hot-hub guard)
    val wRev = Window.partitionBy(col("__hub"))
      .orderBy(col("__hsim").desc, col("__nid"))
    val rev = asg.withColumn("__rr", row_number().over(wRev))
      .filter(col("__rr") <= revCap)
      .select(col("__hub"), col("__nid").as("__adj"))
    // local links: symmetric LSH-bucket pairs, top-mLocal per node
    // planes=8 / cap 1024 (vs the sim-join's 6/4096 defaults): the
    // local edges only need to CONNECT near-identical neighbours —
    // which collide at any plane count — while background pairs grow
    // ~sum(bucket²); measured at 20k vectors, 6 planes put one
    // near-cap bucket at ~8M pairs (21M total, driver OOM), 8 planes
    // with the tighter cap keep the pair stream linear-ish.
    val pairs = lshSimilarityJoin(corpus, id, vec, planes,
      maxBucket = localMaxBucket)
      .select(col("id1").cast("long").as("__src"),
        col("id2").cast("long").as("__dst"), col("sim"))
      // pinned (round 21): the symmetrization union reads this frame
      // from BOTH legs — unpinned, the whole bucketed-cosine explode
      // ran twice (the pagerankSim edges lesson; same slim pair frame)
      .localCheckpoint()
    val sym = pairs.unionByName(pairs.select(
      col("__dst").as("__src"), col("__src").as("__dst"), col("sim")))
    val wLoc = Window.partitionBy(col("__src"))
      .orderBy(col("sim").desc, col("__dst"))
    val local = sym.withColumn("__lr", row_number().over(wLoc))
      .filter(col("__lr") <= mLocal)
      .select(col("__src"), col("__dst"))
    // search: efHub best entry hubs per query (broadcast hub scan,
    // same map-side-combined top-k shape as the build)
    val q = queries.select(col(id).cast("long").as("query_id"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("__qv"))
    val qh = topByCos(q, "query_id", "__qv", efHub)
      .select(col("query_id"), col("__hub"))
    // descend (reverse hub edges), then one local-edge beam step
    val candRev = qh.join(rev, Seq("__hub"))
      .select(col("query_id"), col("__adj").as("cand_id"))
    val candLoc = candRev.join(
      local, candRev("cand_id") === local("__src"))
      .select(col("query_id"), col("__dst").as("cand_id"))
    val cand = candRev.unionByName(candLoc)
      .filter(col("cand_id") =!= col("query_id")).distinct()
    // exact cosine over candidates only
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    cand
      .join(v.select(col("__nid").as("cand_id"), col("__v")),
        Seq("cand_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", round(cosineExpr("__qv", "__v"), 6))
      .withColumn("rank", row_number().over(wK).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "sim", "rank")
  }
}
