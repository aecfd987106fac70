package graft

import org.apache.spark.sql.DataFrame

/** Bench-grain input capping (round 15).
  *
  * The registry outgrew the driver's 500 s bench deadline: a healthy
  * FULL pass over 249 queries at sf0.1 is ~396 s (BENCH_PRIOR r14),
  * so the round-14 driver run degraded to a single clipped pass with
  * 126 queries unmeasured — an observability regression the verdict
  * flagged as the round's top fix. Correctness is NOT the bench's
  * job (the DuckDB oracle runs every query full-size at sf0.01); the
  * bench's job is a trustworthy timing per query per round. So at
  * BENCH TIME ONLY, volume-dominated heavy queries read a
  * deterministic Bernoulli sample of their input tables — a full
  * pass drops from ~396 s to ~305 s (the remainder is per-query
  * stage-latency floor sampling cannot shrink), which restores
  * full pass-1 coverage plus a substantial suspicion-ranked pass 2
  * inside the driver deadline.
  *
  * Honesty rules:
  *   - the sampling hook is a no-op unless [[Bench]] sets the
  *     system property for the query being timed — Verify, tests,
  *     and library callers never see it;
  *   - the per-query fractions below are committed and stable, so
  *     grained timings stay comparable round-over-round;
  *   - BENCH_DETAIL.json records the grain per measured query, and
  *     the stdout line carries the grained-count — a reader can
  *     always tell a grained row from a full-grain row;
  *   - full-grain runs remain one env var away
  *     (SPARK_GRAFT_BENCH_GRAIN=off) for baseline re-measures, and
  *     write to BENCH_DETAIL_PARTIAL.json via SPARK_GRAFT_BENCH_ONLY
  *     so they never clobber the committed grained artifact.
  *
  * The same seed for every read means two reads of one table inside
  * one query (self-joins, write-then-read-back) see the SAME rows —
  * sampled plans keep their join structure.
  */
object BenchGrain {
  private val prop = "graft.bench.grain"
  private val seed = 20260815L

  /** Input-side hook: the table loaders route every base-table read
    * through this. No-op (returns `df` unchanged, zero plan nodes)
    * unless a bench grain is active on this JVM.
    */
  def input(df: DataFrame): DataFrame = {
    val f = Option(System.getProperty(prop)).map(_.toDouble).getOrElse(1.0)
    if (f >= 1.0) df
    else df.sample(withReplacement = false, fraction = f, seed = seed)
  }

  /** Scope a grain fraction around a query's construction+execution.
    * Bench times one query at a time on one thread, so a process
    * property is race-free here.
    */
  def withGrain[T](fraction: Double)(body: => T): T = {
    if (fraction >= 1.0) body
    else {
      System.setProperty(prop, fraction.toString)
      try body
      finally System.clearProperty(prop)
    }
  }

  /** Committed per-query bench grains. Initial fractions were tiered
    * from the last healthy full-grain 3-pass medians (BENCH_PRIOR
    * r14, sf0.1: ≥6 s → 0.10 … ≥1.2 s → 0.60), then PRUNED by an A/B
    * measurement: a grain survives only where the grained timing came
    * in ≤ 0.82× the full-grain prior. Two measured reasons a grain
    * gets dropped:
    *   - STAGE-LATENCY-BOUND queries (the BPE fit family, the typed
    *     kernels, curation flows): their cost is ~15-25 sequential
    *     stages of scheduling/codegen floor, not row volume — a 0.15
    *     sample barely moved them;
    *   - THRESHOLD-CLIFF queries (winnow_pairs): sampling scales
    *     document frequencies down, so boilerplate fingerprints slip
    *     UNDER the df<=maxDf discrimination filter and the pair stage
    *     re-explodes quadratically — measured 2.6× SLOWER at 0.4.
    * Queries absent here (including every future addition until a
    * healthy A/B says sampling helps it) run full-grain.
    */
  val grains: Map[String, Double] = Map(
    "ann_recall" -> 0.25, "augment_tokens" -> 0.4, "b7_round_int" -> 0.6,
    "basket_lift" -> 0.4, "bm25_score" -> 0.6, "bm25_topk" -> 0.6,
    "boilerplate_ngrams" -> 0.6, "bucketed_join" -> 0.15, "cdc_scrub" -> 0.6,
    "char_entropy" -> 0.25, "cluster_keep_best" -> 0.15, "cms_topk" -> 0.6,
    "containment_pairs" -> 0.1, "corr_pairs" -> 0.25, "croston" -> 0.4,
    "curation_v2" -> 0.25, "curation_v5" -> 0.6, "curriculum_order" -> 0.4,
    "d11_last_by_time" -> 0.6, "d12_tail_mean" -> 0.6, "d8b_approx_aggs" -> 0.6,
    "d9_row_median" -> 0.4, "dedup_clusters" -> 0.15, "dedup_neardup_flow" -> 0.25,
    "demand_anomaly" -> 0.25, "e2_weekly_dense" -> 0.4, "e2e_slice" -> 0.15,
    "e2e_slice_partkey" -> 0.1, "elasticity" -> 0.25, "embed_clusters" -> 0.15,
    "equidepth_hist" -> 0.15, "ewma_daily" -> 0.25, "f1_f2_math" -> 0.25,
    "f6_format_string" -> 0.4, "feature_hash_embed" -> 0.4, "forecast_reconcile" -> 0.4,
    "hamming_rerank" -> 0.15, "hamming_topk" -> 0.15, "hnsw_topk" -> 0.4,
    "multimodal_mjpeg" -> 0.25, "interval_join" -> 0.15,
    "inventory_projection" -> 0.6, "ivf_topk_kmeans" -> 0.4, "ivfpq_topk" -> 0.25,
    "kernel_ma_partkey" -> 0.15, "lang_confusion" -> 0.6, "mad_outliers" -> 0.25,
    "maxsim_topk" -> 0.25, "multimodal_codec" -> 0.4, "multimodal_jpeg" -> 0.4,
    "multimodal_video" -> 0.15, "ngram_diversity" -> 0.25, "pca_project" -> 0.15,
    "pii_redact" -> 0.6, "pq_rerank" -> 0.25, "pq_topk" -> 0.15,
    "quality_lr_gate" -> 0.6, "range_join" -> 0.15, "simhash_neardup" -> 0.25,
    "site_boilerplate" -> 0.4, "span_dedup_stats" -> 0.6, "span_runs" -> 0.6,
    "span_scrub" -> 0.25, "surprise_chunks" -> 0.4, "tfidf_topterms" -> 0.4,
    "top_revenue" -> 0.6, "topk_per_group" -> 0.6, "trigram_lm_score" -> 0.25,
    "union_align" -> 0.6, "unpivot_measures" -> 0.4, "wordpiece_tokenize" -> 0.25,
    "zorder_layout" -> 0.6,
    // round-15 additions, A/B'd against the full-grain medians
    // recorded in PLANS.md (4.41/3.87/3.87/2.83 s at sf0.1)
    "rank_quantiles" -> 0.25, "unigram_vocab" -> 0.25,
    "viterbi_gain" -> 0.25, "unigram_tokenize" -> 0.25,
    // round-15 session-2 second wave: same-window A/B over the 11
    // slowest full-grain rows (282 s/pass window) — only these three
    // proved volume-bound (0.52-0.69x); the other eight measured
    // 0.85-1.37x (stage-latency-bound or threshold-sensitive) and
    // stay full-grain, consistent with the round-15 pruning
    "dedup_recall" -> 0.4, "decontam_embed" -> 0.4,
    "wordpiece_vocab" -> 0.4, "unigram_apply" -> 0.25,
    // round-16 third wave: the next 20 slowest full-grain rows
    // A/B'd in one window (full vs grained, n=2 each) — these 10
    // measured 0.57-0.81x and survive; the other 10 (bigram_lm_
    // score, c4_having_gates, coverage_gaps, e5_split_mark,
    // hybrid_rrf, ivf_kmeans, length_buckets, packing_stats,
    // pq_encode, source_overlap) measured 0.87-1.22x — stage-
    // latency-bound or sampling-hostile — and stay full-grain
    // (PLANS.md round-16 A/B table)
    "demand_class" -> 0.4, "doc_repetition" -> 0.4,
    "embed_lsh_simjoin" -> 0.4, "f3_bround_ties" -> 0.4,
    "link_graph" -> 0.4, "novelty_score" -> 0.4,
    "partition_prune" -> 0.4, "pq_centroids" -> 0.4,
    "text_stats" -> 0.4, "triplet_mine" -> 0.4,
    // round-17 session-3 wave over the new preference/eval rows
    // (same-window full vs 0.4 A/B, n>=2): these three measured
    // 0.60-0.80x (volume-bound) and survive; lr_auc measured 1.00x —
    // its cost is the histogram-prefix machinery's stage floor, not
    // row volume — and stays full-grain
    "bradley_terry" -> 0.4, "mojibake_fix" -> 0.4,
    "lr_agreement" -> 0.4,
    // score_tau kept at 0.44x full in its own same-window A/B
    "score_tau" -> 0.4,
    // newsvendor kept at 0.79x full (same-window A/B, n>=2)
    "newsvendor" -> 0.4,
    // round-18 wave over the new rows (full vs grained, n=2 each):
    // semdedup_auto 0.73x (volume-bound: kmeans passes + pair stage
    // shrink with the corpus, and autoCells re-derives k from the
    // SAMPLED count so the plan stays self-consistent) and
    // unigram_em_vocab 0.51x (the fit aggregate + per-round word
    // pass are volume-bound; the EM job count is fixed) survive;
    // retrieval_eval measured 0.91x — it rides the hybrid_rrf chain,
    // which is stage-latency-bound (rejected 0.87-1.22x in the
    // round-16 wave) — and stays full-grain; pref_position_bias is
    // sub-second, never a grain candidate
    "semdedup_auto" -> 0.4, "unigram_em_vocab" -> 0.25,
    // unigram_em_tokenize kept at 0.63x full (2.02 vs 3.22, n=2) —
    // the EM fit half is the volume-bound part, same as its _vocab
    // sibling
    "unigram_em_tokenize" -> 0.25,
    // curation_v8 kept at 0.76x full — the one curation chain where
    // a grain survives (the repair+decode+normalize front half is
    // genuinely row-volume-bound); v7 (0.85x) and backtest_ma (1.14x
    // on a clean-window re-measure after a stall-faked 0.49x first
    // arm) stay full-grain
    "curation_v8" -> 0.4,
    // round-19 wave (same-window full vs grained, n=2 each arm):
    // these seven measured 0.70-0.79x and survive — kernel_ma 0.72x
    // (the typed kernel IS volume-bound at the store grain, unlike
    // kernel_full below), semdedup 0.70x (fixed k=16: the pair stage
    // shrinks with the corpus, matching its _auto sibling's 0.73x),
    // retrieval_eval_arms 0.73x / rank_overlap 0.71x (confirmed in a
    // second window at 0.60x — the corpus tf/df scans behind the
    // three arms ARE volume-bound even though single-eval
    // retrieval_eval rejected at 0.91x in r18), abc_class 0.70x,
    // curation_v3 0.79x, token_budget_cut 0.77x. Rejected this wave:
    // backtest_ma 1.21x (second rejection — stays full-grain for
    // good), kernel_full 1.19x (per-group model cost is the FIXED
    // dense weekly-grid length, not row count — sampling only thins
    // rows within the same grid), pagerank_sim 1.03x (fixed power
    // rounds), curation_v6 0.93x, bitext_mine 0.89x, ppl_buckets
    // 0.83x (just over the 0.82x bar)
    "kernel_ma" -> 0.25, "semdedup" -> 0.4,
    "retrieval_eval_arms" -> 0.4, "rank_overlap" -> 0.4,
    "abc_class" -> 0.4, "curation_v3" -> 0.4,
    "token_budget_cut" -> 0.4,
    // unigram_em_broad kept at 0.53x full (1.75 vs 3.31, n=2) — the
    // same volume-bound EM-fit profile as its _vocab sibling (0.51x)
    "unigram_em_broad" -> 0.25,
    // round-19 second wave: the byte-grain BPE rows ARE volume-bound
    // (0.72x / 0.39x) where the char-grain chains stay stage-floor-
    // bound — byte seeds double the symbols per word, so the vocab
    // fold dominates the fixed round count; a same-window retry of
    // the char consumers confirmed the r16 adjudication
    // (mix_weights_bpe 0.89x, _batched 1.02x, token_budget_cut_bpe
    // 0.90x, _batched 0.94x — all stay full-grain). retrieval_sig
    // rejected at 1.07x (checkpointed-arm stage floor).
    "bpe_bytes_apply" -> 0.4, "fertility_bytes" -> 0.4,
    // round-20 wave (same-window full vs grained, n=2 each arm):
    // unigram_em_bytes 0.48x (the EM-fit volume-bound profile of its
    // _vocab/_broad siblings, 0.51/0.53x) and ppl_buckets 0.78x
    // (under the bar this window after r19's marginal 0.83x) survive.
    // Rejected with measured reasons: curation_v6 0.89x (second
    // rejection, r19 0.93x), retrieval_sig 0.94x (third rejection —
    // checkpointed-arm stage floor), release_gate 1.03x /
    // release_funnel 0.98x / t_closeness 1.02x (gram-join machinery
    // and ladder levels are fixed-stage cost, not row volume),
    // fertility_bytes at 0.25 read 0.94x of its committed 0.4 (no
    // further volume gain — stays 0.4)
    "unigram_em_bytes" -> 0.25, "ppl_buckets" -> 0.4,
    // round-21 wave (paired same-window full vs 0.4, n=2 each arm):
    // bigram_lm_score 0.81x, curation_e2e 0.74x, curation_v4 0.80x
    // survive — all three are corpus-volume-bound front halves.
    // k_anon_utility rejected at 1.23x (the kAnonymize ladder is
    // fixed-stage cost, matching the k_anonymity / t_closeness /
    // release_gate rejections); an earlier stall-contaminated window
    // had read 0.80x for it — the clean paired window is the
    // evidence that counts.
    "bigram_lm_score" -> 0.4, "curation_e2e" -> 0.4,
    "curation_v4" -> 0.4,
    // round-21 second wave (paired same-window full vs 0.4, n=2 each
    // arm, post-wave-2 code): pagerank_sim 0.68x (edge volume),
    // token_budget_cut_bpe 0.74x (apply side is corpus-volume-bound
    // now the fit's checkpoints are lazy), retrieval_sig 0.82x (the
    // corpus shortlist passes) survive. Rejected: bitext_mine 0.83x
    // (just over the bar), curation_v6 0.93x, kernel_full 1.09x and
    // backtest_ma 1.12x (the typed-kernel fixed-stage class, matching
    // the round-15 kernel rejections).
    "pagerank_sim" -> 0.4, "token_budget_cut_bpe" -> 0.4,
    "retrieval_sig" -> 0.4)
}
