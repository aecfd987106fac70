package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token counting,
  * quality scoring, language ID, document fingerprinting. All are
  * per-row codegen'd column expressions — narrow, no shuffle, scale
  * linearly with the scan.
  */
object TextAnalysis {
  import HashConstants.P

  /** Whitespace token count. */
  def tokenCountExpr(text: String): Column =
    expr(s"size(split(trim($text), '\\\\s+'))")

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks (a cheap stand-in for a real subword
    * tokenizer's piece count).
    */
  def bpeishCountExpr(text: String): Column =
    expr(s"size(regexp_extract_all($text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))")

  /** Punctuation-ish ratio: non-alphanumeric-non-space chars / chars. */
  def punctRatioExpr(text: String): Column =
    expr(s"""CAST(length(regexp_replace($text, '[a-zA-Z0-9\\\\s]', ''))
             AS DOUBLE) / length($text)""")

  /** Mean token length. */
  def avgWordLenExpr(text: String): Column =
    expr(s"""CAST(length(regexp_replace($text, '\\\\s', '')) AS DOUBLE)
             / size(split(trim($text), '\\\\s+'))""")

  /** Language-specific stopword lists (tiny, for the n-gram/stopword
    * heuristic language ID).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"))

  private def hitCount(text: String, words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
    s"size(filter(split(trim($text), '\\\\s+'), t -> array_contains($arr, t)))"
  }

  /** Stopword ratio against one language's list. */
  def stopwordRatioExpr(text: String, lang: String = "en"): Column =
    expr(s"""CAST(${hitCount(text, stopwords(lang))} AS DOUBLE)
             / size(split(trim($text), '\\\\s+'))""")

  /** Heuristic language ID: argmax of per-language stopword hits,
    * deterministic priority order (en > es > fr > de) on ties; "und"
    * (undetermined) when nothing hits.
    */
  def langIdExpr(text: String): Column = {
    val langs = Seq("en", "es", "fr", "de")
    val scores = langs.map(l => l -> hitCount(text, stopwords(l))).toMap
    val best = langs.map(l =>
      s"WHEN ${scores(l)} >= ${langs.filterNot(_ == l).map(scores).map(s => s"greatest($s, 0)").mkString("greatest(", ", ", ")")} AND ${scores(l)} > 0 THEN '$l'"
    ).mkString(" ")
    expr(s"CASE $best ELSE 'und' END")
  }

  /** Seed corpus for [[langIdFit]] — a few plain-ASCII sentences per
    * language (composed commonplace text; accent-free so the
    * char-grain statistics, not diacritics, carry the signal).
    * Ordered map: the sequence is the deterministic tie/priority
    * order of the classifier.
    */
  val langIdSeeds: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(
      "the quick brown fox jumps over the lazy dog",
      "this is the house that we built together last summer",
      "she said that the weather would be fine and the children could play outside",
      "a government of the people by the people for the people",
      "what time is it and where are you going this evening",
      "reading books in the library is one of the things that i enjoy the most",
      "we went to the market in the morning and bought bread and cheese",
      "the children are playing with their friends in the garden near the river",
      "he could not remember where he had put the keys to the house",
      "there is nothing better than a cup of tea on a cold winter day",
      "they have been working on this project for more than three years",
      "my brother lives in a small town in the north of the country"),
    "es" -> Seq(
      "el rapido zorro marron salta sobre el perro perezoso",
      "esta es la casa que construimos juntos el verano pasado",
      "ella dijo que el tiempo estaria bien y que los ninos podrian jugar afuera",
      "un gobierno del pueblo por el pueblo y para el pueblo",
      "que hora es y adonde vas esta noche",
      "leer libros en la biblioteca es una de las cosas que mas disfruto",
      "fuimos al mercado por la manana y compramos pan y queso",
      "los ninos estan jugando con sus amigos en el jardin cerca del rio",
      "no podia recordar donde habia puesto las llaves de la casa",
      "no hay nada mejor que una taza de te en un dia frio de invierno",
      "han estado trabajando en este proyecto durante mas de tres anos",
      "mi hermano vive en un pueblo pequeno en el norte del pais"),
    "fr" -> Seq(
      "le renard brun rapide saute par dessus le chien paresseux",
      "ceci est la maison que nous avons construite ensemble l ete dernier",
      "elle a dit que le temps serait beau et que les enfants pourraient jouer dehors",
      "un gouvernement du peuple par le peuple et pour le peuple",
      "quelle heure est il et ou vas tu ce soir",
      "lire des livres a la bibliotheque est une des choses que j aime le plus",
      "nous sommes alles au marche le matin et avons achete du pain et du fromage",
      "les enfants jouent avec leurs amis dans le jardin pres de la riviere",
      "il ne se souvenait plus ou il avait mis les cles de la maison",
      "il n y a rien de mieux qu une tasse de the par une froide journee d hiver",
      "ils travaillent sur ce projet depuis plus de trois ans",
      "mon frere habite dans une petite ville dans le nord du pays"),
    "de" -> Seq(
      "der schnelle braune fuchs springt uber den faulen hund",
      "das ist das haus das wir letzten sommer zusammen gebaut haben",
      "sie sagte dass das wetter schon sein wurde und die kinder draussen spielen konnten",
      "eine regierung des volkes durch das volk und fur das volk",
      "wie spat ist es und wohin gehst du heute abend",
      "bucher in der bibliothek zu lesen ist eines der dinge die ich am meisten geniesse",
      "wir gingen am morgen auf den markt und kauften brot und kase",
      "die kinder spielen mit ihren freunden im garten in der nahe des flusses",
      "er konnte sich nicht erinnern wo er die schlussel des hauses hingelegt hatte",
      "es gibt nichts besseres als eine tasse tee an einem kalten wintertag",
      "sie arbeiten seit mehr als drei jahren an diesem projekt",
      "mein bruder wohnt in einer kleinen stadt im norden des landes"))

  /** Fitted char-ngram language classifier: per-language L2-normalized
    * centroid over `dim` hashed char-bigram buckets, 6dp — a
    * model-sized table that rides into the plan as literals (the
    * [[DsirModel]]/[[Bm25Model]] broadcast-table pattern).
    */
  case class LangIdModel(langs: Seq[String], dim: Int, n: Int,
      centroids: Map[String, Array[Double]])

  /** Fit the fastText-style language classifier OFFLINE from the
    * embedded seeds (no Spark involved — the model is tiny):
    * char-`n`-gram poly-hashes ([[PolyHash.hashRange]] — the same
    * arithmetic the native scoring expression runs) bucketed into
    * `dim` counts per language, L2-normalized, rounded 6dp so the
    * plan literals and the oracle literals are the same finite
    * decimals. In production the seeds would be a real per-language
    * training set; the operator shape — hash, bucket, dot with a
    * broadcast weight table, argmax — is identical.
    */
  def langIdFit(dim: Int = 256, n: Int = 3): LangIdModel = {
    val cents = langIdSeeds.map { case (lang, seeds) =>
      val counts = new Array[Double](dim)
      seeds.foreach { s =>
        val cps = s.toLowerCase.codePoints().toArray
        val w = math.min(n, cps.length)
        val m = math.max(cps.length - n + 1, 1)
        var i = 0
        while (i < m) {
          val h = graft.llm.PolyHash.hashRange(cps, i, w)
          counts(java.lang.Math.floorMod(h, dim.toLong).toInt) += 1.0
          i += 1
        }
      }
      val norm = math.sqrt(counts.map(x => x * x).sum)
      lang -> counts.map(x =>
        new java.math.BigDecimal(x / norm)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
    }
    LangIdModel(langIdSeeds.map(_._1), dim, n, cents.toMap)
  }

  /** Multilingual language ID — [[langIdExpr]]'s model-based upgrade
    * (round-14): cosine of the doc's hashed char-bigram profile
    * against each language centroid of a fitted [[LangIdModel]],
    * argmax with the model's deterministic priority order on ties,
    * `und` when the best score is at or below `minScore` (no bigram
    * overlap with any language profile). Entirely ROW-LOCAL: bigram
    * hashing and bucketing are native codegen'd expressions
    * ([[PolyHashColumns.shingleHashes]]/`featureHashCounts`), the
    * centroids are plan literals, every dot folds in bucket-index
    * order — zero shuffle at any corpus size, streaming-safe.
    * Scores are compared RAW (bit-identical across engines) and
    * displayed at 6dp, the [[withLrGate]] discipline.
    */
  def withLangId(df: DataFrame, text: String,
      model: LangIdModel = langIdFit(),
      minScore: Double = 0.25): DataFrame = {
    val clash = (Seq("__lh", "__lcnt", "__lnorm", "__lvec", "__zs",
      "pred_lang") ++ model.langs.map(l => s"score_$l"))
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"withLangId: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    def centLit(l: String): String = model.centroids(l)
      .map(x => new java.math.BigDecimal(x).toPlainString)
      .mkString("array(", "D, ", "D)")
    // Physical-shape notes (measured 42 s → the fix below at sf0.1):
    // the dots run as the NATIVE fixed-order DotProductExpr against
    // the literal centroid arrays (the interpreted
    // Physical shape (42 s → 2 s at sf0.1 across two fixes): every
    // per-element stage is NATIVE — trigram hashing, bucket counts,
    // the norm (dot of the counts with themselves), and the four
    // centroid dots (DotProductExpr against literal arrays); the
    // cosine is raw-dot / norm, ONE division per language instead of
    // a per-element normalize (a `transform(cnt, x -> x / norm)`
    // lambda gets the norm aggregate INLINED by CollapseProject and
    // re-evaluated per element — the winsorize-bounds trap, measured
    // as the 27 s residual). All four scores live in ONE array
    // column built in a single projection, so the profile chain is
    // computed once, not once per language. The native dot's
    // 0-seeded index-order fold is bit-identical to the init-less
    // list_reduce product fold the oracle runs (the ADC-sum
    // precedent); cosine argmax is scale-invariant, so skipping the
    // per-element 6dp normalize changes no prediction semantics —
    // the und floor applies to the same normalized cosine.
    def zi(l: String): Int = model.langs.indexOf(l) + 1
    val zExprs = model.langs.map { l =>
      VectorColumns.dot(col("__lcnt"), expr(centLit(l))) /
        col("__lnorm")
    }
    val best = model.langs.map { l =>
      val others = model.langs.filterNot(_ == l)
        .map(o => s"element_at(__zs, ${zi(l)}) >= " +
          s"element_at(__zs, ${zi(o)})").mkString(" AND ")
      s"WHEN $others AND element_at(__zs, ${zi(l)}) > ${minScore}D " +
        s"THEN '$l'"
    }.mkString(" ")
    df
      .withColumn("__lh",
        PolyHashColumns.shingleHashes(lower(col(text)), model.n))
      .withColumn("__lcnt",
        PolyHashColumns.featureHashCounts(col("__lh"), model.dim))
      .withColumn("__lnorm",
        sqrt(VectorColumns.dot(col("__lcnt"), col("__lcnt"))))
      .withColumn("__zs", array(zExprs: _*))
      .withColumn("pred_lang", expr(s"CASE $best ELSE 'und' END"))
      .select(df.columns.map(col) ++
        model.langs.map(l =>
          round(expr(s"element_at(__zs, ${zi(l)})"), 6)
            .as(s"score_$l"))
        :+ col("pred_lang"): _*)
  }

  /** Composite quality score in [0, 1]: enough tokens, low punctuation
    * noise, natural stopword density.
    */
  def qualityScoreExpr(text: String): Column =
    round(
      least(tokenCountExpr(text).cast("double") / 100.0, lit(1.0)) * 0.4
        + (lit(1.0) - punctRatioExpr(text)) * 0.3
        + least(stopwordRatioExpr(text) * lit(4.0), lit(1.0)) * 0.3, 6)

  /** Document fingerprint: polynomial rolling hash of the
    * whitespace-normalized, lowercased text — equal fingerprints ⇔
    * equal normalized content (mod collisions at ~1/P).
    */
  def fingerprintExpr(text: String): Column =
    // codegen'd normalization feeding the native PolyHashString
    // expression — the whole fingerprint stays inside one
    // whole-stage-codegen span, no interpreted lambdas
    PolyHashColumns.fingerprint(
      expr(s"lower(regexp_replace(trim($text), '\\\\s+', ' '))"))

  /** Deterministic bottom-k sample per group: the k rows with the
    * SMALLEST content fingerprints. Because the fingerprint is a
    * content hash, this is a uniform random sample that is (a)
    * reproducible across engines/runs/partitionings, and (b) STABLE
    * under corpus growth — a doc stays sampled until k smaller
    * hashes exist in its group, so per-group samples from different
    * snapshots overlap maximally (the property rand()-based sampling
    * lacks). The rank filter pushes into WindowGroupLimit: each
    * shuffle partition forwards only k rows per group, so the
    * exchange carries O(groups × k), not the corpus.
    */
  /** 60-bit md5-prefix hash of the normalized text, uniform in
    * [0, 2^60). The cheap polynomial fingerprint is NOT usable here:
    * order statistics need an avalanched hash, and the char fold
    * maps near-identical texts ("doc 41"/"doc 42") to ADJACENT
    * values, wrecking the uniformity KMV's estimator assumes (a 67%
    * estimate error on sequential doc names in the spec fixture).
    */
  def uniformHash60(text: String): Column =
    expr(s"CAST(conv(substring(md5(lower(regexp_replace(" +
      s"trim($text), '\\\\s+', ' '))), 1, 15), 16, 10) AS BIGINT)")

  /** Scale shape (round 21): the registered queries group by
    * `source` — low cardinality — so a bare per-group window would
    * put each group's ENTIRE corpus slice through one single-task
    * sort. The [[sketchOverlap]] threshold prefilter fixes that:
    * only rows whose hash falls in the bottom `4k/nd` fraction of
    * the hash space (nd = the group's distinct-hash count; the
    * exactness fallback keeps everything when nd ≤ 4k) reach the
    * window, so the sorted set is ~4k rows per group, never the
    * corpus. The bottom-k rows all survive any hash-threshold
    * filter that keeps ≥ k rows, so the output is IDENTICAL; a
    * shortfall (P ≤ exp(-9k/8) per group, sketchOverlap's bound)
    * raises loudly in-plan instead of silently dropping rows — the
    * guard is folded into the consumed `h` column so no projection
    * can prune it.
    */
  def kmvSample(df: DataFrame, group: String, text: String,
      id: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val two60 = 1152921504606846976L
    val over = 4L * k
    // pinned: the count pass, the prefiltered window pass, and the
    // shortfall-guard aggregate all read the hashed frame
    val hashed = df.select(col(group), col(id),
        uniformHash60(text).as("__h"))
      .localCheckpoint()
    val counts = hashed.groupBy(col(group)).agg(
      count(lit(1)).as("__n"),
      countDistinct(col("__h")).as("__nd"))
    val w = Window.partitionBy(col(group))
      .orderBy(col("__h"), col(id))
    // the survivor count rides the SAME window spec (unbounded count
    // over the identical partition/order — one WindowExec, no second
    // pass), so the shortfall guard costs nothing: a group that kept
    // fewer than least(k, n) survivors raises on every row it does
    // emit. The one shape this cannot see — a group losing ALL its
    // rows — needs every one of ~4k expected survivors to miss
    // (P ≤ exp(-4k) per group), far below the exp(-9k/8) bound the
    // sketchOverlap family already accepts.
    val wAll = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    hashed
      .join(broadcast(counts), Seq(group))
      .filter(col("__h") < expr(
        s"""CASE WHEN __nd <= ${over}L THEN ${two60}L
           |ELSE (${two60}L DIV __nd) * ${over}L END""".stripMargin))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__surv", count(lit(1)).over(wAll))
      .filter(col("rank") <= k)
      .select(col(group), col(id),
        expr(s"""CASE WHEN __surv < least(CAST($k AS BIGINT), __n)
           |THEN raise_error(concat('kmvSample: hash-threshold ',
           |  'prefilter kept ', CAST(__surv AS STRING),
           |  ' of the least(k, n) rows for group ',
           |  CAST($group AS STRING), ' -- raise the oversample ',
           |  'bound')) ELSE __h END""".stripMargin).as("h"),
        col("rank"))
  }

  /** KMV (k-minimum-values) distinct-count estimate per group from
    * the k-th smallest distinct fingerprint: est = (k-1) / U_(k)
    * with U_(k) = h_k / P the k-th order statistic mapped to [0,1).
    * Groups with fewer than k distinct values report their EXACT
    * count (the sketch degenerates to the full set). The point at
    * scale: the estimator state is k longs per group — this is the
    * fixed-memory form of count_distinct whose error (~1/√k) you
    * choose, and unlike approx_count_distinct the estimate is
    * bit-reproducible on any engine that can hash strings the same
    * way. One distinct-shuffle + one window-limited pass.
    */
  def kmvDistinct(df: DataFrame, group: String, text: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val two60 = 1152921504606846976L
    val over = 4L * k
    // pinned: the exact-count pass and the prefiltered order-
    // statistic pass both read the distinct frame (the old form
    // rebuilt the corpus distinct twice); the [[sketchOverlap]]
    // threshold prefilter keeps the per-group window to ~4k rows —
    // the registered queries group by low-cardinality `source`, so
    // an unfiltered window is one task sorting a group's whole
    // distinct set. Shortfall (P ≤ exp(-9k/8)) raises loudly via the
    // guard folded into the consumed est_distinct column.
    val d = df
      .select(col(group), uniformHash60(text).as("__h"))
      .distinct()
      .localCheckpoint()
    val n = d.groupBy(col(group))
      .agg(count(lit(1)).as("n_exact"))
    val w = Window.partitionBy(col(group)).orderBy(col("__h"))
    val kth = d
      .join(broadcast(n), Seq(group))
      .filter(col("__h") < expr(
        s"""CASE WHEN n_exact <= ${over}L THEN ${two60}L
           |ELSE (${two60}L DIV n_exact) * ${over}L END""".stripMargin))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(col(group))
      .agg(max(when(col("__r") === k, col("__h"))).as("kth_hash"),
        count(lit(1)).as("__kept"))
    n.join(kth, Seq(group), "left")
      .select(col(group), col("n_exact"), col("kth_hash"),
        expr(s"""CASE WHEN coalesce(__kept, 0L) <
           |  least(CAST($k AS BIGINT), n_exact)
           |THEN raise_error(concat('kmvDistinct: hash-threshold ',
           |  'prefilter kept ', CAST(coalesce(__kept, 0L) AS STRING),
           |  ' of the least(k, n) rows for group ',
           |  CAST($group AS STRING), ' -- raise the oversample bound'))
           |ELSE CASE WHEN kth_hash IS NOT NULL
           |  THEN round(CAST(${k - 1} AS DOUBLE) *
           |    CAST(${two60}L AS DOUBLE) / CAST(kth_hash AS DOUBLE), 6)
           |  ELSE CAST(n_exact AS DOUBLE) END
           |END""".stripMargin).as("est_distinct"))
  }

  /** Bottom-k sketch SET ALGEBRA across groups (the KMV synopsis
    * under union/intersection, Beyer et al. 2007): per group the k
    * smallest DISTINCT content hashes; per group PAIR, the union
    * sketch is the k smallest of the two samples merged (bottom-k
    * of a union = bottom-k of the parts' bottom-k's — the
    * mergeability identity), the Jaccard estimate is the inclusion
    * fraction |B_a ∩ B_b ∩ B_∪| / |B_∪| in exact integer ppm, and
    * the intersection-size estimate is that fraction times the
    * union's KMV distinct estimate. This answers "how much do these
    * sources overlap?" with ONE corpus scan and k longs per source —
    * where the exact form re-shuffles the corpus for a pairwise
    * join. The exact pair counts ride along as verification columns
    * (`n_inter_exact`, `jaccard_exact_ppm`) from one hash-keyed
    * aggregate, the rank-quantiles verification discipline.
    *
    * Scale shape: one (group, hash)-distinct aggregate; the
    * per-group bottom-k uses the [[rankQuantileSketch]] threshold
    * prefilter (survivors ~4k per group hit the window, never the
    * corpus; same exp(-9k/8) oversample bound, and a shortfall
    * would surface as a cross-engine mismatch, not silence); pair
    * math runs on ≤ 2k-element arrays over the #groups² bounded
    * pair frame. Deterministic content-hash sample → bit-identical
    * on any engine hashing the same way. Exactness degenerates
    * gracefully: a union sample smaller than k IS the full distinct
    * union, and every estimate collapses to the exact value.
    */
  def sketchOverlap(df: DataFrame, group: String, text: String,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 8, "need k >= 8")
    val two60 = 1152921504606846976L
    val over = 4 * k
    val d = df.select(col(group).as("__g"), uniformHash60(text).as("__h"))
      .distinct()
      // pinned: read by the count pass, the sample pass, and the
      // exact-verification aggregate
      .localCheckpoint()
    val counts = d.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__h"))
    val samples = d
      .join(broadcast(counts), Seq("__g"))
      .filter(col("__h") < expr(
        s"""CASE WHEN __n <= ${over}L THEN ${two60}L
           |ELSE (${two60}L DIV __n) * ${over}L END""".stripMargin))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(col("__g"))
      .agg(sort_array(collect_list(col("__h"))).as("__hs"))
      .join(broadcast(counts), Seq("__g"))
      // pinned: the pair self-join reads the #groups-row sample
      // frame from both sides
      .localCheckpoint()
    val pairs = samples
      .select(col("__g").as("source_a"), col("__hs").as("__ha"),
        col("__n").as("n_a"))
      .join(samples.select(col("__g").as("source_b"),
        col("__hs").as("__hb"), col("__n").as("n_b")),
        col("source_a") < col("source_b"))
      .withColumn("__u", expr("array_sort(array_union(__ha, __hb))"))
      .withColumn("__bu", expr(s"slice(__u, 1, $k)"))
      .withColumn("k_eff", expr("CAST(size(__bu) AS BIGINT)"))
      .withColumn("__kth", expr(
        s"CASE WHEN size(__u) >= $k THEN element_at(__u, $k) END"))
      .withColumn("n_common", expr(
        "CAST(size(array_intersect(__bu, array_intersect(__ha, __hb)))" +
          " AS BIGINT)"))
      .withColumn("jaccard_ppm", expr(
        "n_common * 1000000L DIV greatest(k_eff, 1L)"))
      .withColumn("est_union",
        when(col("__kth").isNotNull,
          round(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
            col("__kth"), 6))
          .otherwise(col("k_eff").cast("double")))
      .withColumn("est_intersection", round(
        col("n_common").cast("double") * col("est_union") /
          greatest(col("k_eff"), lit(1L)), 6))
    // exact verification: one hash-keyed aggregate (map-side
    // combine), pair fan-out bounded by #groups² per shared hash
    val exact = d.groupBy(col("__h"))
      .agg(collect_set(col("__g")).as("__gs"))
      .filter(size(col("__gs")) >= 2)
      .select(explode(expr(
        """flatten(transform(array_sort(__gs), (a, i) ->
          |  transform(slice(array_sort(__gs), i + 2,
          |      size(__gs) - i - 1),
          |    b -> struct(a AS sa, b AS sb))))""".stripMargin))
        .as("__p"))
      .groupBy(col("__p.sa").as("source_a"), col("__p.sb").as("source_b"))
      .agg(count(lit(1)).as("n_inter_exact"))
    pairs.join(exact, Seq("source_a", "source_b"), "left")
      .withColumn("n_inter_exact",
        coalesce(col("n_inter_exact"), lit(0L)))
      .withColumn("jaccard_exact_ppm", expr(
        "n_inter_exact * 1000000L DIV " +
          "greatest(n_a + n_b - n_inter_exact, 1L)"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("k_eff"), col("n_common"), col("jaccard_ppm"),
        col("est_union"), col("est_intersection"),
        col("n_inter_exact"), col("jaccard_exact_ppm"))
  }

  /** Bottom-k-by-hash RANK SKETCH for quantiles — the mergeable
    * fixed-memory alternative to exact `percentile` (a full sort of
    * 100 TB) and to `approx_percentile` (whose t-digest state is
    * engine-private and not bit-reproducible): sample = the k rows
    * with the SMALLEST uniform row-id hashes per group, a
    * deterministic uniform sample whose q-th order statistic
    * estimates the q-th quantile with rank error O(√(q(1−q)/k)).
    * Bottom-k by hash is trivially mergeable (bottom-k of a union =
    * bottom-k of the parts' bottom-k's) and — unlike reservoir or
    * KLL compaction — independent of row order and partitioning, so
    * the estimate is bit-identical on ANY engine that hashes the
    * same way (the KMV determinism contract, applied to ranks).
    *
    * Scale shape: a group-count pass (map-side combined) sets a
    * per-group hash threshold t ≈ 4k/n · 2^60, so the sample filter
    * drops all but ~4k rows per group AT THE SCAN — the window that
    * finalizes the exact bottom-k shuffles only survivors, never the
    * corpus. The 4× oversample makes the prefilter's "survivors ⊇
    * true bottom-k" claim probabilistic with failure odds ≤
    * exp(-9k/8) per group (see the threshold comment in the body) —
    * accepted, deterministic per dataset, and visible as n_sample <
    * k if it ever fires. The verification join (true rank of each
    * estimate) is one more map-side-combined conditional count.
    *
    * Output per (group, q): n_rows, n_sample, est (an actual data
    * value — exact cross-engine), rank_le (true rank of est), and
    * rank_err_ppm = |rank_le/n − q/100| in ppm. All integer
    * arithmetic except est itself.
    *
    * Contract note: `id` rides through the shared portable hash
    * ([[uniformHash60]]), which trims/collapses whitespace before
    * hashing — ids differing only in whitespace would collide. Use
    * whitespace-free row keys (every fixture id is).
    */
  def rankQuantileSketch(df: DataFrame, group: String, value: String,
      id: String, k: Int = 512, qs: Seq[Int] = Seq(50, 90, 99))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 8 && qs.nonEmpty && qs.forall(q => q >= 1 && q <= 99),
      "need k >= 8 and quantiles in [1, 99]")
    val base = df.select(col(group).as("__g"),
      col(value).cast("double").as("__v"),
      col(id).cast("string").as("__id"))
    val counts = base.groupBy("__g").agg(count(lit(1)).as("n_rows"))
    // Threshold: (2^60 DIV n) * 4k caps expected survivors at ~4k —
    // the DIV-first order keeps the product under 2^63 whenever it
    // is EVALUATED, and the CASE makes sure it never evaluates for
    // groups of n_rows <= 4k (where 2^60 DIV n_rows * 4k would
    // overflow: 2^60/256 * 2048 = 2^63): small groups take the
    // everything-passes branch (every 60-bit hash < 2^60), so
    // correctness never rests on OR evaluation order.
    //
    // The 4x oversample makes "the prefilter keeps the exact
    // bottom-k" PROBABILISTIC, not guaranteed: survivors per group ~
    // Binomial(n, ~4k/n); P(fewer than k survive) <= exp(-9k/8)
    // (Chernoff at mean ~4k) — under 1e-250 at the default k=512,
    // an accepted bound (deterministic per dataset). A shortfall is
    // not silent: n_sample < k in the output and the true-rank
    // verification columns expose it.
    val over = 4 * k
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__h"), col("__id"))
    val samp = base
      .join(broadcast(counts), Seq("__g"))
      .withColumn("__h", uniformHash60("__id"))
      .filter(col("__h") < expr(
        s"""CASE WHEN n_rows <= ${over}L THEN 1152921504606846976L
           |ELSE (1152921504606846976L DIV n_rows) * ${over}L
           |END""".stripMargin))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_sample"),
        sort_array(collect_list(struct(col("__v"), col("__h"))))
          .as("__s"))
    val est = samp.join(counts, Seq("__g"))
      .select(col("__g"), col("n_rows"), col("n_sample"), col("__s"),
        explode(array(qs.map(q => lit(q)): _*)).as("q"))
      .withColumn("__idx", expr(
        "CAST(greatest((q * n_sample + 99) DIV 100, 1L) AS INT)"))
      .withColumn("est", expr("element_at(__s, __idx).__v"))
      .drop("__s", "__idx")
    est.join(base, Seq("__g"))
      .groupBy(col("__g"), col("q"), col("n_rows"), col("n_sample"),
        col("est"))
      .agg(sum(when(col("__v") <= col("est"), 1L).otherwise(0L))
        .as("rank_le"))
      .withColumn("rank_err_ppm", expr(
        "abs(rank_le * 1000000L - n_rows * q * 10000L) DIV n_rows"))
      .select(col("__g").as(group), col("q").cast("long").as("q"),
        col("n_rows"), col("n_sample"), col("est"), col("rank_le"),
        col("rank_err_ppm"))
  }

  /** HyperLogLog distinct-count estimate per group (Flajolet,
    * Fusy, Gandouet, Meunier 2007) over the same 60-bit uniform
    * content hash as [[kmvDistinct]]: bucket = h mod 2^b, register
    * M_j = max leading-zero rank of the remaining 60-b bits.
    * Versus KMV (k longs of state, window pass): HLL state is m=2^b
    * SMALL INTEGERS per group mergeable by max — the shuffle carries
    * (group, bucket, max-rho) with full map-side combine and no
    * window, which is why it is the cardinality sketch every
    * warehouse ships; error ~1.04/√m.
    *
    * Determinism contract: the hash is the engine-portable md5
    * prefix; rho is integer (bin()-length on both engines); the
    * register fold runs bucket-sorted with 1/2^M as exact
    * power-of-two divisions — no libm anywhere on the raw-estimate
    * path; only the small-range linear-counting branch touches
    * ln(), rounded at the established 6dp grain.
    */
  def hllDistinct(df: DataFrame, group: String, text: String,
      b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, "need 4 <= b <= 16")
    val m = 1 << b
    val maxRho = 60 - b + 1
    val regs = df
      .select(col(group).as("__grp"), uniformHash60(text).as("__h"))
      .withColumn("__bkt", expr(s"__h % ${m}L"))
      .withColumn("__w", expr(s"__h DIV ${m}L"))
      .withColumn("__rho", expr(
        s"CASE WHEN __w = 0 THEN $maxRho " +
          s"ELSE $maxRho - length(bin(__w)) END"))
      .groupBy(col("__grp"), col("__bkt"))
      .agg(max(col("__rho")).as("M"))
    val exact = df
      .select(col(group).as("__grp"), col(text).as("__t"))
      .groupBy("__grp")
      .agg(count_distinct(col("__t")).as("n_exact"))
    regs.groupBy("__grp")
      .agg(count(lit(1)).as("__present"),
        expr(
          """aggregate(sort_array(collect_list(struct(__bkt, M))),
            |  CAST(0.0 AS DOUBLE),
            |  (acc, e) ->
            |    acc + 1.0D / shiftleft(CAST(1 AS BIGINT), e.M))"""
            .stripMargin).as("__zp"))
      .withColumn("__z",
        col("__zp") + (lit(m) - col("__present")).cast("double"))
      .withColumn("__raw", expr(
        s"(0.7213D / (1.0D + 1.079D / ${m}.0D)) * " +
          s"${m}.0D * ${m}.0D / __z"))
      .withColumn("__zeros", lit(m.toLong) - col("__present"))
      .join(exact, Seq("__grp"))
      .select(col("__grp").as(group), col("n_exact"),
        round(expr(
          s"""CASE WHEN __raw <= ${2.5 * m}D AND __zeros > 0
             |THEN ${m}.0D * ln(${m}.0D / __zeros)
             |ELSE __raw END""".stripMargin), 6).as("n_est"))
  }

  /** Count-Min sketch frequency estimation over the corpus token
    * stream, with exact top-k side-by-side: d=4 pairwise-independent
    * rows of w counters; estimate(x) = min over rows of
    * counter[h_i(x)] — always an OVERestimate (collisions only add),
    * error ≤ εN with ε = e/w at δ = e^-d. The sketch is the
    * mergeable fixed-memory answer to "how often does this token
    * appear in 100 TB" — d·w integers of state regardless of corpus
    * or vocabulary size, vs the vocabulary-sized exact aggregate.
    *
    * Scale shape: the token explode fans each occurrence into d
    * (depth, cell) increments, but the groupBy is on the
    * d·w-cardinality cell key with FULL map-side combine — the
    * shuffle carries at most d·w rows per map partition, so sketch
    * build cost is one corpus scan. The candidate side (exact top-k
    * here, for the estimate-vs-truth report) is a map-side-combined
    * token aggregate cut by a distributed TakeOrdered; estimation
    * joins the k candidates to the BROADCAST sketch.
    *
    * Determinism: the row hashes are affine maps of the md5-based
    * token fingerprint masked to 2^30 (products stay < 2^62 — no
    * ANSI overflow), all arithmetic integer, mirrored verbatim by
    * the oracle.
    */
  /** Fixed odd multipliers / offsets per CMS depth (published
    * CW-trick style a*x+b mod p family; any fixed odd a works).
    * Public so the streaming stage replays the identical row hashes.
    */
  val cmsAs: Seq[Long] = Seq(2654435761L, 2246822519L, 3266489917L,
    668265263L, 374761393L, 2654435789L, 2246822579L, 3266489941L)
  val cmsBs: Seq[Long] = Seq(7L, 1013904223L, 1664525L, 22695477L,
    69069L, 1103515245L, 12345L, 1013904243L)

  /** Row-i cell index of a 60-bit fingerprint column, as SQL: affine
    * map of the fingerprint masked to 2^30 (products stay < 2^62 —
    * no ANSI overflow), mod P, mod w.
    */
  def cmsCellSql(i: Int, fp: String, w: Int): String =
    s"pmod(${cmsAs(i)}L * pmod($fp, 1073741824) + ${cmsBs(i)}L, $P) % $w"

  /** The (depth, cell) → count sketch frame itself — the mergeable
    * d·w-integer state [[cmsTopK]] estimates from and the streaming
    * stage accumulates incrementally. One corpus scan; the groupBy
    * key has at most d·w values so the shuffle after map-side
    * combine is sketch-sized regardless of corpus size.
    */
  def cmsSketch(df: DataFrame, text: String,
      w: Int = 2048, d: Int = 4): DataFrame =
    cmsSketchFromVocab(
      df.select(explode(expr(
          s"filter(split(lower($text), ' '), t -> t != '')")).as("tok"))
        .withColumn("__fp", uniformHash60("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("__c"), first(col("__fp")).as("__fp")),
      w, d)

  /** Sketch counters derived from a (tok, __c, __fp) VOCABULARY
    * frame: every occurrence of a token lands in the same d cells,
    * so cell counts are exactly the per-cell sums of token counts —
    * identical to the occurrence-grain fold, but computed over the
    * vocab-sized frame instead of the token stream.
    */
  private def cmsSketchFromVocab(vocab: DataFrame,
      w: Int, d: Int): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 16, "need 1 <= d <= 8, w >= 16")
    vocab
      .select(col("__c"), explode(expr(
        (0 until d).map(i =>
          s"named_struct('depth', $i, 'cell', ${cmsCellSql(i, "__fp", w)})")
          .mkString("array(", ", ", ")"))).as("__dc"))
      .groupBy(col("__dc.depth").as("depth"),
        col("__dc.cell").as("cell"))
      .agg(sum(col("__c")).as("cnt"))
  }

  def cmsTopK(df: DataFrame, text: String, k: Int = 20,
      w: Int = 2048, d: Int = 4): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 16, "need 1 <= d <= 8, w >= 16")
    // ONE corpus scan: the vocabulary aggregate (map-side combined)
    // is pinned and feeds BOTH consumers — the sketch counters are
    // derived at vocab grain (all occurrences of a token share its
    // d cells, so per-cell sums of token counts equal the
    // occurrence-grain fold exactly) and fit-collected as
    // MODEL-sized literal arrays (d·w longs — 16k at the default,
    // independent of corpus size; the sanctioned fit-frame collect
    // class), and the exact top-k is a TakeOrdered over the same
    // pinned frame. The first cut joined the sketch frame back once
    // per depth and Catalyst re-derived the whole subtree each time
    // — five corpus scans for d = 4. With the literals, estimation
    // is a row-local projection over the k-row top frame.
    val vocab = df.select(explode(expr(
        s"filter(split(lower($text), ' '), t -> t != '')")).as("tok"))
      .withColumn("__fp", uniformHash60("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("__c"), first(col("__fp")).as("__fp"))
      .localCheckpoint()
    val counters = Array.fill(d)(Array.fill(w)(0L))
    cmsSketchFromVocab(vocab, w, d).collect().foreach { r =>
      counters(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2)
    }
    val top = vocab.select(col("tok"), col("__c").as("n_exact"),
        col("__fp"))
      .orderBy(col("n_exact").desc, col("tok").asc)
      .limit(k)
    val perDepth = (0 until d).map(i =>
      element_at(typedlit(counters(i).toSeq),
        (expr(cmsCellSql(i, "__fp", w)) + lit(1L)).cast("int")))
    val nEst = if (perDepth.size == 1) perDepth.head
      else least(perDepth: _*)
    top.select(col("tok"), col("n_exact"), nEst.as("n_est"))
      .withColumn("err_ppm", expr(
        "CAST(((n_est - n_exact) * 1000000L) DIV n_exact AS BIGINT)"))
  }

  /** N-gram diversity / self-repetition report per group: unigram
    * type-token ratio and distinct-bigram / distinct-trigram ppm —
    * the corpus-health metrics that catch template farms and
    * synthetic-data mode collapse (low distinct-n = the corpus keeps
    * saying the same thing). Scale shape: one tokenize projection,
    * three map-side-combined aggregates on (group) with two-phase
    * distinct on the gram key; no window, no collect. Docs shorter
    * than n contribute zero n-grams (guarded — Spark's descending
    * `sequence(1, 0)` trap).
    */
  def ngramDiversity(df: DataFrame, text: String, group: String)
      : DataFrame = {
    val toked = df.select(col(group).as("grp"), expr(
      s"filter(split(lower($text), ' '), t -> t != '')").as("__t"))
    // ONE corpus scan: all three gram orders explode together as
    // (order, gram) structs (the first cut ran three separate
    // explode+aggregate subtrees — three scans of the same corpus),
    // then distinct-counting is the exact two-phase form: (grp, o,
    // g) pre-aggregate with map-side combine, per-(grp, o) rollup,
    // and a conditional pivot on the tiny per-order frame. The CASE
    // guards keep short docs out of higher orders WITHOUT the
    // descending-`sequence(1, 0)` trap.
    val emptyG = "CAST(array() AS ARRAY<STRUCT<o: INT, g: STRING>>)"
    def orderN(n: Int): String =
      if (n == 1) "transform(__t, t -> named_struct('o', 1, 'g', t))"
      else s"""CASE WHEN size(__t) >= $n THEN
           transform(sequence(1, size(__t) - ${n - 1}),
             i -> named_struct('o', $n, 'g',
               concat_ws(' ', slice(__t, i, $n))))
           ELSE $emptyG END"""
    val perGram = toked
      .select(col("grp"), explode(expr(
        s"concat(${orderN(1)}, ${orderN(2)}, ${orderN(3)})")).as("og"))
      .groupBy(col("grp"), col("og.o").as("o"), col("og.g").as("g"))
      .agg(count(lit(1)).as("c"))
    val perOrder = perGram.groupBy(col("grp"), col("o"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("dd"))
    def pick(o: Int, c: String) = sum(when(col("o") === o, col(c)))
    perOrder.groupBy(col("grp"))
      .agg(pick(1, "n").as("n_uni"), pick(1, "dd").as("d_uni"),
        pick(2, "n").as("n_bi"), pick(2, "dd").as("d_bi"),
        pick(3, "n").as("n_tri"), pick(3, "dd").as("d_tri"))
      .select(col("grp").as(group),
        col("n_uni").as("n_tokens"),
        expr("CAST((d_uni * 1000000L) DIV n_uni AS BIGINT)")
          .as("ttr_ppm"),
        expr("""CAST(CASE WHEN n_bi IS NULL THEN NULL
          |  ELSE (d_bi * 1000000L) DIV n_bi END AS BIGINT)"""
          .stripMargin).as("distinct2_ppm"),
        expr("""CAST(CASE WHEN n_tri IS NULL THEN NULL
          |  ELSE (d_tri * 1000000L) DIV n_tri END AS BIGINT)"""
          .stripMargin).as("distinct3_ppm"))
  }

  /** Curriculum ordering: equal-count quality bands + a
    * deterministic intra-band shuffle key — the "easy-to-hard with
    * shuffled lessons" loader order, WITHOUT a global window.
    *
    * Band assignment is the `equidepth_hist` pattern at the 6dp-rounded
    * quality-value grain: aggregate exact counts per distinct
    * quality value (map-side combine; cardinality ≤ 1e6 by the
    * rounding), rank values by quality DESC on the AGGREGATED frame
    * (value-count rows, not corpus rows), band(v) =
    * (cum_before · nBands) DIV total + 1 — every row sharing a
    * quality value shares a band (count-based banding, no
    * interpolation, ties never straddle engines). The value→band
    * map broadcasts back; the shuffle key is the row-local content
    * hash. NO corpus-sized sort or window anywhere — the caller
    * sorts by (band, shuffle_key) at write/read time, which is
    * Spark's distributed range sort, not this operator's problem.
    */
  def curriculumOrder(df: DataFrame, text: String, id: String,
      nBands: Int = 10): DataFrame = {
    require(nBands >= 2 && nBands <= 1000, "need 2 <= nBands <= 1000")
    val scored = df.select(col(id),
      qualityScoreExpr(text).as("quality"),
      uniformHash60(text).as("shuffle_key"))
    val hist = scored.groupBy(col("quality"))
      .agg(count(lit(1)).as("__n"))
    // value-grain frame, already bounded (qualityScoreExpr rounds to
    // 6 dp in [0, 1] → ≤ 1e6 + 1 distinct rows); round 16 routes the
    // cumulative through Dist.prefixSum (range-partitioned subtotals
    // + broadcast offsets) anyway, so there is NO unpartitioned
    // window even at the value-grain bound, and the grand total
    // rides along from the same subtotal pass. cum-before = the
    // inclusive prefix minus the row's own count.
    val bands = graft.engine.Dist.prefixSum(hist,
        Seq(col("quality").desc), "__n", "__cuminc",
        withTotal = true)
      .select(col("quality"),
        (expr(s"(__cuminc - __n) * $nBands DIV __cuminc_total")
          + lit(1L)).as("band"))
    scored.join(broadcast(bands), Seq("quality"))
      .select(col(id), col("quality"), col("band"), col("shuffle_key"))
  }

  /** Size-stratified output-shard plan: assign every document to one
    * of `nShards` output files so that each shard receives a
    * statistically equal mix of EVERY size class — the layout step
    * before a big write, where plain hash sharding leaves fat-tailed
    * size distributions with one shard holding two whale documents.
    *
    * Entirely row-local assignment (log2 size bucket + content-hash
    * spread within the bucket) — no global sort, no window, works
    * identically on a stream. Returns the per-shard report: doc
    * count, total payload chars, the shard's deviation from the
    * ideal mean in signed ppm, and its largest single document (the
    * whale check).
    */
  /** The row-local assignment half of [[shardPlan]]: append `shard`
    * (plus internal `__sz`) to the input — log2 size class offsets
    * the content hash so whales and shrimps stratify separately.
    * Pure projection; streaming-safe.
    */
  def withShard(df: DataFrame, text: String, id: String,
      nShards: Int): DataFrame = {
    require(nShards >= 2 && nShards <= 100000,
      "need 2 <= nShards <= 100000")
    df.withColumn("__sz", length(col(text)).cast("long"))
      .withColumn("__h", uniformHash60(text))
      // log2 size class: whales and shrimps stratify separately, so
      // every shard draws uniformly from each class
      .withColumn("__cls", expr(
        "CASE WHEN __sz <= 0 THEN 0 ELSE length(bin(__sz)) END"))
      .withColumn("shard", expr(s"pmod(__h + __cls, $nShards)"))
      .drop("__h", "__cls")
  }

  def shardPlan(df: DataFrame, text: String, id: String,
      nShards: Int = 16): DataFrame = {
    val assigned = withShard(df.select(col(id), col(text)), text, id,
      nShards)
    val per = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__sz")).as("total_chars"),
        max(col("__sz")).as("max_doc_chars"))
      // pinned: the mean cross reads the nShards-row frame twice
      .localCheckpoint()
    // deviation vs the all-shard mean as a broadcast 1-row cross
    // (round 16: was `sum(...) OVER ()`, an unpartitioned WindowExec
    // over the nShards rows). Integer ppm is exact under the same
    // ~9.2e12 BIGINT headroom contract as mixBudgetFit (|total -
    // mean| · 1e6 must fit a long — true for any remotely balanced
    // sharding; the greatest(_, 1) guards the degenerate all-empty
    // corpus). Signed division routed through abs: Spark DIV
    // truncates toward zero while DuckDB // floors, so negative
    // deviations must never hit the integer divide directly
    per.crossJoin(broadcast(per.agg(expr(
        s"greatest(sum(total_chars) DIV $nShards, 1L)")
        .as("__mean_chars"))))
      .select(col("shard"), col("n_docs"), col("total_chars"),
        col("max_doc_chars"),
        expr("""CAST(CASE WHEN total_chars >= __mean_chars
          |  THEN (total_chars - __mean_chars) * 1000000L
          |    DIV __mean_chars
          |  ELSE -((__mean_chars - total_chars) * 1000000L
          |    DIV __mean_chars) END AS BIGINT)""".stripMargin)
          .as("dev_ppm"))
  }

  /** Deterministic WEIGHTED sample without replacement per group
    * (Efraimidis-Spirakis A-ES in its exponential-race form): each
    * row gets e = -ln(u)/w with u the content-hash uniform and w its
    * weight; the k SMALLEST e per group are an exact
    * probability-proportional-to-size draw. Because u comes from the
    * avalanched content hash (not rand()), the draw is reproducible
    * across engines/runs/partitionings — the property a curriculum /
    * mixture sampler needs so a published data recipe can be
    * re-derived. Rank filter pushes into WindowGroupLimit (each
    * shuffle partition forwards k rows per group). Rows with NULL or
    * non-positive weight are excluded (they have zero draw
    * probability).
    */
  def weightedSample(df: DataFrame, group: String, text: String,
      id: String, weightCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(group))
      .orderBy(col("__e"), col(id))
    df.filter(col(weightCol) > 0)
      .withColumn("__h", uniformHash60(text))
      .withColumn("__e",
        -log((col("__h") + 1).cast("double") /
          lit(math.pow(2, 60))) / col(weightCol))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(group), col(id), col(weightCol).as("weight"),
        round(col("__e"), 6).as("es_key"), col("rank"))
  }

  /** Deterministic sampling bucket in [0, 1000): an integer LCG
    * scramble of the id — reproducible across engines, runs, and
    * partitionings (everything `rand()`-based sampling is not), so a
    * sampled corpus can be re-derived exactly from the full one. The
    * id is masked to 2^30 before the multiply so the product stays
    * < 2^62 (no ANSI overflow at any id magnitude). Stratified
    * sampling = per-stratum bucket thresholds (e.g. keep 20% of the
    * dominant language, 50% of the rest — the standard corpus
    * rebalancing step).
    */
  def sampleBucketExpr(id: String, seed: Long): Column = {
    // Reduce the seed into [0, P) Scala-side and use pmod for the
    // outer reductions: a negative (or near-Long.Max) seed would
    // otherwise flip the plain % reductions negative — silently
    // emptying threshold samples like `bucket < 200` — or overflow
    // under ANSI. Values for any seed already in [0, P) are unchanged.
    val s = java.lang.Math.floorMod(seed, P)
    expr(s"pmod(pmod(pmod($id, 1073741824) * 2654435761 + $s, $P), 1000)")
  }

  /** Deterministic train/val/test assignment from the same integer
    * scramble as [[sampleBucketExpr]]: bucket thresholds in per-mille
    * (e.g. 960/20 → 96% train, 2% val, 2% test). Hash-based splits
    * are the only form that survives a growing corpus — a given doc's
    * split never changes when new data arrives, rows never need a
    * global shuffle or a stored assignment table, and the split can
    * be re-derived identically on any engine. (Random splits fail all
    * three at 100 TB.) Narrow per-row projection, zero shuffle.
    */
  def hashSplit(df: DataFrame, id: String, seed: Long,
      trainPerMille: Int = 960, valPerMille: Int = 20): DataFrame = {
    require(trainPerMille > 0 && valPerMille >= 0 &&
      trainPerMille + valPerMille < 1000,
      "need 0 < trainPerMille, 0 <= valPerMille, sum < 1000")
    df.withColumn("bucket",
        sampleBucketExpr(id, seed).cast("long"))
      .withColumn("split",
        when(col("bucket") < trainPerMille, "train")
          .when(col("bucket") < trainPerMille + valPerMille, "val")
          .otherwise("test"))
  }

  /** Sequence packing (concat-and-chunk) for LLM training: documents
    * are deterministically sharded, concatenated in id order within
    * each shard, and the token stream is cut every `seqLen` tokens.
    * Emits per doc: its shard, the token offset where it starts in
    * the shard's stream, and the first/last sequence index it lands
    * in (`pack_first`/`pack_last` — a doc straddles a boundary when
    * they differ).
    *
    * Scale shape: ONE shuffle (hash-shard the corpus), then a
    * per-shard window cumsum. The sequential dependency of packing is
    * inherently per-output-shard; `nShards` is the parallelism knob
    * (one shard ≈ one output file of the tokenized corpus), so wall
    * clock scales with corpus/nShards, never corpus size. The shard
    * comes from the id scramble, so packing is bit-reproducible
    * across runs, engines, and input partitionings.
    */
  def packSequences(df: DataFrame, text: String, id: String,
      seqLen: Int, nShards: Int, seed: Long = 0L,
      tokenCounts: Option[Column] = None): DataFrame = {
    require(seqLen > 0 && nShards > 0, "need seqLen > 0, nShards > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    // tokenCounts swaps in tokenizer-grain counts (e.g. bpeApply's
    // n_bpe_tokens) for the default whitespace accounting
    df.select(col(id),
        tokenCounts.getOrElse(
          PolyHashColumns.textClassStats(col(text))
            .getField("n_tokens")).cast("long").as("n_tokens"),
        pmod(sampleBucketExpr(id, seed), lit(nShards)).cast("long")
          .as("shard"))
      .withColumn("tok_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_first", floor(col("tok_offset") / seqLen))
      .withColumn("pack_last",
        floor((col("tok_offset") + greatest(col("n_tokens"), lit(1L))
          - 1L) / seqLen))
  }

  /** Corpus-frequency quality score — the exact-arithmetic analog of
    * unigram log-prob filtering: build a capped vocabulary (top
    * `vocabSize` tokens by corpus count, ties to the lower hash),
    * then score each doc by its mean token corpus-frequency in parts
    * per million. Rare/garbled text scores near 0, boilerplate
    * scores high; thresholding either tail is the standard
    * perplexity-style gate. All aggregation is integer (token counts
    * summed as longs), so the score is bit-reproducible across
    * engines and partitionings — no transcendentals whose last ulp
    * differs between libms.
    *
    * Scale shape: one explode+count shuffle keyed on the uniform
    * token hash (map-side combine does the heavy lifting), a
    * driver-bounded top-K vocabulary (TakeOrdered, K constant) that
    * re-joins as a broadcast, and one per-doc aggregation shuffle.
    * Docs with zero content tokens are excluded by construction
    * (documented; mirrors [[graft.llm.Dedup.decontaminate]]).
    */
  def unigramFreqScore(df: DataFrame, text: String, id: String,
      vocabSize: Int = 1000): DataFrame = {
    require(vocabSize > 0, "need vocabSize > 0")
    val toks = df
      .select(col(id),
        explode(Dedup.contentTokenHashesExpr(text)).as("tok"))
    // materialize the (vocab-sized) count table once: it feeds both
    // the top-K vocabulary and the total, and without the checkpoint
    // each consumer would re-run the corpus explode+count
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val vocab = counts
      .orderBy(col("cnt").desc, col("tok").asc).limit(vocabSize)
    val total = counts.agg(sum(col("cnt")).cast("long")
      .as("__total"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("cnt"), lit(0L))).as("vocab_count"))
      .crossJoin(broadcast(total))
      .withColumn("freq_ppm",
        round(col("vocab_count").cast("double") / col("n_tokens")
          / col("__total") * 1e6, 6))
      .drop("__total")
  }

  /** Content-defined chunking (the rsync/LBFS/FastCDC family,
    * simplified to the core rolling-hash cut rule): a chunk boundary
    * opens after every position whose k-char shingle hash ≡ 0 mod
    * `divisor`, so expected chunk length ≈ `divisor` and — the CDC
    * property [[chunkDocuments]]'s fixed windows lack — boundaries
    * REALIGN after an insertion/deletion: chunks past the first
    * post-edit boundary are byte-identical to the unedited
    * document's, which is what makes chunk-grain dedup robust to
    * edits. Row-local (native shingle hashing + one HOF pass);
    * all-integer boundary arithmetic keeps the oracle hash-exact.
    * Production knobs (min/max chunk clamps, gear masks) are
    * documented extensions of the same cut rule.
    */
  def cdcChunks(df: DataFrame, text: String, id: String,
      divisor: Int = 64): DataFrame = {
    val k = graft.llm.HashConstants.shingleSize
    df.withColumn("__hs",
        graft.llm.PolyHashColumns.shingleHashes(col(text)))
      .withColumn("__bs", expr(
        s"""CASE WHEN length($text) < $k
            THEN array(1L, CAST(length($text) + 1 AS BIGINT))
            ELSE array_sort(array_distinct(concat(
              array(1L),
              transform(filter(sequence(1, size(__hs)),
                i -> element_at(__hs, i) % $divisor = 0),
                i -> CAST(i + $k AS BIGINT)),
              array(CAST(length($text) + 1 AS BIGINT)))))
            END"""))
      .select(col(id), posexplode(expr(
        s"""CASE WHEN length($text) >= 1
            THEN transform(sequence(1, size(__bs) - 1),
              j -> substring($text, CAST(element_at(__bs, j) AS INT),
                CAST(element_at(__bs, j + 1) - element_at(__bs, j)
                  AS INT)))
            ELSE CAST(array() AS ARRAY<STRING>) END"""))
        .as(Seq("chunk_id", "chunk")))
      .withColumn("chunk_id", col("chunk_id").cast("long"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** Chunk-grain dedup over [[cdcChunks]] output: each distinct
    * chunk text is owned by its FIRST occurrence (total order
    * (doc, chunk_id) via row_number — deterministic on both
    * engines); later occurrences are duplicates. Per doc:
    * duplicate-chunk count, duplicate chars, and the duplicated
    * fraction of the document — the corpus-redundancy report CDC
    * exists to make edit-stable. One exchange keyed on the chunk
    * text (map-side-combined occurrence numbering, same
    * gram→occurrence shape as the span-dedup family; a
    * boilerplate-heavy chunk is a hot key there too and the same
    * hash-key mitigation applies at scale).
    */
  def cdcDedupStats(chunks: DataFrame, id: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk"))
      .orderBy(col(id), col("chunk_id"))
    chunks
      .withColumn("__dup", row_number().over(w) > 1)
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("__dup"), col("chunk_len")).otherwise(0L))
          .as("dup_chars"),
        sum(col("chunk_len")).as("n_chars"))
      .withColumn("dup_frac",
        round(col("dup_chars") / col("n_chars"), 6))
  }

  /** The scrub counterpart: reassemble each document from only its
    * NON-duplicate chunks (first occurrences keep their text; later
    * copies of a chunk vanish corpus-wide) — chunk-grain
    * deduplicated storage, robust to edits because the chunk
    * boundaries are content-defined. Same single chunk-keyed
    * exchange, then a doc-keyed reassembly.
    */
  def cdcScrub(chunks: DataFrame, id: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk"))
      .orderBy(col(id), col("chunk_id"))
    chunks
      .withColumn("__dup", row_number().over(w) > 1)
      .filter(!col("__dup"))
      .groupBy(col(id))
      .agg(concat_ws("", array_sort(collect_list(
        struct(col("chunk_id"), col("chunk")))).getField("chunk"))
        .as("scrubbed"))
      .withColumn("scrubbed_len", length(col("scrubbed")).cast("long"))
  }

  /** Context-window chunking for training-data preparation: fixed
    * character windows with `overlap` chars of overlap (stride =
    * size − overlap), one output row per (doc, chunk), including the
    * short tail window. A narrow per-row explode — no shuffle, chunk
    * count scales with document length, never corpus size, so the
    * stage is embarrassingly parallel at any scale. Token-window
    * variants compose by tokenizing first and windowing the token
    * array with the same stride arithmetic.
    */
  def chunkDocuments(df: DataFrame, text: String, id: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    df.select(col(id),
      posexplode(expr(
        s"""CASE WHEN length($text) >= 1
            THEN transform(sequence(1, length($text), $stride),
                 s -> substring($text, s, $chunkSize))
            ELSE CAST(array() AS ARRAY<STRING>) END"""))
        .as(Seq("chunk_id", "chunk")))
      .withColumn("chunk_id", col("chunk_id").cast("long"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** Repetition ratio — the duplicate-bigram fraction
    * (1 − distinct/total over token 2-grams), the standard
    * boilerplate/repetition quality gate: near-0 for natural prose,
    * near-1 for looping spam. Docs under 2 tokens score 0. Built from
    * a STAGED token-array column (interpreted HOF lambdas re-evaluate
    * inlined subexpressions).
    */
  def repetitionRatioExpr(toksCol: String): Column =
    expr(s"""CASE WHEN size($toksCol) < 2 THEN 0.0D ELSE
             round(1.0D - CAST(size(array_distinct(
                 transform(sequence(1, size($toksCol) - 1),
                   i -> concat(element_at($toksCol, i), ' ',
                        element_at($toksCol, i + 1))))) AS DOUBLE)
               / (size($toksCol) - 1), 6) END""")

  /** TF-IDF top-k terms per document — corpus-level statistics from
    * map-side-combining aggregations only: token explode → (doc, term)
    * tf → document frequency as a SECOND aggregation of the tf frame
    * (one row per (doc, term) — never a countDistinct over raw
    * tokens) → idf = ln((N+1)/(df+1)) + 1 joined on the term → top-k
    * by rank (WindowGroupLimit pushes the k-filter into the sort).
    * The doc count N stays in-plan as a broadcast 1-row frame — no
    * driver-side count().
    */
  def tfIdfTopTerms(df: DataFrame, text: String, id: String,
      k: Int): DataFrame = {
    val tokens = df.select(col(id), explode(expr(
      s"filter(split(lower($text), ' '), t -> length(t) > 2)"))
      .as("term"))
    val tf = tokens.groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val ndocs = df.agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(ndocs))
      .withColumn("tfidf", round(col("tf") *
        (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(id), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** All text stats in one pass.
    *
    * Performance note: higher-order-function expressions (transform/
    * filter/aggregate lambdas) are NOT whole-stage-codegen'd, so a
    * repeated subexpression is re-evaluated interpreted at every
    * occurrence. The token split and per-language hit counts are
    * therefore staged as intermediate columns — CollapseProject keeps
    * an expensive projection separate when it is referenced more than
    * once, so each is computed once per row (measured ~10× faster
    * than the inline form at sf0.1).
    */
  def withStats(df: DataFrame, text: String): DataFrame = {
    val langs = Seq("en", "es", "fr", "de")
    val hitCols = langs.map(l => s"__hits_$l")
    // ONE native pass for every class-based count (replaces three
    // regex scans + a size(split)); the token array survives only for
    // stopword matching
    val staged = df
      .withColumn("__cs", PolyHashColumns.textClassStats(col(text)))
      .withColumn("__toks", expr(s"split(trim($text), '\\\\s+')"))
      .withColumn("__nt", col("__cs.n_tokens"))
    val withHits = langs.foldLeft(staged) { (d, l) =>
      val arr = stopwords(l).map(w => s"'$w'").mkString("array(", ", ", ")")
      d.withColumn(s"__hits_$l",
        expr(s"size(filter(__toks, t -> array_contains($arr, t)))"))
    }
    val best = langs.map { l =>
      val others = langs.filterNot(_ == l)
        .map(o => s"__hits_$o").mkString("greatest(", ", ", ")")
      s"WHEN __hits_$l >= $others AND __hits_$l > 0 THEN '$l'"
    }.mkString(" ")
    val punct = col("__cs.n_punct").cast("double") /
      col("__cs.n_chars").cast("double")
    withHits
      .withColumn("n_tokens", col("__nt"))
      .withColumn("n_bpeish", col("__cs.n_bpeish"))
      .withColumn("punct_ratio", round(punct, 6))
      .withColumn("avg_word_len", round(
        col("__cs.n_nonspace").cast("double") / col("__nt"), 6))
      .withColumn("stopword_ratio",
        round(expr("CAST(__hits_en AS DOUBLE) / __nt"), 6))
      .withColumn("quality", round(
        least(col("__nt").cast("double") / 100.0, lit(1.0)) * 0.4
          + (lit(1.0) - punct) * 0.3
          + least(expr("CAST(__hits_en AS DOUBLE) / __nt") * 4.0,
            lit(1.0)) * 0.3, 6))
      .withColumn("pred_lang", expr(s"CASE $best ELSE 'und' END"))
      .withColumn("fingerprint", fingerprintExpr(text))
      .drop(Seq("__cs", "__toks", "__nt") ++ hitCols: _*)
  }

  // ---- PII redaction ----------------------------------------------
  // Regexes are written with character classes only (no backslash
  // escapes), so the SAME literal string is valid in Spark SQL and in
  // the DuckDB oracle without escape-layer divergence.

  /** Email address pattern (case-insensitive local/domain chars). */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
  /** NANP-style dashed phone pattern. */
  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  /** Dotted-quad IPv4 pattern. */
  val ipRe = "([0-9]{1,3}[.]){3}[0-9]{1,3}"

  /** PII-scrubbed text: emails → [EMAIL], IPv4 → [IP], phones →
    * [PHONE]. Email runs first so its digits/dots can't be half-eaten
    * by the narrower patterns. A narrow per-row projection — the
    * standard pre-training scrub stage, embarrassingly parallel, no
    * shuffle at any corpus size.
    */
  def redactPiiExpr(text: String): Column =
    expr(s"""regexp_replace(regexp_replace(regexp_replace($text,
             '$emailRe', '[EMAIL]'),
             '$ipRe', '[IP]'),
             '$phoneRe', '[PHONE]')""")

  /** Per-category PII hit counts (audit columns for the scrub). */
  def piiCountsExpr(text: String): Seq[(String, Column)] = Seq(
    "n_email" -> expr(s"regexp_count($text, '$emailRe')").cast("long"),
    "n_ip" -> expr(s"regexp_count($text, '$ipRe')").cast("long"),
    "n_phone" -> expr(s"regexp_count($text, '$phoneRe')").cast("long"))

  /** PII count columns + the `pii_gate` verdict (any hit) — the ONE
    * shared construction of the batch release gate and its streaming
    * stage, so the two can never drift out of their spec-pinned
    * bit-parity (round-20 self-review).
    */
  def withPiiGate(df: DataFrame, text: String): DataFrame = {
    val cols = piiCountsExpr(text)
    cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .withColumn("pii_gate",
        cols.map { case (n, _) => col(n) }.reduce(_ + _) > 0)
  }

  // ---- Gopher-style quality rules ---------------------------------

  /** Composite rule-based quality gate (the published Gopher/C4-style
    * heuristics, thresholds as parameters): token-count bounds, mean-
    * word-length bounds, symbol-ratio cap, and a minimum stopword
    * ratio. Emits the per-rule booleans (so a pipeline can audit WHY
    * a doc was dropped) plus the conjunction as `keep`. Per-row
    * projection over one staged class-stats pass — no shuffle.
    */
  def gopherRules(df: DataFrame, text: String,
      minTokens: Int = 40, maxTokens: Int = 1000,
      minAvgWordLen: Double = 2.0, maxAvgWordLen: Double = 12.0,
      maxSymbolRatio: Double = 0.1,
      minStopwordRatio: Double = 0.0): DataFrame = {
    val staged = df
      .withColumn("__cs", PolyHashColumns.textClassStats(col(text)))
      .withColumn("__nt", col("__cs.n_tokens"))
      .withColumn("__awl", col("__cs.n_nonspace").cast("double") /
        col("__nt"))
      .withColumn("__sym", col("__cs.n_punct").cast("double") /
        col("__cs.n_chars"))
      .withColumn("__swr", expr(
        s"""CAST(${hitCount(text, stopwords("en"))} AS DOUBLE)
            / size(split(trim($text), '\\\\s+'))"""))
    staged
      .withColumn("rule_tokens",
        col("__nt") >= minTokens && col("__nt") <= maxTokens)
      .withColumn("rule_word_len",
        col("__awl") >= minAvgWordLen && col("__awl") <= maxAvgWordLen)
      .withColumn("rule_symbols", col("__sym") <= maxSymbolRatio)
      .withColumn("rule_stopwords", col("__swr") >= minStopwordRatio)
      .withColumn("keep",
        col("rule_tokens") && col("rule_word_len") &&
          col("rule_symbols") && col("rule_stopwords"))
      .drop("__cs", "__nt", "__awl", "__sym", "__swr")
  }

  /** Gopher REPETITION signals — the within-document family the
    * composite [[gopherRules]] gate does not cover (Rae et al. 2021,
    * Table A1; the Dolma/RedPajama repetition filters): duplicate-
    * line fraction, duplicate-line CHARACTER fraction, and the
    * character coverage of the single most-repeated word 2-gram and
    * 3-gram. Every hashed column is an integer — fractions ship as
    * parts-per-million BIGINTs from pure integer division, so no
    * float/rounding semantics enter the contract.
    *
    * Scale shape: line and n-gram occurrences EXPLODE to rows and
    * aggregate by (doc_id, gram) — corpus-proportional with map-side
    * combine, never the O(distinct×occurrences) per-row HOF scan a
    * list-based form would cost on a long document. All four
    * aggregates key on doc_id, so AQE reuses one hash partitioning
    * for the joins. Coverage of the TOP gram is
    * `max(count · nonspace_chars)` — deterministic without a
    * cross-engine tiebreak on equal counts. (Union coverage of ALL
    * duplicated n-grams at corpus grain is [[Dedup.spanDedupStats]];
    * this is the row-grain Gopher gate input.)
    */
  def docRepetition(df: DataFrame, text: String, id: String)
      : DataFrame = {
    val d = df.select(col(id).cast("long").as("doc_id"),
      col(text).as("__t"))
    val base = d.select(col("doc_id"))
    val lines = d
      .select(col("doc_id"), explode(expr(
        "filter(split(__t, '\n'), l -> l != '')")).as("line"))
      .groupBy("doc_id", "line").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_lines"),
        sum(col("c") - 1).as("n_dup"),
        sum((col("c") - 1) * length(col("line"))).as("dup_chars"),
        sum(col("c") * length(col("line"))).as("tot_chars"))
    val toks = d.select(col("doc_id"),
      expr("filter(split(lower(__t), ' '), t -> t != '')").as("tk"))
    val wchars = toks.select(col("doc_id"),
      expr("aggregate(tk, 0L, (a, t) -> a + length(t))").as("wchars"))
    def topCover(n: Int) = toks
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(tk) >= $n
            THEN transform(sequence(1, size(tk) - ${n - 1}),
                 i -> concat_ws(' ', slice(tk, i, $n)))
            ELSE array() END""")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        max(col("c") * (length(col("gram")) - (n - 1)))
          .as(s"top${n}_cover"))
    base
      .join(lines, Seq("doc_id"), "left")
      .join(wchars, Seq("doc_id"), "left")
      .join(topCover(2), Seq("doc_id"), "left")
      .join(topCover(3), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        expr("""CASE WHEN n_lines > 0
                THEN n_dup * 1000000L div n_lines
                ELSE 0L END""").as("dup_line_ppm"),
        expr("""CASE WHEN tot_chars > 0
                THEN dup_chars * 1000000L div tot_chars
                ELSE 0L END""").as("dup_char_ppm"),
        expr("""CASE WHEN wchars > 0 AND top2_cover IS NOT NULL
                THEN top2_cover * 1000000L div wchars
                ELSE 0L END""").as("top2_ppm"),
        expr("""CASE WHEN wchars > 0 AND top3_cover IS NOT NULL
                THEN top3_cover * 1000000L div wchars
                ELSE 0L END""").as("top3_ppm"))
  }

  /** Character-bigram Shannon entropy per document (nats, 6dp) — the
    * compressibility/templatedness signal (low entropy = repetitive
    * boilerplate; the cheap stand-in for the gzip-ratio gate some
    * curation stacks run, computable EXACTLY on both engines unlike
    * a codec ratio). H = ln N − (Σ c·ln c)/N over adjacent-codepoint
    * pairs. Cross-engine determinism: a distributed SUM of doubles
    * is order-nondeterministic, so the Σ c·ln c fold runs over the
    * per-doc counts COLLECTED AND SORTED by bigram (binary UTF-8
    * order on both engines) — the same fixed-order-fold discipline
    * as the DSIR/LR scores. Shape: one explode + two doc-keyed
    * aggregates, map-side combining; per-doc state ≤ distinct
    * bigrams ≤ min(doc length, alphabet²).
    *
    * ENCODING ASSUMPTION (BMP-only bit parity): Spark's
    * `split(text, '')` splits on UTF-16 code units while the DuckDB
    * mirror's `string_split(text, '')` is codepoint-based, so on
    * non-BMP characters (surrogate pairs: emoji, rare CJK) the
    * bigram sets — and therefore the 6dp entropy — diverge between
    * engines. The test corpus is pure ASCII so the parity contract
    * holds exactly; for a non-ASCII corpus, normalize both engines
    * to codepoints (Spark: bigram over `Dedup.codepointsExpr`-style
    * arrays) before trusting cross-engine hashes.
    */
  def charEntropy(df: DataFrame, text: String, id: String)
      : DataFrame = {
    val d = df.select(col(id).cast("long").as("doc_id"),
      col(text).as("__t"))
    val counts = d
      .select(col("doc_id"), expr("split(__t, '')").as("__cs"))
      .filter(size(col("__cs")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(__cs) - 1),
           i -> concat(element_at(__cs, i),
                       element_at(__cs, i + 1)))""")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
    val ent = counts.groupBy("doc_id")
      .agg(expr("sort_array(collect_list(struct(bg, c)))").as("__bc"),
        sum(col("c")).as("__n"))
      .select(col("doc_id"), col("__n").cast("long").as("n_bigrams"),
        round(expr(
          """ln(CAST(__n AS DOUBLE)) -
             aggregate(__bc, CAST(0 AS DOUBLE),
               (a, s) -> a + s.c * ln(CAST(s.c AS DOUBLE))) / __n"""),
          6).as("entropy"))
    d.select(col("doc_id"))
      .join(ent, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"))
  }

  /** Column-append, ROW-LOCAL form of [[charEntropy]] (same
    * n_bigrams/entropy values to the bit: the per-row fold visits
    * distinct bigrams in the same sorted order as the batch form's
    * sorted collect) — drops into a streaming stage
    * ([[graft.streaming.StreamingDedup.entropyStage]]) or any plan
    * with zero shuffle. Same per-row O(distinct×occurrences) trade
    * as [[withDocRepetition]]: right for bounded stream records, use
    * the batch explode form over a corpus.
    */
  def withCharEntropy(df: DataFrame, text: String): DataFrame = {
    val internals = Seq("__ce_cs", "__ce_bg", "__ce_d", "__ce_n")
    val clash = (internals ++ Seq("n_bigrams", "entropy"))
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"withCharEntropy: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    df.withColumn("__ce_cs", expr(s"split($text, '')"))
      .withColumn("__ce_bg", expr(
        """CASE WHEN size(__ce_cs) >= 2
           THEN transform(sequence(1, size(__ce_cs) - 1),
                i -> concat(element_at(__ce_cs, i),
                            element_at(__ce_cs, i + 1)))
           ELSE array() END"""))
      .withColumn("__ce_d", expr("array_sort(array_distinct(__ce_bg))"))
      .withColumn("__ce_n", expr("CAST(size(__ce_bg) AS BIGINT)"))
      .withColumn("n_bigrams", col("__ce_n"))
      .withColumn("entropy", expr(
        """CASE WHEN __ce_n > 0 THEN
             round(ln(CAST(__ce_n AS DOUBLE)) -
               aggregate(__ce_d, CAST(0 AS DOUBLE),
                 (a, g) -> a +
                   CAST(size(filter(__ce_bg, x -> x = g)) AS BIGINT)
                   * ln(CAST(size(filter(__ce_bg, x -> x = g))
                        AS DOUBLE))) / __ce_n, 6)
           ELSE CAST(0 AS DOUBLE) END"""))
      .drop(internals: _*)
  }

  /** Column-append, ROW-LOCAL form of [[docRepetition]]: the same
    * five repetition signals (identical integer ppm values) computed
    * entirely in-row with HOFs, keeping every input column — so it
    * drops into a streaming stage
    * ([[graft.streaming.StreamingDedup.repetitionStage]]) or any
    * plan with zero shuffle and zero state. The price of
    * statelessness is the per-row O(distinct×occurrences) HOF scan
    * the batch form's explode+aggregate deliberately avoids — fine
    * for stream records (bounded docs), wrong for a batch corpus
    * with pathologically long documents; use [[docRepetition]]
    * there. Parity is exact: same integer arithmetic, spec-pinned
    * against the batch form.
    */
  def withDocRepetition(df: DataFrame, text: String): DataFrame = {
    val outs = Seq("n_lines", "dup_line_ppm", "dup_char_ppm",
      "top2_ppm", "top3_ppm")
    val internals = Seq("__rep_ls", "__rep_ld", "__rep_tk", "__rep_g2",
      "__rep_g3", "__rep_nl", "__rep_nd", "__rep_dc", "__rep_tc",
      "__rep_wc", "__rep_c2", "__rep_c3")
    val clash = (outs ++ internals).filter(df.columns.contains)
    require(clash.isEmpty,
      s"withDocRepetition: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    def gramCol(tk: String, n: Int) =
      s"""CASE WHEN size($tk) >= $n
          THEN transform(sequence(1, size($tk) - ${n - 1}),
               i -> concat_ws(' ', slice($tk, i, $n)))
          ELSE array() END"""
    def coverCol(g: String, n: Int) =
      s"""aggregate(array_distinct($g), 0L, (a, g) ->
          greatest(a, (CAST(size(filter($g, x -> x = g)) AS BIGINT))
                      * (length(g) - ${n - 1})))"""
    df.withColumn("__rep_ls",
        expr(s"filter(split($text, '\n'), l -> l != '')"))
      .withColumn("__rep_ld", expr("array_distinct(__rep_ls)"))
      .withColumn("__rep_nl", expr("CAST(size(__rep_ls) AS BIGINT)"))
      .withColumn("__rep_nd",
        expr("__rep_nl - CAST(size(__rep_ld) AS BIGINT)"))
      .withColumn("__rep_dc", expr(
        """aggregate(__rep_ld, 0L, (a, d) ->
           a + (CAST(size(filter(__rep_ls, l -> l = d)) AS BIGINT) - 1)
               * length(d))"""))
      .withColumn("__rep_tc", expr(
        "aggregate(__rep_ls, 0L, (a, l) -> a + length(l))"))
      .withColumn("__rep_tk",
        expr(s"filter(split(lower($text), ' '), t -> t != '')"))
      .withColumn("__rep_wc", expr(
        "aggregate(__rep_tk, 0L, (a, t) -> a + length(t))"))
      .withColumn("__rep_g2", expr(gramCol("__rep_tk", 2)))
      .withColumn("__rep_g3", expr(gramCol("__rep_tk", 3)))
      .withColumn("__rep_c2", expr(coverCol("__rep_g2", 2)))
      .withColumn("__rep_c3", expr(coverCol("__rep_g3", 3)))
      .withColumn("n_lines", col("__rep_nl"))
      .withColumn("dup_line_ppm", expr(
        """CASE WHEN __rep_nl > 0
           THEN __rep_nd * 1000000L div __rep_nl ELSE 0L END"""))
      .withColumn("dup_char_ppm", expr(
        """CASE WHEN __rep_tc > 0
           THEN __rep_dc * 1000000L div __rep_tc ELSE 0L END"""))
      .withColumn("top2_ppm", expr(
        """CASE WHEN __rep_wc > 0 AND __rep_c2 > 0
           THEN __rep_c2 * 1000000L div __rep_wc ELSE 0L END"""))
      .withColumn("top3_ppm", expr(
        """CASE WHEN __rep_wc > 0 AND __rep_c3 > 0
           THEN __rep_c3 * 1000000L div __rep_wc ELSE 0L END"""))
      .drop(internals: _*)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each doc
    * with the log-likelihood ratio `log p_target(x) − log p_raw(x)`
    * under add-1-smoothed bag-of-hashed-token models fitted on the
    * `domain == target` docs vs the rest of the corpus — the
    * published hashed-n-gram data-selection recipe. Ranking by this
    * score and resampling is the selection step
    * ([[weightedSample]] is the reproducible resampling half).
    *
    * Scale shape: the FIT is one explode+aggregate pass (map-side
    * combine on (side, bucket), 2×dim rows) collapsed to a single
    * row that rides into the scoring projection as a BROADCAST
    * scalar — so scoring is row-local and adds zero shuffle at any
    * corpus size; refitting streams one aggregate over the corpus.
    * The score folds buckets in index order on both engines and is
    * rounded to 6dp — the established cross-engine `ln()` grain
    * (bigram_lm_score precedent); counts and totals stay integers
    * until the final division.
    */
  def dsirWeights(df: DataFrame, text: String, id: String,
      domain: String, target: String, dim: Int = 32): DataFrame = {
    val th = dsirCounts(df, text, id, domain, target, dim)
    val consts = dsirFitFrame(th).agg(
      max(when(col("__is_t"), col("vs"))).as("tv"),
      max(when(col("__is_t"), col("tot"))).as("tt"),
      max(when(!col("__is_t"), col("vs"))).as("rv"),
      max(when(!col("__is_t"), col("tot"))).as("rt"))
      // a corpus with only one side makes the other side's
      // max(when(...)) NULL and every score silently NULL — fail
      // loudly instead, like dsirFit's require, but in-plan (the
      // guard rides the single broadcast row; no extra job)
      .select(
        when(col("tt").isNotNull && col("rt").isNotNull, col("tv"))
          .otherwise(raise_error(lit("dsirWeights: corpus must " +
            "contain both target and non-target docs"))).as("tv"),
        col("tt"), col("rv"), col("rt"))
    th.crossJoin(broadcast(consts))
      .select(col("doc_id"), col("__is_t").as("is_target"),
        round(expr(
          s"""aggregate(sequence(0, ${dim - 1}), CAST(0 AS DOUBLE),
              (acc, b) -> acc + element_at(__cnt, b + 1) *
                (ln((element_at(tv, b + 1) + 1) / (tt + $dim))
                 - ln((element_at(rv, b + 1) + 1) / (rt + $dim))))"""),
          6).as("dsir_score"))
  }

  /** (doc_id, __is_t, __cnt) hashed-bucket count frame shared by the
    * in-plan [[dsirWeights]] and the collecting [[dsirFit]].
    */
  private def dsirCounts(df: DataFrame, text: String, id: String,
      domain: String, target: String, dim: Int): DataFrame =
    df.select(col(id).cast("long").as("doc_id"),
        (col(domain) === target).as("__is_t"),
        Dedup.contentTokenHashesExpr(text).as("__th"))
      .filter(size(col("__th")) > 0)
      .withColumn("__cnt",
        PolyHashColumns.featureHashCounts(col("__th"), dim))
      .drop("__th")

  /** Per-side fitted totals: one row per side with the bucket-count
    * vector (index order) and the grand total.
    */
  private def dsirFitFrame(counts: DataFrame): DataFrame =
    counts
      .select(col("__is_t"), posexplode(col("__cnt")).as(Seq("b", "v")))
      .groupBy("__is_t", "b").agg(sum(col("v")).cast("long").as("v"))
      .groupBy("__is_t").agg(
        expr("transform(sort_array(collect_list(struct(b, v))), s -> s.v)")
          .as("vs"),
        sum(col("v")).as("tot"))

  /** A fitted DSIR model: per-bucket totals + grand totals for the
    * target and raw sides. 2×dim longs — a plan literal at any
    * corpus size.
    */
  case class DsirModel(tv: Array[Long], tt: Long,
      rv: Array[Long], rt: Long, dim: Int)

  /** Fit the DSIR model and ship it driver-side (the "fit offline on
    * a reference corpus" half — [[withDsirScore]] scores any frame,
    * batch or streaming, with the result as plan literals). One
    * explode+aggregate pass; collects exactly two rows.
    */
  def dsirFit(df: DataFrame, text: String, id: String,
      domain: String, target: String, dim: Int = 32): DsirModel = {
    val sides = dsirFitFrame(
        dsirCounts(df, text, id, domain, target, dim))
      .collect()
      .map(r => r.getBoolean(0) ->
        ((r.getSeq[Long](1).toArray, r.getLong(2)))).toMap
    require(sides.contains(true) && sides.contains(false),
      "dsirFit: corpus must contain both target and non-target docs")
    val (tv, tt) = sides(true)
    val (rv, rt) = sides(false)
    DsirModel(tv, tt, rv, rt, dim)
  }

  /** Column-append scoring half of [[dsirWeights]]: the SAME
    * embedding + index-order fold (bit-identical expression types, so
    * scores equal the in-plan fit to the last bit), with the fitted
    * totals as plan LITERALS — row-local and join-free, so it drops
    * into a streaming stage
    * ([[graft.streaming.StreamingDedup.dsirScoreStage]]) or any
    * batch plan with zero shuffle and zero state. Docs with zero
    * content tokens are dropped (the model is undefined on them),
    * matching [[dsirWeights]].
    */
  def withDsirScore(df: DataFrame, text: String, model: DsirModel)
      : DataFrame = {
    val th = "__dsir_th"; val cnt = "__dsir_cnt"
    val clash = Seq(th, cnt, "dsir_score").filter(df.columns.contains)
    require(clash.isEmpty,
      s"withDsirScore: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    val dim = model.dim
    require(model.tv.length == dim && model.rv.length == dim,
      s"withDsirScore: model arrays must have length $dim")
    val tv = model.tv.mkString("array(", "L, ", "L)")
    val rv = model.rv.mkString("array(", "L, ", "L)")
    df.withColumn(th, Dedup.contentTokenHashesExpr(text))
      .filter(size(col(th)) > 0)
      .withColumn(cnt,
        PolyHashColumns.featureHashCounts(col(th), dim))
      .withColumn("dsir_score", round(expr(
        s"""aggregate(sequence(0, ${dim - 1}), CAST(0 AS DOUBLE),
            (acc, b) -> acc + element_at($cnt, b + 1) *
              (ln((element_at($tv, b + 1) + 1)
                  / (${model.tt}L + $dim))
               - ln((element_at($rv, b + 1) + 1)
                    / (${model.rt}L + $dim))))"""), 6))
      .drop(th, cnt)
  }

  /** Per-domain document cap: keep at most `n` rows per `domain`,
    * highest `priority` first (ties broken by ascending `id` for
    * determinism). The corpus-rebalancing stage that stops one crawl
    * host from dominating the training mix. ONE shuffle on the
    * domain key; Spark's WindowGroupLimit rewrite pushes the rank
    * cutoff below the per-partition sort, so no domain is ever fully
    * sorted — only its running top-n is kept (the two-phase top-k
    * shape that survives domain skew at scale).
    */
  def capPerDomain(df: DataFrame, domain: String, priority: Column,
      id: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domain))
      .orderBy(priority.desc, col(id).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** BPE merge-step statistics: corpus-wide frequency of adjacent
    * character pairs WITHIN words (lowercased, whitespace-split),
    * ranked — exactly the count a byte-pair-encoding tokenizer
    * trainer computes to pick its next merge; running it against a
    * candidate corpus is the standard "does my tokenizer fit this
    * data" probe. Scale shape: two narrow explodes (pairs per row ∝
    * characters) into ONE map-side-combining groupBy on the pair —
    * the top-k is a single-column sort of the tiny aggregated side
    * (≤ alphabet², not corpus-sized). Per-char substring is O(i)
    * positional UTF-8 scan, acceptable because words are short; a
    * 100 TB run would stage codepoints once per word instead.
    */
  def bpePairCounts(df: DataFrame, text: String, k: Int = 20)
      : DataFrame = {
    // top-k = distributed TakeOrdered, rank = predecessor self-join
    // inside the k-row frame (round 16: same values as the old
    // rank<=k window, zero WindowExec)
    val top = df.select(explode(expr(
        s"filter(split(lower($text), ' '), t -> length(t) >= 2)"))
        .as("__w"))
      .select(explode(expr(
        "transform(sequence(1, length(__w) - 1), i -> substring(__w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)
      .localCheckpoint()
    top
      .join(broadcast(top.select(col("pair").as("__qp"),
          col("cnt").as("__qc"))),
        col("cnt") < col("__qc") ||
          (col("cnt") === col("__qc") && col("pair") > col("__qp")),
        "left")
      .groupBy(col("pair"), col("cnt"))
      .agg((count(col("__qp")) + lit(1L)).as("rank"))
      .select(col("pair"), col("cnt"), col("rank"))
  }

  /** BPE tokenizer fit + apply: learns `numMerges` byte-pair merges
    * on the corpus (classic Sennrich training on the word-frequency
    * table — each round merges the most frequent adjacent symbol
    * pair, ties broken by pair ascending for determinism) and emits
    * each document's BPE token sequence and count. This is the
    * tokenizer-grain token accounting [[bpePairCounts]] only
    * computes statistics for; the `n_bpe_tokens` output (or the
    * tokens themselves) feeds [[packSequences]] via its
    * `tokenCounts` hook.
    *
    * Words are represented as single-space-delimited symbol strings
    * (`" a b c "`). One merge round rewrites every word with three
    * plain `replace` calls: double every delimiter, replace
    * `" a  b "` with `" ab "`, collapse doubles — with doubled
    * delimiters each pair occurrence owns a private leading AND
    * trailing space, so one left-to-right replace-all IS the greedy
    * non-overlapping BPE merge scan (adjacent occurrences no longer
    * share the boundary space that a single-space encoding loses to
    * the first match). `replace` has identical left-to-right
    * semantics in Spark and DuckDB, which is what makes the oracle
    * exact.
    *
    * Scale shape: the fit loop runs entirely on the DISTINCT-WORD
    * frame (vocabulary-sized, orders of magnitude below corpus) —
    * per round one map-side-combined pair aggregate, a 1-row
    * TakeOrdered argmax crossed back as a broadcast, and a row-local
    * rewrite, with `localCheckpoint` truncating lineage exactly as
    * the connected-components loop does. The corpus itself is
    * touched twice: one groupBy to build word counts, and one
    * broadcast join word→tokens for the apply (the only
    * corpus-sized shuffle is the final per-doc groupBy on the
    * well-distributed doc id). No driver-side data path: the argmax
    * stays in the plan.
    *
    * Docs with zero content tokens are excluded by construction
    * (mirrors [[unigramFreqScore]]).
    */
  def bpeApply(df: DataFrame, text: String, id: String,
      numMerges: Int = 10): DataFrame = {
    require(numMerges >= 0, "need numMerges >= 0")
    val wordsOf = expr(
      s"filter(split(lower($text), ' '), t -> t != '')")
    var vocab = df.select(explode(wordsOf).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      // " a b c ": space-delimited symbols with boundary spaces;
      // [^ ] (not .) so newline-class chars split identically to
      // DuckDB's RE2
      .withColumn("repr", concat(lit(" "),
        regexp_replace(col("word"), "([^ ])", "$1 ")))
      // lazy: strictly sequential consumers (see bpeFitVocab's note)
      .localCheckpoint(eager = false)
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // winner collected DRIVER-SIDE (round 17, the batched-fit
      // recipe): one TakeOrdered job per round instead of a
      // broadcast-agg subtree riding inside the rewrite job — the
      // stage-floor index showed the BPE-fit chains are the
      // registry's largest scheduler-floor block. An empty result
      // (no mergeable pair left) ends the loop; the previous form
      // folded an empty merge array — the identity — for the
      // remaining rounds, so outputs are unchanged. The winner rides
      // back as a plan literal exactly like the batched loop's.
      val best = vocab
        .select(col("cnt"),
          expr("filter(split(repr, ' '), x -> x != '')").as("__t"))
        .filter(size(col("__t")) >= 2)
        .select(col("cnt"), explode(expr(
          """transform(sequence(1, size(__t) - 1),
             i -> struct(element_at(__t, i) AS a,
                         element_at(__t, i + 1) AS b))""")).as("__p"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum(col("cnt")).as("__c"))
        .orderBy(col("__c").desc, col("a").asc, col("b").asc)
        .limit(1)
        .select(col("a"), col("b"))
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val ms = best.toSeq
          .map(r => BpeMerge(r.getString(0), r.getString(1)))
        vocab = vocab
          .withColumn("__bpe_ms", typedlit(ms))
          .withColumn("repr", graft.llm.PolyHashColumns
            .bpeFold(col("repr"), col("__bpe_ms")))
          .drop("__bpe_ms")
          .localCheckpoint(eager = false)
      }
      round += 1
    }
    val perWord = vocab.select(col("word"),
      expr("filter(split(repr, ' '), x -> x != '')").as("__toks"))
    df.select(col(id), posexplode(wordsOf).as(Seq("__pos", "word")))
      .join(broadcast(perWord), Seq("word"))
      .groupBy(col(id))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__toks"))))
        .as("__o"))
      .withColumn("tokens",
        flatten(expr("transform(__o, s -> s.__toks)")))
      .select(col(id),
        size(col("tokens")).cast("long").as("n_bpe_tokens"),
        col("tokens"))
  }

  /** Batched BPE tokenizer fit + apply — the scale path past
    * [[bpeApply]]'s one-merge-per-round driver loop. Per round it
    * computes the pair counts ONCE and selects up to `batch` merges
    * by the dominance-disjoint rule: candidates are the top
    * `4*batch` pairs by (count desc, a asc, b asc), and a candidate
    * survives iff NO higher-ranked candidate (kept or discarded)
    * shares a symbol with it. Survivor pairs are pairwise
    * symbol-disjoint, and disjoint merges commute — a merge only
    * fuses two adjacent symbols, it never creates or destroys an
    * adjacency between OTHER symbols — so applying the batch
    * left-to-right in rank order is faithful greedy BPE for every
    * selected pair, and `ceil(merges/batch)` rounds replace
    * `merges` driver round-trips (the wall-time becomes sub-linear
    * in merges). Dominance (rather than greedy-vs-kept-only)
    * filtering picks slightly fewer pairs per round but is a pure
    * per-candidate predicate over the ranked top-C frame — one
    * tiny anti-join, expressible identically in SQL, no sequential
    * scan anywhere.
    *
    * The whole batch is applied in ONE higher-order fold over a
    * broadcast merge array (the per-merge rewrite is [[bpeApply]]'s
    * doubled-delimiter triple-replace, unchanged), so a round costs
    * one pair aggregate + one TakeOrdered + one anti-join on ≤4·batch
    * rows + one row-local rewrite of the vocabulary frame,
    * `localCheckpoint` truncating lineage per round. Merge count per
    * round is data-dependent (≤ batch); `rounds*batch` bounds the
    * total. Word-grain boundary, same as [[bpeApply]]: merges are
    * learned within lowercased whitespace-split words, not at byte
    * grain across word boundaries — a production tokenizer would run
    * the same loop over byte-level pre-tokens.
    */
  def bpeApplyBatched(df: DataFrame, text: String, id: String,
      rounds: Int = 7, batch: Int = 8): DataFrame = {
    val (vocab, _) = bpeFitVocab(df, text, rounds, batch)
    val wordsOf = expr(
      s"filter(split(lower($text), ' '), t -> t != '')")
    val perWord = vocab.select(col("word"),
      expr("filter(split(repr, ' '), x -> x != '')").as("__toks"))
    df.select(col(id), posexplode(wordsOf).as(Seq("__pos", "word")))
      .join(broadcast(perWord), Seq("word"))
      .groupBy(col(id))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__toks"))))
        .as("__o"))
      .withColumn("tokens",
        flatten(expr("transform(__o, s -> s.__toks)")))
      .select(col(id),
        size(col("tokens")).cast("long").as("n_bpe_tokens"),
        col("tokens"))
  }

  /** One fitted merge rule: fuse adjacent symbols `a b → ab`. */
  case class BpeMerge(a: String, b: String)

  /** Byte-level BPE fit + apply — the production tokenizer grain
    * (GPT-2/Llama style). Merges are learned over each word's UTF-8
    * BYTES: the seed symbols are two-hex-digit byte literals
    * (`é` starts as `c3 a9`), so the base alphabet is the 256 bytes
    * and EVERY word tokenizes with zero UNKs — an unmerged byte
    * simply surfaces as a one-byte token (the byte-fallback
    * property). This changes fertility on non-ASCII text relative to
    * the char-grain fit ([[bpeApplyBatched]]): a char fit gets 'é'
    * as ONE seed symbol for free, the byte fit must spend a learned
    * merge to fuse `c3 a9` — so a vocabulary fitted on mostly-ASCII
    * data fragments multibyte scripts harder, which is exactly the
    * bias the fertility contrast query measures. Same batched
    * dominance-disjoint fit loop, same doubled-delimiter fold, same
    * one-fold-per-distinct-word apply shape as [[bpeApplyBatched]];
    * output tokens are lowercase hex strings (merged symbols are
    * concatenated hex runs, decodable back to bytes).
    */
  def bpeBytesApply(df: DataFrame, text: String, id: String,
      rounds: Int = 10, batch: Int = 8): DataFrame = {
    val (vocab, _) = bpeFitVocab(df, text, rounds, batch,
      byteGrain = true)
    val wordsOf = expr(
      s"filter(split(lower($text), ' '), t -> t != '')")
    val perWord = vocab.select(col("word"),
      expr("filter(split(repr, ' '), x -> x != '')").as("__toks"))
    df.select(col(id), posexplode(wordsOf).as(Seq("__pos", "word")))
      .join(broadcast(perWord), Seq("word"))
      .groupBy(col(id))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__toks"))))
        .as("__o"))
      .withColumn("tokens",
        flatten(expr("transform(__o, s -> s.__toks)")))
      .select(col(id),
        size(col("tokens")).cast("long").as("n_bpe_tokens"),
        col("tokens"))
  }

  /** Fit-only half of [[bpeApplyBatched]]: the ordered merge-rule
    * table (round order, rank order within a round) — the tokenizer
    * ARTIFACT a pipeline fits once on a reference corpus and then
    * ships to any apply site: [[bpeApplyWithMerges]] in batch,
    * [[graft.streaming.StreamingDedup.tokenizerStage]] on a live
    * feed. ≤ rounds·batch tiny rows; merge tables are model metadata
    * (like IVF centroids), broadcast-scale by construction.
    */
  def bpeFitMerges(df: DataFrame, text: String,
      rounds: Int = 7, batch: Int = 8): Seq[BpeMerge] =
    bpeFitVocab(df, text, rounds, batch)._2

  /** Shared batched fit loop: per round, pair counts once →
    * dominance-disjoint survivor batch → one HOF-fold vocabulary
    * rewrite, `localCheckpoint` truncating lineage. Returns the
    * rewritten per-word vocabulary AND the accumulated merge rules.
    * The ≤batch survivor rows come to the driver each round — the
    * previous `broadcast(batchRow)` collected the same rows
    * driver-side anyway — which also enables an early exit once the
    * vocabulary has no mergeable pair left.
    */
  private def bpeFitVocab(df: DataFrame, text: String,
      rounds: Int, batch: Int, byteGrain: Boolean = false)
      : (DataFrame, Seq[BpeMerge]) = {
    require(rounds >= 0 && batch >= 1, "need rounds >= 0, batch >= 1")
    val candCap = 4 * batch
    val wordsOf = expr(
      s"filter(split(lower($text), ' '), t -> t != '')")
    // seed symbols: one per character (char grain) or one lowercase
    // two-hex-digit literal per UTF-8 byte (byte grain — hex keeps
    // symbols in the same space-delimited repr the fold machinery
    // and the DuckDB mirror already share)
    val seedRepr =
      if (byteGrain)
        concat(lit(" "), regexp_replace(
          lower(hex(encode(col("word"), "UTF-8"))), "(..)", "$1 "))
      else
        concat(lit(" "), regexp_replace(col("word"), "([^ ])", "$1 "))
    // LAZY checkpoints in this loop (round 21): each round's vocab
    // has strictly SEQUENTIAL consumers — the next round's
    // driver-side TakeOrdered collect materializes it, then the
    // rewrite reads the already-cached blocks — so the lazy-persist
    // consumer race (the winnowPairs 20.5 s lesson) cannot occur
    // here, and the per-round eager materialization job disappears:
    // the fit chain drops from ~2 jobs per round to ~1. Lineage is
    // still truncated per round (the checkpoint plan node is built
    // eagerly; only the materialization folds into the collect).
    var vocab = df.select(explode(wordsOf).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("repr", seedRepr)
      .localCheckpoint(eager = false)
    val fitted = Seq.newBuilder[BpeMerge]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val pairs = vocab
        .select(col("cnt"),
          expr("filter(split(repr, ' '), x -> x != '')").as("__t"))
        .filter(size(col("__t")) >= 2)
        .select(col("cnt"), explode(expr(
          """transform(sequence(1, size(__t) - 1),
             i -> struct(element_at(__t, i) AS a,
                         element_at(__t, i + 1) AS b))""")).as("__p"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum(col("cnt")).as("__c"))
      // TakeOrdered top-C (no full-table single-partition window),
      // then rank + dominance-disjoint survivor selection DRIVER-SIDE
      // on the collected ≤candCap-row frame (round 17; previously a
      // checkpoint + broadcast rank join + anti-join — correct, but 2
      // extra jobs and a checkpoint PER ROUND, and the stage-floor
      // index showed the BPE-fit family at 47-80 sequential jobs is
      // the registry's largest scheduler-floor block; the ≤batch
      // survivors came to the driver anyway). Replay is EXACT: the
      // cut's (cnt desc, a asc, b asc) order is strict and total
      // (pairs are distinct after the groupBy), TakeOrdered output
      // arrives in that order, so the old predecessor-count rank ==
      // position + 1, and the old anti-join rule "blocked by ANY
      // higher-ranked candidate sharing a symbol" is the prefix scan
      // below — fitted merge tables, and every oracle replaying
      // them, stay bit-identical. candCap is a constant: the collect
      // is ≤ 4·batch tiny rows at any corpus size.
      val topC = pairs
        .orderBy(col("__c").desc, col("a").asc, col("b").asc)
        .limit(candCap)
        .collect()
        .map(r => (r.getString(0), r.getString(1)))
      val ms = topC.zipWithIndex.filter { case ((a, b), i) =>
          !topC.take(i).exists { case (ja, jb) =>
            ja == a || ja == b || jb == a || jb == b }
        }
        .take(batch)
        .map { case ((a, b), _) => BpeMerge(a, b) }.toSeq
      if (ms.isEmpty) exhausted = true
      else {
        fitted ++= ms
        // merges in rank order as a plan literal; the per-merge
        // rewrite is bpeApply's doubled-delimiter triple-replace
        vocab = vocab
          .withColumn("__bpe_ms", typedlit(ms))
          .withColumn("repr", graft.llm.PolyHashColumns
            .bpeFold(col("repr"), col("__bpe_ms")))
          .drop("__bpe_ms")
          .localCheckpoint(eager = false)
      }
      round += 1
    }
    (vocab, fitted.result())
  }

  /** Apply-only half: tokenize with an ALREADY-FITTED merge table.
    * The fold runs once per DISTINCT word (broadcast join back to
    * the corpus — [[bpeApplyBatched]]'s apply shape); the merge
    * rules ride as a plan literal, so there is no fit-side job at
    * all. Same output contract as [[bpeApplyBatched]]: (id,
    * n_bpe_tokens, tokens), zero-content-token docs dropped.
    */
  def bpeApplyWithMerges(df: DataFrame, text: String, id: String,
      merges: Seq[BpeMerge]): DataFrame =
    bpeApplyWithMergesImpl(df, text, id, merges, byteGrain = false)

  /** Byte-grain fit-only half ([[bpeBytesApply]]'s merge table) —
    * the artifact to fit on a reference corpus and ship to
    * [[bpeBytesApplyWithMerges]]; with the 256-byte base alphabet
    * the table is the ONLY model state a byte-level tokenizer has.
    */
  def bpeBytesFitMerges(df: DataFrame, text: String,
      rounds: Int = 10, batch: Int = 8): Seq[BpeMerge] =
    bpeFitVocab(df, text, rounds, batch, byteGrain = true)._2

  /** Byte-grain apply with an already-fitted merge table. This is
    * where byte FALLBACK does its work: a word whose characters the
    * fit corpus never saw still tokenizes — its unseen bytes simply
    * surface unmerged (two hex-symbol tokens per 2-byte codepoint),
    * where a char-grain tokenizer emits the unseen char as one seed
    * symbol. The fertility contrast between the two on out-of-fit
    * scripts is the re-billing the `fertility_bytes` query measures.
    */
  def bpeBytesApplyWithMerges(df: DataFrame, text: String, id: String,
      merges: Seq[BpeMerge]): DataFrame =
    bpeApplyWithMergesImpl(df, text, id, merges, byteGrain = true)

  private def bpeApplyWithMergesImpl(df: DataFrame, text: String,
      id: String, merges: Seq[BpeMerge], byteGrain: Boolean)
      : DataFrame = {
    val wordsOf = expr(
      s"filter(split(lower($text), ' '), t -> t != '')")
    val seed =
      if (byteGrain)
        concat(lit(" "), regexp_replace(
          lower(hex(encode(col("word"), "UTF-8"))), "(..)", "$1 "))
      else
        concat(lit(" "), regexp_replace(col("word"), "([^ ])", "$1 "))
    val perWord = df.select(explode(wordsOf).as("word")).distinct()
      .withColumn("__bpe_ms", typedlit(merges))
      .withColumn("__folded",
        graft.llm.PolyHashColumns.bpeFold(seed, col("__bpe_ms")))
      .withColumn("__toks",
        expr("filter(split(__folded, ' '), x -> x != '')"))
      .select(col("word"), col("__toks"))
    df.select(col(id), posexplode(wordsOf).as(Seq("__pos", "word")))
      .join(broadcast(perWord), Seq("word"))
      .groupBy(col(id))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__toks"))))
        .as("__o"))
      .withColumn("tokens",
        flatten(expr("transform(__o, s -> s.__toks)")))
      .select(col(id),
        size(col("tokens")).cast("long").as("n_bpe_tokens"),
        col("tokens"))
  }

  /** Bigram language-model quality score: per document, the mean
    * add-1-smoothed log-probability of its token bigrams under the
    * corpus's OWN bigram statistics, ln((C(ab)+1)/(C(a)+V)) — the
    * cheap LM-perplexity stand-in used to rank documents by fluency
    * before any neural scorer exists (a doc of improbable token
    * transitions scores low). Docs with fewer than two content
    * tokens are excluded. Scale shape: the bigram and unigram count
    * tables are map-side-combined groupBys on the gram, persisted
    * (they are read twice: once for the size guard, once for the
    * join) and BROADCAST to the corpus-sized pair frame — token keys
    * are Zipf-skewed ("the" lands in every partition), so a shuffle
    * join keyed on raw tokens is a skew hazard at 100 TB; with the
    * lookups broadcast, the only shuffle of corpus-sized data is the
    * final per-doc groupBy, keyed on the well-distributed doc id.
    * Above `maxBroadcastRows` (a corpus whose distinct-bigram table
    * no longer fits a broadcast) it falls back to a deterministic
    * salted shuffle join: the probe side gets a hash-derived salt,
    * the count tables are replicated across all salt values, so no
    * single reducer owns all of a hot token's rows.
    */
  def bigramLmScore(df: DataFrame, text: String, id: String,
      maxBroadcastRows: Long = 50000000L): DataFrame = {
    val toks = df
      .withColumn("__t",
        expr(s"filter(split(lower($text), ' '), t -> t != '')"))
      .filter(size(col("__t")) >= 2)
    val pairs = toks.select(col(id), explode(expr(
      """transform(sequence(1, size(__t) - 1),
         i -> named_struct('a', element_at(__t, i),
                           'b', element_at(__t, i + 1)))"""))
      .as("__p"))
      .select(col(id), col("__p.a").as("a"), col("__p.b").as("b"))
    val uni = toks.select(explode(col("__t")).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("ca"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val voc = uni.agg(count(lit(1)).as("v"))
    val big = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scored =
      if (big.count() <= maxBroadcastRows && uni.count() <= maxBroadcastRows)
        pairs.join(broadcast(big), Seq("a", "b"))
          .join(broadcast(uni), Seq("a"))
      else {
        val s = 16
        val salted = pairs.withColumn("__s",
          pmod(hash(col(id), col("a"), col("b")), lit(s)))
        val rep = explode(sequence(lit(0), lit(s - 1)))
        salted
          .join(big.withColumn("__s", rep), Seq("a", "b", "__s"))
          .join(uni.withColumn("__s", rep), Seq("a", "__s"))
      }
    scored
      .crossJoin(broadcast(voc))
      .withColumn("__lp",
        log((col("cab") + 1.0) / (col("ca") + col("v"))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__lp")) / count(lit(1)), 6).as("avg_logprob"))
  }

  /** Trigram stupid-backoff LM score (Brants et al. 2007): per doc,
    * the mean log-score of its trigrams under n-gram statistics fit
    * on a SEPARATE `stats` corpus — S(w3|w1w2) = c123/c12, backing
    * off to 0.4·c23/c2, then to 0.16·(c3+1)/(T+V) (add-1 unigram
    * floor, so unseen words score finitely). Scoring against a held
    * training slice is what makes the backoff real: a self-scored
    * corpus contains every one of its own trigrams, and the lower
    * branches would be dead code ([[bigramLmScore]]'s add-1
    * self-scoring is the complementary design). This is the CCNet
    * recipe shape — fixed LM stats, stream the corpus through it.
    *
    * Scale shape: identical to [[bigramLmScore]] — the count tables
    * are train-side n-gram aggregates (vocabulary-scaled, map-side
    * combined), BROADCAST to the corpus-sized trigram frame under a
    * row guard with a salted-shuffle fallback; every lookup is a
    * LEFT join (the CASE arbitrates missing grams), so no branch can
    * drop a scoring row. Only the final per-doc groupBy shuffles
    * corpus-sized data, keyed on the well-distributed doc id.
    */
  def trigramLmScore(df: DataFrame, stats: DataFrame, text: String,
      id: String, maxBroadcastRows: Long = 50000000L): DataFrame = {
    def toksOf(d: DataFrame) = d
      .withColumn("__t",
        expr(s"filter(split(lower($text), ' '), t -> t != '')"))
      .filter(size(col("__t")) >= 3)
    def grams(d: DataFrame, n: Int, names: Seq[String]) = {
      val fields = names.zipWithIndex.map { case (nm, j) =>
        s"'$nm', element_at(__t, i + $j)"
      }.mkString(", ")
      d.select(col(id), explode(expr(
        s"""transform(sequence(1, size(__t) - ${n - 1}),
            i -> named_struct($fields))""")).as("__g"))
        .select(col(id) +: names.map(nm => col(s"__g.$nm").as(nm)): _*)
    }
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val train = toksOf(stats)
    // ONE train-slice scan builds ALL THREE count tables: the
    // 1/2/3-gram tuples explode together as (o, g1, g2, g3) structs
    // (higher positions NULL below their order) into a single
    // map-side-combined aggregate, cached once; uni/big/tri are
    // filters of that cache. The first cut ran three separate
    // tokenize+explode+aggregate subtrees over the same slice plus
    // one materializing count() action per table — measured 2.9 s
    // at sf0.1, 2.1 s after the fusion, identical values.
    def orderSql(n: Int): String = {
      val fields = (0 until 3).map { j =>
        if (j < n) s"'g${j + 1}', element_at(__t, i + $j)"
        else s"'g${j + 1}', CAST(NULL AS STRING)"
      }.mkString(", ")
      s"""transform(sequence(1, size(__t) - ${n - 1}),
          i -> named_struct('o', $n, $fields))"""
    }
    val counts = train
      .select(explode(expr(
        s"concat(${orderSql(1)}, ${orderSql(2)}, ${orderSql(3)})"))
        .as("__og"))
      .groupBy(col("__og.o").as("o"), col("__og.g1").as("g1"),
        col("__og.g2").as("g2"), col("__og.g3").as("g3"))
      .agg(count(lit(1)).as("cnt"))
      .persist(mem)
    // one action materializes the cache AND yields the fits guard
    val fits = counts.count() <= maxBroadcastRows
    val uni = counts.filter(col("o") === 1)
      .select(col("g1").as("w"), col("cnt").as("cw"))
    // T (total train occurrences) and V (train vocab) ride one row
    val consts = uni.agg(sum(col("cw")).as("tt"),
      count(lit(1)).as("v"))
    val big = counts.filter(col("o") === 2)
      .select(col("g1").as("x"), col("g2").as("y"),
        col("cnt").as("cxy"))
    val tri3 = counts.filter(col("o") === 3)
      .select(col("g1").as("a"), col("g2").as("b"),
        col("g3").as("c"), col("cnt").as("cabc"))
    val target = grams(toksOf(df), 3, Seq("a", "b", "c"))
    def lookup(l: DataFrame, table: DataFrame, keys: Seq[String])
        : DataFrame =
      if (fits) l.join(broadcast(table), keys, "left")
      else {
        // Zipf-skewed gram keys must not key a corpus-sized shuffle:
        // salt on the full row identity, replicate the count table
        val s = 16
        val salted = l.withColumn("__s",
          pmod(hash(col(id), col("a"), col("b"), col("c")), lit(s)))
        val rep = table.withColumn("__s",
          explode(sequence(lit(0), lit(s - 1))))
        salted.join(rep, keys :+ "__s", "left").drop("__s")
      }
    val ab = lookup(target, big
      .select(col("x").as("a"), col("y").as("b"),
        col("cxy").as("cab")), Seq("a", "b"))
    val bc = lookup(ab, big
      .select(col("x").as("b"), col("y").as("c"),
        col("cxy").as("cbc")), Seq("b", "c"))
    val wb = lookup(bc, uni
      .select(col("w").as("b"), col("cw").as("cb")), Seq("b"))
    val wc = lookup(wb, uni
      .select(col("w").as("c"), col("cw").as("cc")), Seq("c"))
    lookup(wc, tri3, Seq("a", "b", "c"))
      .crossJoin(broadcast(consts))
      .withColumn("__lp",
        when(col("cabc").isNotNull, log(col("cabc") / col("cab")))
          .when(col("cbc").isNotNull,
            log(lit(0.4) * col("cbc") / col("cb")))
          .otherwise(log(lit(0.16) * (coalesce(col("cc"), lit(0L)) + 1.0)
            / (col("tt") + col("v")))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum(col("__lp")) / count(lit(1)), 6).as("avg_logprob"))
  }

  /** Ranked vocabulary with cumulative coverage: the top-k content
    * tokens by corpus frequency, each with the cumulative fraction
    * of all token occurrences covered by the vocabulary up to and
    * including it — the curve a tokenizer/vocab-size decision reads
    * ("how many tokens cover 95%?"). Scale shape: ONE map-side-
    * combining groupBy on the token; the top-k cut is a DISTRIBUTED
    * `orderBy().limit(k)` (TakeOrderedAndProject), and rank + prefix
    * sum are a predecessor self-join INSIDE the k-row frame — the
    * prefix sum at rank r only ever involves ranks ≤ r ≤ k, so
    * cutting first is exact — while the corpus total arrives as a
    * broadcast 1-row cross (computed over the FULL counts frame,
    * pre-cut). No window operator anywhere.
    */
  def vocabCoverage(df: DataFrame, text: String, k: Int = 100)
      : DataFrame = {
    val counts = df.select(explode(expr(
        s"filter(split(lower($text), ' '), t -> t != '')"))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    // rank AND inclusive prefix over the k-row top frame as ONE
    // predecessor self-join (k^2 broadcast predicate evals) — no
    // WindowExec, so no unpartitioned-window warning (round 16; the
    // k-row frame made the old window correct, just noisy); factored
    // as [[graft.engine.Dist.topFrameRank]] in round 17
    val top = counts
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
      .localCheckpoint()
    val ranked = graft.engine.Dist.topFrameRank(
      top, top, "token", "cnt", cum = Some("__cum"))
    graft.engine.Dist.scalarCross(ranked, counts,
        sum(col("cnt")).as("__tot"))
      .withColumn("coverage", round(col("__cum") / col("__tot"), 6))
      .select(col("token"), col("cnt"), col("rank"), col("coverage"))
  }

  /** Feature-hashing document embedding (the "hashing trick"): token
    * hashes bucketed mod `dim`, counts L2-normalized — a fully
    * deterministic, vocabulary-free text featurizer (the classic
    * Weinberger et al. 2009 construction) usable as a cheap retrieval
    * / clustering vector where a learned embedding is overkill.
    * Integer bucket counts are exact, so the only float step is the
    * final normalize (6dp-rounded; norm from an exact integer
    * sum-of-squares). Entirely ROW-LOCAL — no shuffle at any corpus
    * size; the bucket counting runs as a native codegen'd Expression
    * (FeatureHashCountsExpr) — the SQL `transform(sequence, b ->
    * size(filter(th, ...)))` form walks the token array dim times
    * through interpreted lambdas and measured 15 s at sf0.1 vs
    * sub-second native.
    */
  def featureHashEmbed(df: DataFrame, text: String, id: String,
      dim: Int = 32): DataFrame = df
    .withColumn("__th", graft.llm.Dedup.contentTokenHashesExpr(text))
    .filter(size(col("__th")) > 0)
    .withColumn("__cnt",
      graft.llm.PolyHashColumns.featureHashCounts(col("__th"), dim))
    .withColumn("__norm", expr(
      "sqrt(aggregate(__cnt, 0D, (acc, x) -> acc + x * x))"))
    .select(col(id),
      expr("transform(__cnt, x -> round(x / __norm, 6))").as("vec"))

  /** Deterministic weight fixture for [[lrQualityGate]]: exact
    * rationals k/97 in (-0.5, 0.5), pseudo-randomized by the Knuth
    * multiplicative constant — stands in for trained classifier
    * weights (production would broadcast a loaded weight vector; the
    * operator's shape is identical).
    */
  def lrFixtureWeights(dim: Int): Array[Double] =
    Array.tabulate(dim)(b => ((b * 2654435761L % 97) - 48) / 97.0)

  /** Model-based quality gate: linear classifier INFERENCE over the
    * feature-hash embedding — the fastText-style quality-filter step
    * (score each doc with a trained text classifier, keep above
    * threshold) that sits between heuristic gates and a neural
    * scorer in a curation pipeline. z = w·x + b over
    * [[featureHashEmbed]]'s L2-normalized bucket counts; `keep`
    * thresholds the RAW logit on both engines (float-tie
    * discipline), the displayed score is 6dp. Inference is entirely
    * ROW-LOCAL (the weight vector rides in the plan as a literal
    * array — a broadcast scalar at any corpus size), so the operator
    * adds ZERO shuffle on top of the embedding: the 100 TB shape for
    * classifier-based filtering. Dot product folds in bucket-index
    * order on both engines — IEEE ops in a fixed order are
    * bit-identical, so no rounding is needed before the threshold.
    *
    * CONSUMER NOTE: do not `.filter(col("keep"))` directly on this
    * output inside a larger plan — the pushed-down predicate
    * re-inlines the whole embedding chain (vec, norm, per-token hash
    * HOF) and re-evaluates it per row (measured 13.0 s vs 1.4 s
    * un-filtered at sf0.1). Materialize first (eager
    * `localCheckpoint()`), then filter — see `curation_v2`.
    */
  def lrQualityGate(df: DataFrame, text: String, id: String,
      dim: Int = 32, bias: Double = 0.0): DataFrame =
    withLrGate(df, text, dim, bias)
      .select(col(id), col("lr_score"), col("keep"))

  /** Column-append form of [[lrQualityGate]]: the same embedding +
    * dot-product chain (bit-identical expressions), keeping EVERY
    * input column and appending `lr_score`/`keep` — join-free and
    * row-local, so it drops into a streaming stage
    * ([[graft.streaming.StreamingDedup.modelGateStage]]) or any plan
    * that needs the gate alongside the original columns without a
    * doc-id join. Docs with zero content tokens are dropped (the
    * embedding is undefined), matching lrQualityGate.
    */
  def withLrGate(df: DataFrame, text: String, dim: Int = 32,
      bias: Double = 0.0): DataFrame = {
    // Collision-proof internals: withColumn would silently OVERWRITE
    // an input column of the same name, and duplicate lr_score/keep
    // in the final select — fail loudly instead (the "drops into any
    // plan" streaming-stage contract).
    val th = "__graft_lr_th"; val cnt = "__graft_lr_cnt"
    val norm = "__graft_lr_norm"; val vec = "__graft_lr_vec"
    val z = "__graft_lr_z"
    val clash = (Seq(th, cnt, norm, vec, z, "lr_score", "keep"))
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"withLrGate: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    val ws = lrFixtureWeights(dim)
      .map(java.lang.Double.toString).mkString("array(", "D, ", "D)")
    df.withColumn(th, graft.llm.Dedup.contentTokenHashesExpr(text))
      .filter(size(col(th)) > 0)
      .withColumn(cnt,
        graft.llm.PolyHashColumns.featureHashCounts(col(th), dim))
      .withColumn(norm, expr(
        s"sqrt(aggregate($cnt, 0D, (acc, x) -> acc + x * x))"))
      .withColumn(vec,
        expr(s"transform($cnt, x -> round(x / $norm, 6))"))
      .withColumn(z, expr(
        s"aggregate(zip_with($vec, $ws, (x, w) -> x * w), " +
          s"0D, (a, v) -> a + v) + ${java.lang.Double.toString(bias)}D"))
      .select(df.columns.map(col) :+
        round(col(z), 6).as("lr_score") :+
        (col(z) >= 0.0).as("keep"): _*)
  }

  /** Temperature-scaled mixture weights (the multilingual-sampling
    * trick, mT5-style): per-source sampling probability
    * q_s = p_s^α / Σ p^α from the raw token share p_s, with α < 1
    * boosting low-resource sources. One tiny aggregate (rows =
    * sources) + a broadcast total — `boost = q/p` shows each
    * source's up/down-sampling factor directly.
    *
    * α is FIXED at 0.75 so that p^α never touches libm `pow`:
    * n^0.75 = (n³)^(1/4) = sqrt(sqrt(n·n·n)). IEEE-754 requires
    * multiply and sqrt to be CORRECTLY ROUNDED (pow carries no such
    * guarantee and JVM Math.pow vs a foreign libm can differ by an
    * ulp), so every engine computes the bit-identical double with no
    * quantization step.
    *
    * The HASHED OUTPUT is engine-version-proof by construction: the
    * ratios are emitted as integer parts-per-million (`p_ppm`,
    * `q_ppm`, `boost_ppm` BIGINT), computed entirely in integer
    * arithmetic. p^α is pinned to a micro-unit BIGINT via
    * `floor(pa · 10⁶)` — multiply-by-10⁶ is one correctly-rounded
    * IEEE op and `floor` is exact, so the integer is bit-identical
    * on any conforming engine — and every division thereafter is
    * INTEGER division of exact integer operands. No `round(DOUBLE)`,
    * no double→decimal cast, no libm call appears anywhere in the
    * hashed columns, so no engine-build difference in rounding or
    * decimal-cast semantics can flip a cell. Numerators are widened
    * to DECIMAL(38,0) (HUGEINT on the oracle side) so `n·10⁶` can't
    * wrap even with ~10¹³-token sources (100 TB-corpus scale).
    */
  def temperatureWeights(df: DataFrame, srcCol: String,
      text: String): DataFrame = {
    val perSrc = df.groupBy(col(srcCol))
      .agg(sum(size(expr(
        s"filter(split(lower($text), ' '), t -> t != '')"))
        .cast("long")).as("n_tokens"))
      .withColumn("__pa_micro", {
        val x = col("n_tokens").cast("double")
        // left-assoc (x*x)*x matches the oracle's evaluation order;
        // each step exactly rounded, so identical even past 2^53
        floor(sqrt(sqrt(x * x * x)) * lit(1000000.0d)).cast("long")
      })
    val tot = perSrc.agg(sum(col("n_tokens")).as("__t"),
      sum(col("__pa_micro")).as("__ta"))
    perSrc.crossJoin(broadcast(tot))
      .withColumn("p_ppm", expr(
        "CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000000) div __t AS BIGINT)"))
      .withColumn("q_ppm", expr(
        "CAST((CAST(__pa_micro AS DECIMAL(38,0)) * 1000000) div __ta AS BIGINT)"))
      .withColumn("boost_ppm", expr(
        "CAST((CAST(q_ppm AS DECIMAL(38,0)) * 1000000) div p_ppm AS BIGINT)"))
      .select(col(srcCol), col("n_tokens"), col("p_ppm"),
        col("q_ppm"), col("boost_ppm"))
  }

  /** Zipf-law fit over the top-k token frequencies: the OLS slope and
    * intercept of ln(count) on ln(rank) — corpus-health telemetry (a
    * natural-language corpus fits slope ≈ −1; templated or synthetic
    * text bends the curve). Moment sums route through DECIMAL(28,6)
    * (the elasticity/corr_pairs recipe) so the fit is
    * order-independent and engine-exact. The top-k cut is a
    * DISTRIBUTED `orderBy().limit(k)` (TakeOrderedAndProject — each
    * partition ships only its local top-k to the driver-side merge),
    * and rank is a predecessor self-join INSIDE the k-row frame —
    * the full vocabulary never funnels through one task (a web-scale
    * corpus has ~1e8+ distinct tokens; an unpartitioned window over
    * that frame is a single-task sort).
    */
  def zipfFit(df: DataFrame, text: String, k: Int = 100): DataFrame = {
    val counts = df.select(explode(expr(
        s"filter(split(lower($text), ' '), t -> t != '')"))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    // rank inside the k-row top frame via predecessor self-join —
    // same values as the old k-row window, no WindowExec (round 16;
    // factored as [[graft.engine.Dist.topFrameRank]] in round 17)
    val top = counts
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
      .localCheckpoint()
    val ranked = graft.engine.Dist
      .topFrameRank(top, top, "token", "cnt")
      .select(log(col("rank")).as("__x"), log(col("cnt")).as("__y"))
    def dsum(c: Column) = sum(c.cast("decimal(28,6)"))
    ranked.agg(
        count(lit(1)).as("__n"),
        dsum(col("__x")).as("__sx"), dsum(col("__y")).as("__sy"),
        dsum(col("__x") * col("__y")).as("__sxy"),
        dsum(col("__x") * col("__x")).as("__sxx"))
      .select(col("__n").as("n_terms"),
        round((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("double") /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double"), 6).as("zipf_slope"),
        round((col("__sy").cast("double") -
          ((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
            .cast("double") /
           (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
            .cast("double")) * col("__sx").cast("double")) /
          col("__n"), 6).as("zipf_intercept"))
  }

  /** Percentile length gate: keep documents whose token count lies
    * inside the corpus's own [pLo, pHi] exact interpolated percentile
    * band — the distribution-relative length filter (truncation
    * fragments and run-on concatenations sit in the tails regardless
    * of the corpus's absolute length scale, where a fixed threshold
    * would need retuning per source). Scale shape: one exact
    * percentile aggregate over the narrow token-count projection,
    * broadcast back as a 1-row cross — the corpus is scanned twice
    * but shuffled never; at extreme scale swap in approx_percentile
    * for the bounds with no other change.
    */
  def lengthGate(df: DataFrame, text: String, id: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val nt = df.select(col(id),
      tokenCountExpr(text).cast("long").as("n_tokens"))
    val bounds = nt.agg(
      percentile(col("n_tokens"), lit(pLo)).as("__lo"),
      percentile(col("n_tokens"), lit(pHi)).as("__hi"))
    nt.crossJoin(broadcast(bounds))
      .filter(col("n_tokens") >= col("__lo") &&
        col("n_tokens") <= col("__hi"))
      .select(col(id), col("n_tokens"),
        round(col("__lo"), 6).as("p_lo"),
        round(col("__hi"), 6).as("p_hi"))
  }

  /** Heavy-hitter detection with a count-min sketch cross-check: the
    * exact top-k keys by frequency (one map-side-combining groupBy +
    * a rank-pushed top-k), each validated against a count-min sketch
    * of the SAME scan — `cms_sound` pins the sketch's no-undercount
    * guarantee (estimate >= true count, always), `cms_tight` its
    * eps-overcount bound (estimate <= count + eps·N, w.p. >= conf).
    * The sketch is the 100 TB half of the story: it merges
    * associatively across executors into eps·depth fixed memory, so
    * hot-key detection never needs the full groupBy when an
    * approximate answer suffices — and this operator proves the
    * sketch honest against the exact path on the same data. The
    * fixed seed makes the sketch (and so both booleans)
    * deterministic for a given dataset.
    */
  def heavyHitters(df: DataFrame, key: String, k: Int = 10,
      eps: Double = 0.005, conf: Double = 0.999,
      seed: Int = 42): DataFrame = {
    val cms = df.stat.countMinSketch(key, eps, conf, seed)
    val n = cms.totalCount()
    val slack = math.ceil(eps * n).toLong
    // exact top-k via distributed TakeOrdered + predecessor-join
    // rank (round 16: the old rank<=k filter did push into
    // WindowGroupLimit, but still ran an unpartitioned WindowExec
    // over the per-partition survivors; this form has no window)
    val top = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc)
      .limit(k)
      .localCheckpoint()
    top
      .join(broadcast(top.select(col(key).as("__qk"),
          col("cnt").as("__qc"))),
        col("cnt") < col("__qc") ||
          (col("cnt") === col("__qc") && col(key) > col("__qk")),
        "left")
      .groupBy(col(key), col("cnt"))
      .agg((count(col("__qk")) + lit(1L)).as("rank"))
      .withColumn("__est",
        SketchColumns.countMinEstimate(col(key), cms))
      .select(col(key), col("cnt"), col("rank"),
        (col("__est") >= col("cnt")).as("cms_sound"),
        (col("__est") <= col("cnt") + slack).as("cms_tight"))
  }

  /** Domain mixture reweighting — per-domain sampling probabilities
    * that reshape the corpus's natural token distribution into a
    * TARGET one (the "data mixing" step of assembling a pretraining
    * mix). The output corpus is the largest achievable under
    * `sample_prob <= 1`: its size is `t_out = min_d(n_tokens_d /
    * target_d)`, and each domain keeps `target_d * t_out / n_tokens_d`
    * of its tokens. Domains absent from `targets` are excluded (their
    * target is 0). Scale shape: ONE map-side-combining groupBy on the
    * domain, a broadcast join against the tiny target table, and a
    * broadcast 1-row cross for the global min/total — the corpus
    * itself is scanned once and never re-shuffled.
    */
  def mixtureWeights(df: DataFrame, text: String, domain: String,
      targets: Map[String, Double],
      tokenCounts: Option[Column] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toSeq.toDF(domain, "target_share")
    // tokenCounts swaps in tokenizer-grain accounting (e.g.
    // bpeApply's n_bpe_tokens) for the whitespace default — same
    // hook contract as packSequences
    val perDomain = df.groupBy(col(domain))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCounts.getOrElse(tokenCountExpr(text))
          .cast("long")).as("n_tokens"))
      .join(broadcast(tgt), Seq(domain))
    val globals = perDomain.agg(
      sum(col("n_tokens")).as("__tot"),
      min(col("n_tokens") / col("target_share")).as("__t_out"))
    perDomain.crossJoin(broadcast(globals))
      .select(col(domain), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("__tot"), 6).as("natural_share"),
        col("target_share"),
        round(col("target_share") * col("__t_out") / col("n_tokens"), 6)
          .as("sample_prob"),
        round(col("target_share") * col("__t_out"), 6)
          .as("expected_tokens"))
  }

  /** BM25 lexical retrieval — the sparse/keyword counterpart of the
    * embedding ANN family (brute-force/LSH/IVF/PQ), completing the
    * hybrid-retrieval pair every RAG-style pipeline needs. Documents
    * are scored with Okapi BM25 (k1 = 1.2, b = 0.75) against
    * `nTerms` single-term queries picked deterministically from the
    * corpus itself (highest document frequency among terms of at
    * least `minTermLen` characters, ties by term — a self-contained
    * oracle-checkable query set); top `k` docs per term by
    * (score DESC, doc_id ASC).
    *
    * Cross-engine exactness WITHOUT integer scaling: the classic
    * BM25 idf is ln((N−df+0.5)/(df+0.5)+1), but ln is a libm call
    * whose last ulp differs across engines — so this uses the
    * RATIONAL Robertson idf (N−df+0.5)/(df+0.5) un-logged.
    * Every remaining operation is IEEE +,−,×,÷ (correctly rounded,
    * engine-independent) over exact integers and the shared
    * literals, and the expression tree is written identically on
    * both sides — so the double scores are bit-identical, not
    * tolerance-banded. Un-logging idf changes absolute scores but
    * is rank-equivalent per single-term query (monotone transform),
    * which is what a retrieval operator is for.
    *
    * Scale shape: tf/df/len are three shuffled aggregations of the
    * exploded token list (map-side combined); the query-term table,
    * document-frequency row, and corpus totals are BROADCAST; the
    * final per-term top-k is a window partitioned by term — the
    * `topk_per_group` shape, a handful of partitions. At a 100 TB
    * corpus with thousands of query terms you would swap the window
    * for the two-phase per-executor top-k (the heavy-hitters
    * pattern); at retrieval fan-outs the partitioned window is the
    * right plan.
    */
  /** Deterministic mixture-interleave SCHEDULE: turn per-source
    * curated shards into one global training order where sources
    * appear at their target ratios — the step between mixture
    * WEIGHTS (how much of each source) and an actual data loader
    * (in what order). Each source is deterministically shuffled
    * (per-doc hash key, no RNG — the [[augmentTokens]] argument:
    * reproducible across runs/engines/retries), ranked within its
    * source, and assigned virtual time r/w (rank over weight — the
    * weighted-fair-queueing schedule: a source with weight 0.5 fires
    * every 2 ticks, 0.2 every 5). The global position is a
    * DISTRIBUTED PREFIX SUM under the (vtime, source, doc_id) total
    * order — graft.engine.Dist.prefixSum, 32 range partitions, never
    * a global unpartitioned window.
    *
    * Per-source ranking is a GROUPED distributed prefix-rank
    * (graft.engine.Dist.groupedRank): the source key's cardinality is
    * the mixture-weight map — a handful — so a window partitioned by
    * source would put each source's ENTIRE corpus slice through one
    * single-task sort (the round-20 verdict flag). groupedRank
    * range-partitions on (source, key, doc_id) and ranks with
    * per-(source, partition) subtotal offsets instead — the same
    * numbering, never a whole source in one task.
    */
  def interleaveSchedule(df: DataFrame, id: String, source: String,
      weights: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF(source, "w")
    val keyed = df.select(col(id).cast("long").as("doc_id"),
        col(source))
      .join(broadcast(w), Seq(source))
      .withColumn("__k", expr(
        s"((doc_id % 1073741824) * 2654435761) % $P"))
    val ranked = graft.engine.Dist.groupedRank(keyed, source,
      Seq(col("__k"), col("doc_id")), "src_rank")
    // virtual time: fixed IEEE tree (D literal — the decimal lesson)
    val timed = ranked
      .withColumn("vtime", expr("src_rank * 1.0D / w"))
      .withColumn("__one", lit(1L))
    graft.engine.Dist.prefixSum(timed,
      Seq(col("vtime"), col(source), col("doc_id")), "__one",
      "sched_pos")
      .select(col("doc_id"), col(source), col("src_rank"),
        col("vtime"), col("sched_pos"))
  }

  /** Deterministic token-level data augmentation (EDA-style dropout +
    * duplication): each token position draws a per-(doc, position)
    * hash gate in [0, 1000) — NO RNG, the `sampleBucketExpr`
    * discipline, so the augmentation is reproducible run-to-run,
    * engine-to-engine, and under retries (a nondeterministic augment
    * stage re-executes differently when a task retries, silently
    * corrupting exactly-once sinks) — and the gate decides: below
    * `dropPermille` the token is dropped, in the next `dupPermille`
    * band it is emitted twice, otherwise once. Row-local HOFs over
    * the row's own tokens (the text-ops shape): corpus-linear, no
    * shuffle, any output mode under streaming.
    */
  def augmentTokens(df: DataFrame, text: String, id: String,
      dropPermille: Int = 100, dupPermille: Int = 50,
      seed: Long = 7L): DataFrame = {
    require(dropPermille >= 0 && dupPermille >= 0 &&
      dropPermille + dupPermille <= 1000,
      "augmentTokens: permille bands must fit in [0, 1000]")
    // gate in [0, 1000): operands stay non-negative and < 2^62, so
    // % is pmod and identical in Spark and DuckDB. The L suffix
    // matters: sequence() yields INT positions and a bare 1315423911
    // parses as INT, so the product would overflow INT under ANSI.
    def g(i: String) =
      s"((($id % 1073741824) * 2654435761 + $i * 1315423911L + $seed)" +
        s" % $P) % 1000"
    def copies(i: String) =
      s"""CASE WHEN ${g(i)} < $dropPermille THEN 0
          WHEN ${g(i)} < ${dropPermille + dupPermille} THEN 2
          ELSE 1 END"""
    df.select(col(id).cast("long").as("doc_id"),
        expr(s"filter(split($text, ' '), t -> t != '')").as("__ts"))
      // sequence(1, 0) DESCENDS in Spark — guard the empty-token row
      .withColumn("__aug", expr(
        s"""CASE WHEN size(__ts) < 1 THEN __ts
            ELSE flatten(zip_with(__ts, sequence(1, size(__ts)),
              (t, i) -> slice(array(t, t), 1, ${copies("i")}))) END"""))
      .select(col("doc_id"),
        expr("array_join(__aug, ' ')").as("aug_text"),
        expr("CAST(size(__ts) AS BIGINT)").as("n_tokens"),
        expr("CAST(size(__aug) AS BIGINT)").as("n_aug"),
        expr(s"""CAST(CASE WHEN size(__ts) < 1 THEN 0 ELSE
          size(filter(sequence(1, size(__ts)),
            i -> ${g("i")} < $dropPermille)) END AS BIGINT)""")
          .as("n_dropped"),
        expr(s"""CAST(CASE WHEN size(__ts) < 1 THEN 0 ELSE
          size(filter(sequence(1, size(__ts)),
            i -> ${g("i")} >= $dropPermille AND
                 ${g("i")} < ${dropPermille + dupPermille})) END
          AS BIGINT)""").as("n_dupped"))
  }

  /** Collocation mining — top word pairs by PMI-style LIFT, the
    * phrase/multi-word-expression detector corpus analysis uses to
    * find terms that should be treated as units ("new york",
    * "machine learning"). PMI is log(p(ab)/(p(a)p(b))); the log is a
    * libm call, so this emits the UN-LOGGED lift p(ab)/(p(a)·p(b)) =
    * c_ab·T²/(B·c_a·c_b) — a monotone transform, rank-identical,
    * and computable as a fixed IEEE +,×,÷ tree over exact integer
    * counts (the BM25 discipline: bit-identical doubles, no
    * tolerance band). Count floors keep the classic PMI
    * rare-pair blow-up out of the ranking.
    *
    * Scale shape: adjacent-pair explosion is row-local (zipped
    * slices), both count tables are map-side-combined aggregations,
    * the totals row is broadcast, and the final top-k is a global
    * `orderBy().limit(k)` — distributed TakeOrdered, no window.
    */
  def collocationsTopK(df: DataFrame, text: String, id: String,
      k: Int = 20, minPair: Long = 5, minWord: Long = 10): DataFrame = {
    val toks = df.select(col(id).cast("long").as("doc_id"),
      expr(s"filter(split(lower($text), ' '), t -> t != '')")
        .as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val pairs = toks
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """arrays_zip(slice(toks, 1, size(toks) - 1),
                      slice(toks, 2, size(toks) - 1))""")).as("p"))
      .select(col("p.0").as("a"), col("p.1").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val totals = uni.agg(sum("c").as("t"))
      .crossJoin(pairs.agg(sum("c_ab").as("bt")))
    pairs
      .join(uni.select(col("w").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .filter(col("c_ab") >= minPair &&
        col("c_a") >= minWord && col("c_b") >= minWord)
      // fixed IEEE tree (D literal forces DOUBLE; Spark parses bare
      // decimals as DECIMAL — the BM25 lesson)
      .withColumn("lift", expr(
        "((c_ab * 1.0D) * t / c_a) * ((t * 1.0D) / c_b) / bt"))
      .select(col("a"), col("b"), col("c_ab"), col("lift"))
      .orderBy(col("lift").desc, col("a").asc, col("b").asc)
      .limit(k)
  }

  def bm25TopK(df: DataFrame, text: String, id: String,
      nTerms: Int = 5, k: Int = 10, minTermLen: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(id).cast("long").as("doc_id"),
      expr(s"filter(split(lower($text), ' '), t -> t != '')")
        .as("toks"))
    val lens = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("len"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val totals = lens.agg(count(lit(1)).as("n"), sum("len").as("tot"))
    val qterms = dfreq.filter(length(col("term")) >= minTermLen)
      .orderBy(col("df").desc, col("term").asc).limit(nTerms)
    val scored = tf
      .join(broadcast(qterms), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      // written as ONE expression, the same parse tree as the oracle:
      // rational idf × saturating tf with the avgdl length norm
      // expanded to len·N/tot (one division, no separate avgdl
      // value). The D suffixes matter: Spark parses a bare 0.5 as
      // DECIMAL(1,1) (DuckDB as DOUBLE) and the whole tree would
      // silently go decimal-typed with different rounding.
      .withColumn("score", expr(
        "((n - df + 0.5D) / (df + 0.5D)) * ((tf * 2.2D) / " +
          "(tf + 0.3D + 0.9D * (len * 1.0D * n / tot)))"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy("term")
        .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("term"), col("rank"), col("doc_id"), col("tf"),
        col("score"))
  }

  /** Pseudo-relevance feedback term expansion (RM3-lite): for each
    * BM25 query term, retrieve its top-`k` documents, then rank the
    * OTHER long terms occurring in that feedback set by their total
    * occurrence count — the classic query-expansion step between
    * first-pass retrieval and a second round. Pure-integer contract
    * (occurrence counts, id/term tiebreaks).
    *
    * Scale shape: rides [[bm25TopK]]'s plan (aggregates + broadcast
    * query terms + WindowGroupLimit rank); the feedback set is
    * nTerms·k doc ids joined back against the tf table (tf is
    * doc-keyed — an equi-join, never a scan per term), and the
    * expansion rank window partitions by query term over
    * feedback-bounded rows.
    */
  def prfExpansion(df: DataFrame, text: String, id: String,
      nTerms: Int = 5, k: Int = 10, nExpand: Int = 3,
      minTermLen: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fb = bm25TopK(df, text, id, nTerms, k, minTermLen)
      .select(col("term").as("q_term"), col("doc_id"))
    val toks = df.select(col(id).cast("long").as("doc_id"),
      expr(s"filter(split(lower($text), ' '), t -> t != '')")
        .as("toks"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .filter(length(col("term")) >= minTermLen)
    fb.join(tf, Seq("doc_id"))
      .filter(col("term") =!= col("q_term"))
      .groupBy("q_term", "term")
      .agg(sum("tf").as("exp_count"))
      .withColumn("exp_rank", row_number().over(
        Window.partitionBy("q_term")
          .orderBy(col("exp_count").desc, col("term").asc))
        .cast("long"))
      .filter(col("exp_rank") <= nExpand)
      .select(col("q_term"), col("exp_rank"),
        col("term").as("exp_term"),
        expr("CAST(exp_count AS BIGINT)").as("exp_count"))
  }

  /** Surprise-boundary semantic chunking: split a document before
    * token i when the corpus bigram model finds the continuation
    * rare — `(c(a,b) + 1) · K < c(a) + V`, i.e. add-1 conditional
    * probability below 1/K. This is RAG-style semantic chunking with
    * a PURE-INTEGER boundary rule: the same statistic as
    * [[bigramLmScore]]'s add-1 log-probability, but compared in
    * integer cross-multiplied form so no libm log (and no float
    * threshold knife-edge) ever enters the contract.
    *
    * Output: one row per chunk — (doc_id, chunk_id, start_pos,
    * end_pos, n_tokens), 1-based token positions, chunks covering
    * the document exactly. Docs with < 2 tokens are one chunk.
    *
    * Scale shape: the count tables are the bigram family's
    * vocabulary-scaled aggregates, broadcast into the
    * corpus-position frame; boundary positions reduce per doc
    * (sorted collect of a boundary subset — bounded by tokens/doc),
    * and spans explode row-locally from the bounds array.
    */
  def surpriseChunks(df: DataFrame, text: String, id: String,
      k: Long = 64L): DataFrame = {
    require(k >= 2, "need k >= 2")
    val toks = df
      .select(col(id).cast("long").as("doc_id"),
        expr(s"filter(split(lower($text), ' '), t -> t != '')")
          .as("__t"))
      .withColumn("__n", expr("CAST(size(__t) AS BIGINT)"))
      .filter(col("__n") >= 1)
    val pairs = toks.filter(col("__n") >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(2, size(__t)),
           i -> named_struct('i', CAST(i AS BIGINT),
                             'a', element_at(__t, i - 1),
                             'b', element_at(__t, i)))""")).as("__p"))
      .select(col("doc_id"), col("__p.i").as("i"),
        col("__p.a").as("a"), col("__p.b").as("b"))
    val uni = toks.select(explode(col("__t")).as("a"))
      .groupBy("a").agg(count(lit(1)).as("ca"))
    val voc = uni.agg(count(lit(1)).as("v"))
    val big = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val bset = pairs
      .join(broadcast(big), Seq("a", "b"))
      .join(broadcast(uni), Seq("a"))
      .crossJoin(broadcast(voc))
      .filter(expr(s"(cab + 1L) * ${k}L < ca + v"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("i"))).as("__bps"))
    toks.join(bset, Seq("doc_id"), "left")
      .withColumn("__bounds", expr(
        "concat(array(1L), coalesce(__bps, " +
          "CAST(array() AS ARRAY<BIGINT>)), array(__n + 1L))"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(__bounds) - 1),
           j -> named_struct('chunk_id', CAST(j AS BIGINT),
             'start_pos', element_at(__bounds, j),
             'end_pos', element_at(__bounds, j + 1) - 1L))"""))
        .as("__c"))
      .select(col("doc_id"), col("__c.chunk_id").as("chunk_id"),
        col("__c.start_pos").as("start_pos"),
        col("__c.end_pos").as("end_pos"))
      .withColumn("n_tokens",
        col("end_pos") - col("start_pos") + lit(1L))
  }

  /** Inverted-index build (the search-sink half of the BM25 family):
    * for the top `topTerms` document-frequency terms, the sorted
    * posting list of documents containing the term, capped at
    * `maxPostings` ids (lowest ids win) with an explicit `truncated`
    * flag — silent caps read as full coverage (the no-silent-caps
    * rule). The cap applies through a rank-limit window BEFORE any
    * collect (Spark's WindowGroupLimit prefilters per partition, so
    * a web-scale stopword's postings never materialize in one task).
    */
  def invertedIndex(df: DataFrame, text: String, id: String,
      topTerms: Int = 50, minTermLen: Int = 5,
      maxPostings: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(id).cast("long").as("doc_id"),
      expr(s"filter(split(lower($text), ' '), t -> t != '')")
        .as("toks"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val tops = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(length(col("term")) >= minTermLen)
      .orderBy(col("df").desc, col("term").asc).limit(topTerms)
    tf.join(broadcast(tops), Seq("term"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("term").orderBy("doc_id")))
      .filter(col("__rk") <= maxPostings)
      .groupBy("term")
      .agg(first(col("df")).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
      .withColumn("truncated", col("df") > maxPostings)
      .select("term", "df", "postings", "truncated")
  }

  /** Length-bucketed batch assignment for training loaders: documents
    * go into power-of-two token-length buckets (fixed CASE ladder
    * 16..4096, else 8192 — identical integer tree on both engines),
    * are ordered length-DESCENDING inside each bucket (adjacent
    * lengths share a batch, the padding-minimizing loader order), and
    * batch ids are dealt `batchSize` at a time. `pad_tokens` is the
    * per-doc padding the loader would emit: batch-max length minus
    * own length.
    *
    * Scale shape: the global order (bucket, len DESC, id) runs
    * through [[graft.engine.Dist.prefixSum]] — range partitioning +
    * broadcast offsets, every sort partition-local, NO single-
    * partition window. Bucket starts are a ≤10-row broadcast; the
    * batch-max attach is a keyed join against a corpus/batchSize-row
    * aggregate. All-integer contract end to end.
    */
  def lengthBucketBatches(df: DataFrame, text: String, id: String,
      batchSize: Int = 8): DataFrame = {
    require(batchSize >= 1, "need batchSize >= 1")
    val caps = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
    val ladder = caps.map(c => s"WHEN n_tokens <= $c THEN ${c}L")
      .mkString("CASE ", " ", " ELSE 8192L END")
    val sized = df.select(col(id).cast("long").as("doc_id"),
        expr(s"CAST(size(filter(split(lower($text), ' '), " +
          "t -> t != '')) AS BIGINT)").as("n_tokens"))
      .withColumn("bucket", expr(ladder))
      .withColumn("__one", lit(1L))
    // pin the positions before the three-way fan-out (starts /
    // batch deal / batch max) — otherwise every consumer re-runs the
    // post-checkpoint rank window and its full-data exchange (the
    // pagerank edge-frame lesson)
    val pos = graft.engine.Dist.prefixSum(sized,
      Seq(col("bucket"), col("n_tokens").desc, col("doc_id")),
      "__one", "__gpos")
      .localCheckpoint()
    val starts = pos.groupBy("bucket")
      .agg(min(col("__gpos")).as("__b0"))
    val batched = pos
      .join(broadcast(starts), Seq("bucket"))
      .withColumn("batch_id",
        expr(s"(__gpos - __b0) DIV ${batchSize}L"))
    val batchMax = batched.groupBy("bucket", "batch_id")
      .agg(max(col("n_tokens")).as("__bmax"))
    batched.join(batchMax, Seq("bucket", "batch_id"))
      .withColumn("pad_tokens", col("__bmax") - col("n_tokens"))
      .select("doc_id", "n_tokens", "bucket", "batch_id", "pad_tokens")
  }

  /** Data-constrained mixture planner (the Muennighoff-style "you
    * asked for this mix, the data supports that much" fit): given a
    * token budget B, target mixture weights (ppm), and a per-source
    * repetition cap of `epochsCap` epochs, allocate B across sources
    * by greedy waterfilling — sources whose target share exceeds
    * their cap saturate at cap·tokens, and their unused share
    * redistributes proportionally among the unsaturated rest. Budget
    * that no positive-weight source can absorb stays UNALLOCATED
    * (the honest data-constrained outcome, surfaced as
    * Σ alloc < B).
    *
    * Exact integer contract: the scan processes positive-weight
    * sources in saturation-pressure order (key (cap·1e6) div w_ppm,
    * source asc — both engines use the truncated key, so they agree
    * by construction) carrying (budget-left, weight-left) state;
    * allocations are cap or (R·w) div W. Products stay in BIGINT for
    * per-source caps up to ~9·10¹² tokens — beyond any single
    * source's token mass at the 100 TB design point.
    *
    * Scale shape: the corpus pass is the per-source token sum
    * (map-side combine); the planner runs on the collected
    * ≤|sources|-row counts (the sanctioned tiny-fit collect class)
    * and its DuckDB mirror replays the identical recurrence as a
    * recursive CTE.
    */
  def mixBudgetFit(df: DataFrame, text: String, source: String,
      weightsPpm: Map[String, Long], epochsCap: Long,
      budget: Option[Long] = None,
      budgetPpm: Long = 1000000L): DataFrame = {
    require(epochsCap >= 1, "need epochsCap >= 1")
    require(weightsPpm.values.forall(_ >= 0), "weights must be >= 0")
    // ppm weights are shares of ONE budget: a sum over 1e6 would
    // both be semantically meaningless and defeat the overflow
    // bounds below (they rely on w <= wRem <= 1e6)
    require(weightsPpm.values.sum <= 1000000L,
      s"mixBudgetFit: weightsPpm must sum to <= 1e6 " +
        s"(got ${weightsPpm.values.sum})")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .select(col(source).as("src"),
        expr(s"CAST(size(filter(split(lower($text), ' '), " +
          "t -> t != '')) AS BIGINT)").as("n"))
      .groupBy("src").agg(sum("n").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    // absolute budget wins; otherwise budgetPpm of the corpus total
    // (scale-invariant: the saturation pattern survives a 10× corpus)
    val b = budget.getOrElse(
      counts.map(_._2).sum * budgetPpm / 1000000L)
    // Exact-integer contract enforcement (was a docstring assumption):
    // every product below is bounded by X * 1e6 with X in
    // {cap, r <= b, w <= 1e6}, so capping cap and b at MaxValue/1e6
    // makes cap*wRem, r*w, and the (cap*1e6) div w sort key all
    // provably overflow-free instead of silently wrapping and
    // mis-allocating on both engines.
    val maxSafe = Long.MaxValue / 1000000L
    counts.foreach { case (s, c) =>
      require(c <= maxSafe / epochsCap,
        s"mixBudgetFit: cap = epochsCap * tokens overflows the " +
          s"exact-integer contract for source '$s' " +
          s"($epochsCap * $c > ${maxSafe})")
    }
    require(b <= maxSafe,
      s"mixBudgetFit: budget $b exceeds the exact-integer bound " +
        s"$maxSafe (products r * w_ppm must stay in BIGINT)")
    val active = counts
      .map { case (s, c) =>
        (s, c, weightsPpm.getOrElse(s, 0L), epochsCap * c)
      }
      .filter(_._3 > 0)
      .sortBy { case (s, _, w, cap) => ((cap * 1000000L) / w, s) }
    var r = b
    var wRem = active.map(_._3).sum
    val alloc = scala.collection.mutable.Map.empty[String, Long]
    active.foreach { case (s, _, w, cap) =>
      val a = if (cap * wRem <= r * w) cap else (r * w) / wRem
      alloc(s) = a
      r -= a
      wRem -= w
    }
    counts.map { case (s, c) =>
      val w = weightsPpm.getOrElse(s, 0L)
      val a = alloc.getOrElse(s, 0L)
      (s, c, w, epochsCap * c, a,
        if (c > 0) a * 1000000L / c else 0L)
    }.toSeq.toDF("source", "n_tokens", "w_ppm", "cap_tokens",
      "alloc_tokens", "epochs_ppm")
  }

  /** A fitted BM25 retrieval model: the query terms with their
    * document frequencies, plus the corpus size / total token count
    * the length norm needs. nTerms+2 longs and nTerms strings — a
    * plan literal at any corpus size (the [[DsirModel]] pattern).
    */
  case class Bm25Model(terms: Seq[(String, Long)], n: Long, tot: Long)

  /** Fit the BM25 scoring model offline: pick the same query-term set
    * as [[bm25TopK]] (top `nTerms` by document frequency, df DESC /
    * term ASC tiebreak, length ≥ `minTermLen`) and capture (df, n,
    * tot). Collects exactly nTerms + 1 tiny rows — the sanctioned
    * fit-collect class ([[dsirFit]]).
    */
  def bm25Fit(df: DataFrame, text: String,
      nTerms: Int = 5, minTermLen: Int = 5): Bm25Model = {
    val toks = df.select(
      expr(s"filter(split(lower($text), ' '), t -> t != '')")
        .as("toks"))
    // id BEFORE the explode: in the same projection as explode, a
    // monotonically_increasing_id would mint one id PER TOKEN and df
    // would silently become a total term count
    val tf = toks.withColumn("__rid", monotonically_increasing_id())
      .select(col("__rid"), explode(col("toks")).as("term"))
      .groupBy("__rid", "term").agg(count(lit(1)).as("tf"))
    val terms = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(length(col("term")) >= minTermLen)
      .orderBy(col("df").desc, col("term").asc).limit(nTerms)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val totals = toks.agg(count(lit(1)).as("n"),
        sum(size(col("toks")).cast("long")).as("tot"))
      .collect()(0)
    Bm25Model(terms, totals.getLong(0), totals.getLong(1))
  }

  /** Row-local BM25 scoring against a fitted [[Bm25Model]]: appends
    * `bm25_micro` (sum of per-term Robertson weights, each pinned to
    * micro-longs via floor(w·1e6) BEFORE the sum so the total is
    * order-independent integer arithmetic — the
    * [[graft.llm.Retrieval]] discipline) and `bm25_hits` (matched
    * query terms). The per-term weight is the SAME rational no-libm
    * IEEE tree as [[bm25TopK]] with the fitted (df, n, tot) as plan
    * literals; tf is the row's own token count of the term — no
    * join, no shuffle, no state, so the stage drops into a stream
    * ([[graft.streaming.StreamingDedup.bm25ScoreStage]]) unchanged.
    */
  def withBm25Score(df: DataFrame, text: String,
      model: Bm25Model): DataFrame = {
    val clash = Seq("__toks", "__len", "__tfs", "bm25_micro",
      "bm25_hits").filter(df.columns.contains)
    require(clash.isEmpty,
      s"withBm25Score: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    // An empty term set (bm25Fit on a corpus with no term >=
    // minTermLen) must degrade to an all-zero score, not an analysis
    // exception: the concatenated per-term expressions would render
    // as `CAST( AS BIGINT)` and `transform(array(), ...)` cannot
    // resolve an element type.
    if (model.terms.isEmpty)
      return df.withColumn("bm25_micro", lit(0L))
        .withColumn("bm25_hits", lit(0L))
    def lit0(s: String) = s.replace("'", "''")
    // stage ALL per-term tfs as ONE array column referenced (as a
    // cheap attribute) by both outputs — the winsorize-bounds lesson:
    // inlining the interpreted filter() into every tf reference would
    // re-scan the token array ~3× per term per row
    val tfArr = model.terms
      .map { case (term, _) => s"'${lit0(term)}'" }
      .mkString(
        "transform(array(", ", ",
        "), t -> CAST(size(filter(__toks, x -> x = t)) AS BIGINT))")
    val perTerm = model.terms.zipWithIndex.map {
      case ((_, dfreq), i) =>
        val tf = s"element_at(__tfs, ${i + 1})"
        val w = s"((${model.n}L - ${dfreq}L + 0.5D) / " +
          s"(${dfreq}L + 0.5D)) * (($tf * 2.2D) / ($tf + 0.3D + " +
          s"0.9D * (__len * 1.0D * ${model.n}L / ${model.tot}L)))"
        (s"CAST(floor($w * 1000000.0D) AS BIGINT)",
          s"(CASE WHEN $tf > 0 THEN 1L ELSE 0L END)")
    }
    df.withColumn("__toks",
        expr(s"filter(split(lower($text), ' '), t -> t != '')"))
      .withColumn("__len",
        expr("CAST(size(__toks) AS BIGINT)"))
      .withColumn("__tfs", expr(tfArr))
      .withColumn("bm25_micro",
        expr(perTerm.map(_._1).mkString("CAST(", " + ", " AS BIGINT)")))
      .withColumn("bm25_hits",
        expr(perTerm.map(_._2).mkString("CAST(", " + ", " AS BIGINT)")))
      .drop("__toks", "__len", "__tfs")
  }

  /** Loader packing-efficiency report: the padding waste of
    * [[lengthBucketBatches]] (length-sorted pow-2 buckets) against
    * the naive id-ordered deal at the same batch size — the number
    * that justifies (or rejects) the bucketed loader. One row per
    * strategy: docs, real tokens, pad tokens, and waste as ppm of
    * loader slots (pad / (tokens + pad)).
    */
  def packingStats(df: DataFrame, text: String, id: String,
      batchSize: Int = 8): DataFrame = {
    val bucketed = lengthBucketBatches(df, text, id, batchSize)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        sum("pad_tokens").as("pad_tokens"))
      .withColumn("strategy", lit("length_bucketed"))
    val sized = df.select(col(id).cast("long").as("doc_id"),
        expr(s"CAST(size(filter(split(lower($text), ' '), " +
          "t -> t != '')) AS BIGINT)").as("n_tokens"))
      .withColumn("__one", lit(1L))
    val naivePos = graft.engine.Dist.prefixSum(sized,
      Seq(col("doc_id")), "__one", "__gpos")
      .withColumn("batch_id",
        expr(s"(__gpos - 1L) DIV ${batchSize}L"))
      .localCheckpoint() // pinned before the self/max fan-out
    val naive = naivePos
      .join(naivePos.groupBy("batch_id")
        .agg(max(col("n_tokens")).as("__bmax")), Seq("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        sum(col("__bmax") - col("n_tokens")).as("pad_tokens"))
      .withColumn("strategy", lit("naive_id_order"))
    bucketed.unionByName(naive)
      .withColumn("waste_ppm", expr(
        "CAST((pad_tokens * 1000000L) DIV (sum_tokens + pad_tokens) " +
          "AS BIGINT)"))
      .select("strategy", "n_docs", "sum_tokens", "pad_tokens",
        "waste_ppm")
  }

  /** Stratified sample with EXACT global size `n`: per-stratum quotas
    * by Hamilton (largest-remainder) apportionment — floor(n·c/T)
    * each, the n − Σfloor leftover seats to the largest remainders
    * (ties by stratum name) — then a deterministic hash-ranked pick
    * inside each stratum. Rate-based samplers (`sampleBucketExpr`)
    * only hit n in expectation; training-data builds that promise "n
    * documents, source-proportional" need the apportionment exact.
    *
    * All-integer contract: quotas compare n·c mod T (no fractions);
    * the in-stratum order is the LCG id scramble. Requires n·c_s to
    * fit in a long. If n exceeds the corpus size the whole corpus is
    * returned (quotas cap at stratum counts).
    *
    * Scale shape: stratum counts / quotas live on a ≤|strata|-row
    * frame (its unpartitioned remainder-rank window is over that tiny
    * frame only — the Dist subtotal-frame class); per-stratum ranks
    * come from [[graft.engine.Dist.prefixSum]] positions minus a
    * broadcast per-stratum start, so no corpus-sized window partition
    * exists even with 2-3 strata.
    */
  def quotaSample(df: DataFrame, id: String, source: String,
      n: Long): DataFrame = {
    require(n >= 0, "need n >= 0")
    val keyed = df.select(col(id).cast("long").as("doc_id"),
        col(source))
      .withColumn("__k", expr(
        s"((doc_id % 1073741824) * 2654435761) % $P"))
      .withColumn("__one", lit(1L))
    require(df.schema(source).dataType ==
        org.apache.spark.sql.types.StringType,
      s"quotaSample: strata column '$source' must be StringType " +
        "(the driver-side remainder rank replays the engine's " +
        "binary string order)")
    // Hamilton (largest-remainder) allocation DRIVER-SIDE over the
    // collected ≤|strata|-row count frame (round 17, the BPE-fit
    // recipe): the operator already assumes broadcastable strata —
    // every join below is a broadcast — and the round-16 form spent
    // a checkpoint + rank join + two scalar crosses (≈6 jobs of
    // scheduler floor) on what is exact integer arithmetic over a
    // handful of rows. Replay is EXACT: base = n·c DIV tt and
    // rem = (n·c) % tt on non-negative longs match Spark's DIV/%,
    // and the remainder rank's (rem desc, source asc) tie-break
    // compares UTF-8 bytes unsigned — UTF8String.binaryCompare, the
    // engine's string order — not Java's UTF-16 char order.
    val cnt = keyed.groupBy(source).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def u8lt(x: String, y: String): Boolean = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < a.length && i < b.length) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      a.length < b.length
    }
    val tt = cnt.map(_._2).sum
    val based = cnt.map { case (s, c) => (s, n * c / tt, (n * c) % tt) }
    val leftover = n - based.map(_._2).sum
    val quotaSeq = based
      .sortWith { case ((s1, _, r1), (s2, _, r2)) =>
        r1 > r2 || (r1 == r2 && u8lt(s1, s2)) }
      .zipWithIndex
      .map { case ((s, b, _), i) =>
        (s, b + (if (i + 1 <= leftover) 1L else 0L)) }
      .toSeq
    val sess = df.sparkSession
    import sess.implicits._
    val quotas = quotaSeq.toDF(source, "quota")
    // pinned before the starts/pick fan-out — see lengthBucketBatches
    val pos = graft.engine.Dist.prefixSum(keyed,
      Seq(col(source), col("__k"), col("doc_id")), "__one", "__gpos")
      .localCheckpoint()
    val starts = pos.groupBy(source).agg(min(col("__gpos")).as("__s0"))
    pos.join(broadcast(starts), Seq(source))
      .withColumn("src_rank", col("__gpos") - col("__s0") + lit(1L))
      .join(broadcast(quotas), Seq(source))
      .filter(col("src_rank") <= col("quota"))
      .select(col(source), col("doc_id"), col("src_rank"), col("quota"))
  }

  /** MAIN-CONTENT EXTRACTION (round-15): the text-density /
    * link-density block rule — the readability/Boilerpipe heuristic
    * (Kohlschütter et al. 2010, "Boilerplate Detection Using Shallow
    * Text Features") reduced to its two load-bearing features. A page
    * splits into newline-delimited BLOCKS; a block survives iff its
    * visible text (tags stripped) is at least `minChars` AND its
    * anchor-text share is at most `maxLinkPpm` — navigation chrome is
    * short and link-saturated, body prose is long and link-sparse.
    * Complementary to [[graft.llm.Dedup.siteBoilerplate]]: this rule
    * removes LAYOUT chrome within one page; the site-template
    * detector removes REPEATED prose across a domain's pages (a
    * linkless "welcome" header passes the density rule and is
    * exactly what the n-gram detector flags) — curation runs them in
    * sequence, and the spec pins that composition.
    *
    * Row-local HOF projection over the raw page column: no shuffle
    * at any corpus size, streaming-safe, and every emitted number is
    * integer (ppm via DIV) so the DuckDB mirror is hash-exact.
    * Emits per doc: block/char accounting and `main_text` (kept
    * blocks, tags stripped, newline-joined).
    */
  def mainContent(df: DataFrame, html: String,
      minChars: Int = 20, maxLinkPpm: Long = 300000L): DataFrame = {
    val clash = Seq("n_blocks", "n_kept", "total_chars", "kept_chars",
      "link_chars", "kept_ppm", "main_text", "__bs", "__kept")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"mainContent: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    df
      .withColumn("__bs", expr(
        s"""transform(
           |  filter(split($html, '\n'), b -> length(trim(b)) > 0),
           |  b -> named_struct(
           |    'txt', trim(regexp_replace(b, '<[^>]*>', '')),
           |    'lnk', aggregate(
           |      regexp_extract_all(b, '<a[^>]*>([^<]*)</a>', 1),
           |      0L, (a, x) -> a + length(x))))""".stripMargin))
      .withColumn("__kept", expr(
        s"""filter(__bs, s -> length(s.txt) >= $minChars
           |  AND s.lnk * 1000000L <= ${maxLinkPpm}L * length(s.txt))"""
          .stripMargin))
      .withColumn("n_blocks", expr("CAST(size(__bs) AS BIGINT)"))
      .withColumn("n_kept", expr("CAST(size(__kept) AS BIGINT)"))
      .withColumn("total_chars", expr(
        "aggregate(__bs, 0L, (a, s) -> a + length(s.txt))"))
      .withColumn("kept_chars", expr(
        "aggregate(__kept, 0L, (a, s) -> a + length(s.txt))"))
      .withColumn("link_chars", expr(
        "aggregate(__bs, 0L, (a, s) -> a + s.lnk)"))
      .withColumn("kept_ppm", expr(
        "kept_chars * 1000000L DIV greatest(total_chars, 1L)"))
      .withColumn("main_text", expr(
        "array_join(transform(__kept, s -> s.txt), '\n')"))
      .drop("__bs", "__kept")
  }

  /** FILL-IN-THE-MIDDLE transform (the FIM objective, Bavarian et
    * al. 2022, arXiv:2207.14255 — the code-model training stage that
    * teaches infilling): split each document into (prefix, middle,
    * suffix) at two DETERMINISTIC hash-derived cut points and tag
    * the serialization mode the loader should emit (PSM or SPM,
    * dealt ~50/50 from the same hash). Cut points come from the
    * portable content hash ([[uniformHash60]]), so the split is
    * bit-reproducible on any engine and independent of row order,
    * partitioning, and corpus growth — re-running on an extended
    * corpus re-derives the same split for unchanged documents (the
    * property a rand()-based split lacks). c1 lands in the first
    * third and c2 in the last third, so all three spans are
    * non-empty for any document of at least `minChars` (≥ 3)
    * characters; shorter documents pass through as mode 'raw' with
    * the whole text in `prefix` and empty middle/suffix — the
    * untransformed arm a FIM loader mixes at some rate anyway.
    * Entirely ROW-LOCAL inside whole-stage codegen: no shuffle at
    * any corpus size, streaming-safe; every cut is non-negative
    * integer arithmetic, so DIV/% agree across engines and the
    * DuckDB mirror is hash-exact.
    */
  def fimSplit(df: DataFrame, text: String, id: String,
      minChars: Int = 12): DataFrame = {
    require(minChars >= 3,
      "need minChars >= 3 (three non-empty spans)")
    val clash = Seq("fim_mode", "prefix", "middle", "suffix",
      "n_prefix", "n_middle", "n_suffix", "__h", "__L", "__t",
      "__c1", "__c2").filter(df.columns.contains)
    require(clash.isEmpty,
      s"fimSplit: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    df.withColumn("__h", uniformHash60(text))
      .withColumn("__L", length(col(text)).cast("long"))
      // clamped to 1: sub-minChars rows take the 'raw' branch and
      // never read the cuts, but ANSI mode evaluates `% 0` eagerly
      .withColumn("__t", expr("greatest(__L DIV 3L, 1L)"))
      .withColumn("__c1", expr("1L + (__h % __t)"))
      .withColumn("__c2", expr(
        "__L - __t + 1L + ((__h DIV 65536L) % __t)"))
      .withColumn("fim_mode", expr(
        s"CASE WHEN __L < ${minChars}L THEN 'raw' " +
          "WHEN (__h DIV 4096L) % 2L = 0L THEN 'psm' " +
          "ELSE 'spm' END"))
      .withColumn("prefix", expr(
        s"CASE WHEN fim_mode = 'raw' THEN $text " +
          s"ELSE substring($text, 1, CAST(__c1 AS INT)) END"))
      .withColumn("middle", expr(
        "CASE WHEN fim_mode = 'raw' THEN '' " +
          s"ELSE substring($text, CAST(__c1 + 1L AS INT), " +
          "CAST(__c2 - __c1 AS INT)) END"))
      .withColumn("suffix", expr(
        "CASE WHEN fim_mode = 'raw' THEN '' " +
          s"ELSE substring($text, CAST(__c2 + 1L AS INT), " +
          "CAST(__L - __c2 AS INT)) END"))
      .withColumn("n_prefix", length(col("prefix")).cast("long"))
      .withColumn("n_middle", length(col("middle")).cast("long"))
      .withColumn("n_suffix", length(col("suffix")).cast("long"))
      .drop("__h", "__L", "__t", "__c1", "__c2")
  }

  /** Shared bounded-rank vocabulary cut for the tokenizer fits
    * ([[wordpieceFit]], [[unigramFit]]): keep the top `vocabN`
    * candidate pieces by (cnt desc, piece asc) PLUS the single-char
    * floor rows, every kept row carrying its exact GLOBAL rank —
    * without ever ranking the full candidate frame through one
    * window. The round-15 form filtered `rank <= vocabN OR single`
    * AFTER a global row_number, and that disjunction blocks Spark's
    * WindowGroupLimit pushdown, so the whole candidate-piece frame
    * (corpus-vocabulary scale at 100 TB) funneled through a
    * single-partition WindowExec — the "Moving all data to a single
    * partition" warning in the round-15 bench tail. Here instead:
    *   - the top-N branch is a distributed `orderBy().limit(vocabN)`
    *     (TakeOrderedAndProject — each partition ships only its
    *     local top-N to the merge); because the top is a PREFIX of
    *     the global order, each kept row's global rank equals
    *     `1 + count(top rows sorting strictly before it)` — a ≤
    *     vocabN × vocabN broadcast self-join + aggregate, no
    *     WindowExec anywhere (not even a bounded one: the empty-
    *     partition window warning in the bench tail is gone for
    *     good);
    *   - the single-char floor (≤ alphabet-size rows after the
    *     anti-join against the top branch) recovers its exact global
    *     rank the same way against the FULL counts frame — a
    *     broadcast join plus a map-side-combining aggregate, never a
    *     corpus-vocabulary-scale sort.
    * The counts frame is pinned (`localCheckpoint`) because three
    * consumers (top cut, floor filter, floor-rank count) would
    * otherwise re-run the candidate-explode scan; the ordering is
    * strict total (pieces are distinct after the groupBy), so both
    * branches are deterministic and the union reproduces the
    * round-15 output bit-for-bit.
    */
  private def rankedVocabCut(countsIn: DataFrame, vocabN: Int,
      isSingle: Column): DataFrame = {
    val counts = countsIn.localCheckpoint()
    val top = counts
      .orderBy(col("cnt").desc, col("piece").asc).limit(vocabN)
    // rank = 1 + #predecessors inside the prefix frame — the shared
    // [[graft.engine.Dist.topFrameRank]] broadcast self-join
    val rankedTop =
      graft.engine.Dist.topFrameRank(top, top, "piece", "cnt")
    val singles = counts.filter(isSingle)
      .join(top.select("piece"), Seq("piece"), "left_anti")
    // floor ranks count predecessors in the FULL candidate frame —
    // but broadcast the TINY side and keep `counts` streamed
    val singleRank = counts
      .join(broadcast(singles.select(col("piece").as("__sp"),
          col("cnt").as("__sc"))),
        col("cnt") > col("__sc") ||
          (col("cnt") === col("__sc") && col("piece") < col("__sp")))
      .groupBy(col("__sp"), col("__sc"))
      .agg((count(lit(1)) + lit(1L)).as("rank"))
      .select(col("__sp").as("piece"), col("__sc").as("cnt"),
        col("rank"))
    rankedTop.unionByName(singleRank).select("piece", "cnt", "rank")
  }

  /** WORDPIECE tokenizer fit (Schuster & Nakajima 2012; the BERT
    * tokenizer family — the frequency-vocab / maximal-munch rung
    * next to [[bpeApply]]'s merge-list BPE): candidate pieces are
    * every word substring up to `maxPiece` chars, word-INITIAL
    * pieces kept raw and continuations stored with the '##' marker
    * (the WordPiece position distinction); the vocabulary is the
    * top `vocabN` by (count desc, piece asc) PLUS every single-char
    * piece, so greedy inference is total without an <unk> escape
    * for any character the fit corpus saw. All-integer counts; the
    * candidate explode is one scan with map-side combine, and the
    * vocabulary cut is the bounded two-branch [[rankedVocabCut]] —
    * no window ever sees the full candidate frame.
    */
  def wordpieceFit(df: DataFrame, text: String, vocabN: Int = 512,
      maxPiece: Int = 4): DataFrame = {
    require(maxPiece >= 1 && vocabN >= 1, "need maxPiece/vocabN >= 1")
    val wordsOf = expr(s"filter(split(lower($text), ' '), t -> t != '')")
    val cands = df.select(explode(wordsOf).as("__w"))
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(__w)),
           |  p -> transform(
           |    sequence(1, least($maxPiece, length(__w) - p + 1)),
           |    l -> CASE WHEN p = 1 THEN substring(__w, 1, l)
           |         ELSE concat('##', substring(__w, p, l)) END)))"""
          .stripMargin)).as("piece"))
    rankedVocabCut(
      cands.groupBy(col("piece")).agg(count(lit(1)).as("cnt")),
      vocabN,
      length(regexp_replace(col("piece"), "^##", "")) === 1)
  }

  /** The greedy longest-match-first step as SQL: one `aggregate`
    * iteration over a word's chars, trying piece lengths maxPiece..2
    * against the broadcast vocab map and falling back to a 1-char
    * piece (unknown single chars count as unk but still consume —
    * inference is total). The chosen-length CASE is inlined at each
    * use site (SQL has no let-binding); `withSeg` additionally
    * accumulates the space-joined piece string.
    */
  private def wpAggSql(w: String, vm: String, maxPiece: Int,
      withSeg: Boolean): String = {
    def key(l: String) =
      s"(CASE WHEN acc.pos = 1 THEN substring($w, 1, $l) " +
        s"ELSE concat('##', substring($w, acc.pos, $l)) END)"
    val chosen = (maxPiece to 2 by -1).map { l =>
      s"WHEN length($w) - acc.pos + 1 >= $l " +
        s"AND try_element_at($vm, ${key(l.toString)}) IS NOT NULL " +
        s"THEN $l"
    }.mkString("(CASE ", " ", " ELSE 1 END)")
    val segField =
      if (withSeg)
        s""", 'seg', concat(acc.seg,
           |  CASE WHEN acc.seg = '' THEN '' ELSE ' ' END,
           |  ${key(chosen)})""".stripMargin
      else ""
    val init = "named_struct('pos', 1, 'n', CAST(0 AS BIGINT), " +
      "'unk', CAST(0 AS BIGINT)" +
      (if (withSeg) ", 'seg', ''" else "") + ")"
    s"""aggregate(sequence(1, length($w)), $init,
       |  (acc, i) -> CASE WHEN acc.pos > length($w) THEN acc
       |  ELSE named_struct(
       |    'pos', acc.pos + $chosen,
       |    'n', acc.n + 1L,
       |    'unk', acc.unk + CASE WHEN $chosen = 1
       |      AND try_element_at($vm, ${key("1")}) IS NULL
       |      THEN 1L ELSE 0L END$segField) END)""".stripMargin
  }

  /** WORDPIECE greedy inference over a fitted vocabulary
    * ([[wordpieceFit]]): per word, repeatedly take the LONGEST vocab
    * piece at the cursor (word-initial raw, continuation '##'-keyed)
    * — the exact BERT maximal-munch rule. Per doc emits word/piece/
    * unk accounting, pieces-per-word ppm (the fertility number), and
    * the first word's segmentation as a witness column. Scale shape:
    * the vocabulary rides in as ONE broadcast map row; tokenization
    * is a row-local HOF fold — no shuffle, streaming-safe.
    */
  def wordpieceApply(df: DataFrame, text: String, id: String,
      vocab: DataFrame, maxPiece: Int = 4): DataFrame = {
    val vm = vocab.agg(map_from_entries(
      collect_list(struct(col("piece"), lit(1)))).as("__vm"))
    val counted = wpAggSql("__w", "__vm", maxPiece, withSeg = true)
    // MEMOIZED at word grain: tokenization is a pure function of the
    // word, and natural text repeats words heavily, so the
    // interpreted greedy fold runs once per DISTINCT word (bounded
    // by the corpus vocabulary, not the token stream — measured 12.1
    // -> 3.4 s at sf0.1) and occurrences pick their stats up via a
    // word-keyed join the optimizer is free to broadcast.
    val base = df.select(col(id),
      expr(s"filter(split(lower($text), ' '), t -> t != '')")
        .as("__ws"))
    val stats = base.select(explode(col("__ws")).as("__w")).distinct()
      .crossJoin(broadcast(vm))
      .withColumn("__s", expr(counted))
      .select(col("__w"), col("__s.n").as("__n"),
        col("__s.unk").as("__unk"), col("__s.seg").as("__seg"))
    val occ = base.select(col(id), explode(col("__ws")).as("__w"))
      .join(stats, Seq("__w"))
      .groupBy(col(id))
      .agg(sum(col("__n")).as("n_pieces"),
        sum(col("__unk")).as("n_unk"))
    base
      .withColumn("n_words", expr("CAST(size(__ws) AS BIGINT)"))
      .withColumn("__w1", expr("try_element_at(__ws, 1)"))
      .join(occ, Seq(id), "left")
      .join(stats.select(col("__w").as("__w1"),
        col("__seg").as("__seg1")), Seq("__w1"), "left")
      .select(col(id), col("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"),
        expr("coalesce(n_pieces, 0L) * 1000000L " +
          "DIV greatest(n_words, 1L)").as("ppw_ppm"),
        coalesce(col("__seg1"), lit("")).as("seg_first"))
  }

  /** Reversible byte→char fold for the BYTE-grain tokenizer fits:
    * each UTF-8 byte of the word becomes the single char with that
    * codepoint (ISO-8859-1 is the 1:1 byte↔U+00..U+FF charset), so
    * the char-grain lattice/candidate machinery runs UNCHANGED over
    * byte sequences — `length` counts bytes, single-char pieces ARE
    * single bytes (the SentencePiece byte-fallback floor), and the
    * char sort order equals the byte order. Rendered back to the
    * lowercase-hex convention ([[bpeBytesApply]]'s token repr) at
    * the output edge.
    */
  private def byteMapExpr(c: String): Column =
    expr(s"decode(encode($c, 'UTF-8'), 'ISO-8859-1')")

  private[llm] def hexOfMapped(piece: String): String =
    piece.map(ch => f"${ch.toInt}%02x").mkString

  /** UNIGRAM-family piece-frequency fit: candidate pieces are every
    * word substring up to `maxPiece` chars (no positional marker —
    * unlike WordPiece, the unigram lattice scores a piece the same at
    * any offset); vocabulary = top `vocabN` by (count desc, piece
    * asc) PLUS every single-char piece so Viterbi segmentation
    * ([[UnigramViterbiExpr]]) is total. The piece count doubles as
    * its integer score. Same scale shape as [[wordpieceFit]]: one
    * scan, map-side combine, and the bounded two-branch
    * [[rankedVocabCut]] — no window ever sees the full candidate
    * frame.
    */
  def unigramFit(df: DataFrame, text: String, vocabN: Int = 64,
      maxPiece: Int = 4, byteGrain: Boolean = false): DataFrame = {
    require(maxPiece >= 1 && vocabN >= 1, "need maxPiece/vocabN >= 1")
    val wordsOf = expr(s"filter(split(lower($text), ' '), t -> t != '')")
    val words0 = df.select(explode(wordsOf).as("__w"))
    val words =
      if (byteGrain) words0.select(byteMapExpr("__w").as("__w"))
      else words0
    val cands = words
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(__w)),
           |  p -> transform(
           |    sequence(1, least($maxPiece, length(__w) - p + 1)),
           |    l -> substring(__w, p, l))))""".stripMargin)).as("piece"))
    rankedVocabCut(
      cands.groupBy(col("piece")).agg(count(lit(1)).as("cnt")),
      vocabN,
      length(col("piece")) === 1)
  }

  /** SentencePiece-style unigram-LM EM fit: starts from the
    * [[unigramFit]] frequency vocabulary and runs `iters` full EM
    * rounds — E-step: expected piece counts over each word's
    * segmentation lattice via the native forward-backward expression
    * ([[UnigramEmExpr]], the soft counterpart of the hard Viterbi
    * path), exact truncated micro units; M-step: piece score =
    * corpus expectation sum (+1 smoothing so no surviving piece's
    * probability collapses to zero); prune: vocabulary shrinks by
    * `keepPpm` per round on (expectation desc, piece asc), the
    * SentencePiece shrinking schedule with expected count as the
    * loss surrogate (exact Δ-likelihood pruning needs one extra
    * lattice pass per candidate — documented divergence), single-
    * char pieces always kept so segmentation stays total.
    *
    * Where the frequency fit scores a piece by how often its STRING
    * occurs, EM scores it by how much segmentation mass it actually
    * carries against the competing pieces — substrings that only
    * ever appear inside a stronger piece collapse toward zero, which
    * is exactly the redistribution SentencePiece's fit performs and
    * the frequency fit cannot (the corpus-likelihood spec pins the
    * improvement).
    *
    * Scale shape (the BPE-batched-fit discipline): per EM round, ONE
    * distributed pass over the distinct-word frame (word counts are
    * a map-side-combined aggregate, computed once and checkpointed)
    * with the bounded vocabulary broadcast inside the native
    * expression, then ONE map-side-combined piece aggregate whose
    * result is ≤ vocab rows — a bounded fit-collect per round; the
    * M-step/prune replay driver-side (zero Spark jobs). Words longer
    * than `maxWordLen` are excluded from the fit (bounds the lattice
    * on both engines).
    *
    * Output: the final vocabulary — (piece, em_score, rank), where
    * em_score is the last round's smoothed expectation and rank the
    * (em_score desc, piece asc) order.
    */
  def unigramEmFit(df: DataFrame, text: String, vocabN: Int = 64,
      maxPiece: Int = 4, iters: Int = 2, keepPpm: Long = 750000L,
      maxWordLen: Int = 16, seedN: Int = 0,
      byteGrain: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
    require(iters >= 1 && iters <= 16, "need 1 <= iters <= 16")
    require(keepPpm >= 1L && keepPpm <= 1000000L,
      "keepPpm must be in (0, 10^6]")
    // seedN (round 19): SentencePiece seeds its EM from a LARGE
    // substring-candidate table and lets the fit prune it, rather
    // than letting the raw frequency rank pre-decide the vocabulary.
    // seedN > vocabN widens the round-1 candidate pool to the top
    // seedN substrings (+ the single-char floor) while the prune
    // SCHEDULE is unchanged — keepN still starts at vocabN and
    // shrinks by keepPpm per round — so at equal final vocabN the
    // only difference is that the EXPECTATIONS pick the survivors
    // out of a wider pool (spec pins the corpus-likelihood win).
    // seedN = 0 keeps the original frequency-top-vocabN seed.
    require(seedN == 0 || seedN >= vocabN,
      "seedN must be 0 (seed from vocabN) or >= vocabN")
    val spark = df.sparkSession
    import spark.implicits._
    val words0 = df
      .select(explode(expr(
        s"filter(split(lower($text), ' '), t -> t != '')")).as("__w"))
    val words = (if (byteGrain)
        // byte grain (round-20): fold every word to its 1-char-per-
        // UTF-8-byte form BEFORE the length gate, so maxWordLen
        // bounds the BYTE lattice and single-char pieces are single
        // bytes — the SentencePiece --byte_fallback production form
        words0.select(byteMapExpr("__w").as("__w"))
      else words0)
      .filter(length(col("__w")) <= maxWordLen)
      .groupBy(col("__w"))
      .agg(count(lit(1)).cast("long").as("__c"))
      // reused once per EM round — truncate lineage so round r does
      // not replay rounds 1..r-1's scans (the kmeansCentroids rule)
      .localCheckpoint()
    var entries: Array[(String, Long)] =
      unigramFit(df, text, if (seedN > 0) seedN else vocabN, maxPiece,
          byteGrain)
        .select("piece", "cnt").collect()
        .map(r => (r.getString(0), r.getLong(1)))
    var keepN: Long = vocabN.toLong
    def single(p: String): Boolean =
      p.codePointCount(0, p.length) == 1
    for (_ <- 1 to iters) {
      val total = entries.map(_._2).sum
      val holder = new UnigramEmVocab(entries, total)
      val eSums = words
        .select(explode(column(UnigramEmExpr(
          expression(col("__w")), expression(col("__c")), holder,
          maxPiece, maxWordLen))).as("__e"))
        .groupBy(col("__e.piece").as("piece"))
        .agg(sum(col("__e.e_micro")).cast("long").as("s"))
        .collect() // bounded fit-collect: <= |vocab| rows
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      keepN = keepN * keepPpm / 1000000L
      val ranked = entries
        .map { case (p, _) => (p, eSums.getOrElse(p, 0L)) }
        .sortBy { case (p, s) => (-s, p) }
      entries = ranked.zipWithIndex
        .filter { case ((p, _), idx) => idx < keepN || single(p) }
        .map { case ((p, s), _) => (p, s + 1L) }
    }
    entries.sortBy { case (p, s) => (-s, p) }.zipWithIndex
      // byte grain renders pieces in the lowercase-hex byte repr at
      // the OUTPUT edge; rank is fixed before rendering (the mapped
      // char order equals the byte order, so either order agrees)
      .map { case ((p, s), i) =>
        (if (byteGrain) hexOfMapped(p) else p, s, (i + 1).toLong) }
      .toSeq.toDF("piece", "em_score", "rank")
  }

  /** Optimal (Viterbi) unigram segmentation at DISTINCT-word grain:
    * per distinct word of `text`, the minimal-piece / max-frequency
    * segmentation plus the greedy maximal-munch count over the SAME
    * vocabulary (the optimal-vs-greedy savings witness). The fitted
    * vocabulary ([[unigramFit]]) is a BOUNDED collect (vocabN +
    * single-char floor) baked into one native codegen'd expression;
    * everything else is a scan — callers re-attach per-occurrence
    * stats via a word-keyed (broadcastable) join.
    */
  def unigramTokenizeWords(df: DataFrame, text: String,
      vocab: DataFrame, maxPiece: Int = 4, maxWordLen: Int = 16)
      : DataFrame = {
    import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
    // bounded: vocabN top pieces + one row per distinct corpus char
    val entries = vocab.select("piece", "cnt").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val holder = new UnigramVocab(entries)
    val wordsOf = expr(s"filter(split(lower($text), ' '), t -> t != '')")
    df.select(explode(wordsOf).as("word")).distinct()
      .withColumn("__r", column(UnigramViterbiExpr(
        expression(col("word")), holder, maxPiece, maxWordLen)))
      .select(col("word"), col("__r.best_score").as("best_score"),
        col("__r.n_pieces").as("n_pieces"),
        col("__r.n_unk").as("n_unk"), col("__r.seg").as("seg"),
        col("__r.n_pieces_greedy").as("n_pieces_greedy"),
        col("__r.greedy_score").as("greedy_score"))
  }

  /** Word-blocklist curation gate (the LDNOOBW-style content-safety
    * stage every public curation stack runs next to the Gopher rules
    * and the PII scrub): per doc, occurrence and distinct-type hits
    * against a blocked-term list, hit density in ppm, and the gate
    * verdict (density over `maxPpm` OR `minTypes`+ distinct blocked
    * types — one shouted slur and one incidental medical term are
    * different documents).
    *
    * The list rides as a PLAN LITERAL (bounded — real blocklists are
    * hundreds of terms; a corpus-sized term table would use the
    * broadcast-join form of [[decontaminate]] instead), so the gate
    * is row-local inside whole-stage codegen: no shuffle, no join,
    * streaming-safe like the other gates.
    */
  def blocklistGate(df: DataFrame, text: String, blocked: Seq[String],
      maxPpm: Long = 20000L, minTypes: Int = 2): DataFrame = {
    require(blocked.nonEmpty && blocked.size <= 10000,
      "blocklist must be non-empty and bounded (<= 10000 terms)")
    require(blocked.forall(t =>
        t.nonEmpty && !t.contains("'") && !t.contains("\\")),
      "blocked terms must be non-empty, quote-free, and " +
        "backslash-free (a backslash would be re-escaped by SQL " +
        "literal parsing and match the wrong string)")
    // Terms are matched against tokens lowercased by the ENGINE's
    // lower(), so fold the list through the very same expression —
    // Java's String.toLowerCase(ROOT) uses the FULL Unicode case
    // mapping ('İ' → "i̇", 1→2 chars) where Spark's lower()
    // uses the simple per-codepoint one ('İ' → 'i'), and a term
    // folded under the wrong mapping silently never fires in a
    // content-safety gate (round-17 ADVICE). NFC (matching
    // normalizeText's canonical form) still runs first, Java-side:
    // lower() never composes/decomposes, so the two steps commute
    // with the engine's view of the token. Residual divergence, by
    // design: tokens themselves are NOT NFC-normalized here (run
    // [[normalizeText]] upstream for that), and the simple mapping
    // means 'ß' ≠ 'SS' on BOTH sides — consistent, documented.
    val folded = blocked.map { t =>
      val nfc = java.text.Normalizer
        .normalize(t, java.text.Normalizer.Form.NFC)
      org.apache.spark.sql.catalyst.expressions.Lower(
        org.apache.spark.sql.catalyst.expressions.Literal(nfc))
        .eval(null).toString
    }
    val clash = Seq("n_tokens", "blocked_hits", "blocked_types",
      "blocked_ppm", "blocked_gate", "__toks")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"blocklistGate: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    val arr = folded.distinct.sorted
      .map(t => s"'$t'").mkString("array(", ", ", ")")
    df.withColumn("__toks",
        expr(s"filter(split(lower($text), ' '), t -> t != '')"))
      .withColumn("n_tokens", expr("CAST(size(__toks) AS BIGINT)"))
      .withColumn("blocked_hits", expr(
        s"CAST(size(filter(__toks, t -> array_contains($arr, t))) " +
          "AS BIGINT)"))
      .withColumn("blocked_types", expr(
        s"CAST(size(array_intersect(array_distinct(__toks), $arr)) " +
          "AS BIGINT)"))
      .withColumn("blocked_ppm", expr(
        "blocked_hits * 1000000L DIV greatest(n_tokens, 1L)"))
      .withColumn("blocked_gate", expr(
        s"blocked_ppm > ${maxPpm}L OR blocked_types >= $minTypes"))
      .drop("__toks")
  }

  /** Word-blocklist SCRUB — the redaction counterpart of
    * [[blocklistGate]] (gate drops the document; scrub keeps it and
    * masks the terms, the PII-redaction discipline applied to a
    * dictionary): every whole-word occurrence of a blocked term is
    * replaced by `mask` in one regex pass, with occurrence and
    * masked-char accounting from the same pattern. Terms are
    * restricted to lowercase ASCII word characters and the match is
    * case-insensitive with `\b` anchors on both ends — under those
    * anchors a match is always a complete word equal to exactly one
    * term, so Java regex (leftmost-first) and RE2 (leftmost-longest)
    * agree on every input and the oracle is exact. Entirely
    * row-local inside whole-stage codegen: no shuffle, no join,
    * streaming-safe.
    *
    * CONTRACT ASYMMETRY vs [[blocklistGate]] (intentional, see
    * COVERAGE.md): the gate accepts Unicode terms (it matches whole
    * exact tokens after an engine-semantics case fold — no regex
    * involved), while the scrub REJECTS non-ASCII terms outright.
    * The scrub's exactness argument lives in `\b`, and `\b` itself
    * is the problem for Unicode: Java defines word chars as
    * `[a-zA-Z0-9_]` (by default) while RE2's `\b` is ASCII-only
    * too, but the two engines' case-insensitive (?i) matching of
    * non-ASCII letters differs (simple vs full folding), so a
    * Unicode alternation could mask different spans per engine.
    * Rejecting at plan time beats silently divergent redaction.
    * Pre-fold Unicode content with [[normalizeText]] + translit
    * upstream, or gate-and-drop instead of scrubbing.
    */
  def blocklistScrub(df: DataFrame, text: String,
      blocked: Seq[String], mask: String = "[TERM]"): DataFrame = {
    require(blocked.nonEmpty && blocked.size <= 10000,
      "blocklist must be non-empty and bounded (<= 10000 terms)")
    require(blocked.forall(_.matches("[a-z0-9_]+")),
      "blocked terms must be lowercase ASCII word characters " +
        "([a-z0-9_]+) — anything else breaks the \\b whole-word " +
        "anchors that make the two regex engines agree")
    require(mask.nonEmpty && !mask.contains("'") &&
      !mask.contains("\\") && !mask.contains("$"),
      "mask must be non-empty and free of quotes, backslashes, and " +
        "dollar signs (a '$' would be a group reference in the " +
        "replacement)")
    val clash = Seq("scrub_text", "n_masked", "masked_chars")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"blocklistScrub: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    // longest-first is cosmetic here (see scaladoc) but keeps the
    // alternation canonical and deterministic
    val pat = blocked.distinct.sortBy(t => (-t.length, t))
      .mkString("(?i)\\\\b(", "|", ")\\\\b")
    df.withColumn("scrub_text",
        expr(s"regexp_replace($text, '$pat', '$mask')"))
      .withColumn("n_masked", expr(
        s"CAST(size(regexp_extract_all($text, '$pat', 0)) AS BIGINT)"))
      .withColumn("masked_chars", expr(
        s"aggregate(regexp_extract_all($text, '$pat', 0), 0L, " +
          "(a, x) -> a + length(x))"))
  }

  /** Calibration report for the linear quality classifier
    * ([[lrQualityGate]]): bins documents by the clamped model score
    * and, per bin, compares the model's linear-link probability
    * p̂ = clamp((z + 1) / 2, 0, 1) against the observed positive
    * rate under the heuristic quality label
    * (qualityScoreExpr ≥ `qualityCut`) — the reliability diagram +
    * expected-calibration-error number a curation stack reads before
    * trusting a model gate over the heuristics it replaces.
    *
    * Everything after the row-local scoring is PURE INTEGER
    * arithmetic in micro units (score and p̂ clamped to ±1e6 BEFORE
    * any integer division, so truncate-vs-floor semantics never see
    * a negative operand): bin = (smc + 1e6)·bins DIV 2e6, per-bin
    * mean p̂ and positive rate in ppm, |gap| per bin, and the
    * doc-weighted ECE total riding on every row via a pinned
    * broadcast cross (the psiDrift shape). One row-local projection
    * + one #bins-grain aggregate — no corpus shuffle beyond the
    * groupBy on the bounded bin key.
    */
  def lrCalibration(df: DataFrame, text: String, id: String,
      dim: Int = 32, bins: Int = 8, qualityCut: Double = 0.5)
      : DataFrame = {
    require(bins >= 2 && bins <= 1000, "need 2 <= bins <= 1000")
    val scored = withLrGate(df.select(col(id), col(text)), text, dim)
      .withColumn("__sm", expr(
        "CAST(round(lr_score * 1000000) AS BIGINT)"))
      .withColumn("__smc", expr(
        "least(greatest(__sm, -1000000L), 1000000L)"))
      .withColumn("__phat", expr("(__smc + 1000000L) DIV 2"))
      .withColumn("__label",
        qualityScoreExpr(text) >= lit(qualityCut))
      .withColumn("bin", expr(
        s"least((__smc + 1000000L) * $bins DIV 2000000, " +
          s"${bins - 1}L)"))
    val per = scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__sm")).as("sum_score_micro"),
        sum(col("__phat")).as("__sp"),
        expr("CAST(count_if(__label) AS BIGINT)").as("__np"))
      .withColumn("mean_phat_ppm", expr("__sp DIV n_docs"))
      .withColumn("pos_rate_ppm", expr(
        "__np * 1000000L DIV n_docs"))
      .withColumn("gap_ppm", expr(
        "abs(mean_phat_ppm - pos_rate_ppm)"))
    // ECE as a pinned broadcast cross over the ≤bins-row frame
    graft.engine.Dist.selfScalarCross(per, expr(
        "CAST(sum(gap_ppm * n_docs) DIV sum(n_docs) AS BIGINT)")
        .as("ece_ppm"))
      .select(col("bin"), col("n_docs"), col("sum_score_micro"),
        col("mean_phat_ppm"), col("pos_rate_ppm"), col("gap_ppm"),
        col("ece_ppm"))
  }

  /** The HTML entity-reference forms [[decodeEntities]] resolves:
    * the named core set plus their decimal/hex numeric spellings and
    * nbsp — the set that actually dominates crawl text (template
    * engines and double-encoding emit these; exotic references are
    * rare and stay encoded rather than risk per-engine decode
    * drift). Order matters: '&amp;'/'&#38;'/'&#x26;' decode LAST so
    * a double-encoded '&amp;lt;' resolves exactly one layer per
    * pass (the standard single-pass contract, not a fixpoint); the
    * amp family itself decodes in ONE regex scan ([[ampFamilyRegex]])
    * rather than three sequential replaces — a scan never re-reads
    * its own output, so '&amp;#38;' yields '&#38;' (one layer),
    * where sequential replaces cascaded two layers inside the
    * family.
    */
  val entityTable: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&#60;" -> "<", "&#x3c;" -> "<",
    "&gt;" -> ">", "&#62;" -> ">", "&#x3e;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"", "&#x22;" -> "\"",
    "&apos;" -> "'", "&#39;" -> "'", "&#x27;" -> "'",
    "&nbsp;" -> " ", "&#160;" -> " ", "&#xa0;" -> " ",
    "&amp;" -> "&", "&#38;" -> "&", "&#x26;" -> "&")

  /** The three '&' spellings as one alternation. No two alternatives
    * can match at the same offset (they diverge by the second or
    * third char), so Java regex (leftmost-first) and DuckDB RE2
    * agree on every input — safe to share with the oracle. */
  val ampFamilyRegex: String = "&(amp|#38|#x26);"

  /** [[entityTable]] minus the amp family — the entries decoded as
    * sequential literal replaces; the amp family goes through the
    * single-scan [[ampFamilyRegex]] step instead. */
  val entityTableNonAmp: Seq[(String, String)] =
    entityTable.filter(_._2 != "&")

  /** Regex alternation matching exactly the decoded forms — shared
    * with the oracle so `n_entities` counts agree by construction. */
  val entityRegex: String =
    "&(lt|gt|quot|apos|nbsp|amp|#60|#62|#34|#39|#160|#38" +
      "|#x3c|#x3e|#x22|#x27|#xa0|#x26);"

  /** Doc-grain unigram (Viterbi) tokenization — [[wordpieceApply]]'s
    * shape over the optimal lattice: per doc, word/piece/unk
    * accounting, pieces-per-word fertility ppm, and the first word's
    * segmentation witness. Memoized at DISTINCT-word grain like the
    * wordpiece form (the DP runs once per corpus-vocabulary word,
    * occurrences re-attach via a broadcastable word-keyed join).
    */
  def unigramApply(df: DataFrame, text: String, id: String,
      vocab: DataFrame, maxPiece: Int = 4, maxWordLen: Int = 16)
      : DataFrame = {
    val stats = unigramTokenizeWords(df, text, vocab, maxPiece,
      maxWordLen)
      .select(col("word").as("__w"), col("n_pieces").as("__n"),
        col("n_unk").as("__unk"), col("seg").as("__seg"))
    val base = df.select(col(id),
      expr(s"filter(split(lower($text), ' '), t -> t != '')")
        .as("__ws"))
    val occ = base.select(col(id), explode(col("__ws")).as("__w"))
      .join(stats, Seq("__w"))
      .groupBy(col(id))
      .agg(sum(col("__n")).as("n_pieces"),
        sum(col("__unk")).as("n_unk"))
    base
      .withColumn("n_words", expr("CAST(size(__ws) AS BIGINT)"))
      .withColumn("__w1", expr("try_element_at(__ws, 1)"))
      .join(occ, Seq(id), "left")
      .join(stats.select(col("__w").as("__w1"),
        col("__seg").as("__seg1")), Seq("__w1"), "left")
      .select(col(id), col("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"),
        expr("coalesce(n_pieces, 0L) * 1000000L " +
          "DIV greatest(n_words, 1L)").as("ppw_ppm"),
        coalesce(col("__seg1"), lit("")).as("seg_first"))
  }

  /** HTML entity decoding for crawl text — the cleanup step between
    * tag-stripping ([[mainContent]]) and normalization
    * ([[normalizeText]]): leftover '&amp;amp;', '&amp;#39;',
    * '&amp;quot;' poison shingles, token counts, and exact-dup
    * classes. Decodes [[entityTableNonAmp]] as a replace chain both
    * engines evaluate identically, then the amp family LAST in one
    * regex scan ([[ampFamilyRegex]]) so the one-layer-per-pass
    * contract holds even inside the family ('&amp;#38;' → '&#38;',
    * not '&'), and counts the references it decoded. Row-local,
    * codegen, no shuffle.
    */
  def decodeEntities(df: DataFrame, text: String): DataFrame = {
    val clash = Seq("dec_text", "n_entities")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"decodeEntities: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    def q(s: String): String = s
      .replace("\\", "\\\\").replace("'", "\\'")
    val nonAmp = entityTableNonAmp.foldLeft(text) { case (acc, (e, c)) =>
      s"replace($acc, '${q(e)}', '${q(c)}')"
    }
    val chain = s"regexp_replace($nonAmp, '$ampFamilyRegex', '&')"
    df.withColumn("dec_text", expr(chain))
      .withColumn("n_entities", expr(
        s"CAST(size(regexp_extract_all($text, '$entityRegex', 0)) " +
          "AS BIGINT)"))
  }

  /** One-pass multi-pattern dictionary matching ([[AcAutomaton]] —
    * Aho–Corasick): per row, total occurrences, distinct terms hit,
    * and the per-term count vector (sorted-term order) rendered as a
    * CSV witness column. Row-local codegen scan, O(chars + matches)
    * per row regardless of dictionary size — the shape that survives
    * a 100k-term dictionary where per-term `contains` scans the text
    * 100k times.
    */
  def multiMatch(df: DataFrame, text: String, terms: Seq[String])
      : DataFrame = {
    import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
    val clash = Seq("total_hits", "distinct_terms", "counts_csv",
      "__mm").filter(df.columns.contains)
    require(clash.isEmpty,
      s"multiMatch: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    val ac = new AcAutomaton(terms)
    df.withColumn("__mm",
        column(MultiMatchExpr(expression(col(text)), ac)))
      .withColumn("total_hits", col("__mm.total_hits"))
      .withColumn("distinct_terms", col("__mm.distinct_terms"))
      .withColumn("counts_csv", expr(
        "array_join(transform(__mm.counts, c -> CAST(c AS STRING)), ',')"))
      .drop("__mm")
  }

  /** License-marker classification — the code/document-corpus
    * curation gate every permissively-licensed training set needs:
    * match a bounded dictionary of license-identifying phrases
    * (lowercase) against the lowercased text in ONE Aho–Corasick
    * pass ([[multiMatch]]'s machinery — O(chars + matches) per row
    * at any dictionary size), sum hits per license tag, and pick the
    * verdict as the tag with the most marker hits (ties to the
    * lexicographically smaller tag; zero hits → 'unknown'). Emits
    * `license`, `license_hits`, `total_hits`, `distinct_markers`,
    * and `copyleft_gate` (true when the verdict tag is in the
    * `copyleft` set — the "needs legal review before training" flag).
    * Row-local codegen scan, no shuffle, streaming-safe.
    */
  def licenseScan(df: DataFrame, text: String, id: String,
      markers: Seq[(String, String)],
      copyleft: Set[String] = Set("agpl", "gpl"),
      carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
    require(markers.nonEmpty && markers.size <= 10000,
      "markers must be non-empty and bounded (<= 10000 phrases)")
    require(markers.forall { case (tag, p) =>
        tag.nonEmpty && p.nonEmpty && (tag + p).forall(c =>
          c != '\'' && c != '\\') &&
          p == p.toLowerCase && tag == tag.toLowerCase
      },
      "license tags/phrases must be non-empty, lowercase, " +
        "quote-free, and backslash-free (they ride as SQL literals)")
    // a duplicated (tag, phrase) pair would be summed TWICE into
    // that tag's hits (license_hits > total_hits, ties flip)
    require(markers.distinct.size == markers.size,
      "duplicate (tag, phrase) marker pairs would double-count")
    // the copyleft tags ride as SQL literals too — same contract
    require(copyleft.forall(t => t.nonEmpty && t.forall(c =>
        c != '\'' && c != '\\') && t == t.toLowerCase),
      "copyleft tags must be non-empty, lowercase, quote-free, and " +
        "backslash-free (they ride as SQL literals)")
    val phrases = markers.map(_._2).distinct.sorted
    val phraseIdx = phrases.zipWithIndex.toMap
    // counts array aligns to the SORTED phrase order (AcAutomaton's
    // contract, spec-pinned by the supplementary-codepoint test)
    val tagPhrases = markers.groupBy(_._1).toSeq.sortBy(_._1)
    val hitExprs = tagPhrases.map { case (tag, ps) =>
      tag -> ps.map { case (_, p) =>
        s"element_at(__lm.counts, ${phraseIdx(p) + 1})"
      }.mkString(" + ")
    }
    val structArr = hitExprs.map { case (tag, h) =>
      s"named_struct('h', -($h), 't', '$tag')"
    }.mkString("array(", ", ", ")")
    val ac = new AcAutomaton(phrases)
    val clash = Seq("__lm", "__lw", "license", "license_hits",
      "total_hits", "distinct_markers", "copyleft_gate")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"licenseScan: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    val copyleftArr = copyleft.toSeq.sorted
      .map(t => s"'$t'").mkString("array(", ", ", ")")
    df.withColumn("__lm",
        column(MultiMatchExpr(expression(lower(col(text))), ac)))
      // winner = most hits, tie to smaller tag: ascending struct
      // sort on (-hits, tag), zero-hit tags filtered out;
      // try_element_at: a no-marker doc leaves the filtered array
      // EMPTY, which must read as NULL -> 'unknown', not an error
      .withColumn("__lw", expr(
        s"try_element_at(filter(sort_array($structArr), " +
          "s -> s.h < 0), 1)"))
      .withColumn("license", expr("coalesce(__lw.t, 'unknown')"))
      .withColumn("license_hits", expr(
        "CAST(coalesce(-__lw.h, 0L) AS BIGINT)"))
      // NULL text -> NULL __lm: every count coerces to 0 like the
      // verdict path does (the mirror's LEFT JOIN + coalesce shape),
      // not a half-NULL row
      .withColumn("total_hits",
        coalesce(col("__lm.total_hits"), lit(0L)))
      .withColumn("distinct_markers",
        coalesce(col("__lm.distinct_terms"), lit(0L)))
      .withColumn("copyleft_gate", expr(
        s"array_contains($copyleftArr, license)"))
      .drop("__lm", "__lw")
      // `carry` (round-20): columns to retain alongside the verdict
      // — the streaming release-gate stage chains the PII and
      // contamination gates over the SAME frame (a join-back would
      // be a stream-stream join); Nil = the original projection
      .select((col(id) +: carry.map(col)) ++
        Seq(col("license"), col("license_hits"),
          col("total_hits"), col("distinct_markers"),
          col("copyleft_gate")): _*)
  }

  /** k-anonymity suppression ladder over a quasi-identifier tuple —
    * the metadata-privacy gate a released training corpus runs over
    * its per-document attributes: every published row must share its
    * PUBLISHED quasi-identifier combination with at least k−1
    * others, else the combination is GENERALIZED (last quasi column
    * folded to '*', then the last two, …). The ladder is SEQUENTIAL:
    * level 0 publishes the exact groups of size ≥ k; the remaining
    * rows fold one column and are re-counted AMONG THEMSELVES, and
    * so on — counting each level over the still-unpublished rows is
    * what makes every published equivalence class (the rows sharing
    * one published tuple, which IS an attacker's anonymity set) hold
    * ≥ k rows. A whole-frame count per level — the obvious
    * shortcut — would let a published ("x","*") class hold fewer
    * than k rows because its count borrowed rows that published at a
    * finer level (this operator shipped that way for one commit; the
    * l-diversity design review caught it). Rows that reach the
    * all-'*' level still under k are emitted with
    * `is_anonymous = false` — nothing can save them. NULL quasi
    * values fold to the '<null>' literal (a real, groupable value);
    * a REAL quasi value equal to the '*' marker or containing the
    * U+0001 key separator is a CONTRACT ERROR raised in-plan —
    * either would silently break the published-class ≥ k
    * guarantee. Emits the generalized
    * quasi columns (strings, original names), `anon_level` (0 =
    * exact … q = all '*'), `group_n` (the published CLASS size),
    * `is_anonymous`.
    *
    * Scale shape: one map-side-combined count aggregate + one join
    * per level over a SHRINKING remainder (level 0 publishes the
    * bulk; the all-'*' count table is one row), `localCheckpoint`
    * truncating per-level lineage like the kmeans loop. No windows.
    */
  def kAnonymize(df: DataFrame, id: String, quasi: Seq[String],
      k: Int): DataFrame = {
    require(quasi.nonEmpty && quasi.size <= 8,
      "need 1 <= quasi columns <= 8")
    require(k >= 1, "need k >= 1")
    val n = quasi.size
    val base = df.select(
      (col(id).as("__id") +: quasi.zipWithIndex.map { case (c, i) =>
        // fail-loudly guards folded INTO the consumed column: a real
        // '*' value is indistinguishable from the generalized marker
        // in the release, and a value containing the \u0001 key
        // separator would merge two distinct tuples into one COUNT
        // key while the published columns stay distinct -- both
        // silently break the published-class >= k guarantee, so they
        // are contract errors, not caveats
        coalesce(expr(
          s"CASE WHEN CAST($c AS STRING) = '*' THEN raise_error(" +
            s"'kAnonymize: quasi column $c contains the literal " +
            "value * -- it collides with the generalization " +
            "marker; map it upstream') " +
            s"WHEN contains(CAST($c AS STRING), '\u0001') THEN " +
            s"raise_error('kAnonymize: quasi column $c contains " +
            "the key-separator control character U+0001; map it " +
            "upstream') " +
            s"ELSE CAST($c AS STRING) END"),
          lit("<null>")).as(s"__q$i")
      }): _*)
    var remaining = base.localCheckpoint()
    var published: DataFrame = null
    for (j <- 0 to n) {
      val keyCols = (0 until n).map(i =>
        if (i < n - j) col(s"__q$i") else lit("*"))
      // separator is a control char so ("ab","c") and ("a","bc")
      // cannot collide
      val keyed = remaining.withColumn("__key",
        concat_ws("\u0001", keyCols: _*))
      val cnt = keyed.groupBy(col("__key"))
        .agg(count(lit(1)).cast("long").as("__n"))
      val tagged = keyed.join(cnt, Seq("__key"))
      // the last level emits everything — an under-k leftover cannot
      // generalize further, so it publishes flagged not-anonymous
      val pub = (if (j == n) tagged
        else tagged.filter(col("__n") >= k))
        .withColumn("anon_level", lit(j.toLong))
        .withColumn("group_n", col("__n"))
        .withColumn("is_anonymous", col("__n") >= k)
        .select((col("__id") +:
          (0 until n).map(i =>
            (if (i < n - j) col(s"__q$i") else lit("*"))
              .as(s"__g$i"))) ++
          Seq(col("anon_level"), col("group_n"),
            col("is_anonymous")): _*)
      published = if (published == null) pub
        else published.unionByName(pub)
      if (j < n)
        remaining = tagged.filter(col("__n") < k)
          .select(col("__id") +: (0 until n).map(i =>
            col(s"__q$i")): _*)
          .localCheckpoint()
    }
    published.select(
      (col("__id").as(id) +: quasi.zipWithIndex.map {
        case (c, i) => col(s"__g$i").as(c)
      }) ++ Seq(col("anon_level"), col("group_n"),
        col("is_anonymous")): _*)
  }

  /** l-diversity audit over the [[kAnonymize]] ladder — k-anonymity's
    * companion check: a group of k identical quasi-identifiers is
    * still disclosive if everyone in it shares the SAME sensitive
    * value (the homogeneity attack), so each PUBLISHED group must
    * also carry at least `l` distinct sensitive values. Runs the
    * same finest-qualifying-level selection, then aggregates per
    * published tuple: `group_n`, `n_sensitive` (exact distinct
    * count), `is_diverse` (n_sensitive ≥ l AND group_n ≥ k). Output
    * is one row per published group (combo-bounded, far below row
    * count). NULL sensitive values fold to '<null>' — a real value
    * an attacker can learn, so it COUNTS toward (not against)
    * diversity like any other.
    *
    * Scale shape: [[kAnonymize]]'s level passes plus ONE
    * (published-tuple, sensitive)-keyed aggregate pair — both
    * map-side combining; no windows.
    */
  def lDiversity(df: DataFrame, id: String, quasi: Seq[String],
      sensitive: String, k: Int, l: Int): DataFrame = {
    require(l >= 1, "need l >= 1")
    require(!quasi.contains(sensitive),
      "the sensitive attribute cannot be a quasi-identifier")
    val anon = kAnonymize(df, id, quasi, k)
    // one sensitive row per id, loudly: a duplicated id would join
    // m*m times and inflate group_n past the true class size -- a
    // silently-wrong privacy audit (the guard folds into the
    // consumed column so pruning cannot drop it)
    val sens = df
      .groupBy(col(id).as("__sid"))
      .agg(count(lit(1)).as("__sc"),
        max(coalesce(col(sensitive).cast("string"), lit("<null>")))
          .as("__sv0"))
      .select(col("__sid"), expr(
        "CASE WHEN __sc > 1L THEN raise_error(concat(" +
          "'lDiversity: duplicate id ', CAST(__sid AS STRING), " +
          "' -- ids must be unique')) ELSE __sv0 END").as("__sv"))
    anon.join(sens, col(id) === col("__sid"))
      .groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).cast("long").as("group_n"),
        countDistinct(col("__sv")).cast("long").as("n_sensitive"))
      .withColumn("is_diverse",
        col("n_sensitive") >= l && col("group_n") >= k)
  }

  /** t-closeness audit over the [[kAnonymize]] ladder — the third
    * member of the privacy triad: a published class can satisfy
    * k-anonymity AND l-diversity (many distinct sensitive values)
    * while its sensitive DISTRIBUTION still leaks — e.g. a class
    * whose salaries are all in the global bottom decile is disclosive
    * however many distinct values it holds (the skewness attack
    * l-diversity cannot see). The check: per published class, the
    * Earth-Mover's Distance between the class's distribution of an
    * ORDERED sensitive attribute and the whole table's, must stay
    * under `t`. For an ordered attribute with the standard
    * unit-step ground distance, exact EMD is the mean of the
    * absolute cumulative-probability gaps over the m global domain
    * values: EMD = (1/(m−1)) · Σ_i |P_class(≤ v_i) − P_global(≤ v_i)|.
    *
    * Integer contract: cumulative probabilities are truncating ppm
    * (`cum · 10^6 DIV n`), the gap sum is an exact long fold, and
    * `emd_ppm` is the truncating mean — bit-identical cross-engine,
    * and every intermediate stays ≤ 10^6 · m regardless of corpus
    * size. m = 1 (a single global sensitive value) defines
    * emd_ppm = 0. Contract errors, raised in-plan like the
    * [[lDiversity]] guards: a duplicated id (m×m join inflation), a
    * NULL sensitive value (an ordered EMD needs a total order — map
    * or drop NULLs upstream), and a sensitive domain wider than
    * `maxDomain` (the fold rides the plan as a bounded array; a
    * quasi-continuous attribute should be bucketed upstream, which
    * is also what makes t-closeness itself meaningful).
    *
    * Output: one row per published class — the generalized quasi
    * columns, `group_n`, `emd_ppm`, `is_close` (emd_ppm ≤ tPpm).
    *
    * Scale shape: [[kAnonymize]]'s level passes, ONE
    * (class, sensitive)-keyed aggregate, one class-keyed and one
    * value-keyed reduction of it (all map-side combining), then a
    * broadcast of the ONE-row global domain frame into a row-local
    * fold over ≤ maxDomain entries. No windows, nothing
    * driver-side, output bounded by published-class count.
    */
  def tCloseness(df: DataFrame, id: String, quasi: Seq[String],
      sensitive: String, k: Int, tPpm: Long = 150000L,
      maxDomain: Int = 4096): DataFrame = {
    require(tPpm >= 0L && tPpm <= 1000000L,
      "need 0 <= tPpm <= 10^6 (emd_ppm is a ppm quantity)")
    require(maxDomain >= 2, "need maxDomain >= 2")
    require(!quasi.contains(sensitive),
      "the sensitive attribute cannot be a quasi-identifier")
    val anon = kAnonymize(df, id, quasi, k)
    // one ORDERED sensitive value per id, loudly (the lDiversity
    // duplicate-id guard, plus the NULL raise: max() would silently
    // skip NULLs and under-count the class mass otherwise)
    val sens = df
      .groupBy(col(id).as("__tid"))
      .agg(count(lit(1)).as("__tc"),
        max(col(sensitive).cast("long")).as("__tv0"),
        // __tn counts genuine NULLs; __tb counts values the long
        // cast silently NULLed (non-ANSI: a string attribute like
        // 'disease' casts to NULL without error) — without the
        // second counter the documented raise never fires and the
        // null key crashes map_from_entries downstream with a
        // misleading message (round-20 self-review)
        sum(when(col(sensitive).isNull, 1L).otherwise(0L))
          .as("__tn"),
        sum(when(col(sensitive).isNotNull &&
            col(sensitive).cast("long").isNull, 1L).otherwise(0L))
          .as("__tb"))
      .select(col("__tid"), expr(
        "CASE WHEN __tc > 1L THEN raise_error(concat(" +
          "'tCloseness: duplicate id ', CAST(__tid AS STRING), " +
          "' -- ids must be unique')) " +
          "WHEN __tn > 0L THEN raise_error(concat(" +
          "'tCloseness: NULL sensitive value for id ', " +
          "CAST(__tid AS STRING), ' -- an ordered EMD needs a " +
          "total order; map or drop NULLs upstream')) " +
          "WHEN __tb > 0L THEN raise_error(concat(" +
          "'tCloseness: sensitive value for id ', " +
          "CAST(__tid AS STRING), ' is not castable to an ordered " +
          "integer -- rank or bucket the attribute upstream')) " +
          "ELSE __tv0 END").as("__tv"))
    val clsSv = anon.join(sens, col(id) === col("__tid"))
      .groupBy(quasi.map(col) :+ col("__tv"): _*)
      .agg(count(lit(1)).cast("long").as("__c"))
    // the global distribution is the column-wise sum of the class
    // distributions (the ladder publishes every id exactly once), so
    // it reduces from the per-class counts — one extra map-side
    // aggregate, no second scan of the input
    val glob = clsSv.groupBy(col("__tv"))
      .agg(sum(col("__c")).cast("long").as("__g"))
      .agg(sort_array(collect_list(struct(col("__tv"), col("__g"))))
          .as("__dom0"),
        sum(col("__g")).cast("long").as("__nt"))
      .select(expr(
        s"""CASE WHEN size(__dom0) > $maxDomain THEN raise_error(
           |  concat('tCloseness: ', CAST(size(__dom0) AS STRING),
           |    ' distinct sensitive values exceed maxDomain=$maxDomain',
           |    ' -- bucket the attribute upstream'))
           |ELSE __dom0 END""".stripMargin).as("__dom"),
        col("__nt"))
    val cls = clsSv.groupBy(quasi.map(col): _*)
      .agg(sum(col("__c")).cast("long").as("group_n"),
        map_from_entries(collect_list(struct(col("__tv"),
          col("__c")))).as("__cm"))
    cls.crossJoin(broadcast(glob))
      // the fold walks the global domain in value order carrying
      // (cum_class, cum_global, gap_sum); the LAST entry's gap is 0
      // by construction (both cum ppms hit exactly 10^6 — truncating
      // division of an exact multiple is exact), so summing all m
      // entries IS the (m−1)-prefix sum the EMD needs
      .withColumn("emd_ppm", expr(
        """CASE WHEN size(__dom) <= 1 THEN 0L ELSE
          |aggregate(__dom,
          |  named_struct('cc', 0L, 'cg', 0L, 'acc', 0L),
          |  (a, x) -> named_struct(
          |    'cc', a.cc + coalesce(element_at(__cm, x.__tv), 0L),
          |    'cg', a.cg + x.__g,
          |    'acc', a.acc + abs(
          |      (a.cc + coalesce(element_at(__cm, x.__tv), 0L))
          |        * 1000000L DIV group_n
          |      - (a.cg + x.__g) * 1000000L DIV __nt)),
          |  a -> a.acc) DIV (size(__dom) - 1L) END""".stripMargin))
      .withColumn("is_close", col("emd_ppm") <= tPpm)
      .select(quasi.map(col) ++
        Seq(col("group_n"), col("emd_ppm"), col("is_close")): _*)
  }

  /** k-anonymity utility report over the [[kAnonymize]] ladder — the
    * metric sheet a release uses to CHOOSE k: anonymity is free at
    * k=1 and useless at k=N, and the cost in between is exactly how
    * coarse the published classes had to become. Per ladder level:
    * `n_classes`, `n_rows`, `n_anon_rows` / `n_supp_rows` (rows the
    * level published anonymous vs flagged unanonymizable),
    * `min_class_n` / `max_class_n` (class spread), and `disc_sum` —
    * the Bayardo–Agrawal discernibility penalty Σ group_n² over the
    * anonymous classes (each published row is indistinguishable from
    * its whole class, so it "costs" the class size; suppressed rows
    * are reported as a count and left to the caller's weighting,
    * the standard n·|T| convention being policy). Exact long
    * arithmetic: Σ group_n² ≤ n_rows², so an in-plan guard raises
    * past √Long.Max rows per level instead of wrapping.
    *
    * Scale shape: two map-side-combined aggregates over the ladder
    * output (class collapse, then level collapse); output bounded by
    * quasi+1 rows. No windows, nothing driver-side.
    */
  def kAnonUtility(df: DataFrame, id: String, quasi: Seq[String],
      k: Int): DataFrame = {
    val anon = kAnonymize(df, id, quasi, k)
    val cls = anon
      .groupBy(col("anon_level") +: quasi.map(col): _*)
      .agg(count(lit(1)).cast("long").as("__cn"),
        // bool min == AND: a class is anonymous iff every member is
        min(col("is_anonymous")).as("__an"))
    cls.groupBy(col("anon_level"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("__cn")).cast("long").as("n_rows"),
        sum(when(col("__an"), col("__cn")).otherwise(0L))
          .cast("long").as("n_anon_rows"),
        sum(when(!col("__an"), col("__cn")).otherwise(0L))
          .cast("long").as("n_supp_rows"),
        min(col("__cn")).cast("long").as("min_class_n"),
        max(col("__cn")).cast("long").as("max_class_n"),
        // per-term and per-sum overflow share one bound: each
        // __cn <= Σ __cn and Σ __cn² <= (Σ __cn)², so rows-per-level
        // <= floor(sqrt(Long.Max)) keeps the whole tree exact
        expr("""CASE WHEN sum(__cn) > 3037000499L THEN raise_error(
          |  'kAnonUtility: level row count exceeds the exact long
          | discernibility bound (sqrt(Long.Max)) -- compute disc_sum
          | in decimal or shard the audit')
          |ELSE CAST(sum(CASE WHEN __an THEN __cn * __cn
          |  ELSE 0L END) AS BIGINT) END""".stripMargin
          .replace("\n", " ")).as("disc_sum"))
  }

  /** Unicode text normalization — the canonical-form fold every
    * hash/equality-based operator (exact dedup, MinHash shingles,
    * decontamination joins, anchor grouping) needs upstream, since
    * 'é' spelled U+00E9 and 'e'+U+0301 hash differently but are the
    * same grapheme. Adds:
    *   - `norm_text`: NFC (native codegen'd [[NfcNormalizeExpr]]) →
    *     lowercase → whitespace-class ([\t\n\x0B\f\r]) to space →
    *     strip remaining C0/DEL controls → collapse space runs →
    *     trim;
    *   - `n_chars_raw` / `n_chars_norm` (codepoint counts) and
    *     `norm_changed` for curation-funnel accounting.
    * Row-local, no shuffle; the NFC fast path (`isNormalized`) makes
    * already-clean ASCII rows allocation-free. NFC (not NFKC) is the
    * operator form because it is loss-less (no compatibility
    * folding) and oracle-mirrorable (`nfc_normalize`); the NFKC
    * compatibility fold is exposed separately as [[NfkcNormalizeExpr]]
    * (`graft_nfkc`) and pinned by spec.
    */
  def normalizeText(df: DataFrame, text: String): DataFrame = {
    import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
    val clash = Seq("norm_text", "n_chars_raw", "n_chars_norm",
      "norm_changed", "__nfc").filter(df.columns.contains)
    require(clash.isEmpty,
      s"normalizeText: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    df.withColumn("__nfc", column(NfcNormalizeExpr(expression(col(text)))))
      .withColumn("norm_text", expr(
        """trim(regexp_replace(regexp_replace(regexp_replace(
          |  lower(__nfc),
          |  '[\\t\\n\\x0B\\f\\r]', ' '),
          |  '[\\x00-\\x08\\x0E-\\x1F\\x7F]', ''),
          |  ' {2,}', ' '))""".stripMargin))
      .withColumn("n_chars_raw",
        expr(s"CAST(length($text) AS BIGINT)"))
      .withColumn("n_chars_norm",
        expr("CAST(length(norm_text) AS BIGINT)"))
      .withColumn("norm_changed", expr(s"norm_text <> $text"))
      .drop("__nfc")
  }

  /** The pinned mojibake repair table: UTF-8 bytes of a common
    * character mis-decoded as CP1252 and re-encoded (the classic
    * double-encoding corruption crawled text arrives with; what ftfy
    * fixes in Python stacks). Key = the corrupted sequence, value =
    * the intended character. Restricted to sequences whose CP1252
    * bytes are all PRINTABLE (e.g. U+201D "”" is excluded — its
    * trailing byte 0x9D is unassigned in CP1252, so the corrupted
    * form carries a control char that survives no literal round-trip
    * across engines). Ordered longest-first so the 3-byte "â€¦"
    * family is consumed before any 2-byte "Ã©" family prefix could
    * be. Shared verbatim with the DuckDB oracle generator — both
    * engines replay the identical replace chain.
    */
  val mojibakeMap: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€˜" -> "‘", "â€œ" -> "“",
    "â€”" -> "—", "â€“" -> "–", "â€¦" -> "…",
    "Ã¡" -> "á", "Ã©" -> "é", "Ã­" -> "í", "Ã³" -> "ó",
    "Ãº" -> "ú", "Ã±" -> "ñ", "Ã¼" -> "ü", "Ã¶" -> "ö",
    "Ã¤" -> "ä", "Ã§" -> "ç", "Ã¨" -> "è", "Ãª" -> "ê")

  /** Mojibake repair: undoes UTF-8→CP1252 double-encoding for the
    * pinned [[mojibakeMap]] sequences, with exact fix accounting.
    * Two literal-replace phases (3-char family, then 2-char family),
    * each a left-to-right non-overlapping `replace` chain — the one
    * string-rewrite primitive whose semantics Java and every SQL
    * engine agree on exactly (no regex, no folding). Because every
    * 3-char repair shrinks the text by exactly 2 code points and
    * every 2-char repair by exactly 1, the per-phase fix counts fall
    * out of two length diffs — no per-pattern occurrence scan.
    * The operator is IDEMPOTENT (pinned by spec): the one repair
    * that can re-form a mapped sequence — "â€œ"→"“" directly after a
    * dangling "â€" forms the en-dash key "â€“" — is consumed by the
    * later "â€“" step of the SAME chain, and no step can form a key
    * an earlier step owns (no other output char occurs inside any
    * key). Entirely row-local inside whole-stage codegen:
    * no shuffle, no state, drops into any batch or streaming plan.
    */
  def mojibakeFix(df: DataFrame, text: String): DataFrame = {
    val clash = Seq("fixed_text", "n_fixes", "__mj3")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"mojibakeFix: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    // the blocklistGate guard, applied here too: map entries are
    // interpolated into SQL string literals unescaped, so a quote or
    // backslash in a future table edit would corrupt the replace
    // chain IDENTICALLY in both engines (the shared generator means
    // the oracle would still match, hiding the bug) — fail loudly
    mojibakeMap.foreach { case (bad, good) =>
      Seq(bad, good).foreach { s =>
        require(!s.contains("'") && !s.contains("\\"),
          s"mojibakeFix: map entry '$s' contains a quote/backslash — " +
            "not literal-safe for the SQL replace chain")
      }
    }
    val (three, two) = mojibakeMap.partition(_._1.length == 3)
    def chain(inner: String, ms: Seq[(String, String)]): String =
      ms.foldLeft(inner) { case (acc, (bad, good)) =>
        s"replace($acc, '$bad', '$good')"
      }
    df.withColumn("__mj3", expr(chain(text, three)))
      .withColumn("fixed_text", expr(chain("__mj3", two)))
      .withColumn("n_fixes", expr(
        s"CAST((length($text) - length(__mj3)) DIV 2 + " +
          "(length(__mj3) - length(fixed_text)) AS BIGINT)"))
      .drop("__mj3")
  }

  /** Mixed-script / confusable-spoofing signal: per-document letter
    * counts by Unicode script (Latin, Cyrillic, Greek — the classic
    * homoglyph triangle — plus an "other letters" bucket) and
    * `mixed_ppm` = letters OUTSIDE the majority script, in ppm. A
    * natural document is near-monoscript (mixed_ppm ~0 or a small
    * loanword tail); Cyrillic 'а' / Greek 'ο' substituted into Latin
    * words — the spam/SEO and phishing obfuscation trick — shows up
    * as a small nonzero minority exactly here, upstream of any
    * token-level gate that the substitution is designed to evade.
    * Counts are code-point exact via per-script class erasure
    * (length diffs of `regexp_replace`), so both engines agree
    * wherever their Unicode script tables agree (all stable scripts;
    * the fixture plants only U+0430/U+03BF-class substitutions).
    * Entirely row-local inside whole-stage codegen; streaming-safe.
    */
  def scriptMix(df: DataFrame, text: String): DataFrame = {
    val clash = Seq("n_letters", "n_latin", "n_cyrillic", "n_greek",
      "n_other_letters", "mixed_ppm").filter(df.columns.contains)
    require(clash.isEmpty,
      s"scriptMix: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    def scriptCount(cls: String): String =
      s"CAST(length(regexp_replace($text, '[^\\\\p{$cls}]', '')) " +
        "AS BIGINT)"
    df.withColumn("n_letters", expr(scriptCount("L")))
      .withColumn("n_latin", expr(scriptCount("IsLatin")))
      .withColumn("n_cyrillic", expr(scriptCount("IsCyrillic")))
      .withColumn("n_greek", expr(scriptCount("IsGreek")))
      .withColumn("n_other_letters", expr(
        "n_letters - n_latin - n_cyrillic - n_greek"))
      .withColumn("mixed_ppm", expr(
        "CASE WHEN n_letters = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE (n_letters - greatest(n_latin, n_cyrillic, n_greek, " +
          "n_other_letters)) * 1000000L DIV n_letters END"))
  }

  /** The pinned homoglyph fold table: Cyrillic and Greek letters
    * whose rendered glyph is (near-)identical to a Latin letter —
    * the substitution set confusable spam/phishing actually uses.
    * Conservative by design: only true lookalikes (Greek α/β/etc.
    * are visually distinct and stay). One string pair for a single
    * `translate` pass; shared verbatim with the DuckDB oracle.
    */
  val confusableFrom: String =
    "аеорсухіѕАВЕКМНОРСТХ" + "ονΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"
  val confusableTo: String =
    "aeopcyxisABEKMHOPCTX" + "ovABEZHIKMNOPTYX"

  /** Homoglyph REPAIR — the scrub to [[scriptMix]]'s gate: folds the
    * pinned Cyrillic/Greek lookalikes onto their Latin forms in ONE
    * `translate` pass (per-codepoint 1:1, the string primitive both
    * engines define identically), with exact fold accounting via a
    * from-class erasure count. Running it before fingerprinting /
    * dedup makes an obfuscated duplicate hash onto its clean
    * original — the recall the substitution was designed to destroy.
    * Row-local inside whole-stage codegen; zero state;
    * streaming twin [[graft.streaming.StreamingDedup
    * .confusableStage]].
    */
  def confusableFold(df: DataFrame, text: String): DataFrame = {
    val clash = Seq("folded_text", "n_folded")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"confusableFold: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    df.withColumn("folded_text", expr(
        s"translate($text, '$confusableFrom', '$confusableTo')"))
      // fold count via translate-DELETION (empty replacement drops
      // the from-chars on both engines): a per-char set lookup,
      // measurably cheaper than a 37-char regex class erasure over
      // every codepoint
      .withColumn("n_folded", expr(
        s"CAST(length($text) - length(translate($text, " +
          s"'$confusableFrom', '')) AS BIGINT)"))
  }

  /** Machine-text telemetry: sentence-length BURSTINESS — natural
    * prose mixes short and long sentences (high variance); template-
    * or model-generated text is conspicuously uniform. Emits, per
    * document, the sentence count, exact token-count sums
    * (Σx and Σx²) over the sentence lengths, the integer-ppm mean
    * sentence length, and `burstiness_ppm` — the squared coefficient
    * of variation CV² = Var/mean² = (n·Σx² − (Σx)²) / (Σx)², exact in
    * ppm because numerator and denominator are integers (0 for
    * perfectly uniform lengths, growing with spread). Sentences are
    * the non-empty `[.!?]+` splits; token counts are non-empty space
    * splits.
    *
    * BOUNDED-WINDOW CONTRACT (the Gopher-gate discipline): signals
    * read the FIRST 1024 sentences, each capped at 1023 tokens, so
    * every product is provably inside BIGINT
    * ((n·Σx²)·10^6 ≤ 1.1·10^18) on both engines — a pathological
    * document cannot silently wrap the arithmetic. Entirely row-local
    * HOFs inside one projection: no shuffle, no state,
    * streaming-safe.
    */
  def syntheticSignals(df: DataFrame, text: String): DataFrame = {
    val clash = Seq("n_sent", "sum_len", "sum_len2", "mean_sent_ppm",
      "burstiness_ppm", "__ss_lens").filter(df.columns.contains)
    require(clash.isEmpty,
      s"syntheticSignals: input already contains column(s) " +
        s"${clash.mkString(", ")}")
    df.withColumn("__ss_lens", expr(
        s"""transform(slice(filter(transform(split($text, '[.!?]+'),
           s -> size(filter(split(trim(s), ' '), t -> t != ''))),
           c -> c > 0), 1, 1024), c -> CAST(least(c, 1023) AS BIGINT))"""))
      .withColumn("n_sent",
        expr("CAST(size(__ss_lens) AS BIGINT)"))
      .withColumn("sum_len",
        expr("aggregate(__ss_lens, 0L, (a, x) -> a + x)"))
      .withColumn("sum_len2",
        expr("aggregate(__ss_lens, 0L, (a, x) -> a + x * x)"))
      .withColumn("mean_sent_ppm", expr(
        "CASE WHEN n_sent = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE sum_len * 1000000L DIV n_sent END"))
      .withColumn("burstiness_ppm", expr(
        "CASE WHEN sum_len = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE (n_sent * sum_len2 - sum_len * sum_len) * 1000000L " +
          "DIV (sum_len * sum_len) END"))
      .drop("__ss_lens")
  }
}
