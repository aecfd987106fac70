package graft

import graft.llm.{Preference, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Preference-fit / labeling-QA / model-evaluation operator specs:
  * pair extraction rules, Bradley-Terry MM invariants, exact kappa
  * and AUC pins on planted fixtures, mojibake repair semantics.
  */
class PreferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scored(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "source", "len")

  test("prefPairs: stride joins, winner rule, tie to smaller item, " +
      "same-item pairs dropped") {
    val df = scored((0L, "a", 10L), (1L, "b", 20L), (2L, "a", 20L),
      (3L, "c", 5L), (4L, "c", 9L))
    val pairs = Preference.prefPairs(df, "doc_id", "source", "len",
      strides = Seq(1L, 2L))
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4),
        r.getString(5)))
    // stride 1: (0,1) b wins 20>10; (1,2) TIE 20=20 -> 'a' < 'b';
    // (2,3) a wins; (3,4) same item c/c DROPPED.
    // stride 2: (0,2) same item a/a DROPPED; (1,3) b wins 20>5;
    // (2,4) a wins 20>9.
    assert(pairs === Array(
      (0L, 1L, "b", "a"), (1L, 2L, "a", "b"), (1L, 3L, "b", "c"),
      (2L, 3L, "a", "c"), (2L, 4L, "a", "c")))
  }

  test("bradleyTerry: dominance ordering, winless item pins to 0, " +
      "symmetric record ties exactly") {
    // a beats b 3x, b beats c 3x, a beats c 1x -> s_a > s_b > s_c = 0
    val pairs = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "c"),
      ("b", "c"), ("b", "c"), ("a", "c"))
      .toDF("winner_item", "loser_item")
    val out = Preference.bradleyTerry(pairs).orderBy("item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(t => (t._1, t._2, t._3)) ===
      Array(("a", 4L, 0L), ("b", 3L, 3L), ("c", 0L, 4L)))
    val s = out.map(t => t._1 -> t._4).toMap
    assert(s("a") > s("b") && s("b") > s("c"))
    assert(s("c") === 0L) // winless -> 0 from the first iteration
    // perfectly symmetric head-to-head record -> identical strengths
    val sym = Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x"))
      .toDF("winner_item", "loser_item")
    val ss = Preference.bradleyTerry(sym).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ss("x") === ss("y"))
    // determinism: the fixed-iteration integer recurrence replays
    val again = Preference.bradleyTerry(pairs).orderBy("item")
      .collect().map(r => r.getLong(3))
    assert(again === out.map(_._4))
  }

  test("bradleyTerry: maxItems bound rejects an unbroadcastable fit") {
    val many = (0 until 40).combinations(2).take(100).toSeq
      .map { case Seq(i, j) => (s"i$i", s"i$j") }
      .toDF("winner_item", "loser_item")
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(many, maxItems = 8)
    }
  }

  test("prefCycles: cyclic vs transitive triangles, degrees, and the " +
      "undecided-pair rule") {
    // a>b, b>c, c>a (a 3-cycle) and a>d, b>d, c>d (d loses out) —
    // triangles: {a,b,c} cyclic; {a,b,d},{b,c,d},{a,c,d} transitive
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"),
      ("b", "d"), ("c", "d")).toDF("winner_item", "loser_item")
    val out = Preference.prefCycles(pairs).orderBy("item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(7), r.getLong(8),
        r.getLong(9)))
    // (item, out, in, tri, cyc, n_triangles, n_cycles, cycle_ppm)
    assert(out === Array(
      ("a", 2L, 1L, 3L, 1L, 4L, 1L, 250000L),
      ("b", 2L, 1L, 3L, 1L, 4L, 1L, 250000L),
      ("c", 2L, 1L, 3L, 1L, 4L, 1L, 250000L),
      ("d", 0L, 3L, 3L, 0L, 4L, 1L, 250000L)))
    // an exactly-tied pair is UNDECIDED: with a<->b 1:1 the {a,b,c}
    // triangle dissolves and no cycle can exist
    val tied = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"))
      .toDF("winner_item", "loser_item")
    val t2 = Preference.prefCycles(tied).orderBy("item").collect()
    assert(t2.forall(r => r.getLong(7) === 0L)) // n_triangles
    assert(t2.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 0L), ("b", 1L), ("c", 1L))) // ties add no out-degree
  }

  test("syntheticSignals: exact CV² ppm, single-sentence zero, " +
      "bounded-window caps, empty-text nulls") {
    val df = Seq(
      (0L, "one two three. four five six."),      // uniform: CV² = 0
      (1L, "a b c d e f. g h."),                  // lens 6,2: CV² = 1/4
      (2L, "no terminator here at all"),          // one sentence -> 0
      (3L, ""),                                   // no sentences
      (4L, "w! x? y. z.")                          // four 1-token sents
    ).toDF("doc_id", "text")
    val out = TextAnalysis.syntheticSignals(df, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(6)) -1L else r.getLong(6)))
    // (n_sent, sum_len, sum_len2, burstiness_ppm)
    assert(out(0) === ((2L, 6L, 18L, 0L)))        // 3,3 uniform
    assert(out(1) === ((2L, 8L, 40L, 250000L)))   // (2*40-64)/64
    assert(out(2)._1 === 1L && out(2)._4 === 0L)
    assert(out(3) === ((0L, 0L, 0L, -1L)))        // NULL signals
    assert(out(4) === ((4L, 4L, 4L, 0L)))
    // caps: 2000 1-token sentences -> only the first 1024 counted
    val many = Seq((0L, Seq.fill(2000)("w.").mkString(" ")))
      .toDF("doc_id", "text")
    val m = TextAnalysis.syntheticSignals(many, "text").collect()(0)
    assert(m.getLong(2) === 1024L && m.getLong(3) === 1024L)
    // token cap: one 5000-token sentence counts as 1023
    val long = Seq((0L, Seq.fill(5000)("w").mkString(" ") + "."))
      .toDF("doc_id", "text")
    val l = TextAnalysis.syntheticSignals(long, "text").collect()(0)
    assert(l.getLong(3) === 1023L)
  }

  test("annotatorKappa: perfect agreement = exactly 1.0; constant " +
      "labeler = exactly 0.0; both-constant degenerates to NULL") {
    val df = Seq("p", "p", "p", "q", "q", "r").toDF("lab")
    val perfect = Preference.annotatorKappa(df, col("lab"), col("lab"))
      .select("kappa", "po_ppm").distinct().collect()
    assert(perfect.length === 1)
    assert(perfect(0).getDouble(0) === 1.0) // (1-pe)/(1-pe), exact
    assert(perfect(0).getLong(1) === 1000000L)
    // labeler B constant: po = share('p') = pe -> kappa exactly 0.0
    val const = Preference.annotatorKappa(df, col("lab"), lit("p"))
      .select("kappa").distinct().collect()
    assert(const(0).getDouble(0) === 0.0)
    // both constant and equal: pe = 1 -> undefined -> NULL
    val degen = Preference.annotatorKappa(df, lit("p"), lit("p"))
      .select("kappa").collect()
    assert(degen.forall(_.isNullAt(0)))
  }

  test("annotatorKappa: marginals over the CLASS UNION — a class " +
      "only one labeler emits still shapes pe") {
    // A says p/q, B says p/r: pe must use rowsum(q)*colsum(q)=0 and
    // rowsum(r)*colsum(r)=0, not drop the classes
    val df = Seq(("p", "p"), ("p", "p"), ("q", "r"), ("q", "p"))
      .toDF("a", "b")
    val row = Preference.annotatorKappa(df, col("a"), col("b"))
      .select("n_total", "n_agree", "pe").distinct().collect()(0)
    assert(row.getLong(0) === 4L && row.getLong(1) === 2L)
    // peNum = rows(p)*cols(p) + rows(q)*cols(q=0 on B? B emits p,p,r,p)
    // rows: p=2, q=2; cols: p=3, r=1 -> peNum = 2*3 + 0 + 0 = 6
    assert(row.getDouble(2) === 6.0 / 16.0)
  }

  test("ksDrift: hand-computed D, smallest-bucket argmax, " +
      "single-group NULL, bucket guard") {
    def mk(rows: (String, Int)*) = rows.toDF("g", "b")
    // A buckets {0,0,1}, B {1,1}: at b0 |cumA*nB - cumB*nA| =
    // |2*2 - 0*3| = 4; at b1 it is 0 -> D = 4/(3*2) = 666666 ppm
    val out = Preference.ksDrift(mk(("A", 0), ("A", 0), ("A", 1),
        ("B", 1), ("B", 1)), col("g"), col("b"), buckets = 4)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Array(("A", 3L, 2L, 0L, 666666L),
      ("B", 2L, 3L, 0L, 666666L)))
    // identical distributions: D = 0, argmax ties to bucket 0
    val same = Preference.ksDrift(mk(("A", 0), ("A", 1), ("B", 0),
        ("B", 1)), col("g"), col("b"), buckets = 4)
      .orderBy("grp").collect()
    assert(same.forall(r => r.getLong(4) === 0L &&
      r.getLong(3) === 0L))
    // one group: no rest to compare against -> NULL
    val solo = Preference.ksDrift(mk(("A", 0), ("A", 1)), col("g"),
      col("b"), buckets = 4).collect()
    assert(solo(0).isNullAt(4))
    intercept[IllegalArgumentException] {
      Preference.ksDrift(mk(("A", 9)), col("g"), col("b"),
        buckets = 4)
    }
  }

  test("giniConcentration: balanced = 0, hand-computed skew, " +
      "one-group-owns-everything, negative-mass guard") {
    def mk(rows: (String, Long)*) = rows.toDF("g", "m")
    def gini(df: org.apache.spark.sql.DataFrame) =
      Preference.giniConcentration(df, col("g"), col("m"))
        .orderBy("grp").collect()
    val bal = gini(mk(("a", 5L), ("b", 5L), ("c", 5L)))
    assert(bal.forall(_.getLong(6) === 0L))
    // masses 1,2,3 sorted: num = -2*1 + 0*2 + 2*3 = 4; n*T = 18 ->
    // 222222 ppm (the classic G({1,2,3}) = 2/9); Lorenz cum shares
    // 1/6, 3/6, 6/6
    val skew = gini(mk(("a", 3L), ("b", 1L), ("c", 2L)))
    assert(skew.map(r => (r.getString(0), r.getLong(2),
      r.getLong(3))).toSeq ===
      Seq(("a", 3L, 1000000L), ("b", 1L, 166666L),
        ("c", 2L, 500000L)))
    assert(skew(0).getLong(6) === 222222L)
    // extreme concentration: G = (n-1)/n
    val one = gini(mk(("a", 0L), ("b", 0L), ("c", 9L)))
    assert(one(0).getLong(6) === 666666L)
    intercept[IllegalArgumentException] {
      gini(mk(("a", -1L)))
    }
  }

  test("fleissKappa: unanimity = exactly 1.0, hand-computed mixed " +
      "case, out-of-vocabulary vote fails loudly") {
    val unanimous = Seq(("x", "x"), ("y", "y"), ("x", "x"))
      .toDF("r1", "r2")
    val u = Preference.fleissKappa(unanimous,
      Seq(col("r1"), col("r2")), Seq("x", "y"))
      .select("kappa").distinct().collect()(0).getDouble(0)
    assert(u === 1.0)
    // items (x,x), (x,y), (y,y): S = 4+2+4 = 10, N = 3, n = 2,
    // pbar = (10-6)/6, c_x = c_y = 3 -> pe = 18/36
    val mixed = Seq(("x", "x"), ("x", "y"), ("y", "y"))
      .toDF("r1", "r2")
    val m = Preference.fleissKappa(mixed,
      Seq(col("r1"), col("r2")), Seq("x", "y"))
      .orderBy("category").collect()
    assert(m.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("x", 3L), ("y", 3L)))
    val pbar = 4.0 / 6.0
    val pe = 18.0 / 36.0
    assert(m(0).getDouble(6) === pbar)
    assert(m(0).getDouble(7) === pe)
    assert(m(0).getDouble(8) === (pbar - pe) / (1.0 - pe))
    intercept[IllegalArgumentException] {
      Preference.fleissKappa(
        Seq(("x", "z")).toDF("r1", "r2"),
        Seq(col("r1"), col("r2")), Seq("x", "y")).collect()
    }
  }

  test("kendallTauB: perfect order = 1.0, reversal = -1.0, " +
      "hand-computed tie case, bucket-range guard") {
    def mk(rows: (Int, Int)*) = rows.toDF("bx", "by")
    def tau(df: org.apache.spark.sql.DataFrame) =
      Preference.kendallTauB(df, col("bx"), col("by"), buckets = 4)
        .collect()(0)
    assert(tau(mk((0, 0), (1, 1), (2, 2), (3, 3))).getDouble(7) === 1.0)
    assert(tau(mk((0, 3), (1, 2), (2, 1), (3, 0))).getDouble(7) === -1.0)
    // cells (0,0):1 (0,1):1 (1,0):1 -> C = 0, D = 1, n0 = 3,
    // n1 = n2 = 1 -> tau = -1/sqrt(4) = -0.5
    val t = tau(mk((0, 0), (0, 1), (1, 0)))
    assert((t.getDouble(2), t.getDouble(3)) === ((0.0, 1.0)))
    assert(t.getDouble(7) === -0.5)
    // all mass in one cell: both denominators vanish -> NULL
    assert(tau(mk((1, 1), (1, 1))).isNullAt(7))
    intercept[IllegalArgumentException] {
      Preference.kendallTauB(mk((5, 0)), col("bx"), col("by"),
        buckets = 4)
    }
  }

  test("aucFromScores: separable = 1.0, inverted = 0.0, all-tied = " +
      "0.5, exactly") {
    def mk(rows: (Long, Boolean)*) = rows.toDF("smc", "label")
    val sep = mk((100L, true), (200L, true), (-50L, false),
      (0L, false))
    val auc1 = Preference.aucFromScores(sep, "smc", "label")
      .select("auc").distinct().collect()(0).getDouble(0)
    assert(auc1 === 1.0)
    val inv = mk((100L, false), (200L, false), (-50L, true),
      (0L, true))
    assert(Preference.aucFromScores(inv, "smc", "label")
      .select("auc").distinct().collect()(0).getDouble(0) === 0.0)
    val tied = mk((7L, true), (7L, true), (7L, false), (7L, false))
    assert(Preference.aucFromScores(tied, "smc", "label")
      .select("auc").distinct().collect()(0).getDouble(0) === 0.5)
  }

  test("aucFromScores: ROC suffix totals and ppm rates on a planted " +
      "histogram") {
    // bins at 16: smc -1e6 -> bin 0, 0 -> bin 8, 1e6 -> bin 15
    val df = Seq((-1000000L, false), (0L, true), (0L, false),
      (1000000L, true)).toDF("smc", "label")
    val rows = Preference.aucFromScores(df, "smc", "label")
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    // bin 0: everything at or above -> (cum_pos 2, cum_neg 2)
    // bin 8: (2, 1); bin 15: (1, 0)
    assert(rows === Array(
      (0L, 2L, 2L, 1000000L, 1000000L),
      (8L, 2L, 1L, 1000000L, 500000L),
      (15L, 1L, 0L, 500000L, 0L)))
  }

  test("mojibakeFix: family repairs, fix accounting, and the " +
      "dangling-prefix chain case") {
    val df = Seq(
      (0L, "cafÃ© dÃ©jÃ  vu"),           // 3x 2-char family (one Ã  stays: not mapped)
      (1L, "itâ€™s â€œquotedâ€¦ fine"),  // 3x 3-char family
      (2L, "clean ascii"),
      (3L, "â€â€œ")                      // repaired “ re-forms the – key
    ).toDF("doc_id", "text")
    val out = TextAnalysis.mojibakeFix(df, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getString(2), r.getLong(3)))
    assert(out(0) === (("café déjÃ  vu", 2L))) // Ã© twice; "Ã " unmapped
    assert(out(1) === (("it’s “quoted… fine", 3L)))
    assert(out(2) === (("clean ascii", 0L)))
    // "â€" + "â€œ": the œ step forms "â€“", the later – step consumes
    // it — two fixes, both from the 3-char phase (shrink 4 DIV 2)
    assert(out(3) === (("–", 2L)))
  }

  test("scriptMix: homoglyph counts, majority rule, supplementary " +
      "codepoints land in no script bucket") {
    val df = Seq(
      (0L, "pаypаl login"),          // 2 Cyrillic а in 11 letters
      (1L, "ομικρον"),               // pure Greek
      (2L, "plain ascii text"),
      (3L, "12 345 !!"),             // no letters -> NULL ppm
      (4L, "ok " + new String(Character.toChars(0x1F600)))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptMix(df, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) -1L else r.getLong(7)))
    // (n_letters, n_latin, n_cyrillic, n_greek, n_other, mixed_ppm)
    assert(out(0) === ((11L, 9L, 2L, 0L, 0L, 181818L)))
    assert(out(1) === ((7L, 0L, 0L, 7L, 0L, 0L)))
    assert(out(2) === ((14L, 14L, 0L, 0L, 0L, 0L)))
    assert(out(3) === ((0L, 0L, 0L, 0L, 0L, -1L)))
    // the emoji is not a letter: counted nowhere, exactly one 'ok'
    assert(out(4) === ((2L, 2L, 0L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.scriptMix(df.withColumn("mixed_ppm", lit(1)),
        "text")
    }
  }

  test("confusableFold: plant round-trip, idempotence, accounting, " +
      "clean text untouched") {
    val df = Seq(
      (0L, "pаypаl lоgin"),   // Cyrillic а,а,о planted
      (1L, "Τhe Ηouse"),      // Greek Τ, Η capitals
      (2L, "plain ascii"),
      (3L, "αβγ")             // NOT lookalikes: stays Greek
    ).toDF("doc_id", "text")
    val out = TextAnalysis.confusableFold(df, "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getString(2), r.getLong(3)))
    assert(out(0) === (("paypal login", 3L)))
    assert(out(1) === (("The House", 2L)))
    assert(out(2) === (("plain ascii", 0L)))
    assert(out(3) === (("αβγ", 0L)))
    // idempotent: the fold's output contains no from-chars
    val once = TextAnalysis.confusableFold(df, "text")
      .select(col("doc_id"), col("folded_text").as("text"))
    val twice = TextAnalysis.confusableFold(once, "text")
      .orderBy("doc_id").collect()
    assert(twice.forall(_.getLong(3) === 0L))
    // the fold restores dedup recall: planted and clean twins share
    // a fingerprint only AFTER folding
    val pair = Seq((0L, "buy chеap pіlls"), (1L, "buy cheap pills"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.confusableFold(pair, "text")
      .select(TextAnalysis.fingerprintExpr("folded_text").as("f"),
        TextAnalysis.fingerprintExpr("text").as("g"))
      .collect()
    assert(fp(0).getLong(0) === fp(1).getLong(0)) // folded: equal
    assert(fp(0).getLong(1) !== fp(1).getLong(1)) // raw: distinct
  }

  test("mojibakeFix: supplementary codepoints around repairs stay " +
      "intact") {
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq((0L, s"${emoji}cafÃ©$emoji itâ€™s $emoji"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.mojibakeFix(df, "text").collect()(0)
    assert(r.getString(2) === s"${emoji}café$emoji it’s $emoji")
    assert(r.getLong(3) === 2L)
  }

  test("mojibakeFix: idempotent on already-repaired text") {
    val dirty = Seq(
      (0L, "cafÃ© itâ€™s â€œmixedâ€¦ Ã±oÃ§a"),
      (1L, "â€â€œ dangling Ã prefix"),
      (2L, "plain")).toDF("doc_id", "text")
    val once = TextAnalysis.mojibakeFix(dirty, "text")
      .select(col("doc_id"), col("fixed_text").as("text"))
    val twice = TextAnalysis.mojibakeFix(once, "text")
      .orderBy("doc_id").collect()
    assert(twice.forall(_.getLong(3) === 0L)) // nothing left to fix
    assert(twice.map(_.getString(2)) ===
      once.orderBy("doc_id").collect().map(_.getString(1)))
    intercept[IllegalArgumentException] {
      TextAnalysis.mojibakeFix(
        dirty.withColumn("n_fixes", lit(1)), "text")
    }
  }

  test("positionBias: planted first-position bias flags, balanced " +
      "judge does not, Wilson interval pins") {
    // biased: 90 A-wins of 100; balanced: 52 of 100 (inside Wilson)
    val rows = (0 until 100).flatMap { i =>
      Seq(("biased", i < 90), ("balanced", i < 52))
    }
    val out = Preference.positionBias(rows.toDF("judge", "aw"),
      col("judge"), col("aw")).orderBy("judge").collect()
    val byJudge = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6), r.getBoolean(7))).toMap
    val b = byJudge("biased")
    assert(b._1 === 100L && b._2 === 90L && b._3 === 900000L)
    assert(b._7, "planted 90% A-preference must flag")
    assert(b._4 > 0.5 && b._5 > b._4) // whole CI above 0.5
    assert(math.abs(b._6 - (2.0 * 0.9 - 1.0) * 10.0) < 1e-6) // z = 8
    val u = byJudge("balanced")
    assert(!u._7, "52/100 sits inside the Wilson interval of 0.5")
    assert(u._4 < 0.5 && u._5 > 0.5)
    // hand-pinned Wilson bounds for 90/100 at z = 1.96
    // (lo 0.825633, hi 0.944771)
    assert(math.abs(b._4 - 0.825633) < 1e-5)
    assert(math.abs(b._5 - 0.944771) < 1e-5)
  }

  test("positionBias: all-A and all-B degenerate judges stay exact") {
    val rows = (0 until 16).flatMap(_ =>
      Seq(("allA", true), ("allB", false)))
    val out = Preference.positionBias(rows.toDF("judge", "aw"),
      col("judge"), col("aw")).orderBy("judge").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(7)))
    assert(out === Array(("allA", 1000000L, true), ("allB", 0L, true)))
  }
}
