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

  test("e2eSliceFrom fails loudly on a pathological multi-decade " +
      "span instead of scattering ~100k gap cells") {
    val spark = TestSpark.spark
    import spark.implicits._
    // a real series plus one corrupted timestamp 60 years out: span
    // ~3100 weeks > the 2600-week calendar bound. 20 sale weeks keep
    // the series past the C4 gates so the guard is what trips.
    val rows = (0 until 20).map { i =>
      ("s1", "st1", java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 2, 0, 0).plusWeeks(i)),
        5.0)
    } :+ (("s1", "st1", java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2084, 1, 2, 0, 0)), 5.0))
    val sales = rows.toDF("sku", "store", "ts", "units")
    val ex = intercept[Exception] {
      graft.queries.PipelineQueries.e2eSliceFrom(sales).collect()
    }
    assert(ex.getMessage.contains("maxSpanWeeks") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxSpanWeeks")))
    // a raised bound restores the old behavior: the series densifies
    // through the corrupt gap and still produces its one row
    val out = graft.queries.PipelineQueries.e2eSliceFrom(sales,
      PipelineConfig(maxSpanWeeks = 10000)).collect()
    assert(out.length === 1)
  }

  test("array-form e2e slice equals the windowed-operator composition") {
    // the round-5 restructure pin: e2eSliceFrom (per-series array
    // expressions, dense grid never materialized as rows) must equal
    // the original windowed composition (eligibleSparse -> densify ->
    // winsorize -> markSplit -> per-series collect -> same downstream
    // array math) on random sales frames
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.engine.{Resample, Series}
    val cfg = PipelineConfig()
    (1 to 5).foreach { _ =>
      val rows = (0 until 400).map { _ =>
        val sku = s"s${rnd.nextInt(4)}"
        val store = s"st${rnd.nextInt(2)}"
        val ts = java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.of(2023, 1, 2, 0, 0)
            .plusDays(rnd.nextInt(400)))
        (sku, store, ts, rnd.nextInt(15).toDouble)
      }
      val sales = rows.toDF("sku", "store", "ts", "units")
      val keys = Seq("sku", "store")

      val arrayForm = graft.queries.PipelineQueries
        .e2eSliceFrom(sales, cfg)
        .select("sku", "store", "mape", "safety_stock", "reorder_point",
          "qty_to_order")
        .collect().map(_.toSeq).sortBy(_.toString)

      // the windowed composition with identical downstream math
      val sparse = Resample.weeklySparse(sales, keys, "ts", "units")
      val gated = Resample.densify(
        Series.eligibleSparse(sparse, keys, cfg), keys)
      val wins = Series.winsorize(gated, keys)
      val split = Series.markSplit(wins, keys, "week", cfg.horizonWeeks)
      val perSeries = split.groupBy(keys.map(col): _*)
        .agg(
          sort_array(collect_list(when(!col("is_test"),
            struct(col("week"), col("units"))))).as("train_wk"),
          sort_array(collect_list(when(col("is_test"),
            struct(col("week"), col("units"))))).as("test_wk"))
        .select(col("sku"), col("store"),
          expr("transform(train_wk, x -> x.units)").as("train"),
          expr("transform(test_wk, x -> x.units)").as("test"))
      val z = cfg.serviceLevelZ; val lt = cfg.leadTimeWeeks
      val windowForm = perSeries
        .withColumn("ma", round(expr(
          """aggregate(slice(train, greatest(size(train) - 3, 1),
            |          least(size(train), 4)), 0D, (a, x) -> a + x)
            |/ least(size(train), 4)""".stripMargin), 6))
        .withColumn("forecast",
          expr(s"array_repeat(greatest(ma, 0D), ${cfg.horizonWeeks})"))
        .withColumn("train_std", round(sqrt(greatest(expr(
          """aggregate(train, 0D, (a, x) -> a + x * x) / size(train)
            |- pow(aggregate(train, 0D, (a, x) -> a + x) / size(train), 2)
            |""".stripMargin), lit(0.0))), 6))
        .withColumn("last_units", expr("element_at(train, -1)"))
        .withColumn("mape",
          round(graft.engine.Metrics.safeMapeArr(col("test"),
            col("forecast")), 3))
        .withColumn("ss", when(expr("size(train)") > 1,
          round(lit(z) * col("train_std") * lit(math.sqrt(lt)), 6))
          .otherwise(lit(0.0)))
        .withColumn("dlt", round(col("ma") * lit(lt), 6))
        .withColumn("rop",
          graft.engine.Inventory.reorderPoint(col("dlt"), col("ss")))
        .withColumn("qty",
          graft.engine.Inventory.orderQty(col("rop"), col("last_units")))
        .select(col("sku"), col("store"), col("mape"),
          graft.engine.Inventory.intClamp(col("ss")).cast("long")
            .as("safety_stock"),
          graft.engine.Inventory.intClamp(col("rop")).cast("long")
            .as("reorder_point"),
          graft.engine.Inventory.intClamp(col("qty")).cast("long")
            .as("qty_to_order"))
        .collect().map(_.toSeq).sortBy(_.toString)

      assert(arrayForm.toSeq === windowForm.toSeq)
      assert(arrayForm.nonEmpty)
    }
  }

  test("array form equals the typed kernel on 130 randomized " +
      "sparse/gappy/all-zero/single-week series") {
    // the wide equivalence guard for refactors of either side: the
    // relational array-expression pipeline (e2eSliceFrom) and the
    // typed kernel (Kernel.run, J3-only, oracleCompat float path)
    // must produce IDENTICAL results — same surviving series, same
    // forecasts, same inventory — across every edge class the gates
    // and winsorizer branch on: dense long series, ~10%-density gappy
    // series, all-zero units (total gate drops), single-observation
    // series (span gate drops), constants (zero variance), and
    // two-point bursts (npos <= 5 skips winsorize).
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cfg = PipelineConfig(useTrendSeasonal = false,
      useHoltWinters = false, oracleCompat = true)
    val base = java.time.LocalDate.of(2023, 1, 2)
    // test-local generator: the class-level rnd's state depends on
    // which other tests ran first — this test must generate the same
    // 130 series under `testOnly -z` and a full suite run alike
    val rnd = new Random(20260813)
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      base.plusDays(day.toLong).atStartOfDay)
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, java.sql.Timestamp, Double)]
    var sid = 0
    def series(cls: String)(gen: => Seq[(Int, Double)]): Unit = {
      val sku = s"$cls$sid"; sid += 1
      val store = s"st${sid % 2}"
      gen.foreach { case (d, u) => rows += ((sku, store, ts(d), u)) }
    }
    (1 to 40).foreach(_ => series("dense") {
      (0 until 120).filter(_ => rnd.nextDouble() < 0.7)
        .map(w => (w * 7 + rnd.nextInt(7), rnd.nextInt(15).toDouble))
    })
    (1 to 40).foreach(_ => series("gappy") {
      (0 until 110).filter(_ => rnd.nextDouble() < 0.12)
        .map(w => (w * 7 + rnd.nextInt(7),
          (1 + rnd.nextInt(20)).toDouble))
    })
    (1 to 15).foreach(_ => series("zero") {
      (0 until 30).map(w => (w * 7, 0.0))
    })
    (1 to 15).foreach(_ => series("single") {
      Seq((rnd.nextInt(100), (1 + rnd.nextInt(30)).toDouble))
    })
    (1 to 10).foreach(_ => series("const") {
      (0 until 40).map(w => (w * 7, 5.0))
    })
    (1 to 10).foreach(_ => series("burst") {
      Seq((0, 50.0), (7 + rnd.nextInt(200), 50.0))
    })
    assert(sid === 130)
    val sales = rows.toSeq.toDF("sku", "store", "ts", "units")
    val cols = Seq("sku", "store", "mape", "forecast", "test",
      "safety_stock", "reorder_point", "qty_to_order")
    def keyed(raw: Array[org.apache.spark.sql.Row]) = raw.map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getSeq[Double](3), r.getSeq[Double](4),
          r.getLong(5), r.getLong(6), r.getLong(7)))
    }.toMap
    val arrayForm = keyed(graft.queries.PipelineQueries
      .e2eSliceFrom(sales, cfg)
      .select(cols.head, cols.tail: _*).collect())
    val kernelForm = keyed(Kernel.run(sales, cfg)
      .drop("runtime_sec")
      .withColumn("forecast", expr("transform(forecast, x -> round(x, 6))"))
      .withColumn("test", expr("transform(test, x -> round(x, 6))"))
      .withColumn("mape", round(col("mape"), 3))
      .withColumn("safety_stock", col("safety_stock").cast("long"))
      .withColumn("reorder_point", col("reorder_point").cast("long"))
      .withColumn("qty_to_order", col("qty_to_order").cast("long"))
      .select(cols.head, cols.tail: _*).collect())
    assert(arrayForm.keySet === kernelForm.keySet)
    arrayForm.foreach { case (k, (am, afc, atst, ass, arop, aqty)) =>
      val (km, kfc, ktst, kss, krop, kqty) = kernelForm(k)
      // forecasts, winsorized test slices and inventory ints must be
      // bit/value identical; mape may differ in the LAST 3dp digit
      // only when the unrounded value lands on a .0005 tie — the
      // kernel's oracleCompat 12dp HALF_EVEN pre-round absorbs fold
      // ulps there while the relational form rounds the raw double
      // (each matches its own DuckDB oracle; PipelineConfig doc)
      assert((afc, atst, ass, arop, aqty) === ((kfc, ktst, kss, krop,
        kqty)), s"series $k")
      assert(math.abs(am - km) <= 0.0011, s"mape of $k: $am vs $km")
    }
    // the gates must have kept the dense/gappy bulk and dropped the
    // all-zero (total gate) and single-week (span gate) classes
    val kept = arrayForm.keySet.map(_._1)
    assert(kept.count(_.startsWith("dense")) === 40)
    assert(!kept.exists(_.startsWith("zero")))
    assert(!kept.exists(_.startsWith("single")))
    assert(arrayForm.size >= 50)
  }

  test("packSequences conserves the token stream per shard") {
    import graft.llm.TextAnalysis
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0L until 300L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "))
    }.toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(docs, "text", "doc_id",
      seqLen = 64, nShards = 4)
    // per shard: offsets are the exclusive prefix sums of n_tokens in
    // id order — so max(tok_offset + n_tokens) == sum(n_tokens)
    val ok = packed.groupBy("shard")
      .agg(max(col("tok_offset") + col("n_tokens")).as("hi"),
        sum(col("n_tokens")).as("total"))
      .filter(col("hi") =!= col("total")).count()
    assert(ok === 0L)
    // every doc appears exactly once
    assert(packed.select("doc_id").distinct().count() === 300L)
  }

  test("mergeUpsert equals the full-outer-join reference on random frames") {
    import graft.engine.Joins
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0L until 200L).map(k => (k, rnd.nextInt(1000)))
      .toDF("k", "v")
    val upd = rnd.shuffle((0L until 260L).toList).take(90)
      .map(k => (k, -rnd.nextInt(1000) - 1)).toDF("k", "v")
    val merged = Joins.mergeUpsert(base, upd, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val reference = base.as("b")
      .join(upd.as("u"), col("b.k") === col("u.k"), "full_outer")
      .select(coalesce(col("u.k"), col("b.k")).as("k"),
        coalesce(col("u.v"), col("b.v")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged === reference)
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

  test("intervalJoin equals the naive theta join on random intervals") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.engine.Joins
    val rnd = new Random(4242)
    (1 to 5).foreach { _ =>
      def mk(n: Int, idCol: String, s: String, e: String) = {
        (1 to n).map { i =>
          val start = java.time.LocalDate.of(2024, 1, 1)
            .plusDays(rnd.nextInt(120).toLong)
          val len = rnd.nextInt(25)
          (i.toLong, java.sql.Date.valueOf(start),
            java.sql.Date.valueOf(start.plusDays(len.toLong)))
        }.toDF(idCol, s, e)
      }
      val a = mk(60, "aid", "a_start", "a_end")
      val b = mk(40, "bid", "b_start", "b_end")
      val bucketed = Joins.intervalJoin(a, b, "a_start", "a_end",
          "b_start", "b_end")
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val naive = a.crossJoin(b)
        .filter(col("a_start") <= col("b_end") &&
          col("b_start") <= col("a_end"))
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(bucketed.toSeq === naive.toSeq)
      assert(naive.nonEmpty)
    }
  }

  test("paragraphDedup conservation: kept paragraphs = distinct paragraphs, " +
      "each exactly once") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.llm.Dedup
    val rnd = new Random(77)
    (1 to 5).foreach { _ =>
      // tiny paragraph vocabulary forces heavy cross-doc repetition
      def para(): String =
        (0 until 10).map(_ => s"w${rnd.nextInt(2)}").mkString(" ")
      val docs = (0L until 20L).map { i =>
        (i, (0 until 1 + rnd.nextInt(4)).map(_ => para()).mkString(" "))
      }.toDF("doc_id", "text")
      val out = Dedup.paragraphDedup(docs, "text", "doc_id",
        words = 10).collect()
      val keptPars = out.flatMap(_.getString(1).split(" ")
        .grouped(10).map(_.mkString(" ")))
      // every distinct input paragraph survives EXACTLY once
      val inputPars = docs.collect().flatMap(_.getString(1).split(" ")
        .grouped(10).map(_.mkString(" ")))
      assert(keptPars.sorted.toSeq === inputPars.distinct.sorted.toSeq)
      // and the removal accounting conserves: kept + removed = total
      val totals = out.map(r => r.getLong(2) + r.getLong(3)).sum
      val docPars = docs.collect().map(r =>
        r.getString(1).split(" ").length / 10).sum
      assert(out.map(_.getLong(2)).sum === inputPars.distinct.length)
      assert(totals <= docPars) // emptied docs dropped from output
    }
  }

  test("span family invariants on random small-alphabet corpora") {
    // tiny alphabet forces repeated windows; invariants must hold on
    // every draw: detection grams repeat globally, stats conserve
    // (0 < dup_tokens <= n_tokens, windows*n bounds the union), and
    // the scrub conserves tokens (kept + removed = total)
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.llm.Dedup
    val n = 5
    (1 to 5).foreach { _ =>
      val docsDf = (0L until 12L).map { i =>
        val len = 6 + rnd.nextInt(20)
        (i, Seq.fill(len)(s"t${rnd.nextInt(3)}").mkString(" "))
      }.toDF("doc_id", "text")
      val w = Dedup.dupSpanWindows(docsDf, "text", "doc_id", n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // every emitted gram occurs at least twice corpus-wide, and a
      // (doc, win_start) slot appears at most once
      val byGram = w.groupBy(_._3)
      assert(byGram.values.forall(_.length >= 2))
      assert(w.map(t => (t._1, t._2)).distinct.length === w.length)
      val st = Dedup.spanDedupStats(docsDf, "text", "doc_id", n)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      st.foreach { case (_, nw, dup, tot) =>
        assert(nw >= 1 && dup >= n && dup <= tot && dup <= nw * n)
      }
      val sc = Dedup.scrubSpans(docsDf, "text", "doc_id", n)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      val ntok = docsDf.select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.expr(
            "filter(split(lower(text), ' '), t -> t != '')"))
          .cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      sc.foreach { case (id, text, kept, removed) =>
        assert(kept + removed === ntok(id))
        assert(text.split(" ").count(_.nonEmpty).toLong === kept)
      }
    }
  }

  private def randText(n: Int): String = {
    val alphabet = "abcdefgh "
    (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
      .mkString
  }

  test("cdcChunks: lossless nonempty split on random corpora") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = (0 until 100)
      .map(i => (i.toLong, randText(50 + rnd.nextInt(400))))
    val out = graft.llm.TextAnalysis.cdcChunks(
        texts.toDF("doc_id", "text"), "text", "doc_id", divisor = 32)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    texts.foreach { case (id, t) =>
      assert(out(id).mkString === t, s"doc $id split is lossy")
      assert(out(id).forall(_.nonEmpty), s"doc $id empty chunk")
    }
  }

  test("winnowing guarantee: any shared substring of length >= " +
      "w + shingle - 1 yields a shared fingerprint (random pairs)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 100 pairs: ids (2i, 2i+1) embed one common substring of the
    // guarantee length (w=5, shingle=5 -> 9) inside independent noise
    val pairs = (0 until 100).map { i =>
      val common = randText(9 + rnd.nextInt(30))
      ((2 * i).toLong, randText(rnd.nextInt(40)) + common +
        randText(rnd.nextInt(40)),
        (2 * i + 1).toLong, randText(rnd.nextInt(40)) + common +
        randText(rnd.nextInt(40)))
    }
    val docs = pairs.flatMap { case (ia, ta, ib, tb) =>
      Seq((ia, ta), (ib, tb))
    }.toDF("doc_id", "text")
    val fps = graft.llm.Dedup.winnowFingerprints(docs, "text",
        "doc_id", w = 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap
    pairs.foreach { case (ia, _, ib, _) =>
      assert((fps(ia) intersect fps(ib)).nonEmpty,
        s"pair ($ia, $ib) shares no fingerprint")
    }
  }

  test("native expression kernels equal naive references on random " +
      "inputs (WinnowMins, NgramFoldHashes, VecOps)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val P = 1000000007L
    for (_ <- 1 to trials) {
      val n = 1 + rnd.nextInt(200)
      val w = 1 + rnd.nextInt(12)
      val hs = Array.fill(n)(rnd.nextLong(P))
      // winnow: naive O(n·w) window minima, distinct, sorted
      val m = math.max(n - w + 1, 1)
      val naive = (0 until m).map(i =>
        hs.slice(i, math.min(i + w, n)).min).distinct.sorted
      val nat = graft.llm.WinnowMins
        .compute(new GenericArrayData(hs), w)
        .toLongArray.toSeq
      assert(nat === naive, s"winnow n=$n w=$w")
      // n-gram fold: naive windowed fold incl. shorter-than-n case
      val g = 1 + rnd.nextInt(10)
      val gm = math.max(n - g + 1, 1)
      val gw = math.min(g, n)
      val gnaive = (0 until gm).map(i =>
        (i until i + gw).foldLeft(0L)((acc, j) =>
          (acc * 31 + hs(j)) % P))
      val gnat = graft.llm.NgramFoldHashes
        .compute(new GenericArrayData(hs), g)
        .toLongArray.toSeq
      assert(gnat === gnaive, s"ngram n=$n g=$g")
      // vector folds: exact bit equality vs the left fold
      val a = Array.fill(1 + rnd.nextInt(64))(rnd.nextDouble() * 2 - 1)
      val b = Array.fill(a.length)(rnd.nextDouble() * 2 - 1)
      val dotRef = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x * y
      }
      val sqRef = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x - y) * (x - y)
      }
      import java.lang.Double.doubleToLongBits
      assert(doubleToLongBits(graft.llm.VecOps.dot(
        new GenericArrayData(a), new GenericArrayData(b))) ===
        doubleToLongBits(dotRef))
      assert(doubleToLongBits(graft.llm.VecOps.sqDist(
        new GenericArrayData(a), new GenericArrayData(b))) ===
        doubleToLongBits(sqRef))
    }
  }

  test("WAV and animated-GIF codecs round-trip random payloads") {
    import graft.llm.Multimodal._
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(300)
      val s = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val rate = 1 + rnd.nextInt(48000)
      val dec = decodeWav(encodeWav(DecodedAudio(rate, s))).get
      assert(dec.sampleRate === rate)
      assert(dec.samples.toSeq === s.toSeq)
    }
    for (_ <- 1 to 20) {
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(12)
      val nf = 1 + rnd.nextInt(4)
      // palette budget: draw pixels from a ≤256-color pool
      val pool = Array.fill(64)(rnd.nextInt(1 << 24))
      val frames = Seq.fill(nf)(DecodedImage(w, h,
        Array.fill(w * h)(pool(rnd.nextInt(pool.length)))))
      val gif = encodeGif(frames)
      val dec = decodeGifFrames(gif, frames.indices).get
      frames.indices.foreach(i =>
        assert(dec(i).pixels.toSeq === frames(i).pixels.toSeq,
          s"frame $i of $nf, ${w}x$h"))
    }
  }

  test("G.711 codecs: code idempotency, error bounds, compressed-WAV " +
      "container roundtrip") {
    import graft.llm.Multimodal._
    // μ-law: encode∘decode is the identity on every code except
    // 0x7F (negative zero), which collapses to 0 → 0xFF
    for (c <- 0 until 256 if c != 0x7f) {
      val b = c.toByte
      assert(muLawEncode(muLawDecode(b)) === b, f"ulaw code $c%02x")
    }
    assert(muLawDecode(0x7f.toByte) === 0.toShort)
    assert(muLawEncode(0.toShort) === 0xff.toByte)
    // public G.711 table anchors
    assert(muLawDecode(0x00.toByte) === (-32124).toShort)
    assert(muLawDecode(0x80.toByte) === 32124.toShort)
    // A-law: no ±0 collapse — ALL 256 codes idempotent
    for (c <- 0 until 256) {
      val b = c.toByte
      assert(aLawEncode(aLawDecode(b)) === b, f"alaw code $c%02x")
    }
    // quantization-error bounds over the entire 16-bit input range
    var x = Short.MinValue.toInt
    while (x <= Short.MaxValue) {
      val s = x.toShort
      assert(math.abs(muLawDecode(muLawEncode(s)) - x) <= 644,
        s"ulaw err at $x")
      assert(math.abs(aLawDecode(aLawEncode(s)) - x) <= 512,
        s"alaw err at $x")
      x += 1
    }
    // compressed-WAVE container: decode = per-code expansion, rate
    // kept, and the lossy fixed point (re-encode == same bytes)
    for (aLaw <- Seq(false, true); _ <- 1 to 25) {
      val n = 1 + rnd.nextInt(300)
      val s = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val rate = 1 + rnd.nextInt(48000)
      val wav = encodeWavG711(DecodedAudio(rate, s), aLaw)
      assert(wav.length === 58 + n)
      val dec = decodeWavG711(wav).get
      assert(dec.sampleRate === rate)
      val expect = s.map(v =>
        if (aLaw) aLawDecode(aLawEncode(v)) else muLawDecode(muLawEncode(v)))
      assert(dec.samples.toSeq === expect.toSeq)
      // lossy fixed point: one roundtrip canonicalizes the codes
      // (μ-law samples in [-7,-1] encode to negative-zero 0x7F, whose
      // reconstruction 0 re-encodes as the canonical 0xFF), and from
      // there re-encoding is byte-stable with unchanged values
      val wav2 = encodeWavG711(DecodedAudio(rate, dec.samples), aLaw)
      wav.zip(wav2).zipWithIndex.foreach { case ((o, r), ix) =>
        assert(o == r || (!aLaw && o == 0x7f.toByte && r == 0xff.toByte),
          s"byte $ix: $o -> $r")
      }
      val dec2 = decodeWavG711(wav2).get
      assert(dec2.samples.toSeq === dec.samples.toSeq)
      assert(encodeWavG711(DecodedAudio(rate, dec2.samples), aLaw)
        .toSeq === wav2.toSeq)
      // format firewalls: the PCM parser rejects G.711 and vice versa
      assert(decodeWav(wav).isEmpty)
      assert(decodeWavG711(encodeWav(DecodedAudio(rate, s))).isEmpty)
    }
  }

  test("semDedup: keep set equals the brute-force within-cell " +
      "dominance reference on random vectors") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }
        s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to 3) {
      // every third vector is a jittered copy of its predecessor, so
      // the >=0.6 band is populated (random 64-dim cosines alone
      // concentrate near 0 and would make the check vacuous)
      val vb = scala.collection.mutable.Map.empty[Long, Array[Double]]
      (0L until 40L).foreach { i =>
        vb(i) =
          if (i % 3 == 2)
            vb(i - 1).map(_ + (rnd.nextDouble() - 0.5) * 0.1)
          else Array.fill(64)(rnd.nextDouble() - 0.5)
      }
      val vecs = vb.toMap
      val df = vecs.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
      val out = graft.llm.Similarity.semDedup(df, "vec_id",
        "embedding", cells = 4, iters = 1, minCos = 0.6)
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(out.size === 40)
      val cellOf = out.view.mapValues(_._1).toMap
      vecs.keys.foreach { id =>
        val expectDrop = vecs.keys.exists(o => o < id &&
          cellOf(o) == cellOf(id) &&
          r6(cos(vecs(o), vecs(id))) >= 0.6)
        assert(out(id)._2 === !expectDrop, s"vec $id")
      }
    }
  }

  test("IMA ADPCM: decoder locksteps the encoder trace, zero-signal " +
      "silence, container firewalls") {
    import graft.llm.Multimodal._
    // zero signal: diff 0 at step 7 quantizes to diffq 0 — perfect
    // silence roundtrip, codes all 0
    val z = encodeWavAdpcm(DecodedAudio(8000, Array.fill(64)(0: Short)))
    assert(decodeWavAdpcm(z).get.samples.forall(_ == 0))
    assert(z.drop(64).forall(_ == 0))
    for (_ <- 1 to 40) {
      val n = 1 + rnd.nextInt(300)
      val s = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val rate = 1 + rnd.nextInt(48000)
      val wav = encodeWavAdpcm(DecodedAudio(rate, s))
      assert(wav.length === 60 + 4 + (n + 1) / 2)
      val dec = decodeWavAdpcm(wav).get
      assert(dec.sampleRate === rate)
      // the lockstep property that defines ADPCM: the decoder's
      // output IS the encoder's internal reconstruction trace
      var pred = 0; var idx = 0
      val trace = s.map { v =>
        val (_, p, ix) = imaStep(v, pred, idx); pred = p; idx = ix
        p.toShort
      }
      assert(dec.samples.toSeq === trace.toSeq)
      // format firewalls, all directions
      assert(decodeWav(wav).isEmpty)
      assert(decodeWavG711(wav).isEmpty)
      assert(decodeWavAdpcm(encodeWav(DecodedAudio(rate, s))).isEmpty)
      assert(decodeWavAdpcm(
        encodeWavG711(DecodedAudio(rate, s))).isEmpty)
    }
  }

  test("docRepetition: batch explode form == row-local HOF form on " +
      "random newline/space corpora") {
    val spark = TestSpark.spark
    import spark.implicits._
    val cols = Seq("doc_id", "n_lines", "dup_line_ppm",
      "dup_char_ppm", "top2_ppm", "top3_ppm")
    val seps = Array(" ", " ", "\n", "  ", " \n")
    def doc(): String =
      Seq.fill(rnd.nextInt(30))(
        ('a' + rnd.nextInt(3)).toChar.toString * (1 + rnd.nextInt(2)))
        .map(w => w + seps(rnd.nextInt(seps.length))).mkString.trim
    for (_ <- 1 to 8) {
      val docs = (1L to 25L).map(i => (i, doc())).toDF("doc_id", "text")
      val batch = graft.llm.TextAnalysis
        .docRepetition(docs, "text", "doc_id")
        .select(cols.head, cols.tail: _*)
        .collect().map(r => r.getLong(0) -> (1 to 5).map(r.getLong))
        .toMap
      val local = graft.llm.TextAnalysis
        .withDocRepetition(docs, "text")
        .select(cols.head, cols.tail: _*)
        .collect().map(r => r.getLong(0) -> (1 to 5).map(r.getLong))
        .toMap
      assert(local === batch)
    }
  }

  test("BpeFold: native merge fold == HOF triple-replace fold on " +
      "random words and merge tables") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val syms = Seq("a", "b", "c", "ab", "bc", "na", "ban", "x")
    for (_ <- 1 to 60) {
      val word = Seq.fill(1 + rnd.nextInt(10))(
        ('a' + rnd.nextInt(4)).toChar).mkString
      val ms = Seq.fill(rnd.nextInt(6))(graft.llm.TextAnalysis
        .BpeMerge(syms(rnd.nextInt(syms.length)),
          syms(rnd.nextInt(syms.length))))
      val df = Seq(Tuple1(word)).toDF("word")
        .withColumn("__ms", typedlit(ms))
        .withColumn("repr", concat(lit(" "),
          regexp_replace(col("word"), "([^ ])", "$1 ")))
      val native = df.select(graft.llm.PolyHashColumns
        .bpeFold(col("repr"), col("__ms")).as("r"))
        .collect().head.getString(0)
      val hof = df.select(expr(
        """aggregate(__ms, repr, (acc, m) -> replace(
             replace(
               replace(acc, ' ', '  '),
               concat(' ', m.a, '  ', m.b, ' '),
               concat(' ', m.a, m.b, ' ')),
             '  ', ' '))""").as("r"))
        .collect().head.getString(0)
      assert(native === hof, s"word=$word ms=$ms")
    }
  }

  test("JPEG codec: dimensions exact, channel means inside the ±16 " +
      "lossy band on random rasters") {
    import graft.llm.Multimodal._
    for (t <- 1 to 200) {
      // alternate full-range noise (worst case for DCT) and ASCII-ish
      val px = Array.fill(64)(
        if (t % 2 == 0) rnd.nextInt(1 << 24)
        else {
          def c() = 32 + rnd.nextInt(95)
          (c() << 16) | (c() << 8) | c()
        })
      val src = DecodedImage(8, 8, px)
      val jpg = encodeJpeg(src)
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
      val dec = decodeCompressed(jpg).get
      assert(dec.width === 8); assert(dec.height === 8)
      val (r0, g0, b0) = channelMeans(src)
      val (r, g, b) = channelMeans(dec)
      assert(math.abs(r - r0) <= 16.0, s"r $r vs $r0")
      assert(math.abs(g - g0) <= 16.0, s"g $g vs $g0")
      assert(math.abs(b - b0) <= 16.0, s"b $b vs $b0")
    }
  }

  test("quotaSample property: quotas sum to min(n, corpus) and never " +
      "exceed stratum sizes, over random strata shapes") {
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 8).foreach { _ =>
      val nStrata = 2 + rnd.nextInt(4)
      val sizes = Seq.fill(nStrata)(1 + rnd.nextInt(12))
      val docs = sizes.zipWithIndex.flatMap { case (sz, s) =>
        (0 until sz).map(i => (s.toLong * 100 + i, s"s$s"))
      }.toDF("doc_id", "source")
      val total = sizes.sum.toLong
      val n = 1L + rnd.nextInt(sizes.sum + 10)
      val out = graft.llm.TextAnalysis
        .quotaSample(docs, "doc_id", "source", n)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(out.length === math.min(n, total))
      val perSrc = out.groupBy(_._1).view.mapValues(_.size).toMap
      sizes.zipWithIndex.foreach { case (sz, s) =>
        assert(perSrc.getOrElse(s"s$s", 0) <= sz)
      }
      // deterministic: no duplicate picks
      assert(out.map(_._2).distinct.length === out.length)
    }
  }

  test("lengthBucketBatches property: batches stay within buckets, " +
      "within size, pads are exact batch-max deltas") {
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 5).foreach { _ =>
      val docs = (0 until 60).map(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(300))("t").mkString(" ")))
        .toDF("doc_id", "text")
      val b = 1 + rnd.nextInt(7)
      val out = graft.llm.TextAnalysis
        .lengthBucketBatches(docs, "text", "doc_id", b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(out.length === 60)
      out.groupBy(t => (t._3, t._4)).foreach { case (_, batch) =>
        assert(batch.length <= b)
        val mx = batch.map(_._2).max
        batch.foreach { t =>
          assert(t._2 <= t._3) // token count within bucket cap
          assert(t._5 === mx - t._2) // pad = batch max - own length
        }
      }
    }
  }

  test("surpriseChunks property: chunks tile every document exactly " +
      "for random corpora and thresholds") {
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 5).foreach { _ =>
      val vocab = Seq("a", "b", "c", "d", "e")
      val docs = (0 until 25).map(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(30))(
          vocab(rnd.nextInt(vocab.length))).mkString(" ")))
        .toDF("doc_id", "text")
      val k = Seq(2L, 8L, 64L)(rnd.nextInt(3))
      val out = graft.llm.TextAnalysis
        .surpriseChunks(docs, "text", "doc_id", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).groupBy(_._1)
      assert(out.size === 25)
      out.foreach { case (_, chunks) =>
        val sorted = chunks.sortBy(_._2)
        assert(sorted.head._3 === 1L) // first chunk starts at 1
        sorted.sliding(2).foreach { w =>
          if (w.length == 2) assert(w(1)._3 === w(0)._4 + 1) // contiguous
        }
        assert(sorted.map(c => c._4 - c._3 + 1).sum ===
          sorted.last._4) // spans tile 1..n
      }
    }
  }

  test("mixBudgetFit property: allocations never exceed caps, the " +
      "total never exceeds the budget, and saturation is monotone") {
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 8).foreach { _ =>
      val nSrc = 2 + rnd.nextInt(3)
      val docs = (0 until nSrc).flatMap { s =>
        (0 until 1 + rnd.nextInt(4)).map(i =>
          (s.toLong * 10 + i, s"s$s",
            Seq.fill(5 + rnd.nextInt(30))("t").mkString(" ")))
      }.toDF("doc_id", "source", "text")
      // valid by construction: the operator requires Σ <= 1e6, and a
      // raw draw can exceed it depending on where the SHARED rnd
      // stream sits (a filtered test run shifts it — this generator
      // once drew 1031000 under testOnly -z and failed spuriously)
      val raw = (0 until nSrc)
        .map(s => s"s$s" -> (rnd.nextInt(3) match {
          case 0 => 0L
          case _ => (1 + rnd.nextInt(500)) * 1000L
        })).toMap
      val rawSum = raw.values.sum
      val weights =
        if (rawSum <= 1000000L) raw
        else raw.view.mapValues(w =>
          w * 1000000L / rawSum / 1000L * 1000L).toMap
      if (weights.values.exists(_ > 0)) {
        val e = 1L + rnd.nextInt(3)
        val b = 1L + rnd.nextInt(2000)
        val out = graft.llm.TextAnalysis.mixBudgetFit(docs, "text",
          "source", weights, epochsCap = e, budget = Some(b))
          .collect().map(r => (r.getString(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getLong(4)))
        out.foreach { case (_, _, w, cap, alloc) =>
          assert(alloc <= cap)
          assert(alloc >= 0)
          if (w == 0) assert(alloc === 0)
        }
        assert(out.map(_._5).sum <= b)
      }
    }
  }

  test("urlParts property: assembled URLs round-trip every component " +
      "and the registered-domain rule holds") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    val schemes = Seq("http", "https", "ftp")
    val labels = Seq("alpha", "Beta", "GAMMA", "x9", "cdn", "www")
    val suffix2 = Seq("com", "org", "net", "io")
    val multi = graft.llm.UrlOps.multiPartSuffixes
    (1 to 3).foreach { _ =>
      val cases = (0 until 120).map { i =>
        val scheme = schemes(rnd.nextInt(schemes.length))
        val nSub = rnd.nextInt(3)
        val isIp = rnd.nextInt(5) == 0
        val (host, expReg) =
          if (isIp) {
            val ip = s"${rnd.nextInt(256)}.${rnd.nextInt(256)}" +
              s".${rnd.nextInt(256)}.${rnd.nextInt(256)}"
            (ip, ip)
          } else {
            val base = labels(rnd.nextInt(labels.length))
            val useMulti = rnd.nextBoolean()
            val sfx =
              if (useMulti) multi(rnd.nextInt(multi.length))
              else suffix2(rnd.nextInt(suffix2.length))
            val subs = Seq.fill(nSub)(
              labels(rnd.nextInt(labels.length)))
            val h = (subs :+ base :+ sfx).mkString(".")
            (h, s"$base.$sfx".toLowerCase)
          }
        val userinfo = if (rnd.nextInt(4) == 0) "user:pw@" else ""
        val port = if (rnd.nextBoolean()) rnd.nextInt(65536) else -1
        val portS = if (port >= 0) s":$port" else ""
        val path = if (rnd.nextBoolean()) s"/p/$i" else ""
        val qf = if (rnd.nextInt(3) == 0) "?q=1#frag" else ""
        (i.toLong, s"$scheme://$userinfo$host$portS$path$qf",
          scheme, host.toLowerCase, port.toLong, path, isIp, expReg)
      }
      val df = cases.map(c => (c._1, c._2)).toDF("doc_id", "url")
      val out = graft.llm.UrlOps.withUrlParts(df, "url")
        .select("doc_id", "scheme", "host", "port", "path", "is_ip",
          "registered_domain")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getString(2), r.getLong(3),
            r.getString(4), r.getBoolean(5), r.getString(6)))).toMap
      cases.foreach { c =>
        val (scheme, host, port, path, isIp, reg) = out(c._1)
        assert(scheme === c._3, c._2)
        assert(host === c._4, c._2)
        assert(port === c._5, c._2)
        assert(path === c._6, c._2)
        assert(isIp === c._7, c._2)
        assert(reg === c._8, c._2)
      }
    }
  }

  test("canonicalizeUrl property: idempotent on assembled URLs — " +
      "canonicalizing a canon_url is the identity") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    val schemes = Seq("http", "https")
    val labels = Seq("alpha", "Beta", "www", "cdn")
    val sfx = Seq("com", "org", "co.uk")
    val trackKeys = Seq("utm_source", "utm_campaign", "fbclid",
      "gclid", "ref")
    val realKeys = Seq("id", "q", "page", "a", "b")
    val cases = (0 until 150).map { i =>
      val host = (Seq.fill(rnd.nextInt(2))(
        labels(rnd.nextInt(labels.length))) :+
        labels(rnd.nextInt(labels.length)) :+
        sfx(rnd.nextInt(sfx.length))).mkString(".")
      val scheme = schemes(rnd.nextInt(2))
      val port = rnd.nextInt(4) match {
        case 0 => ":443"
        case 1 => ":80"
        case 2 => s":${1024 + rnd.nextInt(5000)}"
        case _ => ""
      }
      val path = rnd.nextInt(3) match {
        case 0 => s"/p/$i/"
        case 1 => s"/p/$i"
        case _ => "/"
      }
      val nq = rnd.nextInt(4)
      val qs = (0 until nq).map { j =>
        val k = if (rnd.nextBoolean()) trackKeys(rnd.nextInt(5))
        else realKeys(rnd.nextInt(5))
        s"$k=${rnd.nextInt(9)}"
      }.mkString("&")
      val frag = if (rnd.nextInt(3) == 0) "#sec" else ""
      val q = if (qs.isEmpty) "" else s"?$qs"
      (i.toLong, s"$scheme://$host$port$path$q$frag")
    }
    val df = cases.toDF("doc_id", "url")
    val once = graft.llm.UrlOps.canonicalizeUrl(df, "url")
      .select("doc_id", "canon_url")
    val twice = graft.llm.UrlOps.canonicalizeUrl(
        once.withColumnRenamed("canon_url", "url"), "url")
      .selectExpr("doc_id", "url AS c1", "canon_url AS c2",
        "n_params_dropped")
      .collect()
    twice.foreach { r =>
      assert(r.getString(1) === r.getString(2), s"doc ${r.getLong(0)}")
      // a canon_url carries no tracking params to drop
      assert(r.getLong(3) === 0L)
    }
  }

  test("hllDistinct property: m=256 estimates inside the 3-sigma " +
      "1.04/sqrt(m) band on both branches, and the emitted estimate " +
      "equals an exact register-fold replay (any off-by-one in rho, " +
      "the harmonic fold, or the LC branch flips it)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // g1: 5000 distinct (raw-estimate branch at m=256, 2.5m = 640);
    // g2: 300 distinct (linear-counting branch)
    val df = ((0 until 5000).map(i => ("g1", s"token $i")) ++
      (0 until 300).map(i => ("g2", s"item $i"))).toDF("grp", "text")
    val out = graft.llm.TextAnalysis.hllDistinct(df, "grp", "text", b = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_exact"), r.getAs[Double]("n_est")))).toMap
    val band = 3.0 * 1.04 / 16.0 // 3 sigma at m = 256
    for ((g, n) <- Seq("g1" -> 5000L, "g2" -> 300L)) {
      assert(out(g)._1 === n)
      val rel = math.abs(out(g)._2 / n - 1.0)
      assert(rel <= band, s"$g: est ${out(g)._2} vs $n (rel $rel)")
    }
    // exact replay of the register fold from the same uniform hashes
    def replay(grp: String, n: Long): Double = {
      val m = 256
      val maxRho = 60 - 8 + 1
      val hs = df.filter(col("grp") === grp)
        .select(graft.llm.TextAnalysis.uniformHash60("text"))
        .collect().map(_.getLong(0))
      val regs = hs.groupBy(_ % m).map { case (bkt, hh) =>
        bkt -> hh.map { h =>
          val w = h / m
          if (w == 0) maxRho
          else maxRho - java.lang.Long.toBinaryString(w).length
        }.max
      }
      val present = regs.size
      val zp = regs.toSeq.sortBy(_._1).foldLeft(0.0) { (acc, e) =>
        acc + 1.0 / (1L << e._2) }
      val z = zp + (m - present).toDouble
      val raw = (0.7213 / (1.0 + 1.079 / m)) * m.toDouble * m / z
      val zeros = m - present
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(out("g1")._2 === replay("g1", 5000L))
    assert(out("g2")._2 === replay("g2", 300L))
  }

  test("kmvDistinct property: estimator identity est = " +
      "(k-1)*2^60/kth_hash at 6dp, exact degeneration below k, and " +
      "the k=256 estimate inside the 3-sigma 1/sqrt(k-2) band") {
    val spark = TestSpark.spark
    import spark.implicits._
    val k = 256
    // g1: 5000 distinct (sketch path); g2: 100 distinct (< k: exact)
    val df = ((0 until 5000).map(i => ("g1", s"token $i")) ++
      (0 until 100).map(i => ("g2", s"item $i"))).toDF("grp", "text")
    val out = graft.llm.TextAnalysis.kmvDistinct(df, "grp", "text", k = k)
      .collect().map(r => r.getString(0) -> r).toMap
    // degenerate group: kth order statistic undefined, exact count
    assert(out("g2").getAs[Long]("n_exact") === 100L)
    assert(out("g2").getAs[Any]("kth_hash") === null)
    assert(out("g2").getAs[Double]("est_distinct") === 100.0)
    // sketch group: the emitted estimate IS the (k-1)/U_(k) formula
    // applied to the emitted k-th hash — an off-by-one numerator or
    // order statistic flips this identity
    val kth = out("g1").getAs[Long]("kth_hash")
    val expected = BigDecimal((k - 1).toDouble * math.pow(2, 60) / kth)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("g1").getAs[Double]("est_distinct") === expected)
    // 3-sigma accuracy band: sd(est)/n ~ 1/sqrt(k-2)
    val rel = math.abs(out("g1").getAs[Double]("est_distinct") / 5000.0
      - 1.0)
    assert(rel <= 3.0 / math.sqrt(k - 2.0), s"rel error $rel")
  }

  // ---- round-16 adversarial-Unicode generator properties --------
  // Each draws strings from an alphabet chosen to break any
  // codepoint-vs-UTF-16-unit iteration bug: supplementary codepoints
  // (two chars each), combining marks (reorder under NFC), Hangul
  // jamo (compose into ONE syllable), and NFKC-only compatibility
  // characters. A walk that indexes by char misaligns after the
  // first surrogate pair; a normalize wrapper that mishandles the
  // fast path or byte round-trip diverges from java.text.Normalizer.

  private val uniPieces: IndexedSeq[String] = IndexedSeq(
    "a", "Z", " ",
    "\u00e9",                    // e-acute precomposed
    "e\u0301",                   // e-acute decomposed (NFC composes)
    "o\u0308\u0301",             // two combining marks
    "\u0301",                    // stray combining mark (may lead,
                                 // and composes onto whatever the
                                 // previous draw ended with)
    "\u1100\u1161\u11a8",        // Hangul jamo -> ONE syllable (NFC)
    new String(Character.toChars(0x1F600)),  // emoji (supplementary)
    new String(Character.toChars(0x1D11E)),  // musical G clef
    new String(Character.toChars(0x1F600)) + "\u0301", // mark on pair
    "\ufb01",                    // fi ligature (NFKC folds)
    "\uff21",                    // fullwidth A (NFKC folds)
    "\u00b2", "\u2460")          // superscript 2, circled 1 (NFKC)

  test("NFC/NFKC expressions property: codegen output equals " +
      "java.text.Normalizer and is idempotent on surrogate/" +
      "combining-mark/jamo/compat draws") {
    import java.text.Normalizer
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
    import graft.llm.{NfcNormalizeExpr, NfkcNormalizeExpr}
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = (1 to 120).map { _ =>
      (1 to (1 + rnd.nextInt(8)))
        .map(_ => uniPieces(rnd.nextInt(uniPieces.size))).mkString
    } :+ "" :+ "plain ascii only"
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val out = d
      .withColumn("nfc", column(NfcNormalizeExpr(expression(col("text")))))
      .withColumn("nfkc", column(NfkcNormalizeExpr(expression(col("text")))))
      .withColumn("nfc2", column(NfcNormalizeExpr(expression(col("nfc")))))
      .withColumn("nfkc2", column(NfkcNormalizeExpr(expression(col("nfkc")))))
      .collect()
    out.foreach { r =>
      val t = r.getAs[String]("text")
      assert(r.getAs[String]("nfc") ===
        Normalizer.normalize(t, Normalizer.Form.NFC),
        s"NFC diverged on ${t.map(c => f"\\u$c%04x").mkString}")
      assert(r.getAs[String]("nfkc") ===
        Normalizer.normalize(t, Normalizer.Form.NFKC),
        s"NFKC diverged on ${t.map(c => f"\\u$c%04x").mkString}")
      assert(r.getAs[String]("nfc2") === r.getAs[String]("nfc"))
      assert(r.getAs[String]("nfkc2") === r.getAs[String]("nfkc"))
    }
  }

  test("Aho-Corasick property: automaton counts equal char-level " +
      "brute force on supplementary/combining-mark draws") {
    import graft.llm.AcAutomaton
    import org.apache.spark.unsafe.types.UTF8String
    // brute force: overlapping occurrences via indexOf — a term is a
    // well-formed string, so a char-index match is always
    // codepoint-aligned; the automaton must agree everywhere
    def brute(s: String, t: String): Long = {
      var c = 0L; var i = s.indexOf(t)
      while (i >= 0) { c += 1; i = s.indexOf(t, i + 1) }
      c
    }
    (1 to 150).foreach { _ =>
      val terms = (1 to (2 + rnd.nextInt(4))).map(_ =>
        (1 to (1 + rnd.nextInt(3)))
          .map(_ => uniPieces(rnd.nextInt(uniPieces.size))).mkString)
        .filter(_.nonEmpty).distinct
      if (terms.nonEmpty) {
        val text = (1 to (3 + rnd.nextInt(10)))
          .map(_ => uniPieces(rnd.nextInt(uniPieces.size))).mkString
        val ac = new AcAutomaton(terms)
        val counts = ac.countMatches(UTF8String.fromString(text))
        ac.terms.zipWithIndex.foreach { case (t, i) =>
          assert(counts(i) === brute(text, t),
            s"term '$t' in '${text.map(c => f"\\u$c%04x").mkString}'")
        }
      }
    }
  }

  test("unigram Viterbi property: optimal piece count and score " +
      "match codepoint-level brute force on supplementary draws") {
    import graft.llm.{UnigramViterbi, UnigramVocab}
    import org.apache.spark.unsafe.types.UTF8String
    // single-CODEPOINT alphabet (incl. two supplementary, one
    // combining mark) so the brute force can enumerate segmentations
    // on the codepoint array
    val alpha = IndexedSeq("a", "b", "\u00e9", "\u0301",
      new String(Character.toChars(0x1F600)),
      new String(Character.toChars(0x1D11E)))
    val maxPiece = 3
    (1 to 150).foreach { _ =>
      val cps = (1 to (2 + rnd.nextInt(6)))
        .map(_ => alpha(rnd.nextInt(alpha.size)))
      val word = cps.mkString
      // vocab: random subset of the word's codepoint substrings
      val subs = (for {
        i <- cps.indices
        l <- 1 to math.min(maxPiece, cps.size - i)
      } yield cps.slice(i, i + l).mkString).distinct
      val vocabEntries = subs.filter(_ => rnd.nextBoolean())
        .map(p => p -> (1L + rnd.nextInt(9))).toArray
      val vmap = vocabEntries.toMap
      val r = UnigramViterbi.compute(UTF8String.fromString(word),
        new UnigramVocab(vocabEntries), maxPiece, 16)
      // brute force over the codepoint array: min pieces, then max
      // summed frequency (len-1 pieces always allowed at freq 0)
      val nCp = cps.size
      val best = Array.fill(nCp + 1)((Long.MaxValue, Long.MinValue))
      best(0) = (0L, 0L)
      for (p <- 1 to nCp; k <- 1 to math.min(maxPiece, p)) {
        val piece = cps.slice(p - k, p).mkString
        val known = vmap.contains(piece)
        if (k == 1 || known) {
          val (pn, ps) = best(p - k)
          if (pn != Long.MaxValue) {
            val cand = (pn + 1L, ps + vmap.getOrElse(piece, 0L))
            val cur = best(p)
            if (cand._1 < cur._1 ||
                (cand._1 == cur._1 && cand._2 > cur._2)) best(p) = cand
          }
        }
      }
      assert(r.getLong(1) === best(nCp)._1,
        s"n_pieces on '${word.map(c => f"\\u$c%04x").mkString}'")
      assert(r.getLong(0) === best(nCp)._2, s"best_score on '$word'")
      // the emitted segmentation is real: pieces rejoin to the word,
      // count matches, score and unk recompute from the pieces
      val segPieces = r.getUTF8String(3).toString.split(' ')
      assert(segPieces.mkString === word)
      assert(segPieces.length.toLong === r.getLong(1))
      assert(segPieces.map(p => vmap.getOrElse(p, 0L)).sum ===
        r.getLong(0))
      assert(segPieces.count(p =>
        p.codePointCount(0, p.length) == 1 && !vmap.contains(p))
        .toLong === r.getLong(2))
      // greedy invariants: Viterbi is piece-count optimal; at equal
      // count it is score-maximal
      assert(r.getLong(1) <= r.getLong(4))
      if (r.getLong(1) == r.getLong(4))
        assert(r.getLong(0) >= r.getLong(5))
    }
    // maxWordLen counts CODEPOINTS: six emoji exceed a bound of 5
    val emoji = new String(Character.toChars(0x1F600))
    val long = UnigramViterbi.compute(UTF8String.fromString(emoji * 6),
      new UnigramVocab(Array(emoji -> 3L)), maxPiece, 5)
    assert(long.getUTF8String(3).toString === UnigramViterbi.LongPiece)
  }

  test("annotatorKappa is symmetric in its labelers; bradleyTerry is " +
      "label-renaming equivariant") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.llm.Preference
    (1 to 5).foreach { _ =>
      val rows = (0 until 60).map { _ =>
        (s"c${rnd.nextInt(3)}", s"c${rnd.nextInt(3)}") }
      val df = rows.toDF("a", "b")
      val k1 = Preference.annotatorKappa(df, col("a"), col("b"))
        .select("po_ppm", "pe", "kappa").distinct().collect()(0)
      val k2 = Preference.annotatorKappa(df, col("b"), col("a"))
        .select("po_ppm", "pe", "kappa").distinct().collect()(0)
      // po is trivially symmetric; pe swaps row/col marginals inside
      // a symmetric sum; kappa follows
      assert(k1.getLong(0) === k2.getLong(0))
      assert(k1.getDouble(1) === k2.getDouble(1))
      assert(k1.getDouble(2) === k2.getDouble(2))
    }
    // renaming items by a strictly ORDER-PRESERVING map permutes
    // nothing and must carry strengths over unchanged (the only
    // name-dependence in the fit is the deterministic tie ordering,
    // which an order-preserving rename keeps intact)
    val pairs = (0 until 80).map { _ =>
      val i = rnd.nextInt(4); var j = rnd.nextInt(4)
      if (j == i) j = (j + 1) % 4
      (s"i$i", s"i$j")
    }
    val base = pairs.toDF("winner_item", "loser_item")
    val renamed = pairs.map { case (w, l) =>
      (w.replace("i", "item_"), l.replace("i", "item_")) }
      .toDF("winner_item", "loser_item")
    val s1 = Preference.bradleyTerry(base).collect()
      .map(r => r.getString(0).replace("i", "item_") -> r.getLong(3))
      .toMap
    val s2 = Preference.bradleyTerry(renamed).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(s1 === s2)
  }

  test("ksDrift: duplicating every row leaves D unchanged (the " +
      "statistic is a CDF property, not a count property)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.llm.Preference
    (1 to 5).foreach { _ =>
      val rows = (0 until 80).map { _ =>
        (s"g${rnd.nextInt(3)}", rnd.nextInt(16)) }
      val df = rows.toDF("g", "b")
      val doubled = (rows ++ rows).toDF("g", "b")
      def d(x: org.apache.spark.sql.DataFrame) =
        Preference.ksDrift(x, col("g"), col("b"), buckets = 16)
          .orderBy("grp").collect()
          .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
      // numerator and denominator both scale by 4 exactly -> the
      // truncated ppm and the argmax bucket are identical
      assert(d(df).toSeq === d(doubled).toSeq)
    }
  }

  test("aucFromScores: label complement reflects AUC around 1/2; " +
      "score translation leaves it unchanged") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.llm.Preference
    (1 to 5).foreach { _ =>
      val rows = (0 until 100).map { _ =>
        (rnd.nextInt(2001).toLong - 1000L, rnd.nextBoolean()) }
      val df = rows.toDF("smc", "label")
      def auc(d: org.apache.spark.sql.DataFrame, lbl: String) =
        Preference.aucFromScores(d, "smc", lbl)
          .select("auc").distinct().collect()(0).getDouble(0)
      val a = auc(df, "label")
      // complement: u2' = 2·np·nn − u2 exactly; in doubles the two
      // divisions share the denominator so the sum is 1 up to one ulp
      val b = auc(df.withColumn("label2",
        org.apache.spark.sql.functions.expr("NOT label")), "label2")
      assert(math.abs(a + b - 1.0) < 1e-12, s"$a + $b")
      // translating every score by a constant preserves the order
      // and the histogram shape -> identical AUC bit-for-bit
      val shifted = rows.map { case (s, l) => (s + 137L, l) }
        .toDF("smc", "label")
      assert(auc(shifted, "label") === a)
    }
  }

  test("retrievalEval property: all ppm metrics bounded by 10^6, " +
      "dcg <= idcg, perfect ranking scores exactly 10^6 everywhere") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.llm.Retrieval
    (1 to 8).foreach { _ =>
      val k = 1 + rnd.nextInt(10)
      val nq = 1 + rnd.nextInt(4)
      val run = (0 until nq).flatMap { q =>
        val docs = rnd.shuffle((0 until 40).toList).take(k)
        docs.zipWithIndex.map { case (d, i) =>
          (q.toLong, d.toLong, (i + 1).toLong) }
      }.toDF("query_id", "doc_id", "rank")
      val qrels = (0 until nq).flatMap { q =>
        (0 until 40).flatMap { d =>
          val r = rnd.nextInt(4).toLong
          if (r > 0) Some((q.toLong, d.toLong, r)) else None
        }
      }.toDF("query_id", "doc_id", "rel")
      Retrieval.retrievalEval(run, qrels, k).collect().foreach { r =>
        Seq(4, 6, 9).foreach { i => // recall, ap, ndcg
          if (!r.isNullAt(i))
            assert(r.getLong(i) >= 0L && r.getLong(i) <= 1000000L)
        }
        assert(r.getLong(5) <= 1000000L)        // rr
        assert(r.getLong(7) <= r.getLong(8) ||
          r.getLong(8) == 0L)                    // dcg <= idcg
      }
    }
    // exact-ceiling case, deterministic: run = ideal order of qrels
    val qr = Seq((0L, 1L, 3L), (0L, 2L, 2L), (0L, 3L, 2L),
      (0L, 4L, 1L)).toDF("query_id", "doc_id", "rel")
    val ideal = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L),
      (0L, 4L, 4L)).toDF("query_id", "doc_id", "rank")
    val row = Retrieval.retrievalEval(ideal, qr, k = 4)
      .collect()(0)
    assert(row.getLong(4) === 1000000L) // recall
    assert(row.getLong(5) === 1000000L) // rr
    assert(row.getLong(6) === 1000000L) // ap: every prefix all-rel
    assert(row.getLong(9) === 1000000L) // ndcg: dcg == idcg
  }

  test("rankOverlap property: symmetric in its arguments, bounded " +
      "by the weight sum, monotone under truncation depth") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.llm.Retrieval
    (1 to 8).foreach { _ =>
      val k = 2 + rnd.nextInt(9)
      def mkRun(): org.apache.spark.sql.DataFrame =
        (0 until 3).flatMap { q =>
          rnd.shuffle((0 until 20).toList).take(k).zipWithIndex
            .map { case (d, i) => (q.toLong, d.toLong, (i + 1).toLong) }
        }.toDF("query_id", "doc_id", "rank")
      val a = mkRun(); val b = mkRun()
      def res(x: org.apache.spark.sql.DataFrame,
          y: org.apache.spark.sql.DataFrame) =
        Retrieval.rankOverlap(x, y, k).orderBy("query_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      val ab = res(a, b); val ba = res(b, a)
      assert(ab.toSeq === ba.toSeq) // max(ra,rb) is symmetric
      val ceiling = Retrieval.rboWeightsNano(k, 900000L).sum
      ab.foreach { case (_, ov, rbo) =>
        assert(ov <= k && rbo >= 0L && rbo <= ceiling)
      }
      // identical rankings hit the ceiling exactly
      assert(res(a, a).forall(_._3 === ceiling))
    }
  }

  test("positionBias property: complementing every label swaps the " +
      "flag's side and negates z; counts always reconcile") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.llm.Preference
    import org.apache.spark.sql.functions.{col, expr}
    (1 to 8).foreach { _ =>
      val n = 20 + rnd.nextInt(200)
      val rows = (0 until n).map(_ => ("j", rnd.nextInt(100) < 70))
      val df = rows.toDF("judge", "aw")
      val orig = Preference.positionBias(df, col("judge"), col("aw"))
        .collect()(0)
      val comp = Preference.positionBias(
        df.withColumn("aw2", expr("NOT aw")), col("judge"),
        col("aw2")).collect()(0)
      assert(orig.getLong(1) === n.toLong &&
        comp.getLong(1) === n.toLong)
      assert(orig.getLong(2) + comp.getLong(2) === n.toLong)
      // z negates exactly up to the 6dp rounding of the shared
      // magnitude: |z| = |2p-1|*sqrt(n) is identical for p and 1-p
      assert(math.abs(orig.getDouble(6) + comp.getDouble(6)) < 1e-9)
      // a flag on one side implies the complement flags on the other
      // side or not at all only when the interval straddles after
      // complement — with the same width it must also flag
      assert(orig.getBoolean(7) === comp.getBoolean(7))
    }
  }

  test("pairedSignTest property: label-swap antisymmetry (wins swap, " +
      "mean diff and z negate), counts reconcile to shared units") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.llm.Retrieval
    (1 to 8).foreach { _ =>
      val n = 10 + rnd.nextInt(40)
      val rows = (0 until n).flatMap { u =>
        Seq(("a", u.toLong, rnd.nextInt(100).toLong),
          ("b", u.toLong, rnd.nextInt(100).toLong))
      }
      val df = rows.toDF("sys", "unit", "m")
      // swap the system LABELS: a<->b flips which side is sys_a
      val swapped = rows.map { case (s, u, m) =>
        (if (s == "a") "b" else "a", u, m)
      }.toDF("sys", "unit", "m")
      val o = Retrieval.pairedSignTest(df, "sys", "unit", "m")
        .collect()(0)
      val w = Retrieval.pairedSignTest(swapped, "sys", "unit", "m")
        .collect()(0)
      assert(o.getLong(2) === n.toLong && w.getLong(2) === n.toLong)
      assert(o.getLong(3) === w.getLong(4)) // wins_a <-> wins_b
      assert(o.getLong(4) === w.getLong(3))
      assert(o.getLong(5) === w.getLong(5)) // ties invariant
      // truncating DIV is antisymmetric only up to the truncation
      // direction: |meanDiff + swappedMeanDiff| <= 1
      assert(math.abs(o.getLong(6) + w.getLong(6)) <= 1L)
      assert(math.abs(o.getDouble(7) + w.getDouble(7)) < 1e-9)
    }
  }

  test("kAnonymize property: the release-side guarantee — every " +
      "published equivalence class holds >= k rows (or is flagged), " +
      "group_n is the true class size, ids are conserved") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.llm.TextAnalysis
    (1 to 6).foreach { _ =>
      val n = 30 + rnd.nextInt(60)
      val rows = (0 until n).map(i =>
        (i.toLong, s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(5)}"))
      val df = rows.toDF("id", "qa", "qb")
      val k1 = 2 + rnd.nextInt(4)
      val out = TextAnalysis.kAnonymize(df, "id", Seq("qa", "qb"), k1)
        .collect()
      // every input row appears exactly once
      assert(out.map(_.getLong(0)).sorted.toSeq ===
        rows.map(_._1).sorted)
      // the k-anonymity PROPERTY over the published table: the rows
      // sharing a published tuple number >= k, group_n is exactly
      // that count, and flags agree (the only allowed exception is
      // the all-star leftover, flagged not-anonymous)
      out.groupBy(r => (r.getString(1), r.getString(2)))
        .foreach { case ((ga, gb), rs) =>
          val m = rs.length.toLong
          assert(rs.forall(_.getLong(4) === m))
          rs.foreach { r =>
            assert(r.getBoolean(5) === (m >= k1))
            if (m < k1) assert(ga === "*" && gb === "*",
              "an under-k class may only be the all-star leftover")
          }
        }
    }
  }

  test("licenseScan property: verdict hits are the max per-tag sum, " +
      "total >= verdict hits, unknown iff zero hits") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.llm.TextAnalysis
    val markers = Seq("mit" -> "permission is hereby granted",
      "gpl" -> "gnu general public license",
      "cc" -> "creative commons")
    val phrases = markers.map(_._2)
    (1 to 6).foreach { _ =>
      val rows = (0 until 30).map { i =>
        val plants = (0 until rnd.nextInt(4)).map(_ =>
          phrases(rnd.nextInt(phrases.length)))
        (i.toLong, ("filler words here" +: plants).mkString(" . "))
      }
      val df = rows.toDF("doc_id", "text")
      val out = TextAnalysis
        .licenseScan(df, "text", "doc_id", markers)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      rows.foreach { case (id, text) =>
        val perTag = markers.map { case (tag, p) =>
          tag -> text.sliding(p.length).count(_ == p).toLong
        }
        val total = perTag.map(_._2).sum
        val (lic, hits, tot) = out(id)
        assert(tot === total)
        if (total == 0L) assert(lic === "unknown" && hits === 0L)
        else {
          val best = perTag.filter(_._2 > 0)
            .minBy { case (t, h) => (-h, t) }
          assert((lic, hits) === best)
        }
      }
    }
  }
}
