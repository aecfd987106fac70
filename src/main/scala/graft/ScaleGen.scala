package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scale-up generator: writes a `factor`× copy of a test
  * SF directory by replicating each fact table `factor` times with
  * every inter-table key remapped `k*factor + r` — the result is
  * `factor` DISJOINT copies of the original join graph, so join
  * selectivity, per-key group sizes, and skew shape are preserved
  * exactly while row counts scale linearly. That is the right input
  * for a super-linearity sweep: any KEYED query whose runtime grows
  * faster than `factor`× on this data has a genuine scaling defect,
  * not a data-shape artifact.
  *
  * Caveat (measured, see BASELINE.md round-9 section): value and
  * time DOMAINS copy through unscaled, so theta joins that match by
  * value/time rather than by key (range_join, interval_join) see
  * interval density rise `factor`× over the fixed domain and their
  * true answer cardinality grows quadratically (measured 99.8× and
  * 100.0× output at factor=10). Judge those queries by per-output-
  * pair throughput, not wall clock.
  *
  * Document text gets a per-replica suffix token so replicas are
  * NEAR-duplicates (high-Jaccard, realistic dup-laden corpus) rather
  * than exact ones — exact-dup explosion would turn the dedup family
  * into a different (degenerate) workload. `n_chars` is recomputed.
  * Dimension enums (region, nation) copy through unscaled, and the
  * nationkey references stay valid.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <dstDir> [factor]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(factor).select(col("id").as("__r"))
    def scaled(name: String, keys: Seq[String])(
        extra: DataFrame => DataFrame): Unit = {
      val base =
        if (name == "events")
          graft.engine.Ingest.tableNanos(spark, src, name, Seq("ts"))
            // keep raw long nanos in the output file; tableNanos
            // converts either representation on read. The source ts
            // may surface as TIMESTAMP_LTZ (nanos-as-long path) or
            // TIMESTAMP_NTZ (micros file) — cast first: with the
            // session timezone pinned UTC the NTZ wall time IS the
            // UTC instant, so both cases yield the same micros.
            .withColumn("ts", expr(
              "unix_micros(cast(ts as timestamp)) * CAST(1000 AS BIGINT)"))
        else spark.read.parquet(s"$src/$name.parquet")
      val rep = keys.foldLeft(base.crossJoin(broadcast(reps))) {
        (d, k) => d.withColumn(k, col(k) * factor + col("__r"))
      }
      extra(rep).drop("__r")
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scalegen] $name x$factor")
    }

    scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))(identity)
    scaled("orders", Seq("o_orderkey", "o_custkey"))(identity)
    scaled("customer", Seq("c_custkey"))(identity)
    scaled("supplier", Seq("s_suppkey"))(identity)
    scaled("part", Seq("p_partkey"))(identity)
    scaled("events", Seq("event_id", "user_id"))(identity)
    scaled("documents", Seq("doc_id")) { d =>
      d.withColumn("text",
          concat(col("text"), lit(" xr"), col("__r")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    scaled("embeddings", Seq("vec_id"))(identity)
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    println(s"[scalegen] done -> $dst")
    spark.stop()
  }
}
