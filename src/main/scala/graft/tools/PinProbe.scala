package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-path timing probe: runs named registered queries N times each
  * in one JVM with the cache cleared between runs — the driver-bench
  * cold shape, without the bench harness's clamps/shuffling — for
  * quick isolated iteration on a query's cold cost.
  *
  * Usage: runMain graft.tools.PinProbe <sfDir> <runs> <q1,q2,...>
  */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else Seq("winnow_pairs", "curation_v2")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup so JVM/codegen startup doesn't land on the first sample
    graft.SparkEntry.queries("d1_multikey_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    for (r <- 1 to runs; q <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $q run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
