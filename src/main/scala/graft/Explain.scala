package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the formatted physical plan of named
  * registered queries (comma-separated in arg 2) against a testdata
  * dir (arg 1) — the tool behind PLANS.md. Reading the plan is the
  * scale check: PushedFilters/ReadSchema on the scans, broadcast vs
  * shuffle join sides, WholeStageCodegen span width, exchange count.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
