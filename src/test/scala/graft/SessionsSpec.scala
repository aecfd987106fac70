package graft

import graft.engine.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Session-window semantics pins: exact-gap boundary, window bounds,
  * and streaming/batch parity of the SAME operator code.
  */
class SessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("ts", TimestampType),
    StructField("v", DoubleType)))

  private def events(rows: (String, String, Double)*) =
    rows.toSeq
      .map { case (k, ts, v) => (k, java.sql.Timestamp.valueOf(ts), v) }
      .toDF("k", "ts", "v")

  test("exact-gap events merge; strictly-beyond starts a new session") {
    val df = events(
      ("u", "2024-01-01 00:00:00", 1.0),
      ("u", "2024-01-01 00:30:00", 2.0), // exactly the gap -> merges
      ("u", "2024-01-01 01:00:01", 4.0), // 30m01s -> new session
      ("w", "2024-01-01 00:00:00", 8.0))
    val out = Sessions.sessionAgg(df, Seq("k"), "ts", "v", "30 minutes")
      .orderBy("k", "s_start").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      ("u", "2024-01-01 00:00:00.0", "2024-01-01 01:00:00.0", 2L, 3.0),
      ("u", "2024-01-01 01:00:01.0", "2024-01-01 01:30:01.0", 1L, 4.0),
      ("w", "2024-01-01 00:00:00.0", "2024-01-01 00:30:00.0", 1L, 8.0)))
  }

  test("streaming session_window equals batch once the watermark closes") {
    val dir = java.nio.file.Files.createTempDirectory("sess_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sess_ck").toString
    events(("u", "2024-01-01 00:00:00", 1.0),
      ("u", "2024-01-01 00:10:00", 2.0))
      .write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
    val q = Sessions.sessionAgg(stream, Seq("k"), "ts", "v", "30 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    // advance event time far enough that the watermark closes session 1
    events(("u", "2024-01-05 00:00:00", 4.0))
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_out")
      .select("k", "s_start", "s_end", "n_events", "total")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(3), r.getDouble(4))).toSet
    // the closed first session matches the batch result exactly
    val batch = Sessions.sessionAgg(
      spark.read.schema(schema).parquet(dir), Seq("k"), "ts", "v",
      "30 minutes").orderBy("s_start").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getLong(3), r.getDouble(4)))
    assert(streamed.contains(batch(0)))
  }
}
