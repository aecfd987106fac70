package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs batch-at-a-time over partitions (the Scala analogue of a
  * Pandas-UDF `mapInPandas` stage: one iterator of batches per
  * partition, vectorizable, no per-row JVM↔native crossings at the
  * API boundary).
  *
  * The actual media decode is STUBBED — no image/audio codecs exist in
  * this environment — with a deterministic fake that consumes real
  * bytes and emits a fixed-width feature vector, so the Spark-side
  * contract (schema, partitioning, batch shape) is real and tested
  * while the codec call is a drop-in replacement point.
  */
object Multimodal {

  /** Attach a binary payload column + typed metadata struct to a text
    * corpus (here the payload is the UTF-8 encoding of the document —
    * a stand-in for image/audio bytes that keeps everything
    * deterministic and oracle-checkable).
    */
  def withBinaryPayload(df: DataFrame, text: String): DataFrame =
    df.withColumn("payload", col(text).cast("binary"))
      .withColumn("meta", struct(
        lit("text/plain; charset=utf-8").as("mime"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("checksum")))

  case class MediaFeatures(doc_id: Long, n_bytes: Long,
      feat: Array[Double])

  /** STUB decode — deterministic fake feature extraction standing in
    * for a real codec (??? replacement point). Consumes the payload
    * bytes, returns a fixed-width "embedding": byte-value histogram
    * moments. Replace the body with e.g. a JNI image decoder + model
    * forward pass; the partition/batch plumbing stays identical.
    */
  def stubDecode(bytes: Array[Byte]): Array[Double] = {
    // ??? <- real codec goes here; deterministic fake below
    if (bytes == null || bytes.isEmpty) return Array.fill(4)(0.0)
    val n = bytes.length.toDouble
    val mean = bytes.map(_ & 0xff).sum / n
    val varr = bytes.map(b => math.pow((b & 0xff) - mean, 2)).sum / n
    val first = (bytes.head & 0xff).toDouble
    Array(n, mean, math.sqrt(varr), first)
  }

  /** STUB resize — deterministic stand-in for an image resize: nearest
    * -neighbor downsample of the payload byte stream to `target`
    * bytes (??? replacement point for a real decoder+resampler; the
    * batch shape and output schema are what a codec swap would keep).
    */
  def stubResize(bytes: Array[Byte], target: Int): Array[Byte] = {
    // ??? <- real decode + resample goes here; deterministic fake below
    if (bytes == null || bytes.isEmpty || target <= 0)
      return Array.emptyByteArray
    if (bytes.length <= target) return bytes
    Array.tabulate(target)(i =>
      bytes((i.toLong * bytes.length / target).toInt))
  }

  /** Batch feature extraction over partitions: the mapInPandas-shaped
    * stage. Input must have (doc_id: long, payload: binary).
    */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // one pass per partition — amortizes any codec/session init
        batch.map { case (id, bytes) =>
          MediaFeatures(id, if (bytes == null) 0L else bytes.length.toLong,
            stubDecode(bytes))
        }
      }
  }

  /** Frame/sample selection analogue: deterministic stride sampling —
    * every `stride`-th codepoint of the source content as a small
    * fixed-width preview array (the shape of video frame-sampling,
    * minus the codec). Null-safe: positions past the end yield 0.
    */
  def sampleExpr(textCol: String, stride: Int, take: Int) =
    expr(s"""transform(sequence(0, ${take - 1}),
             i -> CASE WHEN i * $stride + 1 <= length($textCol)
                  THEN ascii(substring($textCol, i * $stride + 1, 1))
                  ELSE 0 END)""")
}
