package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scans + projection/rename/coercion (SURVEY §2 rows A1-A4, B1-B4).
  *
  * All coercion is null-on-error (`try_cast`) so the engine behaves the
  * same under ANSI SQL mode — mirroring pandas `errors='coerce'`
  * (ref: PRACTICA3.py:193, generador.py:41-43).
  */
object Ingest {

  /** A1 — CSV scan with explicit schema + timestamp parse
    * (ref: PRACTICA3.py:183). Explicit schema => no inference pass over
    * the data (one read, not two — matters at 100 TB).
    */
  def readVentasCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.ventas)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** A2 — scan with existence pre-check (ref: generador.py:25-28
    * aborts with a message when the results CSV is missing): None when
    * the path does not exist, mirroring the reference's guard instead
    * of surfacing an AnalysisException from the scan.
    */
  def tableIfExists(spark: SparkSession, path: String)
      : Option[DataFrame] = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hadoopPath)) Some(spark.read.parquet(path)) else None
  }

  /** A3 — columnar (parquet) scan of a named test table. Routed
    * through [[graft.BenchGrain.input]] (a no-op outside an active
    * bench-grain scope) like the query modules' loaders.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.BenchGrain.input(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** A3 variant for sources with TIMESTAMP(NANOS) parquet columns
    * (Spark has no nanosecond TimestampType; without the legacy conf
    * the scan throws PARQUET_TYPE_ILLEGAL). Reads nanos as long and
    * converts to microsecond timestamps. Integer `div` — a double
    * division would lose precision above 2^53 ns.
    */
  def tableNanos(spark: SparkSession, sfDir: String, name: String,
      nanosCols: Seq[String]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = graft.BenchGrain.input(
      spark.read.parquet(s"$sfDir/$name.parquet"))
    nanosCols.foldLeft(raw) { (d, c) =>
      if (d.schema(c).dataType.typeName == "long")
        d.withColumn(c, expr(s"timestamp_micros(`$c` div 1000)"))
      else d
    }
  }

  /** A4 array serialization: pandas to_csv of a Python list prints
    * "[1.0, 2.0]" (", " separator, ref: PRACTICA3.py:169,209);
    * to_json emits no space. Exactly inverted by
    * [[Clean.parseDoubleArray]] (F4) — the `a4_roundtrip` query proves
    * the inversion under the oracle.
    */
  def csvArrayForm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(to_json(c), ",", ", ")

  /** A4 — CSV sink; arrays stay native when sinking parquet (preferred),
    * CSV-compat keeps the reference's bracketed stringified form
    * (ref: PRACTICA3.py:208-209).
    */
  def writeCsvCompat(df: DataFrame, path: String): Unit = {
    val out = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType.typeName match {
        case "array" => d.withColumn(f.name, csvArrayForm(col(f.name)))
        case _       => d
      }
    }
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Bucketed sink + catalog read: pre-shuffling a table by its join/
    * aggregation keys at write time removes the Exchange from every
    * later equi-join or groupBy on those keys (both sides bucketed
    * with equal bucket counts ⇒ a zero-shuffle sort-merge join). At
    * 100 TB this converts the recurring shuffle of a fact table into a
    * one-time cost at ingest. Bucketing requires the session catalog
    * (`saveAsTable`), not a bare path.
    */
  def writeBucketed(df: DataFrame, tableName: String, buckets: Int,
      keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    // The in-memory catalog is per-JVM but the warehouse directory is
    // not: a fresh session sees no table yet LOCATION_ALREADY_EXISTS
    // on the leftover managed-table dir. Drop both for idempotence.
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      tableName.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Hive-style partitioned parquet sink: directory partitioning on a
    * low-cardinality key gives free partition pruning on every later
    * read filtered by that key (`PartitionFilters` in the scan, whole
    * directories skipped — the first lever against a 100 TB scan).
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Range-clustered parquet layout: repartitionByRange on the sort
    * key then sortWithinPartitions before writing, so each output
    * file covers a narrow, non-overlapping key interval. Parquet
    * min/max footer stats then let any later range/point predicate on
    * the key skip whole files and row groups — the second
    * scan-reduction lever after directory partitioning
    * ([[writePartitioned]]), and the right one for high-cardinality
    * keys where one-directory-per-value would explode. (The
    * single-key form of Z-ordering; at 100 TB this is how a sorted
    * fact table is laid down.)
    */
  def writeSorted(df: DataFrame, path: String, numFiles: Int,
      sortCols: Seq[String]): Unit =
    df.repartitionByRange(numFiles,
        sortCols.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      .write.mode("overwrite").parquet(path)

  /** Bit-interleaved Z-value of two non-negative integer keys (lowest
    * `bits` of each): points close in BOTH dimensions get close
    * Z-values, so range-partitioning on it clusters a 2-D key space
    * into files whose (min,max) boxes are small in both dims at once
    * — what single-key sorting ([[writeSorted]]) cannot do. Pure
    * integer shifts, exact on any engine.
    */
  def zValueExpr(a: String, b: String, bits: Int = 16)
      : org.apache.spark.sql.Column = {
    // UNROLLED flat sum, not an aggregate() HOF fold: the lambda is
    // interpreted (no whole-stage codegen) and the z-value is
    // evaluated several times per row on the write path
    // (repartitionByRange's range sampling + the shuffle + the
    // within-partition sort) — the constant-length unroll keeps the
    // whole thing inside codegen. Same arithmetic, same values.
    val terms = (0 until bits).flatMap(i => Seq(
      s"shiftleft(shiftright(CAST($a AS BIGINT), $i) & 1, ${2 * i})",
      s"shiftleft(shiftright(CAST($b AS BIGINT), $i) & 1, ${2 * i + 1})"))
    org.apache.spark.sql.functions.expr(
      terms.mkString("(", " + ", ")"))
  }

  /** Z-ordered parquet layout on two keys: range-partition + sort on
    * the interleaved Z-value. Any later predicate constraining EITHER
    * key (or both) skips files via parquet min/max on the key columns
    * themselves — the multi-dimension generalization of
    * [[writeSorted]], and the standard data-clustering lever for
    * fact tables queried along two axes at 100 TB.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
      keyA: String, keyB: String): Unit =
    df.withColumn("__z", zValueExpr(keyA, keyB))
      .repartitionByRange(numFiles,
        org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** JSON-lines sink: one JSON object per row — the interchange
    * format crawl dumps and annotation pipelines actually ship.
    * Plain distributed text write, one file per partition.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSON-lines source with an EXPLICIT schema: schema-on-read
    * without the inference pre-scan (at 100 TB, inference would read
    * the whole corpus once before the query even starts — always
    * pass the schema). Malformed lines null-fill per Spark's
    * PERMISSIVE default rather than failing the scan.
    */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC sink/source roundtrip pair — the second columnar container
    * a warehouse-adjacent engine must read and write (Hive-lineage
    * lakes are ORC). Spark's native vectorized ORC reader keeps
    * predicate pushdown and column pruning, same as parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def readOrc(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.orc(path)

  /** Small-file compaction: rewrite a parquet dataset into
    * `targetFiles` files via `coalesce` — NO shuffle (coalesce only
    * merges upstream partitions), so compaction costs one read + one
    * write. The standing maintenance job of any long-lived lake:
    * streaming sinks and incremental ingests accrete thousands of
    * KB-sized files whose per-file open/footer overhead eventually
    * dominates scan time. Use `repartitionByRange` + [[writeSorted]]
    * instead when the rewrite should also re-cluster.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFiles: Int): Unit = {
    val df = spark.read.parquet(inPath)
    // coalesce cannot INCREASE partition count, and the scan may
    // already pack many small files into fewer read partitions than
    // the target (maxPartitionBytes bin-packing) — only then fall
    // back to a repartition, which pays a shuffle for an exact count
    val out =
      if (df.rdd.getNumPartitions >= targetFiles)
        df.coalesce(targetFiles)
      else df.repartition(targetFiles)
    out.write.mode("overwrite").parquet(outPath)
  }

  /** B1 — column rename (ref: PRACTICA3.py:186-190). */
  val ventasRenames: Map[String, String] = Map(
    "StockCode" -> "Product_ID",
    "Country"   -> "Store_ID",
    "Quantity"  -> "Units_Sold")

  /** B1/B2 — rename, tolerant of absent columns (pandas
    * `rename(errors='ignore')`, ref: generador.py:34-38).
    * `withColumnsRenamed` is already a no-op for absent names.
    */
  def rename(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** B3 — numeric coercion null-on-error then fill 0
    * (ref: PRACTICA3.py:193). ANSI-safe via try_cast.
    */
  def coerceNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val coerced = cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, expr(s"try_cast(`$c` as double)"))
    }
    coerced.na.fill(0.0, cols)
  }

  /** B4 — scalar fillna + string cast (ref: generador.py:46). */
  def fillStr(dfCol: org.apache.spark.sql.Column, default: String) =
    coalesce(dfCol.cast("string"), lit(default))

  /** B6 — add a column iff absent (ref: generador.py:75-77). */
  def withColumnIfAbsent(df: DataFrame, name: String,
      default: org.apache.spark.sql.Column): DataFrame =
    if (df.columns.contains(name)) df else df.withColumn(name, default)
}
