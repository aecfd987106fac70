package graft.engine

import org.apache.spark.sql.types._
import java.sql.{Date, Timestamp}

/** Explicit schemas + case classes for the engine (SURVEY §1.3).
  *
  * The reference keeps all schemas dynamic/inferred
  * (ref: PRACTICA3.py:183, generador.py:31); here every source has an
  * explicit StructType and the typed kernel has case classes.
  */
object Schemas {

  /** ventas.csv — UCI Online Retail shape (ref: PRACTICA3.py:186-190). */
  val ventas: StructType = StructType(Seq(
    StructField("InvoiceNo", StringType),
    StructField("StockCode", StringType),
    StructField("Description", StringType),
    StructField("Quantity", LongType),
    StructField("InvoiceDate", TimestampType),
    StructField("UnitPrice", DoubleType),
    StructField("CustomerID", StringType),
    StructField("Country", StringType)))

  /** forecast_resultados intermediate (ref: PRACTICA3.py:165-175). */
  val forecastResults: StructType = StructType(Seq(
    StructField("SKU", StringType),
    StructField("Store", StringType),
    StructField("MAPE", DoubleType),
    StructField("Forecast", StringType), // stringified array in CSV form
    StructField("Test", StringType),
    StructField("Safety_Stock", IntegerType),
    StructField("Reorder_Point", IntegerType),
    StructField("Qty_to_Order", IntegerType),
    StructField("Runtime_sec", DoubleType)))

  /** FreshRetailNet-50K consumed columns (ref: limpieza_de_datos.py:12-23). */
  val freshRetail: StructType = StructType(Seq(
    StructField("product_id", LongType),
    StructField("store_id", LongType),
    StructField("dt", TimestampType),
    StructField("sale_amount", DoubleType)))
}

object PipelineConfig {
  /** Upper bound on a series' first-to-last-week span, in weeks
    * (50 years). The densify step scatters one cell per calendar
    * week of span, so ONE corrupted timestamp (year 9999) would
    * amplify a single series into ~400k gap-zero cells — at a 100 TB
    * fine grain that is executor-OOM territory multiplied across
    * thousands of series. Real retail history is calendar-bounded
    * far below this; a series past it is data corruption and fails
    * loudly instead of silently inflating memory.
    */
  val DefaultMaxSpanWeeks = 2600
}

/** Query parameters of the flagship pipeline (ref: PRACTICA3.py:35-40). */
case class PipelineConfig(
    horizonWeeks: Int = 4,
    minWeeks: Int = 12,
    minTotalSales: Double = 10.0,
    maxSpanWeeks: Int = PipelineConfig.DefaultMaxSpanWeeks,
    serviceLevelZ: Double = 1.645,
    leadTimeWeeks: Double = 0.4285,
    // model toggles (the reference gates Prophet on import availability,
    // ref: PRACTICA3.py:22-26; we gate the substitute the same way)
    useTrendSeasonal: Boolean = true,
    useHoltWinters: Boolean = true,
    // align the kernel's float arithmetic with the SQL-oracle form for
    // exact hash compare: round the MA forecast to 6dp (half-up, the
    // same BigDecimal path as Spark `round`) before MAPE, and use
    // Spark-percentile product order in the winsorize quantile.
    // Default false = the reference's numpy semantics (unrounded MA,
    // `lo + frac*(hi-lo)` interpolation); the divergence is ≤1 ulp,
    // visible only when a MAPE lands exactly on a .0005 boundary
    oracleCompat: Boolean = false)

/** One cleaned sales observation entering the typed kernel. */
case class SalesRow(sku: String, store: String, week: Date, units: Double)

/** Kernel output — one row per eligible (sku, store) series
  * (ref: PRACTICA3.py:165-175). */
case class SkuResult(
    sku: String,
    store: String,
    mape: Double,
    forecast: Array[Double],
    test: Array[Double],
    safety_stock: Int,
    reorder_point: Int,
    qty_to_order: Int,
    runtime_sec: Double)
