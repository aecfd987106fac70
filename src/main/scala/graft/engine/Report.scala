package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Report stage (SURVEY §3.3 — generador semantics): rename → coerce →
  * parse forecast strings → derived columns → global aggregates →
  * per-row interpretation text. Everything except final PDF styling is
  * engine work; rendering collects the (small) result driver-side.
  */
object Report {

  /** Full load-and-clean (ref: generador.py:31-88). Input has the
    * forecast_results schema (Forecast as stringified array).
    */
  def clean(raw: DataFrame): DataFrame = {
    val renamed = Ingest.rename(raw, Map(
      "SKU" -> "StockCode", "Store" -> "StoreID",
      "Runtime_sec" -> "Duracion_sec"))
    val numCols = Seq("MAPE", "Safety_Stock", "Reorder_Point",
      "Qty_to_Order", "Duracion_sec").filter(renamed.columns.contains)
    val coerced = numCols.foldLeft(renamed) { (d, c) =>
      d.withColumn(c, expr(s"try_cast(`$c` as double)"))
    }
    // B8: struct-producing row function + star-expand — the reference's
    // `df['Forecast'].apply(parse_forecast).apply(pd.Series)` +
    // positional concat (ref: generador.py:67-69), expressed as one
    // struct column expanded into fields (no positional join)
    val filled = coerced
      .withColumn("Forecast", Ingest.fillStr(col("Forecast"), "[]"))
    val fc = Clean.parseDoubleArray(col("Forecast"))
    val parsed = Clean.expandStruct(filled,
      struct(
        fc.as("Forecast_List"),
        Clean.arrayTotal(fc).as("Forecast_Total"),
        Clean.arrayWeeks(fc).as("Forecast_Weeks")), "__fc")
      .withColumn("Need_Reorder", Clean.needReorder(col("Qty_to_Order")))
    val withRmse = Ingest.withColumnIfAbsent(parsed, "RMSE", lit(0.0))
    val cleaned = withRmse
      .na.drop(Seq("Forecast_Total", "MAPE", "Qty_to_Order"))
    // pandas .round(0) is half-even → bround (SURVEY F3)
    Seq("Safety_Stock", "Reorder_Point", "Qty_to_Order", "Forecast_Total")
      .foldLeft(cleaned)((d, c) =>
        d.withColumn(c, bround(col(c)).cast("int")))
  }

  /** Global header aggregates (ref: generador.py:180-183): row count,
    * series needing reorder (D7 sum-of-booleans), mean MAPE (D4).
    */
  def globalStats(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("n_series"),
      count_if(col("Need_Reorder")).as("n_reorder"),
      avg(col("MAPE")).as("mean_mape"))

  /** F5 — MAPE quality band CASE ladder (ref: generador.py:128-136). */
  def mapeBand(mape: Column): (Column, Column) = (
    when(mape < 10.0, lit("alta precisión"))
      .when(mape < 50.0, lit("aceptable"))
      .otherwise(lit("baja precisión")),
    when(mape < 10.0, lit("green"))
      .when(mape < 50.0, lit("orange"))
      .otherwise(lit("red")))

  /** F5/F6 — per-row interpretation text as engine columns
    * (ref: generador.py:97-158); plain-text flavor of the reference's
    * ReportLab XML.
    */
  def withInterpretation(df: DataFrame): DataFrame = {
    val (band, color) = mapeBand(col("MAPE"))
    df.withColumn("Quality_Band", band)
      .withColumn("Quality_Color", color)
      .withColumn("Pedido_Text",
        when(col("Need_Reorder"), format_string(
          "RECOMENDACIÓN CLAVE: Se debe realizar un pedido de %d unidades " +
            "para evitar una posible rotura de stock.",
          col("Qty_to_Order")))
          .otherwise(lit("RECOMENDACIÓN CLAVE: No se requiere realizar " +
            "un pedido inmediato (el inventario actual está por encima " +
            "del ROP).")))
      .withColumn("Logistica_Text", format_string(
        "El punto de reorden (ROP) es de %d unidades. " +
          "El stock de seguridad (SS) calculado es de %d unidades. " +
          "La demanda pronosticada para las %d semanas siguientes es de " +
          "%d unidades.",
        col("Reorder_Point"), col("Safety_Stock"),
        col("Forecast_Weeks"), col("Forecast_Total")))
      .withColumn("Header_Text", format_string(
        "Análisis Detallado de SKU: %s en %s",
        col("StockCode"), col("StoreID")))
  }

  /** A5 — the only driver-side step: collect the small report frame and
    * render plain text (the PDF layer is presentation, not engine).
    */
  def renderText(df: DataFrame, limit: Int = 1000): String =
    withInterpretation(df)
      .orderBy(col("StockCode"), col("StoreID"))
      .limit(limit)
      .collect()
      .map { r =>
        Seq("Header_Text", "Pedido_Text", "Logistica_Text", "Quality_Band")
          .map(c => r.getAs[Any](c)).mkString("\n")
      }
      .mkString("\n\n")
}
