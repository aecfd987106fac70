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

  /** A5 (round-15) — the reference's per-SKU report paragraphs as
    * ENGINE COLUMNS, markup included, exactly in generador.py's
    * <para> assembly order (ref: generador.py:97-158): header+runtime,
    * "1. Decisión de Pedido", "2. Parámetros Logísticos" (<br/>
    * between the three sentences, <b> around every quantity), and
    * "3. Calidad del Pronóstico" with the F5 color band and the full
    * band-specific precision sentence. Numeric text fields pre-round
    * to 2 dp before %.2f so the oracle's printf renders the identical
    * digits (no formatter tie decisions). Input: a
    * [[withInterpretation]]-ed frame (needs Quality_Color).
    */
  def withReportParas(df: DataFrame): DataFrame = {
    val precText =
      when(col("MAPE") < 10.0, format_string(
        "El modelo muestra una <b>alta precisión</b> (MAPE: %.2f%%). " +
          "Las predicciones son muy fiables.", round(col("MAPE"), 2)))
        .when(col("MAPE") < 50.0, format_string(
          "La precisión del modelo es <b>aceptable</b> (MAPE: %.2f%%). " +
            "Requiere monitorización.", round(col("MAPE"), 2)))
        .otherwise(format_string(
          "El modelo tuvo una <b>baja precisión</b> (MAPE: %.2f%%), " +
            "lo que indica demanda intermitente o volátil. La decisión " +
            "se basa fuertemente en el Stock de Seguridad.",
          round(col("MAPE"), 2)))
    df
      .withColumn("Para_Header", format_string(
        "<font size=\"14\"><b>Análisis Detallado de SKU: %s en %s" +
          "</b></font><br/><font size=\"10\">Duración del " +
          "procesamiento: %.2f segundos</font>",
        col("StockCode"), col("StoreID"), round(col("Duracion_sec"), 2)))
      .withColumn("Para_Pedido", concat(
        lit("<font size=\"12\"><b>1. Decisión de Pedido:</b></font><br/>"),
        when(col("Need_Reorder"), format_string(
          "RECOMENDACIÓN CLAVE: Se debe realizar un pedido de " +
            "<b>%d unidades</b> para evitar una posible rotura de stock.",
          col("Qty_to_Order")))
          .otherwise(lit("RECOMENDACIÓN CLAVE: No se requiere realizar " +
            "un pedido inmediato (el inventario actual está por encima " +
            "del ROP)."))))
      .withColumn("Para_Logistica", format_string(
        "<font size=\"12\"><b>2. Parámetros Logísticos:</b></font><br/>" +
          "El punto de reorden (ROP) es de <b>%d unidades</b>.<br/>" +
          "El stock de seguridad (SS) calculado es de <b>%d unidades" +
          "</b>.<br/>La demanda pronosticada para las %d semanas " +
          "siguientes es de <b>%d unidades</b>.",
        col("Reorder_Point"), col("Safety_Stock"),
        col("Forecast_Weeks"), col("Forecast_Total")))
      .withColumn("Para_Precision", format_string(
        "<font size=\"12\"><b>3. Calidad del Pronóstico:</b></font>" +
          "<br/><font color=\"%s\"> %s (RMSE: %.2f).</font>",
        col("Quality_Color"), precText, round(col("RMSE"), 2)))
  }

  /** A5 — the self-contained driver-side document (ReportLab-markup
    * flavor, built exactly like generador.py:162-215 builds its
    * story): main title, generation date, the Resumen / MAPE-global
    * header paragraphs, then per series an <hr/> separator and the
    * four [[withReportParas]] paragraphs in reference order. The
    * collect is the bounded presentation step the reference also
    * performs driver-side (doc.build); `generatedAt` is a parameter
    * so rendering stays deterministic.
    */
  def renderDocument(df: DataFrame, generatedAt: String,
      limit: Int = 1000): String = {
    val rows = withReportParas(withInterpretation(df))
      .orderBy(col("StockCode"), col("StoreID"))
      .limit(limit)
      .collect()
    val nSeries = rows.length
    val nReorder = rows.count(_.getAs[Boolean]("Need_Reorder"))
    val meanMape =
      if (nSeries == 0) 0.0
      else rows.map(_.getAs[Double]("MAPE")).sum / nSeries
    val header = Seq(
      "<para><font size=\"18\"><b>Informe de Optimización de " +
        "Inventario</b></font></para>",
      s"<para>Fecha de Generación: $generatedAt</para>",
      s"<para>Resumen: Se analizaron $nSeries combinaciones " +
        s"SKU/Tienda. <b>$nReorder</b> requieren un pedido de " +
        "reabastecimiento.</para>",
      "<para>MAPE Promedio Global: <b>" +
        f"$meanMape%.2f" + "%</b></para>")
    val body = rows.flatMap { r =>
      "<hr/>" +: Seq("Para_Header", "Para_Pedido", "Para_Logistica",
        "Para_Precision")
        .map(c => s"<para>${r.getAs[String](c)}</para>")
    }
    (header ++ body).mkString("\n")
  }

  /** A6 (round-15) — the plot sink: the reference's
    * `m.plot(forecast); plt.show()` (ref: limpieza_de_datos.py:49-50)
    * re-expressed as a DEPENDENCY-FREE deterministic SVG render —
    * history actuals as points, the forecast as a polyline (the two
    * marks Prophet's plot draws), axes with 5 value ticks and
    * first/last category labels. Driver-side like the reference's
    * matplotlib call (a plot IS a driver artifact); the collect is
    * bounded by `limit`. All coordinates format through Locale.ROOT
    * at 2 dp, so the same frame always renders byte-identical SVG.
    */
  def renderForecastSvg(df: DataFrame, ds: String, y: String,
      yhat: String, width: Int = 640, height: Int = 320,
      limit: Int = 2000): String = {
    val rows = df
      .select(col(ds).cast("string").as("__ds"),
        col(y).cast("double").as("__y"),
        col(yhat).cast("double").as("__yh"))
      .orderBy(col("__ds")).limit(limit).collect()
    require(rows.nonEmpty, "renderForecastSvg: empty series")
    def optD(r: org.apache.spark.sql.Row, c: String): Option[Double] =
      if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getDouble(r.fieldIndex(c)))
    val vals = rows.flatMap(r => optD(r, "__y") ++ optD(r, "__yh"))
    require(vals.nonEmpty, "renderForecastSvg: no numeric values")
    val pad = math.max((vals.max - vals.min) * 0.05, 1e-9)
    val lo = vals.min - pad
    val hi = vals.max + pad
    val (mL, mR, mT, mB) = (50, 10, 10, 30)
    val iw = width - mL - mR
    val ih = height - mT - mB
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f",
        java.lang.Double.valueOf(v))
    def xAt(i: Int): Double =
      if (rows.length == 1) mL + iw / 2.0
      else mL + i.toDouble * iw / (rows.length - 1)
    def yAt(v: Double): Double = mT + (hi - v) / (hi - lo) * ih
    val line = rows.iterator.zipWithIndex
      .flatMap { case (r, i) => optD(r, "__yh").map(v =>
        s"${fmt(xAt(i))},${fmt(yAt(v))}") }
      .mkString(" ")
    val dots = rows.iterator.zipWithIndex
      .flatMap { case (r, i) => optD(r, "__y").map(v =>
        s"""<circle cx="${fmt(xAt(i))}" cy="${fmt(yAt(v))}" r="2" """ +
          """fill="black"/>""") }
      .mkString("\n")
    val ticks = (0 to 4).map { t =>
      val v = lo + (hi - lo) * t / 4.0
      val yy = fmt(yAt(v))
      s"""<line x1="$mL" y1="$yy" x2="${width - mR}" y2="$yy" """ +
        s"""stroke="#ddd"/><text x="4" y="$yy" font-size="10">""" +
        s"${fmt(v)}</text>"
    }.mkString("\n")
    val xLabels =
      s"""<text x="$mL" y="${height - 8}" font-size="10">""" +
        s"${rows.head.getString(0)}</text>\n" +
        s"""<text x="${width - mR}" y="${height - 8}" """ +
        s"""font-size="10" text-anchor="end">""" +
        s"${rows.last.getString(0)}</text>"
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""" + "\n" +
      ticks + "\n" +
      s"""<polyline points="$line" fill="none" stroke="#1f77b4" """ +
      """stroke-width="1.5"/>""" + "\n" +
      dots + "\n" + xLabels + "\n</svg>"
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
