package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Filters + derived columns (SURVEY §2 rows C1-C3, B5-B8). */
object Clean {

  /** C1 — drop returns/credit rows (ref: PRACTICA3.py:194). Applied
    * before the group shuffle so the predicate pushes to the scan.
    */
  def nonNegative(df: DataFrame, col: String): DataFrame =
    df.filter(df(col) >= 0)

  /** C3 — dropna on a subset (ref: generador.py:80). */
  def dropNa(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** B5 — derived boolean (ref: generador.py:72). */
  def needReorder(qty: Column): Column = qty > 0

  /** B7 — round + integer cast, floored at 0
    * (ref: generador.py:83-84; scalar form PRACTICA3.py:78-80).
    * numpy/pandas round to even on .5 ties (banker's), so `bround`,
    * NOT Spark's HALF_UP `round` (SURVEY F3).
    */
  def roundToInt(c: Column): Column =
    bround(greatest(c, lit(0.0))).cast("int")

  /** B8 — struct-producing row function + star-expand: compute one
    * struct column, then expand its fields — never a positional concat
    * (pandas `concat(axis=1)`, ref: generador.py:67-69, has no stable
    * Spark equivalent because rows carry no index).
    */
  def expandStruct(df: DataFrame, structCol: Column,
      as: String): DataFrame =
    df.withColumn(as, structCol).select(col("*"), col(s"$as.*")).drop(as)

  /** F4 — parse a stringified double array `"[1.0, 2.0]"`; malformed →
    * empty array (ref: generador.py:48-64). from_json yields null on
    * malformed input; coalesce supplies the reference's `([], 0.0, 0)`
    * fallback.
    */
  def parseDoubleArray(c: Column): Column =
    coalesce(
      from_json(c, ArrayType(org.apache.spark.sql.types.DoubleType)),
      array().cast("array<double>"))

  /** F4 — derived total + length of the parsed array
    * (ref: generador.py:58-60).
    */
  def arrayTotal(arr: Column): Column =
    coalesce(aggregate(arr, lit(0.0), (acc, x) => acc + x), lit(0.0))
  def arrayWeeks(arr: Column): Column = size(arr)
}
