package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-comparable canonical forms.
  *
  * The driver's oracle comparer canonicalizes both result frames with a
  * pandas sort over EVERY column; an array-typed cell raises
  * `TypeError: unhashable type: numpy.ndarray` inside
  * `sort_values`, which red-flags the query regardless of values. So
  * every registered query serializes array columns to deterministic
  * strings, and its oracle mirrors the serialization with
  * `array_to_string`/`printf`. The native array-valued frames remain
  * the library API (e.g. `PipelineQueries.e2eSlice`, `Kernel.run`);
  * only the registered query layer stringifies.
  */
object Canon {

  /** Serialize every top-level array column to a comma-joined string:
    * fractional elements as `%.6f` (inputs are pre-rounded to ≤6 dp so
    * no further rounding happens at format time; `+ 0.0` normalizes
    * -0.0 on both engines), integral elements via plain string cast.
    * DuckDB mirror: `array_to_string(list_transform(a, x ->
    * printf('%.6f', x + 0.0)), ',')` / `array_to_string(a, ',')`.
    */
  def stringifyArrays(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case ArrayType(DoubleType | FloatType, _) =>
          expr(s"""array_join(transform(`${f.name}`,
                   x -> format_string('%.6f', x + 0.0D)), ',')""")
            .as(f.name)
        case ArrayType(_, _) =>
          expr(s"array_join(transform(`${f.name}`, x -> CAST(x AS STRING)), ',')")
            .as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
