package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational reshaping: pivot (long → wide) and unpivot/melt (wide →
  * long), the report-shaping pair every analytics surface ends up needing.
  *
  * Scale notes: a pivot with EXPLICIT values is a single map-side-
  * combinable aggregation (one shuffle on the key, output one row per key ×
  * a fixed column set) — the dangerous form is `pivot(col)` WITHOUT values,
  * which runs an extra distinct job over the corpus to discover the column
  * set and caps it at `spark.sql.pivotMaxValues`; these helpers require the
  * values up front. Unpivot is a generator (no shuffle at all).
  */
object Reshape {

  /** One row per key; one BIGINT count column per pivot value (0 when the
    * (key, value) combination never occurs — `pivot` yields null there).
    */
  def pivotCounts(df: DataFrame, keyCol: String, pivotCol: String,
      values: Seq[String]): DataFrame = {
    values.foreach(OracleSql.ident) // values become output column names
    df.groupBy(col(keyCol))
      .pivot(pivotCol, values)
      .agg(count(lit(1)))
      .select(col(keyCol) +:
        values.map(v => coalesce(col(v), lit(0L)).as(v)): _*)
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[pivotCounts]] (conditional aggregation form). */
  def pivotCountsSql(tbl: String, keyCol: String, pivotCol: String,
      values: Seq[String]): String = {
    val cols = values
      .map(v => s"CAST(SUM(CASE WHEN $pivotCol = ${OracleSql.lit(v)} THEN 1 ELSE 0 END) AS BIGINT) AS ${OracleSql.ident(v)}")
      .mkString(",\n           ")
    s"""SELECT $keyCol,
           $cols
         FROM $tbl GROUP BY $keyCol ORDER BY $keyCol"""
  }

  /** Melt `wide`'s value columns back to (key, variable, value) long form —
    * zero-shuffle (a generator over each row).
    */
  def meltCounts(wide: DataFrame, keyCol: String, values: Seq[String],
      varName: String, valName: String): DataFrame =
    wide.unpivot(Array(col(keyCol)), values.map(col).toArray, varName, valName)
      .orderBy(keyCol, varName)
}
