package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling (the ANALYZE-style data-quality report): per column,
  * row/null counts, EXACT distinct cardinality, and min/max — the summary a
  * curator reads before trusting a new drop, and the statistics a cost
  * model wants per table.
  *
  * Scale shape: ONE full-width aggregation scan computes every column's
  * null count and min/max (all partial, map-side combined); each exact
  * cardinality is its own single-column distinct-then-count subtree — the
  * subtrees are independent, so Spark schedules their stages CONCURRENTLY
  * inside the one action, and each shuffle carries only its own column.
  * Variable-width (string) columns are digested to a 16-byte binary md5
  * before the distinct so the shuffle width is capped however wide the
  * values are; fixed-width columns ship raw (digesting a long would
  * QUADRUPLE its shuffle bytes — measured: an all-columns explode+digest
  * variant was 2× slower at 10× data than this shape). 64-bit hashes are
  * deliberately NOT used: at 10⁹ values a birthday collision is ~3%
  * likely and would silently undercount; 128-bit md5 is collision-free at
  * any realistic corpus size.
  *
  * Doubles are printed with `%.6f` on BOTH engines (C-style printf), never
  * engine-default double→string formatting, which diverges in scientific-
  * notation edge cases.
  */
object Profile {

  /** `cols`: (output name, expression, isDouble). String-typed expressions
    * are detected from the analyzed schema for the digest decision.
    */
  def stats(df: DataFrame, cols: Seq[(String, Column, Boolean)]): DataFrame = {
    def fmt(v: Column, isDouble: Boolean): Column =
      if (isDouble) format_string("%.6f", v) else v.cast("string")
    // pass 1: one scan, all per-column counts/min/max in a single agg row
    val base = df.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap { case (n, c, d) =>
        Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"_null_$n"),
          fmt(min(c), d).as(s"_min_$n"), fmt(max(c), d).as(s"_max_$n"))
      }: _*)
    val rows = base.select(explode(array(cols.map { case (n, _, _) =>
        struct(lit(n).as("column"), col("n_rows"),
          col(s"_null_$n").as("n_null"),
          col(s"_min_$n").as("vmin"), col(s"_max_$n").as("vmax"))
      }: _*)).as("r"))
      .select(col("r.column").as("column"), col("r.n_rows").as("n_rows"),
        col("r.n_null").as("n_null"), col("r.vmin").as("vmin"),
        col("r.vmax").as("vmax"))
    // per-column distinct subtrees (independent stages, digest strings only)
    val dist = cols.map { case (n, c, _) =>
      val probe = df.select(c.as("_pf_v")).where(col("_pf_v").isNotNull)
      val keyed = probe.schema.head.dataType match {
        case org.apache.spark.sql.types.StringType =>
          probe.select(unhex(md5(col("_pf_v"))).as("_pf_k"))
        case _ => probe.select(col("_pf_v").as("_pf_k"))
      }
      keyed.distinct().agg(count(lit(1)).as("n_distinct"))
        .select(lit(n).as("column"), col("n_distinct"))
    }.reduce(_ unionAll _)
    rows.join(broadcast(dist), Seq("column"))
      .select(col("column"), col("n_rows"), col("n_null"), col("n_distinct"),
        col("vmin"), col("vmax"))
      .orderBy("column")
  }

  /** DuckDB mirror of [[stats]]: `cols` as (name, sqlExpr, isDouble). The
    * oracle counts distinct VALUES directly — the same number the digest
    * path produces (md5 is injective in practice).
    */
  def statsSql(tbl: String, cols: Seq[(String, String, Boolean)]): String =
    cols.map { case (name, e, isDouble) =>
      def fmt(v: String): String =
        if (isDouble) s"printf('%.6f', $v)" else s"CAST($v AS VARCHAR)"
      s"""SELECT '$name' AS "column", COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN ($e) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
          CAST(COUNT(DISTINCT ($e)) AS BIGINT) AS n_distinct,
          ${fmt(s"MIN($e)")} AS vmin, ${fmt(s"MAX($e)")} AS vmax
        FROM $tbl"""
    }.mkString("\n         UNION ALL\n         ") +
      "\n         ORDER BY \"column\""
}
