package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Container-format sniffing for text payloads — the cheap structural
  * triage a web-scale ingest runs before routing documents to
  * format-specific extractors (JSON records vs XML/HTML vs CSV dumps vs
  * markdown vs prose want different cleaners, and mis-routed structure is
  * a classic source of boilerplate leakage into training text). Rules are
  * delimiter-anchored and ordered (json → xml → markdown → csv → plain),
  * evaluated in ONE codegen'd pass over the head/first-two-lines of each
  * payload — no parsing, no row explosion.
  *
  * The board query wraps the fixture corpus deterministically (doc_id % 5
  * picks the container, synthesized identically in both engines — the
  * `mojibake_scan` discipline) so the sniffer's recovery of the wrapper is
  * self-validating end to end.
  */
object FormatSniff {

  private def commas(c: Column): Column =
    (length(c) - length(regexp_replace(c, ",", ""))).cast("int")

  /** Per-row format classification of `textCol`: json / xml / markdown /
    * csv / plain in column `fmt`. */
  def sniff(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = trim(col(textCol))
    val first = substring_index(t, "\n", 1)
    val second = element_at(split(t, "\n"), 2)
    val isJson = (t.startsWith("{") && t.endsWith("}")) ||
      (t.startsWith("[") && t.endsWith("]"))
    val isXml = t.startsWith("<")
    val isMd = t.startsWith("#") || t.contains("\n#")
    val isCsv = t.contains("\n") && (commas(first) >= 2) &&
      (commas(second) === commas(first))
    df.select(col(idCol),
      when(isJson, "json").when(isXml, "xml").when(isMd, "markdown")
        .when(isCsv, "csv").otherwise("plain").as("fmt"))
  }

  /** Deterministic container wrap by id % 5 (0 json, 1 xml, 2 csv,
    * 3 markdown, 4 plain) — the fixture synthesis for the board query.
    * Quote/angle characters are stripped from embedded text so the wrap is
    * well-formed without an escaping pass (mirrored in SQL). */
  def withWrapped(df: DataFrame, idCol: String, textCol: String,
      langCol: String, lenCol: String): DataFrame = {
    val id = col(idCol).cast("string")
    val safe = regexp_replace(col(textCol), "[\"<>]", "")
    val m = col(idCol) % 5
    df.withColumn("raw",
      when(m === 0, concat(lit("{\"id\": "), id, lit(", \"text\": \""), safe, lit("\"}")))
        .when(m === 1, concat(lit("<doc id=\""), id, lit("\"><body>"), safe,
          lit("</body></doc>")))
        .when(m === 2, concat(lit("id,lang,n\n"), id, lit(","), col(langCol),
          lit(","), col(lenCol).cast("string")))
        .when(m === 3, concat(lit("# doc "), id, lit("\n\n"), col(textCol)))
        .otherwise(col(textCol)))
  }

  /** DuckDB mirror of [[withWrapped]] |> [[sniff]] over `tbl`. */
  def wrappedSniffSql(tbl: String, idCol: String, textCol: String,
      langCol: String, lenCol: String): String =
    s"""WITH wrapped AS (SELECT $idCol,
           CASE CAST($idCol % 5 AS INT)
             WHEN 0 THEN '{"id": ' || CAST($idCol AS VARCHAR) || ', "text": "'
               || regexp_replace($textCol, '["<>]', '', 'g') || '"}'
             WHEN 1 THEN '<doc id="' || CAST($idCol AS VARCHAR) || '"><body>'
               || regexp_replace($textCol, '["<>]', '', 'g') || '</body></doc>'
             WHEN 2 THEN 'id,lang,n' || chr(10) || CAST($idCol AS VARCHAR)
               || ',' || $langCol || ',' || CAST($lenCol AS VARCHAR)
             WHEN 3 THEN '# doc ' || CAST($idCol AS VARCHAR) || chr(10) || chr(10) || $textCol
             ELSE $textCol END AS raw
         FROM $tbl),
       t0 AS (SELECT $idCol, trim(raw) AS t FROM wrapped),
       f AS (SELECT $idCol, t,
           split_part(t, chr(10), 1) AS l1, split_part(t, chr(10), 2) AS l2
         FROM t0),
       c AS (SELECT $idCol, t, l1, l2,
           CAST(length(l1) - length(replace(l1, ',', '')) AS INT) AS c1,
           CAST(length(l2) - length(replace(l2, ',', '')) AS INT) AS c2
         FROM f)
       SELECT $idCol,
         CASE WHEN (starts_with(t, '{') AND t LIKE '%}')
                OR (starts_with(t, '[') AND t LIKE '%]') THEN 'json'
              WHEN starts_with(t, '<') THEN 'xml'
              WHEN starts_with(t, '#') OR position(chr(10) || '#' IN t) > 0 THEN 'markdown'
              WHEN position(chr(10) IN t) > 0 AND c1 >= 2 AND c2 = c1 THEN 'csv'
              ELSE 'plain' END AS fmt
       FROM c"""
}
