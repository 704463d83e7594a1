package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal — the RefinedWeb / MassiveText
  * "repeated-line" cleanup generalized to token streams without line
  * structure: a span of text that recurs across `minDocs` or more DISTINCT
  * documents (nav bars, license headers, scraper artifacts) is stripped
  * from every document that carries it.
  *
  * Segmentation is content-defined ([[Chunking.cdcChunks]]), not
  * fixed-width: boundaries are a pure function of local content, so the
  * same boilerplate span chunks identically no matter what offset it sits
  * at in each document — fixed 8-token segments would only match when two
  * copies happen to align on a segment boundary. This is exactly the
  * alignment-robustness CDC exists for.
  *
  * Plan shape: chunk extents (one keyed window), chunk text re-sliced from
  * the token array (id-keyed join, co-partitioned with the window's
  * output), then ONE corpus-wide aggregation on the chunk digest
  * (count-distinct docs, ~n/modulus rows — the heavy token relation never
  * shuffles), a digest-keyed flag join, and a per-doc reassembly
  * aggregation. At 100 TB the corpus aggregation and flag join key on the
  * 16-hex-char md5 prefix, not the chunk text, keeping shuffle rows
  * fixed-width; the boilerplate side is heavy-hitter-bounded (a chunk must
  * appear in >= minDocs docs) so the flag join's build side stays small
  * relative to the corpus.
  *
  * Output: (id, n_chunks, n_removed, kept_tokens, clean_fp) where clean_fp
  * is the md5 of the surviving chunks rejoined in document order — docs
  * with n_removed = 0 reproduce the md5 of their whitespace-normalized
  * text (spec-pinned), so the reassembly is provably lossless.
  */
object Boilerplate {

  def stripBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      modulus: Int = 16,
      minDocs: Int = 3
  ): DataFrame = {
    require(minDocs >= 2, s"stripBoilerplate: minDocs must be >= 2, got $minDocs")
    val id = col(idCol)
    val chunks = Chunking.cdcChunks(df, idCol, textCol, k, modulus)
    val toks = df.select(id, TextAnalysis.tokens(col(textCol)).as("_bp_ws"))
    val withText = chunks.join(toks, idCol)
      .select(id, col("chunk_idx"), col("n_tokens"),
        array_join(
          slice(col("_bp_ws"), (col("start_pos") + 1).cast("int"), col("n_tokens").cast("int")),
          " ").as("_bp_text"))
      .withColumn("_bp_digest", substring(md5(col("_bp_text")), 1, 16))
    val boiler = withText
      .groupBy("_bp_digest")
      .agg(countDistinct(id).as("_bp_nd"))
      .where(col("_bp_nd") >= minDocs)
      .select("_bp_digest")
    withText
      .join(boiler.withColumn("_bp_hit", lit(true)), Seq("_bp_digest"), "left")
      .groupBy(id)
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("_bp_hit"), 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("_bp_hit"), 0L).otherwise(col("n_tokens"))).as("kept_tokens"),
        md5(array_join(
          transform(
            array_sort(collect_list(
              when(col("_bp_hit").isNull, struct(col("chunk_idx"), col("_bp_text"))))),
            x => x.getField("_bp_text")),
          " ")).as("clean_fp"))
  }

  /** DuckDB SQL mirror of [[stripBoilerplate]] over `tbl(idCol, textCol)` —
    * extends the [[Chunking.cdcChunksSql]] CTE chain with chunk-text
    * slicing, the distinct-doc boilerplate count, and ordered reassembly.
    */
  def stripBoilerplateSql(tbl: String, idCol: String, textCol: String,
      k: Int, modulus: Int, minDocs: Int): String = {
    val gramExpr = {
      val parts = (0 until k).map(d => s"ws[i+$d]").mkString("||' '||")
      s"""CASE WHEN len(ws) >= $k
            THEN list_transform(range(1, len(ws)-${k - 2}), i -> $parts)
            ELSE [array_to_string(ws, ' ')] END"""
    }
    s"""WITH w AS (SELECT $idCol, string_split_regex(trim($textCol),'\\s+') AS ws FROM $tbl),
       gr AS (SELECT $idCol, CAST(len(ws) AS BIGINT) AS n, $gramExpr AS grams FROM w),
       win AS (SELECT $idCol, n, CAST(generate_subscripts(grams, 1) - 1 AS BIGINT) AS pos,
                      unnest(grams) AS gram FROM gr),
       b AS (SELECT $idCol, n, pos FROM win
             WHERE pos > 0 AND CAST('0x'||substr(md5(gram),1,8) AS BIGINT) % $modulus = 0),
       st AS (SELECT $idCol, n, CAST(0 AS BIGINT) AS pos FROM gr
              UNION ALL SELECT $idCol, n, pos FROM b),
       ch AS (SELECT $idCol,
                row_number() OVER (PARTITION BY $idCol ORDER BY pos) - 1 AS chunk_idx,
                pos AS start_pos,
                COALESCE(lead(pos) OVER (PARTITION BY $idCol ORDER BY pos) - 1, n - 1) AS end_pos
              FROM st),
       ct AS (SELECT ch.$idCol, chunk_idx,
                end_pos - start_pos + 1 AS n_tokens,
                array_to_string(w.ws[start_pos + 1 : end_pos + 1], ' ') AS ctext
              FROM ch JOIN w ON ch.$idCol = w.$idCol),
       dg AS (SELECT *, substr(md5(ctext), 1, 16) AS digest FROM ct),
       boiler AS (SELECT digest FROM dg
                  GROUP BY digest HAVING COUNT(DISTINCT $idCol) >= $minDocs),
       fl AS (SELECT dg.*, boiler.digest IS NOT NULL AS hit
              FROM dg LEFT JOIN boiler ON dg.digest = boiler.digest)
       SELECT $idCol, COUNT(*) AS n_chunks,
         CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         CAST(SUM(CASE WHEN hit THEN 0 ELSE n_tokens END) AS BIGINT) AS kept_tokens,
         md5(COALESCE(string_agg(CASE WHEN NOT hit THEN ctext END, ' ' ORDER BY chunk_idx), ''))
           AS clean_fp
       FROM fl GROUP BY $idCol ORDER BY $idCol"""
  }
}
