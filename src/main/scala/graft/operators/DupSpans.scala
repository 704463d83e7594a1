package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicate-substring span detection (the Lee et al. 2021
  * "Deduplicating Training Data Makes Language Models Better" signal):
  * for each document, the MAXIMAL token spans whose every k-token window
  * occurs at least twice in the corpus — i.e. verbatim substrings of
  * length ≥ k that also appear elsewhere (or again in the same document).
  * MinHash sees whole-document overlap and winnowing fingerprints sample
  * it; this operator reports the exact duplicated regions with token
  * offsets, the input to substring-level dedup (cut the span, keep the
  * rest of the document).
  *
  * Relational decomposition (nothing is quadratic, nothing driver-side):
  *
  *   1. one pass per row emits the k-gram window array
  *      ([[graft.functions.MinHashExpr.shinglesArray]] — the same one-pass
  *      expression the MinHash/decontam family uses; a suffix-array build,
  *      the paper's in-memory structure, has no distributed analogue at
  *      100 TB while the window relation shuffles linearly);
  *   2. windows are digested to fixed-width md5 in a codegen'd projection
  *      (shuffle volume ∝ 32 B per window, not the raw gram text);
  *   3. duplicated digests come from a `groupBy(g).count` (map-side partial
  *      combine: the shuffle carries one partial count per digest per task,
  *      not the window rows) and a LEFT SEMI join marks duplicated windows.
  *      A `count() OVER (PARTITION BY g)` window computes the same thing in
  *      one shuffle, but WindowExec must SORT each partition and buffer each
  *      digest group whole — a hot digest (boilerplate k-grams repeated
  *      millions of times) is one unsplittable group that spills and scales
  *      superlinearly, and AQE cannot split a window partition the way it
  *      splits a skewed join;
  *   4. per-document gaps-and-islands (pos − row_number) merges runs of
  *      consecutive duplicated window starts into maximal spans — ONE
  *      shuffle on doc id.
  *
  * A document shorter than k tokens contributes its whole text as a single
  * window (the [[Dedup.shingles]] convention, mirrored by the oracle), so
  * exact short-document duplicates surface as whole-document spans.
  */
object DupSpans {

  /** One row per maximal duplicated span: (doc, span_start, span_end)
    * in 0-based inclusive token offsets, with the window count and the
    * span's token length.
    */
  def dupSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8
  ): DataFrame = {
    require(k > 0, s"dupSpans: need k > 0, got $k")
    val id = col(idCol)
    // n_tok rides along (8 bytes/row) so a sub-k document's whole-text
    // window clamps its span to the real document end.
    // Dedup.parallelize: the shingle+md5 scan is the CPU stage — a
    // single-row-group input would otherwise run it on one task
    // round-12 (guide §2.3, narrower types): the digest is unhex(md5) —
    // 16 raw bytes instead of the 32-char hex string. md5-hex ↔ bytes is
    // a bijection, so every group/join on g is row-identical; g never
    // reaches the output. Both g-keyed shuffles (the dup-count partial
    // aggregate and the semi-join probe side) halve their key bytes.
    val windows = Dedup.parallelize(df).select(
        id,
        TextAnalysis.tokenCount(col(textCol)).as("_ds_n"),
        posexplode(graft.functions.MinHashExpr.shinglesArray(col(textCol), k))
          .as(Seq("pos", "gram")))
      .select(id, col("_ds_n"), col("pos").cast("long").as("pos"),
        unhex(md5(col("gram"))).as("g"))
    val dupG = windows.groupBy("g").agg(count(lit(1)).as("_ds_c"))
      .where(col("_ds_c") >= 2).select("g")
    val dup = windows.join(dupG, Seq("g"), "left_semi")
    val island = dup
      .withColumn("_ds_rn",
        row_number().over(Window.partitionBy(id).orderBy("pos")).cast("long"))
      .withColumn("_ds_grp", col("pos") - col("_ds_rn"))
    island
      .groupBy(id, col("_ds_grp"))
      .agg(
        min(col("pos")).as("span_start"),
        least(max(col("pos")) + lit(k.toLong - 1), max(col("_ds_n")) - 1)
          .as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(id, col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("n_tokens"),
        col("n_windows"))
  }

  /** The duplicated-span apply step: each document with its duplicated
    * spans CUT OUT (the Lee et al. transformation — drop the repeated
    * substring, keep the unique remainder). Documents stripped to nothing
    * (every token inside a span, e.g. exact duplicates) drop out of the
    * result entirely; documents with no duplicated span pass through
    * whole.
    *
    * Shape: spans explode into their (bounded-by-doc-length) token
    * positions, an anti-join on (doc, pos) keeps the untouched tokens, and
    * the reassembly sorts by carried position inside one per-doc aggregate
    * (the [[TextAnalysis.pruneVocab]] convention — no assumption that
    * collect_list preserves arrival order). Two shuffles on doc id beyond
    * the span detection itself.
    */
  def stripDupSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8
  ): DataFrame = {
    val id = col(idCol)
    val dupPos = dupSpans(df, idCol, textCol, k)
      .select(id, explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    val toks = Dedup.parallelize(df).select(id,
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("pos", col("pos").cast("long"))
    toks.join(dupPos, Seq(idCol, "pos"), "left_anti")
      .groupBy(id)
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).as("kept_text"),
        count(lit(1)).as("n_kept"))
      .select(id, substring(md5(col("kept_text")), 1, 16).as("kept_fp"),
        col("n_kept"))
  }

  /** Shared oracle CTE chain ending at `sp($idCol, span_start, span_end,
    * n_windows)` — the naive single-engine window-function form of
    * [[dupSpans]].
    */
  private def spanCtes(tbl: String, idCol: String, textCol: String, k: Int): String = {
    val gramExpr = {
      val parts = (0 until k).map(d => s"ws[i+$d]").mkString("||' '||")
      s"""CASE WHEN len(ws) >= $k
            THEN list_transform(range(1, len(ws)-${k - 2}), i -> $parts)
            ELSE [array_to_string(ws, ' ')] END"""
    }
    s"""w AS (SELECT $idCol, string_split_regex(trim($textCol),'\\s+') AS ws FROM $tbl),
       gr AS (SELECT $idCol, CAST(len(ws) AS BIGINT) AS n_tok, $gramExpr AS grams FROM w),
       win AS (SELECT $idCol, n_tok, CAST(generate_subscripts(grams, 1) - 1 AS BIGINT) AS pos,
                      md5(unnest(grams)) AS g FROM gr),
       dup AS (SELECT * FROM (SELECT $idCol, n_tok, pos,
                      COUNT(*) OVER (PARTITION BY g) AS c FROM win) WHERE c >= 2),
       isl AS (SELECT $idCol, n_tok, pos,
                      pos - row_number() OVER (PARTITION BY $idCol ORDER BY pos) AS grp
               FROM dup),
       sp AS (SELECT $idCol, MIN(pos) AS span_start,
                     least(MAX(pos) + ${k - 1}, MAX(n_tok) - 1) AS span_end,
                     COUNT(*) AS n_windows
              FROM isl GROUP BY $idCol, grp)"""
  }

  /** DuckDB SQL mirror of [[dupSpans]] over table `tbl(idCol, textCol)` —
    * the naive single-engine form (unnest + window functions), same result.
    */
  def dupSpansSql(tbl: String, idCol: String, textCol: String, k: Int): String =
    s"""WITH ${spanCtes(tbl, idCol, textCol, k)}
       SELECT $idCol, span_start, span_end,
              span_end - span_start + 1 AS n_tokens, n_windows
       FROM sp ORDER BY $idCol, span_start"""

  /** DuckDB SQL mirror of [[stripDupSpans]]. */
  def stripDupSpansSql(tbl: String, idCol: String, textCol: String, k: Int): String =
    s"""WITH ${spanCtes(tbl, idCol, textCol, k)},
       dp AS (SELECT $idCol, unnest(range(span_start, span_end + 1)) AS pos FROM sp),
       t AS (SELECT $idCol, CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS pos,
                    unnest(ws) AS tok FROM w),
       kept AS (SELECT t.$idCol, t.pos, t.tok FROM t
                ANTI JOIN dp ON t.$idCol = dp.$idCol AND t.pos = dp.pos)
       SELECT $idCol, md5(string_agg(tok, ' ' ORDER BY pos))[:16] AS kept_fp,
              COUNT(*) AS n_kept
       FROM kept GROUP BY $idCol ORDER BY $idCol"""
}
