package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) merge: fold an update batch into a
  * versioned snapshot, closing superseded rows instead of overwriting them —
  * the upsert-with-history primitive behind incremental corpus refreshes
  * (recrawls, re-annotation passes, metadata fixups).
  *
  * Scale shape: ONE id-keyed broadcast join between the snapshot and the
  * update batch (batches are deltas — orders of magnitude under the corpus —
  * so the snapshot never shuffles), then ONE generator pass emits every
  * version row: carried rows expand to one struct, superseded rows to two
  * (closed v0 + opened v1). A union of per-leg filters would rescan the
  * snapshot once per leg, and the obvious `updates ANTI JOIN snapshot` for
  * brand-new ids would shuffle the whole corpus (a left-side broadcast is
  * unsupported for left-anti) — instead the anti-join runs against the
  * MATCHED id set from the same broadcast join, which is bounded by the
  * batch size and therefore broadcast-able. Net: two snapshot scans, zero
  * corpus shuffles. Change detection compares content fingerprints (16-char
  * md5 prefix), not full payloads, so the join carries fixed-width columns
  * no matter how wide the documents are.
  */
object Scd {

  /** Merge `updates` (idCol, textCol) into snapshot `base` (same columns,
    * all rows `valid_from = fromBatch - 1`, open). Returns one row per
    * version: (id, fp, version, valid_from, valid_to) where `valid_to` is
    * null for current rows. An update row whose fingerprint equals the
    * current version is a no-op (idempotent re-delivery).
    */
  def merge2(base: DataFrame, updates: DataFrame, idCol: String,
      textCol: String, fromBatch: Int = 1): DataFrame = {
    val fp = substring(md5(col(textCol)), 1, 16)
    val cur = base.select(col(idCol).as("id"), fp.as("fp"))
    val upd = broadcast(updates.select(col(idCol).as("id"), fp.as("ufp")))
    val j = cur.join(upd, Seq("id"), "left")

    val prev = lit(fromBatch - 1L)
    val batch = lit(fromBatch.toLong)
    val nul = lit(null).cast("long")
    def v(f: Column, ver: Long, from: Column, to: Column) =
      struct(f.as("fp"), lit(ver).as("version"),
        from.as("valid_from"), to.as("valid_to"))

    // one generator pass over the joined snapshot: carried → 1 row,
    // superseded → closed v0 + opened v1
    val legs = j.select(col("id"), explode(
        when(col("ufp").isNull || col("ufp") === col("fp"),
          array(v(col("fp"), 0L, prev, nul)))
        .otherwise(array(v(col("fp"), 0L, prev, batch),
          v(col("ufp"), 1L, batch, nul)))).as("_v"))
      .select(col("id"), col("_v.fp").as("fp"), col("_v.version").as("version"),
        col("_v.valid_from").as("valid_from"), col("_v.valid_to").as("valid_to"))

    // brand-new ids: batch minus MATCHED ids (bounded by the batch size, so
    // the anti-join's build side broadcasts — `updates ANTI base` would not)
    val matched = j.where(col("ufp").isNotNull).select(col("id"))
    val inserted = updates.select(col(idCol).as("id"), fp.as("fp"))
      .join(broadcast(matched), Seq("id"), "left_anti")
      .select(col("id"), col("fp"), lit(0L).as("version"),
        batch.as("valid_from"), nul.as("valid_to"))

    legs.unionAll(inserted).orderBy(col("id"), col("version"))
  }

  /** DuckDB mirror of [[merge2]] over CTEs `scd_base(id, fp)` and
    * `scd_upd(id, ufp)` that the caller prepends.
    */
  def merge2Sql(fromBatch: Int = 1): String = {
    val prev = fromBatch - 1
    s"""j AS (SELECT b.id, b.fp, u.ufp FROM scd_base b LEFT JOIN scd_upd u USING (id)),
       merged AS (
         SELECT id, fp, CAST(0 AS BIGINT) AS version,
             CAST($prev AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
           FROM j WHERE ufp IS NULL OR ufp = fp
         UNION ALL
         SELECT id, fp, CAST(0 AS BIGINT), CAST($prev AS BIGINT), CAST($fromBatch AS BIGINT)
           FROM j WHERE ufp IS NOT NULL AND ufp <> fp
         UNION ALL
         SELECT id, ufp, CAST(1 AS BIGINT), CAST($fromBatch AS BIGINT), CAST(NULL AS BIGINT)
           FROM j WHERE ufp IS NOT NULL AND ufp <> fp
         UNION ALL
         SELECT u.id, u.ufp, CAST(0 AS BIGINT), CAST($fromBatch AS BIGINT), CAST(NULL AS BIGINT)
           FROM scd_upd u WHERE NOT EXISTS (SELECT 1 FROM scd_base b WHERE b.id = u.id))
       SELECT id, fp, version, valid_from, valid_to FROM merged
       ORDER BY id, version"""
  }
}
