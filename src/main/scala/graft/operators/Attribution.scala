package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style attribution over the event stream: which touch gets
  * credit for a conversion. Built ON the [[AsOfJoin]] union+window plan —
  * attribution IS an as-of join (latest touch at-or-before the conversion)
  * plus a lookback gate, so the one-keyed-shuffle cost model carries over
  * unchanged; no range join, no per-user sort beyond the as-of's own.
  */
object Attribution {

  /** Last-touch attribution: every `convType` event credits the same user's
    * most recent OTHER event within `lookbackSec`; conversions with no
    * in-window touch credit the "direct" channel. Returns per-channel
    * conversion counts and share.
    *
    * Tie-breaks are total: touches tied on (user, ts) resolve to the max
    * `idCol` (the as-of's own convention), so the credit assignment — and
    * the aggregate — is deterministic.
    */
  def lastTouch(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, convType: String,
      lookbackSec: Long): DataFrame = {
    val conv = df.where(col(typeCol) === convType)
      .select(col(userCol), col(tsCol), col(idCol).as("conv_id"))
    val touch = df.where(col(typeCol) =!= convType)
      .select(col(userCol), col(tsCol), col(typeCol).as("touch_type"),
        col(idCol).as("touch_id"), unix_millis(col(tsCol)).as("touch_ms"))
    val joined = AsOfJoin.leftAsOf(conv, touch, userCol, tsCol,
      Seq("touch_type", "touch_id", "touch_ms"), "touch_id")
    val channel = when(
      col("right_touch_ms").isNotNull &&
        unix_millis(col(tsCol)) - col("right_touch_ms") <= lookbackSec * 1000L,
      col("right_touch_type")).otherwise("direct")
    val perChannel = joined
      .select(channel.as("channel"))
      .groupBy("channel").agg(count(lit(1)).as("n_conv"))
    // share over the ≤|types|+1-row channel relation — the window is bounded
    val wAll = Window.partitionBy()
    perChannel
      .select(col("channel"), col("n_conv"),
        round(col("n_conv").cast("double") /
          sum("n_conv").over(wAll).cast("double"), 4).as("share"))
      .orderBy("channel")
  }

  /** DuckDB mirror of [[lastTouch]] — native ASOF LEFT JOIN over the
    * (user, ts)-deduped touch stream, same lookback gate and tie-break.
    */
  def lastTouchSql(tbl: String, userCol: String, tsCol: String,
      typeCol: String, idCol: String, convType: String,
      lookbackSec: Long): String =
    s"""WITH conv AS (SELECT $userCol, $tsCol, $idCol AS conv_id FROM $tbl
           WHERE $typeCol = '$convType'),
       t0 AS (SELECT $userCol, $tsCol, $typeCol AS touch_type,
                $idCol AS touch_id, epoch_ms($tsCol) AS touch_ms
              FROM $tbl WHERE $typeCol <> '$convType'),
       t AS (SELECT * FROM (
               SELECT t0.*, row_number() OVER (PARTITION BY $userCol, $tsCol
                 ORDER BY touch_id DESC) AS rn FROM t0) WHERE rn = 1),
       j AS (SELECT conv.conv_id, epoch_ms(conv.$tsCol) AS conv_ms,
               t.touch_type, t.touch_ms
             FROM conv ASOF LEFT JOIN t
               ON conv.$userCol = t.$userCol AND conv.$tsCol >= t.$tsCol),
       ch AS (SELECT CASE WHEN touch_ms IS NOT NULL
                AND conv_ms - touch_ms <= ${lookbackSec * 1000L}
                THEN touch_type ELSE 'direct' END AS channel FROM j),
       pc AS (SELECT channel, COUNT(*) AS n_conv FROM ch GROUP BY channel)
       SELECT channel, n_conv,
         round(CAST(n_conv AS DOUBLE) / CAST(SUM(n_conv) OVER () AS DOUBLE), 4)
           AS share
       FROM pc ORDER BY channel"""
}
