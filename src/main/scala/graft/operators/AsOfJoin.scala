package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** AS-OF join: for every left row, the single right row with the LARGEST
  * right timestamp ≤ the left timestamp within the same key (the join
  * time-series/feature stores need; DuckDB ships it as `ASOF JOIN`, which is
  * exactly the generated oracle).
  *
  * Spark has no built-in as-of join, and the naive formulations explode:
  * an inequality join (`l.key = r.key AND r.ts <= l.ts` + row_number) builds
  * every (left × earlier-right) pair before pruning — O(n·m) per key — and a
  * broadcast range join only works when one side is small. This is the
  * UNION + WINDOW plan instead: tag both sides, hash-partition ONCE by key,
  * sort each partition by (ts, tag) — right rows sort BEFORE left rows at
  * equal ts, making the match inclusive — and carry the latest right row
  * forward as ONE struct with `last(ignoreNulls = true)` (a single atomic
  * carry: per-column lasts could stitch fields from DIFFERENT right rows
  * when a payload value is legitimately NULL). Cost: one shuffle + one
  * in-partition sort, linear in rows, independent of match distance. Skewed
  * keys can ride the [[Skew]] salting the same way any keyed window does.
  */
object AsOfJoin {

  /** Left as-of join. `rightPayload` columns come back as `right_<name>`,
    * NULL when no right row exists at-or-before the left row. Right rows
    * tied on (key, ts) are disambiguated by `rightTieBreak` (the LARGEST
    * wins — deterministic, and mirrors the `ORDER BY … DESC` a SQL oracle
    * can state).
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightPayload: Seq[String],
      rightTieBreak: String
  ): DataFrame =
    asOf(left, right, keyCol, tsCol, rightPayload, rightTieBreak, forward = false)

  /** FORWARD as-of: the single right row with the SMALLEST right ts ≥ the
    * left ts per key — "the user's NEXT purchase after this click" — the
    * time-reversed traversal of the same union+window plan: one keyed
    * shuffle, partition sort by ts DESC (right before left at equal ts, so
    * the match stays inclusive), latest-seen carry = nearest forward row.
    * Same (LARGEST tie-break wins) convention at equal right ts.
    */
  def leftAsOfForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightPayload: Seq[String],
      rightTieBreak: String
  ): DataFrame =
    asOf(left, right, keyCol, tsCol, rightPayload, rightTieBreak, forward = true)

  /** NEAREST as-of: per left row, whichever of the latest at-or-before /
    * earliest at-or-after right rows is closer in time (the sensor-fusion
    * alignment: "the reading nearest this sample, either side"). Exact
    * ties in distance — including a right row AT the left timestamp, which
    * both traversals see at distance 0 — resolve to the BACKWARD match, so
    * the operator degrades to plain as-of when right rows are dense.
    *
    * Plan: the same union relation as the directional traversals, ONE hash
    * shuffle on the key, TWO in-partition sorts (ts ASC and ts DESC
    * cumulative windows share the exchange), then a row-local nearer-pick.
    * `matched_dir` reports back/fwd/NULL for the audit trail.
    */
  def leftAsOfNearest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightPayload: Seq[String],
      rightTieBreak: String
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftRest = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val rStruct = StructType(
      StructField("__ts", right.schema(tsCol).dataType) +:
        rightPayload.map(c => StructField(c, right.schema(c).dataType)))
    val tbType = right.schema(rightTieBreak).dataType
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__tag"),
        lit(null).cast(tbType).as("__tb")) ++
        leftRest.map(col) :+
        lit(null).cast(rStruct).as("__r"): _*)
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__tag"),
        col(rightTieBreak).as("__tb")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(tsCol).as("__ts") +: rightPayload.map(col): _*).as("__r"): _*)
    val wB = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = taggedLeft.unionByName(taggedRight)
      .select(
        Seq(col(keyCol), col(tsCol), col("__tag")) ++
          leftRest.map(col) :+
          last(col("__r"), ignoreNulls = true).over(wB).as("__b") :+
          last(col("__r"), ignoreNulls = true).over(wF).as("__f"): _*)
      .where(col("__tag") === 1)
    val db = unix_millis(col(tsCol)) - unix_millis(col("__b").getField("__ts"))
    val df_ = unix_millis(col("__f").getField("__ts")) - unix_millis(col(tsCol))
    val pickFwd = col("__b").isNull || (col("__f").isNotNull && df_ < db)
    val chosen = when(pickFwd, col("__f")).otherwise(col("__b"))
    both.select(leftCols.map(col) ++
      rightPayload.map(c => chosen.getField(c).as(s"right_$c")) :+
      when(col("__b").isNull && col("__f").isNull, lit(null).cast("string"))
        .when(pickFwd, lit("fwd")).otherwise(lit("back")).as("matched_dir"): _*)
  }

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightPayload: Seq[String],
      rightTieBreak: String,
      forward: Boolean
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftRest = leftCols.filterNot(c => c == keyCol || c == tsCol)
    val rStruct = StructType(rightPayload.map(c => StructField(c, right.schema(c).dataType)))
    val tbType = right.schema(rightTieBreak).dataType
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__tag"),
        lit(null).cast(tbType).as("__tb")) ++
        leftRest.map(col) :+
        lit(null).cast(rStruct).as("__r"): _*)
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__tag"),
        col(rightTieBreak).as("__tb")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__r"): _*)
    // right (tag 0) sorts before left (tag 1) at equal ts ⇒ ts-inclusive;
    // tie-break ASC within (ts, right) makes last(ignoreNulls) pick the
    // MAX tie-break right row at the latest ts — folding the (key, ts)
    // dedup into this ONE sort instead of a second shuffle+window over the
    // right side (HashPartitioning(key, ts) would not satisfy the main
    // window's ClusteredDistribution(key))
    // forward = the time-reversed traversal: ts DESC carries the nearest
    // at-or-after right row; tag/tie-break order is direction-independent
    val w = Window.partitionBy(col(keyCol))
      .orderBy(if (forward) col(tsCol).desc else col(tsCol).asc,
        col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .select(
        Seq(col(keyCol), col(tsCol), col("__tag")) ++
          leftRest.map(col) :+
          last(col("__r"), ignoreNulls = true).over(w).as("__r"): _*)
      .where(col("__tag") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__r").getField(c).as(s"right_$c")): _*)
  }
}
