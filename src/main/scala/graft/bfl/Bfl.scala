package graft.bfl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BflExpressions

/** User-facing BFL API over DataFrames.
  *
  * Two execution tiers, chosen automatically:
  *   1. compiled — native Catalyst Columns (pushdown + whole-stage codegen),
  *      for the statically-typable subset ([[Compiler]]);
  *   2. interpreter fallback — exact reference semantics row-at-a-time over a
  *      JSON doc column ([[graft.functions.BflMatchExpr]]), for redact /
  *      json() / xml() / recursive descent / schema-free shapes.
  */
object Bfl {

  final case class Applied(df: DataFrame, usedCompiled: Boolean)

  /** Filter `df` with a BFL query. Macros are expanded first. `docCol`
    * names a JSON-string column holding the document for fallback queries;
    * when absent, the whole row is serialized (`to_json(struct(*))`) —
    * column-pruned away by Catalyst when the compiled path is taken.
    */
  def filter(
      df: DataFrame,
      query: String,
      macros: Map[String, String] = Map.empty,
      docCol: Option[String] = None
  ): Applied = {
    val expanded = Macros.expand(macros, query)
    try {
      val plan = Compiler.compile(df, expanded, docCol)
      // the `..` descent expression is a per-row JSON parse + walk — the
      // same cost class as the interpreter tier, so it gets the same
      // min-parallelism guard (a one-split scan otherwise runs the walk on
      // ONE task regardless of session cores). parallelize is a no-op on
      // any input with >= defaultParallelism splits, so a real corpus keeps
      // its scan pushdown untouched; only the degenerate small-file case —
      // where row-group pruning buys nothing — pays the repartition.
      val hasDescent = org.apache.spark.sql.graftbridge.ColumnBridge
        .expression(plan.pred)
        .exists {
          case _: graft.functions.BflDescentExpr    => true
          case _: graft.functions.BflDescentCmpExpr => true
          case _                                    => false
        }
      val base =
        if (hasDescent && plan.limit.isEmpty) graft.operators.Dedup.parallelize(df)
        else df
      val filtered = base.where(plan.pred)
      Applied(plan.limit.fold(filtered)(n => filtered.limit(n.toInt)), usedCompiled = true)
    } catch {
      // Unsupported shapes AND analysis failures (e.g. mixed-type array
      // equality the static typing can't reconcile) both take the exact
      // interpreter path
      case scala.util.control.NonFatal(_) =>
        // timestamp columns serialize to epoch millis in the doc view (the
        // reference's `timestamp` fields are epoch-millis int64) — ISO-8601
        // text would coerce to 0 in numeric compares. Applied recursively
        // through structs and arrays (map values are left as-is).
        import org.apache.spark.sql.types._
        def tsToMillis(c: Column, dt: DataType): Column = dt match {
          // unix_millis only accepts TimestampType; the NTZ cast preserves
          // the instant under the UTC-pinned session
          case TimestampNTZType => unix_millis(c.cast(TimestampType))
          case TimestampType    => unix_millis(c)
          case st: StructType if containsTs(st) =>
            struct(st.fields.toSeq.map(f => tsToMillis(c.getField(f.name), f.dataType).as(f.name)): _*)
          case ArrayType(et, _) if containsTs(et) => transform(c, e => tsToMillis(e, et))
          case _ => c
        }
        def containsTs(dt: DataType): Boolean = dt match {
          case TimestampType | TimestampNTZType => true
          case st: StructType                   => st.fields.exists(f => containsTs(f.dataType))
          case ArrayType(et, _)                 => containsTs(et)
          case _                                => false
        }
        val doc = docCol.map(col).getOrElse {
          val fields = df.schema.fields.map(f => tsToMillis(col(f.name), f.dataType).as(f.name))
          to_json(struct(fields.toSeq: _*))
        }
        val q = Parser.parse(expanded).fold(e => throw new IllegalArgumentException(e), identity)
        val filtered = df.where(coalesce(BflExpressions.bflMatch(doc, expanded), lit(false)))
        Applied(q.limit.fold(filtered)(n => filtered.limit(n.toInt)), usedCompiled = false)
    }
  }

  /** Filter + transform over a JSON document column: returns the docs that
    * match, with record-altering helpers (redact) applied — the exact analog
    * of the reference's query path (truth, newJson)
    * (reference: server/lib/storages/native.go:476-490).
    *
    * `backed` maps top-level doc fields to df COLUMNS the caller guarantees
    * hold the identical value (true by construction when the doc is
    * `to_json(struct(...))` over those columns, possibly renamed). A sound
    * necessary-condition prefilter ([[Compiler.necessaryPrefilter]]) is then
    * pushed AHEAD of the row-at-a-time interpreter, so fully-compilable
    * conjuncts (and receiver-not-null conditions derived from json()
    * comparisons) reach the Parquet scan as PushedFilters instead of the
    * interpreter touching every row group. Rows the prefilter drops are rows
    * the interpreter provably cannot match; the evaluator still decides
    * every surviving row, so results are bit-identical with or without
    * backing.
    *
    * Matched docs pass through byte-identical for non-altering queries (the
    * reference re-marshals every matched doc — `oj.JSON(newObj)`,
    * server/lib/eval.go:810 — which only normalizes formatting; altering
    * queries here return the re-serialized transformed tree just like the
    * reference).
    */
  def queryDocs(df: DataFrame, docCol: String, query: String,
      macros: Map[String, String] = Map.empty,
      backed: Map[String, String] = Map.empty): DataFrame = {
    val expanded = Macros.expand(macros, query)
    val q = Parser.parse(expanded).fold(e => throw new IllegalArgumentException(e), identity)
    val backedTyped = backed.flatMap { case (docField, colName) =>
      df.schema.fields.find(_.name == colName).map(f => docField -> (colName, f.dataType))
    }
    val pre = Compiler.necessaryPrefilter(q, backedTyped)
    // doc-byte key prefilter: every match-required path key must appear as
    // `"name"` in the raw document (OR the doc uses \u escapes — Jackson
    // decodes those in keys, so escaped docs pass unexamined). Needs no
    // backing, so it covers the shapes the variant prefilter can't:
    // recursive descent and constructed docs. String.contains per key per
    // row versus a full JSON parse + tree walk on every row.
    val esc = col(docCol).contains("\\u")
    val keyPre = Compiler.docKeyPrefilter(q)
      .foldLeft(pre.fold(df)(df.where))((d, k) =>
        d.where(col(docCol).contains("\"" + k + "\"") || esc))
    // min-parallelism guard BELOW the prefilters (they stay scan-pushable;
    // the shuffle moves only surviving rows) and ABOVE the interpreter
    // filter: a single-row-group fixture otherwise runs the per-row
    // parse+eval pipeline on ONE task regardless of session cores — the
    // sf0.1 events file is exactly one split, and bfl_xml_helper spent its
    // whole 2 s there on 1/32 threads. Skipped for limit queries: limit
    // takes the first N in record order, which a repartition would scramble.
    val interpIn =
      if (q.limit.isEmpty) graft.operators.Dedup.parallelize(keyPre) else keyPre
    // a Filter-only match expression (no doc-column rewrite) keeps the
    // interpreter to ONE eval per row: the previous fused
    // `withColumn(doc, bfl_eval).where(isNotNull)` shape let Catalyst push
    // the filter below the Project by re-inlining the expression — two full
    // parse+eval passes per surviving row
    val matched = interpIn
      .where(coalesce(BflExpressions.bflMatch(col(docCol), expanded), lit(false)))
    val out =
      if (Ast.usesAlteringHelpers(q))
        matched.withColumn(docCol, BflExpressions.bflTransform(col(docCol), expanded))
      else matched
    q.limit.fold(out)(n => out.limit(n.toInt))
  }

  /** `/validate` — parse-only check (reference: native.go:605-622). */
  def validate(query: String, macros: Map[String, String] = Map.empty): Either[String, Unit] =
    Parser.parse(Macros.expand(macros, query)).map(_ => ())

  /** Predicate Column without applying it (compiled tier only). */
  def predicate(df: DataFrame, query: String): Column =
    Compiler.compile(df, query).pred
}
