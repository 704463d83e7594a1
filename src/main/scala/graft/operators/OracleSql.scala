package graft.operators

/** Quoting discipline for the DuckDB oracle mirrors: caller-supplied
  * VALUES (pivot labels, funnel stage names, query terms, salts) are
  * spliced into oracle SQL as string literals, so a value containing a
  * single quote would break — or, worse, silently change — the oracle
  * query. [[lit]] doubles embedded quotes (the ANSI escape both DuckDB
  * and Spark SQL accept); [[ident]] gates strings that must double as
  * BARE identifiers/column names (pivot output columns) to a charset
  * that needs no quoting in either engine.
  */
object OracleSql {

  /** `abc'def` → `'abc''def'` — a safe single-quoted SQL string literal. */
  def lit(v: String): String = "'" + v.replace("'", "''") + "'"

  /** Escape only (no surrounding quotes), for call sites that build the
    * quoting themselves.
    */
  def esc(v: String): String = v.replace("'", "''")

  /** Require `v` to be usable verbatim as an unquoted identifier AND a
    * Spark column name: letters, digits, underscore, not digit-leading.
    */
  def ident(v: String): String = {
    require(v.nonEmpty && !v.head.isDigit &&
      v.forall(c => c.isLetterOrDigit && c < 128 || c == '_'),
      s"unsafe SQL identifier: '$v' (use [A-Za-z_][A-Za-z0-9_]*)")
    v
  }
}
