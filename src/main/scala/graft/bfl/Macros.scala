package graft.bfl

import java.util.regex.{Matcher, Pattern}

/** User-defined textual macros, expanded before parsing
  * (reference: server/lib/macro.go:16-49).
  *
  * Semantics preserved: the expansion is wrapped in parens at registration
  * (precedence-safe); expansion order is longest-macro-name-first; a
  * quote-counting lookahead `(?=(?:[^"]|"[^"]*")*$)` prevents expansion inside
  * double-quoted string literals; no word boundaries (a macro name matches as
  * a bare substring, like the reference).
  */
object Macros {

  def add(macros: Map[String, String], name: String, expanded: String): Map[String, String] =
    macros + (name -> s"($expanded)")

  def expand(macros: Map[String, String], query: String): String = {
    val ordered = macros.toList.sortBy { case (k, _) => -k.length }
    ordered.foldLeft(query) { case (q, (name, expanded)) =>
      val regex = Pattern.compile(
        "(" + Pattern.quote(name) + ")(?=(?:[^\"]|\"[^\"]*\")*$)",
        Pattern.DOTALL
      )
      regex.matcher(q).replaceAll(Matcher.quoteReplacement(expanded))
    }
  }
}
