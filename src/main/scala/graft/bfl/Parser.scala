package graft.bfl

import scala.util.parsing.combinator.RegexParsers
import Ast._
import Ast.Raw._

/** BFL grammar, ported from the reference's participle struct tags
  * (reference: server/lib/parser.go:15-77). Produces the raw tree; see
  * [[Normalize]] for the compile-time pass.
  *
  * Precedence (loosest to tightest): logical (`and`/`or`) < equality
  * (`==`/`!=`) < comparison (`>` `>=` `<` `<=`) < unary (`!` `-`) < primary.
  * All binary chains are RIGHT-nested, matching the reference's recursive
  * `Next` fields — `a == b > c` parses as `a == (b > c)`.
  */
object Parser extends RegexParsers {

  override def skipWhitespace = true
  override val whiteSpace = "[ \t\r\n]+".r

  private val identRe = "[a-zA-Z_][a-zA-Z0-9_]*".r
  // Go text/scanner tokens: Float | Int (sign handled by unary minus)
  private val numberRe = """(\d+\.\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|\d+([eE][+-]?\d+)?)""".r
  // Token text KEPT RAW (incl. quotes, unprocessed escapes): the reference
  // only strips quote chars with strings.Trim(s, "\"") and never unescapes
  // (reference: server/lib/eval.go:612).
  private val dqStringRe = """"(\\.|[^"\\])*"""".r
  private val sqStringRe = """'(\\.|[^'\\])*'""".r
  private val btStringRe = "`[^`]*`".r

  private def keyword(s: String): Parser[String] =
    (s + """(?![a-zA-Z0-9_])""").r

  def expression: Parser[RExpression] = logical ^^ RExpression.apply

  def logical: Parser[RLogical] =
    equality ~ opt((keyword("and") | keyword("or")) ~ logical) ^^ {
      case e ~ n => RLogical(e, n.map { case op ~ rest => (op, rest) })
    }

  def equality: Parser[REquality] =
    comparison ~ opt(("==" | "!=") ~ equality) ^^ { case c ~ n =>
      REquality(c, n.map { case op ~ rest => (op, rest) })
    }

  def comparison: Parser[RComparison] =
    unary ~ opt((">=" | "<=" | ">" | "<") ~ comparison) ^^ { case u ~ n =>
      RComparison(u, n.map { case op ~ rest => (op, rest) })
    }

  def unary: Parser[RUnary] =
    ("!" | "-") ~ unary ^^ { case op ~ u => RUnaryOp(op, u) } |
      primary ^^ RPrimaryU.apply

  def primary: Parser[RPrimary] =
    regexLit | boolLit | nilLit | numberLit | stringLit | subExpr | callExpr

  private def numberLit: Parser[RPrimary] = numberRe ^^ (s => RNumber(s.toDouble))

  private def anyString: Parser[String] = dqStringRe | sqStringRe | btStringRe

  private def stringLit: Parser[RPrimary] = anyString ^^ RString.apply

  // `r"pattern"` — `r` must be immediately followed by the string literal.
  private def regexLit: Parser[RPrimary] = "r" ~> anyString ^^ RRegex.apply

  private def boolLit: Parser[RPrimary] =
    keyword("true") ^^^ RBool(true) | keyword("false") ^^^ RBool(false)

  private def nilLit: Parser[RPrimary] = keyword("nil") ^^^ RNil

  private def subExpr: Parser[RPrimary] = "(" ~> expression <~ ")" ^^ RSub.apply

  // Identifier chain: `Ident ( (".""*" | ".") Ident? )*`. A dot with no
  // following identifier followed by `.name` yields recursive descent —
  // `a..b` flattens exactly as the reference's string-concat + ojg parse does.
  private def identChain: Parser[List[Seg]] = {
    sealed trait Link
    case object WildLink extends Link
    case class FieldLink(n: Option[String]) extends Link
    val link: Parser[Link] =
      "." ~ "*" ^^^ WildLink |
        "." ~> opt(identRe) ^^ FieldLink.apply
    identRe ~ rep(link) ^^ { case head ~ links =>
      val out = scala.collection.mutable.ListBuffer[Seg](Field(head))
      var pendingDot = false // saw a bare `.` with no ident (start of `..`)
      links.foreach {
        case WildLink =>
          pendingDot = false; out += Wildcard
        case FieldLink(None) => pendingDot = true
        case FieldLink(Some(n)) =>
          if (pendingDot) { out += Descent(n); pendingDot = false }
          else out += Field(n)
      }
      out.toList
    }
  }

  private def parameter: Parser[RParam] =
    opt(identRe <~ ":") ~ expression ^^ { case t ~ e => RParam(t, e) }

  // `[ "(" (param ("," param)*)? ")" ]` — empty parens leave params None,
  // matching participle's nil Parameters (so `a.b()` degrades to a bare path,
  // reference: server/lib/precompute.go:60).
  private def paramList: Parser[Option[List[RParam]]] =
    "(" ~> repsep(parameter, ",") <~ ")" ^^ {
      case Nil => None
      case ps  => Some(ps)
    }

  private def selectExpr: Parser[RSelect] = {
    val idx = "[" ~> """-?\d+""".r <~ "]" ^^ (_.toInt)
    val key = "[" ~> (anyString | "*") <~ "]"
    val desc = "." ~> "." ~> identRe
    // `. expression` continuation — must not swallow `..name`
    val cont = not("." ~ ".") ~> "." ~> expression
    opt(idx) ~ opt(key) ~ opt(desc) ~ opt(cont) ^? {
      case i ~ k ~ d ~ c if i.isDefined || k.isDefined || d.isDefined || c.isDefined =>
        RSelect(i, k, d, c)
    }
  }

  def callExpr: Parser[RPrimary] =
    identChain ~ opt(paramList) ~ opt(selectExpr) ^^ { case segs ~ p ~ s =>
      RCall(segs, p.flatten, s)
    }

  // ---- participle-style error formatting --------------------------------
  // The reference surfaces participle's messages verbatim over /validate
  // (`1:1: unexpected token "="`, server/server_test.go:267-274). Reproduce
  // the format: lex the token at the failure offset Go-scanner-style; a
  // failure sitting ON an unconsumed `[` reports the token INSIDE the
  // bracket with the select production's expected clause, as participle
  // does after committing to the bracket.

  /** (token text, start offset) at `off`, Go text/scanner token classes. */
  private def lexTokenAt(s: String, off: Int): (String, Int) = {
    var i = off
    while (i < s.length && " \t\r\n".indexOf(s.charAt(i)) >= 0) i += 1
    if (i >= s.length) return ("<EOF>", i)
    val rest = s.substring(i)
    val tok =
      identRe.findPrefixOf(rest)
        .orElse(numberRe.findPrefixOf(rest))
        .orElse(dqStringRe.findPrefixOf(rest))
        .orElse(sqStringRe.findPrefixOf(rest))
        .orElse(btStringRe.findPrefixOf(rest))
        .getOrElse(rest.substring(0, 1))
    (tok, i)
  }

  private def lineCol(s: String, off: Int): (Int, Int) = {
    val upTo = s.substring(0, math.min(off, s.length))
    val line = upTo.count(_ == '\n') + 1
    val col = off - (upTo.lastIndexOf('\n') + 1) + 1
    (line, col)
  }

  private def participleError(text: String, failOffset: Int): String = {
    val (tok, at) = lexTokenAt(text, failOffset)
    if (tok == "[") {
      val (inner, innerAt) = lexTokenAt(text, at + 1)
      val (l, c) = lineCol(text, innerAt)
      s"""$l:$c: unexpected token "$inner" (expected (<string> | <char> | <rawstring> | "*") "]")"""
    } else {
      val (l, c) = lineCol(text, at)
      s"""$l:$c: unexpected token "$tok""""
    }
  }

  /** Go text/scanner lex pre-scan: an unterminated string/char/raw literal
    * fails the whole LEX before parsing starts — participle reads every
    * token up front, so the lex error wins even when a parse error sits
    * earlier in the text (reference: `"\n=.=\"\n\t"` reports
    * `2:5: literal not terminated`, NOT the 2:1 parse error —
    * server/lib/parser_test.go:1243-1249). The reported position is the
    * char that terminated the scan (the newline for "/' literals, EOF for
    * backtick raw strings), Go scanner semantics.
    */
  private def lexScanError(text: String): Option[String] = {
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (ch == '"' || ch == '\'') {
        var j = i + 1
        var closed = false
        while (!closed && j < text.length && text.charAt(j) != '\n') {
          val c = text.charAt(j)
          if (c == '\\' && j + 1 < text.length) j += 2
          else if (c == ch) closed = true
          else j += 1
        }
        if (!closed) {
          val (l, c) = lineCol(text, math.min(j, text.length))
          return Some(s"$l:$c: literal not terminated")
        }
        i = j + 1
      } else if (ch == '`') {
        val j = text.indexOf('`', i + 1)
        if (j < 0) {
          val (l, c) = lineCol(text, text.length)
          return Some(s"$l:$c: literal not terminated")
        }
        i = j + 1
      } else i += 1
    }
    None
  }

  /** Parse a query string to the raw tree. Empty string = match-all
    * (reference: server/lib/parser.go:84-86).
    */
  def parseRaw(text: String): Either[String, Option[RExpression]] =
    if (text.trim.isEmpty) Right(None)
    else lexScanError(text).map(Left(_)).getOrElse {
      parseAll(expression, text) match {
        case Success(r, _)      => Right(Some(r))
        case NoSuccess(_, next) => Left(participleError(text, next.offset))
        case _                  => Left("parse failure")
      }
    }

  /** Parse + normalize (the reference's Parse + Precompute). Regex literals
    * are validated here — the reference compiles them in Precompute and
    * rejects the query up-front (precompute.go:200-202).
    */
  def parse(text: String): Either[String, Query] =
    parseRaw(text).flatMap {
      case None    => Right(Query(None, None))
      case Some(r) => Normalize(r).flatMap(validateRegexes)
    }

  private def validateRegexes(q: Query): Either[String, Query] = {
    def walk(e: Ast.Expr): Option[String] = e match {
      case Ast.RegexLit(p) =>
        try { java.util.regex.Pattern.compile(Interp.re2ToJava(p)); None }
        catch { case ex: Exception => Some(s"bad regex `$p`: ${ex.getMessage}") }
      case Ast.Logical(_, a, b)    => walk(a).orElse(walk(b))
      case Ast.Equality(_, a, b)   => walk(a).orElse(walk(b))
      case Ast.Comparison(_, a, b) => walk(a).orElse(walk(b))
      case Ast.Unary(_, a)         => walk(a)
      case Ast.SubExpr(a)          => walk(a)
      case Ast.HelperCall(_, _, args) => args.view.flatMap(walk(_)).headOption
      case _                       => None
    }
    q.expr.flatMap(walk) match {
      case Some(err) => Left(err)
      case None      => Right(q)
    }
  }
}
