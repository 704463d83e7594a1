package graft.bfl

import org.scalatest.funsuite.AnyFunSuite
import Ast._

/** Parser-level goldens ported from the reference's AST tests
  * (reference: server/lib/parser_test.go:9-1257). Asserted against the
  * normalized tree (this engine's IR) rather than the raw participle shape.
  */
class ParserSpec extends AnyFunSuite {

  private def parse(q: String): Query =
    Parser.parse(q).fold(e => fail(s"parse failed for `$q`: $e"), identity)

  test("empty query → match-all") {
    assert(parse("").expr.isEmpty)
    assert(parse("  ").expr.isEmpty)
  }

  test("precedence: comparison nests inside equality (a == b > c)") {
    parse("a == b > c").expr.get match {
      case Equality("==", PathGet(List(Field("a"))),
        Comparison(">", PathGet(List(Field("b"))), PathGet(List(Field("c"))))) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("logical chains are right-nested") {
    parse("a and b or c").expr.get match {
      case Logical("and", PathGet(_), Logical("or", PathGet(_), PathGet(_))) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("select expressions: index, key, chained") {
    parse("""request.path[1] == "v1"""").expr.get match {
      case Equality("==", PathGet(List(Field("request"), Field("path"), Index(1))), StrLit("v1")) => ()
      case other => fail(s"unexpected: $other")
    }
    parse("""request.headers["e"].x == "y"""").expr.get match {
      case Equality("==",
        PathGet(List(Field("request"), Field("headers"), Key("e"), Field("x"))), StrLit("y")) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("wildcard and bare descent paths") {
    parse("request.path.* == 1").expr.get match {
      case Equality("==", PathGet(List(Field("request"), Field("path"), Wildcard)), NumLit(1.0)) => ()
      case other => fail(s"unexpected: $other")
    }
    parse("""a..b == "x"""").expr.get match {
      case Equality("==", PathGet(List(Field("a"), Descent("b"))), StrLit("x")) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("helper calls with receiver paths") {
    parse("""brand.name.startsWith("Chev")""").expr.get match {
      case HelperCall("startsWith", List(Field("brand"), Field("name")), List(StrLit("Chev"))) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("json()/xml() split into outer/inner") {
    parse("""response.body.json().brand.name == "x"""").expr.get match {
      case Equality("==",
        JsonGet(List(Field("response"), Field("body")), "json", List(Field("brand"), Field("name"))),
        StrLit("x")) => ()
      case other => fail(s"unexpected: $other")
    }
    parse("""response.body.json()[0] == "api"""").expr.get match {
      case Equality("==", JsonGet(_, "json", List(Index(0))), StrLit("api")) => ()
      case other => fail(s"unexpected: $other")
    }
    parse("""response.body.json()..name == "x"""").expr.get match {
      case Equality("==", JsonGet(_, "json", List(Descent("name"))), StrLit("x")) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("rule() tagged-parameter DSL parse-accepts (multi-line)") {
    // reference: server/lib/parser_test.go:751-1159 — grammar-level only;
    // at eval time `rule` is an undefined helper → collapse → false
    val q = """
rule(
	description: "Holy in name property",
	query: http and service == r"catalogue.*" and request.path == r"catalogue.*" and response.headers["content-type"].contains("application/json"),
	assert: response.body.name == "Holy"
)
and
rule(
	description: "Content Length header",
	query: http,
	assert: response.headers["content-length"] == r"(\\d+(?:\\.\\d+)?)"
)
"""
    val parsed = parse(q)
    parsed.expr.get match {
      case Logical("and", HelperCall("rule", _, _), HelperCall("rule", _, _)) => ()
      case other => fail(s"unexpected: $other")
    }
    // evaluates to false (undefined helper collapses)
    assert(!new Interp(parsed).eval(JsonTree.parse("{}")))
  }

  test("syntax errors are rejected with position info") {
    // reference asserts exact participle messages (parser_test.go:1243-1257);
    // parity here is ok/error with best-effort text
    assert(Parser.parse("a == ").isLeft)
    assert(Parser.parse("and and").isLeft)
    assert(Parser.parse("""x == "unterminated""").isLeft)
    assert(Parser.parse("path[3.14] == 1").isLeft) // float index is an error
    assert(Parser.parse("(a == 1").isLeft)
    // participle-exact messages the reference pins (server_test.go:267-274)
    assert(Parser.parse("=.=") == Left("""1:1: unexpected token "=""""))
    assert(Parser.parse("""request.path[3.14] == "hello"""") ==
      Left("""1:14: unexpected token "3.14" (expected (<string> | <char> | <rawstring> | "*") "]")"""))
    // the remaining two participle-exact strings the reference asserts
    // (server/lib/parser_test.go:1243-1257): a multi-line error position,
    // and — the subtle one — an unterminated literal failing the LEX, which
    // participle runs to completion before parsing, so it outranks the
    // parse error sitting EARLIER in the text (2:1's stray "=")
    assert(Parser.parse("\nrequest.path[3.14] == \"hello\"\n\t") ==
      Left("""2:14: unexpected token "3.14" (expected (<string> | <char> | <rawstring> | "*") "]")"""))
    assert(Parser.parse("\n=.=\"\n\t") == Left("2:5: literal not terminated"))
    assert(Parser.parse("""x == "unterminated""") ==
      Left("1:19: literal not terminated"))
  }

  test("validate churn: many sequential parses stay stable") {
    (0 until 2000).foreach { i =>
      assert(Parser.parse(s"""brand.name == "x$i" and year > $i""").isRight)
    }
  }

  test("time helpers fold against the provided clock") {
    val raw = Parser.parseRaw("timestamp >= hours(-2)").toOption.get.get
    val q = Normalize(raw, nowMillis = 1000000000000L).toOption.get
    q.expr.get match {
      case Comparison(">=", PathGet(_), TimeLit(ms)) =>
        assert(ms == 1000000000000L - 2 * 3600 * 1000L)
      case other => fail(s"unexpected: $other")
    }
  }

  test("leftmost limit wins") {
    assert(parse("limit(5) and limit(10)").limit.contains(5L))
    assert(parse("a == 1 and limit(10)").limit.contains(10L))
  }
}
