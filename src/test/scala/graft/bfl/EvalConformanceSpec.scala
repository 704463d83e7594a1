package graft.bfl

import org.scalatest.funsuite.AnyFunSuite

/** Conformance corpus ported from the reference's table-driven eval tests
  * (reference: server/lib/eval_test.go:14-348). Each row: query, input JSON,
  * expected truth, expected extracted limit, expected transformed JSON.
  */
class EvalConformanceSpec extends AnyFunSuite {

  private val R = Redact.REDACTED

  private def jsonEq(a: String, b: String): Boolean = {
    val ta = JsonTree.parse(a)
    val tb = JsonTree.parse(b)
    def norm(v: Any): Any = v match {
      case m: JsonTree.Obj =>
        m.toList.sortBy(_._1).map { case (k, x) => (k, norm(x)) }
      case arr: JsonTree.Arr => arr.toList.map(norm)
      case l: Long           => l.toDouble
      case i: Int            => i.toDouble
      case other             => other
    }
    norm(ta) == norm(tb)
  }

  private def check(query: String, json: String, truth: Boolean,
      limit: Long = 0, newJson: String = null): Unit = {
    val q = Parser.parse(query).fold(e => fail(s"parse failed for `$query`: $e"), identity)
    assert(q.limit.getOrElse(0L) == limit, s"limit mismatch for `$query`")
    val root = JsonTree.parse(json)
    val interp = new Interp(q)
    val got = interp.eval(root)
    assert(got == truth, s"Query: `$query` JSON: $json — expected $truth got $got")
    val expected = if (newJson == null) json else newJson
    val serialized = JsonTree.serialize(root)
    assert(jsonEq(expected, serialized),
      s"transform mismatch for `$query`: expected $expected got $serialized")
  }

  val car = """{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}"""

  test("logical literals") {
    check("true and true", "{}", truth = true)
    check("true and false", "{}", truth = false)
    check("false and true", "{}", truth = false)
    check("false and false", "{}", truth = false)
    check("true or true", "{}", truth = true)
    check("false or true", "{}", truth = true)
    check("true or false", "{}", truth = true)
    check("false or false", "{}", truth = false)
    check("true and 5", "{}", truth = true)
    check("false and 5", "{}", truth = false)
    check("true and 0", "{}", truth = false)
  }

  test("equality and comparison literals") {
    check("5 == 5", "{}", truth = true)
    check("3 == 5", "{}", truth = false)
    check("\"abc\" == \"abc\"", "{}", truth = true)
    check("\"abc\" == \"xyz\"", "{}", truth = false)
    check("\"abc\" != \"xyz\"", "{}", truth = true)
    check("\"abc\" != \"abc\"", "{}", truth = false)
    check("true == true", "{}", truth = true)
    check("true != true", "{}", truth = false)
    check("true == false", "{}", truth = false)
    check("3.14 == 3.14", "{}", truth = true)
    check("3.14 == 42", "{}", truth = false)
    check("42 > 41", "{}", truth = true)
    check("42 >= 42", "{}", truth = true)
    check("41 >= 42", "{}", truth = false)
    check("13 < 42", "{}", truth = true)
    check("42 < 13", "{}", truth = false)
    check("!true", "{}", truth = false)
    check("-300 < 42", "{}", truth = true)
  }

  test("paths, sub-expressions, field-vs-field") {
    check("true and !(5 == a)", """{"a": 4}""", truth = true)
    check("true and !(5 == a)", """{"a": 5}""", truth = false)
    check("(a.b == \"hello\") and (x.y > 3.14)", """{"a":{"b":"hello"},"x":{"y":3.15}}""", truth = true)
    check("(a.b == \"hello\") and (x.y > 3.14)", """{"a":{"b":"hello"},"x":{"y":3.13}}""", truth = false)
    check("(a.b == \"hello\") and (x.y > 3.14)", """{"a":{"b":"mello"},"x":{"y":3.15}}""", truth = false)
    check("brand.name == \"Chevrolet\"", car, truth = true)
    check("brand.name != \"Chevrolet\"", car, truth = false)
    check("brand.game == \"Chevrolet\"", car, truth = false) // collapse
    check("year == salesYear", car.dropRight(1) + ",\"salesYear\":2021}", truth = true)
    check("year == salesYear", car.dropRight(1) + ",\"salesYear\":2020}", truth = false)
    check("year != salesYear", car.dropRight(1) + ",\"salesYear\":2020}", truth = true)
    check("year != salesYear", car.dropRight(1) + ",\"salesYear\":2021}", truth = false)
    check("year > salesYear", car.dropRight(1) + ",\"salesYear\":2020}", truth = true)
    check("year > salesYear", car.dropRight(1) + ",\"salesYear\":2022}", truth = false)
    check("brand.name == \"Chevrolet\" and year == 2021", car, truth = true)
    check("brand.name == \"Chevrolet\" and year == 2021",
      """{"id":114905,"model":"Camaro","trend":{"name":"Chevrolet"},"year":2021}""", truth = false)
    check("year == 2021 and brand.name == \"Chevrolet\"",
      """{"id":114905,"model":"Camaro","trend":{"name":"Chevrolet"},"year":2021}""", truth = false)
  }

  test("regex literals") {
    check("brand.name == r\"Chev.*\"", car, truth = true)
    check("brand.name != r\"Chev.*\"", car, truth = false)
    check("brand.name == r\"Bug.*\"", car, truth = false)
    check("brand.name != r\"Bug.*\"", car, truth = true)
  }

  test("index and key selects") {
    val req = """{"request":{"path":["api","v1","example"]}}"""
    check("request.path[1] == \"v1\"", req, truth = true)
    check("request.path[1] != \"v1\"", req, truth = false)
    val hdr = """{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d"}}}"""
    check("request.headers[\"a\"] == \"b\"", hdr, truth = true)
    check("request.headers[\"a\"] != \"b\"", hdr, truth = false)
    check("request.headers[\"a\"] == \"d\"", hdr, truth = false)
    val hdr2 = """{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d","e":{"x":"y"}}}}"""
    check("request.headers[\"e\"].x == \"y\"", hdr2, truth = true)
    check("request.headers[\"e\"].x == \"z\"", hdr2, truth = false)
    check("request.headers[\"e\"].x != \"y\"", hdr2, truth = false)
    check("request.headers[\"e\"].x != \"z\"", hdr2, truth = true)
    check("request.headers[\"a\"] == \"b\" and request.path[1] == \"v1\"", hdr, truth = true)
  }

  test("string helpers") {
    check("brand.name.startsWith(\"Chev\")", car, truth = true)
    check("brand.name.startsWith(\"hev\")", car, truth = false)
    check("brand.name.endsWith(\"let\")", car, truth = true)
    check("brand.name.endsWith(\"le\")", car, truth = false)
    check("brand.name.contains(\"ro\")", car, truth = true)
    check("brand.name.contains(\"hello\")", car, truth = false)
    check("brand[\"name\"].startsWith(\"Chev\")", car, truth = true)
    check("brand[\"name\"].startsWithx(\"Chev\")", car, truth = false) // undefined helper
    check("brand[\"name\"].startsWith(\"hev\")", car, truth = false)
    check("!brand.name.startsWith(\"Chev\")", car, truth = false)
    check("!brand.name.startsWith(\"hev\")", car, truth = true)
    // empty parens degrade to a bare (missing) path → collapse → false
    check("brand.name.startsWith()", car, truth = false)
    check("brand.name.endsWith()", car, truth = false)
    check("brand.name.contains()", car, truth = false)
    check("datetime()", car, truth = false)
  }

  test("datetime") {
    val ts = """{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"timestamp":1634668524000}"""
    check("timestamp > datetime(\"10/19/2021, 6:29:02.000 PM\")", ts, truth = true)
    check("timestamp > datetime(\"10/19/2021, 7:29:02.999 PM\")", ts, truth = false)
  }

  test("nil") {
    val nilCar = """{"id":114905,"model":null,"brand":{"name":"Chevrolet"},"year":2021}"""
    check("model == nil", nilCar, truth = true)
    check("model != nil", nilCar, truth = false)
    check("model == nil", car, truth = false)
    check("model != nil", car, truth = true)
  }

  test("raw escaped string equality (no unescaping, quote-trim only)") {
    check(
      "model == \"\\\"hello world\\\";v=\\\"42\\\", \"",
      """{"brand":{"name":"Chevrolet"},"id":27502,"model":"\\\"hello world\\\";v=\\\"42\\\", ","year":2021}""",
      truth = true)
  }

  test("limit extraction") {
    check("brand.name == \"Chevrolet\" and limit(100)", car, truth = true, limit = 100)
    check("limit(100) and brand.name == \"Chevrolet\"", car, truth = true, limit = 100)
    check("brand.name != \"Chevrolet\" and limit(100)", car, truth = false, limit = 100)
  }

  test("json() helper") {
    val body = """{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}"""
    check("response.body.json().brand.name == \"Chevrolet\"", body, truth = true)
    check("response.body.json().brand.name == \"ChevroletX\"", body, truth = false)
    check("response.body.json().trend.name == \"Chevrolet\"", body, truth = false)
    val invalid = """{"response":{"body":"INVALID JSON"}}"""
    check("response.body.json().brand.name == \"Chevrolet\"", invalid, truth = false)
    check("response.body.json() == \"INVALID JSON\"", invalid, truth = false)
    check("response.body.json().key[0] == \"api\"",
      """{"response":{"body":"{\"key\":[\"api\",\"v1\",\"example\"]}"}}""", truth = true)
    check("response.body.json()[0] == \"api\"",
      """{"response":{"body":"[\"api\",\"v1\",\"example\"]"}}""", truth = true)
    check("response.body.json()[0] == \"v1\"",
      """{"response":{"body":"[\"api\",\"v1\",\"example\"]"}}""", truth = false)
    check("response.body.json()[\"model\"] == \"Camaro\"", body, truth = true)
    check("response.body.json()[\"model\"] == \"CamaroX\"", body, truth = false)
    val b64 = """{"response":{"body":"eyJpZCI6MTE0OTA1LCJtb2RlbCI6IkNhbWFybyIsImJyYW5kIjp7Im5hbWUiOiJDaGV2cm9sZXQifSwieWVhciI6MjAyMX0="}}"""
    check("response.body.json().brand.name == \"Chevrolet\"", b64, truth = true)
    check("response.body.json()..name == \"Chevrolet\"", body, truth = true)
    check("response.body.json()..model == \"Camaro\"", body, truth = true)
    check("response.body.json()..surname == \"Chevrolet\"", body, truth = false)
  }

  test("redact") {
    check("id == 114905 and redact(\"model\", \"brand.name\")", car, truth = true,
      newJson = s"""{"id":114905,"model":"$R","brand":{"name":"$R"},"year":2021}""")
    check("id == 114905 and redact(\"modelx\", \"brand.name\")", car, truth = true,
      newJson = s"""{"id":114905,"model":"Camaro","brand":{"name":"$R"},"year":2021}""")
    // short-circuit: redact on the right of a false `and` never runs
    check("id == 114906 and redact(\"model\", \"brand.name\")", car, truth = false, newJson = car)
    check("redact(\"model\", \"brand.name\") and id == 114906", car, truth = false,
      newJson = s"""{"id":114905,"model":"$R","brand":{"name":"$R"},"year":2021}""")
    check("redact(\"model\", \"..name\") and id == 114906", car, truth = false,
      newJson = s"""{"id":114905,"model":"$R","brand":{"name":"$R"},"year":2021}""")
    val similar = """{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021,"similar":{"id":114906,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}}"""
    check("redact(\"model\", \"..name\") and id == 114906", similar, truth = false,
      newJson = s"""{"id":114905,"model":"$R","brand":{"name":"$R"},"year":2021,"similar":{"id":114906,"model":"Camaro","brand":{"name":"$R"},"year":2021}}""")
    check("redact(\"..model\", \"..name\") and id == 114906", similar, truth = false,
      newJson = s"""{"id":114905,"model":"$R","brand":{"name":"$R"},"year":2021,"similar":{"id":114906,"model":"$R","brand":{"name":"$R"},"year":2021}}""")
    check("redact(\"..model\", \"..surname\") and id == 114906", car, truth = false,
      newJson = s"""{"id":114905,"model":"$R","brand":{"name":"Chevrolet"},"year":2021}""")
    check("redact(\"..surname\") and id == 114906", car, truth = false, newJson = car)
    check("redact(\"model\", \"..name\") and id == 114906",
      """{"id":114905,"model":["Aamaro", "Bamaro", "Camaro"],"brand":{"name":"Chevrolet"},"year":2021}""",
      truth = false,
      newJson = s"""{"id":114905,"model":"$R","brand":{"name":"$R"},"year":2021}""")
    check("redact(\"model\", \"..name\") and id == 114906",
      """{"id":114905,"model":"Camaro","brand":{"name":["Ahevrolet", "Bhevrolet", "Chevrolet"]},"year":2021}""",
      truth = false,
      newJson = s"""{"id":114905,"model":"$R","brand":{"name":"$R"},"year":2021}""")
    check("redact(\"id\", \"brand.name\") and id == 114905", car, truth = false,
      newJson = s"""{"id":"$R","model":"Camaro","brand":{"name":"$R"},"year":2021}""")
  }

  test("wildcards") {
    val strs = """{"request":{"path":["api","v1","example"]}}"""
    check("request.path.* == \"v1\"", strs, truth = true)
    check("request.path.* == \"v2\"", strs, truth = false)
    check("request.path.* != \"v2\"", strs, truth = true)
    val nums = """{"request":{"path":[1, 2, 3]}}"""
    check("request.path.* > 2", nums, truth = true)
    check("request.path.* > 4", nums, truth = false)
    check("request.path.* < 2", nums, truth = true)
    check("request.path.* < 0", nums, truth = false)
    check("request.path.* >= 2", nums, truth = true)
    check("request.path.* >= 4", nums, truth = false)
    check("request.path.* <= 2", nums, truth = true)
    check("request.path.* <= 0", nums, truth = false)
    val objs = """{"request":{"path":[{"x":1}, {"x":2}, {"x":3}]}}"""
    check("request.path.*.x > 2", objs, truth = true)
    check("request.path.*.x > 4", objs, truth = false)
    check("request.path.*.x and true", objs, truth = true)
    check("request.path.*.x and true", """{"request":{"path":[]}}""", truth = false)
    check("request.path.* == request.path.*", nums, truth = true)
    check("request.path.* != request.path.*", nums, truth = false)
    check("request.path.* > request.path.*", nums, truth = false)
    val both = """{"request":{"path":[1, 2, 3]},"response":{"header":[-1, -2, -3]}}"""
    check("request.path.* > response.header.*", both, truth = true)
    check("request.path.* < request.path.*", nums, truth = false)
    check("response.header.* < request.path.*", both, truth = true)
    check("request.path.* >= request.path.*", nums, truth = false)
    check("request.path.* >= response.header.*", both, truth = true)
    check("request.path.* <= request.path.*", nums, truth = false)
    check("response.header.* <= request.path.*", both, truth = true)
  }

  val bookstoreJson =
    """{"response":{"body":"<?xml version=\"1.0\" encoding=\"UTF-8\"?>\r\n<bookstore><book category=\"cooking\"><title lang=\"en\">Everyday Italian</title><author>Giada De Laurentiis</author><year>2005</year><price>30.00</price></book><book category=\"children\"><title lang=\"en\">Harry Potter</title><author>J K. Rowling</author><year>2005</year><price>29.99</price></book><book category=\"web\"><title lang=\"en\">XQuery Kick Start</title><author>James McGovern</author><author>Per Bothner</author><author>Kurt Cagle</author><author>James Linn</author><author>Vaidyanathan Nagarajan</author><year>2003</year><price>49.99</price></book><book category=\"web\"><title lang=\"en\">Learning XML</title><author>Erik T. Ray</author><year>2003</year><price>39.95</price></book></bookstore>\r\n"}}"""

  test("StAX xml parse equals the scala-xml DOM parse") {
    val bodies = Seq(
      """<r><k>87</k></r>""",
      """<a x="1"><b>t</b><b>u</b>mixed<c/></a>""",
      JsonTree.get(JsonTree.parse(bookstoreJson),
        List(Ast.Field("response"), Ast.Field("body"))).head.asInstanceOf[String]
    )
    bodies.foreach { xml =>
      assert(XmlCodec.parse(xml) == XmlCodec.parseDom(xml), s"mismatch for $xml")
    }
    assert(XmlCodec.parse("not xml").isEmpty)
  }

  test("xml() helper") {
    check("response.body.xml().bookstore.book[1].title == \"Harry Potter\"", bookstoreJson, truth = true)
    check("response.body.xml().bookstore.book[1].title == \"Lord of the Rings\"", bookstoreJson, truth = false)
  }

  test("time helpers") {
    val now = System.currentTimeMillis()
    val json = s"""{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"timestamp":${now - 2000}}"""
    val rows = List(
      ("timestamp <= now()", true), ("timestamp >= now()", false),
      ("timestamp <= seconds(-5)", false), ("timestamp >= seconds(-5)", true),
      ("timestamp <= minutes(-5)", false), ("timestamp >= minutes(-5)", true),
      ("timestamp <= hours(-5)", false), ("timestamp >= hours(-5)", true),
      ("timestamp <= days(-5)", false), ("timestamp >= days(-5)", true),
      ("timestamp <= weeks(-5)", false), ("timestamp >= weeks(-5)", true),
      ("timestamp <= months(-5)", false), ("timestamp >= months(-5)", true),
      ("timestamp <= years(-5)", false), ("timestamp >= years(-5)", true),
      ("timestamp <= seconds(5)", true), ("timestamp >= seconds(5)", false),
      ("timestamp <= minutes(5)", true), ("timestamp >= minutes(5)", false),
      ("timestamp <= hours(5)", true), ("timestamp >= hours(5)", false),
      ("timestamp <= days(5)", true), ("timestamp >= days(5)", false),
      ("timestamp <= weeks(5)", true), ("timestamp >= weeks(5)", false),
      ("timestamp <= months(5)", true), ("timestamp >= months(5)", false),
      ("timestamp <= years(5)", true), ("timestamp >= years(5)", false)
    )
    rows.foreach { case (q, truth) => check(q, json, truth) }
  }

  test("redact through json()/xml() boundaries") {
    def checkRedact(query: String, json: String, expectedNested: String, strCompare: Boolean): Unit = {
      val q = Parser.parse(query).fold(e => fail(s"parse failed: $e"), identity)
      val root = JsonTree.parse(json)
      assert(new Interp(q).eval(root))
      val nested0 = JsonTree.get(root, List(Ast.Field("response"), Ast.Field("body"))).head.asInstanceOf[String]
      val nested = Interp.tryBase64(nested0).getOrElse(nested0)
      val expected = Interp.tryBase64(expectedNested).getOrElse(expectedNested)
      if (strCompare) assert(nested == expected, s"for `$query`:\n$nested\nvs\n$expected")
      else assert(jsonEq(nested, expected), s"for `$query`: $nested vs $expected")
    }
    val body = """{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}"""
    checkRedact("redact(\"response.body.json().model\")", body,
      s"""{"id":114905,"model":"$R","brand":{"name":"Chevrolet"},"year":2021}""", strCompare = false)
    checkRedact("redact(\"response.body.json()..name\")", body,
      s"""{"id":114905,"model":"Camaro","brand":{"name":"$R"},"year":2021}""", strCompare = false)
    checkRedact("redact(\"response.body.json()...name\")", body,
      s"""{"id":114905,"model":"Camaro","brand":{"name":"$R"},"year":2021}""", strCompare = false)
    checkRedact("redact(\"response.body.json()..surname\")", body,
      """{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}""", strCompare = false)
    checkRedact("redact(\"response.body.json()...surname\")", body,
      """{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}""", strCompare = false)
    val b64body = """{"response":{"body":"eyJpZCI6MTE0OTA1LCJtb2RlbCI6IkNhbWFybyIsImJyYW5kIjp7Im5hbWUiOiJDaGV2cm9sZXQifSwieWVhciI6MjAyMX0="}}"""
    checkRedact("redact(\"response.body.json().model\")", b64body,
      "eyJpZCI6MTE0OTA1LCJtb2RlbCI6IltSRURBQ1RFRF0iLCJicmFuZCI6eyJuYW1lIjoiQ2hldnJvbGV0In0sInllYXIiOjIwMjF9", strCompare = false)
    checkRedact("redact(\"response.body.xml().bookstore.book[1].title\")", bookstoreJson,
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<bookstore><book category=\"cooking\"><author>Giada De Laurentiis</author><price>30.00</price><title lang=\"en\">Everyday Italian</title><year>2005</year></book><book category=\"children\"><author>J K. Rowling</author><price>29.99</price><title>[REDACTED]</title><year>2005</year></book><book category=\"web\"><author>James McGovern</author><author>Per Bothner</author><author>Kurt Cagle</author><author>James Linn</author><author>Vaidyanathan Nagarajan</author><price>49.99</price><title lang=\"en\">XQuery Kick Start</title><year>2003</year></book><book category=\"web\"><author>Erik T. Ray</author><price>39.95</price><title lang=\"en\">Learning XML</title><year>2003</year></book></bookstore>",
      strCompare = true)
  }

  test("macro expansion goldens") {
    var macros = Map.empty[String, String]
    macros = Macros.add(macros, "http", "proto.name == \"http\"")
    macros = Macros.add(macros, "http2", "proto.name == \"http2\"")
    macros = Macros.add(macros, "amqp", "proto.name == \"amqp\"")
    val query =
      "\nhttp or !amqp and request.method == \"GET\" and request.headers[\"http\"] == \"x-amqp-y\"\n\nhttp or http2 or !amqp and request.method == \"GET\" and request.headers[\"http\"] == \"x-amqp-y\"\n\t"
    val expected =
      "\n(proto.name == \"http\") or !(proto.name == \"amqp\") and request.method == \"GET\" and request.headers[\"http\"] == \"x-amqp-y\"\n\n(proto.name == \"http\") or (proto.name == \"http2\") or !(proto.name == \"amqp\") and request.method == \"GET\" and request.headers[\"http\"] == \"x-amqp-y\"\n\t"
    assert(Macros.expand(macros, query) == expected)
  }

  test("go float formatting") {
    assert(GoFmt.format(5.0) == "5")
    assert(GoFmt.format(2021.0) == "2021")
    assert(GoFmt.format(3.14) == "3.14")
    assert(GoFmt.format(1634668524000.0) == "1.63467e+12")
    assert(GoFmt.format(0.00001) == "1e-05")
    assert(GoFmt.format(1000000.0) == "1e+06")
    assert(GoFmt.format(123456.7) == "123457")
    assert(GoFmt.format(0.0001) == "0.0001")
    assert(GoFmt.format(-3.5) == "-3.5")
    assert(GoFmt.format(0.0) == "0")
  }

  test("parentheses are a collapse boundary") {
    // reference: evalPrimary SubExpression -> evalExpression converts inner
    // collapse to false (eval.go:649-651, 786-790)
    check("(brand.game == \"X\") or true", car, truth = true)
    check("brand.game == \"X\" or true", car, truth = false) // no boundary
    check("!(brand.game == \"X\")", car, truth = true)
    check("(brand.game == \"X\") and true", car, truth = false)
    check("true and (brand.game == \"X\" or brand.name == \"Chevrolet\")", car, truth = false)
    check("true and ((brand.game == \"X\") or brand.name == \"Chevrolet\")", car, truth = true)
  }

  test("missing helper receiver coerces to boolean false -> \"false\"") {
    // reference: eval.go:622-624 (v=false) + stringOperand(false)="false"
    check("brand.game.startsWith(\"fal\")", car, truth = true)
    check("brand.game.startsWith(\"x\")", car, truth = false)
    check("brand.game.endsWith(\"lse\")", car, truth = true)
    check("brand.game.contains(\"\")", car, truth = true)
    check("brand.name.contains(\"\")", car, truth = true)
  }

  test("redact with non-prefix recursive descent sets at every depth") {
    // ojg jp.Set semantics for `a..name` (non-prefix descent)
    val doc = """{"data":{"u":{"password":"x"},"v":{"password":"y"}},"password":"z"}"""
    val q = Parser.parse("""redact("data..password") and true""").toOption.get
    val root = JsonTree.parse(doc)
    new Interp(q).eval(root)
    val out = JsonTree.serialize(root)
    assert(out.contains("\"u\":{\"password\":\"[REDACTED]\"}"))
    assert(out.contains("\"v\":{\"password\":\"[REDACTED]\"}"))
    assert(out.contains("\"password\":\"z\"")) // outside the prefix untouched
  }

  test("go shortest float serialization (ojg layout)") {
    assert(GoFmt.shortest(1e-7) == "1e-07")
    assert(GoFmt.shortest(0.0001) == "0.0001")
    assert(GoFmt.shortest(1e21) == "1e+21")
    assert(GoFmt.shortest(1.5e15) == "1500000000000000")
    assert(GoFmt.shortest(3.14) == "3.14")
    assert(GoFmt.shortest(-2.5e-9) == "-2.5e-09")
    assert(GoFmt.shortest(123.456) == "123.456")
  }

  test("reference-exact coercion corners from review") {
    // Go base64 decode ignores \r\n
    assert(Interp.tryBase64("eyJtIjoxfQ==\n").contains("""{"m":1}"""))
    // ParseFloat rejects padded strings (Java toDouble would accept)
    assert(Coerce.toNum(" 5") == 0.0)
    assert(Coerce.toNum("5f") == 0.0)
    assert(Coerce.toNum("5e2") == 500.0)
    // reflect.DeepEqual: int64 5 != float64 5.0 inside arrays
    check("a == b", """{"a":[5],"b":[5.0]}""", truth = false)
    check("a == b", """{"a":[5],"b":[5]}""", truth = true)
    // Arr == regex dispatches on the array first (existential vs "")
    check("""vals == r"x"""", """{"vals":["x",""]}""", truth = true)
    check("""vals == r"x"""", """{"vals":["x","y"]}""", truth = false)
    // limit argument runs the full evaluator (5 == 5 -> true -> 1)
    assert(Parser.parse("limit(5 == 5) and true").toOption.get.limit.contains(1L))
    // leading-descent multi-segment redact is a no-op (ref compares the
    // joined remainder string against single keys)
    check("""redact("..brand.name") and true""",
      """{"brand":{"name":"Chevrolet"}}""", truth = true,
      newJson = """{"brand":{"name":"Chevrolet"}}""")
    // bad regex is rejected at parse time, like Precompute
    assert(Parser.parse("""a == r"[" """).isLeft)
  }

  test("empty query matches everything") {
    val q = Parser.parse("").fold(e => fail(e), identity)
    assert(new Interp(q).eval(JsonTree.parse("{}")))
  }
}
