package graft.bfl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Soundness of the interpreter-tier necessary-condition prefilter
  * ([[Compiler.necessaryPrefilter]] via [[Bfl.queryDocs]]'s `backed` option):
  * with backing declared, queryDocs must return EXACTLY the rows it returns
  * without backing (the prefilter may only discard rows the interpreter
  * cannot match). The fixture rows deliberately cover the traps:
  *
  *   - json() receiver missing / JSON-null → the helper's value is `false`,
  *     NOT collapse (reference: server/lib/eval.go:358-404 + 119-124), so
  *     `body.json().k != 95` and `< 95` MATCH bodiless rows — a naive
  *     `body IS NOT NULL` prefilter would silently drop them;
  *   - receivers that are valid std-base64 (the reference sniffs base64
  *     BEFORE the plain parse, eval.go:362-365) — including base64 that
  *     decodes to matching JSON, and line-wrapped base64;
  *   - malformed JSON, empty strings, "null"/"true" scalar docs;
  *   - string/array/object/bool/float k values exercising the dynamic
  *     coercions.
  */
class PrefilterSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("bfl-prefilter")
    .getOrCreate()

  import java.util.Base64
  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  /** (etype, payload) fixture rows; payload backs the doc field `body`. */
  private lazy val df = {
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._
    val payloads: List[String] = List(
      """{"k": 42}""",
      """{"k": 96}""",
      """{"k": "95"}""",
      """{"k": "abc"}""",
      """{"k": null}""",
      """{}""",
      """{"k": [1, 96]}""",
      """{"k": {"x": 1}}""",
      """{"a": {"b": 1}}""",
      """{k:""", // malformed
      "",
      null,
      "null",
      "true",
      "96",
      "12345678", // valid base64 (decodes to garbage), also NOT valid JSON
      b64("""{"k":96}"""), // base64 whose DECODE matches k >= 95
      b64("""{"k":1}"""),
      b64("""{"k":96}""").grouped(4).mkString("\r\n"), // line-wrapped base64
      """{"k": 8.7e1}""",
      """{"k": "NaN"}""",
      """{"k": "Inf"}""",
      """{"k": 1e308}""",
      """{"k": true}""",
      """{"k": false}""",
      // xml() receiver coverage (value must NEVER be prefiltered — only the
      // receiver-not-null condition is derivable)
      "<r><k>87</k></r>",
      "<r><k>95</k></r>",
      "<r><k>&#56;7</k></r>", // entity-encoded "87" — byte-level ≠ value
      b64("<r><k>87</k></r>"), // base64-wrapped XML (decodes then parses)
      """<r><k a="1">87</k></r>""", // attribute form: value via #text
      "<r><unclosed>" // malformed XML → helper value false
    )
    val etypes = List("error", "click", "view", "", null)
    val rows = for {
      (p, i) <- payloads.zipWithIndex
      (e, j) <- etypes.zipWithIndex
    } yield org.apache.spark.sql.Row(i.toLong * 100 + j, e, p)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("etype", org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType, nullable = true)
    ))
    spark
      .createDataFrame(rows.asJava, schema)
      .withColumn("doc",
        to_json(struct(col("id"), col("etype"), col("payload").as("body"))))
  }

  private val backing = Map("id" -> "id", "etype" -> "etype", "body" -> "payload")

  private def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  /** Ground truth straight from the interpreter over the doc strings. */
  private def interpIds(query: String): Set[Long] = {
    val interp = Interp.compile(query).fold(e => fail(s"compile: $e"), identity)
    df.select("id", "doc").collect().flatMap { r =>
      JsonTree.tryParse(r.getString(1)).collect {
        case root if interp.eval(root) => r.getLong(0)
      }
    }.toSet
  }

  private val queries = List(
    """etype == "error"""",
    """body.json().k >= 95""",
    """body.json().k > 5""",
    """body.json().k < 95""", // matches receiver-missing rows (0 < 95)
    """body.json().k <= 0""",
    """body.json().k != 95""", // matches receiver-missing rows
    """body.json().k == 42""",
    """body.json().k == "abc"""",
    """body.json().k == nil""",
    """body.json().k == true""",
    """95 <= body.json().k""", // json() on the RIGHT
    """body.json().a.b == 1""", // nested inner path
    """body.json() == "96"""", // empty inner path → whole parsed doc
    """etype == "click" and body.json().k > 10""",
    """etype == "nope" or body.json().k > 10""",
    """!(etype == "click") and body.json().k != 7""",
    """(body.json().k >= 95) or etype == """"",
    """unbackedfield == 1 and body.json().k >= 95""",
    """body.json().k == r"9[0-9]"""",
    """body.xml().r.k == 87""", // entity/base64 rows must still match
    """body.xml().r.k != 87""", // matches receiver-missing rows → no prefilter
    """body.xml().r.k >= 5""", // 0 >= 5 statically false → IsNotNull derived
    """body.xml().r.k < 95""", // 0 < 95 true: missing receivers match
    """etype == "error" and body.xml().r.k == 87""",
    """body.xml().r.k == 87 or etype == "click"""",
    // descent into a backed STRING field collapses in both tiers (the doc
    // field is a string scalar) — the prefilter is allowed to know that
    """body..k == 1""",
    """outer..k == 1""" // unbacked root: no constraint derivable
  )

  for (q <- queries)
    test(s"backed prefilter preserves results: $q") {
      val plain = ids(Bfl.queryDocs(df, "doc", q))
      val pre = ids(Bfl.queryDocs(df, "doc", q, backed = backing))
      assert(pre === plain, s"prefilter changed the result set for: $q")
      assert(plain === interpIds(q), s"queryDocs deviates from interpreter for: $q")
    }

  test("randomized query fuzz: backed prefilter never changes a result set") {
    val rnd = new scala.util.Random(20260812L) // fixed seed: deterministic
    val atoms = Array[() => String](
      () => s"""etype == "${Seq("error", "click", "", "view")(rnd.nextInt(4))}"""",
      () => s"""etype != "${Seq("error", "click")(rnd.nextInt(2))}"""",
      () => s"""body.json().k ${Seq(">=", "<", "==", "!=", ">", "<=")(rnd.nextInt(6))} ${rnd.nextInt(120) - 10}""",
      () => s"""body.json().k == "${Seq("95", "abc", "")(rnd.nextInt(3))}"""",
      () => s"""body.json().a.b ${Seq("==", "!=")(rnd.nextInt(2))} 1""",
      () => """body..k == 96""",
      () => """body.xml().r.k == 87""",
      () => """id > 500""",
      () => """unbacked == 3""",
      () => """redact("etype")"""
    )
    def gen(depth: Int): String =
      if (depth == 0 || rnd.nextInt(3) == 0) atoms(rnd.nextInt(atoms.length))()
      else rnd.nextInt(4) match {
        case 0 => s"${gen(depth - 1)} and ${gen(depth - 1)}"
        case 1 => s"${gen(depth - 1)} or ${gen(depth - 1)}"
        case 2 => s"!(${gen(depth - 1)})"
        case _ => s"(${gen(depth - 1)})"
      }
    (1 to 40).foreach { i =>
      val q = gen(2)
      val plain = ids(Bfl.queryDocs(df, "doc", q))
      val pre = ids(Bfl.queryDocs(df, "doc", q, backed = backing))
      assert(pre === plain, s"fuzz #$i: prefilter changed results for: $q")
    }
  }

  test("prefilter is non-trivial where expected, absent where not derivable") {
    def pre(q: String): Option[_] = {
      val parsed = Parser.parse(q).toOption.get
      Compiler.necessaryPrefilter(
        parsed,
        backing.map { case (f, c) =>
          f -> (c, df.schema.fields.find(_.name == c).get.dataType)
        })
    }
    assert(pre("""etype == "error" and redact("k")""").isDefined)
    assert(pre("""body.json().k >= 95""").isDefined)
    // descent through an UNBACKED root has no sound Column model
    assert(pre("""outer..k == 1""").isEmpty)
    // xml(): the VALUE is never modeled, but `op(false, lit)` statically
    // false yields the receiver-not-null necessary condition…
    assert(pre("""body.xml().r.k == 1""").isDefined)
    assert(pre("""body.xml().r.k >= 5""").isDefined)
    // …while shapes where a missing receiver MATCHES derive nothing
    assert(pre("""body.xml().r.k != 1""").isEmpty)
    assert(pre("""body.xml().r.k < 95""").isEmpty)
    assert(pre("""nope.xml().r.k == 1""").isEmpty) // unbacked receiver
    // a lone json() against an unbacked root constrains nothing
    assert(pre("""nope.json().k != 1""").isEmpty)
  }

  test("xml value rows (plain, entity-encoded, base64, #text) survive the prefilter") {
    val matched = interpIds("""body.xml().r.k == 87""")
    // the fixture rows that REALLY hold k=87 XML must be in the ground truth
    val xmlRows = ids(df.where(col("payload").isin(
      "<r><k>87</k></r>", "<r><k>&#56;7</k></r>",
      b64("<r><k>87</k></r>"), """<r><k a="1">87</k></r>""")))
    assert(xmlRows.nonEmpty && xmlRows.subsetOf(matched),
      s"xml fixtures not matched: ${xmlRows -- matched}")
    assert(ids(Bfl.queryDocs(df, "doc", """body.xml().r.k == 87""",
      backed = backing)) === matched)
  }

  test("redact transform still applied under a backed prefilter") {
    // redact the etype field — present on every matched row (the match
    // requires etype == "error"; a missing redact path is a no-op)
    val out = Bfl
      .queryDocs(df, "doc", """etype == "error" and redact("etype")""",
        backed = backing)
      .select("doc")
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getString(0).contains("[REDACTED]")))
  }

  test("base64 bodies that decode to matching JSON survive the prefilter") {
    // ground truth must include the two base64({"k":96}) rows — guards the
    // escape hatch (and this spec) against silently testing nothing
    val matched = interpIds("""body.json().k >= 95""")
    val b64Rows = ids(df.where(col("payload").isin(
      b64("""{"k":96}"""), b64("""{"k":96}""").grouped(4).mkString("\r\n"))))
    assert(b64Rows.nonEmpty && b64Rows.subsetOf(matched))
    assert(ids(Bfl.queryDocs(df, "doc", """body.json().k >= 95""",
      backed = backing)) === matched)
  }

  test("doc-byte key prefilter derives exactly the match-required keys") {
    def keys(q: String): Seq[String] =
      Compiler.docKeyPrefilter(Parser.parse(q).toOption.get)
    assert(keys("""outer..k == 1""") === Seq("k", "outer"))
    assert(keys("""a.b == 1 and c == 2""") === Seq("a", "b", "c"))
    // right or-arm is conditional; left arm's collapse still gates the match
    assert(keys("""a.b == 1 or c == 2""") === Seq("a", "b"))
    // the paren is a collapse BOUNDARY: a.b missing ⇒ inner collapses to
    // false ⇒ !false MATCHES with the key absent — no keys required
    assert(keys("""!(a.b == 1)""") === Seq.empty)
    // helper receivers coerce a missing path without collapsing — no keys
    assert(keys("""x.startsWith("q")""") === Seq.empty)
    assert(keys("""body.json().k >= 95""") === Seq.empty)
    assert(keys("""redact("a")""") === Seq.empty)
    // names that can carry in-name escapes are excluded
    assert(keys("""a["we ird"] == 1""") === Seq("a"))
  }

  test("unicode-escaped keys match through the \\u escape hatch") {
    import scala.jdk.CollectionConverters._
    // Jackson decodes "k" to key "k": the descent matches even though
    // the raw bytes contain no `"k"` — the contains-prefilter must let the
    // doc through via the \u hatch, or this row silently disappears
    // "\\u006b" spelled via concat: Scala 2 would decode a literal k
    // in ANY string literal at compile time, silently testing nothing
    val escapedKeyDoc = "{\"outer\":{\"" + "\\" + "u006b\":1}}"
    assert(!escapedKeyDoc.contains("\"k\"") && escapedKeyDoc.contains("\\u"))
    val docs = List(
      (1L, escapedKeyDoc),           // escaped key, matches ..k == 1
      (2L, """{"outer":{"k":1}}"""), // plain key, matches
      (3L, """{"outer":{"k":2}}"""), // key present, value mismatch
      (4L, """{"outer":{"x":1}}""")  // key absent → prefilter may drop
    )
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("doc", org.apache.spark.sql.types.StringType, nullable = false)))
    val d = spark.createDataFrame(
      docs.map { case (i, s) => org.apache.spark.sql.Row(i, s) }.asJava, schema)
    val got = Bfl.queryDocs(d, "doc", """outer..k == 1""")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L), s"escaped-key row lost or wrong rows matched: $got")
  }
}
