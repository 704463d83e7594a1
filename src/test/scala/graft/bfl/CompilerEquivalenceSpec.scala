package graft.bfl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The compiled Column tier must agree with the exact interpreter on every
  * query in the supported subset. Runs both tiers over the same rows (typed
  * columns for the compiler, `to_json(struct(*))` docs for the interpreter)
  * and compares the matched id sets.
  */
class CompilerEquivalenceSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("bfl-compiler-equiv")
    .getOrCreate()

  private lazy val events = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.events(spark, "/root/testdata/sf0.001")
  }

  private def compiledMatches(q: String): Set[Long] = {
    val plan = Compiler.compile(events, q)
    events
      .where(plan.pred)
      .select("event_id")
      .collect()
      .map(_.getLong(0))
      .toSet
  }

  private def interpMatches(q: String): Set[Long] = {
    val interp = Interp.compile(q).fold(e => fail(s"compile: $e"), identity)
    // document view of the row: ts as epoch millis (matches compiled
    // TTimestamp coercion), other columns as-is
    val docs = events
      .withColumn("doc", to_json(struct(
        col("event_id"), unix_millis(col("ts")).as("ts"), col("user_id"),
        col("event_type"), col("value"),
        // the compiled tier treats a StringType column as a JSON document
        // boundary (get_json_object); the equivalent document view nests the
        // parsed object
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).as("props")
      )))
      .select("event_id", "doc")
      .collect()
    docs.flatMap { row =>
      val id = row.getLong(0)
      val parsed = JsonTree.parse(row.getString(1))
      if (interp.eval(parsed)) Some(id) else None
    }.toSet
  }

  private def agree(q: String): Unit = {
    val c = compiledMatches(q)
    val i = interpMatches(q)
    assert(c == i, s"tier mismatch for `$q`: compiled=${c.size} interp=${i.size}, " +
      s"only-compiled=${(c -- i).take(5)}, only-interp=${(i -- c).take(5)}")
    ()
  }

  private val queries = List(
    // equality + coercions on typed columns
    """event_type == "click"""",
    """event_type != "click"""",
    """user_id == 12""",
    """value > 100""",
    """value >= 185.22""",
    """value < 5.5""",
    """user_id >= 10 and value < 50""",
    // logicals + parens + not
    """event_type == "signup" or event_type == "error"""",
    """!(user_id == 0) and value > 150""",
    """event_type == "purchase" and (value > 100 or user_id < 3)""",
    // string helpers
    """event_type.startsWith("s")""",
    """event_type.endsWith("ck")""",
    """event_type.contains("lick")""",
    // regex
    """event_type == r"^(click|view)$"""",
    """event_type != r"^(click|view)$"""",
    """event_type == r"err"""",
    // missing path collapse — whole expression false even with or-true
    """nonexistent.path == "x" or event_type == "click"""",
    """event_type == "click" and nonexistent.path == "x"""",
    // false-and short-circuit saves the missing path
    """false and nonexistent.path == "x" or event_type == "error"""",
    // literals only
    """true""", """false""", """5 > 3""",
    // JSON document column access
    """props.k > 50""",
    """props.k == 12""",
    """props.k <= 3 or props.k >= 95""",
    """props.missing == 1 or true""",
    // field-vs-field
    """user_id < value""",
    // numbers as strings quirks
    """event_type == 5""",
    // nil compare: JSON doc has no nulls; missing → collapse
    """props.k != nil""",
    // parentheses as collapse boundary
    """(nonexistent.path == "x") or event_type == "click"""",
    """!(nonexistent.path == "x") and event_type == "error"""",
    // missing helper receiver → "false"
    """nonexistent.path.startsWith("fal")""",
    """nonexistent.path.contains("x") or event_type == "signup""""
  )

  test("compiled tier matches interpreter on the supported subset") {
    queries.foreach(agree)
  }

  test("timestamp compare against datetime() folds to native range") {
    // events span 2024-01-01..+; datetime in the middle
    agree("""ts >= datetime("3/1/2024, 12:00:00.000 AM")""")
    agree("""ts < datetime("2/15/2024, 6:30:00.000 PM")""")
  }

  test("limit extraction caps results") {
    val plan = Compiler.compile(events, """value > 0 and limit(7)""")
    assert(plan.limit.contains(7L))
  }

  test("unsupported shapes raise Unsupported") {
    intercept[Compiler.Unsupported] {
      Compiler.compile(events, """props.json().x == 1""")
    }
    intercept[Compiler.Unsupported] {
      Compiler.compile(events, """event_type == "x" and redact("props")""")
    }
  }

  test("mixed-type array equality falls back to the interpreter instead of failing") {
    // array<string> === array<double> can't be statically reconciled —
    // Bfl.filter must degrade to the exact tier, not throw
    val df = events
      .withColumn("tags", array(col("event_type")))
      .withColumn("vals", array(col("value")))
    val applied = Bfl.filter(df, """tags.* == vals.*""")
    assert(!applied.usedCompiled)
    applied.df.count() // must evaluate without throwing
  }

  test("wildcard semantics: singleton unwrap, empty collapse, null elements") {
    import spark.implicits._
    // rows with arrays of size 0 / 1 / 2 (incl. a null element)
    val df = Seq(
      (0L, Seq.empty[java.lang.Long], Seq.empty[String]),
      (1L, Seq[java.lang.Long](0L), Seq("xy")),
      (2L, Seq[java.lang.Long](7L), Seq("ab")),
      (3L, Seq[java.lang.Long](1L, 9L), Seq("xy", "zz")),
      (4L, Seq[java.lang.Long](null, 5L), Seq("a", "b"))
    ).toDF("rid", "nums", "strs")

    def interpSet(q: String): Set[Long] = {
      val in = Interp.compile(q).toOption.get
      df.select(to_json(struct(col("rid"), col("nums"), col("strs"))))
        .as[String].collect()
        .flatMap { j =>
          val root = JsonTree.parse(j)
          val rid = JsonTree.get(root, List(Ast.Field("rid"))).head.asInstanceOf[Long]
          if (in.eval(root)) Some(rid) else None
        }.toSet
    }
    def compiledSet(q: String): Set[Long] = {
      val plan = Compiler.compile(df, q)
      df.where(plan.pred).select("rid").as[Long].collect().toSet
    }
    val qs = Seq(
      """nums.* and true""", // [0] unwraps to falsy scalar; [] collapses
      """nums.* == 1 or true""", // empty wildcard collapses through or
      """nums.* > 4""", // existential incl. null element (coerces to 0)
      """nums.* == nil""", // null element membership
      """strs.*.startsWith("x")""", // singleton receiver unwraps
      """nums.* > nums.*""", // array-vs-array with singletons
      """nums.* <= nums.*""",
      """strs.* == strs.*""" // deep equal / unwrap mix
    )
    qs.foreach { q =>
      assert(compiledSet(q) == interpSet(q), s"array-semantics mismatch for `$q`")
    }
  }

  test("out-of-range index on a typed array collapses instead of ANSI-throwing") {
    val df = events.withColumn("tags", array(col("event_type")))
    // index 5 on a 1-element array: BFL collapse (row dropped), not an error
    val plan = Compiler.compile(df, """tags[5] == "x" or event_type == "click"""")
    assert(df.where(plan.pred).count() == 0) // collapse propagates through or
    val plan2 = Compiler.compile(df, """(tags[5] == "x") or event_type == "click"""")
    assert(df.where(plan2.pred).count() > 0) // paren boundary absorbs it
  }

  test("integral literal vs long column compares natively (pushable)") {
    val plan = Compiler.compile(events, """user_id <= 5""")
    val got = events.where(plan.pred).select("event_id").collect().map(_.getLong(0)).toSet
    val exp = events.where(col("user_id") <= 5).select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == exp)
  }

  test("fallback tier handles redact end-to-end") {
    val df = events.withColumn("doc",
      to_json(struct(col("event_id"), col("event_type"), col("value"))))
    val out = Bfl.queryDocs(df, "doc", """event_type == "error" and redact("value")""")
    val rows = out.select("doc").limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).contains("\"value\":\"[REDACTED]\""))
    }
  }
}
