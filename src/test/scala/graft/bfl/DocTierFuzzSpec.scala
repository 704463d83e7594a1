package graft.bfl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz equivalence: the compiled document tier (docCol routing through
  * get_json_object) must agree with the exact interpreter on every query it
  * accepts, across randomized docs. Queries the compiler rejects
  * (Unsupported) are skipped — that IS the contract (fallback handles them).
  */
class DocTierFuzzSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("doc-fuzz")
    .getOrCreate()

  private val rnd = new scala.util.Random(20260812L)

  private def randomDoc(): String = {
    val m = new JsonTree.Obj
    m.put("n", rnd.nextInt(100).toLong)
    m.put("d", math.round(rnd.nextDouble() * 1000) / 10.0)
    m.put("s", Seq("alpha", "beta", "gamma", "", "42", "-7.5",
      // Go ParseFloat edge forms: specials (accepted, any case), underscored
      // and hex-float literals (accepted), Java suffix / whitespace /
      // overflow (rejected -> 0)
      "Inf", "-inf", "Infinity", "NaN", "nan", "1_000.5", "0x1.8p1",
      "1.5f", " 42", "42 ", "1e1000", "+NaN")(rnd.nextInt(18)))
    if (rnd.nextBoolean()) m.put("opt", rnd.nextInt(10).toLong)
    m.put("flag", rnd.nextBoolean())
    // nullable field: absent / null / value — three distinct states
    rnd.nextInt(3) match {
      case 0 => ()
      case 1 => m.put("maybe", null)
      case 2 => m.put("maybe", rnd.nextInt(5).toLong)
    }
    val arr = new JsonTree.Arr
    (0 until rnd.nextInt(4)).foreach(_ => arr += rnd.nextInt(20).toLong)
    m.put("xs", arr)
    val nested = new JsonTree.Obj
    nested.put("k", rnd.nextInt(50).toLong)
    if (rnd.nextBoolean()) nested.put("name", Seq("x", "yy", "zzz")(rnd.nextInt(3)))
    m.put("sub", nested)
    // descent playground: `sub2..k` hits 2 nodes (multi-match wrap),
    // `sub2..ka` hits 1 array node (single-array semantics), `sub2..name`
    // hits 0 or 1 (collapse vs scalar)
    val nested2 = new JsonTree.Obj
    nested2.put("k", rnd.nextInt(50).toLong)
    val inner2 = new JsonTree.Obj
    inner2.put("k", rnd.nextInt(50).toLong)
    if (rnd.nextBoolean()) inner2.put("name", Seq("x", "yy")(rnd.nextInt(2)))
    nested2.put("inner", inner2)
    val ka = new JsonTree.Arr
    (0 until rnd.nextInt(3)).foreach(_ => ka += rnd.nextInt(20).toLong)
    nested2.put("ka", ka)
    m.put("sub2", nested2)
    JsonTree.serialize(m)
  }

  private val queries = Seq(
    """n > 50""",
    """d >= 50.0 and n < 80""",
    """s == "alpha"""",
    """s == 42""",
    """s != "beta" and d < 90""",
    """opt > 5""",
    """opt > 5 or n > 50""",
    """(opt > 5) or n > 50""",
    """sub.k >= 25""",
    """sub.name == "yy"""",
    """sub.name == "yy" or sub.k < 10""",
    """(sub.name == "yy") or sub.k < 10""",
    """s.startsWith("a") or s.endsWith("a")""",
    """s.contains("et")""",
    """n == 42 or d == 42.0""",
    """!(n > 50)""",
    """s == r"^(alpha|beta)$"""",
    """-5 < n and n <= 99""",
    """sub.missing == 1 or n > 50""",
    """(sub.missing == 1) or n > 50""",
    """s > 0""", // numeric coercion of strings ("42" -> 42, "alpha" -> 0)
    // Go ParseFloat coercion parity across tiers: Inf beats any number,
    // NaN compares false with everything, overflow/suffix/whitespace -> 0
    """s > 1000000""",
    """s < 1000000 and s >= 0""",
    """s <= n""",
    """s >= d or n > 50""",
    """n == opt""",
    // field-vs-field across types
    """n > d""",
    """s == n""",
    """sub.k == opt""",
    // regex against numbers / dynamic text
    """n == r"^4"""",
    """s != r"a"""",
    // equality with nil (missing vs present)
    """opt == nil""",
    """opt != nil or n < 3""",
    // literals-only and mixed
    """5 == 5 and n >= 0""",
    """"alpha" == s""",
    // chained comparisons (right-nested: n < (d < 100))
    """n < d < 100""",
    // deep misses in different positions
    """sub.deep.deeper == 1 and n > 0""",
    """n > 0 and sub.deep.deeper == 1""",
    // datetime constant against a numeric field (coerces)
    """n < datetime("1/1/2030, 12:00:00.000 AM")""",
    // VARIANT-tier exact dynamics: booleans, nulls, bare-path truthiness
    """flag == true""",
    """flag != false""",
    """flag and n > 20""",
    """flag or n > 90""",
    """flag > 0""", // bool numerically coerces to 1/0
    """maybe == nil""", // JSON null vs missing vs value — three-way
    """maybe != nil""",
    """maybe == 2""",
    """maybe and true""",
    """s and n > 50""", // string truthiness (non-empty)
    // runtime array semantics over the doc
    """xs == 7""", // array-vs-scalar membership
    """xs != 7""",
    """xs > 15""", // existential compare
    """xs <= 0""",
    """xs == xs""", // array deep-equal
    """xs and true""", // array truthiness (non-empty)
    """xs.startsWith("x")""", // helper on array receiver -> "" semantics
    // recursive descent on the compiled tier (TDescent): single-scalar,
    // multi-match existential, single-array flatten, zero-match collapse
    // (bare and inside and/or), regex dispatch quirks, helper receiver
    """sub..k >= 25""",
    """sub2..k == 25""",
    """sub2..k > 25""",
    """sub2..k != 7""",
    """sub2..k <= sub2..k""", // descent vs descent -> interp fallback
    """sub2..ka > 15""",
    """sub2..ka == 7""",
    """sub2..name == "yy"""",
    """sub2..name == "yy" or n > 50""",
    """(sub2..name == "yy") or n > 50""",
    """sub2..missing == 1 or n > 50""",
    """n > 50 or sub2..missing == 1""",
    """n > 0 and sub2..missing == 1""",
    """sub2..k == r"^1"""", // regex RIGHT of array-valued descent: Go's (Arr, y) arm
    """sub..name == r"y"""",
    """sub2..k and n > 0""",
    """sub..k and n > 0""",
    """sub2..k.startsWith("1")""",
    """sub2..inner.k == 25""" // descent then select continues the walk
  )

  test("compiled doc tier agrees with the interpreter on 200 random docs") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = (0 until 200).map(i => (i.toLong, randomDoc()))
    val df = docs.toDF("rid", "doc")

    var compiledCount = 0
    queries.foreach { q =>
      val parsed = Parser.parse(q).toOption.get
      val interp = new Interp(parsed)
      val expected = docs.collect {
        case (rid, d) if interp.eval(JsonTree.parse(d)) => rid
      }.toSet
      try {
        val plan = Compiler.compileQuery(df.schema, parsed, docCol = Some("doc"))
        val got = df.where(plan.pred).select("rid").as[Long].collect().toSet
        assert(got == expected,
          s"doc-tier mismatch for `$q`: only-compiled=${(got -- expected).take(5)} " +
            s"only-interp=${(expected -- got).take(5)}")
        compiledCount += 1
      } catch {
        case _: Compiler.Unsupported => () // interpreter fallback territory
      }
    }
    // most of the battery should actually exercise the compiled tier
    assert(compiledCount >= queries.size - 8, s"only $compiledCount/${queries.size} compiled")
  }
}
