package graft.bfl

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the coercion laws (SURVEY §5: "ScalaCheck for coercion
  * laws"). These pin the semantics the conformance table can't enumerate.
  * (scalatestplus isn't in the offline cache, so generators are driven by a
  * small deterministic loop.)
  */
class CoercionPropSpec extends AnyFunSuite {

  private val pat = (s: String) => java.util.regex.Pattern.compile(s)

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    var seed = Seed(77L)
    (0 until 300).foreach { _ =>
      val a = ga.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val b = gb.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      f(a, b)
    }
  }

  test("%g round-trip: parsing the formatted string stays within 6-sig-digit precision") {
    forAll(Gen.choose(-1e12, 1e12)) { (d: Double) =>
      val s = GoFmt.format(d)
      val back = s.toDouble
      if (d != 0.0) {
        val rel = math.abs(back - d) / math.abs(d)
        assert(rel < 1e-5, s"format($d) = $s parses to $back (rel err $rel)")
      }
    }
  }

  test("equality via %g: numbers equal to 6 significant digits compare equal") {
    forAll(Gen.choose(-1e6, 1e6)) { (d: Double) =>
      assert(Coerce.eql(d, d, pat))
      // integral doubles equal their Long twins through string coercion
      val l = d.toLong
      assert(Coerce.eql(l, l.toDouble, pat) == (GoFmt.format(l.toDouble) == l.toString))
    }
  }

  test("eql is symmetric for scalars") {
    val scalar: Gen[Any] = Gen.oneOf(
      Gen.choose(-1e9, 1e9).map(identity[Any]),
      Gen.alphaNumStr.map(identity[Any]),
      Gen.oneOf(true, false).map(identity[Any]),
      Gen.const(null).map(identity[Any]),
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(identity[Any])
    )
    forAll(scalar, scalar) { (a: Any, b: Any) =>
      assert(Coerce.eql(a, b, pat) == Coerce.eql(b, a, pat))
    }
  }

  test("comparison trichotomy on scalars: exactly one of <, ==num, > holds") {
    forAll(Gen.choose(-1e9, 1e9), Gen.choose(-1e9, 1e9)) { (a: Double, b: Double) =>
      val lt = Coerce.cmp("<", a, b)
      val gt = Coerce.cmp(">", a, b)
      val eqn = Coerce.toNum(a) == Coerce.toNum(b)
      assert(Seq(lt, gt, eqn).count(identity) == 1)
    }
  }

  test("truthiness matches the reference's switch") {
    assert(!Coerce.toBool(""))
    assert(Coerce.toBool("x"))
    assert(!Coerce.toBool(0L) && Coerce.toBool(1L) && !Coerce.toBool(-1L))
    assert(!Coerce.toBool(0.0) && Coerce.toBool(0.5) && !Coerce.toBool(-0.5))
    assert(!Coerce.toBool(null))
  }

  test("unparseable strings coerce to 0 numerically") {
    forAll(Gen.alphaStr) { (s: String) =>
      val expected =
        try s.trim.toDouble
        catch { case _: Exception => 0.0 }
      assert(Coerce.toNum(s) == expected)
    }
  }

  test("interpreter and parser survive arbitrary printable query garbage") {
    forAll(Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)) { (junk: String) =>
      Parser.parse(junk) match {
        case Right(q) =>
          // parseable garbage must still evaluate without throwing
          new Interp(q).eval(JsonTree.parse("""{"a":1}"""))
          ()
        case Left(_) => ()
      }
    }
  }
}
