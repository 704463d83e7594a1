package graft.bfl

/** Go `strconv.ParseFloat(s, 64)` with the reference's error handling:
  * `toNum`/`float64Operand` does `f, err := strconv.ParseFloat(v, 64);
  * if err != nil { f = 0 }` (reference: server/lib/eval.go:65-72), so a
  * malformed OR out-of-range string coerces to 0.
  *
  * Accepted by Go (and therefore here):
  *   - `[+-]?Inf`, `[+-]?Infinity`, `NaN` — case-insensitive, NaN unsigned
  *     (strconv/atof.go `special`: the sign branch falls through to inf only)
  *   - decimal floats with optional exponent; underscores strictly between
  *     digits (Go numeric-literal syntax): `1_000.000_1e1_0`
  *   - hex floats with MANDATORY binary exponent: `0x1.8p-2`
  * Rejected (which Java's parseDouble / Spark's cast would accept):
  *   surrounding whitespace, `f`/`d`/`F`/`D` suffixes, bare `Infinity` spelled
  *   differently than above… and syntactically-valid values that overflow
  *   (`1e1000`): Go returns ±Inf WITH ErrRange, so the reference coerces to 0.
  */
object GoFloat {

  private val ds = "\\d+(_\\d+)*" // digit run with Go underscore placement
  private val hs = "[0-9a-fA-F]+(_[0-9a-fA-F]+)*"
  private val decRe =
    s"^[+-]?($ds(\\.($ds)?)?|\\.$ds)([eE][+-]?$ds)?$$".r
  private val hexRe =
    s"^[+-]?0[xX]_?($hs(\\.($hs)?)?|\\.$hs)[pP][+-]?$ds$$".r
  private val infRe = "^(?i)[+-]?(inf|infinity)$".r
  private val nanRe = "^(?i)nan$".r

  /** Some(value) iff Go's ParseFloat succeeds WITHOUT error; None otherwise
    * (syntax error or ErrRange overflow — the caller maps None to 0.0).
    */
  def parse(s: String): Option[Double] = s match {
    case infRe(_*) =>
      Some(if (s.charAt(0) == '-') Double.NegativeInfinity else Double.PositiveInfinity)
    case nanRe(_*) => Some(Double.NaN)
    case decRe(_*) | hexRe(_*) =>
      val v = java.lang.Double.parseDouble(s.replace("_", ""))
      // syntactically finite but overflows a float64: Go's ErrRange → 0
      if (v.isInfinite) None else Some(v)
    case _ => None
  }

  /** The reference's string→number coercion: parse errors become 0. */
  def toNum(s: String): Double = parse(s).getOrElse(0.0)
}
