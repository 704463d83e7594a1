package graft.bfl

/** Go-compatible float formatting: `strconv.FormatFloat(f, 'g', 6, 64)`.
  *
  * BFL's string-coerced equality formats float64 operands this way
  * (reference: server/lib/eval.go:55), so `5 == 5` compares `"5" == "5"` while
  * large literals degrade to exponent form (`1.63467e+12`). %g semantics:
  * max 6 significant digits, trailing zeros removed, exponent notation when
  * the decimal exponent is < -4 or >= 6; Go prints the exponent as `e±NN`
  * (at least two digits).
  */
object GoFmt {

  /** `strconv.AppendFloat(f, 'g', -1, 64)` — SHORTEST round-trip digits in
    * Go's 'g' layout (exponent form when exp < -4 or >= 21). Used when
    * serializing documents so transformed output matches ojg byte-for-byte.
    */
  def shortest(f: Double): String = {
    if (f.isNaN) return "NaN"
    if (f.isPosInfinity) return "+Inf"
    if (f.isNegInfinity) return "-Inf"
    val neg = f < 0 || (f == 0.0 && 1 / f < 0)
    val abs = math.abs(f)
    // Java's Double.toString gives the same shortest digits; re-layout Go-style
    val js = java.lang.Double.toString(abs) // "123.456", "1.23E8", "1.0E-7"
    val (digits0, decExp) =
      if (js.contains('E')) {
        val Array(m, e) = js.split('E')
        (m.replace(".", ""), e.toInt)
      } else {
        val dot = js.indexOf('.')
        val d = js.replace(".", "")
        val lead = d.indexWhere(_ != '0')
        if (lead < 0) ("0", 0)
        else (d.substring(lead), dot - 1 - lead)
      }
    val digits = {
      val t = digits0.reverse.dropWhile(_ == '0').reverse
      if (t.isEmpty) "0" else t
    }
    val sb = new StringBuilder
    if (neg) sb += '-'
    if (decExp < -4 || decExp >= 21) {
      sb += digits.head
      if (digits.length > 1) { sb += '.'; sb ++= digits.tail }
      sb += 'e'
      sb += (if (decExp < 0) '-' else '+')
      val ea = math.abs(decExp)
      if (ea < 10) sb += '0'
      sb ++= ea.toString
    } else if (decExp >= digits.length - 1) {
      sb ++= digits
      sb ++= "0" * (decExp - digits.length + 1)
    } else if (decExp >= 0) {
      sb ++= digits.substring(0, decExp + 1)
      sb += '.'
      sb ++= digits.substring(decExp + 1)
    } else {
      sb ++= "0."
      sb ++= "0" * (-decExp - 1)
      sb ++= digits
    }
    sb.toString
  }

  def format(f: Double): String = {
    if (f.isNaN) return "NaN"
    if (f.isPosInfinity) return "+Inf"
    if (f.isNegInfinity) return "-Inf"
    if (f == 0.0) return if (1 / f < 0) "-0" else "0"

    val neg = f < 0
    val abs = math.abs(f)
    // Round to 6 significant digits (Go rounds half away from zero at this
    // precision boundary via its shortest-digits algorithm; BigDecimal
    // HALF_EVEN matches strconv's behavior on binary64 inputs).
    val bd = new java.math.BigDecimal(abs)
      .round(new java.math.MathContext(6, java.math.RoundingMode.HALF_EVEN))
    // decimal exponent: position of the leading digit
    val exp = bd.precision - bd.scale - 1
    val sb = new StringBuilder
    if (neg) sb += '-'
    if (exp < -4 || exp >= 6) {
      // exponent form: d.ddddd e±NN with trailing zeros stripped
      val unscaled = bd.unscaledValue.toString
      val digits = unscaled.reverse.dropWhile(_ == '0').reverse
      sb += digits.head
      if (digits.length > 1) { sb += '.'; sb ++= digits.tail }
      sb += 'e'
      sb += (if (exp < 0) '-' else '+')
      val ea = math.abs(exp)
      if (ea < 10) sb += '0'
      sb ++= ea.toString
    } else {
      val plain = bd.toPlainString
      val trimmed =
        if (plain.contains('.')) {
          val t = plain.reverse.dropWhile(_ == '0').reverse
          if (t.endsWith(".")) t.dropRight(1) else t
        } else plain
      sb ++= trimmed
    }
    sb.toString
  }
}
