package graft.bfl

import com.fasterxml.jackson.core.{JsonFactory, JsonToken, JsonGenerator}
import java.io.StringWriter
import scala.collection.mutable

/** Mutable JSON document tree used by the BFL interpreter.
  *
  * Value model mirrors the reference's ojg parse results
  * (reference: server/lib/eval.go:803 `oj.ParseString`):
  * objects → mutable.LinkedHashMap[String, Any] (insertion-ordered),
  * arrays → mutable.ArrayBuffer[Any], integral numbers → Long (ojg yields
  * int64 for integral JSON numbers), other numbers → Double, strings, booleans,
  * null. The Long/Double split is load-bearing: string coercion formats Long
  * with all digits but Double via Go `%g` with 6 significant digits.
  */
object JsonTree {
  type Obj = mutable.LinkedHashMap[String, Any]
  type Arr = mutable.ArrayBuffer[Any]

  private val factory = new JsonFactory()

  def parse(json: String): Any = {
    val p = factory.createParser(json)
    try {
      val t = p.nextToken()
      if (t == null) throw new IllegalArgumentException("empty JSON")
      val v = readValue(p, t)
      if (p.nextToken() != null)
        throw new IllegalArgumentException("trailing JSON content")
      v
    } finally p.close()
  }

  def tryParse(json: String): Option[Any] =
    try Some(parse(json))
    catch { case _: Exception => None }

  private def readValue(p: com.fasterxml.jackson.core.JsonParser, t: JsonToken): Any =
    t match {
      case JsonToken.START_OBJECT =>
        val m = new Obj
        var ft = p.nextToken()
        while (ft != JsonToken.END_OBJECT) {
          val name = p.currentName()
          val vt = p.nextToken()
          m.put(name, readValue(p, vt))
          ft = p.nextToken()
        }
        m
      case JsonToken.START_ARRAY =>
        val a = new Arr
        var vt = p.nextToken()
        while (vt != JsonToken.END_ARRAY) {
          a += readValue(p, vt)
          vt = p.nextToken()
        }
        a
      case JsonToken.VALUE_STRING      => p.getText
      case JsonToken.VALUE_NUMBER_INT  =>
        // ints wider than int64 degrade to double, like ojg
        try p.getLongValue
        catch { case _: Exception => p.getDoubleValue }
      case JsonToken.VALUE_NUMBER_FLOAT => p.getDoubleValue
      case JsonToken.VALUE_TRUE         => true
      case JsonToken.VALUE_FALSE        => false
      case JsonToken.VALUE_NULL         => null
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }

  def serialize(v: Any): String = {
    val sw = new StringWriter
    val g = factory.createGenerator(sw)
    writeValue(g, v)
    g.close()
    sw.toString
  }

  private def writeValue(g: JsonGenerator, v: Any): Unit = v match {
    case null          => g.writeNull()
    case m: Obj        =>
      g.writeStartObject()
      m.foreach { case (k, x) => g.writeFieldName(k); writeValue(g, x) }
      g.writeEndObject()
    case a: Arr        =>
      g.writeStartArray()
      a.foreach(writeValue(g, _))
      g.writeEndArray()
    case s: String     => g.writeString(s)
    case b: Boolean    => g.writeBoolean(b)
    case l: Long       => g.writeNumber(l)
    case i: Int        => g.writeNumber(i.toLong)
    case d: Double     =>
      // integral doubles print without a fraction, like ojg/Go
      if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15)
        g.writeNumber(d.toLong)
      else g.writeNumber(GoFmt.shortest(d)) // Go 'g' layout, not Java's E-form
    case other         => g.writeString(other.toString)
  }

  import Ast._

  /** JSONPath get over the tree — ojg `jp.Expr.Get` semantics: each segment
    * fans out over current matches; zero final matches means "missing".
    */
  def get(root: Any, path: List[Seg]): List[Any] = {
    var cur: List[Any] = List(root)
    path.foreach { seg =>
      cur = cur.flatMap(v => step(v, seg))
    }
    cur
  }

  private def step(v: Any, seg: Seg): List[Any] = seg match {
    case Field(n) =>
      v match {
        case m: Obj if m.contains(n) => List(m(n))
        case _                       => Nil
      }
    case Key(k) =>
      v match {
        case m: Obj if m.contains(k) => List(m(k))
        case _                       => Nil
      }
    case Index(i) =>
      v match {
        case a: Arr =>
          val idx = if (i < 0) a.length + i else i
          if (idx >= 0 && idx < a.length) List(a(idx)) else Nil
        case _ => Nil
      }
    case Wildcard =>
      v match {
        case a: Arr => a.toList
        case m: Obj => m.values.toList
        case _      => Nil
      }
    case Descent(n) =>
      val out = mutable.ListBuffer[Any]()
      def walk(x: Any): Unit = x match {
        case m: Obj =>
          m.foreach { case (k, c) =>
            if (k == n) out += c
            walk(c)
          }
        case a: Arr => a.foreach(walk)
        case _      =>
      }
      walk(v)
      out.toList
  }

  /** Set `value` at `path` (existing locations; creates a final map key).
    * Mirrors ojg `jp.Expr.Set` for the shapes redact produces.
    */
  def set(root: Any, path: List[Seg], value: Any): Unit = {
    if (path.isEmpty) return
    val parents = get(root, path.init)
    val last = path.last
    parents.foreach { p =>
      (p, last) match {
        case (m: Obj, Field(n)) => m.put(n, value)
        case (m: Obj, Key(k))   => m.put(k, value)
        case (a: Arr, Index(i)) =>
          val idx = if (i < 0) a.length + i else i
          if (idx >= 0 && idx < a.length) a(idx) = value
        case (a: Arr, Wildcard) => a.indices.foreach(a(_) = value)
        case (m: Obj, Wildcard) => m.keys.toList.foreach(m.put(_, value))
        case (p, Descent(n)) =>
          // ojg descent-Set semantics: sets the field at every depth
          // (including maps that lack it) — this is why redact routes
          // LEADING `..name` through a walk instead (reference:
          // server/lib/eval.go:503-521); non-prefix `a..name` uses jp.Set
          def walkSet(x: Any): Unit = x match {
            case m: Obj =>
              m.keys.toList.foreach(k => if (k != n) walkSet(m(k)))
              m.put(n, value)
            case a: Arr => a.foreach(walkSet)
            case _      =>
          }
          walkSet(p)
        case _ =>
      }
    }
  }

  /** Parse a redact-parameter path string (`a.b[0]["k"]`, `..name`, leading
    * dots tolerated) into segments (reference feeds these to jp.ParseString,
    * server/lib/eval.go:447).
    */
  def parsePathString(s: String): Option[List[Seg]] = {
    val out = mutable.ListBuffer[Seg]()
    var i = 0
    val n = s.length
    def readIdent(): String = {
      val start = i
      while (i < n && s.charAt(i) != '.' && s.charAt(i) != '[') i += 1
      s.substring(start, i)
    }
    try {
      // leading identifier without dot
      if (i < n && s.charAt(i) != '.' && s.charAt(i) != '[') {
        val id = readIdent()
        if (id.nonEmpty) out += Field(id)
      }
      while (i < n) {
        s.charAt(i) match {
          case '.' =>
            var dots = 0
            while (i < n && s.charAt(i) == '.') { dots += 1; i += 1 }
            if (i < n && s.charAt(i) != '[') {
              val id = readIdent()
              if (id.nonEmpty) {
                if (dots >= 2) out += Descent(id)
                else out += Field(id)
              }
            }
          case '[' =>
            i += 1
            val close = s.indexOf(']', i)
            if (close < 0) return None
            val inner = s.substring(i, close).trim
            i = close + 1
            if (inner == "*") out += Wildcard
            else if (inner.startsWith("\"") || inner.startsWith("'"))
              out += Key(inner.substring(1, inner.length - 1))
            else out += Index(inner.toInt)
          case _ => return None
        }
      }
      Some(out.toList)
    } catch { case _: Exception => None }
  }
}
