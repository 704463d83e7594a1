package graft.bfl

import JsonTree.{Arr, Obj}
import Ast._

/** The `redact("path", …)` record transform: replaces the value at each path
  * with "[REDACTED]", supporting `..name` recursive descent and nested
  * re-encoding through `.json()` / `.xml()` boundaries with transparent
  * base64 (reference: server/lib/eval.go:406-537).
  */
object Redact {

  val REDACTED = "[REDACTED]"

  /** Mutates `root` in place; unmatched paths are skipped
    * (reference: server/lib/eval.go:526-537 — errors continue).
    */
  def apply(root: Any, params: List[String]): Unit =
    params.foreach { param =>
      val chunks = splitLiteral(param, ".json()")
      try redactRecursively(root, chunks)
      catch { case _: Exception => () }
    }

  private def splitLiteral(s: String, sep: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    var last = 0
    while ({ i = s.indexOf(sep, last); i >= 0 }) {
      out += s.substring(last, i)
      last = i + sep.length
    }
    out += s.substring(last)
    out.toList
  }

  private def parse(pathStr: String): List[Seg] =
    JsonTree
      .parsePathString(pathStr)
      .getOrElse(throw new IllegalArgumentException(s"bad path: $pathStr"))

  private def redactRecursively(obj: Any, chunks: List[String]): Unit = {
    val chunk = chunks.head
    val xmlParts = splitLiteral(chunk, ".xml()")
    val jsonPath = parse(xmlParts.head)

    val result = JsonTree.get(obj, jsonPath)
    if (result.isEmpty) throw new NoSuchElementException("no match")

    if (xmlParts.length > 1) {
      val newXml = redactXml(result.head, xmlParts(1))
      JsonTree.set(obj, jsonPath, newXml)
      return
    }

    if (chunks.length > 1) {
      // descend through a JSON-in-string boundary
      val nextJson0 = result.head match {
        case s: String => s
        case _         => throw new IllegalArgumentException("not a string")
      }
      val decoded = Interp.tryBase64(nextJson0)
      val nextJson = decoded.getOrElse(nextJson0)
      val nextObj = JsonTree
        .tryParse(nextJson)
        .getOrElse(throw new IllegalArgumentException("bad nested JSON"))
      redactRecursively(nextObj, chunks.tail)
      var newValue = JsonTree.serialize(nextObj)
      if (decoded.isDefined)
        newValue = java.util.Base64.getEncoder.encodeToString(
          newValue.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        )
      JsonTree.set(obj, jsonPath, newValue)
      return
    }

    if (xmlParts.head.startsWith("..")) {
      // leading-descent paths walk the tree comparing each KEY to the
      // '..'-stripped remainder string; `..a.b` therefore only matches a
      // literal "a.b" key (reference: server/lib/eval.go:503-518 —
      // array-index frames never match either)
      val ref = xmlParts.head.dropWhile(_ == '.')
      def walk(x: Any): Unit = x match {
        case m: Obj =>
          m.keys.toList.foreach { k =>
            if (k == ref) m.put(k, REDACTED)
            else walk(m(k))
          }
        case a: Arr => a.foreach(walk)
        case _      =>
      }
      walk(obj)
    } else {
      JsonTree.set(obj, jsonPath, REDACTED)
    }
  }

  private def redactXml(value: Any, pathStr: String): String = {
    val xml0 = value match {
      case s: String => s
      case _         => throw new IllegalArgumentException("not a string")
    }
    val decoded = Interp.tryBase64(xml0)
    val xml = decoded.getOrElse(xml0)

    val tree = XmlCodec
      .parse(xml)
      .getOrElse(throw new IllegalArgumentException("bad XML"))
    JsonTree.set(tree, parse(pathStr), REDACTED)
    var out = XmlCodec.serialize(tree)
    if (xml.length > 2 && xml.startsWith("<?")) {
      val firstLine = xml.linesIterator.next()
      out = firstLine + "\n" + out
    }
    if (decoded.isDefined)
      out = java.util.Base64.getEncoder.encodeToString(
        out.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      )
    out
  }
}
