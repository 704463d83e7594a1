package graft.bfl

import scala.collection.mutable
import scala.xml.{Elem, Node, Text, XML}
import JsonTree.{Arr, Obj}

/** XML ↔ map-tree codec mimicking the reference's mxj usage
  * (reference: server/lib/eval.go:379-439 via github.com/clbanning/mxj):
  * attributes become `-name` keys, text content of an element that also has
  * attributes/children becomes `#text`, repeated child tags become arrays, and
  * serialization orders sibling elements alphabetically by tag (mxj iterates a
  * Go map with sorted keys), which the reference's redact goldens rely on.
  */
object XmlCodec {

  def parse(xml: String): Option[Obj] =
    try {
      // StAX pull parse (several times faster per row than building a
      // scala.xml DOM; the interpreter tier parses XML bodies per record)
      val f = staxFactory.get()
      val r = f.createXMLStreamReader(new java.io.StringReader(xml))
      try {
        while (r.hasNext && !r.isStartElement) r.next()
        if (!r.isStartElement) return None
        val (label, value) = readElem(r)
        val m = new Obj
        m.put(label, value)
        Some(m)
      } finally r.close()
    } catch { case _: Exception => None }

  private val staxFactory = new ThreadLocal[javax.xml.stream.XMLInputFactory] {
    override def initialValue(): javax.xml.stream.XMLInputFactory = {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f
    }
  }

  /** reads the element the reader is positioned on; returns (label, value)
    * with the same map shape as [[elemToValue]]
    */
  private def readElem(r: javax.xml.stream.XMLStreamReader): (String, Any) = {
    val label = r.getLocalName
    val attrs = (0 until r.getAttributeCount)
      .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i))
    val text = new StringBuilder
    val grouped = mutable.LinkedHashMap[String, mutable.ArrayBuffer[Any]]()
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          val (cl, cv) = readElem(r)
          grouped.getOrElseUpdate(cl, mutable.ArrayBuffer[Any]()) += cv
        case javax.xml.stream.XMLStreamConstants.CHARACTERS |
            javax.xml.stream.XMLStreamConstants.CDATA =>
          text ++= r.getText
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT => done = true
        case _ => ()
      }
    }
    val trimmed = text.toString.trim
    if (attrs.isEmpty && grouped.isEmpty) (label, trimmed)
    else {
      val m = new Obj
      attrs.foreach { case (k, v) => m.put("-" + k, v) }
      grouped.foreach { case (tag, vs) =>
        if (vs.length == 1) m.put(tag, vs.head)
        else { val a = new Arr; a ++= vs; m.put(tag, a) }
      }
      if (trimmed.nonEmpty) m.put("#text", trimmed)
      (label, m)
    }
  }

  /** scala-xml DOM parse — kept as the equivalence reference. */
  def parseDom(xml: String): Option[Obj] =
    try {
      val root = XML.loadString(xml)
      val m = new Obj
      m.put(root.label, elemToValue(root))
      Some(m)
    } catch { case _: Exception => None }

  private def elemToValue(e: Elem): Any = {
    val attrs = e.attributes.asAttrMap // name -> value
    val childElems = e.child.collect { case c: Elem => c }
    val text = e.child.collect { case t: Text => t.data }.mkString.trim

    if (attrs.isEmpty && childElems.isEmpty) text
    else {
      val m = new Obj
      attrs.foreach { case (k, v) => m.put("-" + k, v) }
      // group repeated tags preserving document order within each tag
      val grouped = mutable.LinkedHashMap[String, mutable.ArrayBuffer[Any]]()
      childElems.foreach { c =>
        grouped.getOrElseUpdate(c.label, mutable.ArrayBuffer[Any]()) += elemToValue(c)
      }
      grouped.foreach { case (tag, vs) =>
        if (vs.length == 1) m.put(tag, vs.head)
        else {
          val a = new Arr; a ++= vs; m.put(tag, a)
        }
      }
      if (text.nonEmpty) m.put("#text", text)
      m
    }
  }

  /** Serialize the map tree back to XML, mxj-style: single root key, sibling
    * elements sorted alphabetically, attributes from `-` keys, `#text` as text.
    */
  def serialize(tree: Obj): String = {
    val sb = new StringBuilder
    tree.foreach { case (tag, v) => writeElem(sb, tag, v) }
    sb.toString
  }

  // mxj's Map.Xml() does NOT escape character data or attribute values by
  // default (XMLEscapeChars is opt-in) — raw output is the bug-compatible
  // reference behavior
  private def xmlEscape(s: String): String = s
  private def attrEscape(s: String): String = s

  private def writeElem(sb: StringBuilder, tag: String, v: Any): Unit = v match {
    case a: Arr => a.foreach(writeElem(sb, tag, _))
    case m: Obj =>
      val attrs = m.toList.collect { case (k, av) if k.startsWith("-") => (k.drop(1), av) }
      val text = m.get("#text")
      val children = m.toList.filter { case (k, _) => !k.startsWith("-") && k != "#text" }
      sb += '<'; sb ++= tag
      attrs.sortBy(_._1).foreach { case (k, av) =>
        sb += ' '; sb ++= k; sb ++= "=\""; sb ++= attrEscape(String.valueOf(av)); sb += '"'
      }
      sb += '>'
      children.sortBy(_._1).foreach { case (k, cv) => writeElem(sb, k, cv) }
      text.foreach(t => sb ++= xmlEscape(String.valueOf(t)))
      sb ++= "</"; sb ++= tag; sb += '>'
    case other =>
      sb += '<'; sb ++= tag; sb += '>'
      sb ++= xmlEscape(String.valueOf(other))
      sb ++= "</"; sb ++= tag; sb += '>'
  }
}
