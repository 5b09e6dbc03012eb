package graft.functions

import graft.pgwire.PgException

/** PostgreSQL XML (`xml` type, pg §8.13/§9.15) over verbatim text —
  * the final declared-out-of-scope family, closed with the round-11
  * pattern: every behavior pinned against live pg 15 first
  * (PgParitySpec sweep-20). Construction (xmlelement/xmlforest/
  * xmlconcat/xmlcomment/xmlpi/xmlagg), validation casts, well-formed
  * checks, IS DOCUMENT, and xpath()/xpath_exists() over the JDK's
  * DOM + XPath 1.0 (no new dependencies; external entities and DTDs
  * disabled). Values stay the exact input text — pg stores and
  * round-trips the serialized form the same way.
  */
object Xml extends Serializable {

  private def builder(): javax.xml.parsers.DocumentBuilder = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    val b = f.newDocumentBuilder()
    b.setErrorHandler(null) // quiet; errors surface as exceptions
    b
  }

  private def parseDoc(s: String): org.w3c.dom.Document =
    builder().parse(new org.xml.sax.InputSource(new java.io.StringReader(s)))

  /** pg xml CONTENT: a sequence of character data and well-formed
    * elements — validated by parsing under a synthetic root.
    */
  private def isContent(s: String): Boolean =
    try { parseDoc("<graft-root>" + s + "</graft-root>"); true }
    catch { case _: Exception => false }

  private def isDocument(s: String): Boolean =
    try { parseDoc(s); true } catch { case _: Exception => false }

  def escapeContent(s: String): String = {
    val sb = new java.lang.StringBuilder
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def escapeAttr(s: String): String = {
    val sb = new java.lang.StringBuilder
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Serialize a DOM node like pg's xpath results: elements as outer
    * XML (self-closing when empty), attributes/text as their value.
    */
  private def serialize(n: org.w3c.dom.Node): String = n match {
    case e: org.w3c.dom.Element =>
      val sb = new java.lang.StringBuilder
      def walk(el: org.w3c.dom.Element): Unit = {
        sb.append('<').append(el.getTagName)
        val attrs = el.getAttributes
        var i = 0
        while (i < attrs.getLength) {
          val a = attrs.item(i)
          sb.append(' ').append(a.getNodeName).append("=\"")
            .append(escapeAttr(a.getNodeValue)).append('"')
          i += 1
        }
        val kids = el.getChildNodes
        if (kids.getLength == 0) sb.append("/>")
        else {
          sb.append('>')
          var j = 0
          while (j < kids.getLength) {
            kids.item(j) match {
              case c: org.w3c.dom.Element => walk(c)
              case t: org.w3c.dom.Text => sb.append(escapeContent(t.getData))
              case c: org.w3c.dom.Comment => sb.append("<!--").append(c.getData).append("-->")
              case other => sb.append(String.valueOf(other.getNodeValue))
            }
            j += 1
          }
          sb.append("</").append(el.getTagName).append('>')
        }
      }
      walk(e)
      sb.toString
    case other => String.valueOf(other.getNodeValue)
  }

  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val u = spark.udf
    u.register("xml_in", (s: String) =>
      if (s == null) null
      else if (isContent(s)) s
      else throw PgException("2200N", "invalid XML content"))
    u.register("pg_xml_escape", (s: String) =>
      if (s == null) null else escapeContent(s))
    u.register("pg_xml_attr", (name: String, v: String) =>
      if (v == null) "" else " " + name + "=\"" + escapeAttr(v) + "\"")
    /** `<tag attrs>content</tag>`, self-closing when content empty. */
    u.register("pg_xml_tag", (tag: String, attrs: String, content: String) => {
      val a = if (attrs == null) "" else attrs
      val c = if (content == null) "" else content
      if (c.isEmpty) "<" + tag + a + "/>"
      else "<" + tag + a + ">" + c + "</" + tag + ">"
    })
    u.register("pg_xml_forest_item", (name: String, v: String) =>
      if (v == null) null // pg omits NULL forest items
      else "<" + name + ">" + escapeContent(v) + "</" + name + ">")
    u.register("xmlcomment", (s: String) =>
      if (s == null) null
      else if (s.contains("--") || s.endsWith("-"))
        throw PgException("2200S", "invalid XML comment")
      else "<!--" + s + "-->")
    u.register("pg_xmlpi", (name: String, content: String) =>
      if (content == null || content.isEmpty) "<?" + name + "?>"
      else "<?" + name + " " + content + "?>")
    u.register("xml_is_well_formed", (s: String) =>
      (if (s == null) null else Boolean.box(isContent(s))): java.lang.Boolean)
    u.register("xml_is_well_formed_content", (s: String) =>
      (if (s == null) null else Boolean.box(isContent(s))): java.lang.Boolean)
    u.register("xml_is_well_formed_document", (s: String) =>
      (if (s == null) null else Boolean.box(isDocument(s))): java.lang.Boolean)
    u.register("pg_xml_is_document", (s: String) =>
      (if (s == null) null else Boolean.box(isDocument(s))): java.lang.Boolean)

    def evalXpath(path: String, x: String): Array[String] = {
      val doc =
        try parseDoc(if (isDocument(x)) x else "<graft-root>" + x + "</graft-root>")
        catch { case _: Exception => throw PgException("2200N", "invalid XML content") }
      val xp = javax.xml.xpath.XPathFactory.newInstance().newXPath()
      try {
        val nodes = xp.evaluate(path, doc, javax.xml.xpath.XPathConstants.NODESET)
          .asInstanceOf[org.w3c.dom.NodeList]
        Array.tabulate(nodes.getLength)(i => serialize(nodes.item(i)))
      } catch {
        case _: javax.xml.xpath.XPathExpressionException =>
          // value-typed expressions (count(), string()…) yield one
          // element, rendered via XPath 1.0 string conversion
          val v = xp.evaluate(path, doc)
          Array(if (v.endsWith(".0")) v.dropRight(2) else v)
      }
    }
    u.register("xpath", (path: String, x: String) =>
      if (path == null || x == null) null else evalXpath(path, x))
    u.register("xpath_exists", (path: String, x: String) =>
      (if (path == null || x == null) null
       else Boolean.box(evalXpath(path, x).nonEmpty)): java.lang.Boolean)
  }
}
