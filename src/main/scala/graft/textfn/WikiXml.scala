package graft.textfn

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import java.io.StringReader

/** MediaWiki dump `<page>` parsing (ref behavior:
  * sift/corpora/wikicorpus.py:175-186). The dump is split Spark-side on
  * the "\n  </page>\n" record delimiter; this parses a single page's XML
  * with StAX (record-local, no document-level XML library needed).
  */
object WikiXml {

  final case class WikiPage(
      uri: String, ns: String, pageId: Long,
      redirect: Option[String], content: Option[String])

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    // coalesce adjacent CHARACTERS events so split text (entities, CDATA,
    // parser buffer boundaries) doesn't truncate title/ns or break id parse
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f
  }

  def parsePage(xml: String): Option[WikiPage] = {
    try {
      val r = factory.createXMLStreamReader(new StringReader(xml))
      var title: String = null
      var ns: String = null
      var pageId: Long = -1L
      var redirect: Option[String] = None
      var text: String = null
      var inRevision = false
      var path = List.empty[String]
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            path = name :: path
            name match {
              case "revision" => inRevision = true
              case "redirect" =>
                redirect = Option(r.getAttributeValue(null, "title"))
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS if path.nonEmpty =>
            path.head match {
              case "title" if title == null => title = r.getText
              case "ns" if ns == null => ns = r.getText.trim
              case "id" if pageId < 0 && !inRevision =>
                pageId = r.getText.trim.toLong
              case "text" if inRevision =>
                text = if (text == null) r.getText else text + r.getText
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "revision") inRevision = false
            if (path.nonEmpty) path = path.tail
          case _ =>
        }
      }
      r.close()
      if (title == null) None
      else Some(WikiPage(
        uri = Wikitext.WikiPrefix + title.replace(' ', '_'),
        ns = if (ns == null) "0" else ns,
        pageId = pageId,
        redirect = redirect,
        content = if (redirect.isDefined) None else Option(text)))
    } catch { case _: Exception => None }
  }
}
