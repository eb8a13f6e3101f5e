package graft.codec

/** sitemaps.org XML parsing (the content the robots.txt `Sitemap:` lines
  * point at — f11 discovers the pointers, this reads them): `<urlset>`
  * entries with optional W3C-datetime `<lastmod>`, and `<sitemapindex>`
  * child-sitemap expansion. Real XML parsing (JDK DOM, namespace-aware on
  * local names), lenient: malformed documents yield no entries rather
  * than failing a crawl round. */
object Sitemap {

  final case class Entry(loc: String, lastmod: Option[java.sql.Timestamp])

  private def parseDom(xml: String): Option[org.w3c.dom.Document] =
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      // never fetch DTDs/entities (zero egress + XXE hygiene)
      f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
      f.setFeature("http://xml.org/sax/features/external-general-entities", false)
      f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
      val b = f.newDocumentBuilder()
      b.setErrorHandler(null)
      Some(b.parse(new org.xml.sax.InputSource(new java.io.StringReader(xml))))
    } catch { case _: Exception => None }

  private def childText(e: org.w3c.dom.Element, local: String): Option[String] = {
    val kids = e.getChildNodes
    var i = 0
    while (i < kids.getLength) {
      val n = kids.item(i)
      if (n.getNodeType == org.w3c.dom.Node.ELEMENT_NODE &&
          Option(n.getLocalName).getOrElse(n.getNodeName) == local)
        return Option(n.getTextContent).map(_.trim).filter(_.nonEmpty)
      i += 1
    }
    None
  }

  private def elements(doc: org.w3c.dom.Document, local: String): Vector[org.w3c.dom.Element] = {
    val ns = doc.getElementsByTagNameNS("*", local)
    (0 until ns.getLength).map(ns.item(_).asInstanceOf[org.w3c.dom.Element]).toVector
  }

  /** W3C datetime (sitemaps.org lastmod): full date `YYYY-MM-DD` (UTC
    * midnight) or RFC3339 datetime with offset. Unparseable → None. */
  def lastmodTs(s: String): Option[java.sql.Timestamp] =
    try {
      val t = s.trim
      if (t.length == 10) Some(java.sql.Timestamp.from(
        java.time.LocalDate.parse(t).atStartOfDay(java.time.ZoneOffset.UTC).toInstant))
      else Some(java.sql.Timestamp.from(java.time.OffsetDateTime.parse(t).toInstant))
    } catch { case _: Exception => None }

  /** `<urlset>` entries: (loc, lastmod). Entries without a loc drop. */
  def parse(xml: String): Vector[Entry] =
    parseDom(xml).toVector.flatMap { doc =>
      elements(doc, "url").flatMap { u =>
        childText(u, "loc").map(loc =>
          Entry(loc, childText(u, "lastmod").flatMap(lastmodTs)))
      }
    }

  /** `<sitemapindex>` child sitemap locations. */
  def parseIndex(xml: String): Vector[String] =
    parseDom(xml).toVector.flatMap { doc =>
      elements(doc, "sitemap").flatMap(childText(_, "loc"))
    }
}
