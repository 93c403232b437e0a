package graft.textfn

/** WARC record parsing (ref behavior: sift/corpora/commoncrawl.py:18-58).
  *
  * The scan splits archive files on the "WARC/1.0\r\n" record delimiter
  * (done Spark-side with the text source's lineSep option); this parser
  * takes one record's content — WARC headers, then an HTTP response —
  * and yields (url, body) for HTTP 200 'response' records.
  */
object Warc {

  final case class WarcRecord(url: String, body: String)

  def parseRecord(record: String): Option[WarcRecord] = {
    // WARC headers end at the first blank line
    val headerEnd = record.indexOf("\r\n\r\n")
    if (headerEnd < 0) return None
    val headers = record.substring(0, headerEnd)
    val url = headers.linesIterator
      .find(_.toLowerCase.startsWith("warc-target-uri:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse("")
    if (url.isEmpty) return None

    val payload = record.substring(headerEnd + 4)
    // keep only HTTP 200 responses; body follows the HTTP header block
    val statusLine = payload.takeWhile(_ != '\r')
    if (!(statusLine.startsWith("HTTP/") && statusLine.contains("200"))) return None
    val bodyStart = payload.indexOf("\r\n\r\n")
    if (bodyStart < 0) None
    else Some(WarcRecord(url, payload.substring(bodyStart + 4)))
  }
}
