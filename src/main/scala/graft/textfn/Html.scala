package graft.textfn

import java.util.regex.Pattern

/** HTML → anchored text (ref behavior: sift/corpora/commoncrawl.py:67-103,
  * which used dragnet + BeautifulSoup). Hand-rolled here (no external
  * HTML dependency in this environment): keep `<a href>` tags with only
  * their href attribute, unwrap every other tag, drop script/style/head
  * content, then reuse [[Wikitext.extractLinks]] for offset extraction.
  */
object Html {

  /** Pages larger than this after cleaning are dropped (ref 250 KB gate,
    * commoncrawl.py:68,75).
    */
  val MaxContentChars = 250000

  private val DropBlocks = Pattern.compile(
    "(?is)<(script|style|head|noscript)[^>]*>.*?</\\1>")
  private val Comment = Pattern.compile("(?s)<!--.*?-->")
  private val AnchorOpen = Pattern.compile(
    "(?is)<a\\b[^>]*?href\\s*=\\s*(\"([^\"]*)\"|'([^']*)')[^>]*>")
  private val AnyTag = Pattern.compile("(?s)<[^>]+>")
  private val BlockEnd = Pattern.compile(
    "(?i)(</(p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer|blockquote)\\s*>|<br\\s*/?>)")
  private val Ws = Pattern.compile("[ \\t\\x0B\\f\\r]+")

  /** Normalize an HTML fragment to text in which the only remaining markup
    * is `<a href="…">…</a>`.
    */
  def cleanHtml(html: String): String = {
    var s = Comment.matcher(html).replaceAll("")
    s = DropBlocks.matcher(s).replaceAll("")
    // canonicalize anchors to the one attribute we keep, marking them so
    // the generic tag sweep below leaves them alone
    val m = AnchorOpen.matcher(s)
    val sb = new StringBuffer
    while (m.find()) {
      val href = if (m.group(2) != null) m.group(2) else m.group(3)
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement("\u0001a href=\"" + href + "\"\u0002"))
    }
    m.appendTail(sb)
    s = sb.toString
    s = s.replaceAll("(?i)</a\\s*>", "\u0001/a\u0002")
    s = BlockEnd.matcher(s).replaceAll("\n") // block boundaries → newline
    s = AnyTag.matcher(s).replaceAll("") // unwrap everything else
    s = s.replace('\u0001', '<').replace('\u0002', '>')
    s = Ws.matcher(s).replaceAll(" ")
    Wikitext.htmlUnescape(s.trim)
  }

  /** Full page → (plain text, links with UTF-16 spans); None when the
    * cleaned content exceeds the size gate.
    */
  def parseArticle(html: String): Option[Wikitext.Parsed] = {
    val cleaned = cleanHtml(html)
    if (cleaned.length >= MaxContentChars) None
    else Some(Wikitext.extractLinks(cleaned, normalise = false))
  }
}
