package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.textfn.Wikitext

class WikitextSpec extends AnyFunSuite {
  private val uri = "en.wikipedia.org/wiki/Test_Page"

  test("stripTemplates removes flat and nested templates") {
    assert(Wikitext.stripTemplates("a {{cite}} b") == "a  b")
    assert(Wikitext.stripTemplates("a {{x|{{y|z}}}} b") == "a  b")
    assert(Wikitext.stripTemplates("{{a}}{{b}}") == "")
  }

  test("stripTemplates bails gracefully on unbalanced braces") {
    // unbalanced open: remainder consumed as template body, no crash
    assert(Wikitext.stripTemplates("a {{open forever") == "a ")
    // stray close braces outside a template are literal text
    assert(Wikitext.stripTemplates("a }} b") == "a }} b")
  }

  test("extractCaptions hoists File captions incl. nested links") {
    val in = "Start [[File:X.jpg|thumb|A [[nested]] caption]] end"
    val out = Wikitext.extractCaptions(in)
    assert(out.contains("A [[nested]] caption"))
    assert(!out.contains("File:"))
    // caption gets terminal punctuation
    assert(out.contains("caption."))
  }

  test("htmlUnescape handles named, decimal, hex and unknown entities") {
    assert(Wikitext.htmlUnescape("a &amp; b") == "a & b")
    assert(Wikitext.htmlUnescape("&#65;&#x42;") == "AB")
    assert(Wikitext.htmlUnescape("&bogus;") == "&bogus;")
  }

  test("normaliseWikilink canonicalizes spacing and case") {
    assert(Wikitext.normaliseWikilink("political philosophy") ==
      "Political_philosophy")
    assert(Wikitext.normaliseWikilink(" x ") == "X")
  }

  test("link offsets round-trip: substring(start, stop) == anchor text") {
    val raw = "'''Test Page''' links to [[Other Page|other]] and " +
      "[[Plain Link]].\n\nSee [http://example.org/x the site] too."
    val parsed = Wikitext.parse(uri, raw)
    assert(parsed.links.nonEmpty)
    parsed.links.foreach { l =>
      assert(l.start >= 0 && l.stop <= parsed.text.length && l.start < l.stop)
    }
    // bold first phrase becomes a self-mention
    val self = parsed.links.find(_.target == uri)
    assert(self.isDefined)
    assert(parsed.text.substring(self.get.start, self.get.stop) == "Test Page")
    // piped link keeps anchor text, target normalized under the wiki prefix
    val piped = parsed.links.find(_.target.endsWith("Other_Page"))
    assert(piped.isDefined)
    assert(parsed.text.substring(piped.get.start, piped.get.stop) == "other")
  }

  test("markup removal drops categories, interlanguage links, refs, comments") {
    val raw = "Text body.<ref>cite</ref><!-- note -->\n" +
      "[[Category:Things]]\n[[fr:Texte]]"
    val cleaned = Wikitext.removeMarkup(uri, raw)
    assert(!cleaned.contains("Category"))
    assert(!cleaned.contains("fr:"))
    assert(!cleaned.contains("cite"))
    assert(!cleaned.contains("note"))
    assert(cleaned.contains("Text body."))
  }

  test("unbalanced wikilink brackets do not crash and strip leftovers") {
    val parsed = Wikitext.parse(uri, "Broken [[link without close. More text.")
    assert(!parsed.text.contains("[["))
  }
}
