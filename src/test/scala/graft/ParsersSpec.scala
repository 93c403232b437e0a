package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.textfn.{Html, Warc, WikiXml}

class HtmlSpec extends AnyFunSuite {
  test("cleanHtml keeps only anchors, drops script/style/head") {
    val html = "<html><head><title>T</title></head><body>" +
      "<p>Visit <a href='http://x.org/a' class=\"z\">site A</a> now.</p>" +
      "<script>alert(1)</script></body></html>"
    val out = Html.cleanHtml(html)
    assert(!out.contains("alert"))
    assert(!out.contains("<p>"))
    assert(out.contains("<a href=\"http://x.org/a\">site A</a>"))
  }

  test("parseArticle extracts offset-correct links") {
    val p = Html.parseArticle(
      "<p>Read <a href=\"http://x.org\">this page</a> closely.</p>").get
    val l = p.links.head
    assert(p.text.substring(l.start, l.stop) == "this page")
    assert(l.target == "http://x.org")
  }

  test("parseArticle enforces the size gate") {
    val big = "<p>" + ("x" * Html.MaxContentChars) + "</p>"
    assert(Html.parseArticle(big).isEmpty)
  }

  test("block-level boundaries become newlines") {
    val out = Html.cleanHtml("<h1>Title</h1><p>Body text.</p>")
    assert(out == "Title\nBody text.")
  }
}

class WarcSpec extends AnyFunSuite {
  private def rec(uri: String, status: String, body: String) =
    s"WARC-Type: response\r\nWARC-Target-URI: $uri\r\n\r\n" +
      s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n\r\n$body"

  test("parseRecord keeps HTTP 200 responses with their body") {
    val r = Warc.parseRecord(rec("http://x.org", "200 OK", "<b>hi</b>"))
    assert(r.contains(Warc.WarcRecord("http://x.org", "<b>hi</b>")))
  }

  test("parseRecord drops non-200, missing URI and malformed records") {
    assert(Warc.parseRecord(rec("http://x.org", "404 Not Found", "nope")).isEmpty)
    assert(Warc.parseRecord("no headers here").isEmpty)
    assert(Warc.parseRecord(
      "WARC-Type: response\r\n\r\nHTTP/1.1 200 OK\r\n\r\nbody").isEmpty)
  }
}

class WikiXmlSpec extends AnyFunSuite {
  test("parsePage extracts title, ns, id, revision text") {
    val p = WikiXml.parsePage(
      """<page><title>A B</title><ns>0</ns><id>7</id>
        |<revision><id>99</id><text>Body &amp; more</text></revision>
        |</page>""".stripMargin).get
    assert(p.uri == "en.wikipedia.org/wiki/A_B")
    assert(p.ns == "0")
    assert(p.pageId == 7L)
    assert(p.redirect.isEmpty)
    assert(p.content.contains("Body & more"))
  }

  test("redirect pages carry the target and no content") {
    val p = WikiXml.parsePage(
      "<page><title>R</title><ns>0</ns><id>8</id>" +
        "<redirect title=\"Target\"/>" +
        "<revision><text>#REDIRECT [[Target]]</text></revision></page>").get
    assert(p.redirect.contains("Target"))
    assert(p.content.isEmpty)
  }

  test("malformed XML yields None, not an exception") {
    assert(WikiXml.parsePage("<page><title>X").isEmpty ||
      WikiXml.parsePage("<page><title>X").get.pageId == -1L)
    assert(WikiXml.parsePage("not xml at all <<<").isEmpty)
  }
}
