package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Mentions
import graft.ops.Mentions.{DocIn, LinkIn}

class MentionsSpec extends AnyFunSuite {
  private val text =
    "Alpha beta gamma delta. Epsilon zeta eta theta. Iota kappa."
  //   0         1         2         3         4         5
  //   0123456789012345678901234567890123456789012345678901234567890

  test("mention is the containing sentence with a rebased span") {
    val doc = DocIn("d1", text, Seq(LinkIn("en.wikipedia.org/wiki/Zeta", 32, 36)))
    val Seq(m) = Mentions.extract(doc)
    assert(m.text == "Epsilon zeta eta theta.")
    assert(m.text.substring(m.start, m.stop) == "zeta")
    assert(m.source == "d1")
  }

  test("whole-sentence mentions are dropped") {
    val doc = DocIn("d1", text, Seq(LinkIn("t", 24, 47)))
    assert(Mentions.extract(doc).isEmpty)
  }

  test("strict mode drops list items and unpunctuated sentences") {
    val listy = DocIn("d", "* item with link here\n", Seq(LinkIn("t", 12, 16)))
    assert(Mentions.extract(listy).isEmpty)
    assert(Mentions.extract(listy, strict = false).nonEmpty)
    val noDot = DocIn("d", "sentence with no terminal mark",
      Seq(LinkIn("t", 0, 8)))
    assert(Mentions.extract(noDot).isEmpty)
  }

  test("target URL normalization trims fragment and protocol") {
    val doc = DocIn("d", text,
      Seq(LinkIn("https://en.wikipedia.org/wiki/Zeta#part", 32, 36)))
    val Seq(m) = Mentions.extract(doc)
    assert(m.target == "en.wikipedia.org/wiki/Zeta")
    val Seq(raw) = Mentions.extract(doc, normUrl = false)
    assert(raw.target == "https://en.wikipedia.org/wiki/Zeta#part")
  }

  test("a 3-sentence window extends context both ways") {
    val doc = DocIn("d1", text, Seq(LinkIn("t", 32, 36)))
    val Seq(m) = Mentions.extract(doc, window = 3)
    assert(m.text == text)
    assert(m.text.substring(m.start, m.stop) == "zeta")
  }
}
