package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Gopher quality-rule battery (TextAnalysis.gopherRules): hand-built
  * fixtures exercising each of the 7 Table-A1 rules in isolation —
  * every other rule holds so each test pins ONE rule's boundary.
  */
class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  // 60 words, all alphabetic, ≥2 required stops, no bullets/ellipses,
  // mean word length comfortably in [3, 10]
  private val goodText = (("the and have with of that" +
    " document words here") + " ") * 6 + "extra words tail"

  private def run(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    TextAnalysis.gopherRules(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("the good fixture passes every rule; signals are exact") {
    val out = run(1L -> goodText)(1L)
    assert(out.getAs[Boolean]("keep"))
    assert(out.getAs[Long]("n_words") === 57L) // 9*6 + 3
    assert(out.getAs[Long]("n_required_stops") === 6L)
    assert(out.getAs[Double]("alpha_word_frac") === 1.0)
    assert(out.getAs[Double]("bullet_line_frac") === 0.0)
  }

  test("rule 1 word count: 49 words fail, 50 pass") {
    val w49 = (1 to 49).map(_ => "thew").mkString(" ") + " the of"
    // 51 words total but construct exactly: use 48 fillers + the + of
    val mk = (n: Int) => ((1 to n).map(_ => "word").mkString(" ")
      + " the of")
    val out = run(1L -> mk(47), 2L -> mk(48)) // 49 vs 50 words
    assert(!out(1L).getAs[Boolean]("r_word_count"))
    assert(out(1L).getAs[Long]("n_words") === 49L)
    assert(out(2L).getAs[Boolean]("r_word_count"))
    assert(out(2L).getAs[Boolean]("keep"))
    assert(w49.nonEmpty)
  }

  test("rule 2 mean word length: a run of 1-char words drags the " +
    "mean under 3") {
    val short = ("a " * 120) + "the of"
    val out = run(1L -> short)(1L)
    assert(!out.getAs[Boolean]("r_word_len"))
    assert(!out.getAs[Boolean]("keep"))
  }

  test("rule 3 symbols: hashes past 10% of words fail; ellipses count") {
    val hashy = goodText + " " + ("#" * 8) // 8 hashes / 58 words > 0.1
    val out = run(1L -> hashy)(1L)
    assert(!out.getAs[Boolean]("r_symbol"))
    // '…' and '...' both count as one symbol each
    val ell = run(2L -> (goodText + " x… y..."))(2L)
    assert(ell.getAs[Double]("symbol_word_ratio") > 0.0)
  }

  test("rules 4+5 line shapes: all-bullet docs and ellipsis-ended " +
    "lines fail their fractions") {
    val bullets = (1 to 10).map(i => s"- item $i the of and")
      .mkString("\n") // 10/10 lines bulleted > 0.9
    val b = run(1L -> bullets)(1L)
    assert(b.getAs[Long]("n_lines") === 10L)
    assert(b.getAs[Long]("n_bullet_lines") === 10L)
    assert(!b.getAs[Boolean]("r_bullets"))
    val ells = (1 to 10).map(i =>
      if (i <= 4) s"line $i the of and..." else s"line $i the of and")
      .mkString("\n") // 4/10 = 0.4 > 0.3
    val e = run(2L -> ells)(2L)
    assert(e.getAs[Double]("ellipsis_line_frac") === 0.4)
    assert(!e.getAs[Boolean]("r_ellipsis"))
  }

  test("rule 6 alpha words: a numeric table fails the 80% bound") {
    val nums = goodText + " " + (1 to 20).map(_.toString).mkString(" ")
    val out = run(1L -> nums)(1L)
    assert(out.getAs[Long]("n_alpha_words") === 57L)
    assert(!out.getAs[Boolean]("r_alpha"))
  }

  test("rule 7 required stops: one stop word fails, two pass; " +
    "membership is distinct (repeats count once)") {
    val one = ("the " * 30) + (1 to 30).map(_ => "word").mkString(" ")
    val out = run(1L -> one)(1L)
    assert(out.getAs[Long]("n_required_stops") === 1L)
    assert(!out.getAs[Boolean]("r_stops"))
  }

  test("degenerate docs: empty and whitespace-only read zero counts, " +
    "null-proofed rule booleans, keep = false") {
    val out = run(1L -> "", 2L -> "   \n  \n")
    for (id <- Seq(1L, 2L)) {
      assert(out(id).getAs[Long]("n_words") === 0L)
      assert(!out(id).getAs[Boolean]("r_word_len"))
      assert(!out(id).getAs[Boolean]("r_alpha"))
      assert(!out(id).getAs[Boolean]("keep"))
      assert(out(id).getAs[Double]("bullet_line_frac") === 0.0)
    }
  }
}
