package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bpe

/** BPE merge learning: hand-computed merge sequence, greedy overlap
  * semantics, tie-breaking, and partitioning invariance.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  test("learnMerges reproduces the hand-computed merge sequence " +
      "with greedy overlap and (count, src, dst) tie-break") {
    val s = spark; import s.implicits._
    // words: aaab ×2, aab ×1.
    // round 1: (a,a) = 2·2 + 1 = 5  (aaab has TWO (a,a) positions)
    //   apply greedy: " a a a b " -> " aa a b " (left-to-right, never
    //   " a aa b "); " a a b " -> " aa b "
    // round 2: (aa,a)=2, (a,b)=2, (aa,b)=1 — tie at 2, src 'a' < 'aa'
    //   -> (a,b); " aa a b " -> " aa ab ", " aa b " unchanged
    // round 3: (aa,ab)=2 beats (aa,b)=1
    val docs = Seq((1L, "aaab aab"), (2L, "aaab")).toDF("doc_id", "text")
    val out = Bpe.learnMerges(docs, 3).orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", 5L), (2L, "a", "b", 2L), (3L, "aa", "ab", 2L)))
  }

  test("runs of the merged pair fully merge (canonical greedy, not " +
      "delimiter-consuming replace): aaaa + (a,a) -> [aa, aa]") {
    val s = spark; import s.implicits._
    // a delimiter-space-consuming replace(' a a ',' aa ') yields
    // [aa, a, a] here — the fold must produce [aa, aa]
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val hist = Bpe.symbolCounts(docs, Seq("a" -> "a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist == Map("aa" -> 2L), hist.toString)
    // and the learner applies the same semantics between rounds:
    // round 1 (a,a) cnt 3 (overlapping adjacent positions); round 2
    // sees [aa, aa] -> (aa,aa), NOT (aa,a)
    val out = Bpe.learnMerges(docs, 2).orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)),
      out.toSeq.toString)
  }

  test("learnMerges stops early when no pair remains") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = Bpe.learnMerges(docs, 5).collect()
    // round 1 merges (a,b) -> single symbol 'ab'; nothing left after
    assert(out.length == 1)
    assert(out(0).getString(1) == "a" && out(0).getString(2) == "b")
  }

  test("symbolCounts round-trips: encode with learned merges conserves " +
      "total occurrence mass and uses the merged symbols") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "aaab aab"), (2L, "aaab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, 3).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val hist = Bpe.symbolCounts(docs, merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // after (a,a),(a,b),(aa,ab): aaab -> " aa ab " -> the round-3 merge
    // collapses it to the single symbol "aaab" (×2); aab -> [aa, b]
    assert(hist == Map("aaab" -> 2L, "aa" -> 1L, "b" -> 1L),
      hist.toString)
  }

  test("learnMerges is partitioning-invariant") {
    val s = spark; import s.implicits._
    val words = Seq("scan", "scans", "scanner", "column", "columns",
      "window", "windows", "sort", "sorted", "sorting")
    val docs = (1L to 40L)
      .map(i => (i, words((i % words.length).toInt) + " " +
        words(((i * 7) % words.length).toInt)))
      .toDF("doc_id", "text")
    val a = Bpe.learnMerges(docs.repartition(2), 6).orderBy("step")
      .collect().map(_.toSeq)
    val b = Bpe.learnMerges(docs.repartition(9), 6).orderBy("step")
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 6)
  }
}
