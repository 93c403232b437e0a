package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Benchmark decontamination: a training document sharing any n-token
  * shingle with the eval set is dropped, clean and too-short documents
  * survive, and the hit report counts distinct overlapping shingles.
  */
class DecontaminationSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private val benchmark = df(
    100L -> "the quick brown fox jumps over the lazy dog")

  test("documents embedding a benchmark shingle are dropped") {
    val train = df(
      1L -> "completely unrelated text about spark partitions",
      2L -> "he saw the quick brown fox run away",      // 3-gram overlap
      3L -> "tiny doc",                                 // < n tokens: kept
      4L -> "quick brown unrelated and brown fox apart" // no shared 3-gram
    )
    val kept = Dedup.decontaminate(train, benchmark, 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("hit report counts distinct overlapping shingles") {
    val train = df(
      2L -> "the quick brown fox jumps high",  // shares 3 shingles
      5L -> "over the lazy dog indeed")        // shares 2 shingles
    val hits = Dedup.contaminationHits(train, benchmark, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(2L -> 3L, 5L -> 2L))
  }

  test("decontaminate passes all columns through") {
    val s = spark; import s.implicits._
    val train = Seq((1L, "unrelated words entirely", "extra"))
      .toDF("doc_id", "text", "payload")
    val out = Dedup.decontaminate(train, benchmark, 3)
    assert(out.columns.toSeq == Seq("doc_id", "text", "payload"))
    assert(out.count() == 1)
  }

  test("contamination fraction: per-doc overlap share, misses count") {
    val train = df(
      // 5 distinct shingles, 2 ("the quick brown", "quick brown fox")
      // in the benchmark
      2L -> "see the quick brown fox runs far",
      // zero overlap: frac 0.0, still reported
      6L -> "completely unrelated text about spark partitions",
      // full containment: every shingle is a benchmark shingle
      7L -> "the quick brown fox")
    val out = Dedup.contaminationFraction(train, benchmark, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(2L)._1 === 5L && out(2L)._2 === 2L &&
      out(2L)._3 === 0.4)
    assert(out(6L)._2 === 0L && out(6L)._3 === 0.0)
    assert(out(7L) === ((2L, 2L, 1.0)))
    // the any-hit rule would drop BOTH 2 and 7; a 0.5 threshold keeps 2
    assert(out.filter(_._2._3 >= 0.5).keySet === Set(7L))
  }
}
