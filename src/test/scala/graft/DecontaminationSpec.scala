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
}
