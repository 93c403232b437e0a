package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pack

/** Sequence packing (ops/Pack): boundary-exact spans, full chunks, and
  * straddling-document splits.
  */
class PackSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def counts(rows: (Long, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "n_tokens")
  }

  test("a straddling document splits at exact chunk boundaries") {
    // docs: 100 + 60 tokens, seqLen 128 -> doc 2 straddles chunk 0/1
    val spans = Pack.sequenceSpans(
        counts(1L -> 100L, 2L -> 60L), "doc_id", "n_tokens", 128)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(spans.toSeq === Seq(
      (1L, 0L, 0L, 100L), // doc 1: tokens [0, 100) in chunk 0
      (2L, 0L, 100L, 128L), // doc 2 head: [100, 128) fills chunk 0
      (2L, 1L, 128L, 160L))) // doc 2 tail: [128, 160) opens chunk 1
  }

  test("every chunk is exactly seqLen full except the tail; spans " +
      "partition the token stream") {
    val rows = (1L to 50L).map(i => i -> (i * 7 % 90 + 1)) // varied sizes
    val total = rows.map(_._2).sum
    val summary = Pack.packSummary(counts(rows: _*),
        "doc_id", "n_tokens", 64)
      .orderBy("chunk_id").collect()
    val last = summary.length - 1
    summary.zipWithIndex.foreach { case (r, i) =>
      val n = r.getAs[Long]("n_tokens")
      if (i < last) assert(n === 64L, s"chunk $i not full")
      else assert(n === total - 64L * last, "tail chunk wrong size")
    }
    assert(summary.map(_.getAs[Long]("n_tokens")).sum === total)
  }

  test("zero-token documents are dropped; ids need not be contiguous") {
    val spans = Pack.sequenceSpans(
        counts(5L -> 10L, 6L -> 0L, 1000L -> 10L),
        "doc_id", "n_tokens", 128)
      .collect().map(_.getLong(0)).toSet
    assert(spans === Set(5L, 1000L))
  }

  test("offsets are a true exclusive prefix sum across partitions") {
    // enough rows to span several range partitions of the running sum
    val rows = (1L to 2000L).map(i => i -> 3L)
    val spans = Pack.sequenceSpans(counts(rows: _*),
      "doc_id", "n_tokens", 100)
    // doc i owns tokens [(i-1)*3, i*3): check a few fixed points
    val byDoc = spans.groupBy("doc_id")
      .agg(min("tok_start").as("s"), max("tok_end").as("e"))
      .filter(col("doc_id").isin(1L, 700L, 2000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(byDoc === Seq((1L, 0L, 3L), (700L, 699L * 3, 700L * 3),
      (2000L, 1999L * 3, 2000L * 3)))
  }

  test("chunkOverlap: stride windows with shared context, short tail, " +
      "token-free docs dropped") {
    val s = spark; import s.implicits._
    // doc 1: 7 tokens, window 4 stride 3 -> starts 0,3,6:
    //   [t0..t3], [t3..t6], [t6] (tail short, shares t3/t6 boundaries)
    // doc 2: no tokens -> emits nothing
    val docs = Seq((1L, "a b c d e f g"), (2L, "!!!"))
      .toDF("doc_id", "text")
    val out = Pack.chunkOverlap(docs, 4, 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 1L)))
    // fingerprint identifies chunk text: same text, same fp
    val fps = Pack.chunkOverlap(docs, 4, 3).select("fp").collect()
    assert(fps.map(_.getString(0)).distinct.length == 3)
  }

  test("chunkOverlap with stride == window tiles without overlap") {
    val s = spark; import s.implicits._
    val docs = Seq((9L, "a b c d e f")).toDF("doc_id", "text")
    val out = Pack.chunkOverlap(docs, 3, 3).orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 0L, 3L), (1L, 3L, 3L)))
  }

  test("tokenBudgetSelect: greedy-by-score prefix under a hard cap; " +
    "the straddling doc is excluded; boundary doc named") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, 5L, 0.9), (2L, 5L, 0.8), (3L, 5L, 0.7),
      (4L, 5L, 0.6)).toDF("doc_id", "n_tokens", "score")
    val out = Pack.tokenBudgetSelect(docs, "doc_id", "n_tokens",
      "score", 12L).collect().head
    assert(out.getLong(0) === 4L && out.getLong(1) === 20L)
    assert(out.getLong(2) === 12L) // budget echoed
    assert(out.getLong(3) === 2L && out.getLong(4) === 10L)
    assert(out.getDouble(5) === 0.8 && out.getLong(6) === 2L)
    // score ties break by ascending doc id
    val tied = Seq((7L, 4L, 0.5), (5L, 4L, 0.5), (6L, 4L, 0.5))
      .toDF("doc_id", "n_tokens", "score")
    val t2 = Pack.tokenBudgetSelect(tied, "doc_id", "n_tokens",
      "score", 8L).collect().head
    assert(t2.getLong(3) === 2L && t2.getLong(6) === 6L)
    // budget smaller than the best doc: the summary row must STILL
    // emit (n_selected = 0, null cutoffs) — the r11 advice found the
    // limit-1 boundary frame annihilated the whole output here
    val none = Pack.tokenBudgetSelect(tied, "doc_id", "n_tokens",
      "score", 3L).collect()
    assert(none.length === 1)
    assert(none.head.getLong(0) === 3L && none.head.getLong(1) === 12L)
    assert(none.head.getLong(3) === 0L && none.head.getLong(4) === 0L)
    assert(none.head.isNullAt(5) && none.head.isNullAt(6))
  }
}
