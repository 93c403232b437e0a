package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** SemDeDup-style embedding dedup (graft.ops.Dedup.semanticDedup):
  * exact-duplicate vectors always share a k-means cell (identical
  * cosine profile, identical tie-break), so they must be caught; far
  * vectors survive; the keep-smallest-id rule and partitioning
  * invariance hold.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def embDf(rows: (Long, Seq[Float])*) = {
    val s = spark; import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // 4-dim corpus: vectors 1/5/9 identical (planted semantic dups),
  // 2 and 3 near-orthogonal to them and to each other.
  private def corpus = embDf(
    1L -> Seq(1f, 0f, 0f, 0f),
    2L -> Seq(0f, 1f, 0f, 0f),
    3L -> Seq(0f, 0f, 1f, 0.1f),
    5L -> Seq(1f, 0f, 0f, 0f),
    9L -> Seq(1f, 0f, 0f, 0f),
    7L -> Seq(0.9f, 0.1f, 0f, 0f))

  test("identical vectors are dropped with the smallest id as witness") {
    val out = Dedup.semanticDedup(corpus, k = 2, iters = 1,
        threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2)), r.getLong(3))).toMap
    assert(out.size === 6) // every vector reported
    assert(out(1L) === ((-1L, 1L))) // smallest id of the dup group kept
    assert(out(5L) === ((1L, 0L)))
    assert(out(9L) === ((1L, 0L)))
    // orthogonal vectors survive regardless of their cell
    assert(out(2L)._2 === 1L && out(3L)._2 === 1L)
  }

  test("threshold gates the drop: cos(1,7) ≈ 0.994 drops at 0.95, " +
    "survives at 0.999") {
    val tight = Dedup.semanticDedup(corpus, 2, 1, 0.95)
      .filter(col("vec_id") === 7L).collect().head
    assert(tight.getLong(3) === 0L && tight.getLong(2) === 1L)
    val loose = Dedup.semanticDedup(corpus, 2, 1, 0.999)
      .filter(col("vec_id") === 7L).collect().head
    assert(loose.getLong(3) === 1L)
  }

  test("partitioning invariance") {
    val base = Dedup.semanticDedup(corpus, 2, 1, 0.95)
      .orderBy("vec_id").collect().map(_.toSeq)
    val shuf = Dedup.semanticDedup(corpus.repartition(5), 2, 1, 0.95)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(base.toSeq === shuf.toSeq)
  }
}
