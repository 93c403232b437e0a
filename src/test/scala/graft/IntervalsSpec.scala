package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Intervals

/** Intervals.mergeIntervals: overlap/touch coalescing, per-key
  * independence, containment, tie-order invariance.
  */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def iv(rows: (Long, Long, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "s0", "e0")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    Intervals.mergeIntervals(df, Seq("k"), "s0", "e0")
      .orderBy("k", "start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("overlapping and touching spans merge; gaps split") {
    // [0,10] [5,20] overlap; [20,30] touches (inclusive ends);
    // [40,50] is disjoint
    val out = run(iv((1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L),
      (1L, 40L, 50L)))
    assert(out === Seq((1L, 0L, 30L, 3L), (1L, 40L, 50L, 1L)))
  }

  test("a contained span does not extend its container") {
    // [0,100] contains [10,20]; next span starts at 30 < 100 → merges
    val out = run(iv((1L, 0L, 100L), (1L, 10L, 20L), (1L, 30L, 40L)))
    assert(out === Seq((1L, 0L, 100L, 3L)))
  }

  test("keys merge independently") {
    val out = run(iv((1L, 0L, 10L), (2L, 5L, 15L)))
    assert(out === Seq((1L, 0L, 10L, 1L), (2L, 5L, 15L, 1L)))
  }

  test("duplicate intervals count their spans and change nothing else") {
    val out = run(iv((1L, 0L, 10L), (1L, 0L, 10L), (1L, 0L, 10L)))
    assert(out === Seq((1L, 0L, 10L, 3L)))
  }
}
