package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Exact substring duplication (Dedup.windowHashes/substringDupStats):
  * window coverage semantics, overlap merging, and short-doc safety.
  */
class SubstringDupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def df(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("containment: a short doc inside a long one scores 1.0 one way") {
    // doc 1's shingle set is a subset of doc 2's; the reverse
    // direction dilutes by doc 2's extra shingles; Jaccard for the
    // pair sits at 3/7 — under any 0.5 threshold
    val d = df(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota")
    val out = Dedup.containmentPairs(d, 3, 0.5, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out((1L, 2L)) === 1.0)
    assert(!out.contains((2L, 1L))) // 3/7 < 0.5
    val both = Dedup.containmentPairs(d, 3, 0.3, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(both((2L, 1L)) - 3.0 / 7.0) < 1e-12)
  }

  test("short docs (< w tokens) produce no windows and no failure") {
    val d = df(1L -> "only three tokens", 2L -> "a b c d e",
      3L -> "exactly four tokens here")
    assert(Dedup.windowHashes(d, 5).count() === 1) // doc 2 only, 1 window
    assert(Dedup.substringDupStats(d, 5).count() === 0)
  }

  test("a doc with exactly w tokens yields one window") {
    val d = df(1L -> "a b c", 2L -> "a b c")
    val wh = Dedup.windowHashes(d, 3)
    assert(wh.count() === 2)
    assert(wh.select("pos").distinct().head().getInt(0) === 1)
    val stats = Dedup.substringDupStats(d, 3).orderBy("doc_id").collect()
    assert(stats.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(stats.forall(r => r.getLong(1) == 1L && r.getLong(2) == 3L))
  }

  test("copied span is found with merged token coverage") {
    // doc 1: 30 unique tokens; doc 2 copies tokens 6..25 (20 tokens)
    val toks = (1 to 30).map(i => s"t$i")
    val d = df(1L -> toks.mkString(" "),
      2L -> (toks.slice(5, 25) ++ Seq("zz1", "zz2", "zz3")).mkString(" "),
      3L -> ("totally unrelated words apple banana cherry dog elephant " +
        "fox grape horse igloo jackal kiwi lemon mango nectar orange"))
    val stats = Dedup.substringDupStats(d, 10).orderBy("doc_id").collect()
    // the shared 20-token run duplicates 11 consecutive 10-windows in
    // each doc; merged coverage = 20 tokens
    assert(stats.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(stats.forall(_.getLong(1) == 11L), stats.mkString(","))
    assert(stats.forall(_.getLong(2) == 20L), stats.mkString(","))
  }

  test("disjoint duplicated spans in one doc do not merge") {
    // doc 3 copies two separate 10-token runs of doc 1 with a unique
    // separator long enough to keep the covered intervals disjoint
    val toks = (1 to 40).map(i => s"t$i")
    val d = df(1L -> toks.mkString(" "),
      2L -> (toks.slice(0, 10) ++ (1 to 15).map(i => s"u$i") ++
        toks.slice(30, 40)).mkString(" "))
    val stats = Dedup.substringDupStats(d, 10).orderBy("doc_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((1L, 2L, 20L), (2L, 2L, 20L)))
  }

  test("in-document repetition counts as duplication") {
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val d = df(1L -> s"$run filler1 filler2 filler3 $run")
    val stats = Dedup.substringDupStats(d, 12).collect()
    assert(stats.length === 1)
    assert(stats.head.getLong(1) === 2L) // both copies' windows
    assert(stats.head.getLong(2) === 24L)
  }
}
