package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Stats

/** Distribution statistics (graft.ops.Stats): histogram binning edges,
  * exact Pearson correlation, per-group z-scores.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  test("histogram: max lands in the top bin, edges tile [min, max]") {
    val s = spark; import s.implicits._
    val df = (0 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val out = Stats.histogram(df, "v", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.length === 10)
    // 0..100 over 10 bins of width 10: bins 0..8 get 10 values,
    // bin 9 gets 11 (90..100 inclusive of the max)
    assert(out.take(9).forall(_._2 === 10L) && out.last._2 === 11L)
    assert(out.head._3 === 0.0 && out.last._4 === 100.0)
    // edges tile: each hi_edge equals the next lo_edge
    out.sliding(2).foreach { case Array(a, b) => assert(a._4 === b._3) }
  }

  test("histogram: constant column collapses to one zero-width bin") {
    val s = spark; import s.implicits._
    val df = Seq(3.0, 3.0, 3.0).toDF("v")
    val out = Stats.histogram(df, "v", 10).collect()
    assert(out.length === 1 && out.head.getLong(0) === 0L &&
      out.head.getLong(1) === 3L)
  }

  test("correlation: perfectly linear pairs hit ±1, constants are null") {
    val s = spark; import s.implicits._
    val df = (1 to 50).map(i =>
      (i.toDouble, 2.0 * i + 3, -1.0 * i, 7.0))
      .toDF("x", "y", "neg", "c")
    val out = Stats.correlationMatrix(df, Seq("x", "y", "neg", "c"))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    val m = out.map { case (a, b, c) => (a, b) -> c }.toMap
    assert(m(("x", "y")) === Some(1.0))
    assert(m(("x", "neg")) === Some(-1.0))
    assert(m(("y", "neg")) === Some(-1.0))
    // zero-variance column: denominator 0 → null (try_divide)
    assert(m(("x", "c")) === None)
  }

  test("mutual information: independent columns 0, determined columns " +
    "H(X)") {
    val s = spark; import s.implicits._
    // independent: every (x, y) combination equally likely
    val ind = (for (x <- Seq("a", "b"); y <- Seq("p", "q"); _ <- 1 to 5)
      yield (x, y)).toDF("x", "y")
    val mi0 = Stats.mutualInformation(ind, "x", "y").collect().head
    assert(mi0.getDouble(2) === 0.0 && mi0.getLong(1) === 4L)
    // fully determined y = f(x): MI = H(X) = ln 2 for a uniform binary x
    val det = (for (x <- Seq("a", "b"); _ <- 1 to 5)
      yield (x, x + "!")).toDF("x", "y")
    val mi1 = Stats.mutualInformation(det, "x", "y").collect().head
    assert(math.abs(mi1.getDouble(2) - math.log(2)) < 1e-5)
  }

  test("group z-score: per-group standardization, constant group null") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0))
      .toDF("k", "v")
    val out = Stats.groupZscore(df, "k", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // group a: mu=2, sigma=1 (population) → z = -1, +1
    assert(out.filter(_._1 == "a").map(_._3).toSet ===
      Set(Some(-1.0), Some(1.0)))
    // group b constant → sigma 0 → null z
    assert(out.filter(_._1 == "b").forall(_._3.isEmpty))
  }
}
