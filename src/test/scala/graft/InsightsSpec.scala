package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.ops.{Drift, Market, Rank, Survival}

/** Recommendation / drift / lifetime ops: association-rule measures and
  * the basket-width cap, CF cosine + per-user history truncation, PSI
  * smoothing and grid conventions, NTILE-exact equi-depth bucketing on
  * the two-phase ordinal, and Kaplan–Meier censoring semantics.
  */
class InsightsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  test("basketRules: support/confidence/lift with the width cap") {
    val s = spark; import s.implicits._
    // b1={x,y} b2={x,y,y dup} b3={x,z} b4 is 4-wide → dropped by cap=3
    val df = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "p"), (4L, "q"), (4L, "r"), (4L, "s"))
      .toDF("b", "i")
    val out = Market.basketRules(df, "b", "i", minPairCount = 2L,
      maxBasket = 3, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // N=3 surviving baskets; x in 3, y in 2; (x,y) co-occurs in 2
    assert(out.toSet === Set(
      ("x", "y", 2L, 0.666667, 0.666667, 1.0),
      ("y", "x", 2L, 0.666667, 1.0, 1.0)))
  }

  test("basketRules: k cut is ordered by rounded lift then pair") {
    val s = spark; import s.implicits._
    // two rules with distinct lifts; k=1 must keep the higher one:
    // baskets: {a,b} {a,b} {a,c} {c,d} — lift(a,b)=2 > lift(a,c)
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "c"), (4L, "d")).toDF("b", "i")
    val out = Market.basketRules(df, "b", "i", minPairCount = 2L,
      maxBasket = 8, k = 1).collect()
    assert(out.length === 1)
    assert((out(0).getString(0), out(0).getString(1)) === ("a", "b"))
  }

  test("itemNeighbors: cosine over the binary user×item matrix") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c")).toDF("u", "i")
    val out = Market.itemNeighbors(df, "u", "i", maxPerUser = 10, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3),
        r.getInt(4)))
    // |a|=3 |b|=2 |c|=1; cos(a,b)=2/sqrt 6, cos(a,c)=1/sqrt 3
    assert(out.toSet === Set(
      ("a", "b", 0.816497, 1), ("a", "c", 0.57735, 2),
      ("b", "a", 0.816497, 1), ("c", "a", 0.57735, 1)))
  }

  test("itemNeighbors: history cap keeps the maxPerUser smallest items") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "p"), (1L, "q"), (1L, "r"), (2L, "p"), (2L, "q"))
      .toDF("u", "i")
    val out = Market.itemNeighbors(df, "u", "i", maxPerUser = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // user 1's "r" is truncated → only the p↔q pair survives
    assert(out.toSet === Set(("p", "q"), ("q", "p")))
  }

  test("psiNumeric: identical slices score exactly zero") {
    val s = spark; import s.implicits._
    val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val out = Drift.psiNumeric(ref, ref, "v", nBins = 4).collect()(0)
    assert(out.getAs[Double]("psi") === 0.0)
    assert(out.getAs[Int]("n_bins") === 4)
    assert(out.getAs[Long]("n_ref") === 4L)
  }

  test("psiNumeric: current values clamp into the frozen reference grid") {
    val s = spark; import s.implicits._
    val ref = Seq(0.0, 1.0).toDF("v")    // grid [0,1], bins {0, 3}
    val cur = Seq(9.0, 10.0).toDF("v")   // both clamp to bin 3
    val psi = Drift.psiNumeric(ref, cur, "v", nBins = 4).collect()(0)
      .getAs[Double]("psi")
    // p = {.375, 0, 0, .375}+smoothing → hand-computed 0.402359
    assert(math.abs(psi - 0.402359) < 1e-6)
  }

  test("psiNumeric: degenerate reference (min=max) is stable, not NaN") {
    val s = spark; import s.implicits._
    val ref = Seq(5.0, 5.0).toDF("v")
    val cur = Seq(5.0, 7.0).toDF("v")
    // everything lands in bin 0 on both sides → p = q → psi 0
    val psi = Drift.psiNumeric(ref, cur, "v", nBins = 10).collect()(0)
      .getAs[Double]("psi")
    assert(psi === 0.0)
  }

  test("psiCategorical: unseen category contributes drift; NULL is a bin") {
    val s = spark; import s.implicits._
    val ref = Seq(Some("A"), Some("A"), Some("B"), None).toDF("c")
    val cur = Seq(Some("A"), Some("B"), Some("B"), Some("C")).toDF("c")
    val out = Drift.psiCategorical(ref, cur, "c").collect()(0)
    assert(out.getAs[Int]("n_bins") === 4) // A, B, C, __null__
    assert(out.getAs[Double]("psi") > 0.0)
  }

  test("equiDepthHistogram: NTILE sizes ⌈N/k⌉ first, boundaries exact") {
    val s = spark; import s.implicits._
    val df = (1 to 10).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
    val out = Rank.equiDepthHistogram(df, "v", Seq(col("id")), k = 3)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq((0, 4L, 1.0, 4.0), (1, 3L, 5.0, 7.0),
      (2, 3L, 8.0, 10.0)))
  }

  test("equiDepthHistogram: N < k degenerates to singleton buckets") {
    val s = spark; import s.implicits._
    val df = Seq((1.0, 1L), (2.0, 2L)).toDF("v", "id")
    val out = Rank.equiDepthHistogram(df, "v", Seq(col("id")), k = 5)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq === Seq((0, 1L), (1, 1L)))
  }

  test("kaplanMeier: censoring within the lag, deaths decrement the curve") {
    val s = spark; import s.implicits._
    // unit=10us; end=100 → censor threshold last ≥ 80
    val e = Seq(
      (1L, 0L), (1L, 5L),     // t=0, dead
      (2L, 0L), (2L, 35L),    // t=3, dead
      (3L, 0L), (3L, 100L),   // t=10, censored (defines study end)
      (4L, 0L), (4L, 95L))    // t=9, censored
      .toDF("user_id", "ts_us")
    val out = Survival.kaplanMeier(e, unitUs = 10L, censorLagUnits = 2)
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 4L, 1L, 0L, 0.75),
      (3L, 3L, 1L, 0L, 0.5),
      (9L, 2L, 0L, 1L, 0.5),
      (10L, 1L, 0L, 1L, 0.5)))
  }

  test("logRank: hand-computed two-arm O/E/V on the KM-style fixture") {
    val s = spark; import s.implicits._
    // unit=10us, lag=2, end=100 → dead iff last < 80. Arm A = users
    // with a 'buy' event (1,2,3). Lifetimes: A: 0†,1†,10c; B: 0†,2†,9c
    // event times t=0 (d=2, dA=1, n=6, nA=3), t=1 (1,1,4,2),
    // t=2 (1,0,3,1) → O_A=2, E_A=1+.5+.333333333, V=.4+.25+.222222222
    val e = Seq(
      (1L, 0L, "buy"), (1L, 5L, "x"),
      (2L, 0L, "buy"), (2L, 15L, "x"),
      (3L, 0L, "x"), (3L, 100L, "buy"),
      (4L, 0L, "x"), (4L, 5L, "x"),
      (5L, 0L, "x"), (5L, 25L, "x"),
      (6L, 0L, "x"), (6L, 95L, "x"))
      .toDF("user_id", "ts_us", "etype")
    val out = Survival.logRank(e, unitUs = 10L,
      col("etype") === "buy", censorLagUnits = 2).collect().head
    assert(out.getLong(0) === 6L && out.getLong(1) === 3L)
    assert(out.getLong(2) === 2L)
    assert(out.getDouble(3) === 1.833333)
    assert(out.getDouble(4) === 0.872222)
    assert(out.getDouble(5) === 0.031847)
  }

  test("kaplanMeier: an exhausted risk set pins the curve at exactly 0") {
    val s = spark; import s.implicits._
    // negative lag marks even the study-end user dead → everyone dies
    // at t=0, the factor hits 0, and the ln-guard must yield exact 0.0
    val e = Seq((1L, 0L), (2L, 0L), (2L, 0L)).toDF("user_id", "ts_us")
    val out = Survival.kaplanMeier(e, unitUs = 10L, censorLagUnits = -1)
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[Double]("survival") === 0.0)
    assert(out(0).getAs[Long]("n_deaths") === 2L)
  }

  test("nelsonAalen: hand-summed hazard on the KM fixture; exhausted " +
      "risk set stays finite where KM pins 0") {
    val s = spark; import s.implicits._
    val e = Seq(
      (1L, 0L), (1L, 5L),     // t=0, dead
      (2L, 0L), (2L, 35L),    // t=3, dead
      (3L, 0L), (3L, 100L),   // t=10, censored (defines study end)
      (4L, 0L), (4L, 95L))    // t=9, censored
      .toDF("user_id", "ts_us")
    val out = Survival.nelsonAalen(e, unitUs = 10L, censorLagUnits = 2)
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    // H: 1/4 = .25, +1/3 → .583333 (terms round(,9) first), flat after
    val h2 = 0.25 + BigDecimal(1.0 / 3)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(
      (0L, 4L, 1L, 0L, 0.25, r6(math.exp(-0.25))),
      (3L, 3L, 1L, 0L, r6(h2), r6(math.exp(-h2))),
      (9L, 2L, 0L, 1L, r6(h2), r6(math.exp(-h2))),
      (10L, 1L, 0L, 1L, r6(h2), r6(math.exp(-h2)))))
    // d = n step: KM collapses to 0, NA reads finite exp(-1)
    val all = Seq((1L, 0L), (2L, 0L), (2L, 0L)).toDF("user_id", "ts_us")
    val deg = Survival.nelsonAalen(all, unitUs = 10L,
      censorLagUnits = -1).collect()
    assert(deg.length === 1)
    assert(deg(0).getAs[Double]("cum_hazard") === 1.0)
    assert(deg(0).getAs[Double]("survival_fh") === r6(math.exp(-1.0)))
  }
}
