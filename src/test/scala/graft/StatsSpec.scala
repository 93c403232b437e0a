package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Stats

/** Distribution statistics (graft.ops.Stats): histogram binning edges,
  * exact Pearson correlation, per-group z-scores.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  test("cohensKappa: textbook 2x2 kappa; nulls drop complete-case; " +
    "perfect chance agreement yields NULL kappa") {
    val s = spark; import s.implicits._
    // 45 (y,y), 15 (y,n), 15 (n,y), 25 (n,n): po = 0.70,
    // pe = (60*60 + 40*40)/100^2 = 0.52, kappa = 0.18/0.48 = 0.375
    val rows = Seq.fill(45)(("y", "y")) ++ Seq.fill(15)(("y", "n")) ++
      Seq.fill(15)(("n", "y")) ++ Seq.fill(25)(("n", "n")) ++
      Seq.fill(7)((null: String, "y")) // must not shift any number
    val out = Stats.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(out.getLong(0) === 100L && out.getLong(1) === 70L)
    assert(out.getDouble(2) === 0.70 && out.getDouble(3) === 0.52)
    assert(out.getDouble(4) === 0.375)
    // single shared category: pe = 1 -> kappa NULL, not a div error
    val degen = Stats.cohensKappa(
      Seq.fill(9)(("x", "x")).toDF("a", "b"), "a", "b").collect().head
    assert(degen.getDouble(2) === 1.0 && degen.getDouble(3) === 1.0)
    assert(degen.isNullAt(4))
  }

  test("decisionStump: perfectly separable split found with gain = " +
    "root gini; degenerate target ties to the smallest threshold") {
    val s = spark; import s.implicits._
    // pos at x in {1,2}, neg at {5,6}: threshold 2 separates exactly
    // (gain = root gini = 0.5); thresholds 1 and 5 tie at 1/6 below;
    // max x (6) is no candidate (empty right child)
    val df = Seq((1.0, "y"), (2.0, "y"), (5.0, "n"), (6.0, "n"))
      .toDF("x", "lbl")
    val out = Stats.decisionStump(df, "x", col("lbl") === "y")
      .collect().head
    assert(out.getDouble(1) === 2.0)
    assert(out.getLong(2) === 2L && out.getLong(3) === 2L)
    assert(out.getLong(4) === 2L && out.getLong(5) === 0L)
    assert(out.getDouble(6) === 0.5)
    // all-positive target: every gain 0 -> smallest threshold wins
    val degen = Stats.decisionStump(
      Seq((3.0, "y"), (7.0, "y")).toDF("x", "lbl"), "x",
      col("lbl") === "y").collect().head
    assert(degen.getDouble(1) === 3.0 && degen.getDouble(6) === 0.0)
  }

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

  test("skew report: uniform keys score gini 0; a hot key dominates") {
    val s = spark; import s.implicits._
    // 4 keys × 5 rows each: perfectly uniform
    val uni = (for (k <- 1 to 4; _ <- 1 to 5) yield Tuple1(k.toLong))
      .toDF("k")
    val u = Stats.skewReport(uni, "k").collect().head
    assert(u.getLong(0) === 20L && u.getLong(1) === 4L)
    assert(u.getDouble(4) === 0.0) // gini
    assert(u.getDouble(2) === 0.25) // top1 share
    // one key holds 96 of 100 rows
    val hot = ((1 to 96).map(_ => 1L) ++ Seq(2L, 3L, 4L, 5L))
      .map(Tuple1(_)).toDF("k")
    val h = Stats.skewReport(hot, "k").collect().head
    assert(h.getDouble(2) === 0.96)
    assert(h.getDouble(4) > 0.7) // strongly concentrated
  }

  test("chi2 independence: a perfectly dependent pair scores n·(k−1)") {
    val s = spark; import s.implicits._
    // y === x over two values: chi2 = n·(min(|X|,|Y|)−1) = n, dof 1
    val df = (1 to 40).map(i => (s"v${i % 2}", s"v${i % 2}"))
      .toDF("x", "y")
    val out = Stats.chiSquareIndependence(df, "x", "y").collect().head
    assert(out.getLong(0) === 40L && out.getLong(1) === 1L)
    assert(out.getDouble(2) === 40.0)
  }

  test("chi2 independence: null categories are excluded, not phantom " +
    "cells") {
    val s = spark; import s.implicits._
    // (null,'y1')×50 would otherwise count into marginals but never
    // match the grid join → spurious (0−E)²/E; complete-case excludes
    val df = ((1 to 50).map(_ => (Option.empty[String], "y1")) ++
      (1 to 50).map(_ => (Some("x1"), "y1"))).toDF("x", "y")
    val out = Stats.chiSquareIndependence(df, "x", "y").collect().head
    assert(out.getLong(0) === 50L) // only complete cases
    assert(out.getLong(1) === 0L && out.getDouble(2) === 0.0)
  }

  test("chi2 independence: an independent grid scores ~0") {
    val s = spark; import s.implicits._
    // uniform product distribution: observed == expected exactly
    val df = (for (x <- 0 to 1; y <- 0 to 2; _ <- 1 to 5)
      yield (s"x$x", s"y$y")).toDF("x", "y")
    val out = Stats.chiSquareIndependence(df, "x", "y").collect().head
    assert(out.getLong(1) === 2L)
    assert(out.getDouble(2) === 0.0)
  }

  test("target encoding: rare categories shrink toward the global mean") {
    val s = spark; import s.implicits._
    // global mean 10; 'a' (100 obs, mean 0) vs 'b' (1 obs, value 1000)
    val rows = (1 to 100).map(i => ("a", 0.0)) ++
      Seq(("b", 1000.0)) ++ (1 to 99).map(_ => ("c", 0.1010101))
    // make global mean easy: use explicit check below instead
    val df = rows.toDF("k", "y")
    val out = Stats.targetEncode(df, "k", "y", m = 50.0, decScale = 7)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getDouble(2)))).toMap
    val gmean = (1000.0 + 99 * 0.1010101) / 200.0
    // a: (0 + 50*g)/150 ; b: (1000 + 50*g)/51
    assert(math.abs(out("a")._2 - 50.0 * gmean / 150.0) < 1e-6)
    assert(math.abs(out("b")._2 - (1000.0 + 50.0 * gmean) / 51.0) < 1e-4)
    // the 1-observation category sits far from its raw mean, pulled in
    assert(out("b")._2 < 1000.0 * 0.05)
  }

  test("target encoding: m=0 degenerates to the per-category mean") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 2.0), ("a", 4.0), ("b", 10.0)).toDF("k", "y")
    val out = Stats.targetEncode(df, "k", "y", m = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("a") === 3.0 && out("b") === 10.0)
  }

  test("entropy profile: uniform > skewed > constant; null is a category") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", "x", "only"), ("b", "x", "only"),
      ("c", "x", "only"), ("d", null: String, "only"))
      .toDF("u", "sk", "const")
    val out = Stats.entropyProfile(df, Seq("u", "sk", "const"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getLong(2), r.getDouble(3)))).toMap
    assert(out("u") === ((4L, 4L, math.rint(math.log(4.0) * 1e6) / 1e6)))
    assert(out("const")._3 === 0.0 && out("const")._2 === 1L)
    // sk: 3× 'x' + 1 null → two categories, H = -(3/4)ln(3/4)-(1/4)ln(1/4)
    assert(out("sk")._2 === 2L)
    val h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(out("sk")._3 - h) < 1e-5)
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

  test("roc auc: perfect separation 1, all-tied 0.5, ties half credit") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // perfect: every positive outscores every negative
    val perfect = Seq((true, 9.0), (true, 8.0), (false, 2.0),
      (false, 1.0)).toDF("p", "sc")
    val a = Stats.rocAuc(perfect, col("p"), "sc").collect().head
    assert(a.getLong(0) === 2L && a.getLong(1) === 2L)
    assert(a.getDouble(2) === 1.0 && a.getDouble(3) === 1.0)
    // all scores equal: every pair is a tie → 0.5, gini 0
    val tied = Seq((true, 5.0), (true, 5.0), (false, 5.0), (false, 5.0))
      .toDF("p", "sc")
    val t = Stats.rocAuc(tied, col("p"), "sc").collect().head
    assert(t.getDouble(2) === 0.5 && t.getDouble(3) === 0.0)
    // pos {3,2}, neg {2,1}: 3 winning pairs + half credit for (2,2)
    // over 4 pairs = 0.875
    val mix = Seq((true, 3.0), (true, 2.0), (false, 2.0), (false, 1.0))
      .toDF("p", "sc")
    assert(Stats.rocAuc(mix, col("p"), "sc").collect().head
      .getDouble(2) === 0.875)
  }

  test("brownForsythe: hand-computed two-group F off lower medians; " +
      "equal-spread groups read F 0") {
    val s = spark; import s.implicits._
    // A: {1,2,3} med 2 → z {1,0,1}; B: {10,20,30} med 20 → z {10,0,10}
    // Σs²/n = 4/3 + 400/3 = 134.666666666 (round-9 terms); S=22 N=6
    // SSB = 134.666666666 − 484/6 → 54.0; SSW = 202 − ... → 67.333333
    // F = (54/1)/(67.333333/4) = 3.207921
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "v")
    val r = Stats.brownForsythe(d, "g", "v").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 6L)
    assert(r.getDouble(2) === 54.0 && r.getDouble(3) === 67.333333)
    assert(r.getDouble(4) === 3.207921)
    // identical spread around different centers: all z equal per
    // group AND across groups → SSB 0 → F 0
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 101.0), ("b", 103.0))
      .toDF("g", "v")
    val e = Stats.brownForsythe(eq, "g", "v").collect().head
    assert(e.getDouble(2) === 0.0 && e.getDouble(4) === 0.0)
  }

  test("isotonicCalibration: violating bins pool to their weighted " +
      "mean; monotone input is unchanged") {
    val s = spark; import s.implicits._
    // bins 0..3 (equal weight 5): fracs 0.2, 0.6, 0.4, 0.8 — PAVA
    // pools bins 1,2 to (3+2)/10 = 0.5; ends untouched
    def rows(bin: Int, n: Int, pos: Int) =
      (0 until n).map(i => (i < pos, bin / 10.0 + 0.05))
    val d = (rows(0, 5, 1) ++ rows(1, 5, 3) ++ rows(2, 5, 2) ++
      rows(3, 5, 4)).toDF("p", "sc")
    val r = Stats.isotonicCalibration(d, col("p"), "sc")
      .collect().map(x => (x.getInt(0), x.getDouble(3)))
    assert(r.toSeq === Seq((0, 0.2), (1, 0.5), (2, 0.5), (3, 0.8)))
    // weighted pooling: bin1 n=10 frac 0.6, bin2 n=5 frac 0.4 →
    // pooled (6+2)/15 = 0.533333 (round-9 interval mean, display 6)
    val w = (rows(0, 5, 1) ++ rows(1, 10, 6) ++ rows(2, 5, 2) ++
      rows(3, 5, 4)).toDF("p", "sc")
    val rw = Stats.isotonicCalibration(w, col("p"), "sc")
      .collect().map(x => (x.getInt(0), x.getDouble(3)))
    assert(rw.toSeq === Seq((0, 0.2), (1, 0.533333), (2, 0.533333),
      (3, 0.8)))
    // already-monotone input: fit == frac everywhere
    val m = (rows(0, 5, 1) ++ rows(1, 5, 2) ++ rows(2, 5, 3)).toDF("p", "sc")
    val rm = Stats.isotonicCalibration(m, col("p"), "sc")
      .collect().map(x => (x.getDouble(2), x.getDouble(3)))
    assert(rm.forall { case (f, g) => f === g })
  }

  test("kruskalWallis: textbook no-tie H; tie-corrected pair; " +
      "all-tied degenerate null") {
    val s = spark; import s.implicits._
    // a {1,2,3} b {4,5,6}: ranks 1..6, ΣR²/n = 36/3+225/3 = 87,
    // H = 12/42·87 − 21 = 3.857143 (no ties)
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Stats.kruskalWallis(d, "g", "v").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 6L)
    assert(r.getDouble(2) === 3.857143)
    // a {1,1} b {2,2}: doubled ranks 3,3,7,7 → bt = 36/8+196/8 = 29,
    // H_unadj = 12·29/20 − 15 = 2.4; C = 1 − 12/60 = 0.8 → H = 3.0
    val t = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    assert(Stats.kruskalWallis(t, "g", "v").collect().head
      .getDouble(2) === 3.0)
    // every value tied: C = 0 → null H, not a division blowup
    val c = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("g", "v")
    assert(Stats.kruskalWallis(c, "g", "v").collect().head.isNullAt(2))
  }

  test("kendallTau: perfect agreement 1, reversal -1, x-ties adjust " +
      "the denominator, constant column null") {
    val s = spark; import s.implicits._
    // g=a: y = x → τ 1; g=b: y reversed → τ −1
    // g=c: x {1,1,2} y {1,2,3}: C=2 D=0 n1=1 n2=0 → 2/√(2·3) = 0.816497
    // g=d: x constant → n_pairs == n1 → null
    val d = Seq(
      ("a", 1L, 1.0, 1.0), ("a", 2L, 2.0, 2.0), ("a", 3L, 3.0, 3.0),
      ("b", 1L, 1.0, 3.0), ("b", 2L, 2.0, 2.0), ("b", 3L, 3.0, 1.0),
      ("c", 1L, 1.0, 1.0), ("c", 2L, 1.0, 2.0), ("c", 3L, 2.0, 3.0),
      ("d", 1L, 5.0, 1.0), ("d", 2L, 5.0, 2.0))
      .toDF("g", "o", "x", "y")
    val r = Stats.kendallTau(d, "g", "o", "x", "y").collect()
      .map(x => (x.getString(0), x.getLong(2),
        if (x.isNullAt(5)) None else Some(x.getDouble(5))))
    assert(r.toSeq === Seq(("a", 3L, Some(1.0)), ("b", 3L, Some(-1.0)),
      ("c", 3L, Some(0.816497)), ("d", 1L, None)))
  }

  test("logisticNewton: symmetric two-level design converges to the " +
      "closed-form MLE; constant feature freezes at the origin") {
    val s = spark; import s.implicits._
    // x = ±1 (4 rows each), P(y|x=-1) = 1/4, P(y|x=+1) = 3/4.
    // Standardized x = ±0.935414; the MLE has b0 = 0 (symmetry) and
    // b1 = ln(3)/0.935414 = 1.174465
    val d = (Seq(1, 0, 0, 0).map(y => (y == 1, -1.0)) ++
      Seq(1, 1, 1, 0).map(y => (y == 1, 1.0))).toDF("pos", "x")
    val out = Stats.logisticNewton(d, col("pos"), "x")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq === (1L to 6L))
    assert(out.forall(_._2 === 0.0)) // b0 exactly 0 every round
    assert(math.abs(out.last._3 - 1.174465) < 1e-3)
    // converged: the display-6 trajectory is flat by round 5
    assert(out(4)._3 === out(5)._3)
    // constant feature → x ≡ 0 → singular Hessian → frozen (0, 0)
    val c = Seq((true, 7.0), (false, 7.0), (true, 7.0)).toDF("pos", "x")
    val oc = Stats.logisticNewton(c, col("pos"), "x").collect()
    assert(oc.forall(r => r.getDouble(1) === 0.0 &&
      r.getDouble(2) === 0.0))
  }

  test("cramersV: perfect 2x2 association reads 1, a uniform grid " +
      "reads 0, a constant column reads null") {
    val s = spark; import s.implicits._
    val perfect = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q"))
      .toDF("x", "y")
    val r = Stats.cramersV(perfect, "x", "y").collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 1L)
    assert(r.getDouble(2) === 4.0 && r.getDouble(3) === 1.0)
    val indep = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
      .toDF("x", "y")
    assert(Stats.cramersV(indep, "x", "y").collect().head
      .getDouble(3) === 0.0)
    val const = Seq(("a", "p"), ("b", "p")).toDF("x", "y")
    assert(Stats.cramersV(const, "x", "y").collect().head.isNullAt(3))
  }

  test("anovaOneWay: textbook two-group F; zero within-variance " +
      "reads null not a blowup") {
    val s = spark; import s.implicits._
    // a {1,2,3} b {7,8,9}: SSB = 54, SSW = 4 → F = 54/(4/4) = 54
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 7.0), ("b", 8.0), ("b", 9.0)).toDF("g", "v")
    val r = Stats.anovaOneWay(d, "g", "v").collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 6L)
    assert(r.getDouble(2) === 54.0 && r.getDouble(3) === 4.0)
    assert(r.getDouble(4) === 54.0)
    val c = Seq(("a", 5.0), ("a", 5.0), ("b", 9.0), ("b", 9.0))
      .toDF("g", "v")
    assert(Stats.anovaOneWay(c, "g", "v").collect().head.isNullAt(4))
  }

  test("partialCorrelation: z-orthogonal x keeps r_xy (up to the " +
      "rounded-input convention); x == z reads null") {
    val s = spark; import s.implicits._
    // x ⊥ z, y = x + z: r_xy = r_yz = 1/√2 → .707107 rounded;
    // partial = .707107 / √(1 − .707107²) = 1.000001 — the ±1e-6
    // excursion is the documented from-ROUNDED-inputs convention
    val d = Seq((0.0, 0.0, 0.0), (1.0, 1.0, 0.0), (0.0, 1.0, 1.0),
      (1.0, 2.0, 1.0)).toDF("x", "y", "z")
    val r = Stats.partialCorrelation(d, "x", "y", "z").collect().head
    assert(r.getDouble(3) === 0.707107 && r.getDouble(4) === 0.0 &&
      r.getDouble(5) === 0.707107)
    assert(r.getDouble(6) === 1.000001)
    val dg = Seq((0.0, 1.0, 0.0), (1.0, 3.0, 1.0), (0.0, 1.5, 0.0))
      .toDF("x", "y", "z")
    assert(Stats.partialCorrelation(dg, "x", "y", "z")
      .collect().head.isNullAt(6)) // r_xz = 1 → zero denominator
  }

  test("grubbs: hand-computed G and witness; constant data reads " +
      "null G with the max value as witness") {
    val s = spark; import s.implicits._
    // {1,2,3,10}: mean 4, var (114-64)/3, admax |10-4| = 6
    val d = Seq(1.0, 2.0, 3.0, 10.0).toDF("v")
    val r = Stats.grubbs(d, "v").collect().head
    assert(r.getLong(0) === 4L && r.getDouble(1) === 4.0)
    assert(r.getDouble(2) === 4.082483) // sqrt(50/3)
    assert(r.getDouble(3) === 1.469694) // 6/sd
    assert(r.getDouble(4) === 10.0)
    val c = Seq(5.0, 5.0).toDF("v")
    val rc = Stats.grubbs(c, "v").collect().head
    assert(rc.isNullAt(2) && rc.isNullAt(3) && rc.getDouble(4) === 5.0)
  }

  test("wilsonCi: closed form matches a Scala replica; k = 0 reads " +
      "a zero lower bound and a positive upper bound") {
    val s = spark; import s.implicits._
    val d = Seq(("a", 1), ("a", 0), ("a", 0), ("a", 0),
      ("b", 0), ("b", 0), ("b", 0)).toDF("g", "y")
    val out = Stats.wilsonCi(d, "g", col("y") === 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def wilson(n: Long, k: Long) = {
      val z = 1.959964; val nd = n.toDouble; val p = k.toDouble / nd
      val c = (p + z * z / (2.0 * nd)) / (1.0 + z * z / nd)
      val h = z * math.sqrt(p * (1.0 - p) / nd +
        z * z / (4.0 * nd * nd)) / (1.0 + z * z / nd)
      (r6(c - h), r6(c + h))
    }
    val (alo, ahi) = wilson(4, 1)
    assert(out(0) === (("a", 4L, 1L, 0.25, alo, ahi)))
    val (blo, bhi) = wilson(3, 0)
    assert(out(1)._4 === 0.0 && out(1)._5 === blo && out(1)._6 === bhi)
    assert(out(1)._5 === 0.0 && out(1)._6 > 0.0)
  }

  test("hosmerLemeshow: hand-computed two-bin HL; a degenerate " +
      "all-zero-score bin is excluded via n_bins") {
    val s = spark; import s.implicits._
    // bin0: n=2 E=.4 O=1 -> .36/.32; bin1: n=2 E=1.4 O=2 -> .36/.42
    val d = Seq((0.2, false), (0.2, true), (0.7, true), (0.7, true))
      .toDF("sc", "y")
    val r = Stats.hosmerLemeshow(d, col("y"), "sc", bins = 2)
      .collect().head
    assert(r.getLong(0) === 4L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.982143) // 1.125 + 6/7
    val dg = Seq((0.0, false), (0.6, true)).toDF("sc", "y")
    val rg = Stats.hosmerLemeshow(dg, col("y"), "sc", bins = 2)
      .collect().head
    assert(rg.getLong(0) === 2L && rg.getLong(1) === 1L)
    assert(rg.getDouble(2) === 0.666667) // E=0 bin contributes nothing
  }

  test("jarqueBera: dyadic-exact moments match the closed form; " +
      "zero variance reads null") {
    val s = spark; import s.implicits._
    // {0,0,0,1}: m2=.1875 m3=.09375 m4=.08203125 (all dyadic-exact)
    val d = Seq(0.0, 0.0, 0.0, 1.0).toDF("v")
    val r = Stats.jarqueBera(d, "v").collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 1.154701) // m3/m2^1.5
    assert(r.getDouble(2) === 2.333333) // m4/m2^2
    assert(r.getDouble(3) === 0.962963) // 4/6*(S^2+(K-3)^2/4)
    val c = Seq(5.0, 5.0, 5.0).toDF("v")
    val rc = Stats.jarqueBera(c, "v").collect().head
    assert(rc.isNullAt(1) && rc.isNullAt(2) && rc.isNullAt(3))
  }

  test("permutationTest: constant values read p = 1; a perfect " +
      "separation reads the add-one minimum") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // all values equal → diff_obs 0 and every |db| ≥ 0 → p = 1.0
    val const = (1L to 30L).map(u => (u, 5.0, u <= 15))
      .toDF("u", "v", "t")
    val c = Stats.permutationTest(const, "u", "v", col("t"))
      .collect().head
    assert(c.getLong(0) === 15L && c.getLong(1) === 15L)
    assert(c.getDouble(2) === 0.0 && c.getDouble(5) === 1.0)
    // treated units carry 1.0, controls 0.0: diff_obs = 1; no hash
    // permutation of 40 units reproduces the exact split → n_extreme
    // 0, p = 1/201
    val sep = (1L to 40L).map(u => (u, if (u <= 20) 1.0 else 0.0,
      u <= 20)).toDF("u", "v", "t")
    val p = Stats.permutationTest(sep, "u", "v", col("t"))
      .collect().head
    assert(p.getDouble(2) === 1.0 && p.getLong(4) === 0L)
    assert(p.getDouble(5) === 0.004975)
  }

  test("gainsDeciles: hand-computed 20-row table; score ties rank by " +
      "id so deciles are deterministic") {
    val s = spark; import s.implicits._
    // score = 21 − id (rank order = id order); positives 1,2,3 and 20
    val rows = (1L to 20L).map(i =>
      (i, 21.0 - i, Seq(1L, 2L, 3L, 20L).contains(i)))
      .toDF("id", "sc", "p")
    val out = Stats.gainsDeciles(rows, col("p"), "sc", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.length === 10)
    assert(out(0) === ((1L, 2L, 2L, 2L, 0.5, 5.0)))
    assert(out(1) === ((2L, 2L, 1L, 3L, 0.75, 2.5)))
    for (i <- 2 to 8)
      assert(out(i) === (((i + 1).toLong, 2L, 0L, 3L, 0.75, 0.0)))
    assert(out(9) === ((10L, 2L, 1L, 4L, 1.0, 2.5)))
    // all-tied scores: the id tiebreak buckets 1,2 into the top half
    val tied = (1L to 4L).map(i => (i, 7.0, i <= 2)).toDF("id", "sc", "p")
    val t = Stats.gainsDeciles(tied, col("p"), "sc", "id", nBins = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(5)))
    assert(t.toSeq === Seq((1L, 2L, 2.0), (2L, 0L, 0.0)))
  }

  test("spearman: monotone nonlinear 1; tie-averaged reversal -1; " +
      "textbook 0.6; constant column null") {
    val s = spark; import s.implicits._
    // cubic is monotone: rank-perfect even though Pearson r < 1
    val mono = Seq((1.0, 1.0), (2.0, 8.0), (3.0, 27.0), (4.0, 64.0))
      .toDF("x", "y")
    assert(Stats.spearman(mono, "x", "y").collect().head
      .getDouble(1) === 1.0)
    // doubled tie-averaged ranks: x→(2,5,5,8), y→(8,5,5,2) ⇒ ρ = −1
    val anti = Seq((1.0, 30.0), (2.0, 20.0), (2.0, 20.0), (3.0, 10.0))
      .toDF("x", "y")
    assert(Stats.spearman(anti, "x", "y").collect().head
      .getDouble(1) === -1.0)
    // no ties: ρ = 1 − 6Σd²/(n(n²−1)) = 1 − 24/60 = 0.6
    val mix = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0))
      .toDF("x", "y")
    assert(Stats.spearman(mix, "x", "y").collect().head
      .getDouble(1) === 0.6)
    // constant y: zero rank variance → null, not NaN
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    val c = Stats.spearman(const, "x", "y").collect().head
    assert(c.getLong(0) === 3L && c.isNullAt(1))
  }

  test("ks test: identical samples D=0, disjoint D=1, step CDFs exact") {
    val s = spark; import s.implicits._
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val d0 = Stats.ksTest(same, "g", "v", "a", "b").collect().head
    assert(d0.getDouble(2) === 0.0 && d0.getDouble(3) === 0.0)
    // a entirely below b: the CDF gap hits 1 at the boundary
    val disj = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0),
      ("c", 0.0)).toDF("g", "v") // 'c' must be excluded
    val d1 = Stats.ksTest(disj, "g", "v", "a", "b").collect().head
    assert(d1.getLong(0) === 2L && d1.getLong(1) === 2L)
    assert(d1.getDouble(2) === 1.0)
    assert(math.abs(d1.getDouble(3) - math.sqrt(4.0 / 4.0)) < 1e-9)
    // a={1,2}, b={2,3}: |F_a−F_b| is 0.5 at v=1 and v=2
    val mid = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("g", "v")
    assert(Stats.ksTest(mid, "g", "v", "a", "b").collect().head
      .getDouble(2) === 0.5)
  }

  test("ols regression: exact line recovered per group, constant x null") {
    val s = spark; import s.implicits._
    // group p: y = 2x + 3 exactly; group q: x constant → try_divide null
    val df = ((1 to 20).map(i => ("p", 2.0 * i + 3, i.toDouble)) ++
      (1 to 5).map(i => ("q", i.toDouble, 7.0))).toDF("k", "y", "x")
    val out = Stats.olsRegression(df, "k", "y", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    val p = out("p")
    assert(p.getDouble(2) === 2.0 && p.getDouble(3) === 3.0 &&
      p.getDouble(4) === 1.0)
    val q = out("q")
    assert(q.isNullAt(2) && q.isNullAt(3) && q.isNullAt(4))
  }

  test("calibration bins: equal-width binning, top bin closes at 1") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.col
    // one score per decade + an exact 1.0 (must land in bin 9, not 10);
    // outcome = score ≥ 0.5 → low bins frac_pos 0, high bins 1
    val rows = (0 until 10).map(i => (i / 10.0 + 0.05, i >= 5)) :+
      ((1.0, true))
    val df = rows.toDF("sc", "y")
    val out = Stats.calibrationBins(df, col("y"), "sc", bins = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.map(_._1).toSeq === (0 until 10))
    // bin 9 holds 0.95 AND the closed top edge 1.0
    assert(out.last._2 === 2L && out.last._3 === 0.975 &&
      out.last._4 === 1.0)
    assert(out.take(5).forall(_._4 === 0.0) &&
      out.drop(5).forall(_._4 === 1.0))
    assert(out.head._3 === 0.05)
  }

  test("tost: near-equal groups pass a generous margin and fail a " +
    "tight one; welch readout unchanged by the shared moments") {
    val s = spark; import s.implicits._
    // two groups, means 10.0 vs 10.2, sd ~0.4, n=50 each
    val rows = (1 to 50).flatMap(i => Seq(
      ("a", 10.0 + (i % 5) * 0.2), ("b", 10.2 + (i % 5) * 0.2)))
    val df = rows.toDF("g", "v")
    val wide = graft.ops.Stats.tostEquivalence(df, "g", "v", "a", "b",
      delta = 1.0).collect().head
    assert(wide.getLong(0) === 50L && wide.getLong(1) === 50L)
    assert(math.abs(wide.getDouble(4) + 0.2) < 1e-9) // diff = -0.2
    assert(wide.getLong(8) === 1L) // |diff| far inside ±1.0
    val tight = graft.ops.Stats.tostEquivalence(df, "g", "v", "a", "b",
      delta = 0.05).collect().head
    assert(tight.getLong(8) === 0L) // margin tighter than |diff|
    // the refactor onto twoSampleMoments must not move welch's numbers
    val w = graft.ops.Stats.welchTTest(df, "g", "v", "a", "b")
      .collect().head
    assert(w.getDouble(2) === 10.4 && w.getDouble(3) === 10.6)
  }

  test("poisson bootstrap: constant column collapses the interval; " +
    "interval brackets the mean and is partitioning-invariant") {
    val s = spark; import s.implicits._
    // constant data: every replicate mean is exactly the constant
    val const = (1 to 100).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val c = Stats.bootstrapCi(const, "v", Seq("id"), reps = 50,
      tailRank = 2).collect().head
    assert(c.getLong(0) === 50L)
    assert(c.getDouble(1) === 5.0 && c.getDouble(2) === 5.0 &&
      c.getDouble(3) === 5.0)
    // varied data: lo <= mean <= hi, and the result is identical on a
    // different partitioning (the determinism claim)
    val varied = (1 to 500).map(i => (i.toLong, i.toDouble))
      .toDF("id", "v")
    val r1 = Stats.bootstrapCi(varied, "v", Seq("id"), reps = 50,
      tailRank = 2).collect().head
    assert(r1.getDouble(2) <= r1.getDouble(1) &&
      r1.getDouble(1) <= r1.getDouble(3))
    assert(r1.getDouble(2) < r1.getDouble(3)) // genuine spread
    val r2 = Stats.bootstrapCi(varied.repartition(7), "v", Seq("id"),
      reps = 50, tailRank = 2).collect().head
    assert(r1.toSeq === r2.toSeq)
  }

  test("poisson bootstrap: the BootstrapFold aggregate and the " +
    "declarative explode form agree row-for-row (the oracle replays " +
    "the explode, production runs the fold), incl. on empty input") {
    val s = spark; import s.implicits._
    val varied = (1 to 500)
      .map(i => (i.toLong, i.toDouble * 1.37 - 250.0)).toDF("id", "v")
    val fold = Stats.bootstrapCi(varied, "v", Seq("id"), reps = 50,
      tailRank = 2).collect().head
    val expl = Stats.bootstrapCiExplode(varied, "v", Seq("id"),
      reps = 50, tailRank = 2).collect().head
    assert(fold.toSeq === expl.toSeq)
    // fold is partitioning-invariant too (integer buffer merges)
    val fold7 = Stats.bootstrapCi(varied.repartition(7), "v", Seq("id"),
      reps = 50, tailRank = 2).collect().head
    assert(fold.toSeq === fold7.toSeq)
    // empty input: both forms emit ONE all-null readout row (the
    // BootstrapFold empty buffer evals to NULL, not a zero array)
    val empty = varied.filter($"id" < 0L)
    val ef = Stats.bootstrapCi(empty, "v", Seq("id"), reps = 50,
      tailRank = 2).collect()
    val ee = Stats.bootstrapCiExplode(empty, "v", Seq("id"), reps = 50,
      tailRank = 2).collect()
    assert(ef.length === 1 && ee.length === 1)
    assert(ef.head.toSeq === ee.head.toSeq)
    assert(ef.head.isNullAt(1) && ef.head.isNullAt(2) &&
      ef.head.isNullAt(3))
  }

  test("BootstrapFold 128-bit accumulation: per-cell sums past 2^63 " +
    "stay exact (vs the r13 addExact throw) incl. through merge and " +
    "negative values") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{DecimalType, LongType}
    import org.apache.spark.sql.types.Decimal
    import graft.functions.BootstrapFold
    val agg = BootstrapFold(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, DecimalType(18, 0), nullable = true),
      Literal(1))
    // replay the draw chain to know each seed's Poisson weight at b=0
    def weight(kseed: Long): Long = {
      val u = ((kseed % BootstrapFold.P) * 2654435761L % BootstrapFold.P *
        997919L % BootstrapFold.P) % 1048576L
      BootstrapFold.Cuts.count(u >= _).toLong
    }
    val xu = 999999999999999999L // 10^18 - 1: max precision-18 unscaled
    def feed(buf: Array[Long], seeds: Range, x: Long): Unit =
      seeds.foreach { s =>
        agg.update(buf, InternalRow(s.toLong, Decimal(x)))
      }
    // two partial buffers, 40 max-magnitude rows each: expected cell
    // sum ≈ 40 · 10¹⁸ ≈ 4·10¹⁹ > 2⁶³ ≈ 9.2·10¹⁸ — the old addExact
    // form throws inside this loop
    val b1 = agg.createAggregationBuffer()
    val b2 = agg.createAggregationBuffer()
    feed(b1, 1 to 40, xu)
    feed(b2, 41 to 70, xu)
    feed(b2, 71 to 80, -xu) // sign handling through the carry logic
    agg.merge(b1, b2)
    val expW = ((1 to 70).map(s => weight(s)).sum
      - (71 to 80).map(s => weight(s)).sum)
    val expSum = java.math.BigInteger.valueOf(xu)
      .multiply(java.math.BigInteger.valueOf(expW))
    val cell = agg.eval(b1).asInstanceOf[ArrayData].getStruct(0, 2)
    assert(cell.getDecimal(0, 38, 0).toJavaBigDecimal
      .unscaledValue() === expSum)
    assert(cell.getLong(1) ===
      (1 to 80).map(s => weight(s)).sum)
    // sanity: the magnitude really crossed 2^63 (the regression guard
    // is meaningless if the fixture shrank below the old throw point)
    assert(expSum.abs.bitLength > 63)
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

  test("giniTheil: textbook extremes — uniform is 0, one-holder " +
    "concentration is (n-1)/n scaled; Theil on a known 2-point split") {
    val s = spark; import s.implicits._
    // all equal → gini 0, theil 0
    val eq = Stats.giniTheil(Seq(5L, 5L, 5L, 5L).toDF("x"), "x")
      .collect().head
    assert(eq.getLong(0) === 4L && eq.getDouble(2) === 0.0)
    assert(eq.getDouble(4) === 0.0)
    // 0,0,0,10: S = 4·10, G = (80 − 5·10)/(4·10) = 0.75; the single
    // positive holder has x = μ⁺ → theil 0
    val one = Stats.giniTheil(Seq(0L, 0L, 0L, 10L).toDF("x"), "x")
      .collect().head
    assert(one.getDouble(2) === 0.75 && one.getLong(3) === 1L)
    assert(one.getDouble(4) === 0.0)
    // 1,3: G = (2·(1+6) − 3·4)/(2·4) = 0.25;
    // T = ½[0.5·ln0.5 + 1.5·ln1.5] = 0.130812 at the round-9 terms
    val two = Stats.giniTheil(Seq(1L, 3L).toDF("x"), "x").collect().head
    assert(two.getDouble(2) === 0.25)
    assert(two.getDouble(4) === 0.130812)
    // all-zero measure: valid rows but no mass — gini is 0/0 and
    // there are no positive rows for theil; both must read NULL (the
    // null-on-degenerate convention), never NaN (r11 advice)
    val zero = Stats.giniTheil(Seq(0L, 0L, 0L).toDF("x"), "x")
      .collect().head
    assert(zero.getLong(0) === 3L && zero.getDouble(1) === 0.0)
    assert(zero.isNullAt(2) && zero.getLong(3) === 0L &&
      zero.isNullAt(4))
  }

  test("trimmedMean: 10% of 1..10 drops one per tail; winsorized " +
    "clamps to the rank-2/rank-9 values") {
    val s = spark; import s.implicits._
    val out = Stats.trimmedMean((1 to 10).map(_.toLong).toDF("x"), "x",
      0.1).collect().head
    assert(out.getLong(0) === 10L && out.getLong(1) === 8L)
    assert(out.getDouble(2) === 2.0 && out.getDouble(3) === 9.0)
    assert(out.getDouble(4) === 5.5) // (2+..+9)/8
    assert(out.getDouble(5) === 5.5) // (44 + 1·(2+9))/10
  }

  test("mcnemar: discordant cells only; continuity correction zeroes " +
    "a 2-vs-1 split; nulls drop") {
    val s = spark; import s.implicits._
    // Options carry the null row honestly
    val rows = Seq((Some(true), Some(true)), (Some(true), Some(false)),
      (Some(false), Some(true)), (Some(false), Some(false)),
      (Some(true), Some(false)), (None, Some(true)))
      .toDF("a", "b")
    val out = Stats.mcnemar(rows, col("a"), col("b")).collect().head
    assert(out.getLong(0) === 5L) // null pair dropped
    assert(out.getLong(1) === 2L && out.getLong(2) === 1L)
    assert(out.getDouble(3) === 0.0) // (|2−1|−1)²/3
  }

  test("hillTail: exact log-ratio fold on a known geometric top set; " +
    "short corpus normalizes by the realized n_top - 1, not k") {
    val s = spark; import s.implicits._
    val out = Stats.hillTail(Seq(1L, 2L, 4L, 8L).toDF("x"), "x", k = 2)
      .collect().head
    assert(out.getLong(0) === 2L)
    assert(out.getLong(1) === 3L) // full top-(k+1) realized
    assert(out.getDouble(2) === 2.0) // x_min = 3rd largest
    // h = ln(8/2) + ln(4/2) + ln(2/2) = 2.079441542 at round-9 terms
    assert(out.getDouble(3) === 1.039721) // h/(n_top-1) = h/k here
    assert(out.getDouble(4) === 0.961797) // k/h
    // fewer than k+1 positive rows: n_top = 4 < 6, x_min degrades to
    // the global min and the estimator divides by n_top - 1 = 3 —
    // NOT the requested k = 5 (the r11 silent-mis-scale advice)
    val short = Stats.hillTail(Seq(1L, 2L, 4L, 8L).toDF("x"), "x",
      k = 5).collect().head
    assert(short.getLong(0) === 5L && short.getLong(1) === 4L)
    assert(short.getDouble(2) === 1.0)
    assert(short.getDouble(3) === 1.386294) // h/3
    assert(short.getDouble(4) === 0.721348) // 3/h
  }

  test("cochranArmitage: hand-computed linear dose-response; " +
    "degenerate all-success reads null z") {
    val s = spark; import s.implicits._
    // s=1: 1/4, s=2: 2/4, s=3: 3/4 → T = 14 − 0.5·24 = 2,
    // Var = 0.25·(56 − 48) = 2, z = √2
    val rows = (1 to 3).flatMap(sc => (1 to 4).map(i =>
      (sc.toLong, i <= sc)))
    val out = Stats.cochranArmitage(rows.toDF("s", "y"), col("s"),
      col("y")).collect().head
    assert(out.getLong(0) === 3L && out.getLong(1) === 12L &&
      out.getLong(2) === 6L)
    assert(out.getDouble(3) === 2.0)
    assert(out.getDouble(4) === 1.414214)
    // every trial a success → p(1−p) = 0 → null z
    val degen = Stats.cochranArmitage(
      Seq((1L, true), (2L, true)).toDF("s", "y"), col("s"), col("y"))
      .collect().head
    assert(degen.isNullAt(4))
  }

  test("mantelHaenszel: two hand-built strata pool to OR 2.2; " +
    "zero discordant mass reads null") {
    val s = spark; import s.implicits._
    // stratum A: a=2 b=1 c=1 d=2 (n=6); stratum B: a=b=c=d=1 (n=4)
    // Σad/n = 2/3 + 1/4, Σbc/n = 1/6 + 1/4 → OR = 2.2
    val rows =
      Seq.fill(2)(("A", true, true)) ++ Seq(("A", true, false)) ++
      Seq(("A", false, true)) ++ Seq.fill(2)(("A", false, false)) ++
      Seq(("B", true, true), ("B", true, false), ("B", false, true),
        ("B", false, false))
    val out = Stats.mantelHaenszel(rows.toDF("g", "e", "y"), "g",
      col("e"), col("y")).collect().head
    assert(out.getLong(0) === 2L && out.getLong(1) === 10L)
    assert(out.getDouble(2) === 0.916667 && out.getDouble(3) === 0.416667)
    assert(out.getDouble(4) === 2.2)
    // CMH: ΣO = 3, ΣE = 1.5 + 1, ΣV = 81/180 + 1/3 → the half-unit
    // continuity correction exactly absorbs the 0.5 excess → χ² = 0
    assert(out.getLong(5) === 3L)
    assert(out.getDouble(6) === 2.5)
    assert(out.getDouble(7) === 0.783333)
    assert(out.getDouble(8) === 0.0)
  }

  test("theilDecompose: within-constant groups put ALL inequality in " +
    "the between terms, which sum to the total Theil") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 2L), ("a", 2L), ("b", 4L), ("b", 4L))
      .toDF("g", "x")
    val out = Stats.theilDecompose(df, "g", "x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.map(_._1).toSeq === Seq("a", "b"))
    assert(out.forall(_._4 === 0.0)) // constant within → zero T_g
    assert(out(0)._3 === 0.333333 && out(1)._3 === 0.666667)
    // decomposition identity: Σ between_term == total Theil (within 0)
    val total = Stats.giniTheil(df, "x").collect().head.getDouble(4)
    val between = out.map(_._5).sum
    assert(math.abs(between - total) < 2e-6,
      s"between sum $between != total $total")
  }

  test("classificationReport: fixed 2-row spine, per-class P/R/F1 " +
    "and shared accuracy from one confusion fold") {
    val s = spark; import s.implicits._
    // tp=3 fp=1 fn=2 tn=4 → precision+ 0.75, recall+ 0.6,
    // f1+ = 2·.75·.6/1.35 = 0.666667, acc = 7/10
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(1)((false, true)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(4)((false, false))
    val out = Stats.classificationReport(rows.toDF("y", "p"),
      col("y"), col("p")).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("positive", "negative"))
    val pos = out(0)
    assert(pos.getLong(1) === 5L && pos.getLong(2) === 4L &&
      pos.getLong(3) === 3L)
    assert(pos.getDouble(4) === 0.75 && pos.getDouble(5) === 0.6)
    assert(pos.getDouble(6) === 0.666667 && pos.getDouble(7) === 0.7)
    val neg = out(1)
    assert(neg.getLong(1) === 5L && neg.getLong(2) === 6L &&
      neg.getLong(3) === 4L)
    assert(neg.getDouble(4) === 0.666667 && neg.getDouble(5) === 0.8)
  }
  test("effectSizes: hand-computed d/g/delta on a 3-vs-2 fixture " +
    "with one cross-group tie") {
    val s = spark; import s.implicits._
    // a = [1,2,3], b = [2,4]: m_a=2, m_b=3, v_a=1, v_b=2,
    // sp2 = (2*1 + 1*2)/3 = 4/3 -> d = -1/sqrt(4/3) = -0.866025,
    // g = d*(1 - 3/11) = -0.629837; combined ranks [1, 2.5, 2.5, 4, 5]
    // give R_a = 7.5, U = 1.5, delta = 2*1.5/6 - 1 = -0.5
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0),
      ("b", 4.0)).toDF("g", "v")
    val out = Stats.effectSizes(df, "g", "v", "a", "b").collect().head
    assert(out.getLong(0) === 3L && out.getLong(1) === 2L)
    assert(out.getDouble(2) === -0.866025)
    assert(out.getDouble(3) === -0.629837)
    assert(out.getDouble(4) === -0.5)
  }

  test("wilcoxonSignedRank: zero diffs drop, W+ over signed ranks, " +
    "one-sided keys excluded") {
    val s = spark; import s.implicits._
    // pairs: k1 d=+2, k2 d=-1, k3 d=+3, k4 d=0 (drops), k5 a-only
    // (excluded): |d| ranks 2,1,3 -> W+ = 5, n = 3,
    // z = (5 - 3)/sqrt(3*4*7/24) = 2/sqrt(3.5) = 1.069045
    val df = Seq(("k1", "a", 3.0), ("k1", "b", 1.0),
      ("k2", "a", 1.0), ("k2", "b", 2.0),
      ("k3", "a", 5.0), ("k3", "b", 2.0),
      ("k4", "a", 2.0), ("k4", "b", 2.0),
      ("k5", "a", 9.0)).toDF("k", "g", "v")
    val out = Stats.wilcoxonSignedRank(df, "k", "g", "v", "a", "b")
      .collect().head
    assert(out.getLong(0) === 4L && out.getLong(1) === 3L)
    assert(out.getDouble(2) === 5.0)
    assert(out.getDouble(3) === 1.069045)
  }

  test("hodgesLehmann: even pair count averages the two middles; " +
    "empty side reads null shift") {
    val s = spark; import s.implicits._
    // a daily means [1, 3], b daily means [2]: diffs [-1, 1] ->
    // HL = ( -1 + 1 )/2 = 0
    val df = Seq((1L, "a", 1.0), (2L, "a", 3.0), (1L, "b", 2.0))
      .toDF("k", "g", "v")
    val out = Stats.hodgesLehmann(df, col("k"), "g", "v", "a", "b")
      .collect().head
    assert(out.getLong(0) === 2L && out.getLong(1) === 1L)
    assert(out.getLong(2) === 2L && out.getDouble(3) === 0.0)
    val empty = Stats.hodgesLehmann(df, col("k"), "g", "v", "a", "zzz")
      .collect().head
    assert(empty.getLong(2) === 0L && empty.isNullAt(3))
  }

  test("prAuc: threshold-granular average precision with a tied " +
    "score; perfect ranking reads 1") {
    val s = spark; import s.implicits._
    // desc thresholds: 0.9 (tp, P=1), 0.8 (fp), 0.7 {tp, fp} term
    // = 1*(2/4) = 0.5, 0.6 (fp) -> AP = (1 + 0.5)/2 = 0.75
    val df = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.7, 0), (0.6, 0))
      .toDF("sc", "pos")
    val out = Stats.prAuc(df, col("pos") === 1, "sc").collect().head
    assert(out.getLong(0) === 2L && out.getLong(1) === 3L)
    assert(out.getDouble(2) === 0.75 && out.getDouble(3) === 0.4)
    val perfect = Stats.prAuc(
      Seq((0.9, 1), (0.8, 1), (0.1, 0)).toDF("sc", "pos"),
      col("pos") === 1, "sc").collect().head
    assert(perfect.getDouble(2) === 1.0)
  }

  test("ridgeRegression: lambda=0 recovers an exact plane; " +
    "collinear features read null at lambda=0") {
    val s = spark; import s.implicits._
    // y = 1 + 2*x1 - x2 exactly
    val df = Seq((0.0, 0.0, 1.0), (1.0, 0.0, 3.0), (0.0, 1.0, 0.0),
      (1.0, 1.0, 2.0), (2.0, 1.0, 4.0)).toDF("x1", "x2", "y")
    val out = Stats.ridgeRegression(df, "y", "x1", "x2", 0.0)
      .collect().head
    assert(out.getLong(0) === 5L)
    assert(out.getDouble(1) === 1.0 && out.getDouble(2) === 2.0 &&
      out.getDouble(3) === -1.0 && out.getDouble(4) === 1.0)
    // x2 = x1: det = 0 at lambda 0 -> null coefficients, no blowup
    val col2 = Seq((1.0, 1.0, 1.0), (2.0, 2.0, 2.0), (3.0, 3.0, 3.0))
      .toDF("x1", "x2", "y")
    val degen = Stats.ridgeRegression(col2, "y", "x1", "x2", 0.0)
      .collect().head
    assert(degen.isNullAt(2) && degen.isNullAt(3))
    // and the ridge solve at lambda > 0 is defined (shrunk toward 0)
    val ridge = Stats.ridgeRegression(col2, "y", "x1", "x2", 1.0)
      .collect().head
    assert(!ridge.isNullAt(2) && math.abs(ridge.getDouble(2)) < 1.0)
  }

  test("friedmanTest: tie-corrected Q and Kendall's W on a 3x3 " +
    "fixture; incomplete blocks drop") {
    val s = spark; import s.implicits._
    // blocks 1/2 rank a<b<c and a<c<b; block 3 ties b=c above a:
    // R_a=3, R_b=7.5, R_c=7.5 -> sum R^2 = 121.5, Q0 = 4.5,
    // ties = 2^3-2 = 6, C = 1 - 6/72 -> Q = 4.909091, W = 0.818182;
    // block 4 has only 'a' -> incomplete, dropped
    val df = Seq(
      (1L, "a", 1.0), (1L, "b", 2.0), (1L, "c", 3.0),
      (2L, "a", 1.0), (2L, "b", 3.0), (2L, "c", 2.0),
      (3L, "a", 1.0), (3L, "b", 2.0), (3L, "c", 2.0),
      (4L, "a", 9.0)).toDF("k", "g", "v")
    val out = Stats.friedmanTest(df, col("k"), "g", "v").collect().head
    assert(out.getLong(0) === 3L && out.getLong(1) === 3L)
    assert(out.getDouble(2) === 4.909091)
    assert(out.getDouble(3) === 0.818182)
    // every block fully tied -> C = 0 -> null Q/W
    val flat = Seq((1L, "a", 5.0), (1L, "b", 5.0),
      (2L, "a", 7.0), (2L, "b", 7.0)).toDF("k", "g", "v")
    val deg = Stats.friedmanTest(flat, col("k"), "g", "v")
      .collect().head
    assert(deg.isNullAt(2) && deg.isNullAt(3))
  }

  test("brierDecomposition: hand-computed Murphy split on 2 bins; " +
    "identity REL - RES + UNC = binned BS") {
    val s = spark; import s.implicits._
    // scores .9/.7/.7 in bin1 (2 pos), .2/.1 in bin0 (0 pos):
    // brier = 0.64/5 = 0.128; REL = (0.03+0.045)/5 = 0.015;
    // RES = (0.213333+0.32)/5 = 0.106667; UNC = 0.4*0.6 = 0.24
    val df = Seq((0.9, 1), (0.7, 1), (0.7, 0), (0.2, 0), (0.1, 0))
      .toDF("sc", "pos")
    val out = Stats.brierDecomposition(df, col("pos") === 1, "sc",
      bins = 2).collect().head
    assert(out.getLong(0) === 5L)
    assert(out.getDouble(1) === 0.128)
    assert(out.getDouble(2) === 0.015)
    assert(out.getDouble(3) === 0.106667)
    assert(out.getDouble(4) === 0.24)
    // rel - res + unc = 0.148333 = the binned Brier (raw + within-bin
    // variance): the decomposition identity at the emitted rounding
    assert(math.abs(out.getDouble(2) - out.getDouble(3) +
      out.getDouble(4) - 0.148333) < 1e-6)
  }

  test("fisherExact: exact two-sided p on the 4/4 margins table; " +
    "single-support-point table reads p 1") {
    val s = spark; import s.implicits._
    // [[3,1],[1,3]]: support pmf = {1,16,36,16,1}/70; obs a=3 ->
    // p = (1+16+16+1)/70 = 0.485714, OR = 9
    val rows = Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.toDF("ex", "oc")
    val out = Stats.fisherExact(df, col("ex"), col("oc"))
      .collect().head
    assert(out.getLong(0) === 8L && out.getLong(1) === 4L &&
      out.getLong(2) === 4L && out.getLong(3) === 3L)
    assert(out.getDouble(4) === 9.0)
    assert(out.getDouble(5) === 0.485714)
    // every row positive: the support is one point -> p = 1
    val one = Seq((true, true), (false, true), (true, true))
      .toDF("ex", "oc")
    val pOne = Stats.fisherExact(one, col("ex"), col("oc"))
      .collect().head
    assert(pOne.getDouble(5) === 1.0)
  }

  test("dunnPostHoc: pooled-rank pairwise z on three clean groups; " +
    "Bonferroni triples the per-pair p") {
    val s = spark; import s.implicits._
    // a=[1,2], b=[3,4], c=[5,6]: global ranks 1..6, no ties ->
    // mean ranks 1.5/3.5/5.5, sigma = sqrt(3.5 * (1/2+1/2)),
    // z_ab = -2/1.8708287 = -1.069045, z_ac = -4/... = -2.13809
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val out = Stats.dunnPostHoc(df, "g", "v").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    assert(out(("a", "b"))._1 === -1.069045)
    assert(out(("a", "c"))._1 === -2.13809)
    assert(out(("b", "c"))._1 === -1.069045)
    // k = 3 -> m = 3 comparisons; p_adj = round(min(1, 3p), 6)
    out.values.foreach { case (_, p, pAdj) =>
      assert(p > 0.0 && p < 1.0)
      assert(pAdj === math.round(math.min(1.0, 3.0 * p) * 1e6) / 1e6)
    }
  }

  test("logisticIrls: saturated 2x2x2 fixture recovers the exact " +
    "closed-form MLE; independent outcome reads zero slopes") {
    val s = spark; import s.implicits._
    // P(y=1 | x1=0) = 1/4, P(y=1 | x1=1) = 3/4, x2 independent:
    // MLE b0 = ln(1/3) = -1.098612, b1 = 2 ln 3 = 2.197225, b2 = 0
    val rows = for {
      x2 <- Seq(0.0, 1.0); x1 <- Seq(0.0, 1.0); i <- 1 to 4
    } yield {
      val y = if (x1 == 1.0) i <= 3 else i <= 1
      (y, x1, x2)
    }
    val out = Stats.logisticIrls(rows.toDF("y", "x1", "x2"),
      col("y"), "x1", "x2", 6).collect().head
    assert(out.getLong(0) === 16L)
    assert(out.getDouble(1) === -1.098612)
    assert(out.getDouble(2) === 2.197225)
    assert(out.getDouble(3) === 0.0)
    assert(out.getDouble(4) > 0.0 && out.getDouble(5) > 0.0)
    // log-loss beats the no-information ln 2
    assert(out.getDouble(7) < 0.693147)
    // y independent of both features: slopes 0, b0 = logit(1/2) = 0
    val flat = (for {
      x1 <- Seq(0.0, 1.0); x2 <- Seq(0.0, 1.0); y <- Seq(true, false)
    } yield (y, x1, x2)).toDF("y", "x1", "x2")
    val nul = Stats.logisticIrls(flat, col("y"), "x1", "x2", 6)
      .collect().head
    assert(nul.getDouble(1) === 0.0 && nul.getDouble(2) === 0.0 &&
      nul.getDouble(3) === 0.0)
    assert(nul.getDouble(7) === 0.693147) // ln 2
  }

  test("weightedQuantiles: cumulative integer weights pick the run " +
    "containing ceil(q*W); weight-1 rows degrade to plain quantiles") {
    val s = spark; import s.implicits._
    // values 10,20,30 with weights 1,2,7: W=10, cum 1/3/10
    val df = Seq((10L, 1L), (20L, 2L), (30L, 7L)).toDF("x", "w")
    val out = Stats.weightedQuantiles(df, "x", "w",
      Seq(0.1, 0.25, 0.5, 1.0)).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((0.1, 1L, 10.0), (0.25, 3L, 20.0),
      (0.5, 5L, 30.0), (1.0, 10L, 30.0)))
  }
}
