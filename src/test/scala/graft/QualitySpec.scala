package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Quality
import graft.ops.Quality._

/** Declarative data-quality suite (graft.ops.Quality): per-check metrics
  * and pass flags, declaration-order output, and the one-scan contract
  * for row-local checks.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def df = {
    val s = spark; import s.implicits._
    Seq(
      (1L, Some("a"), 10.0, "ok"),
      (2L, Some("b"), 20.0, "ok"),
      (3L, None, 30.0, "bad"),
      (3L, Some("d"), 99.0, "ok")
    ).toDF("id", "name", "score", "status")
  }

  test("row-local checks: metrics and pass flags in declaration order") {
    val out = Quality.run(df, Seq(
      Completeness("name", minRatio = 0.9),
      InRange("score", 0.0, 50.0),
      AcceptedValues("status", Seq("ok")),
      RowCount(atLeast = 3L)
    )).collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))

    assert(out === Seq(
      ("completeness:name", 0.75, false),
      ("in_range:score", 1.0, false),       // 99.0 out of range
      ("accepted:status", 1.0, false),      // one "bad"
      ("row_count", 4.0, true)))
  }

  test("unique: counts over-represented key tuples") {
    val out = Quality.run(df, Seq(Unique(Seq("id"))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(out === Seq(("unique:id", 1.0, false))) // id=3 twice
  }

  test("ref integrity: orphan foreign keys counted; null is an orphan") {
    val s = spark; import s.implicits._
    val ref = Seq(1L, 2L).toDF("k")
    val facts = Seq((Some(1L), "x"), (Some(7L), "y"), (None, "z"))
      .toDF("fk", "v")
    val out = Quality.run(facts, Seq(RefIntegrity("fk", ref, "k")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(out === Seq(("ref_integrity:fk", 2.0, false)))
  }

  test("mixed suite interleaves in declaration order") {
    val s = spark; import s.implicits._
    val ref = Seq(1L, 2L, 3L).toDF("k")
    val out = Quality.run(df, Seq(
      Unique(Seq("id", "name")),
      Completeness("id"),
      RefIntegrity("id", ref, "k"),
      RowCount(1L)
    )).collect().map(_.getString(0))
    assert(out === Seq(
      "unique:id,name", "completeness:id", "ref_integrity:id", "row_count"))
  }

  test("all-green suite passes every check") {
    val out = Quality.run(df, Seq(
      Completeness("name", minRatio = 0.5),
      InRange("score", 0.0, 100.0),
      RowCount(1L),
      Unique(Seq("id", "score"))
    )).collect()
    assert(out.forall(_.getBoolean(2)))
  }

  test("quarantine: rows collect the sorted names of failed checks") {
    val out = Quality.quarantine(df, Seq(
      Completeness("name"), InRange("score", 0, 50),
      AcceptedValues("status", Seq("ok"))))
      .select("id", "score", "dq_reasons", "dq_pass").collect()
      .map(r => (r.getLong(0), r.getDouble(1)) ->
        ((r.getSeq[String](2), r.getBoolean(3)))).toMap
    assert(out((1L, 10.0)) === ((Seq(), true)))
    // row 3/None/bad fails completeness AND accepted, sorted names
    assert(out((3L, 30.0)) ===
      ((Seq("accepted:status", "completeness:name"), false)))
    // score 99 out of range only
    assert(out((3L, 99.0)) === ((Seq("in_range:score"), false)))
  }

  test("quarantine: a NULL value fails range and accepted checks") {
    val s = spark; import s.implicits._
    val d2 = Seq((1L, Option.empty[Double], Option.empty[String]))
      .toDF("id", "v", "st")
    val out = Quality.quarantine(d2, Seq(
      InRange("v", 0, 1), AcceptedValues("st", Seq("x"))))
      .select("dq_reasons").head().getSeq[String](0)
    assert(out === Seq("accepted:st", "in_range:v"))
  }

  test("quarantine rejects a table-level-only check list") {
    val ex = intercept[IllegalArgumentException] {
      Quality.quarantine(df, Seq(RowCount(1L)))
    }
    assert(ex.getMessage.contains("row-local"))
  }

  test("row-local checks compile into one aggregate over one scan") {
    val plan = Quality.run(df, Seq(
      Completeness("name"), InRange("score", 0, 100),
      AcceptedValues("status", Seq("ok")), RowCount(1L)
    )).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r if r.getClass.getSimpleName.contains("LogicalRDD") => r
    }
    assert(scans.length === 1, s"expected one scan of the input:\n$plan")
  }

  test("benford: first significant digit via decimal rendering; sign " +
      "and leading zeros ignored, exact zeros drop; absent digits " +
      "ride the 1..9 spine with n = 0 and a full (0−exp)²/exp term") {
    val s = spark; import s.implicits._
    // digits: 1 ← {1.0, 12.3, 150.0}, 2 ← {2.5, −245.5}, 3 ← {30.1};
    // 0.0 contributes nothing; 4..9 never occur — the strongest-
    // violation case the spine exists for
    val vals = Seq(1.0, 12.3, 150.0, 2.5, 30.1, -245.5, 0.0)
      .toDF("x")
    val out = Quality.benford(vals, "x").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(4), r.getDouble(5)))
    val counts = Seq((1L, 3L), (2L, 2L), (3L, 1L), (4L, 0L), (5L, 0L),
      (6L, 0L), (7L, 0L), (8L, 0L), (9L, 0L))
    assert(out.map(t => (t._1, t._2)).toSeq === counts)
    assert(out(0)._3 === 0.5)
    assert(out(3)._3 === 0.0) // absent digit's share
    // χ² terms mirror the op's IEEE chain exactly — an absent digit's
    // term (0 − e)²/e collapses to e itself
    def r9(v: Double) =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expTerms = counts.map { case (d, n) =>
      val e = 6.0 * r9(math.log10(1.0 + 1.0 / d))
      r6((n - e) * (n - e) / e)
    }
    assert(out.map(_._4).toSeq === expTerms)
    val chi2 = r6(expTerms.map(BigDecimal(_)).sum.toDouble)
    assert(out.forall(_._5 === chi2))
  }
}
