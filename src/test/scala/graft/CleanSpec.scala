package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Clean, Quantize}

/** Winsorization (graft.ops.Clean) and random projection
  * (Quantize.randomProject).
  */
class CleanSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  test("winsorize: values clamp to the exact [loQ, hiQ] quantiles") {
    val s = spark; import s.implicits._
    // 1..100: p10 = value at ceil(0.1*100)=10, p90 at rank 90
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Clean.winsorize(df, "v", Seq(asc("id")), 0.1, 0.9)
      .select("id", "v_w").collect().map(r => (r.getLong(0),
        r.getDouble(1))).toMap
    assert(out(1L) === 10.0 && out(5L) === 10.0 && out(10L) === 10.0)
    assert(out(50L) === 50.0)
    assert(out(90L) === 90.0 && out(95L) === 90.0 && out(100L) === 90.0)
  }

  test("mad outliers: a spike flags, the bulk does not, score is exact") {
    val s = spark; import s.implicits._
    // 1..9 plus a 1000 spike: median = value at ceil(0.5*10) = 5,
    // |x-5| = {4,3,2,1,0,1,2,3,4,995} → MAD = value at rank 5 of the
    // sorted devs {0,1,1,2,2,3,3,4,4,995} = 2
    val df = ((1 to 9).map(i => (i.toLong, i.toDouble)) :+
      (10L, 1000.0)).toDF("id", "v")
    val out = Clean.madOutliers(df, "v", Seq(asc("id")))
      .select("id", "v_rz", "is_outlier").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val c = Clean.MadConsistency
    assert(out(10L)._2 === true)
    assert(math.abs(out(10L)._1 - c * 995.0 / 2.0) < 1e-6)
    assert((1L to 9L).forall(i => !out(i)._2))
    assert(out(5L)._1 === 0.0)
  }

  test("mad outliers: zero MAD yields null scores and no flags") {
    val s = spark; import s.implicits._
    // majority-constant column: median = 5, MAD = 0 even though a
    // genuine outlier exists — the documented null-score degenerate
    val df = ((1 to 8).map(i => (i.toLong, 5.0)) :+ (9L, 100.0))
      .toDF("id", "v")
    val out = Clean.madOutliers(df, "v", Seq(asc("id"))).collect()
    assert(out.forall(r => r.isNullAt(r.fieldIndex("v_rz"))))
    assert(out.forall(!_.getBoolean(3)))
  }

  test("winsorize: all-equal column is a no-op") {
    val s = spark; import s.implicits._
    val df = (1 to 10).map(i => (i.toLong, 7.0)).toDF("id", "v")
    val out = Clean.winsorize(df, "v", Seq(asc("id")))
      .select("v_w").collect().map(_.getDouble(0))
    assert(out.forall(_ === 7.0))
  }

  test("random projection: k dims out, deterministic, linear in input") {
    val s = spark; import s.implicits._
    val emb = Seq((1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(2.0f, 4.0f, 6.0f)), // 2× vector 1
      (3L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Quantize.randomProject(emb, 4).orderBy("vec_id").collect()
      .map(r => r.getSeq[Double](1))
    assert(out.forall(_.length === 4))
    // zero vector projects to zero
    assert(out(2).forall(_ === 0.0))
    // linearity up to the round(,6): proj(2x) ≈ 2·proj(x)
    out(0).zip(out(1)).foreach { case (a, b) =>
      assert(math.abs(b - 2 * a) < 1e-5, s"$b vs 2*$a")
    }
    // deterministic across invocations
    val again = Quantize.randomProject(emb, 4).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1))
    assert(out.toSeq.map(_.toSeq) === again.toSeq.map(_.toSeq))
  }
}
