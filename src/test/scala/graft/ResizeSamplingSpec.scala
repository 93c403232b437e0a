package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Multimodal, Sampling, Profile}

/** Unit coverage for the round-7 utility ops: nearest-neighbor resize
  * (pure function + typed-map path), weighted/balanced sampling
  * (proportion + determinism properties), and one-pass profiling.
  */
class ResizeSamplingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  test("resizeNearest downscale picks exact source pixels") {
    // 4x2 image, channel value = pixel ordinal
    val px = Array.tabulate(4 * 2 * 3)(i => (i / 3).toFloat)
    val out = Multimodal.resizeNearest(4, 2, px, 2, 1)
    // out(0,0) <- src(0,0) = 0; out(0,1) <- src(0, 2) = 2
    assert(out.grouped(3).map(_.head).toSeq === Seq(0f, 2f))
  }

  test("resizeNearest upscale replicates pixels; identity is exact") {
    val px = Array.tabulate(2 * 1 * 3)(i => (i / 3).toFloat)
    val up = Multimodal.resizeNearest(2, 1, px, 4, 1)
    assert(up.grouped(3).map(_.head).toSeq === Seq(0f, 0f, 1f, 1f))
    assert(Multimodal.resizeNearest(2, 1, px, 2, 1).toSeq === px.toSeq)
  }

  test("resizeNearest validates dims and buffer length") {
    assertThrows[IllegalArgumentException](
      Multimodal.resizeNearest(0, 1, Array.empty[Float], 1, 1))
    assertThrows[IllegalArgumentException](
      Multimodal.resizeNearest(2, 1, new Array[Float](5), 1, 1))
  }

  test("weightedSample keeps ~rate and is repartition-invariant") {
    val s = spark; import s.implicits._
    val df = (1L to 4000L).toDF("id")
    val kept = Sampling.weightedSample(df, "id", lit(0.3))
    val n = kept.count()
    assert(n > 1000 && n < 1400, s"kept $n of 4000 at rate 0.3")
    val n13 = Sampling
      .weightedSample(df.repartition(13), "id", lit(0.3)).count()
    assert(n13 === n)
    // rate 0 keeps nothing; rate 1 keeps all but hash-bucket 999999+
    assert(Sampling.weightedSample(df, "id", lit(0.0)).count() === 0L)
  }

  test("balancedSample caps hot classes, leaves small classes whole") {
    val s = spark; import s.implicits._
    val df = ((1 to 3000).map(i => (s"r$i", "hot")) ++
      (1 to 40).map(i => (s"s$i", "cold"))).toDF("id", "cls")
    val kept = Sampling.balancedSample(df, "id", "cls", 300L)
      .groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("cold") === 40L) // rate 1: untouched
    assert(kept("hot") > 200L && kept("hot") < 400L, kept.toString)
  }

  test("profile computes nulls, distinct and min/max per column") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")),
      (3L, Some("a"))).toDF("k", "v")
    val p = Profile.profile(df, Seq("k", "v")).orderBy("column")
      .collect()
    val k = p(0); val v = p(1)
    assert(k.getString(0) === "k" && k.getLong(1) === 4L &&
      k.getLong(2) === 0L && k.getLong(3) === 3L &&
      k.getString(4) === "1" && k.getString(5) === "3")
    assert(v.getString(0) === "v" && v.getLong(2) === 1L &&
      v.getLong(3) === 2L && v.getString(4) === "a" &&
      v.getString(5) === "b")
  }
}
