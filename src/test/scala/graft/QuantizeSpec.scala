package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Quantize, TextModels}

/** SQ8 scalar quantization (graft.ops.Quantize) and feature-hashing
  * vectorization (TextModels.featureHash).
  */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  test("sq8: codes hit the range ends and reconstruction is within " +
    "half a quantization step") {
    val s = spark; import s.implicits._
    val emb = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, Array(1.0f, 20.0f)),
      (3L, Array(0.5f, 15.0f))).toDF("vec_id", "embedding")
    val out = Quantize.sq8(emb).orderBy("vec_id").collect()
    val codes = out.map(r => r.getSeq[Long](1))
    // dim 0 range [0,1]: 0.0→0, 1.0→255 (floor(256) clamped), 0.5→128
    assert(codes(0)(0) === 0L && codes(1)(0) === 255L &&
      codes(2)(0) === 128L)
    // dim 1 range [10,20]
    assert(codes(0)(1) === 0L && codes(1)(1) === 255L &&
      codes(2)(1) === 128L)
    // MSE bounded by (step/2)^2 per dim; worst step is 10/256
    val maxMse = math.pow(10.0 / 256 / 2, 2)
    assert(out.forall(_.getDouble(3) <= maxMse + 1e-9))
  }

  test("sq8: constant dimension quantizes to 0 without dividing by zero") {
    val s = spark; import s.implicits._
    val emb = Seq((1L, Array(5.0f, 1.0f)), (2L, Array(5.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.sq8(emb).orderBy("vec_id").collect()
    assert(out.map(_.getSeq[Long](1).head).toSeq === Seq(0L, 0L))
  }

  test("feature hash: buckets within dim, signed counts, zeros dropped") {
    val s = spark; import s.implicits._
    // doc 1 repeats doc 2's only token, so its single bucket must carry
    // exactly twice the weight regardless of where the hash lands
    val docs = Seq((1L, "alpha alpha"), (2L, "alpha")).toDF(
      "doc_id", "text")
    val out = TextModels.featureHash(docs, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, idx, w) => idx >= 0 && idx < 16 && w != 0 })
    val Seq((i1, w1)) = out.collect { case (1L, i, w) => (i, w) }.toSeq
    val Seq((i2, w2)) = out.collect { case (2L, i, w) => (i, w) }.toSeq
    assert(i1 === i2 && w1 === 2 * w2 && math.abs(w2) === 1)
  }

  test("feature hash: colliding opposite-sign tokens can cancel to zero " +
    "and are then dropped") {
    val s = spark; import s.implicits._
    // dim=1 forces every token into bucket 0; find two tokens with
    // opposite signs so the sum cancels
    val docs = Seq((1L, "aa bb cc dd ee ff")).toDF("doc_id", "text")
    val rows = TextModels.featureHash(docs, 1).collect()
    // six tokens, one bucket: either they cancel (no row) or sum != 0
    assert(rows.length <= 1)
    rows.foreach(r => assert(r.getLong(2) != 0))
  }
}
