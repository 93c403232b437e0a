package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.ops.Multimodal.{DecoderContract, ExternalDecoder}

/** Pluggable external-codec contract (Multimodal.ExternalDecoder /
  * DecoderContract): the boundary a licensed MP3/H.264 drop-in must
  * satisfy, enforced executably — determinism, shape consistency,
  * bounded range, totality on junk, closure serializability — plus the
  * end-to-end dispatch proof that a plugged decoder actually serves the
  * typed-map path where the stub otherwise would.
  */
/** Reference drop-in: a toy "MPA1" container (4-byte magic, then
  * PCM-u8 mono samples) decoded to [-1, 1] floats — structurally
  * everything a real MP3 decoder would be, minus the entropy coding.
  * Top-level (no outer-instance capture): decoders ship in task
  * closures, so they must serialize standalone.
  */
private class ToyMp3 extends ExternalDecoder {
  def decode(bytes: Array[Byte]): Option[ExternalDecoder.Decoded] = {
    if (bytes.length < 5 || bytes(0) != 'M' || bytes(1) != 'P' ||
      bytes(2) != 'A' || bytes(3) != '1') return None
    val body = bytes.drop(4)
    Some(ExternalDecoder.Decoded(Array(1, body.length),
      body.map(b => ((b & 0xff) - 128) / 128.0f)))
  }
}

class ExternalDecoderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def container(payload: Array[Byte]): Array[Byte] =
    "MPA1".getBytes("US-ASCII") ++ payload

  test("the reference drop-in passes the contract") {
    val samples = Seq(container(Array[Byte](0, 64, -128, 127)),
      container(Array.tabulate[Byte](32)(_.toByte)))
    val errs = DecoderContract.violations(new ToyMp3, samples,
      range = (-1f, 1f))
    assert(errs.isEmpty, errs.mkString("; "))
  }

  test("contract rejects a throwing decoder") {
    val bad = new ExternalDecoder {
      def decode(bytes: Array[Byte]) = {
        require(bytes.length > 4, "boom") // throws on junk: violation
        Some(ExternalDecoder.Decoded(Array(1, bytes.length),
          new Array[Float](bytes.length)))
      }
    }
    val errs = DecoderContract.violations(bad,
      Seq(Array.fill[Byte](8)(1)))
    assert(errs.exists(_.contains("must return None")))
  }

  test("contract rejects shape and range violations") {
    val wrongShape = new ExternalDecoder {
      def decode(bytes: Array[Byte]) = Some(
        ExternalDecoder.Decoded(Array(2, 3), new Array[Float](5)))
    }
    assert(DecoderContract.violations(wrongShape,
      Seq(Array[Byte](1))).exists(_.contains("dims.product")))
    val outOfRange = new ExternalDecoder {
      def decode(bytes: Array[Byte]) = Some(
        ExternalDecoder.Decoded(Array(2), Array(0.5f, 7f)))
    }
    assert(DecoderContract.violations(outOfRange,
      Seq(Array[Byte](1))).exists(_.contains("outside")))
  }

  test("a plugged decoder serves the typed-map path end-to-end") {
    val s = spark; import s.implicits._
    val payload = Array[Byte](0, 64, -128, 127) // -1, -0.5, 0, ~0.99
    val media = Seq((1L, "audio", container(payload)))
      .toDF("doc_id", "media_type", "bytes")
    val ext = Map("audio" -> (new ToyMp3: ExternalDecoder))
    val row = Multimodal.decodedStats(media, ext).collect().head
    assert(row.getAs[Int]("dim") === 4)
    val expected = payload.map(b => ((b & 0xff) - 128) / 128.0)
      .foldLeft(0.0)(_ + _) / 4
    assert(math.abs(row.getAs[Double]("mean_value") - expected) < 1e-9)
    // without the drop-in the same bytes fall through to the stub,
    // whose pseudo-buffer is 128 floats — proving the dispatch order
    val stubRow = Multimodal.decodedStats(media).collect().head
    assert(stubRow.getAs[Int]("dim") === 128)
  }

  test("built-in parsers keep precedence over a drop-in") {
    val s = spark; import s.implicits._
    // a REAL WAV container must be parsed by the built-in RIFF parser
    // even when an external audio decoder is plugged in
    val media = Seq((1L, "audio")).toDF("doc_id", "media_type")
      .withColumn("bytes",
        Multimodal.wavU8(lit(Array[Byte](0, 127, -1))))
    val greedy = new ExternalDecoder { // claims EVERYTHING
      def decode(bytes: Array[Byte]) = Some(
        ExternalDecoder.Decoded(Array(1), Array(0f)))
    }
    val row = Multimodal
      .decodedStats(media, Map("audio" -> greedy)).collect().head
    assert(row.getAs[Int]("dim") === 3) // WAV samples, not the greedy 1
  }
}
