package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: media ride along as opaque BINARY columns with typed
  * metadata, and every transform is either a codegen'd column expression
  * (hashing, byte stats, frame-offset planning) or a record-local typed
  * map (decode) — so media rows partition, shuffle and spill exactly like
  * any other row at 100 TB.
  *
  * Schema contract:
  *   media(doc_id BIGINT, media_type STRING ('image'|'audio'|'video'),
  *         bytes BINARY,
  *         meta STRUCT<width INT, height INT, duration_ms BIGINT>)
  *
  * The actual codec decode is NOT implemented here (no image/audio codecs
  * in this environment): [[DecodeStub.decode]] is a clearly-marked
  * deterministic stand-in with the same signature and batch shape a real
  * JNI/javax.imageio decoder would have. Everything AROUND the decode —
  * schema, partitioning, per-row feature expressions, frame sampling —
  * is real and oracle-checked.
  */
object Multimodal {

  /** Deterministic stand-in for the codec boundary. */
  object DecodeStub {
    /** A real implementation would return decoded pixel/sample buffers;
      * the stand-in derives a stable pseudo-buffer from the content hash
      * so downstream plumbing (shape, determinism, spill) is exercised
      * honestly. Marked: STUB — replace with a codec at integration time.
      */
    def decode(bytes: Array[Byte], mediaType: String): Array[Float] = {
      val seed = java.util.Arrays.hashCode(bytes)
      val rnd = new scala.util.Random(seed)
      val n = mediaType match {
        case "image" => 64
        case "audio" => 128
        case _ => 32
      }
      Array.fill(n)(rnd.nextFloat())
    }
  }

  /** Byte-level features as pure column expressions (no decode needed):
    * size, 128-bit content hash, and an 8-dim pseudo-embedding derived
    * from the content hash — the shape a CLIP-style featurizer produces,
    * deterministic and cross-engine verifiable.
    */
  def byteFeatures(media: DataFrame, dims: Int = 8): DataFrame =
    media.select(col("doc_id"), col("media_type"),
      length(col("bytes")).cast("long").as("n_bytes"),
      md5(col("bytes")).as("content_md5"))
      .withColumn("pseudo_embedding", expr(
        s"transform(sequence(0, ${dims - 1}), i -> " +
          s"(${Hashing.md5LongSql("concat(content_md5, ':', cast(i as string))")} % 2000001 - 1000000) / 1000000.0)"))

  /** Frame-sampling plan for video rows: one row per sampled frame at a
    * fixed stride — pure `sequence` + `explode`, the sampled decode work
    * then fans out across the cluster one frame per row.
    */
  def sampleFrames(media: DataFrame, strideMs: Long): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("meta.duration_ms").as("duration_ms"))
      .withColumn("frame_ms", explode(expr(
        s"sequence(0, greatest(duration_ms - 1, 0), $strideMs)")))

  /** Decode + feature step as a typed map (the real-codec execution
    * shape): record-local, no shuffle; output is (doc_id, dim,
    * checksum-ish mean) so tests can assert batch shape and determinism.
    */
  def decodedStats(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select("doc_id", "media_type", "bytes")
      .as[(Long, String, Array[Byte])]
      .map { case (id, mt, bytes) =>
        val buf = DecodeStub.decode(bytes, mt)
        (id, buf.length, buf.sum / buf.length)
      }
      .toDF("doc_id", "dim", "mean_value")
  }
}
