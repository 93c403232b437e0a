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

  /** REAL decoders for the uncompressed container formats that need no
    * codec library — pure JVM parsing of public byte-level specs. These
    * prove the codec boundary end-to-end (parse → sample buffer → typed
    * map) with actual bytes; compressed codecs (JPEG/MP3/H.264) remain
    * behind [[DecodeStub]] in this environment.
    */
  object Decode {

    /** Binary PPM (P6): `P6 <w> <h> <maxval>` header (whitespace/comment
      * tokenized) then w·h RGB byte triplets. Returns (width, height,
      * pixels scaled to [0, 1]).
      */
    def ppm(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
      var i = 2
      def skipWs(): Unit = {
        var go = true
        while (go && i < bytes.length) {
          val c = bytes(i).toChar
          if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else if (c.isWhitespace) i += 1
          else go = false
        }
      }
      def int(): Int = {
        skipWs(); var v = 0
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = v * 10 + (bytes(i) - '0'); i += 1
        }
        v
      }
      val w = int(); val h = int(); val maxv = int()
      if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
      i += 1 // exactly one whitespace byte after maxval (spec)
      // pixel count in Long: crafted w×h headers overflow Int and would
      // either crash allocation or silently pass the bounds check
      val nL = w.toLong * h * 3
      if (nL > bytes.length.toLong - i) return None
      val n = nL.toInt
      val out = new Array[Float](n)
      var k = 0
      while (k < n) { out(k) = (bytes(i + k) & 0xff).toFloat / maxv; k += 1 }
      Some((w, h, out))
    }

    /** RIFF/WAVE PCM (u8 or s16le): walks the word-aligned chunk list for
      * `fmt ` and `data`. Returns (sampleRate, channels, samples scaled
      * to [−1, 1]).
      */
    def wav(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return None
      var o = 12; var fmt = -1; var channels = 0; var rate = 0; var bits = 0
      var data: Option[(Int, Int)] = None
      while (o + 8 <= bytes.length) {
        val id = tag(o)
        // chunk size stays UNSIGNED (Long): a crafted 0xFFFFFFF8 size
        // cast to Int would advance by <= 0 and spin the task forever
        val sz = u32(o + 4)
        if (id == "fmt ") {
          if (o + 24 > bytes.length) return None // truncated fmt chunk
          fmt = u16(o + 8); channels = u16(o + 10)
          rate = u32(o + 12).toInt; bits = u16(o + 22)
        } else if (id == "data")
          data = Some((o + 8,
            math.min(sz, (bytes.length - o - 8).toLong).toInt))
        val next = o.toLong + 8 + sz + (sz & 1)
        if (next > bytes.length) o = bytes.length // malformed size: stop
        else o = next.toInt
      }
      if (fmt != 1 || data.isEmpty || (bits != 8 && bits != 16)) return None
      val (off, len) = data.get
      if (bits == 8)
        Some((rate, channels, Array.tabulate(len)(k =>
          ((bytes(off + k) & 0xff) - 128) / 128.0f)))
      else {
        val ns = len / 2
        Some((rate, channels, Array.tabulate(ns)(k =>
          (((bytes(off + 2 * k + 1) << 8) |
            (bytes(off + 2 * k) & 0xff)).toShort / 32768.0f))))
      }
    }

    /** Codec dispatch: real parse when the container is one we decode
      * (PPM image, PCM WAV audio), stub fallback otherwise.
      */
    def decode(bytes: Array[Byte], mediaType: String): Array[Float] =
      mediaType match {
        case "image" => ppm(bytes).map(_._3)
          .getOrElse(DecodeStub.decode(bytes, mediaType))
        case "audio" => wav(bytes).map(_._3)
          .getOrElse(DecodeStub.decode(bytes, mediaType))
        case _ => DecodeStub.decode(bytes, mediaType)
      }
  }

  /** Deterministic stand-in for the COMPRESSED-codec boundary (JPEG,
    * MP3, H.264 … — no codec libraries in this environment).
    */
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

  /** Wraps a BINARY payload column as a canonical 44-byte-header
    * mono PCM-u8 WAV (the RIFF framing [[Decode.wav]] parses): only the
    * two RIFF size fields depend on the row, everything else is a byte
    * literal. Used by the decode gate to manufacture REAL audio
    * containers from table bytes, cross-checked in DuckDB.
    */
  def wavU8(payload: Column, sampleRate: Int = 8000): Column = {
    def le32(n: Column): Column = concat(
      unhex(lpad(hex(n % 256), 2, "0")),
      unhex(lpad(hex((n / 256) % 256), 2, "0")),
      unhex(lpad(hex((n / 65536) % 256), 2, "0")),
      unhex(lpad(hex((n / 16777216) % 256), 2, "0")))
    def le32b(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val mid = "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le32b(16) ++ Array[Byte](1, 0, 1, 0) ++ le32b(sampleRate) ++
      le32b(sampleRate) ++ Array[Byte](1, 0, 8, 0) ++
      "data".getBytes("US-ASCII")
    val n = length(payload)
    concat(lit("RIFF".getBytes("US-ASCII")), le32(n + lit(36)), lit(mid),
      le32(n), payload)
  }

  /** Byte-level features as pure column expressions (no decode needed):
    * size, 128-bit content hash, and an 8-dim pseudo-embedding derived
    * from the content hash — the shape a CLIP-style featurizer produces,
    * deterministic and cross-engine verifiable.
    */
  def byteFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    Hashing.ensureRegistered(media)
    media.select(col("doc_id"), col("media_type"),
      length(col("bytes")).cast("long").as("n_bytes"),
      md5(col("bytes")).as("content_md5"))
      .withColumn("pseudo_embedding", expr(
        s"transform(sequence(0, ${dims - 1}), i -> " +
          s"(${Hashing.md5LongSql("concat(content_md5, ':', cast(i as string))")} % 2000001 - 1000000) / 1000000.0)"))
  }

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
    * shape): record-local, no shuffle; routes through [[Decode.decode]]
    * (real PPM/WAV parsing, stub for compressed codecs). Output is
    * (doc_id, dim, mean_value) — the mean is a deterministic sequential
    * double fold over the sample buffer, so an oracle deriving the same
    * samples from the raw payload matches bit-for-bit.
    */
  def decodedStats(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select("doc_id", "media_type", "bytes")
      .as[(Long, String, Array[Byte])]
      .map { case (id, mt, bytes) =>
        val buf = Decode.decode(bytes, mt)
        val mean = buf.foldLeft(0.0)(_ + _) / math.max(buf.length, 1)
        (id, buf.length, mean)
      }
      .toDF("doc_id", "dim", "mean_value")
  }
}
