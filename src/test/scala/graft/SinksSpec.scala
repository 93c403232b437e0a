package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** msgpack str-family framing against hand-computed spec bytes
  * (MessagePack spec: fixstr/str8/str16/str32 headers, big-endian
  * lengths), and the serializer family's json.dumps semantics.
  */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def pack(s: String): Array[Byte] = {
    val sp = spark; import sp.implicits._
    Seq(s).toDF("v").select(Sinks.msgpackStr(col("v")).as("b"))
      .head().getAs[Array[Byte]]("b")
  }

  test("msgpack fixstr: header 0xA0|len") {
    val b = pack("abc")
    assert(b(0) == 0xA3.toByte)
    assert(new String(b.drop(1), "UTF-8") == "abc")
  }

  test("msgpack str8/str16/str32: marker + big-endian byte length") {
    val s8 = "x" * 200
    val b8 = pack(s8)
    assert(b8(0) == 0xD9.toByte && (b8(1) & 0xFF) == 200)
    assert(b8.length == 2 + 200)

    val s16 = "y" * 40000
    val b16 = pack(s16)
    assert(b16(0) == 0xDA.toByte)
    assert(((b16(1) & 0xFF) << 8 | (b16(2) & 0xFF)) == 40000)

    val s32 = "z" * 70000
    val b32 = pack(s32)
    assert(b32(0) == 0xDB.toByte)
    val n = ((b32(1) & 0xFF) << 24) | ((b32(2) & 0xFF) << 16) |
      ((b32(3) & 0xFF) << 8) | (b32(4) & 0xFF)
    assert(n == 70000 && b32.length == 5 + 70000)
  }

  test("msgpack length is UTF-8 BYTE length, not char count") {
    val b = pack("é") // 2 bytes in UTF-8
    assert(b(0) == 0xA2.toByte && b.length == 3)
  }

  test("RESP bulk-string lengths are UTF-8 byte counts, not chars") {
    val s = spark; import s.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_resp_utf8").toString
    Sinks.resp(Seq((1L, "café")).toDF("k", "v"), out, "t:", "k", "v")
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".txt"))
    val bytes = files.flatMap(f =>
      java.nio.file.Files.readAllBytes(f.toPath)).toArray
    val text = new String(bytes, "UTF-8")
    // "café" is 4 chars but 5 UTF-8 bytes — the $ length must say 5
    assert(text.contains("$5\r\ncafé\r\n"), text)
  }

  test("respStream writes one RESP command file per micro-batch") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = java.nio.file.Files
      .createTempDirectory("graft_resp_stream").toString
    val q = Sinks.respStream(input.toDF().toDF("k", "v"), out,
      "t:", "k", "v")
    try {
      input.addData((1L, "alpha"), (2L, "beta"))
      q.processAllAvailable()
    } finally q.stop()
    val files = new java.io.File(out, "batch_0").listFiles()
      .filter(_.getName.endsWith(".txt")).toSeq
    assert(files.nonEmpty)
    val joined = files.map(f => {
      val src = scala.io.Source.fromFile(f)
      try src.mkString finally src.close()
    }).mkString
    assert(joined.contains("*3\r\n$3\r\nSET\r\n"))
    assert(joined.contains("t:1") && joined.contains("alpha"))
  }

  test("json serializer quotes scalars and escapes like json.dumps") {
    val sp = spark; import sp.implicits._
    val df = Seq("say \"hi\"").toDF("v")
    val out = df.select(Sinks.serializeValue(df, "v", "json").as("j"))
      .head().getString(0)
    assert(out == "\"say \\\"hi\\\"\"")
  }
}
