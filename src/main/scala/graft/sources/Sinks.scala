package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model output sinks (ref sift/format.py + dataset.py:21-23):
  * gzip JSON-lines (the canonical model interchange format), TSV with
  * `_id` first and remaining columns in sorted order, and Redis RESP
  * protocol dumps. All are plain DataFrameWriter terminals — partitioned
  * files, no driver funnel.
  */
object Sinks {

  /** S6: gzip JSON-lines, overwrite semantics (ref rm-rf + save). */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** S7: TSV — `_id` (when present) first, remaining columns sorted by
    * name (ref format.py:20-31).
    */
  def tsv(df: DataFrame, path: String): Unit = {
    val ordered = df.columns.partition(_ == "_id") match {
      case (id, rest) => id.toSeq ++ rest.sorted
    }
    df.select(ordered.map(col): _*)
      .write.mode("overwrite").option("sep", "\t").csv(path)
  }

  /** msgpack `str`-family framing of a string column's UTF-8 bytes
    * (public MessagePack spec: fixstr `0xA0|len` for len < 32, `0xD9` +
    * u8 len, `0xDA` + u16 BE len, `0xDB` + u32 BE len, then the raw
    * bytes). This is exactly what the ref's msgpack serializer produces
    * for its `field` mode (format.py:60-70: `msgpack.dumps(unicode(...))`
    * packs a str); pure codegen'd column expressions, no UDF.
    */
  def msgpackStr(c: Column): Column = {
    val b = encode(c.cast("string"), "UTF-8")
    val n = length(b) // byte length
    val header =
      when(n < 32, unhex(lpad(hex(n + lit(160)), 2, "0")))
        .when(n < 256, concat(unhex(lit("D9")), unhex(lpad(hex(n), 2, "0"))))
        .when(n < 65536,
          concat(unhex(lit("DA")), unhex(lpad(hex(n), 4, "0"))))
        .otherwise(concat(unhex(lit("DB")), unhex(lpad(hex(n), 8, "0"))))
    concat(header, b)
  }

  /** Value serializers for the RESP sink (ref format.py:51-65):
    *  - `raw`     — the column's string form, unescaped (the ref requires
    *                a target field for raw; a Column IS that field);
    *  - `json`    — `to_json` for complex columns, a JSON-quoted scalar
    *                otherwise (json.dumps semantics);
    *  - `msgpack` — msgpack bytes, base64-escaped exactly as the ref does
    *                (`base64.b64encode(msgpack.dumps(o))`). Complex
    *                columns pack their canonical-JSON string; native
    *                map/array packing is documented out of scope.
    * `pickle` is Python-object-specific and deliberately unsupported.
    */
  def serializeValue(df: DataFrame, valueCol: String,
      serializer: String): Column = {
    import org.apache.spark.sql.types.{StructType, ArrayType, MapType}
    val complex = df.schema(valueCol).dataType match {
      case _: StructType | _: ArrayType | _: MapType => true
      case _ => false
    }
    // json.dumps of a scalar: wrap in a 1-field struct and strip the
    // {"v": … } envelope — inherits Spark's exact JSON string escaping.
    def jsonForm: Column =
      if (complex) to_json(col(valueCol))
      else {
        val wrapped = to_json(struct(col(valueCol).as("v")))
        when(col(valueCol).isNull, lit("null"))
          .otherwise(wrapped.substr(lit(6), length(wrapped) - 6))
      }
    serializer match {
      case "raw" => col(valueCol).cast("string")
      case "json" => jsonForm
      case "msgpack" =>
        // Spark's base64 is the MIME variant (76-char lines, CRLF);
        // the ref's base64.b64encode is unchunked — strip the breaks
        regexp_replace(
          base64(msgpackStr(if (complex) to_json(col(valueCol))
            else col(valueCol).cast("string"))),
          "[\\r\\n]", "")
      case other => throw new IllegalArgumentException(
        s"unknown serializer '$other' (raw|json|msgpack)")
    }
  }

  /** S8/F17: RESP `SET <prefix><key> <value>` command stream (ref
    * format.py:66-77) with the serializer family above applied to the
    * value column.
    */
  def resp(df: DataFrame, path: String, prefix: String, keyCol: String,
      valueCol: String, serializer: String = "raw"): Unit = {
    val key = concat(lit(prefix), col(keyCol).cast("string"))
    val value = serializeValue(df, valueCol, serializer)
    // RESP bulk-string lengths are BYTE counts — the sink writes UTF-8,
    // so a char-count length would corrupt the stream at the first
    // non-ASCII key or value
    def blen(c: Column): Column = length(encode(c, "UTF-8")).cast("string")
    df.select(concat(lit("*3\r\n$3\r\nSET\r\n$"),
        blen(key), lit("\r\n"), key,
        lit("\r\n$"), blen(value), lit("\r\n"), value,
        lit("\r\n")).as("resp"))
      .write.mode("overwrite").text(path)
  }

  /** Streaming RESP sink (the S8 streaming-era extension): each
    * micro-batch lands as its own RESP command file under
    * `path/batch_<id>` via foreachBatch — idempotent per batch id, so
    * replays overwrite rather than duplicate. Returns the started query;
    * the caller owns its lifecycle.
    */
  def respStream(df: DataFrame, path: String, prefix: String,
      keyCol: String, valueCol: String, serializer: String = "raw",
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        resp(batch, s"$path/batch_$id", prefix, keyCol, valueCol,
          serializer)
      }
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.start()
  }

  def write(df: DataFrame, path: String, format: String): Unit =
    format match {
      case "json" => json(df, path)
      case "tsv" => tsv(df, path)
      case "resp" =>
        resp(df, path, "graft:", df.columns.head, df.columns.last)
      case "parquet" => df.write.mode("overwrite").parquet(path)
      case other => throw new IllegalArgumentException(
        s"unknown format '$other' (json|tsv|resp|parquet)")
    }
}
