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

  /** S8/F17: RESP `SET <prefix><key> <value>` command stream (ref
    * format.py:66-77); binary-unsafe values go through base64 when
    * `binaryValue` is set, mirroring the ref's serializer escape.
    */
  def resp(df: DataFrame, path: String, prefix: String, keyCol: String,
      valueCol: String, binaryValue: Boolean = false): Unit = {
    val key = concat(lit(prefix), col(keyCol).cast("string"))
    val value: Column =
      if (binaryValue) base64(encode(col(valueCol).cast("string"), "UTF-8"))
      else col(valueCol).cast("string")
    df.select(concat(lit("*3\r\n$3\r\nSET\r\n$"),
        length(key).cast("string"), lit("\r\n"), key,
        lit("\r\n$"), length(value).cast("string"), lit("\r\n"), value,
        lit("\r\n")).as("resp"))
      .write.mode("overwrite").text(path)
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
