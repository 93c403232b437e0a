package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesize a larger timing-only dataset from sf0.1 (r16 VERDICT
  * item 7: "one scaling data point that isn't sf0.1" — the box holds
  * no driver-generated SF above 0.1, so scaling evidence needs a
  * replicated input). Each table is unioned `copies` times with the
  * entity-id columns (vec_id / doc_id / event_id / user_id) shifted by
  * a copy-sized offset, so entity cardinality scales with volume and
  * per-entity group sizes stay sf0.1-shaped. TPC-H keys are left
  * unshifted (referential integrity) — only aggregate-shaped TPC-H
  * gates belong in the scaled timing set. TIMING ONLY: there is no
  * DuckDB oracle for the synthetic directory, and near-dup text gates
  * are out of scope (replicated text is quadratically self-similar).
  *
  * Usage: runMain graft.tools.ScaleUp <outDir> <copies>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val copies = args(1).toInt
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val shiftCols = Set("vec_id", "doc_id", "event_id", "user_id")
    val offset = 10000000L
    for (t <- Seq("customer", "documents", "embeddings", "events",
        "lineitem", "nation", "orders", "part", "region", "supplier")) {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val shifted = (0 until copies).map { i =>
        base.select(base.columns.map { c =>
          if (shiftCols(c)) (col(c) + lit(i * offset)).as(c) else col(c)
        }.toSeq: _*)
      }.reduce(_ unionByName _)
      shifted.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"$t: ${base.count()} -> ${shifted.count()} rows")
    }
    spark.stop()
  }
}
