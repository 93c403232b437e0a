package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval algebra: merge overlapping/touching spans into
  * maximal disjoint intervals (the sweep-line coalesce — availability
  * windows, crawl coverage spans, ad sessions with explicit durations;
  * the span twin of gap-based sessionization `w_sessionize`, which
  * works on POINTS).
  *
  * Scale shape: two per-key windows (running max of prior ends →
  * break flags → running break count) + one (key, group) hash
  * aggregate — per-key state only, no global sort, no self-join (the
  * naive overlap-join is |key|² per key and is exactly what the sweep
  * avoids).
  */
object Intervals {

  /** Merge intervals [startCol, endCol] per key group: spans that
    * overlap or touch (next.start ≤ running max end) coalesce; output
    * one row per merged interval: key cols, `start`, `end`, `n_spans`.
    * Interval ends are INCLUSIVE (touching at a point merges) —
    * subtract 1 from ends upstream for half-open semantics.
    *
    * DETERMINISM: the sweep orders by (start, end); rows equal on both
    * are interchangeable — the break structure (and so the output) is
    * identical under any tie order.
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mergeIntervals needs at least one key")
    val ks = keyCols.map(col)
    val byKey = Window.partitionBy(ks: _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__brk",
        when(prevMax.isNull || col(startCol) > prevMax, 1L)
          .otherwise(0L))
      .withColumn("__grp", sum(col("__brk")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(ks :+ col("__grp"): _*)
      .agg(min(col(startCol)).as("start"),
        max(col(endCol)).as("end"),
        count(lit(1)).as("n_spans"))
      .drop("__grp")
  }
}
