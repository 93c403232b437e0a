package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalable global ordinal ranking (SURVEY.md §2.5 W1; ref zipWithIndex
  * ranking, sift/models/text.py:135-147).
  *
  * A bare `row_number().over(Window.orderBy(...))` funnels the entire
  * dataset through one task — fine for a toy vocab, a scale-killer at
  * 100 TB. This is the two-phase formulation: range-repartition on the
  * sort key (so partition p holds a contiguous, globally ordered slice),
  * rank locally within each partition, then add the cumulative row-count
  * offset of all preceding partitions (a #partitions-row table, broadcast
  * to the join). Equivalent to RDD `sortByKey().zipWithIndex()` but stays
  * in the DataFrame/Catalyst world.
  */
object Rank {

  /** 0-based dense global ordinal by `sortCols` as column `out`.
    * `sortCols` must define a TOTAL order (tie-broken) — required for the
    * rank to be deterministic under any partitioning.
    */
  def globalOrdinal(df: DataFrame, sortCols: Seq[Column], out: String,
      numPartitions: Int = 32): DataFrame = {
    val local = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrank", row_number().over(
        Window.partitionBy("__pid").orderBy(sortCols: _*)))
    // Offsets: one row per partition. partitionBy(lit(0)) keeps the tiny
    // window off the "no partition defined" path — it IS a single-task
    // window, over exactly `numPartitions` rows, which is the point of the
    // two-phase scheme: only partition COUNTS go through one task, never
    // the data.
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(
          sum("__n").over(Window.partitionBy(lit(0)).orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__offset")
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, (col("__offset") + col("__lrank") - 1).cast("long"))
      .drop("__pid", "__lrank", "__offset")
  }
}
