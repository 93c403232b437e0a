package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric outlier handling for training-data pipelines: winsorization
  * (clamp a column to its [loQ, hiQ] exact quantiles — the standard
  * robustification before normalization; Tukey's terminology, public
  * statistics).
  *
  * Scale shape: the two bounds come from [[Rank.exactQuantiles]] (the
  * two-phase global ordinal — no single-task sort), collapse to ONE
  * broadcast row, and the clamp itself is a per-row projection. At
  * 100 TB the only cost beyond one scan is the ordinal's two-phase
  * rank; swap in [[Rank.sampleQuantiles]] bounds for a bounded-state
  * variant when ±O(1/√k) rank error is acceptable.
  */
object Clean {

  /** Clamp `valueCol` into its [loQ, hiQ] exact-quantile range,
    * appending `<valueCol>_w`. `tieCols` make the global ordinal (and
    * so the bound VALUES) deterministic under equal values.
    */
  def winsorize(df: DataFrame, valueCol: String, tieCols: Seq[Column],
      loQ: Double = 0.01, hiQ: Double = 0.99): DataFrame = {
    require(loQ < hiQ, s"loQ must be < hiQ, got $loQ >= $hiQ")
    val qs = Rank.exactQuantiles(df, valueCol, tieCols, Seq(loQ, hiQ))
    val bounds = qs.agg(
      min(when(col("q") === loQ, col(valueCol))).as("__lo"),
      max(when(col("q") === hiQ, col(valueCol))).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}
