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

  /** The Hampel consistency constant: Φ⁻¹(0.75), making MAD·1/c a
    * consistent σ estimator under normality (public statistics).
    */
  val MadConsistency = 0.6744897501960817

  /** Robust outlier flags via the median/MAD z-score (Iglewicz–Hoaglin
    * modified z): rz = c·(x − median) / MAD with c = Φ⁻¹(0.75),
    * flagged at |rz| > `threshold` (their recommended 3.5). Unlike the
    * mean/stddev z (`Stats.groupZscore`), the baseline is itself
    * outlier-immune — a heavy tail cannot inflate its own cut line.
    *
    * Appends `<valueCol>_rz` (null when MAD = 0) and `is_outlier`.
    *
    * Scale shape: two [[Rank.exactQuantiles]] passes (the median, then
    * the median of |x − med|), each a two-phase global ordinal — no
    * single-task sort; both collapse to ONE broadcast row and the
    * score is a per-row projection. Swap [[Rank.sampleQuantiles]]
    * bounds in for a bounded-state variant at ±O(1/√k) rank error.
    *
    * DETERMINISM: x − med and |·| are single IEEE ops on both engines;
    * `tieCols` totalize both ordinal orders; the score is one fixed
    * expression rounded(,6).
    */
  def madOutliers(df: DataFrame, valueCol: String, tieCols: Seq[Column],
      threshold: Double = 3.5): DataFrame = {
    val med = Rank.exactQuantiles(df, valueCol, tieCols, Seq(0.5))
      .select(col(valueCol).cast("double").as("__med"))
    val dev = df.crossJoin(broadcast(med))
      .withColumn("__ad", abs(col(valueCol).cast("double") - col("__med")))
    val mad = Rank.exactQuantiles(dev, "__ad", tieCols, Seq(0.5))
      .select(col("__ad").as("__mad"))
    val rz = s"${valueCol}_rz"
    dev.crossJoin(broadcast(mad))
      .withColumn(rz,
        when(col("__mad") > 0, round(expr(
          s"${MadConsistency}D * (cast($valueCol as double) - __med)" +
            " / __mad"), 6)))
      .withColumn("is_outlier",
        coalesce(abs(col(rz)) > threshold, lit(false)))
      .drop("__med", "__ad", "__mad")
  }
}
