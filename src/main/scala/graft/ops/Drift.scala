package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between a reference and a current
  * slice of the same table — the Population Stability Index report a
  * production pipeline runs on every feature before retraining or
  * promoting a model (engine capability beyond the reference, sibling
  * of the data-quality suite in `ops/Quality.scala`).
  *
  *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
  *
  * with p = reference bin shares, q = current bin shares. Conventional
  * reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action.
  *
  * Scale contract: each side collapses to ONE hash-aggregate pass
  * (n_bins or n_categories rows); the per-bin join and PSI fold then
  * run on aggregate-sized data. The numeric binning grid comes from a
  * 1-row min/max aggregate of the REFERENCE side broadcast onto both
  * slices — no global sort, no driver collect, nothing quadratic.
  * Empty bins are Laplace-smoothed ((n + 0.5) / (N + 0.5·k)) so the
  * log never sees zero — the standard finite-sample PSI correction,
  * applied identically to both sides and documented here because it
  * slightly shrinks the index versus the textbook formula on bins
  * where both sides are populated.
  */
object Drift {

  /** PSI of numeric `valueCol` between `ref` and `cur`, over `nBins`
    * equal-width bins spanning the REFERENCE min..max (the production
    * convention: the bin grid is frozen with the reference snapshot).
    * Current-side values outside the reference range clamp into the
    * first/last bin. NULLs are excluded on both sides. Degenerate
    * reference (min = max) puts everything in bin 0.
    *
    * Returns one row: (feature, kind, n_bins, n_ref, n_cur, psi).
    */
  def psiNumeric(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int = 10): DataFrame = {
    val grid = ref.agg(min(col(valueCol).cast("double")).as("__lo"),
      max(col(valueCol).cast("double")).as("__hi"))
    def binned(df: DataFrame): DataFrame =
      df.where(col(valueCol).isNotNull)
        .crossJoin(broadcast(grid))
        .withColumn("bin", when(col("__hi") <= col("__lo"), lit(0))
          .otherwise(least(lit(nBins - 1), greatest(lit(0),
            floor((col(valueCol).cast("double") - col("__lo")) * nBins /
              (col("__hi") - col("__lo"))).cast("int")))))
        .groupBy("bin").agg(count(lit(1)).as("n"))
    psiOf(binned(ref), binned(cur), "bin", lit(valueCol), lit("numeric"),
      nBins)
  }

  /** PSI of categorical `catCol` between `ref` and `cur`. The bin set
    * is the union of categories observed on either side (each side's
    * share of a category it never saw is pure smoothing mass); NULL is
    * its own category. Smoothing uses that union's size as k, so a
    * category new to the current slice contributes drift instead of
    * dividing by zero.
    */
  def psiCategorical(ref: DataFrame, cur: DataFrame, catCol: String)
      : DataFrame = {
    def counted(df: DataFrame): DataFrame =
      df.groupBy(coalesce(col(catCol).cast("string"), lit("__null__"))
        .as("bin")).agg(count(lit(1)).as("n"))
    psiOf(counted(ref), counted(cur), "bin", lit(catCol),
      lit("categorical"), fixedK = 0)
  }

  /** Fold two per-bin count tables into the one-row PSI. `fixedK` > 0
    * is the smoothing bin count (the frozen numeric grid size): the
    * full k-bin spine is generated in-plan (a k-row range frame) and
    * left-joined with zero fills, so bins empty on one or both sides
    * still contribute their smoothing mass — with Laplace smoothing
    * p = 0.5/(t_ref+0.5k) and q = 0.5/(t_cur+0.5k) differ whenever
    * the slice totals differ, so an omitted empty bin would NOT be a
    * zero term (ADVICE r9); the spine makes the computed index the
    * fixed-k smoothed formula exactly. `fixedK` = 0 means "the
    * observed union" (categorical — a category no side saw does not
    * exist), counted in-plan with a window over the aggregate-sized
    * bin table — no driver-side action.
    */
  private def psiOf(refCounts: DataFrame, curCounts: DataFrame,
      binCol: String, feature: Column, kind: Column, fixedK: Int)
      : DataFrame = {
    val observed = refCounts.withColumnRenamed("n", "n_ref")
      .join(curCounts.withColumnRenamed("n", "n_cur"), Seq(binCol),
        "full_outer")
    val joined = (if (fixedK > 0) {
      val spine = refCounts.sparkSession.range(fixedK)
        .select(col("id").cast("int").as(binCol))
      spine.join(observed, Seq(binCol), "left")
    } else observed)
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val withK =
      if (fixedK > 0) joined.withColumn("__k", lit(fixedK.toDouble))
      else joined.withColumn("__k", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy())
        .cast("double"))
    val totals = withK.agg(sum("n_ref").as("t_ref"),
      sum("n_cur").as("t_cur"), first("__k").as("__k2"))
    withK.crossJoin(broadcast(totals.drop("__k2")))
      .withColumn("__p", (col("n_ref") + lit(0.5)) /
        (col("t_ref") + lit(0.5) * col("__k")))
      .withColumn("__q", (col("n_cur") + lit(0.5)) /
        (col("t_cur") + lit(0.5) * col("__k")))
      .agg(first(col("t_ref")).as("n_ref"), first(col("t_cur")).as("n_cur"),
        first(col("__k")).cast("int").as("n_bins"),
        sum((col("__p") - col("__q")) * log(col("__p") / col("__q")))
          .as("__psi"))
      .select(feature.as("feature"), kind.as("kind"), col("n_bins"),
        col("n_ref"), col("n_cur"), round(col("__psi"), 6).as("psi"))
  }
}
