package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair construction for alignment training data (the DPO /
  * RLHF reward-modeling input shape — Rafailov et al. 2023 take
  * (chosen, rejected) response pairs per prompt): within each group,
  * the highest-scored response becomes `chosen`, the lowest `rejected`,
  * kept only when the score margin is strictly positive (a tie teaches
  * nothing). Engine capability beyond the reference, in the same
  * family as the corpus-curation pipeline gates.
  *
  * Scale shape: ONE hash aggregate on the group key — best/worst ride
  * a max/min over (score, id) structs with deterministic id
  * tie-breaks, so a billion-group preference corpus is one map-side-
  * combined pass; nothing pairs responses quadratically.
  */
object Preference {

  /** (group_id, n_responses, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin) per group with ≥ 2 responses and
    * margin > `minMargin` (margin compared after round(,6), the same
    * rounding the output carries, so the cut is engine-stable).
    */
  def dpoPairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0.0, s"minMargin must be >= 0, got $minMargin")
    df.groupBy(col(groupCol).as("group_id"))
      .agg(count(lit(1)).as("n_responses"),
        max(struct(col(scoreCol).as("s"), col(idCol).as("i"))).as("hi"),
        min(struct(col(scoreCol).as("s"), col(idCol).as("i"))).as("lo"))
      .filter(col("n_responses") >= 2)
      .select(col("group_id"), col("n_responses"),
        col("hi.i").as("chosen_id"), col("lo.i").as("rejected_id"),
        col("hi.s").as("chosen_score"), col("lo.s").as("rejected_score"),
        round(col("hi.s") - col("lo.s"), 6).as("margin"))
      .filter(col("margin") > minMargin)
  }
}
