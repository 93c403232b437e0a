package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2: turn a change log (one row per
  * attribute change, e.g. a profile-update event stream) into a
  * versioned dimension — one row per (entity, version) with a
  * half-open validity interval `[valid_from, valid_to)` and
  * `valid_to IS NULL` marking the current version. The point-in-time
  * fact lookup ("which profile version was live when this click
  * happened?") then composes with [[AsOf.asofJoin]] — reference
  * semantics: sift's snapshot/latest-wins model joins
  * (sift/models/links.py re-attach + latest-snapshot QUALIFY shape).
  *
  * Scale shape: the build is ONE shuffle on the dimension key and one
  * window pass per key (entity histories are short — bounded by
  * change counts, never corpus size), then the temporal join rides
  * the as-of union+window single-shuffle shape instead of an interval
  * range join, which is per-key |facts|x|versions| and quadratic on
  * hot entities.
  *
  * Degenerate changes at the same (key, ts) get zero-width intervals
  * `[ts, ts)` for all but the last (by `tie`): interval-containment
  * and as-of lookup then agree — both resolve a fact at `ts` to the
  * last same-ts version — so no upstream dedup pass is needed.
  */
object Scd {

  /** One row per version of each `key`: all input columns plus
    * `version` (1-based BIGINT in (`ts`, `tie`) order), `valid_from`
    * (= `ts`) and `valid_to` (next version's `ts`, null for the
    * current version). `tie` must be unique per (key, ts) — pass the
    * change-event id.
    */
  def scd2(changes: DataFrame, key: String, ts: String,
      tie: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(tie).asc)
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
  }
}
