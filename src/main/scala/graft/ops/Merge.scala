package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lakehouse MERGE / apply-changes: fold a deduplicated change set
  * (insert / update / delete rows) into a snapshot in ONE full-outer
  * equi-join on the key — the upsert primitive behind CDC table
  * maintenance (the `d_snapshot_diff` → apply direction; reference
  * twin: the monthly-crawl incremental story, reference README:52-53).
  *
  * Scale contract: both sides shuffle once on the key — or not at all
  * when the change set is small (AQE broadcasts it; a nightly delta
  * against a 100 TB snapshot is exactly that shape) or when both sides
  * are bucketed on the key (the `j_bucketed_colocated` zero-exchange
  * layout). No window, no driver state; output size = |snapshot| +
  * inserts − deletes.
  */
object Merge {

  /** Apply `changes` to `snapshot`, returning the next snapshot.
    *
    * `changes` must carry the key columns, an `opCol` valued
    * 'I' | 'U' | 'D', and the snapshot's payload columns (payload
    * values on 'D' rows are ignored), with AT MOST ONE row per key —
    * dedupe upstream with the latest-observation shape
    * (`d_latest_snapshot`) when a feed can repeat keys.
    *
    * Semantics (standard apply-changes): 'I' and 'U' both upsert (the
    * change payload wins whether or not the key exists — a CDC feed's
    * insert-vs-update split reflects the SOURCE's state, not the
    * target's); 'D' drops the key if present, no-op otherwise; keys
    * absent from `changes` pass through untouched. Any other op value
    * fails loudly at execution (`raise_error`), never silently drops.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    val payload = snapshot.columns.filterNot(keyCols.contains).toSeq
    val missing = (keyCols ++ payload :+ opCol)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes side is missing columns: ${missing.mkString(", ")}")
    val s = snapshot.select(keyCols.map(col) ++
      payload.map(c => col(c).as(s"__s_$c")): _*)
    val c = changes.select(keyCols.map(col) ++
      (col(opCol).as("__op") +:
        payload.map(p => col(p).as(s"__c_$p"))): _*)
    s.join(c, keyCols, "full_outer")
      .withColumn("__op",
        when(col("__op").isNull || col("__op").isin("I", "U", "D"),
          col("__op"))
          .otherwise(raise_error(concat(
            lit("Merge.applyChanges: unknown op '"), col("__op"),
            lit("'")))))
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(keyCols.map(col) ++ payload.map(p =>
        when(col("__op").isNotNull, col(s"__c_$p"))
          .otherwise(col(s"__s_$p")).as(p)): _*)
  }
}
