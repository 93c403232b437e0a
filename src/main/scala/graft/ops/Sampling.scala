package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines. RNG
  * sampling (`df.sample`, `stat.sampleBy`) is seed- and partitioning-
  * dependent — useless for reproducible corpus construction and
  * impossible to oracle-check. These operators decide membership from a
  * salted content hash instead: the same row lands in the same
  * sample/split on every engine, at every partitioning, forever.
  * Pure per-row codegen'd expressions — scan-speed, no shuffle.
  */
object Sampling {

  /** Salted per-row hash bucket in [0, buckets). */
  def hashBucket(key: Column, salt: String, buckets: Int): Column =
    pmod(Hashing.md5Long(concat(lit(salt), key.cast("string"))),
      lit(buckets.toLong))

  /** Stratified downsampling: keep a row iff its hash bucket (out of
    * 100) falls under its stratum's percentage. `rates` maps stratum
    * value → keep-percentage; strata not listed keep `defaultRate`.
    * The per-stratum CASE stays a codegen'd expression — no join, no
    * driver lookup. (The RNG analogue is `stat.sampleBy`.)
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Seq[(String, Int)], defaultRate: Int,
      salt: String = "sample:"): DataFrame = {
    Hashing.ensureRegistered(df)
    val rate = rates.foldLeft(when(lit(false), lit(0))) {
      case (acc, (v, r)) => acc.when(col(stratumCol) === v, lit(r))
    }.otherwise(lit(defaultRate))
    df.filter(hashBucket(col(keyCol), salt, 100) < rate)
  }

  /** Deterministic train/validation/test split: bucket < trainPct →
    * 'train', < trainPct+validPct → 'valid', else 'test'. Independent
    * of any sampling decision through its own salt.
    */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int,
      validPct: Int, salt: String = "split:"): DataFrame = {
    Hashing.ensureRegistered(df)
    val b = hashBucket(col(keyCol), salt, 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + validPct, "valid")
        .otherwise("test"))
  }
}
