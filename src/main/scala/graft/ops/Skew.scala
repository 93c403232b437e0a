package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * A shuffle join partitions by key hash, so one pathological key (the
  * empty-string URL, the bot user, the boilerplate document) lands an
  * entire partition on one task. AQE's skew-join split handles the
  * sort-merge case at runtime; SALTING is the planner-level fallback that
  * also covers aggregates and works under any join strategy: spread the
  * probe side's rows across `factor` sub-keys and replicate the build
  * side once per sub-key, so the hot key's rows fan out over `factor`
  * tasks. The join result is IDENTICAL to the unsalted join — salting
  * only changes the partitioning, which is why the gate's oracle is the
  * plain join.
  */
object Skew {

  /** Salted equi-join: `probe` ⋈ `build` on `keys`, with the probe rows
    * spread over `factor` salts (deterministically, by hash of
    * `saltOn` — any unique-ish probe column) and the build side
    * replicated `factor`×. Use when `build` is too big to broadcast and
    * a probe key is hot enough to dwarf its shuffle partition. Join
    * types that need every build row exactly once per match (`inner`,
    * `left_outer`) are supported.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltOn: Column, factor: Int,
      joinType: String = "inner"): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    require(joinType == "inner" || joinType == "left_outer",
      s"saltedJoin supports inner/left_outer, got $joinType")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(saltOn), lit(factor.toLong)).cast("int"))
    val b = build.withColumn("__salt",
      explode(expr(s"sequence(0, ${factor - 1})")))
    p.join(b, keys :+ "__salt", joinType).drop("__salt")
  }
}
