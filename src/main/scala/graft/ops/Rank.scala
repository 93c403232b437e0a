package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Pins.PinSyntax

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

  /** Resolve a caller partition count: 0 (the default everywhere) means
    * the session's `spark.sql.shuffle.partitions` — the same knob every
    * other exchange in the plan obeys — so the two-phase rank scales
    * with the deployment instead of pinning a constant chosen for one
    * machine (r15; guide §2 "make partitioning scale-adaptive"). The
    * ordinal itself is partitioning-independent (total order), so this
    * changes no result anywhere.
    */
  private[ops] def resolveParts(df: DataFrame, numPartitions: Int): Int =
    if (numPartitions > 0) numPartitions
    else df.sparkSession.sessionState.conf.numShufflePartitions

  /** 0-based dense global ordinal by `sortCols` as column `out`.
    * `sortCols` must define a TOTAL order (tie-broken) — required for the
    * rank to be deterministic under any partitioning.
    */
  def globalOrdinal(df: DataFrame, sortCols: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame = {
    // localCheckpoint PINS one materialization of the range exchange.
    // Without it, the per-partition count pass and the final rank pass
    // are two executions of the same exchange, and repartitionByRange's
    // SAMPLED boundaries are not guaranteed identical across executions
    // (exchange reuse is an optimization, not a contract): offsets from
    // one partitioning + local ranks from another silently yield a
    // non-permutation "ordinal" (caught by the o15 z-order gate, whose
    // skewed Morton keys magnified the boundary drift to ±7% bucket
    // error). Eager + lineage-cut, GC-freed with the frame; a
    // multi-executor deployment that must survive executor loss would
    // use persist(MEMORY_AND_DISK) instead.
    val local = ordinalLocalPlan(df, sortCols, numPartitions)
      .pin()
    // Offsets: one row per partition; offset(p) = Σ counts of partitions
    // before p. Computed with a triangular self-join over the
    // numPartitions-row count table (O(P²) rows — trivial) instead of an
    // unpartitioned running-sum window, so NO operator in the plan ever
    // funnels data through a single task.
    val counts = local.groupBy("__pid").agg(count(lit(1)).as("__n"))
    val offsets = counts.as("a")
      .join(counts.select(col("__pid").as("__p2"), col("__n").as("__n2"))
        .as("b"), col("__p2") < col("__pid"), "left_outer")
      .groupBy("__pid")
      .agg(coalesce(sum("__n2"), lit(0L)).as("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, (col("__offset") + col("__lrank") - 1).cast("long"))
      .drop("__pid", "__lrank", "__offset")
  }

  /** The pre-checkpoint half of [[globalOrdinal]] — range exchange +
    * partition-local rank — exposed LAZY so PlanAuditSpec can audit it:
    * the localCheckpoint in [[globalOrdinal]] truncates lineage, which
    * blinds any audit of the composed plan to this subplan (ADVICE r9).
    * The sim_neardup_pairs Plan-variant pattern.
    */
  def ordinalLocalPlan(df: DataFrame, sortCols: Seq[Column],
      numPartitions: Int = 0): DataFrame =
    df.repartitionByRange(resolveParts(df, numPartitions), sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrank", row_number().over(
        Window.partitionBy("__pid").orderBy(sortCols: _*)))

  /** Scalable INCLUSIVE global running sum of `valueCol` under the total
    * order `sortCols` — the same two-phase shape as [[globalOrdinal]]
    * (range-partition, partition-local window, broadcast per-partition
    * offsets) generalized from counting rows to summing a value; no
    * operator funnels the data through one task.
    */
  def globalRunningSum(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, out: String, numPartitions: Int = 0): DataFrame = {
    // same exchange-pinning localCheckpoint as [[globalOrdinal]] — the
    // totals pass and the final join must see ONE partitioning
    val local = runningSumLocalPlan(df, sortCols, valueCol, numPartitions)
      .pin()
    val totals = local.groupBy("__pid")
      .agg(sum(col(valueCol)).as("__t"))
    val offsets = totals.as("a")
      .join(totals.select(col("__pid").as("__p2"), col("__t").as("__t2"))
        .as("b"), col("__p2") < col("__pid"), "left_outer")
      .groupBy("__pid")
      .agg(coalesce(sum("__t2"), lit(0L)).as("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, (col("__offset") + col("__lsum")).cast("long"))
      .drop("__pid", "__lsum", "__offset")
  }

  /** The pre-checkpoint half of [[globalRunningSum]], lazy, for plan
    * audit — see [[ordinalLocalPlan]].
    */
  def runningSumLocalPlan(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, numPartitions: Int = 0): DataFrame =
    df.repartitionByRange(resolveParts(df, numPartitions), sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lsum", sum(col(valueCol)).over(
        Window.partitionBy("__pid").orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** EXACT distributed quantiles — the discrete ("lower") quantile: for
    * each q the value whose 1-based global ordinal is ceil(q·N). Built on
    * [[globalOrdinal]], so the whole computation is range-partition +
    * local rank + broadcast offsets + one broadcast join against the
    * q-row target table: no `percentile_approx` error bars, no
    * single-task global sort, no driver collect. `tieCols` must make the
    * order total (ties in the value column are broken deterministically,
    * which exact ordinals require under any partitioning).
    *
    * N rides along as a 1-row aggregate frame (cross-joined, broadcast),
    * never a driver-side count. The q·N product is computed in EXACT
    * decimal (q widened to DECIMAL(20,10) — a double literal like 0.07
    * rounds to its decimal meaning — times an exact integer N), so
    * ceil(q·N) is the mathematical target rank: the IEEE-double product
    * would round fl(0.07·100) up to 7.000…001 and return the 8th value
    * instead of the 7th. Returns (q DOUBLE, value).
    */
  def exactQuantiles(df: DataFrame, valueCol: String, tieCols: Seq[Column],
      qs: Seq[Double], numPartitions: Int = 0): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = globalOrdinal(df, col(valueCol) +: tieCols, "__r",
      numPartitions)
    val n = df.agg(count(lit(1)).as("__n"))
    val targets = qs.toDF("q").crossJoin(n)
      .select(col("q"),
        ceil(col("q").cast(org.apache.spark.sql.types.DecimalType(20, 10))
          * col("__n")).cast("long").as("__tr"))
    ranked.join(broadcast(targets), col("__r") + 1 === col("__tr"))
      .select(col("q"), col(valueCol))
  }

  /** SAMPLE-based approximate quantiles — the bounded-state scale path
    * beside [[exactQuantiles]]: draw a deterministic uniform sample by
    * salted content hash (the globally smallest `sampleK` hash values —
    * bottom-k, the same primitive as the KMV sketch), then take the
    * EXACT quantiles of the sample. Error is the classic sampling bound
    * (±O(1/√k) in rank); k = 2000 gives ~±2% rank error at ANY corpus
    * size — the knob a 100 TB profile pass actually turns.
    *
    * Determinism contract: membership is a pure function of the salted
    * key hash, never an RNG — the same rows are sampled on every
    * engine, at every partitioning, so an oracle replays the estimate
    * EXACTLY (`tieCols` break hash collisions and value ties; the
    * hash column itself leads the tie-break).
    *
    * Scale shape: bottom-k is a TakeOrdered — each partition keeps its
    * local k smallest hashes, the final merge touches k·P rows, the
    * data is scanned once; the exact-quantile machinery then runs on k
    * rows. No global sort of the data, no percentile_approx error bars
    * that depend on partition merge order.
    */
  def sampleQuantiles(df: DataFrame, valueCol: String, hashKey: Column,
      tieCols: Seq[Column], sampleK: Int, qs: Seq[Double],
      salt: String = "squant:"): DataFrame = {
    require(sampleK > 0, s"sampleK must be positive, got $sampleK")
    Hashing.ensureRegistered(df)
    val sample = df
      .withColumn("__h", Hashing.md5Long(concat(lit(salt),
        hashKey.cast("string"))))
      .orderBy((col("__h") +: tieCols): _*)
      .limit(sampleK)
    exactQuantiles(sample, valueCol, col("__h") +: tieCols, qs)
  }

  /** EQUI-DEPTH histogram of `valueCol` in `k` buckets: every bucket
    * holds ⌊N/k⌋ or ⌈N/k⌉ rows (SQL NTILE semantics — the first
    * N mod k buckets take the extra row), reported as per-bucket
    * (bucket, n, lo, hi, avg). The equi-WIDTH twin is the
    * `a_histogram` gate; equi-depth is what an optimizer's column
    * statistics and a skew report actually want, because bucket
    * boundaries adapt to the distribution.
    *
    * A naive NTILE is an unpartitioned window — one task sorts the
    * world. This runs on [[globalOrdinal]]'s two-phase rank
    * (range-partition + per-partition window + broadcast offsets) and
    * applies the NTILE assignment as ARITHMETIC on the 0-based rank:
    * with q = N div k, r = N mod k,
    *
    *   bucket(rank) = rank div (q+1)                    if rank < r·(q+1)
    *                  r + (rank − r·(q+1)) div q        otherwise
    *
    * which reproduces NTILE exactly (an oracle's NTILE(k) OVER
    * (ORDER BY value, ties) hash-matches), while no operator funnels
    * the data through a single task. `tieCols` must complete a total
    * order so bucket membership is deterministic. Degenerate N < k
    * yields N singleton buckets (q = 0 — the divide-by-q branch is
    * then unreachable, since every rank < r·1 = N).
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
      tieCols: Seq[Column], k: Int, numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"bucket count must be positive, got $k")
    val ranked = globalOrdinal(df, col(valueCol) +: tieCols, "__r",
      numPartitions)
    val n = df.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("__q", (col("__n") / k).cast("long"))
      .withColumn("__rem", col("__n") % k)
      .withColumn("bucket",
        when(col("__r") < col("__rem") * (col("__q") + 1),
          expr("__r div (__q + 1)"))
        .otherwise(col("__rem") +
          expr("(__r - __rem * (__q + 1)) div __q"))
        .cast("int"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"),
        round(avg(col(valueCol)), 6).as("avg_v"))
  }
}
