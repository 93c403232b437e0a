package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) data layout — multi-column clustering for scan
  * pruning: interleaving the bits of two sort keys makes any
  * contiguous run of the sort cover a small aligned RECTANGLE of the
  * (a, b) domain, so file/row-group min-max statistics stay tight on
  * BOTH columns and a predicate on either one prunes most of a
  * 100 TB table's files. A plain lexicographic sort gives that only
  * for the leading column — the trailing column's per-file range is
  * the whole domain. (Published technique: Morton 1966; the standard
  * lakehouse OPTIMIZE ZORDER BY layout.)
  *
  * Scale contract: the z-value is a pure per-row expression (five
  * shift-mask rounds per key — codegen-friendly, no UDF); laying data
  * out is then one `repartitionByRange` on z plus a within-partition
  * sort — the same cost as any global sort-write, with no extra
  * shuffle. The bucket-rectangle report rides [[Rank.globalOrdinal]]
  * (two-phase, no one-task sort).
  */
object Layout {

  /** Bit-spread x (must be in [0, 2³²)) so its bits occupy even
    * positions: the classic 5-round mask ladder. */
  private def spread(x: Column): Column = {
    val rounds = Seq(
      (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    rounds.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) {
      case (acc, (s, mask)) =>
        acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(mask))
    }
  }

  /** 64-bit Morton code of two keys: a's bits on even positions, b's
    * on odd. Keys must be non-negative and < 2³¹ for the SIGNED long
    * ordering of z to equal the unsigned curve order (TPC-H-style
    * surrogate keys are; wider domains need a 3-column split or
    * unsigned compare). */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** The layout op itself: range-partition by z into `numFiles`
    * partitions and sort within each — the DataFrame to hand a
    * parquet writer so every output file covers one tight z-range
    * (⟹ one small (a,b) rectangle in its min-max footer stats). */
  def zOrdered(df: DataFrame, a: Column, b: Column,
      numFiles: Int): DataFrame = {
    val z = df.withColumn("__z", zValue(a, b))
    z.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** The measurable twin of [[zOrdered]]: split the z-sorted order
    * into `k` equi-depth buckets (NTILE arithmetic on the two-phase
    * ordinal — [[Rank.equiDepthHistogram]]'s assignment) and report
    * each bucket's (a, b) bounding rectangle. Tight rectangles ARE
    * the pruning claim, stated as data: a file holding bucket i only
    * has to be read when the predicate intersects its rectangle.
    * `tieCols` complete the total order behind equal z-values.
    */
  def zOrderBuckets(df: DataFrame, a: String, b: String,
      tieCols: Seq[Column], k: Int, numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"bucket count must be positive, got $k")
    val z = df.withColumn("__z", zValue(col(a), col(b)))
    val ranked = Rank.globalOrdinal(z, col("__z") +: tieCols, "__r",
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
        min(col(a)).as("a_lo"), max(col(a)).as("a_hi"),
        min(col(b)).as("b_lo"), max(col(b)).as("b_hi"))
  }

  /** Small-file COMPACTION planning — the other half of lakehouse
    * layout maintenance beside [[zOrdered]]: given a file listing with
    * sizes, assign contiguous runs (in `orderCols` order — usually
    * partition/date order, so compaction preserves clustering) to
    * target-sized rewrite groups. The classic start-offset rule: a
    * file joins group `floor(bytes_before_it / targetSize)`, so every
    * group's total lands in [targetSize, targetSize + one file) except
    * the last — the greedy contiguous bin-packing every table
    * optimizer runs.
    *
    * SCALE SHAPE: the cumulative size rides [[Rank.globalRunningSum]]
    * (range exchange + per-partition window + broadcast offsets — a
    * 100 M-file listing never funnels through one task); the group
    * rollup is one hash aggregate. `orderCols` must be a total order.
    *
    * Returns (group, n_files, total_size, plus min/max of `keyCol` —
    * the group's covering key range, what the rewrite job scans).
    */
  def compactionPlan(files: DataFrame, sizeCol: String,
      orderCols: Seq[Column], keyCol: String, targetSize: Long,
      numPartitions: Int = 0): DataFrame = {
    require(targetSize > 0, s"targetSize must be positive, got $targetSize")
    val cum = Rank.globalRunningSum(files, orderCols, sizeCol, "__cum",
      numPartitions)
    cum
      .withColumn("group",
        expr(s"(__cum - $sizeCol) div ${targetSize}L"))
      .groupBy("group")
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("total_size"),
        min(col(keyCol)).as("first_key"),
        max(col(keyCol)).as("last_key"))
      .orderBy("group")
  }

  /** DuckDB SQL for [[zValue]] over column expressions `a`/`b` — the
    * identical shift-mask ladder, for oracle twins. */
  def duckZSql(a: String, b: String): String = {
    def sp(x: String): String = {
      val rounds = Seq(
        (16, 281470681808895L), (8, 71777214294589695L),
        (4, 1085102592571150095L), (2, 3689348814741910323L),
        (1, 6148914691236517205L))
      rounds.foldLeft(s"($x & 4294967295)") { case (e, (s, m)) =>
        s"((($e | ($e << $s))) & $m)"
      }
    }
    s"(${sp(a)} | (${sp(b)} << 1))"
  }
}
