package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate-checked query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle == None` means the driver records a weaker rows-only
  * check (used for non-SQL-expressible ops: streaming, Word2Vec, ...).
  *
  * AUTHORING INVARIANT (bench hygiene contract): every gate must
  * rebuild its frames from scratch on each `query(...)` call — no
  * module-level cached/persisted/checkpointed DataFrame may be reused
  * ACROSS calls. The bench harness unpersists every persistent RDD
  * between runs (Bench.once), so a frame cached across reps whose
  * lineage was truncated (eager localCheckpoint) would fail with
  * missing-block instead of recomputing. Per-call internal persists
  * (pinning a frame referenced by several branches of ONE plan) are
  * fine and encouraged.
  *
  * OUTPUT ORDER: the driver's comparator canonicalizes BOTH sides
  * before hashing (columns sorted by name, then rows sorted on every
  * column), so a trailing ORDER BY on the Spark side buys nothing —
  * it is a pure determinism tax in the timed bench span (measured:
  * the 600k-row f_math_battery noop costs 2.85 s sorted vs 0.80 s
  * unsorted). Gates therefore do NOT sort their final output unless
  * the sort is SEMANTIC (inside a limit/top-k, a window frame, an
  * ordinal) — large-output gates had their cosmetic trailing sorts
  * removed in round 13 (judge r12 item 6); the oracle SQL keeps its
  * ORDER BY for human-readable replay, which the comparator ignores.
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.query).toMap
  final def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

/** Scratch directories for sink/round-trip gates: created per call
  * (run-unique, so concurrent runs never clobber each other) and swept
  * by one JVM shutdown hook — `File.deleteOnExit` can't remove
  * non-empty directories, so the hook walks each tree depth-first.
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[
    java.nio.file.Path]()
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach(p => deleteTree(p))))
    ()
  }

  def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import java.nio.file._
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { val _ = Files.deleteIfExists(f) })
    }

  /** A fresh temp dir, registered for deletion at JVM exit. */
  def dir(prefix: String): String = {
    hook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}

object Tables {
  /** Spread an under-partitioned scan across the session's cores.
    *
    * The driver-generated test tables are single-row-group parquet
    * files, so Spark's split planner hands the ENTIRE table to one
    * task — every scan-side narrow chain (tokenize, shingle, hash,
    * explode) in the suite was running 1-way on a 32-core session
    * (measured: the bootstrap gate spent 78 s on 3 of 32 cores;
    * 5.4 s once spread). At production scale inputs arrive as many
    * files × many row groups, the partition count exceeds the core
    * count, and this is a NO-OP by construction — the guard exists
    * exactly so the 100 TB plan shape is untouched while small
    * fixtures exercise the same parallelism the real cluster would.
    * Filters/pruning still push to the scan (Catalyst pushes
    * predicates through Repartition).
    */
  private def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // round robin, deliberately: hash-over-all-columns was measured
    // WORSE (hashing wide text rows costs more than round robin's
    // defensive local sort), and hash-on-first-column risks collapsing
    // onto low-cardinality keys
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** All queries read the driver-generated parquet tables rooted at `dir`. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    spread(s.read.parquet(s"$dir/$name.parquet"))

  /** Plain read, NO spread — for gates whose first post-scan operator is
    * already a shuffle (join / hash aggregate) and whose scan-side
    * per-row work is trivial (plain column arithmetic, no tokenize /
    * shingle / explode). There the spread's extra round trip is pure
    * tax: the downstream shuffle parallelizes everything after the
    * 1-task scan anyway (measured r10: q18 0.58 → 1.21 s, q3 0.59 →
    * 0.97 s, set_union 0.23 → 0.41 s from the blanket spread). Gates
    * with row-expanding or per-row-heavy scan chains must stay on
    * [[t]] — the bootstrap gate ran 78 s single-core without it.
    */
  def tLight(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has stored `ts` as TIMESTAMP(NANOS) (which Spark's
    * vectorized reader only accepts as a raw long via the legacy conf) in
    * some driver generations and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ)
    * in others. Adapt to whichever this dump carries and expose the same
    * two columns either way: the exact microsecond epoch (`ts_us`, what
    * oracle-checked queries use via DuckDB's epoch_us) and a
    * microsecond-precision UTC timestamp (`ts`).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = s.read.parquet(s"$dir/events.parquet")
    val tsUs = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000") // nanos as raw long
      // MICROS (NTZ or not): sessions run UTC, so the cast is exact
      case _ => unix_micros(col("ts").cast(TimestampType))
    }
    spread(raw.withColumn("ts_us", tsUs)
      .withColumn("ts", timestamp_micros(col("ts_us"))))
  }
}
