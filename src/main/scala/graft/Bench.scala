package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Methodology: a full untimed warmup pass first (JVM JIT, codegen cache,
  * parquet footer cache), then each query measured with a `noop`-format
  * write — unlike `count()`, the noop sink materializes every output
  * column, so Catalyst can't prune the projections being measured.
  *
  * Calibration (sf0.1 f_math_battery, 600k × 14 cols): `count()` 0.13 s
  * (prunes every projection — what the round-2 bench measured),
  * unsorted noop 0.80 s (the operator's true materialized cost), noop
  * behind the gate's determinism ORDER BY 2.85 s. The round-2→3 battery
  * "regressions" are exactly this methodology gap plus the oracle-only
  * global sort, not plan defects.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // JVM-aging hygiene, OUTSIDE the timed span: ops that persist
      // (jaccard shingle tables) leave cached blocks behind; across
      // 200+ gates × reps in one JVM that residue contributed to
      // downstream inflation (w_frames_running 9.1 s in-suite vs
      // 1.0 s isolated, measured r9). Dropping the SQL cache between
      // runs bounds the leak. (A per-run System.gc() was tried and
      // REJECTED: 864 full-heap collections shifted GC debt into the
      // timed spans — suite total 236 s → 271 s. Residual suite-
      // context noise remains inherent to single-JVM sweeps — §11;
      // IsoBench is the arbiter for any suspicious gate.)
      spark.catalog.clearCache()
      // clearCache() only drops the SQL cache — localCheckpoint blocks
      // are persistent RDDs it never touches, and they COMPOUND across
      // reps (r10 driver capture: pipe_incremental_refresh reps ran
      // 10.8 → 51.3 → 104.6 s purely from leaked checkpoint blocks;
      // j_bucketed_colocated 82.6/14.2/11.0 the same class). Unpersist
      // them all so rep N starts from rep-1 block-manager state.
      // BLOCKING, deliberately: unpersist(false) enqueues async block
      // removal that bleeds INTO the next timed span (measured:
      // m_entity_pagerank 8.8 s with async vs 4.4 s blocking vs 5.0 s
      // with no unpersist at all — the hygiene must finish out here).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // streaming gates load HDFS-backed state-store providers keyed by
      // their (per-run, already-deleted) checkpoint dirs; the providers'
      // in-memory state maps linger until the maintenance task notices.
      // Across 304 gates × 4 executions that residue is heap pressure in
      // everyone else's timed span — unload eagerly, it's a no-op when
      // nothing is loaded.
      // (reflective: unloadAll is private[sql] to Scala but public in
      // bytecode; a bench-harness hygiene call doesn't justify a shim
      // object inside Spark's package namespace)
      try {
        val cls = Class.forName(
          "org.apache.spark.sql.execution.streaming.state.StateStore$")
        cls.getMethod("unloadAll").invoke(cls.getField("MODULE$").get(null))
      } catch { case _: Throwable => () }
      sec
    }

    // optional args: query names to bench in isolation (the driver
    // always passes none — local-iteration convenience, like Verify's)
    val only = args.toSet
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    // SPARK_GRAFT_BENCH_REPS switches per-query values from a single
    // run to the MEDIAN of N runs (the IsoBench denoising protocol,
    // in-suite): streaming/ANN gates jitter run-to-run, and judging
    // medians instead of single captures is the stated bench protocol.
    // Default is 3 — reps=1 captures mis-measured three rounds running
    // (r9: a 0.82 s query read as 13.5 s from single-JVM aging), so the
    // official capture now self-denoises; the emitted "reps" field says
    // which protocol produced the numbers. Cost ≈ 2× a single pass.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
      .max(1)
    names.foreach(n => once(n, SparkEntry.queries(n))) // warmup, untimed
    val runs = names.map(n =>
      n -> (1 to reps).map(_ => once(n, SparkEntry.queries(n))))
    val results = runs.map { case (n, ts) =>
      // any failed rep poisons the query (-1): a median over a mix of
      // failures and successes would silently hide flakiness. Even rep
      // counts average the two middle samples — the upper-middle order
      // statistic alone biases high (reps=2 would report the slower run)
      n -> (if (ts.exists(_ < 0)) -1.0
            else {
              val s = ts.sorted
              if (s.length % 2 == 1) s(s.length / 2)
              else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
            })
    }
    def json(fmt: Double => String, withRuns: Boolean): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      val runsField = if (!withRuns || reps == 1) "" else
        runs.map { case (k, ts) =>
          "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
        }.mkString(""","runs":{""", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""reps":$reps,"queries":$qs$runsField,"sf":"$sfDir"}"""
    }
    // The harness tail-captures a fixed window of stdout and has cut the
    // HEAD of the (long) JSON line three rounds running (BENCH_r03..r05
    // parsed: null) even when printed first AND last — sbt's own trailing
    // "[success]" lines eat into the window, beheading the ~2.5 KB
    // per-query line. Defense in depth: the compact per-query line printed
    // first and late, full precision in bench.json, and — the actual fix —
    // a sub-100-byte TOTAL-ONLY line as the very last stdout line, small
    // enough to survive any capture window. Locale.ROOT formatting: the
    // default locale could render 1.234 as "1,234" and break the JSON.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val compact = json(f3, withRuns = false)
    println(compact)
    Console.flush()
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench.json"),
      json(_.toString, withRuns = true) + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    println(compact)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir"}""")
    Console.flush()
  }
}
