package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.EventAnalytics

/** Scale soak for the event-analytics family (funnel / retention /
  * gap-fill / rolling anomaly), same §12 protocol as [[Soak]]/[[SoakEr]]
  * (fresh JVM, scaled data with planted structure, one JSON line per
  * (op, scale) with seconds + correctness observables).
  *
  * Scaling: the event log is copied with disjoint user/event id spaces
  * and UNCHANGED timestamps — every per-user pattern repeats in each
  * copy, so the closed-form checks are:
  *
  *  - funnel: per-step reach counts must equal scale × the base
  *    counts EXACTLY (copies are user-disjoint and funnel state is
  *    per-user);
  *  - retention: every (cohort_week, offset) cell must equal scale ×
  *    the base cell, and the matrix must keep the base's cell count
  *    (output is weeks², input-size-invariant);
  *  - gap-fill: a planted key with events only on day 0 (mean 10.0)
  *    and day 9 (40.0) must fill days 1–8 with n=0 / 10.0 at every
  *    scale — 10 rows closed-form;
  *  - anomaly: a planted key alternating 2/4 events per day with a
  *    50-event day 20 must flag day 20 with the SAME rounded z at
  *    every scale (the planted key is appended once, so its series
  *    never changes; z of the scaled organic keys is separately
  *    scale-invariant because mu and sigma both scale by the copy
  *    count).
  *
  * Usage: runMain graft.tools.SoakEvents [scale ...] (default 1 10 100;
  * SPARK_GRAFT_SF_DIR selects the base dir, default sf0.1).
  */
object SoakEvents {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(1, 10, 100)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def emit(op: String, scale: Int, sec: Double, extra: (String, Any)*)
        : Unit = {
      val e = extra.map { case (k, v) => s""","$k":$v""" }.mkString
      val secs = String.format(java.util.Locale.ROOT, "%.2f",
        Double.box(sec))
      println(s"""{"op":"$op","scale":$scale,"sec":$secs$e}""")
      Console.flush()
    }
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val DayUs = 86400000000L
    val base = graft.queries.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts_us", "value")

    // planted keys (appended ONCE, outside the scaled copies)
    val gapPlant = Seq(
      (9000000001L, 9100000001L, "soak_gap", 0L, 5.0),
      (9000000001L, 9100000002L, "soak_gap", 1000L, 15.0),
      (9000000001L, 9100000003L, "soak_gap", 9L * DayUs, 40.0))
      .toDF("user_id", "event_id", "event_type", "ts_us", "value")
    val anomPlant = (0 until 30).flatMap { d =>
      val n = if (d == 20) 50 else if (d % 2 == 0) 2 else 4
      (0 until n).map(i =>
        (9000000002L, 9200000000L + d * 100L + i, "soak_anom",
          d * DayUs + i, 0.0))
    }.toDF("user_id", "event_id", "event_type", "ts_us", "value")

    val steps = Seq("signup", "click", "purchase")
    val baseFunnel = EventAnalytics.funnel(base, steps)
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    val baseRet = EventAnalytics.retentionCohorts(base)
      .select("cohort_week", "week_offset", "n_active")
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    val baseActive = EventAnalytics.activeUsers(base)
      .select("day", "dau", "wau", "mau")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, a, w, m) => d -> ((a, w, m)) }.toMap
    val baseIvl = graft.ops.Intervals.mergeIntervals(
      base.select(col("user_id"), col("ts_us").as("s0"),
        (col("ts_us") + 600000000L).as("e0")),
      Seq("user_id"), "s0", "e0").count()
    val baseTrans = EventAnalytics.transitionMatrix(base)
      .select("from_type", "to_type", "n")
      .as[(String, String, Long)].collect()
      .map { case (f, to, n) => (f, to) -> n }.toMap

    for (scale <- scales) {
      val copies = (0 until scale).map { i =>
        base.select((col("user_id") + i * 10000000L).as("user_id"),
          (col("event_id") + i * 1000000000L).as("event_id"),
          col("event_type"), col("ts_us"), col("value"))
      }.reduce(_ unionByName _)
      val all = copies.unionByName(gapPlant).unionByName(anomPlant)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nEvents = all.count()

      // funnel: exact per-step linearity
      val (funnelRows, funnelSec) = timed {
        EventAnalytics.funnel(copies, steps)
          .select("step", "n_users").as[(Long, Long)].collect().toMap
      }
      val funnelExact = steps.indices.forall(i =>
        funnelRows(i.toLong) == scale * baseFunnel(i.toLong))

      // retention: exact per-cell linearity + invariant cell count
      val (retCells, retSec) = timed {
        EventAnalytics.retentionCohorts(copies)
          .select("cohort_week", "week_offset", "n_active")
          .as[(Long, Long, Long)].collect()
          .map { case (c, o, n) => (c, o) -> n }.toMap
      }
      val retExact = retCells.size == baseRet.size &&
        retCells.forall { case (k, n) =>
          baseRet.get(k).contains(n / scale) && n % scale == 0
        }

      // gap-fill: planted key closed-form (10 rows, zero-fill days 1-8
      // forward-filled with 10.0, day 9 back to 40.0)
      val (gapRows, gapSec) = timed {
        EventAnalytics.gapFillDaily(all, "event_type")
          .filter(col("event_type") === "soak_gap")
          .select("day", "n_events", "filled_value")
          .as[(Long, Long, Double)].collect().sortBy(_._1)
      }
      val gapExact = gapRows.length == 10 &&
        gapRows.head == ((0L, 2L, 10.0)) &&
        (1L to 8L).forall(d => gapRows(d.toInt) == ((d, 0L, 10.0))) &&
        gapRows(9) == ((9L, 1L, 40.0))

      // anomaly: planted spike day flagged with the same rounded z at
      // every scale (window [13,19] = 4,2,4,2,4,2,4 → z = 43.830844)
      val (anomRow, anomSec) = timed {
        EventAnalytics.rollingAnomalies(all, "event_type")
          .filter(col("event_type") === "soak_anom" && col("day") === 20L)
          .select("z", "is_anomaly").as[(Option[Double], Boolean)]
          .collect().head
      }
      val anomExact = anomRow._2 && anomRow._1.contains(43.830844)

      // active users: user-disjoint copies with unchanged timestamps ⇒
      // every per-day (dau, wau, mau) must be EXACTLY scale × the base
      // cell, days invariant — the rolling-distinct fan-out's cost
      // grows with activity rows, its output does not
      val (actCells, actSec) = timed {
        EventAnalytics.activeUsers(copies)
          .select("day", "dau", "wau", "mau")
          .as[(Long, Long, Long, Long)].collect()
          .map { case (d, a, w, m) => d -> ((a, w, m)) }.toMap
      }
      // .get, not apply: an unexpected day must report exact:false,
      // never kill the harness before the JSON line prints
      val actExact = actCells.size == baseActive.size &&
        actCells.forall { case (d, (a, w, m)) =>
          baseActive.get(d).contains((a / scale, w / scale, m / scale)) &&
            a % scale == 0 && w % scale == 0 && m % scale == 0
        }

      // interval merge: per-user sweep ⇒ merged-interval count exactly
      // scale × base (user-disjoint copies, per-user structure
      // unchanged); planted gap user resolves to 2 closed-form spans
      val (ivlCounts, ivlSec) = timed {
        val m = graft.ops.Intervals.mergeIntervals(
          all.select(col("user_id"), col("ts_us").as("s0"),
            (col("ts_us") + 600000000L).as("e0")),
          Seq("user_id"), "s0", "e0")
        (m.count(),
          m.filter(col("user_id") === 9000000001L)
            .select("start", "end", "n_spans")
            .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq)
      }
      // planted anomaly user: 30 one-per-day bursts → 30 intervals
      val ivlExact = ivlCounts._1 == scale * baseIvl + 2 + 30 &&
        ivlCounts._2 == Seq((0L, 600001000L, 2L),
          (9L * DayUs, 9L * DayUs + 600000000L, 1L))

      // transitions: per-copy user streams identical ⇒ per-(from, to)
      // counts exactly scale × base, matrix shape invariant
      val (transCells, transSec) = timed {
        EventAnalytics.transitionMatrix(copies)
          .select("from_type", "to_type", "n")
          .as[(String, String, Long)].collect()
          .map { case (f, to, n) => (f, to) -> n }.toMap
      }
      val transExact = transCells.size == baseTrans.size &&
        transCells.forall { case (k, n) =>
          baseTrans.get(k).contains(n / scale) && n % scale == 0
        }

      emit("e_active_users", scale, actSec,
        "n_days" -> actCells.size, "exact" -> actExact)
      emit("w_interval_merge", scale, ivlSec,
        "n_intervals" -> ivlCounts._1, "exact" -> ivlExact)
      emit("e_transitions", scale, transSec,
        "n_cells" -> transCells.size, "exact" -> transExact)
      emit("e_funnel_steps", scale, funnelSec,
        "n_events" -> nEvents, "exact" -> funnelExact,
        "step0" -> funnelRows(0L), "step2" -> funnelRows(2L))
      emit("e_retention_cohorts", scale, retSec,
        "n_cells" -> retCells.size, "exact" -> retExact)
      emit("e_gapfill_daily", scale, gapSec, "exact" -> gapExact)
      emit("e_rolling_anomaly", scale, anomSec, "exact" -> anomExact,
        "z20" -> anomRow._1.getOrElse(-1.0))
      all.unpersist()
    }
    spark.stop()
  }
}
