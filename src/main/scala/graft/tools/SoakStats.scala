package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the round-10 stats/series/selection wave, same §12
  * protocol as [[Soak]]/[[SoakInsights]] (fresh JVM, self-unioned
  * sf0.1 data with planted structure, one JSON line per (op, scale));
  * every planted observable is asserted in-harness:
  *
  *  - logistic Newton: user/event-id-offset event copies multiply the
  *    gradient AND Hessian sums by exactly ×scale, which cancels in
  *    the 2×2 solve — the round-6 β trajectory must be IDENTICAL at
  *    every scale while the per-round pass covers ×scale rows;
  *  - Kendall τ (daily mean value vs daily count): copies multiply
  *    every daily count by ×scale and keep daily means identical, so
  *    every pairwise SIGN is unchanged — n_days, n_pairs, concordant/
  *    discordant and τ must all be bit-identical;
  *  - Theil–Sen: the daily frame is CALENDAR-bounded — n_days and
  *    n_pairs must be exactly constant as events grow ×scale (the
  *    op's entire scale claim), and the median slope must scale to
  *    ×scale·baseline within round-9 noise;
  *  - ACF/Ljung–Box: same calendar bound (10 lags per key at every
  *    scale); deviations scale ×scale up to the micro-mean floor
  *    truncation, so ACF matches baseline within 1e-6;
  *  - k-center coreset: vec-id-offset embedding copies add only
  *    zero-distance twins with LARGER ids, so the greedy
  *    farthest-point trajectory (ids and radii both) must be
  *    IDENTICAL at every scale while the per-round cross covers
  *    ×scale vectors;
  *  - PCA power iteration: replication leaves the mean and the
  *    normalized direction unchanged — loadings IDENTICAL, λ ×scale;
  *  - logistic IRLS (r12, two-feature): plain self-union multiplies
  *    g and H by ×scale, cancelling in the 3×3 solve — round-6 β and
  *    mean log-loss IDENTICAL at every scale (SEs shrink ~1/√scale,
  *    deliberately unasserted);
  *  - Fisher exact (r12): unoffset copies scale all four 2×2 cells
  *    exactly ×scale; the truncated support widens only ~√scale (the
  *    op's scale claim) and p sharpens monotonically.
  *
  * Usage: runMain graft.tools.SoakStats [scale ...] (default 1 10 50;
  * SPARK_GRAFT_SF_DIR selects the base dir, default sf0.1).
  */
object SoakStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scales = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 50)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def emit(op: String, scale: Int, sec: Double, extra: (String, String)*)
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

    val ev0 = graft.queries.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts_us", "value")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")

    var lgBase: Option[Seq[(Long, Double, Double)]] = None
    var irBase: Option[(Long, Double, Double, Double, Double)] = None
    var fxBase: Option[((Long, Long, Long, Long), Double)] = None
    var ktBase: Option[Seq[(String, Long, Long, Long, Long, Double)]] = None
    var tsBase: Option[Seq[(String, Long, Long, Double)]] = None
    var acBase: Option[Map[(String, Long), Double]] = None
    var kcBase: Option[Seq[(Long, Long, Option[Double])]] = None
    var pcBase: Option[Seq[(Long, Double, Double)]] = None

    for (scale <- scales) {
      val sev = (0 until scale).map { i =>
        ev0.select((col("user_id") + i * 100000000L).as("user_id"),
          (col("event_id") + i * 1000000000L).as("event_id"),
          col("event_type"), col("ts_us"), col("value"))
      }.reduce(_ unionByName _)

      // --- logistic Newton: g and H both ×scale ⇒ β invariant
      val (lgRows, lgSec) = timed {
        graft.ops.Stats.logisticNewton(sev,
          col("event_type") === "purchase", "ln(1 + value)")
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      }
      emit("m_logistic_newton", scale, lgSec,
        "b1_final" -> lgRows.last._3.toString)
      lgBase match {
        case None => lgBase = Some(lgRows)
        case Some(b) => assert(lgRows == b,
          s"logistic trajectory not scale-invariant at $scale:\n" +
            s"$lgRows\nvs baseline\n$b")
      }

      // --- logistic IRLS (two-feature): plain self-union multiplies
      // every gradient AND Hessian moment by exactly ×scale, which
      // cancels in the 3×3 Cramer solve — the round-6 β AND the mean
      // log-loss must be IDENTICAL at every scale while each of the
      // 7 passes covers ×scale rows (SEs shrink ~1/√scale: not
      // asserted, they are supposed to move)
      val li0 = graft.queries.Tables.tLight(spark, sfDir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount")
      val sli = (0 until scale).map(_ => li0).reduce(_ unionByName _)
      val (irRow, irSec) = timed {
        graft.ops.Stats.logisticIrls(sli,
          col("l_returnflag") === "R", "l_quantity", "l_discount", 6)
          .collect().head
      }
      emit("m_logistic_irls", scale, irSec,
        "b1" -> irRow.getDouble(2).toString)
      val irKey = (irRow.getLong(0) / scale, irRow.getDouble(1),
        irRow.getDouble(2), irRow.getDouble(3), irRow.getDouble(7))
      irBase match {
        case None => irBase = Some(irKey)
        case Some(b) => assert(irKey == b,
          s"IRLS β/log-loss not scale-invariant at $scale: $irKey vs $b")
      }

      // --- Fisher exact: unoffset copies multiply all four 2×2 cells
      // by exactly ×scale (same md5 arms per copy); the ±50σ support
      // widens only ~√scale — the op's entire scale claim — and the
      // sharper table drives p monotonically toward 0
      val fev = (0 until scale).map(_ => ev0).reduce(_ unionByName _)
      graft.ops.Hashing.ensureRegistered(fev)
      val (fRow, fSec) = timed {
        graft.ops.Stats.fisherExact(fev,
          pmod(graft.ops.Hashing.md5Long(
            concat(lit("ab:"), col("user_id").cast("string"))),
            lit(2L)) === 0,
          col("event_type") === "purchase").collect().head
      }
      emit("a_fisher_exact", scale, fSec,
        "p" -> fRow.getDouble(5).toString)
      val fKey = (fRow.getLong(0) / scale, fRow.getLong(1) / scale,
        fRow.getLong(2) / scale, fRow.getLong(3) / scale)
      fxBase match {
        case None => fxBase = Some((fKey, fRow.getDouble(5)))
        case Some((bk, bp)) =>
          assert(fKey == bk,
            s"Fisher margins not exactly ×scale at $scale: $fKey vs $bk")
          assert(fRow.getDouble(5) <= bp + 1e-9,
            s"Fisher p must sharpen with scale: ${fRow.getDouble(5)} > $bp")
      }

      // --- Kendall τ over the daily frame: every pairwise sign
      // unchanged ⇒ the whole readout bit-identical
      val daily = sev
        .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
          col("value"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double"), 6).as("v"))
      val (ktRows, ktSec) = timed {
        graft.ops.Stats.kendallTau(daily, "event_type", "day", "v", "n")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
      }
      emit("a_kendall_tau", scale, ktSec,
        "n_pairs" -> ktRows.map(_._3).sum.toString)
      ktBase match {
        case None => ktBase = Some(ktRows)
        case Some(b) => assert(ktRows == b,
          s"Kendall readout not scale-invariant at $scale")
      }

      // --- Theil–Sen: calendar-bounded pair frame; slope ×scale
      val (tsRows, tsSec) = timed {
        graft.ops.EventAnalytics.theilSen(sev, "event_type").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSeq
      }
      emit("e_theil_sen", scale, tsSec,
        "n_pairs" -> tsRows.map(_._3).sum.toString)
      tsBase match {
        case None => tsBase = Some(tsRows)
        case Some(b) =>
          assert(tsRows.map(r => (r._1, r._2, r._3)) ==
            b.map(r => (r._1, r._2, r._3)),
            s"Theil-Sen day/pair counts not calendar-bounded at $scale")
          tsRows.zip(b).foreach { case (r, rb) =>
            // both sides are round-6 DISPLAYS of the exact medians, so
            // the ×scale identity holds only to the display quantum:
            // |r − s·b| ≤ s·(display half-ulp) + own half-ulp
            assert(math.abs(r._4 - rb._4 * scale) <= 5e-7 * (scale + 1),
              s"Theil-Sen slope not ×scale at $scale: ${r._4} vs " +
                s"${rb._4} × $scale") }
      }

      // --- ACF/Ljung–Box: 10 lags per key at every scale; values
      // match baseline within the micro-mean truncation bound
      val (acRows, acSec) = timed {
        graft.ops.EventAnalytics.acfLjungBox(sev, "event_type").collect()
          .map(r => ((r.getString(0), r.getLong(1)), r.getDouble(3)))
          .toMap
      }
      emit("e_acf_ljung_box", scale, acSec,
        "n_rows" -> acRows.size.toString)
      acBase match {
        case None => acBase = Some(acRows)
        case Some(b) =>
          assert(acRows.keySet == b.keySet,
            s"ACF lag grid not calendar-bounded at $scale")
          acRows.foreach { case (k, v) =>
            assert(math.abs(v - b(k)) <= 1e-6,
              s"ACF drifted at $scale for $k: $v vs ${b(k)}") }
      }

      // --- k-center: duplicates get larger ids, so the trajectory
      // (original ids AND radii) is exactly the baseline's
      val semb = (0 until scale).map { i =>
        emb0.select((col("vec_id") + i * 100000000L).as("vec_id"),
          col("embedding"))
      }.reduce(_ unionByName _)
      val (kcRows, kcSec) = timed {
        graft.ops.Similarity.kCenterCoreset(semb, 8).collect()
          .map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
      }
      emit("sim_kcenter_coreset", scale, kcSec,
        "n_vecs" -> (emb0.count() * scale).toString)
      kcBase match {
        case None => kcBase = Some(kcRows)
        case Some(b) => assert(kcRows == b,
          s"k-center trajectory not scale-invariant at $scale:\n" +
            s"$kcRows\nvs baseline\n$b")
      }

      // --- PCA power iteration: replication leaves the per-dim mean
      // and the normalized direction unchanged (every moment sum
      // scales ×scale and cancels in the normalize), so the loading
      // vector must be IDENTICAL while λ (the unnormalized norm)
      // grows ×scale up to the round-9/display-6 quanta
      val (pcRows, pcSec) = timed {
        graft.ops.Similarity.pcaPower(semb).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      }
      emit("sim_pca_power", scale, pcSec,
        "lambda" -> pcRows.head._3.toString)
      pcBase match {
        case None => pcBase = Some(pcRows)
        case Some(b) =>
          // loadings match to ONE display ulp, not bit-exactly: each
          // round quantizes w and its norm at 9 decimals, and the
          // ×scale sums land on different round-9 boundaries — the
          // w/nrm ratio can flip the 6th display decimal (measured:
          // dims 5 and 13 off by exactly 1e-6 at 10×). The Theil–Sen
          // display-quantum precedent above; λ stays exact ×scale.
          assert(pcRows.map(_._1) == b.map(_._1),
            s"PCA dim grid changed at $scale")
          pcRows.zip(b).foreach { case (r, rb) =>
            assert(math.abs(r._2 - rb._2) <= 1e-6 + 1e-12,
              s"PCA loading drifted beyond a display ulp at $scale: " +
                s"dim ${r._1} ${r._2} vs ${rb._2}") }
          assert(math.abs(pcRows.head._3 - b.head._3 * scale) <=
            1e-5 * scale,
            s"PCA lambda not ×scale at $scale: ${pcRows.head._3} vs " +
              s"${b.head._3} × $scale")
      }

      // --- PCA debias on a PLANTED RANK-1 corpus: x = t·u with
      // u = (0.6, 0.8, 0, 0) and t = id % 10 over N = 1000·scale rows.
      // Every constant in the chain lands EXACTLY on the op's own
      // rounding quanta: μ = 4.5·u (1dp·1dp), the component converges
      // to u in round 1 (0.84S/1.4S rounds to 0.600000 exactly), the
      // projection p = t − 4.5 is a half-integer, and p·v reproduces
      // the centered row bit-for-bit — so after removing ONE component
      // the residual is EXACTLY zero, removed_frac EXACTLY 1, the
      // per-row norm EXACTLY |t − 4.5| (sqrt of the binary-exact
      // (m+½)²), and λ = Σ(t−4.5)² = 8250·scale exactly. Absolute
      // predictions, stronger than baseline-relative invariance.
      val planted = spark.range(1000L * scale).select(
        col("id").as("vec_id"),
        expr("array(0.6D * (id % 10), 0.8D * (id % 10), 0D, 0D)")
          .as("embedding"))
      val (dbRows, dbSec) = timed {
        graft.ops.Similarity.pcaDebias(planted).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
            r.getDouble(3))).toSeq
      }
      emit("sim_pca_debias", scale, dbSec,
        "n_vecs" -> dbRows.size.toString)
      assert(dbRows.size == 1000 * scale,
        s"debias row count ${dbRows.size} != ${1000 * scale}")
      dbRows.foreach { case (id, nrm, resid, rem) =>
        val tv = math.abs((id % 10).toDouble - 4.5)
        assert(resid == 0.0,
          s"rank-1 debias residual not exactly zero at $scale: " +
            s"vec $id resid $resid")
        assert(rem == 1.0,
          s"rank-1 removed_frac not exactly 1 at $scale: vec $id $rem")
        assert(nrm == tv,
          s"centered norm mismatch at $scale: vec $id $nrm != $tv")
      }
      val (ppLam, ppSec) = timed {
        graft.ops.Similarity.pcaPower(planted).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      }
      emit("sim_pca_power_planted", scale, ppSec,
        "lambda" -> ppLam.head._3.toString)
      assert(ppLam.map(_._2) == Seq(0.6, 0.8, 0.0, 0.0),
        s"planted component not (0.6, 0.8, 0, 0) at $scale: " +
          ppLam.map(_._2))
      assert(ppLam.head._3 == 8250.0 * scale,
        s"planted lambda ${ppLam.head._3} != ${8250.0 * scale}")
    }
    spark.stop()
  }
}
