package graft

import org.scalatest.funsuite.AnyFunSuite

/** The widened contention canary (r13 judge item 2), replayed against
  * the committed capture shapes it must separate:
  *
  *  - the r13 OFFICIAL capture (BENCH_r13 sweep): passed both pre-only
  *    clauses (loadavg_pre 6.86 < 8, calib 5.10 M/s) yet ran through a
  *    mid-sweep burst — loadavg_post 13.6, a_brown_forsythe 47× its
  *    clean time, 76 of 345 gates degraded to reps=2 in a sweep that
  *    finished at wall 2243 s < budget 2700 s. The widened verdict MUST
  *    label it contended (the projection residue is the tell).
  *  - the committed clean finals (bench_r13_final, bench_r12_final):
  *    zero degraded gates, zero >4× rep spreads, calibration at the
  *    host rate. MUST stay clean — a canary that cries wolf on the
  *    repo's own canonical evidence is useless.
  *  - draw 4 (bench_r13_draw4_flagged): calib_pre 3.47 M/s against the
  *    5.88 M/s host best — the original true positive, still caught.
  */
class BenchCanarySpec extends AnyFunSuite {

  private val hostRef = Some(5879668L) // best-ever observed this host

  test("r13-official burst shape self-labels contended via the " +
    "projection residue (pre-only clauses all pass)") {
    val rs = Bench.contentionReasons(loadPre = 6.86, loadPost = 13.6,
      cores = 32, calibPre = 5100000L, calibMid = Seq.empty,
      calibPost = 5100000L, calibRef = hostRef, spreadGates = 0,
      nGates = 345, degradedMain = 76, wallSec = 2243,
      budgetSec = 2700)
    assert(rs.nonEmpty)
    assert(rs.exists(_.startsWith("degraded_main 76")), rs.mkString("; "))
    // and specifically NOT via the old pre-only clauses
    assert(!rs.exists(_.startsWith("loadavg_pre")))
    assert(!rs.exists(_.startsWith("calib_pre")))
  }

  test("a mid-sweep calibration sag is caught even when pre and post " +
    "both read clean (the burst the r13 pre/post samples straddled)") {
    val rs = Bench.contentionReasons(loadPre = 1.0, loadPost = 8.0,
      cores = 32, calibPre = 5200000L,
      calibMid = Seq(5300000L, 3470000L, 5100000L),
      calibPost = 5250000L, calibRef = hostRef, spreadGates = 0,
      nGates = 345, degradedMain = 0, wallSec = 1600, budgetSec = 2700)
    assert(rs.exists(_.startsWith("calib_mid_min 3470000")),
      rs.mkString("; "))
  }

  test("the committed clean finals stay clean under the widened " +
    "verdict (r13 draw 2 and r12 final shapes)") {
    // bench_r13_final.json: load 5.13/6.99, calib 5.26/5.25 M/s,
    // 0 degraded, 0 spread gates, wall 1611/2700
    assert(Bench.contentionReasons(5.13, 6.99, 32, 5259224L, Seq.empty,
      5248768L, hostRef, 0, 344, 0, 1611, 2700).isEmpty)
    // bench_r12_final.json: load 3.13/12.72 (suite residue — must NOT
    // trip the post clause), calib 5.39/5.85 M/s
    assert(Bench.contentionReasons(3.13, 12.72, 32, 5394880L, Seq.empty,
      5848788L, hostRef, 0, 341, 0, 1514, 2700).isEmpty)
  }

  test("draw 4's sagging pre-calibration — the original true " +
    "positive — still fires") {
    val rs = Bench.contentionReasons(1.32, 7.92, 32, 3468934L,
      Seq.empty, 5591626L, hostRef, 3, 345, 23, 1850, 2700)
    assert(rs.exists(_.startsWith("calib_pre 3468934")))
  }

  test("rep-spread residue fires at >= 10 burst-spread gates, not at " +
    "the weather-y draws' 3-7") {
    def at(n: Int) = Bench.contentionReasons(1.0, 8.0, 32, 5200000L,
      Seq.empty, 5200000L, hostRef, n, 345, 0, 1600, 2700)
    assert(at(7).isEmpty)
    assert(at(10).exists(_.startsWith("rep_spread_gates 10")))
  }

  test("no calibration reference -> absolute calib clauses are " +
    "skipped, relative signals still work (new-host posture, r13 " +
    "advice item 3)") {
    val rs = Bench.contentionReasons(1.0, 8.0, 32, 1000000L,
      Seq(900000L), 1000000L, calibRef = None, spreadGates = 0,
      nGates = 345, degradedMain = 76, wallSec = 2243, budgetSec = 2700)
    assert(!rs.exists(_.contains("calib")))
    assert(rs.exists(_.startsWith("degraded_main")))
  }

  test("memory-bandwidth sag fires even when every md5 sample reads " +
    "clean (the r15 78.9s-vs-48.7s burst shape: calibration at 86% of " +
    "reference — above the 70% clause — while a bandwidth/IO neighbor " +
    "owned the box)") {
    val rs = Bench.contentionReasons(loadPre = 1.0, loadPost = 8.0,
      cores = 32, calibPre = 5056000L, calibMid = Seq(5056000L),
      calibPost = 5100000L, calibRef = hostRef, spreadGates = 3,
      nGates = 353, degradedMain = 0, wallSec = 1600, budgetSec = 2700,
      bwPre = 11000000000L, bwMid = Seq(4200000000L),
      bwPost = 10800000000L, bwRef = Some(11500000000L))
    assert(rs.exists(_.startsWith("membw_mid_min 4200000000")),
      rs.mkString("; "))
    assert(!rs.exists(_.contains("calib")))
    // a clean sweep's own warm-heap residue (in-sweep samples at
    // 55-63% of the idle best-ever — the first instrumented draw's
    // exact shape) must NOT fire: the threshold sits below the
    // self-residue floor
    assert(Bench.contentionReasons(1.0, 8.0, 32, 5056000L,
      Seq(5056000L), 5100000L, hostRef, 0, 353, 0, 1618, 2700,
      7231655135L, Seq(6382752245L), 12979173398L,
      Some(11534408437L)).isEmpty)
    // and a clean-bandwidth run with the same md5 shape stays clean
    assert(Bench.contentionReasons(1.0, 8.0, 32, 5056000L,
      Seq(5056000L), 5100000L, hostRef, 3, 353, 0, 1600, 2700,
      11000000000L, Seq(11200000000L), 10800000000L,
      Some(11500000000L)).isEmpty)
    // absent bandwidth reference (old single-line ref file, new host):
    // the bandwidth clauses are skipped, like the md5 clauses
    assert(Bench.contentionReasons(1.0, 8.0, 32, 5056000L, Seq.empty,
      5100000L, hostRef, 0, 353, 0, 1600, 2700,
      5400000000L, Seq(5400000000L), 5400000000L, None).isEmpty)
  }

  test("degradation from a genuinely tight budget (wall >= budget) is " +
    "protocol, not contention") {
    val rs = Bench.contentionReasons(1.0, 8.0, 32, 5200000L, Seq.empty,
      5200000L, hostRef, 0, 345, 150, wallSec = 2700, budgetSec = 2700)
    assert(rs.isEmpty)
  }
}
