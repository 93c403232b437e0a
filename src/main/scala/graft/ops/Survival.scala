package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pins.PinSyntax

/** Kaplan–Meier survival estimation over an event log — the standard
  * right-censored retention/churn curve (Kaplan & Meier 1958), the
  * lifetime twin of the cohort retention matrix in
  * `ops/EventAnalytics.retentionCohorts`.
  *
  * Scale contract: the per-user lifetime extraction is ONE hash
  * aggregate on the user key; everything after runs on the duration
  * table, whose size is bounded by the observation horizon in time
  * units (weeks of history — hundreds of rows at any data scale), so
  * the unpartitioned windows that accumulate at-risk counts and the
  * survival product operate on aggregate-sized data by construction.
  * No global sort or driver-side loop touches per-event or per-user
  * rows.
  */
object Survival {

  /** Kaplan–Meier estimate of user lifetime from an event log with
    * columns `user_id` and `ts_us`.
    *
    * Per user, lifetime = (last event − first event) in `unitUs`
    * units (integer div). A user whose last event falls within
    * `censorLagUnits` units of the study end (the global max ts) is
    * CENSORED at that lifetime — still possibly active, their
    * lifetime is a lower bound; everyone else is an observed churn
    * ("death") at theirs. Then, with d_t deaths and c_t censorings at
    * lifetime t and n_t = users whose lifetime is ≥ t (at risk),
    *
    *   S(t) = Π_{s ≤ t, d_s > 0} (1 − d_s / n_s)
    *
    * following the standard convention that same-time censorings
    * leave the risk set AFTER deaths are counted. If some t exhausts
    * the risk set (d_t = n_t) the curve hits exactly 0 and stays
    * there — guarded by a flag rather than ln(0), since the product
    * is computed as exp(Σ ln) to stay a pure windowed aggregate.
    *
    * Returns one row per lifetime with any event:
    * (t, n_at_risk, n_deaths, n_censored, survival), survival rounded
    * to 6 decimals.
    */
  def kaplanMeier(events: DataFrame, unitUs: Long,
      censorLagUnits: Int = 2): DataFrame = {
    val withRisk = riskTable(events, unitUs, censorLagUnits)
      .withColumn("__factor", lit(1.0) -
        col("n_deaths").cast("double") / col("n_at_risk"))
    withRisk
      .withColumn("__hit_zero",
        max((col("__factor") === 0.0).cast("int")).over(wAll) === 1)
      .withColumn("survival", when(col("__hit_zero"), lit(0.0))
        .otherwise(round(exp(sum(log(col("__factor"))).over(wAll)), 6)))
      .select("t", "n_at_risk", "n_deaths", "n_censored", "survival")
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972, Aalen 1978) over the
    * SAME lifetime/censoring extraction as [[kaplanMeier]]:
    *
    *   H(t) = Σ_{s ≤ t} d_s / n_s
    *
    * plus the Fleming–Harrington survival S̃(t) = exp(−H(t)) — the KM
    * alternative that behaves better at small risk sets (it never
    * hits an absorbing 0 on a d = n step, where KM collapses).
    *
    * DETERMINISM: each hazard increment rounds(,9) into DECIMAL(18,9)
    * and the cumulative sum is EXACT — unlike KM's exp(Σ ln factor),
    * which both engines evaluate in the same t-order; here no order
    * assumption is needed at all. One double exp/round per row at
    * readout. Scale contract: the object doc's — everything past the
    * per-user aggregate is horizon-sized.
    *
    * Returns (t, n_at_risk, n_deaths, n_censored, cum_hazard,
    * survival_fh).
    */
  def nelsonAalen(events: DataFrame, unitUs: Long,
      censorLagUnits: Int = 2): DataFrame =
    riskTable(events, unitUs, censorLagUnits)
      .withColumn("__h", expr("cast(round(cast(n_deaths as double) " +
        "/ n_at_risk, 9) as decimal(18,9))"))
      .withColumn("__ch", sum(col("__h")).over(wAll))
      .select(col("t"), col("n_at_risk"), col("n_deaths"),
        col("n_censored"),
        round(col("__ch").cast("double"), 6).as("cum_hazard"),
        round(exp(-col("__ch").cast("double")), 6).as("survival_fh"))

  /** LOG-RANK TEST (Mantel 1966) between two survival curves — the
    * standard "do these arms churn differently?" significance readout
    * next to [[kaplanMeier]]'s curves: at each event time t with d_t
    * total deaths, n_t at risk and n_{A,t} at risk in arm A,
    *
    *   O_A = Σ d_{A,t},   E_A = Σ d_t·n_{A,t}/n_t,
    *   V = Σ d_t·(n_{A,t}/n_t)(1 − n_{A,t}/n_t)(n_t − d_t)/(n_t − 1)
    *
    * and χ² = (O_A − E_A)²/V against χ²₁. A user belongs to arm A iff
    * ANY of their events satisfies `isA` (a per-user max — the
    * "ever purchased" style of arm assignment).
    *
    * DETERMINISM: the lifetime/censor extraction is [[kaplanMeier]]'s
    * exactly, carrying the exact per-arm death/censor BIGINT counts;
    * at-risk counts are exact integer window sums; each E and V term
    * rounds(,9) into DECIMAL before the horizon-sized fold; χ² is one
    * IEEE expression. SCALE SHAPE: one hash aggregate on the user key,
    * then everything on the horizon-sized duration table (the object
    * doc's contract). Returns one row
    * (n_users, n_a, o_a, e_a, v_a, chi2 — null χ² on zero variance).
    */
  def logRank(events: DataFrame, unitUs: Long, isA: Column,
      censorLagUnits: Int = 2): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(min("ts_us").as("__first"), max("ts_us").as("__last"),
        max(isA.cast("boolean").cast("int")).as("__ga"))
    val end = users.agg(max("__last").as("__end"))
    val lifetimes = users.crossJoin(broadcast(end))
      .select(expr(s"(__last - __first) div ${unitUs}L").as("t"),
        (col("__last") < col("__end") - lit(censorLagUnits * unitUs))
          .cast("int").as("__dead"), col("__ga"))
      .pin(false) // feeds the risk table AND the n/n_a fold
    val byT = lifetimes.groupBy("t").agg(
      sum("__dead").cast("long").as("d"),
      sum(col("__ga") * col("__dead")).cast("long").as("da"),
      count(lit(1)).cast("long").as("leave"),
      sum("__ga").cast("long").as("leave_a"))
    val wPrev = Window.partitionBy().orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy()
    val risk = byT
      .withColumn("n_at", sum(col("leave")).over(wTot) -
        coalesce(sum(col("leave")).over(wPrev), lit(0L)))
      .withColumn("na_at", sum(col("leave_a")).over(wTot) -
        coalesce(sum(col("leave_a")).over(wPrev), lit(0L)))
    risk.filter(col("d") > 0)
      .select(col("d"), col("da"), col("n_at"), col("na_at"))
      .agg(sum(col("da")).as("o_a"),
        sum(expr("cast(round(cast(d as double) * " +
          "cast(na_at as double) / cast(n_at as double), 9) " +
          "as decimal(28,9))")).as("e_a"),
        sum(expr("case when n_at > 1 then cast(round(" +
          "cast(d as double) * " +
          "(cast(na_at as double) / cast(n_at as double)) * " +
          "(1.0D - cast(na_at as double) / cast(n_at as double)) * " +
          "cast(n_at - d as double) / cast(n_at - 1 as double), 9) " +
          "as decimal(28,9)) else cast(0 as decimal(28,9)) end"))
          .as("va"))
      .crossJoin(broadcast(lifetimes.agg(
        count(lit(1)).as("n_users"), sum(col("__ga")).as("n_a"))))
      .select(col("n_users"), col("n_a").cast("long").as("n_a"),
        col("o_a"),
        round(col("e_a").cast("double"), 6).as("e_a"),
        round(col("va").cast("double"), 6).as("v_a"),
        round(expr("case when va > 0 then " +
          "power(cast(o_a as double) - cast(e_a as double), 2) / " +
          "cast(va as double) end"), 6).as("chi2"))
  }

  // Horizon-sized by construction (see object doc): unpartitioned
  // windows past the per-user aggregate are deliberate and safe.
  private val wAll = Window.partitionBy().orderBy("t")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Shared lifetime → (t, n_deaths, n_censored, n_at_risk) extraction
    * behind [[kaplanMeier]] and [[nelsonAalen]] — one hash aggregate
    * on the user key, then the horizon-sized duration table.
    */
  private def riskTable(events: DataFrame, unitUs: Long,
      censorLagUnits: Int): DataFrame = {
    val users = events.groupBy("user_id")
      .agg(min("ts_us").as("__first"), max("ts_us").as("__last"))
    val end = users.agg(max("__last").as("__end"))
    val lifetimes = users.crossJoin(broadcast(end))
      // integer `div`, not `/`: the double quotient of two near-equal
      // longs can land at 2.9999…96 and truncate to the wrong week
      .select(expr(s"(__last - __first) div ${unitUs}L").as("t"),
        (col("__last") < col("__end") - lit(censorLagUnits * unitUs))
          .cast("int").as("__dead"))
    val byT = lifetimes.groupBy("t").agg(
      sum("__dead").cast("long").as("n_deaths"),
      sum(lit(1) - col("__dead")).cast("long").as("n_censored"))
    val wPrev = Window.partitionBy().orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    byT.withColumn("n_at_risk",
      sum(col("n_deaths") + col("n_censored")).over(
        Window.partitionBy()) -
        coalesce(sum(col("n_deaths") + col("n_censored")).over(wPrev),
          lit(0L)))
  }
}
