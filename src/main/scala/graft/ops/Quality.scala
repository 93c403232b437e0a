package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the validation gate a
  * production ingest pipeline runs before publishing a table (the role the
  * reference delegates to ad-hoc filter stages around its loaders, e.g. the
  * record sanity drops in sift/corpora/commoncrawl.py; here it is a
  * first-class, composable suite in the style of the constraint-suite
  * pattern from the public Deequ paper, Schelter et al., VLDB 2018).
  *
  * Scale contract (the property that matters at 100 TB):
  *   - every row-local check (completeness / range / accepted-values /
  *     row-count) compiles into ONE aggregate over ONE scan of the table —
  *     map-side partial counts, a single 1-row result, no per-check jobs;
  *   - each [[Unique]] check is one hash groupBy on its key columns
  *     (count of over-represented keys; no Expand, no countDistinct mix);
  *   - each [[RefIntegrity]] check is one left-anti join against the
  *     reference keys (broadcastable when the reference side is a
  *     dimension; Catalyst/AQE picks the strategy).
  *  The result is a tiny (one row per check) frame — checks never funnel
  *  data to the driver.
  */
object Quality {

  /** One declarative constraint over a table. `name` keys the result row. */
  sealed trait Check { def name: String }

  /** Fraction of non-null values in `column` must be >= `minRatio`. */
  final case class Completeness(column: String, minRatio: Double = 1.0)
      extends Check { def name = s"completeness:$column" }

  /** Count of rows with `column` outside [lo, hi] must be 0 (nulls are
    * counted as violations — a bounded column must be present). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check { def name = s"in_range:$column" }

  /** Count of rows with `column` outside `values` must be 0. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Check { def name = s"accepted:$column" }

  /** Table must have at least `atLeast` rows. */
  final case class RowCount(atLeast: Long)
      extends Check { def name = "row_count" }

  /** Count of key tuples appearing more than once must be 0. */
  final case class Unique(columns: Seq[String])
      extends Check { def name = s"unique:${columns.mkString(",")}" }

  /** Count of rows whose `column` has no match in `ref(refColumn)` must
    * be 0 (null foreign keys are orphans under this check). */
  final case class RefIntegrity(column: String, ref: DataFrame,
      refColumn: String)
      extends Check { def name = s"ref_integrity:$column" }

  /** Run `checks` against `df`. Returns one row per check:
    * (check_name STRING, metric DOUBLE, passed BOOLEAN), in the order
    * the checks were declared. The metric is the observed ratio for
    * [[Completeness]], the row count for [[RowCount]], and the violation
    * count for every other check.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val indexed = checks.zipWithIndex

    // Row-local checks: one scan, one agg, melt the 1-row result. Each
    // melted struct carries its declaration index as a literal so output
    // order needs no UDF — just an orderBy on the literal column.
    val rowLocal = indexed.collect {
      case (c: Completeness, i) =>
        val m = coalesce(
          round(avg(when(col(c.column).isNull, 0d).otherwise(1d)), 9),
          lit(0d))
        (i, c.name, m, (v: Column) => v >= c.minRatio)
      case (c: InRange, i) =>
        val bad = col(c.column).isNull ||
          col(c.column) < c.lo || col(c.column) > c.hi
        (i, c.name, sum(when(bad, 1L).otherwise(0L)).cast("double"),
          (v: Column) => v === 0d)
      case (c: AcceptedValues, i) =>
        val bad = !col(c.column).isin(c.values: _*)
        (i, c.name, sum(when(bad, 1L).otherwise(0L)).cast("double"),
          (v: Column) => v === 0d)
      case (c: RowCount, i) =>
        (i, c.name, count(lit(1)).cast("double"),
          (v: Column) => v >= c.atLeast.toDouble)
    }

    // metric columns are aliased by declaration index, not check name:
    // the same check shape may legitimately appear twice (e.g. two
    // InRange bands on one column), and duplicate aliases would be
    // ambiguous to resolve at melt time
    val localFrame: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val agged = df.agg(
          rowLocal.head._3.as(s"__c${rowLocal.head._1}"),
          rowLocal.tail.map { case (i, _, m, _) => m.as(s"__c$i") }: _*)
        Some(agged.select(explode(array(rowLocal.map {
          case (i, n, _, pass) => struct(lit(i).as("__o"),
            lit(n).as("check_name"), col(s"__c$i").as("metric"),
            pass(col(s"__c$i")).as("passed"))
        }: _*)).as("r")).select("r.*"))
      }

    // Per-check frames for the non-row-local shapes (each is its own
    // aggregate plan; all end in a single 1-row result).
    val others = indexed.collect {
      case (c: Unique, i) =>
        val dups = df.groupBy(c.columns.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(when(col("__n") > 1L, 1L).otherwise(0L)),
            lit(0L)).cast("double").as("metric"))
        (i, c.name, dups)
      case (c: RefIntegrity, i) =>
        val orphans = df
          .join(c.ref.select(col(c.refColumn).as("__ref_k")).distinct(),
            col(c.column) === col("__ref_k"), "left_anti")
          .agg(count(lit(1)).cast("double").as("metric"))
        (i, c.name, orphans)
    }.map { case (i, n, d) =>
      d.select(lit(i).as("__o"), lit(n).as("check_name"), col("metric"),
        (col("metric") === 0d).as("passed"))
    }

    (localFrame.toSeq ++ others).reduce(_ unionByName _)
      .orderBy("__o").drop("__o")
  }

  /** ROW-LEVEL quarantine routing — the other half of [[run]]: instead
    * of one verdict row per check, every input row gains `dq_reasons`
    * (the sorted names of the row-local checks it fails; empty =
    * clean) and `dq_pass`, so a pipeline can route clean rows forward
    * and quarantine the rest WITH their reasons in one pass. Only
    * row-local checks participate (Completeness as a not-null test,
    * InRange, AcceptedValues — a NULL fails InRange/AcceptedValues
    * too: a row that cannot prove the constraint is not clean);
    * table-level checks (Unique / RowCount / RefIntegrity) stay in
    * [[run]].
    *
    * Pure per-row column expressions — one scan, codegen'd, no
    * shuffle, any number of declared checks.
    */
  def quarantine(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val rowChecks: Seq[(String, Column)] = checks.collect {
      case c: Completeness => c.name -> col(c.column).isNotNull
      case c: InRange => c.name ->
        (col(c.column).isNotNull && col(c.column) >= c.lo &&
          col(c.column) <= c.hi)
      case c: AcceptedValues => c.name ->
        (col(c.column).isNotNull && col(c.column).isin(c.values: _*))
    }
    require(rowChecks.nonEmpty,
      "quarantine needs at least one row-local check " +
        "(Completeness / InRange / AcceptedValues)")
    val marks = rowChecks.map { case (n, ok) =>
      when(ok, lit(null: String)).otherwise(lit(n))
    }
    df.withColumn("dq_reasons",
        array_sort(filter(array(marks: _*), x => x.isNotNull)))
      .withColumn("dq_pass", size(col("dq_reasons")) === 0)
  }

  /** Benford's-law first-digit audit (Newcomb 1881, Benford 1938) —
    * the forensic-accounting screen for fabricated or truncated
    * numeric columns: naturally-occurring multi-scale magnitudes put
    * digit d first with probability log₁₀(1 + 1/d); uniform synthetic
    * data, capped values, or hand-entered figures deviate loudly.
    *
    * The first significant digit is extracted from the DECIMAL(18,2)
    * string rendering (both engines print plain decimal — a DOUBLE's
    * string can go scientific and disagree), first `[1-9]` match, so
    * zero/null values drop. Observed counts left-join onto the fixed
    * 1..9 digit spine (n = 0 where a digit never occurs — an absent
    * digit has positive expectation and its (0−exp)²/exp term is
    * exactly the strongest-violation signal, and the 8-df reading
    * needs all nine rows). Per digit: observed count, share, the
    * Benford expectation, and the χ² term (obs − exp)²/exp; the
    * 8-df χ² total rides every row. DETERMINISM: counts are BIGINT;
    * expectation and χ² are single IEEE expressions off the shared
    * round-9 log₁₀ constant per digit.
    *
    * SCALE SHAPE: one codegen'd scan into a 9-row hash aggregate +
    * a 1-row total; the digit table is bounded by construction.
    */
  def benford(df: DataFrame, column: String): DataFrame = {
    val observed = df
      .select(regexp_extract(
        abs(col(column)).cast("decimal(18,2)").cast("string"),
        "[1-9]", 0).as("digit"))
      .filter(col("digit") =!= "")
      .groupBy("digit").agg(count(lit(1)).as("n"))
    // Fixed 1..9 digit spine: a digit that NEVER occurs still has a
    // positive expectation nn·p_benford, and its (0 − exp)²/exp term is
    // exactly the strongest-violation signal — an observed-only grid
    // would understate χ² precisely when the law is most broken, and
    // the 8-df interpretation only holds over all nine digits.
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("string").as("digit"))
    val digits = spine.join(observed, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val tot = digits.agg(sum(col("n")).as("nn"))
    val terms = digits.crossJoin(broadcast(tot))
      .withColumn("p_benford", expr(
        "cast(round(log10(1.0D + 1.0D / cast(digit as double)), 9) " +
          "as decimal(12,9))"))
      .withColumn("expected", expr(
        "cast(nn as double) * cast(p_benford as double)"))
      .withColumn("chi2_term", expr(
        "cast(round((cast(n as double) - expected) * " +
          "(cast(n as double) - expected) / expected, 6) " +
          "as decimal(18,6))"))
    val chi2 = terms.agg(
      round(sum(col("chi2_term")).cast("double"), 6).as("chi2"))
    terms.crossJoin(broadcast(chi2))
      .select(col("digit").cast("long").as("digit"), col("n"),
        round(expr("cast(n as double) / cast(nn as double)"), 6)
          .as("share"),
        col("p_benford").cast("double").as("p_benford"),
        col("chi2_term").cast("double").as("chi2_term"), col("chi2"))
      .orderBy("digit")
  }
}
