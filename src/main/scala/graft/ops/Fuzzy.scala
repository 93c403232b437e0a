package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching at corpus scale: BLOCKING + edit-distance
  * VERIFY — the entity-resolution / record-linkage shape (match
  * "Jon Smith Inc" to "John Smith Inc." without O(n²) string
  * comparisons). Ref semantics twin: sift's redirect canonicalization
  * generalized from exact-key to fuzzy-string identity
  * (reference/sift/corpora/wikipedia.py:36-66).
  *
  * Scale shape — DEDUP-FIRST, then block, then verify, then expand:
  * both sides first collapse to their DISTINCT strings, blocking and
  * the verify predicate (codegen'd `levenshtein`, preceded by the
  * cheap |len(a)−len(b)| ≤ e filter) run on the distinct-string
  * universe only, and record pairs materialize at the very end
  * through two equi-joins on the string. Every repeated string —
  * catalog names, URLs, boilerplate — pays blocking and edit-distance
  * ONCE, candidate counts are bounded by distinct-string collisions
  * (measured on TPC-H-style part names: 21 k records but 64 distinct
  * names — record-level segment blocking emitted 75.6 M candidate
  * pairs, distinct-level emits a few thousand), and the final
  * expansion is output-bound: it can only be large when the true
  * match set is. The blocking join itself moves ONLY (string,
  * block-key) pairs — payloads never ride the exploded join.
  *
  * Two blocking schemes, selected by `blocking=`:
  *
  * - `"segment"` (default) — PassJoin-style partition blocking: each
  *   target string of length L is split into `maxDist+1` contiguous
  *   covering segments (near-equal lengths, fixed convention below);
  *   by pigeonhole, a probe within edit distance e must contain at
  *   least one target segment EXACTLY, as a contiguous substring
  *   whose start position is shifted by at most e. Probes therefore
  *   emit, for every hypothesized target length in `[len−e, len+e]`
  *   and every segment index, the substrings in that ±e window; the
  *   block key is (segment index, target length, substring). Recall
  *   at the edit bound is EXACT at EVERY string length, and the
  *   length-difference filter |len(a)−len(b)| ≤ e is built into the
  *   key itself. Cost: blocks collide only on an exact aligned
  *   substring of length ~L/(e+1) — bounded by shared-aligned-
  *   substring density among DISTINCT strings, NOT by gram
  *   popularity. Caveat (measured): short template strings that
  *   share a whole aligned half (two-word "<color> <noun>" names
  *   sharing the noun) still collide per distinct-string pair — the
  *   dedup-first stage is what keeps that affordable, not the
  *   segment scheme itself.
  *
  * - `"prefix"` — rarest-q-gram prefix filtering: blocking keys are
  *   each string's `q·maxDist + 1` grams with the lowest target-side
  *   document frequency (ties by gram). Two strings within edit
  *   distance e differ by at most q·e grams, so their (q·e+1)-long
  *   rarest-first prefixes must share a gram — recall at the edit
  *   bound is exact ONLY for strings carrying at least q·e+1 grams,
  *   i.e. length ≥ ~q·(e+1); shorter strings can miss true matches
  *   ("ab" vs "ax" at dist 1 share no trigram — see FuzzySpec). Hot
  *   grams land in a prefix only for strings whose other grams are
  *   even hotter, so a common gram never floods candidate generation
  *   (an earlier absolute df cap lost recall at scale — a 10× corpus
  *   pushed EVERY gram over the cap and matches collapsed to zero).
  *
  * Decision rule: use `"segment"` — it is recall-exact at all
  * lengths and its candidate count is bounded by aligned-substring
  * collisions, which stays ~linear in corpus size even at fixed gram
  * vocabulary (prefix blocks grow linearly per block there, making
  * candidates quadratic). Prefer `"prefix"` only when `maxDist` is
  * large relative to string length: segment probes emit
  * O((2e+1)²·(e+1)) keys per string versus prefix's q·e+1, so for
  * e ≥ ~3 on short, gram-DIVERSE strings the prefix scheme's smaller
  * key fan-out can win. Both schemes return identical match sets
  * above the prefix scheme's min-length bound (FuzzySpec runs the
  * matrix).
  */
object Fuzzy {

  /** (key, gram): distinct character q-grams per string. The gram
    * expression is let-bound (lambda variable pins the string) and
    * total: strings shorter than q yield the whole string as one gram.
    */
  def grams(df: DataFrame, key: String, str: String, q: Int): DataFrame =
    df.select(col(key), explode(expr(
      s"element_at(transform(array($str), s -> array_distinct(" +
        s"transform(sequence(1, greatest(length(s) - ${q - 1}, 1)), " +
        s"i -> substring(s, i, $q)))), 1)")).as("gram"))

  /** PassJoin segment descriptor for splitting a string of length
    * `lenCol` into e+1 covering segments: the first
    * `(e+1) − len mod (e+1)` segments take `len div (e+1)` chars, the
    * rest one extra. Returns (length, 1-based start) SQL for segment
    * index column `i` (0-based). */
  private def segExprs(lenCol: String, i: String, e: Int)
      : (String, String) = {
    val k = e + 1
    val li = s"(($lenCol div $k) + " +
      s"(CASE WHEN $i >= ($k - ($lenCol % $k)) THEN 1 ELSE 0 END))"
    val pi = s"(1 + $i * ($lenCol div $k) + " +
      s"GREATEST($i - ($k - ($lenCol % $k)), 0))"
    (li, pi)
  }

  /** Target-side block keys: one row per (string, segment index) —
    * (key, __i, __tlen, __seg). */
  private def targetSegKeys(t: DataFrame, key: String, str: String,
      e: Int): DataFrame = {
    val (li, pi) = segExprs("__tlen", "__i", e)
    t.withColumn("__tlen", length(col(str)))
      .withColumn("__i", explode(expr(s"sequence(0, $e)")))
      .select(col(key), col("__i"), col("__tlen"),
        expr(s"substring($str, $pi, $li)").as("__seg"))
  }

  /** Probe-side block keys: for each hypothesized target length
    * within ±e of the probe's own and each segment index, the probe
    * substrings of the segment's length within the ±e start-position
    * window (clamped to the string; empty windows drop before the
    * explode so `sequence` never runs descending). */
  private def probeSegKeys(p: DataFrame, key: String, str: String,
      e: Int): DataFrame = {
    val (li, pi) = segExprs("__tlen", "__i", e)
    p.withColumn("__m", length(col(str)))
      .withColumn("__tlen",
        explode(expr(s"sequence(greatest(__m - $e, 1), __m + $e)")))
      .withColumn("__i", explode(expr(s"sequence(0, $e)")))
      .withColumn("__li", expr(li))
      .withColumn("__pi", expr(pi))
      .withColumn("__lo", expr(s"greatest(__pi - $e, 1)"))
      .withColumn("__hi", expr(s"least(__pi + $e, __m - __li + 1)"))
      .filter(col("__lo") <= col("__hi"))
      .withColumn("__p", explode(expr("sequence(__lo, __hi)")))
      .select(col(key), col("__i"), col("__tlen"),
        expr(s"substring($str, __p, __li)").as("__seg"))
      .distinct()
  }

  /** Distinct-string candidate pairs the blocking scheme generates
    * over a probe/target string universe — exactly the pair set
    * [[fuzzyJoin]] verifies with levenshtein, exposed so soaks and
    * capacity planning can measure the blocking COST observable
    * (candidate count is the cost driver; growth should be ~linear in
    * corpus size for the segment scheme). Inputs are frames holding
    * the string column `pCol` / `tCol`; output columns are named
    * `pCol` / (`tCol` or `tCol`_target on collision).
    */
  def candidatePairs(probeStrs: DataFrame, pCol: String,
      targetStrs: DataFrame, tCol: String, maxDist: Int, q: Int = 3,
      blocking: String = "segment"): DataFrame = {
    val pd = probeStrs.select(col(pCol).as("__q_sid")).distinct()
    val td = targetStrs.select(col(tCol).as("__t_sid")).distinct()
    val outT = if (tCol == pCol) s"${tCol}_target" else tCol
    blockedPairs(pd, td, maxDist, q, blocking)
      .select(col("__q_sid").as(pCol), col("__t_sid").as(outT))
  }

  /** The blocking stage over the DISTINCT string sets `pd(__q_sid)` /
    * `td(__t_sid)`: distinct candidate pairs per `blocking`. */
  private def blockedPairs(pd: DataFrame, td: DataFrame, maxDist: Int,
      q: Int, blocking: String): DataFrame = {
    val cands = blocking match {
      case "segment" =>
        probeSegKeys(pd, "__q_sid", "__q_sid", maxDist)
          .join(targetSegKeys(td, "__t_sid", "__t_sid", maxDist),
            Seq("__i", "__tlen", "__seg"))
          .select(col("__q_sid"), col("__t_sid")).distinct()
      case "prefix" =>
        val prefixLen = q * maxDist + 1
        val pg = grams(pd, "__q_sid", "__q_sid", q)
        val tg = grams(td, "__t_sid", "__t_sid", q)
        // the global gram order: target-side document frequency over
        // DISTINCT strings, ties by gram; probe grams absent from the
        // target corpus get df 0 (rarest — they can only shrink the
        // probe's candidate set). One aggregate row per gram, map-side
        // combined.
        val df = tg.groupBy("gram").agg(count(lit(1)).as("__df"))
        def prefix(g: DataFrame, key: String): DataFrame = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(key).orderBy(asc("__df"), asc("gram"))
          g.join(df, Seq("gram"), "left")
            .na.fill(0L, Seq("__df"))
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") <= prefixLen)
            .select(col(key), col("gram"))
        }
        prefix(pg, "__q_sid")
          .join(prefix(tg, "__t_sid"), Seq("gram"))
          .select(col("__q_sid"), col("__t_sid")).distinct()
      case other => throw new IllegalArgumentException(
        s"unknown blocking scheme '$other' (expected segment | prefix)")
    }
    cands
  }

  /** Probes fuzzy-joined to targets at `levenshtein ≤ maxDist`:
    * returns (probeKey, targetKey, probe_str, target_str, dist).
    * Blocking per `blocking` ("segment" | "prefix" — scheme contract
    * and decision rule in the object doc); verify by edit distance.
    *
    * Both sides are aliased to internal names before any join, so the
    * common record-linkage case where probe and target share column
    * names (both sides called `name`/`id`) works; when an OUTPUT name
    * would collide, the target-side column gets a `_target` suffix.
    */
  def fuzzyJoin(probes: DataFrame, probeKey: String, probeStr: String,
      targets: DataFrame, targetKey: String, targetStr: String,
      maxDist: Int, q: Int = 3, blocking: String = "segment")
      : DataFrame = {
    // internal unique names: same-named probe/target columns must not
    // make the payload re-attach joins ambiguous
    val p = probes.select(col(probeKey).as("__q_key"),
      col(probeStr).as("__q_str"))
    val t = targets.select(col(targetKey).as("__t_key"),
      col(targetStr).as("__t_str"))
    // dedup-first: the blocking/verify universe is the DISTINCT string
    // set of each side; the string is its own key until the expansion
    val pd = p.select(col("__q_str").as("__q_sid")).distinct()
    val td = t.select(col("__t_str").as("__t_sid")).distinct()
    // verify on distinct pairs: length-difference prefilter (free — no
    // string scan) ahead of the levenshtein; segment keys already
    // encode the band but the prefix scheme needs it
    val verified = blockedPairs(pd, td, maxDist, q, blocking)
      .filter(abs(length(col("__q_sid")) - length(col("__t_sid")))
        <= maxDist)
      .withColumn("dist", levenshtein(col("__q_sid"), col("__t_sid")))
      .filter(col("dist") <= maxDist)
    val outTargetKey =
      if (targetKey == probeKey || targetKey == probeStr)
        s"${targetKey}_target" else targetKey
    val outTargetStr =
      if (targetStr == probeKey || targetStr == probeStr ||
        targetStr == outTargetKey) s"${targetStr}_target" else targetStr
    // expansion: record pairs via two equi-joins on the string —
    // output-bound, the only stage whose size tracks record counts
    verified
      .join(p, col("__q_sid") === col("__q_str"))
      .join(t, col("__t_sid") === col("__t_str"))
      .select(col("__q_key").as(probeKey),
        col("__t_key").as(outTargetKey),
        col("__q_str").as(probeStr),
        col("__t_str").as(outTargetStr),
        col("dist").cast("long").as("dist"))
  }
}
