package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching at corpus scale: character-q-gram BLOCKING +
  * edit-distance VERIFY — the entity-resolution / record-linkage shape
  * (match "Jon Smith Inc" to "John Smith Inc." without O(n²) string
  * comparisons).
  *
  * Scale shape: candidates only ever meet inside a shared-q-gram block
  * (equi-join on the gram key), so the pair space is bounded by block
  * sizes, never |probes|×|targets|; the verify predicate (codegen'd
  * `levenshtein`) runs on candidates only. The gram join moves ONLY
  * (key, gram) pairs — payload strings re-attach by key afterwards, so
  * wide rows never ride the exploded join. Hot grams (common trigrams
  * like "er ") are the skew risk: `maxGramDf` drops grams whose
  * document frequency exceeds the cap (the df-cap defense of
  * [[Dedup.jaccardAllPairs]]); correctness note — a dropped gram can
  * only reduce candidate RECALL, and two strings within edit distance
  * e share ≥ 1 q-gram whenever `min(len) ≥ q·(e+1)`, so with
  * q=3, e≤1 any ≥ 6-char pair still blocks on its other grams unless
  * ALL of them are above the cap.
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

  /** Probes fuzzy-joined to targets at `levenshtein ≤ maxDist`:
    * returns (probeKey, targetKey, probe_str, target_str, dist).
    * Blocking on shared q-grams (df-capped); verify by edit distance.
    *
    * Both sides are aliased to internal names before any join, so the
    * common record-linkage case where probe and target share column
    * names (both sides called `name`/`id`) works; when an OUTPUT name
    * would collide, the target-side column gets a `_target` suffix.
    */
  def fuzzyJoin(probes: DataFrame, probeKey: String, probeStr: String,
      targets: DataFrame, targetKey: String, targetStr: String,
      maxDist: Int, q: Int = 3, maxGramDf: Long = 1000L): DataFrame = {
    // internal unique names: same-named probe/target columns must not
    // make the payload re-attach joins ambiguous
    val p = probes.select(col(probeKey).as("__q_key"),
      col(probeStr).as("__q_str"))
    val t = targets.select(col(targetKey).as("__t_key"),
      col(targetStr).as("__t_str"))
    val pg = grams(p, "__q_key", "__q_str", q)
    val tg0 = grams(t, "__t_key", "__t_str", q)
    // df cap measured on the (large) target side; one aggregate row per
    // gram, map-side combined — a hot gram is never a join blowup
    val hot = tg0.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxGramDf).select("gram")
    val tg = tg0.join(hot, Seq("gram"), "left_anti")
    val cands = pg.join(tg, Seq("gram"))
      .select(col("__q_key"), col("__t_key")).distinct()
    val outTargetKey =
      if (targetKey == probeKey || targetKey == probeStr)
        s"${targetKey}_target" else targetKey
    val outTargetStr =
      if (targetStr == probeKey || targetStr == probeStr ||
        targetStr == outTargetKey) s"${targetStr}_target" else targetStr
    cands
      .join(p, Seq("__q_key"))
      .join(t, Seq("__t_key"))
      .withColumn("dist", levenshtein(col("__q_str"), col("__t_str")))
      .filter(col("dist") <= maxDist)
      .select(col("__q_key").as(probeKey),
        col("__t_key").as(outTargetKey),
        col("__q_str").as(probeStr),
        col("__t_str").as(outTargetStr),
        col("dist").cast("long").as("dist"))
  }
}
