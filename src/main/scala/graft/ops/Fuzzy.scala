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
    */
  def fuzzyJoin(probes: DataFrame, probeKey: String, probeStr: String,
      targets: DataFrame, targetKey: String, targetStr: String,
      maxDist: Int, q: Int = 3, maxGramDf: Long = 1000L): DataFrame = {
    val pg = grams(probes, probeKey, probeStr, q)
    val tg0 = grams(targets, targetKey, targetStr, q)
    // df cap measured on the (large) target side; one aggregate row per
    // gram, map-side combined — a hot gram is never a join blowup
    val hot = tg0.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxGramDf).select("gram")
    val tg = tg0.join(hot, Seq("gram"), "left_anti")
    val cands = pg.join(tg, Seq("gram"))
      .select(col(probeKey), col(targetKey)).distinct()
    cands
      .join(probes.select(col(probeKey), col(probeStr)), Seq(probeKey))
      .join(targets.select(col(targetKey), col(targetStr)), Seq(targetKey))
      .withColumn("dist", levenshtein(col(probeStr), col(targetStr)))
      .filter(col("dist") <= maxDist)
      .select(col(probeKey), col(targetKey), col(probeStr),
        col(targetStr), col("dist").cast("long").as("dist"))
  }
}
