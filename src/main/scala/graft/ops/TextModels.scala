package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-model family over mention contexts (ref sift/models/text.py and
  * sift/models/embeddings.py): corpus idf, the per-entity mention TF-IDF
  * model (the reference's flagship entity representation), and the
  * entity-annotated skip-gram training corpus with per-class minimum
  * counts.
  *
  * All plans are declarative: explode → hash-aggregate → equi-join; no
  * driver-side dictionaries (the reference collects its vocab/idf models
  * to the driver — here the idf side joins distributively and small
  * vocabularies broadcast).
  */
object TextModels {

  private def toks(c: String) =
    s"regexp_extract_all(lower($c), '[a-z0-9]+', 0)"

  /** F12 / ref TermIdfs (text.py:152-168): idf = ln(N / df) over the
    * corpus token vocabulary, keeping terms with df > `minDf` (the ref's
    * `TermDocumentFrequencies` floor; its default 2 assumes web-scale
    * corpora — callers pick the floor for their corpus size).
    */
  def termIdfs(docs: DataFrame, minDf: Long = 2): DataFrame = {
    val tk = docs.select(col("doc_id"), explode(expr(toks("text"))).as("tok"))
    // df via the (doc, tok) partial-aggregate: the distinct-shuffle over
    // the raw token explode collapses map-side before it moves
    val dfreq = tk.groupBy("doc_id", "tok").agg(count(lit(1)))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") > minDf)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    dfreq.crossJoin(n) // 1-row broadcast, not a real cross product
      .select(col("tok"),
        round(log(col("n_docs").cast("double") / col("df")), 6).as("idf"))
  }

  /** EntityMentionTermFrequency (ref text.py:170-206, fixing ref defect
    * #4 — the reference destructures mentions with a stale 2-tuple shape;
    * the intent is tf-idf over mention-context terms grouped by TARGET
    * entity): tf per (target, token) over the full mention text → inner
    * join idf (≡ the ref's leftOuterJoin + idf≠None filter) → weight =
    * sqrt(tf) × idf → per-entity entries sorted by token, L2-normalized
    * with a deterministic sequential fold.
    *
    * Output: (target, counts) with counts a JSON array of {tok, w} and w
    * a fixed-point DECIMAL(10,6) string (engine output convention).
    *
    * Scale shape: two hash aggregations (tf, plus the idf build upstream)
    * and one equi-join on the token key — AQE broadcasts the idf side
    * when the vocabulary is small; nothing funnels through the driver.
    */
  def entityMentionTermFrequency(mentions: DataFrame, idfs: DataFrame,
      normalize: Boolean = true): DataFrame = {
    val tf = mentions
      .select(col("target"), explode(expr(toks("text"))).as("tok"))
      .groupBy("target", "tok").agg(count(lit(1)).as("tf"))
    val w = tf.join(idfs, "tok")
      .select(col("target"), col("tok"),
        (sqrt(col("tf").cast("double")) * col("idf")).as("wt"))
    // the norm fold lives in its own projection — lambdas get no CSE,
    // inlining it would re-fold the entry list per element
    val grouped = w.groupBy("target")
      .agg(sort_array(collect_list(struct(col("tok"), col("wt"))))
        .as("es"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(es, cast(0.0 as double), (a, e) -> a + e.wt * e.wt))"))
    val wOut =
      if (normalize)
        "case when nrm > 0 then e.wt / nrm else cast(0.0 as double) end"
      else "e.wt"
    grouped.select(col("target"), to_json(expr(
      s"transform(es, e -> struct(e.tok as tok, " +
        s"cast(cast($wOut as decimal(10,6)) as string) as w))"))
      .as("counts"))
  }

  /** EntitySkipGramEmbeddings training corpus (ref embeddings.py:44-55):
    * one training sentence per mention whose target carries
    * `entityPrefix` — pre-context tokens ⧺ the raw entity token (the
    * un-tokenized target URI, exactly as the ref injects it) ⧺
    * post-context tokens. The in-span anchor tokens are EXCLUDED, as in
    * the reference.
    *
    * Keeps the mention's natural key (target, source, start, stop) so
    * downstream filters can regroup without synthetic ids. Record-local:
    * pure per-row expressions, no shuffle.
    */
  def entityTrainingSentences(mentions: DataFrame,
      entityPrefix: String): DataFrame =
    mentions
      .filter(col("target").startsWith(entityPrefix))
      .select(col("target"), col("source"), col("start"), col("stop"),
        expr(s"concat(${toks("substring(text, 1, start)")}, " +
          s"array(target), ${toks("substring(text, stop + 1)")})")
          .as("sentence"))

  /** Per-class minimum-count vocabulary filter (ref embeddings.py:36-42,
    * 60-70: gensim trim_rule keeps entities at count ≥ minEntityCount and
    * words at count ≥ minWordCount — the classes get different floors
    * because entity tokens are orders of magnitude rarer). Tokens below
    * their class floor are removed from the training sentences (gensim
    * likewise drops pruned words from sentences at train time); emptied
    * sentences are dropped.
    *
    * Two distributed passes: a token-count aggregate, then a
    * posexplode → join-on-token → regroup that preserves token order by
    * position — the same scale-safe shape as [[Mentions.indexMapped]]
    * (join strategy left to AQE: the above-floor vocabulary broadcasts
    * when small, shuffles when web-scale).
    */
  def classMinCountFilter(sentences: DataFrame, entityPrefix: String,
      minWordCount: Long, minEntityCount: Long): DataFrame = {
    val counts = sentences
      .select(explode(col("sentence")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val allowed = counts.filter(
      (col("w").startsWith(entityPrefix) && col("cnt") >= minEntityCount) ||
        (!col("w").startsWith(entityPrefix) && col("cnt") >= minWordCount))
      .select("w")
    // no broadcast hint: the above-floor vocabulary can be huge at web
    // scale — AQE broadcasts it only when it actually fits (contrast
    // mappedEntityComentions, whose vocab is bounded by maxRank)
    sentences
      .select(col("target"), col("source"), col("start"), col("stop"),
        posexplode(col("sentence")).as(Seq("pos", "w")))
      .join(allowed, Seq("w"))
      .groupBy("target", "source", "start", "stop")
      .agg(expr("transform(array_sort(collect_list(struct(pos, w))), " +
        "x -> x.w)").as("sentence"))
  }
}
