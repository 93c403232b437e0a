package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Pins.PinSyntax

/** Training-sequence PACKING: concatenate a corpus in stable document
  * order and cut it into fixed-length token sequences ("chunks"), the
  * standard pretraining-data layout (documents straddle chunk
  * boundaries; every chunk is exactly `seqLen` tokens full except the
  * last). The output is the doc → chunk SPAN map a writer needs to
  * emit packed sequences, without ever materializing the concatenated
  * token stream. The coarser sibling is [[Sampling.tokenShards]]
  * (whole documents binned to ~N-token shards); packing tracks the
  * exact token ranges so sequences are boundary-exact.
  *
  * Scale shape: the only global computation is the token-offset prefix
  * sum, delegated to [[Rank.globalRunningSum]] (two-phase: per-range
  * partials + a broadcast offsets table — no single-partition window
  * over the data). Everything after is per-row arithmetic plus one
  * explode over the ≤ ⌈n/seqLen⌉+1 chunks a document overlaps.
  */
object Pack {

  /** Per-(doc, chunk) spans: which `seqLen`-token chunk(s) each
    * document's tokens land in, and the half-open token range
    * [tok_start, tok_end) it contributes. Documents with zero tokens
    * are dropped (they contribute nothing to any sequence).
    */
  def sequenceSpans(counts: DataFrame, idCol: String, nCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val withOff = Rank.globalRunningSum(
        counts.filter(col(nCol) > 0), Seq(col(idCol).asc), nCol, "__cum")
      .withColumn("off", col("__cum") - col(nCol)) // exclusive prefix
    withOff
      .select(col(idCol), col(nCol), col("off"),
        explode(expr(
          s"sequence(off div $seqLen, (off + $nCol - 1) div $seqLen)"))
          .as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        greatest(col("chunk_id") * seqLen, col("off")).as("tok_start"),
        least((col("chunk_id") + 1) * seqLen, col("off") + col(nCol))
          .as("tok_end"))
  }

  /** Chunk-level rollup of [[sequenceSpans]]: per packed sequence, how
    * many documents contribute, how many tokens it holds (== seqLen
    * everywhere but the tail chunk), and its first/last document.
    */
  def packSummary(counts: DataFrame, idCol: String, nCol: String,
      seqLen: Int): DataFrame =
    sequenceSpans(counts, idCol, nCol, seqLen)
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_end") - col("tok_start")).as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** RAG-style OVERLAPPING chunking — the retrieval-side sibling of
    * [[sequenceSpans]] (which packs across documents with no overlap):
    * per document, token windows of `window` tokens every `stride`
    * tokens (stride < window ⇒ consecutive chunks share
    * window − stride tokens of context). Emits (doc, chunk_idx,
    * start_tok, n_toks, fp) with fp an md5 fingerprint of the chunk
    * text — the identity a retrieval index stores. The tail chunk may
    * be short; token-free documents emit nothing.
    *
    * Scale shape: pure per-row expressions plus one explode fanning
    * each doc to ⌈n/stride⌉ chunk rows — no shuffle, no state; the
    * start sequence is ascending by construction (size ≥ 1 after the
    * filter) so the ANSI descending-sequence hazard cannot arise.
    */
  def chunkOverlap(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col("doc_id"), expr(Hashing.tokensSql).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), col("tk"),
        explode(expr(s"sequence(0, size(tk) - 1, $stride)")).as("start"))
      .select(col("doc_id"),
        expr(s"start div $stride").cast("long").as("chunk_idx"),
        col("start").cast("long").as("start_tok"),
        expr(s"slice(tk, start + 1, $window)").as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_toks"),
        md5(array_join(col("chunk"), " ")).as("fp"))
  }

  /** TOKEN-BUDGET SELECTION — the curation step every fixed-compute
    * training run ends with: rank documents by a quality score
    * (descending, doc id tie-break) and keep the prefix whose
    * cumulative token count fits the budget B. Greedy-by-quality is
    * the standard practice (quality scores are ordinal, not additive,
    * so knapsack optimality is not a meaningful target). A document
    * that would straddle the boundary is EXCLUDED (budget is a hard
    * cap), so tokens_selected ≤ B always.
    *
    * DETERMINISM: the running token sum is the exact two-phase
    * [[Rank.globalRunningSum]] over the total (score desc, id asc)
    * order; the summary is one scalar fold of BIGINT counts plus the
    * boundary document's (score, id) — no floats anywhere but the
    * score display. SCALE SHAPE: range-partition + local window +
    * broadcast offsets (never a single-partition global window), one
    * filter, one fold. Returns one row (n_docs, total_tokens,
    * budget, n_selected, tokens_selected, cutoff_score,
    * cutoff_doc_id) — the cutoff pair names the LAST selected doc so
    * a rerun can verify the boundary.
    */
  def tokenBudgetSelect(counts: DataFrame, idCol: String, nCol: String,
      scoreCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val cum = Rank.globalRunningSum(
        counts.select(col(idCol), col(nCol),
          col(scoreCol).cast("decimal(18,6)").as("__score")),
        Seq(col("__score").desc, col(idCol).asc), nCol, "__cum")
      .pin(false) // feeds the totals fold + the selection
    val tot = cum.agg(count(lit(1)).as("n_docs"),
      coalesce(max(col("__cum")), lit(0L)).as("total_tokens"))
    // the boundary doc: the LAST selected row in the (score desc, id
    // asc) order = min score, max id among ties — folded as a 1-row
    // min-of-struct AGGREGATE (id negated so the struct order's
    // secondary min is the id max), NOT a limit-1 frame: an aggregate
    // still emits its one (null) row when nothing fits the budget,
    // where a limit-1 over an empty prefix would annihilate the whole
    // output through the crossJoin (r11 advice).
    val selN = cum.filter(col("__cum") <= budget)
      .agg(count(lit(1)).as("n_selected"),
        coalesce(max(col("__cum")), lit(0L)).as("tokens_selected"),
        min(struct(col("__score").as("s"),
          (-col(idCol).cast("long")).as("nid"))).as("bd"))
    tot.crossJoin(broadcast(selN))
      .select(col("n_docs"), col("total_tokens"),
        lit(budget).as("budget"), col("n_selected"),
        col("tokens_selected"),
        col("bd.s").cast("double").as("cutoff_score"),
        (-col("bd.nid")).cast("long").as("cutoff_doc_id"))
  }
}
