package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
