package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.textfn.Text

/** W2: sentence-window mention contexts around document links (ref
  * behavior: sift/models/text.py:39-88 EntityMentions.iter_mentions).
  *
  * For each link, the mention is the text of the sentence(s) containing
  * the link span (extended ±window sentences), with the link span
  * re-based onto the mention. Mentions equal to their whole sentence are
  * dropped; `strict` additionally drops list items (leading '*') and
  * sentences not ending in sentence punctuation.
  *
  * Record-local by construction (sentence spans never cross documents),
  * so it runs as a typed flatMap — one row in, N mention rows out, no
  * shuffle; the exploded output partitions like its input.
  */
object Mentions {

  final case class LinkIn(target: String, start: Int, stop: Int)
  final case class DocIn(doc_id: String, text: String, links: Seq[LinkIn])
  final case class Mention(
      target: String, source: String, text: String, start: Int, stop: Int)

  private val SentenceEnd = Set('.', '!', '?', '"', '\'')

  def trimSubsection(t: String): String = {
    val i = t.indexOf('#'); if (i < 0) t else t.substring(0, i)
  }
  def trimProtocol(t: String): String = {
    val i = t.indexOf("://"); if (i < 0) t else t.substring(i + 3)
  }

  /** Pure mention extraction over one document. */
  def extract(doc: DocIn, window: Int = 1, strict: Boolean = true,
      normUrl: Boolean = true): Seq[Mention] = {
    val spans = Text.sentenceSpans(doc.text)
    if (spans.isEmpty) return Nil
    val offsets = spans.map(_._1)

    // index of last sentence offset <= pos (bisect_right - 1)
    def sentAt(pos: Int): Int = {
      var lo = 0; var hi = offsets.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (offsets(mid) <= pos) lo = mid + 1 else hi = mid
      }
      lo - 1
    }
    // index of last sentence offset < pos (bisect_left - 1)
    def sentBefore(pos: Int): Int = {
      var lo = 0; var hi = offsets.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (offsets(mid) < pos) lo = mid + 1 else hi = mid
      }
      lo - 1
    }

    val lhs = window / 2
    val rhs = (window - lhs) - 1
    doc.links.flatMap { link =>
      val startIdx = math.max(0, sentAt(link.start) - lhs)
      val endIdx = math.min(spans.length - 1, sentBefore(link.stop) + rhs)
      if (startIdx < 0 || endIdx < 0) None
      else {
        val sentOffset = spans(startIdx)._1
        val mention = doc.text.substring(sentOffset, spans(endIdx)._2)
        val span = (link.start - sentOffset, link.stop - sentOffset)
        val target =
          if (normUrl) trimProtocol(trimSubsection(link.target))
          else link.target
        val sm = mention.trim
        val wholeSentence = span == ((0, mention.length))
        val failsStrict = strict && (sm.isEmpty || sm.startsWith("*") ||
          !SentenceEnd.contains(sm.last))
        if (wholeSentence || failsStrict) None
        else Some(Mention(target, doc.doc_id, mention, span._1, span._2))
      }
    }
  }

  /** DataFrame operator: `docs(doc_id, text, links ARRAY<STRUCT<target,
    * start, stop>>)` → one row per mention.
    */
  def mentionContexts(docs: DataFrame, window: Int = 1,
      strict: Boolean = true, normUrl: Boolean = true): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select("doc_id", "text", "links").as[DocIn]
      .flatMap(d => extract(d, window, strict, normUrl))
      .toDF()
  }
}
