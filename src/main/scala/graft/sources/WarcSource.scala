package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.textfn.{Warc, Html}

/** S4/F11/P5: CommonCrawl-style WARC ingestion (ref
  * sift/corpora/commoncrawl.py:43-58): split archives on the
  * `WARC/1.0\r\n` record delimiter with the built-in `text` source
  * (parallel, splittable), keep HTTP-200 response payloads, reduce the
  * HTML to anchored plain text with UTF-16 link spans.
  */
object WarcSource {

  final case class WebDoc(doc_id: String, text: String,
      links: Seq[Wiki.LinkRow])

  def documents(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.read.option("lineSep", "WARC/1.0\r\n").textFile(path)
      .flatMap { record =>
        for {
          rec <- Warc.parseRecord(record)
          parsed <- Html.parseArticle(rec.body)
        } yield WebDoc(rec.url, parsed.text,
          parsed.links.map(l => Wiki.LinkRow(l.target, l.start, l.stop)))
      }
      .toDF()
  }
}
