package graft.tools

import graft.textfn.Wikitext

/** Dev harness: per-pass wall time of the wikitext regex pipeline over
  * CorpusSoak-generated article bodies — finds the hot pass when the
  * corpus soak's markup stage looks slow. Not part of the driver
  * contract; single-threaded on purpose (per-core throughput).
  */
object RegexProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val texts = (0 until n).map { i =>
      val xml = CorpusSoak.articleXml(i.toLong, 40000L, 8000L)
      val s0 = xml.indexOf("xml:space=\"preserve\">") + 21
      xml.substring(s0, xml.lastIndexOf("</text>"))
    }
    val bytes = texts.map(_.length.toLong).sum
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      val mbs = bytes / 1e6 / sec
      println(f"$label%-16s ${sec * 1000}%9.1f ms  $mbs%8.1f MB/s")
    }
    // warmup (JIT) then whole-pipeline baselines
    texts.foreach(t => Wikitext.parse("u", t))
    time("parse(total)")(texts.foreach(t => Wikitext.parse("u", t)))
    time("stripTemplates")(texts.foreach(Wikitext.stripTemplates))
    time("extractCaptions")(texts.foreach(Wikitext.extractCaptions))
    // per-pattern find loops (match cost without replacement)
    for ((name, p) <- Wikitext.profilingPatterns)
      time(name)(texts.foreach { t =>
        val m = p.matcher(t); while (m.find()) ()
      })
  }
}
