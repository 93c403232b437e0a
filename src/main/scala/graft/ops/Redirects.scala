package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-KB redirect composition and corpus link rewriting (ref
  * sift/corpora/redirects.py:10-112 MapRedirects / RedirectDocuments —
  * note the ref module is bit-rotted at import time, defect #1 in
  * SURVEY.md §0; this implements the evident intent).
  *
  * All joins are key-equality left-outers with identity fallback, so at
  * scale they shuffle on the redirect key and AQE may broadcast a small
  * redirect side.
  */
object Redirects {

  /** Compose two redirect sets across KBs, then collapse one transitive
    * hop (ref build(): mapped_to rewrites to-KB sources through from-KB
    * pairs — (a→b),(a→c) ⇒ (b→c); mapped_from chains from-KB targets into
    * the mapped set — (a→b),(b→c) ⇒ (a→c)).
    * Inputs/output: (source, target) pairs.
    */
  def mapRedirects(from: DataFrame, to: DataFrame): DataFrame = {
    val mappedTo = to.as("t")
      .join(from.select(col("source").as("fs"), col("target").as("ft")),
        col("t.source") === col("fs"), "left_outer")
      .select(coalesce(col("ft"), col("t.source")).as("source"),
        col("t.target").as("target"))
    val mappedFrom = from.as("f")
      .join(mappedTo.select(col("source").as("ms"), col("target").as("mt")),
        col("f.target") === col("ms"), "left_outer")
      .select(col("f.source").as("source"), col("mt").as("target"))
      .filter(col("target").isNotNull)
    val rds = mappedFrom.unionByName(mappedTo).distinct()
    rds.as("l")
      .join(rds.select(col("source").as("s2"), col("target").as("t2")),
        col("l.target") === col("s2"), "left_outer")
      .select(col("l.source").as("source"),
        coalesce(col("t2"), col("l.target")).as("target"))
      .distinct()
  }

  /** Rewrite every link target in `docs(doc_id, …, links)` through
    * `redirects(source, target)` with identity fallback, preserving link
    * order and all other document columns. The document's non-link
    * columns never ride the links shuffle (J2 re-attach pattern).
    */
  def redirectDocuments(docs: DataFrame, redirects: DataFrame): DataFrame = {
    val resolved = docs
      .select(col("doc_id"), posexplode(col("links")).as(Seq("pos", "l")))
      .join(redirects.select(col("source").as("rsrc"),
        col("target").as("rtgt")), col("l.target") === col("rsrc"),
        "left_outer")
      .select(col("doc_id"), col("pos"),
        struct(coalesce(col("rtgt"), col("l.target")).as("target"),
          col("l.start").as("start"), col("l.stop").as("stop")).as("l"))
    val grouped = resolved.groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, l))), x -> x.l)")
        .as("links"))
    docs.drop("links")
      .join(grouped, Seq("doc_id"), "left_outer")
      .withColumn("links", coalesce(col("links"), expr(
        "cast(array() as array<struct<target:string,start:int,stop:int>>)")))
  }
}
