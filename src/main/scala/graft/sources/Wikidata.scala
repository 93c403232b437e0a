package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Wikidata dump ingestion (ref sift/corpora/wikidata.py:14-76):
  *
  *  - S5: the dump is one JSON array with one item per line, bracketed by
  *    `[` / `]` lines and trailing commas — scan with the `text` source,
  *    drop brackets, strip the comma, `from_json` with an explicit schema
  *    (schema-on-read; never inference).
  *  - F14/F15: claim traversal and null-safe nested path navigation are
  *    column expressions over the typed schema; the polymorphic
  *    `datavalue` stays a raw JSON string (the parser captures nested
  *    JSON verbatim for STRING fields) navigated with `get_json_object`.
  *  - J4: statements ⋈ predicate labels (inner, broadcast-able).
  *  - J5: wikibase-item values ⟕ entity labels + raw-value fallback
  *    (only item-valued statements join — the ref's int-keyed join has
  *    the same effect).
  *
  * Output: one row per enwiki-linked entity with its relation entries
  * sorted by (predicate, value) — deterministic where the ref's
  * `dict`-collapse was arbitrary-order.
  */
object Wikidata {

  val itemSchema: StructType = StructType.fromDDL(
    "id STRING, " +
      "labels MAP<STRING, STRUCT<value STRING>>, " +
      "sitelinks MAP<STRING, STRUCT<title STRING>>, " +
      "claims MAP<STRING, ARRAY<STRUCT<mainsnak STRUCT<" +
      "snaktype STRING, datatype STRING, datavalue STRING>>>>")

  /** S5 scan → typed items. */
  def items(s: SparkSession, path: String): DataFrame =
    s.read.text(path)
      .select(trim(col("value")).as("line"))
      .filter(col("line") =!= "[" && col("line") =!= "]" &&
        length(col("line")) > 0)
      .select(from_json(regexp_replace(col("line"), ",$", ""), itemSchema)
        .as("it"))
      .select("it.*")
      .filter(col("id").isNotNull)

  /** F15: null-safe nested label path. */
  private def enLabel = col("labels").getItem("en").getField("value")

  /** Relations per enwiki-linked entity (J4 + J5 + F14). */
  def relations(s: SparkSession, path: String): DataFrame = {
    val it = items(s, path)

    val entityLabels = it.filter(col("id").startsWith("Q"))
      .select(expr("cast(substring(id, 2) as bigint)").as("num"),
        enLabel.as("vlabel"))
      .filter(col("vlabel").isNotNull)

    val predicateLabels = it.filter(col("id").startsWith("P"))
      .select(col("id").as("pid"), enLabel.as("plabel"))
      .filter(col("plabel").isNotNull)

    val wikiEntities = it.filter(col("id").startsWith("Q"))
      .select(col("sitelinks").getItem("enwiki").getField("title").as("eid"),
        col("claims"))
      .filter(col("eid").isNotNull)

    // F14: claims{pid: [statements]} → one row per value-bearing statement,
    // value extracted by datatype.
    val statements = wikiEntities
      .select(col("eid"), explode(col("claims")).as(Seq("pid", "sts")))
      .select(col("eid"), col("pid"), explode(col("sts")).as("st"))
      .select(col("eid"), col("pid"), col("st.mainsnak").as("snak"))
      .filter(col("snak.snaktype") === "value")
      .select(col("eid"), col("pid"), col("snak.datatype").as("datatype"),
        when(col("snak.datatype") === "wikibase-item",
          get_json_object(col("snak.datavalue"), "$.value.numeric-id"))
          .when(col("snak.datatype") === "time",
            get_json_object(col("snak.datavalue"), "$.value.time"))
          .when(col("snak.datatype").isin("string", "url"),
            get_json_object(col("snak.datavalue"), "$.value"))
          .as("value"))
      .filter(col("value").isNotNull)

    // J4: predicate labels (inner join, small side broadcast-able).
    val labeled = statements
      .join(broadcast(predicateLabels), Seq("pid"))

    // J5: value labels for item-valued statements, raw value fallback.
    // No broadcast hint here: the entity-label table is the FULL item set
    // (~10⁸ rows on real Wikidata) — this must stay a shuffle join unless
    // AQE proves it small; only the predicate table (10⁴ properties) is
    // safely broadcast above.
    val valKey = when(col("datatype") === "wikibase-item",
      col("value").cast("long"))
    labeled.withColumn("vk", valKey)
      .join(entityLabels, col("vk") === col("num"), "left_outer")
      .select(col("eid"),
        struct(col("plabel").as("predicate"),
          coalesce(col("vlabel"), col("value")).as("value")).as("rel"))
      .groupBy("eid")
      .agg(expr("array_sort(collect_list(rel))").as("relations"))
  }
}
