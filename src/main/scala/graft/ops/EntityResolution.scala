package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution over a single record table — the full record-
  * linkage flow as one operator (the composition a catalog/CRM dedup
  * actually runs; ref semantics: sift's redirect-canonicalization
  * fixpoint generalized from exact-key to fuzzy-string identity):
  *
  *   1. MATCH: fuzzy self-join ([[Fuzzy.fuzzyJoin]] — PassJoin
  *      segment blocking by default: exact recall at the edit bound
  *      at every string length, candidates bounded by aligned-exact-
  *      substring collisions rather than gram popularity, then
  *      codegen'd levenshtein verify on candidates only);
  *   2. CLUSTER: connected components over the match pairs
  *      ([[Dedup.clusters]] pointer doubling, O(log diameter) rounds);
  *   3. CANONICALIZE: one entity per component — entity_id = the
  *      minimum member key; the canonical record is either that
  *      member's ([[resolve]]) or the QUALITY ARGMAX member's
  *      ([[resolveCanonical]] — best-copy-wins, the same single
  *      max(struct) shape as [[Dedup.canonical]]). Records matching
  *      nothing resolve to themselves via one anti-join
  *      (n_members = 1).
  *
  * Scale shape: no stage ever builds the n² pair space. Matching and
  * clustering run over the DISTINCT-string universe (same-string
  * records are dist-0 duplicates, so record components ARE name
  * components expanded by one equi-join) — blocking, levenshtein,
  * and pointer doubling all cost by distinct strings, not records.
  * Measured on the gated corpus: 21 k records collapse to ~70 name
  * nodes; the record-level formulation this replaced generated
  * 35.2 M candidates under prefix blocking and 75.6 M under segment
  * blocking — both quadratic in duplicate-group size, both gone.
  * Components converge in log rounds, and the canonical attach is
  * one equi-join / one max(struct) aggregate on the entity key.
  */
object EntityResolution {

  /** (entity_id, `key`) membership: matched records labeled by their
    * component's minimum member key, singletons by themselves.
    *
    * Clustering runs at the NAME level: records with equal strings are
    * edit-distance-0 duplicates of one another, so record components
    * are exactly name components expanded through the name→records
    * map. The name node id is the minimum record key carrying that
    * name, which makes the component's min name-node label also the
    * min RECORD key of the entity — record-level pairs (quadratic in
    * duplicate-group size: TPC-H-style parts carry 20 k records over
    * 64 distinct names) never materialize anywhere. */
  private def membership(records: DataFrame, key: String, str: String,
      maxDist: Int, q: Int, blocking: String): DataFrame = {
    val names = records.groupBy(str).agg(min(col(key)).as("__nid"))
    val keyT = "__nid_target" // fuzzyJoin's self-join output suffix
    val edges = Fuzzy
      .fuzzyJoin(names, "__nid", str, names, "__nid", str, maxDist, q,
        blocking)
      .filter(col("__nid") < col(keyT))
      .select(col("__nid").as("doc_a"), col(keyT).as("doc_b"))
    val nameEntity = names
      .join(Dedup.clusters(edges).withColumnRenamed("doc_id", "__nid"),
        Seq("__nid"), "left")
      .select(coalesce(col("cluster"), col("__nid")).as("entity_id"),
        col(str))
    records.select(col(key), col(str))
      .join(nameEntity, Seq(str))
      .select(col("entity_id"), col(key))
  }

  /** @param records one row per record; `key` orderable + unique,
    *               `str` the match string.
    * @return (entity_id, n_members, `str` = canonical string), one row
    *         per resolved entity; the canonical record is the minimum
    *         member's.
    */
  def resolve(records: DataFrame, key: String, str: String,
      maxDist: Int, q: Int = 3, blocking: String = "segment")
      : DataFrame =
    membership(records, key, str, maxDist, q, blocking)
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_members"))
      .join(records.select(col(key).as("entity_id"), col(str)),
        Seq("entity_id"))
      .select("entity_id", "n_members", str)

  /** [[resolve]] with BEST-COPY-WINS canonicalization: the canonical
    * record per entity is the member maximizing `quality` (a
    * non-negative long expression over `records`' columns; ties break
    * on the SMALLER key, packed as max(struct(quality, −key)) so the
    * whole pick is ONE hash aggregate — no window, no self-join).
    * `entity_id` stays the minimum member key (a stable cluster id
    * independent of which copy currently wins).
    *
    * @return (entity_id, canonical_id, n_members, `str`), one row per
    *         entity; `str` is the winning member's string.
    */
  def resolveCanonical(records: DataFrame, key: String, str: String,
      quality: Column, maxDist: Int, q: Int = 3,
      blocking: String = "segment"): DataFrame =
    membership(records, key, str, maxDist, q, blocking)
      .join(records.select(col(key), col(str),
        quality.cast("long").as("__q")), Seq(key))
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("__q"), (-col(key)).as("__nk"),
          col(str).as("__s"))).as("__best"))
      .select(col("entity_id"), (-col("__best.__nk")).as("canonical_id"),
        col("n_members"), col("__best.__s").as(str))
}
