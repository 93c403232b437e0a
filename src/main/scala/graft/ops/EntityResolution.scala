package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution over a single record table — the full record-
  * linkage flow as one operator (the composition a catalog/CRM dedup
  * actually runs; ref semantics: sift's redirect-canonicalization
  * fixpoint generalized from exact-key to fuzzy-string identity):
  *
  *   1. MATCH: fuzzy self-join ([[Fuzzy.fuzzyJoin]] — rarest-q-gram
  *      prefix blocking, exact recall at the edit bound, then
  *      codegen'd levenshtein verify on candidates only);
  *   2. CLUSTER: connected components over the match pairs
  *      ([[Dedup.clusters]] pointer doubling, O(log diameter) rounds);
  *   3. CANONICALIZE: one entity per component — entity_id = the
  *      minimum member key, canonical string = that member's, plus
  *      the member count. Records matching nothing resolve to
  *      themselves via one anti-join (n_members = 1).
  *
  * Scale shape: no stage ever builds the n² pair space — blocking
  * bounds candidates by block co-membership, components converge in
  * log rounds, and the canonical attach is one equi-join on the
  * entity key.
  */
object EntityResolution {

  /** @param records one row per record; `key` orderable + unique,
    *               `str` the match string.
    * @return (entity_id, n_members, `str` = canonical string), one row
    *         per resolved entity.
    */
  def resolve(records: DataFrame, key: String, str: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    val keyT = s"${key}_target" // fuzzyJoin's self-join output suffix
    val edges = Fuzzy
      .fuzzyJoin(records, key, str, records, key, str, maxDist, q)
      .filter(col(key) < col(keyT))
      .select(col(key).as("doc_a"), col(keyT).as("doc_b"))
    val matched = Dedup.clusters(edges)
      .select(col("cluster").as("entity_id"), col("doc_id").as(key))
    val singles = records.select(col(key))
      .join(matched.select(key), Seq(key), "left_anti")
      .select(col(key).as("entity_id"), col(key))
    matched.unionByName(singles)
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_members"))
      .join(records.select(col(key).as("entity_id"), col(str)),
        Seq("entity_id"))
      .select("entity_id", "n_members", str)
  }
}
