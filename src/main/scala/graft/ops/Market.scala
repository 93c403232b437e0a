package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket association mining and item-based collaborative
  * filtering — the two classic co-occurrence recommenders a 100 TB
  * transaction log is mined with (engine capability beyond the
  * reference's corpus operators, in the same family as the entity
  * co-mention models in `ops/LinkModels.scala`).
  *
  * Scale contract: both operators generate candidate pairs by a
  * SELF-JOIN on the grouping key (basket / user), which is QUADRATIC
  * in the per-key item count. That is the one hazard at scale, and
  * both operators bound it explicitly up front — `basketRules` drops
  * baskets wider than `maxBasket`, `itemNeighbors` truncates each
  * user's history to `maxPerUser` items — so the pair volume is
  * ≤ Σ min(|key|, cap)² regardless of skew. Everything downstream is
  * hash aggregation on the pair key plus one broadcast-sized join
  * against the per-item count table. No global sort; the only
  * ordered step is the final top-k, which is per-item (window over
  * the pair aggregate) or a TakeOrdered limit.
  */
object Market {

  /** Pairwise association rules A→B over baskets: for every DIRECTED
    * item pair co-occurring in ≥ `minPairCount` baskets,
    *
    *   support    = n_both / N          (fraction of all baskets)
    *   confidence = n_both / n_A        (P(B in basket | A in basket))
    *   lift       = confidence / (n_B / N)
    *
    * where N is the count of baskets SURVIVING the width cap: dropped
    * baskets contribute neither pairs nor item counts nor the
    * denominator, so the three measures stay mutually consistent
    * (lift = n_both·N / (n_A·n_B) exactly).
    *
    * Baskets wider than `maxBasket` items are dropped whole (the
    * standard quadratic-blowup guard: a single 10⁵-item basket would
    * otherwise emit 10¹⁰ pairs). Output is the top `k` rules by
    * (lift, antecedent, consequent) — lift compared on the same
    * 6-decimal rounding the output carries, so the cut is total-ordered
    * and deterministic.
    *
    * Input: `df(basketCol, itemCol)`; duplicates within a basket are
    * collapsed first (presence, not multiplicity, is what association
    * rules count).
    */
  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2L, maxBasket: Int = 64, k: Int = 50)
      : DataFrame = {
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("b").isNotNull && col("i").isNotNull).distinct()
    val sized = items.withColumn("__w",
      count(lit(1)).over(Window.partitionBy("b")))
      .where(col("__w") <= maxBasket).drop("__w")
    val nBaskets = sized.agg(countDistinct("b").as("n_baskets"))
    val itemCounts = sized.groupBy(col("i").as("item"))
      .agg(count(lit(1)).as("n_item"))
    // Candidate prune BEFORE the quadratic step (the a-priori downward-
    // closure bound): n_both ≤ min(n_A, n_B), so a pair surviving the
    // minPairCount filter needs BOTH endpoints in ≥ minPairCount
    // baskets — semi-joining frequent items into the self-join shrinks
    // the pair space with the answer provably unchanged. On the r9 50×
    // soak the unpruned join pushed a 210 M-pair aggregate; long-tail
    // items (the bulk of a power-law catalog) never enter it now.
    // itemCounts / nBaskets stay computed over the UNPRUNED capped set:
    // the prune affects candidate generation only, not the measures.
    val frequent = itemCounts.where(col("n_item") >= minPairCount)
      .select(col("item").as("i"))
    val pruned = sized.join(frequent, "i")
    val pairs = pruned.as("a")
      .join(pruned.as("c"), col("a.b") === col("c.b") &&
        col("a.i") =!= col("c.i"))
      .groupBy(col("a.i").as("antecedent"), col("c.i").as("consequent"))
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minPairCount)
    pairs
      .join(itemCounts.withColumnRenamed("n_item", "n_ante"),
        col("antecedent") === col("item")).drop("item")
      .join(itemCounts.withColumnRenamed("n_item", "n_cons"),
        col("consequent") === col("item")).drop("item")
      .crossJoin(broadcast(nBaskets))
      .withColumn("support",
        round(col("n_both").cast("double") / col("n_baskets"), 6))
      .withColumn("confidence",
        round(col("n_both").cast("double") / col("n_ante"), 6))
      // n_ante × n_cons multiplies in DOUBLE: the long×long product
      // wraps silently in non-ANSI Spark once per-item counts pass
      // ~3e9 — plausible at the 100 TB scale this object documents —
      // corrupting lift and the top-k cut (ADVICE r9).
      .withColumn("lift", round(col("n_both").cast("double") *
        col("n_baskets") / (col("n_ante").cast("double") *
          col("n_cons")), 6))
      .select("antecedent", "consequent", "n_both", "support",
        "confidence", "lift")
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(k)
  }

  /** Item-based collaborative filtering: cosine similarity between
    * items over the binary user×item matrix,
    *
    *   sim(i, j) = |U_i ∩ U_j| / sqrt(|U_i| · |U_j|),
    *
    * reported as each item's top `k` neighbors. Each user's item set
    * is first truncated to its `maxPerUser` smallest item ids — a
    * DETERMINISTIC stand-in for the recency/weight ranking a
    * production recommender caps history with; the cap is what keeps
    * the per-user pair fan-out ≤ maxPerUser², the classic guard
    * against power-law users turning the self-join quadratic.
    *
    * Neighbor ranking compares the same 6-decimal rounding the output
    * carries (ties broken by neighbor id), so the per-item cut is
    * total-ordered. Input: `df(userCol, itemCol)`.
    */
  def itemNeighbors(df: DataFrame, userCol: String, itemCol: String,
      maxPerUser: Int = 15, k: Int = 10): DataFrame = {
    val ui = df.select(col(userCol).as("u"), col(itemCol).as("i"))
      .where(col("u").isNotNull && col("i").isNotNull).distinct()
      .withColumn("__r", row_number().over(
        Window.partitionBy("u").orderBy("i")))
      .where(col("__r") <= maxPerUser).drop("__r")
    val itemCounts = ui.groupBy(col("i").as("item"))
      .agg(count(lit(1)).as("n_item"))
    // Undirected pair counts (i < j), then emitted in both directions —
    // half the join output of the unordered a≠b form for the same info.
    val pairs = ui.as("a")
      .join(ui.as("c"), col("a.u") === col("c.u") &&
        col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("i"), col("c.i").as("j"))
      .agg(count(lit(1)).as("n_both"))
    val directed = pairs.select(col("i"), col("j"), col("n_both"))
      .unionAll(pairs.select(col("j").as("i"), col("i").as("j"),
        col("n_both")))
    directed
      .join(itemCounts.withColumnRenamed("n_item", "n_i"),
        col("i") === col("item")).drop("item")
      .join(itemCounts.withColumnRenamed("n_item", "n_j"),
        col("j") === col("item")).drop("item")
      .withColumn("cosine", round(col("n_both") /
        sqrt(col("n_i").cast("double") * col("n_j")), 6))
      .withColumn("__rk", row_number().over(Window.partitionBy("i")
        .orderBy(col("cosine").desc, col("j"))))
      .where(col("__rk") <= k)
      .select(col("i").as("item"), col("j").as("neighbor"),
        col("n_both"), col("cosine"), col("__rk").as("rank"))
  }
}
