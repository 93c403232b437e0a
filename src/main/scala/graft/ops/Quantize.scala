package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (SQ8) embedding quantization — the storage-compression
  * companion to the PQ codebook family in [[Pq]]: each dimension is
  * linearly mapped to one unsigned byte against the corpus-wide
  * per-dimension [min, max] range (the FAISS `ScalarQuantizer` QT_8bit
  * scheme, public knowledge). 64-dim float32 vectors compress 4× with
  * a per-vector reconstruction-MSE report.
  *
  * Scale shape: the range model is ONE (dim → min/max) aggregate over
  * the exploded corpus — `dims` rows, broadcast back into the per-
  * element encode. Codes rebuild per vector with one (vec_id) group.
  * Nothing is driver-side; at 100 TB the range table is still `dims`
  * rows.
  *
  * DETERMINISM: float→double casts are exact; the affine map
  * `floor(((v−mn)/(mx−mn)) * 256)` (clamped to 255) uses floor, not
  * round, so no half-way ties exist; per-element squared errors
  * round(,12) into DECIMAL before the per-vector sum (order-
  * independent), so the DuckDB twin replays codes and MSE exactly.
  */
object Quantize {

  /** Per-vector SQ8 codes + reconstruction MSE. Input needs
    * (`vec_id`, `embedding` array&lt;float&gt;).
    */
  def sq8(emb: DataFrame): DataFrame = {
    val el = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"),
        col("v").cast("double").as("v"))
    val ranges = el.groupBy("dim")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val coded = el.join(broadcast(ranges), "dim")
      .withColumn("q",
        when(col("mx") > col("mn"),
          least(expr("cast(floor(((v - mn) / (mx - mn)) * 256) as bigint)"),
            lit(255L))).otherwise(lit(0L)))
      .withColumn("vhat",
        expr("mn + ((cast(q as double) + 0.5) * (mx - mn)) / 256.0"))
      .withColumn("se",
        expr("cast(round((v - vhat) * (v - vhat), 12) as decimal(24,12))"))
    coded.groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("q"))))
          .as("dq"),
        count(lit(1)).as("dims"),
        round(sum(col("se")).cast("double") / count(lit(1)), 6).as("mse"))
      .select(col("vec_id"),
        expr("transform(dq, x -> x.q)").as("codes"),
        col("dims"), col("mse"))
  }

  /** Rademacher random projection (Achlioptas 2001, "Database-friendly
    * random projections"): reduce `d`-dim embeddings to `k` dims with
    * a deterministic ±1 projection matrix derived from the md5 hash of
    * (plane, dim) — the JL-lemma dimensionality reduction whose matrix
    * never exists materially (each entry recomputes from its
    * coordinates, so there is nothing to broadcast or train).
    *
    * Scale shape: one element explode × k plane replication → one
    * (vec, plane) hash aggregate → one per-vector rebuild. Per-term
    * products round(,9) into DECIMAL before the sum, so accumulation
    * order cannot perturb the result and the DuckDB twin replays the
    * projected vectors exactly (the [[Similarity]] hyperplane-LSH
    * signs use the same hash family; here the projection VALUES are
    * the output, not just their sign).
    */
  def randomProject(emb: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    graft.functions.GraftFunctions.registerAll(emb.sparkSession)
    val el = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"), col("v").cast("double").as("v"))
    val terms = el
      .select(col("vec_id"), col("i"), col("v"),
        explode(expr(s"sequence(0, ${k - 1})")).as("j"))
      .withColumn("sign",
        pmod(Hashing.md5Long(concat(lit("rp|"), col("j").cast("string"),
          lit(","), col("i").cast("string"))), lit(2L)) * 2L - 1L)
      .select(col("vec_id"), col("j"),
        expr("cast(round(v * cast(sign as double), 9) as decimal(20,9))")
          .as("term"))
    terms.groupBy("vec_id", "j")
      .agg(round(sum(col("term")).cast("double") / sqrt(lit(k.toDouble)),
        6).as("y"))
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("j"), col("y")))).as("jy"))
      .select(col("vec_id"), expr("transform(jy, x -> x.y)").as("proj"))
  }
}
