package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Geospatial radius join via grid blocking: candidate pairs meet only
  * inside a 3×3 neighborhood of coarse lat/lon cells, then verify with
  * the exact haversine distance — the same blocking philosophy as the
  * LSH/segment joins (bound the pair space by construction, verify
  * exactly), applied to coordinates.
  *
  * Scale contract: each left point maps to ONE cell key, each right
  * point replicates to its 9 neighbor cells (a constant ×9, not a
  * blow-up), the join is an equi-join on the cell key, and the
  * per-cell pair count is bounded by point density × cell area —
  * never |L|×|R|. Skewed hot cells (a city) are the `ops/Skew`
  * salting case, orthogonal here.
  *
  * Correctness bound: with `cellDeg` ≥ the radius expressed in
  * degrees along BOTH axes at every data latitude, any pair within
  * `radiusKm` falls in adjacent cells, so recall is exact. One degree
  * of latitude ≈ 110.57 km everywhere; one degree of longitude ≈
  * 111.32·cos(lat) km, so the caller must size `cellDeg` for the
  * highest |lat| in the data (e.g. radius/55.66 covers |lat| ≤ 60°).
  * No longitude wrap-around handling — data within (−180+cellDeg,
  * 180−cellDeg) as the driver tables here are.
  *
  * Determinism note: the ≤ radius verify compares an IEEE double
  * computed through libm sin/cos/asin, which may differ by ~1 ulp
  * between engines — a pair sitting within an ulp of the radius could
  * classify differently. Gate thresholds follow the repo's
  * transcendental convention (chosen off such boundaries; the
  * synthetic-coordinate probability of a boundary pair is ~1e-16 per
  * candidate).
  */
object Geo {

  /** Mean-earth-radius haversine distance in km, as one fixed SQL
    * expression over degree-valued columns (identical IEEE chain in
    * the DuckDB twin).
    */
  def haversineSql(lat1: String, lon1: String, lat2: String,
      lon2: String): String = {
    val sdlat = s"sin(radians(($lat2) - ($lat1)) / 2.0D)"
    val sdlon = s"sin(radians(($lon2) - ($lon1)) / 2.0D)"
    s"2.0D * 6371.0088D * asin(sqrt($sdlat * $sdlat + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * $sdlon * $sdlon))"
  }

  /** All (left, right) pairs within `radiusKm`, with the distance.
    * `left`/`right` need (key, lat, lon) columns named per the
    * parameters; output (l_key, r_key, dist_km rounded(,6)).
    */
  def radiusJoin(left: DataFrame, lKey: String, right: DataFrame,
      rKey: String, radiusKm: Double, cellDeg: Double): DataFrame = {
    require(radiusKm > 0 && cellDeg > 0, "radius and cell must be positive")
    val lc = left.select(col(lKey).as("l_key"),
      col("lat").as("l_lat"), col("lon").as("l_lon"),
      floor(col("lat") / cellDeg).as("cx"),
      floor(col("lon") / cellDeg).as("cy"))
    val rc = right.select(col(rKey).as("r_key"),
      col("lat").as("r_lat"), col("lon").as("r_lon"),
      explode(expr("sequence(-1, 1)")).as("dx"),
      col("lat"), col("lon"))
      .select(col("r_key"), col("r_lat"), col("r_lon"),
        (floor(col("lat") / cellDeg) + col("dx")).as("cx"),
        explode(expr("sequence(-1, 1)")).as("dy"), col("lon"))
      .select(col("r_key"), col("r_lat"), col("r_lon"), col("cx"),
        (floor(col("lon") / cellDeg) + col("dy")).as("cy"))
    lc.join(rc, Seq("cx", "cy"))
      .withColumn("dist_km",
        expr(haversineSql("l_lat", "l_lon", "r_lat", "r_lon")))
      .filter(col("dist_km") <= radiusKm)
      .select(col("l_key"), col("r_key"), round(col("dist_km"), 6)
        .as("dist_km"))
  }
}
