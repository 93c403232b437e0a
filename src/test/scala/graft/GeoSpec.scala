package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Geo

/** Geo.radiusJoin: haversine correctness, cross-cell recall, radius
  * exclusion.
  */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def pts(name: String, rows: (Long, Double, Double)*) = {
    val s = spark; import s.implicits._
    rows.toDF(name, "lat", "lon")
  }

  test("one equatorial degree of longitude is ~111.19 km") {
    val out = Geo.radiusJoin(
      pts("a", (1L, 0.0, 10.0)), "a",
      pts("b", (2L, 0.0, 11.0)), "b", 120.0, 2.0).collect()
    assert(out.length === 1)
    val d = out.head.getDouble(2)
    assert(math.abs(d - 111.19) < 0.1, s"got $d")
  }

  test("pairs straddling a cell boundary are still found") {
    // points 0.01 deg apart but in different cells (1.99 vs 2.01 with
    // cellDeg 2 → cells 0 and 1): the 3x3 neighborhood must catch it
    val out = Geo.radiusJoin(
      pts("a", (1L, 0.0, 1.99)), "a",
      pts("b", (2L, 0.0, 2.01)), "b", 10.0, 2.0).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(2) < 3.0)
  }

  test("points beyond the radius never pair; duplicates keep keys") {
    val out = Geo.radiusJoin(
      pts("a", (1L, 0.0, 0.0), (3L, 0.0, 0.0)), "a",
      pts("b", (2L, 0.0, 5.0), (4L, 0.1, 0.1)), "b", 50.0, 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // lon 5 deg ≈ 556 km away: excluded; (0.1, 0.1) ≈ 15.7 km: both
    // left duplicates pair with it
    assert(out.toSet === Set((1L, 4L), (3L, 4L)))
  }
}
