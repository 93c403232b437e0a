package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graph

/** Degree-oriented triangle counting (Graph.triangleCount): known
  * counts on canonical graphs, direction/duplicate immunity, and the
  * hub-safety property the orientation buys.
  */
class TriangleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def edges(es: (String, String)*) = {
    val s = spark; import s.implicits._
    es.toDF("src", "dst")
  }

  private def tri(es: (String, String)*): Long =
    Graph.triangleCount(edges(es: _*)).head().getLong(0)

  test("triangle, square, and K4 count 1, 0, 4") {
    assert(tri("a" -> "b", "b" -> "c", "c" -> "a") === 1L)
    assert(tri("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a") === 0L)
    val k4 = for {
      Seq(x, y) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield x -> y
    assert(tri(k4: _*) === 4L)
  }

  test("edge direction and duplicates do not change the count") {
    assert(tri("b" -> "a", "b" -> "c", "a" -> "c",
      "a" -> "b", "c" -> "b") === 1L)
  }

  test("self-loops are ignored") {
    assert(tri("a" -> "a", "a" -> "b", "b" -> "c", "c" -> "a") === 1L)
  }

  test("star hub has zero triangles; wheel closes them") {
    val star = (1 to 20).map(i => "hub" -> s"v$i")
    assert(tri(star: _*) === 0L)
    // close consecutive spokes: each rim edge makes one triangle
    val wheel = star ++ (1 until 20).map(i => s"v$i" -> s"v${i + 1}")
    assert(tri(wheel: _*) === 19L)
  }
}
