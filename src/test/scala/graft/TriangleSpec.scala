package graft
// (kCore tests live at the bottom of this suite — same graph family)

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

  test("kCore peels a path tail in a cascade, keeps the clique") {
    val s = spark; import s.implicits._
    // K4 clique (deg 3 each) + tail 5-6 with 6-1: k=2 peels 5 (deg 1,
    // round 1) then 6 (deg 1 after, round 2); clique untouched.
    val edges = Seq("1" -> "2", "1" -> "3", "1" -> "4", "2" -> "3",
      "2" -> "4", "3" -> "4", "5" -> "6", "6" -> "1")
      .toDF("src", "dst")
    val out = Graph.kCore(edges, 2, 3).orderBy("node")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq == Seq("1" -> 3L, "2" -> 3L, "3" -> 3L, "4" -> 3L))
    // too few rounds leaves the cascade unfinished: after 1 round node
    // 6 still dangles (its peel needs round 2)
    val partial = Graph.kCore(edges, 2, 1).orderBy("node")
      .collect().map(_.getString(0))
    assert(partial.contains("6"))
  }

  test("labelPropagation: two cliques keep distinct communities " +
      "across a bridge; deterministic under repartitioning") {
    val s = spark; import s.implicits._
    val cliques = (for {
      x <- 1 to 4; y <- (x + 1) to 4
    } yield Seq((s"a$x", s"a$y"), (s"b$x", s"b$y"))).flatten ++
      Seq(("a1", "b1"))
    val edges = cliques.toDF("src", "dst")
    def run(parts: Int) = Graph
      .labelPropagation(edges.repartition(parts), 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val m = run(3)
    // every a-node shares one label; every b-node shares another;
    // the single bridge edge cannot merge them
    val aLbls = (1 to 4).map(i => m(s"a$i")).distinct
    val bLbls = (1 to 4).map(i => m(s"b$i")).distinct
    assert(aLbls.length == 1 && bLbls.length == 1 && aLbls != bLbls,
      m.toString)
    assert(run(7) == m)
  }

  test("kCore is idempotent past convergence and drops everything " +
      "when k exceeds the max degree") {
    val s = spark; import s.implicits._
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    val a = Graph.kCore(edges, 2, 2).orderBy("node").collect().map(_.toSeq)
    val b = Graph.kCore(edges, 2, 5).orderBy("node").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq && a.length == 3)
    assert(Graph.kCore(edges, 3, 3).count() == 0L)
  }

  test("assortativity: star is exactly −1, path P4 is −0.5, " +
      "degree-regular graphs read null") {
    // star K1,3: every edge joins deg 3 to deg 1 → r = −1
    val star = Graph.assortativity(
      edges(("h", "a"), ("h", "b"), ("h", "c"))).collect().head
    assert(star.getLong(0) === 3L && star.getDouble(1) === -1.0)
    // path a-b-c-d: directed pairs (1,2)(2,1)(2,2)(2,2)(2,1)(1,2)
    // → cov = 6·16 − 100 = −4, var = 8 → r = −0.5
    val path = Graph.assortativity(
      edges(("a", "b"), ("b", "c"), ("c", "d"))).collect().head
    assert(path.getLong(0) === 3L && path.getDouble(1) === -0.5)
    // cycle: all degrees 2 → zero variance → null, not NaN
    val cyc = Graph.assortativity(
      edges(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")))
      .collect().head
    assert(cyc.getLong(0) === 4L && cyc.isNullAt(1))
  }

  test("modularity: hand-computed two-clique split; all-one-community " +
      "zero; unlabeled endpoints drop") {
    val s = spark; import s.implicits._
    // two K4s + one bridge: m = 13; per clique e_c = 6, deg_c = 13
    // (12 internal half-edges + the bridge end) ⇒ dq = (4·13·6 − 169)
    // / (4·169) = 143/676 per side, Q = 286/676 = 0.423077
    val cliques = (for {
      x <- 1 to 4; y <- (x + 1) to 4
    } yield Seq((s"a$x", s"a$y"), (s"b$x", s"b$y"))).flatten ++
      Seq(("a1", "b1"))
    val e = cliques.toDF("src", "dst")
    val twoWay = (1 to 4).flatMap(i =>
      Seq((s"a$i", "A"), (s"b$i", "B"))).toDF("node", "lbl")
    val out = Graph.modularity(e, twoWay).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out === Seq(("A", 4L, 6L, 13L, 0.211538),
      ("B", 4L, 6L, 13L, 0.211538)))
    // everything in one community: Q = m/m − (2m/2m)² = 0
    val oneWay = ((1 to 4).map(i => s"a$i") ++ (1 to 4).map(i => s"b$i"))
      .map((_, "X")).toDF("node", "lbl")
    assert(Graph.modularity(e, oneWay).collect()
      .map(_.getDouble(4)).toSeq === Seq(0.0))
    // an edge to an unlabeled node contributes nothing anywhere
    val withStray = e.unionByName(Seq(("a1", "zzz")).toDF("src", "dst"))
    assert(Graph.modularity(withStray, twoWay).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toSeq ===
      Seq(("A", 0.211538), ("B", 0.211538)))
  }
}
