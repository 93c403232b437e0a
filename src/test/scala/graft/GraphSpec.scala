package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graph

/** Integer fixed-point PageRank (graft.ops.Graph): hand-computed
  * fixtures, partitioning independence, and the TextRank word graph.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def edgesDf(rows: (String, String, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst", "w")
  }

  private def nodesDf(ns: String*) = {
    val s = spark; import s.implicits._
    ns.toDF("node")
  }

  test("pageRank matches the hand-unrolled integer recurrence") {
    // a -> b (w 1), b -> a (w 1), isolated c.
    val r1 = Graph.pageRank(nodesDf("a", "b", "c"),
      edgesDf(("a", "b", 1L), ("b", "a", 1L)), iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // contrib a->b = 1000000*1 div 1 = 1000000; rank = 150000 + 85*1e6 div 100
    assert(r1("a") === 1000000L)
    assert(r1("b") === 1000000L)
    assert(r1("c") === 150000L) // teleport floor, no inlinks
  }

  test("pageRank splits mass by weight with truncating division") {
    // a -> b (w 2), a -> c (w 1): W(a)=3.
    val r = Graph.pageRank(nodesDf("a", "b", "c"),
      edgesDf(("a", "b", 2L), ("a", "c", 1L)), iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // contrib to b = (1e6*2) div 3 = 666666 -> 150000 + 85*666666 div 100
    assert(r("b") === 150000L + (85L * 666666L) / 100L)
    assert(r("c") === 150000L + (85L * 333333L) / 100L)
    assert(r("a") === 150000L) // dangling mass dropped; no inlinks
  }

  test("personalizedPageRank: teleport lands only on seeds; " +
    "unreached nodes stay at zero") {
    val s = spark; import s.implicits._
    // a -> b -> c chain; seed = a. r0: a=1e6, b=c=0.
    val seeds = Seq("a").toDF("node")
    val r1 = Graph.personalizedPageRank(nodesDf("a", "b", "c"),
      edgesDf(("a", "b", 1L), ("b", "c", 1L)), seeds, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // round 1: a = teleport 150000 (seed, no inlinks);
    // b = 0 + 85*(1e6*1 div 1) div 100 = 850000; c = 0 (b had rank 0)
    assert(r1 === Map("a" -> 150000L, "b" -> 850000L, "c" -> 0L))
    val r2 = Graph.personalizedPageRank(nodesDf("a", "b", "c"),
      edgesDf(("a", "b", 1L), ("b", "c", 1L)), seeds, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // round 2: a = 150000; b = 85*150000 div 100 = 127500;
    // c = 85*850000 div 100 = 722500
    assert(r2 === Map("a" -> 150000L, "b" -> 127500L, "c" -> 722500L))
  }

  test("personalizedPageRank is invariant under repartitioning and " +
    "ranks seed-adjacent nodes above distant ones at equilibrium") {
    val s = spark; import s.implicits._
    val nodes = nodesDf("a", "b", "c", "d", "e")
    val edges = edgesDf(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L),
      ("c", "d", 1L), ("d", "e", 1L), ("e", "c", 2L))
    val seeds = Seq("a").toDF("node")
    val base = Graph.personalizedPageRank(nodes, edges, seeds, iters = 8)
      .orderBy("node").collect().map(_.toSeq)
    val shuf = Graph.personalizedPageRank(nodes.repartition(7),
        edges.repartition(5), seeds.repartition(2), iters = 8)
      .orderBy("node").collect().map(_.toSeq)
    assert(base.toSeq === shuf.toSeq)
    val m = base.map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
    // b (adjacent to the seed) outranks d (two+ hops out)
    assert(m("b") > m("d"))
  }

  test("pageRank is invariant under repartitioning") {
    val nodes = nodesDf("a", "b", "c", "d", "e")
    val edges = edgesDf(("a", "b", 3L), ("b", "c", 1L), ("c", "a", 2L),
      ("d", "a", 1L), ("a", "d", 1L), ("e", "a", 7L))
    val base = Graph.pageRank(nodes, edges, iters = 6)
      .orderBy("node").collect().map(_.toSeq)
    val shuffled = Graph.pageRank(nodes.repartition(7), edges.repartition(5),
      iters = 6).orderBy("node").collect().map(_.toSeq)
    assert(base.toSeq === shuffled.toSeq)
  }

  test("wordGraph counts directed bigrams and drops self-loops") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "the cat cat sat"), (2L, "the cat"), (3L, "solo"))
      .toDF("doc_id", "text")
    val e = Graph.wordGraph(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(e(("the", "cat")) === 2L)
    assert(e(("cat", "sat")) === 1L)
    assert(!e.contains(("cat", "cat"))) // self-loop dropped
    assert(e.size === 2)
  }

  test("non-positive edge weights fail loudly at edge pinning") {
    val e = intercept[Exception] {
      Graph.pageRank(nodesDf("a", "b"),
        edgesDf(("a", "b", 0L)), iters = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must be positive")), e.getMessage)
  }

  test("pageRankConverged reaches the fixed-iteration fixpoint") {
    val nodes = nodesDf("a", "b", "c", "d")
    val edges = edgesDf(("a", "b", 1L), ("b", "c", 2L), ("c", "a", 1L),
      ("c", "d", 1L), ("d", "c", 3L))
    val conv = Graph.pageRankConverged(nodes, edges, tol = 16L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a long fixed run has fully mixed; converged must agree within tol
    val fixed = Graph.pageRank(nodes, edges, iters = 40)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((n, v) <- fixed)
      assert(math.abs(conv(n) - v) <= 16L, s"node $n: ${conv(n)} vs $v")
  }

  test("connectedComponents labels each node with its smallest member") {
    val s = spark; import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 7L))
      .toDF("src", "dst")
    val comp = Graph.connectedComponents(edges).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("bfs distances: nearest source wins, bound truncates") {
    // path a-b-c-d-e-f plus source z attached at e: distances from
    // {a, z} within 3 hops; f is 1 from z via e? no — z-e edge, f-e
    // edge: f is 2 via z-e-f
    val e = edgesDf(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
      ("d", "e", 1L), ("e", "f", 1L), ("z", "e", 1L))
      .select("src", "dst")
    val out = Graph.bfsDistances(e, nodesDf("a", "z"), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 0L, "z" -> 0L, "b" -> 1L, "e" -> 1L,
      "c" -> 2L, "d" -> 2L, "f" -> 2L))
    // d is 3 from a but 2 from z through e: nearest-source wins ✓ (2)
    // rounds=1 truncates: only the 1-hop ball
    val one = Graph.bfsDistances(e, nodesDf("a"), 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one === Map("a" -> 0L, "b" -> 1L))
  }

  test("bfs distances: a source off the graph stays at distance 0") {
    val e = edgesDf(("a", "b", 1L)).select("src", "dst")
    val out = Graph.bfsDistances(e, nodesDf("q"), 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("q" -> 0L))
  }

  test("textRank ranks hub tokens above leaf tokens") {
    val s = spark; import s.implicits._
    // 'hub' receives links from every other token; leaves only from hub.
    val docs = Seq((1L, "x hub y hub z hub x hub"), (2L, "q hub r hub"))
      .toDF("doc_id", "text")
    val r = Graph.textRank(docs, iters = 5)
      .orderBy(desc("rank"), asc("node")).collect()
    assert(r.head.getString(0) === "hub")
  }

  test("linkPrediction: AA weighting prefers rare shared neighbors") {
    // x and y share z1 (deg 2) and z2 (deg 2); p and q share only hub h
    // (deg 4). AA(x,y) = 2/ln 2 > AA(p,q) = 1/ln 4; no pair is adjacent.
    val e = edgesDf(
      ("x", "z1", 1L), ("y", "z1", 1L),
      ("x", "z2", 1L), ("y", "z2", 1L),
      ("p", "h", 1L), ("q", "h", 1L), ("r", "h", 1L), ("s", "h", 1L))
      .select("src", "dst")
    val out = Graph.linkPrediction(e, maxDegree = 10L, k = 50)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("x", "y")) === ((2L, math.rint(2.0 / math.log(2) * 1e6) / 1e6)))
    // the hub pair family: each of p,q,r,s pairs via h with AA 1/ln 4
    assert(out(("p", "q"))._2 === math.rint(1.0 / math.log(4) * 1e6) / 1e6)
  }

  test("hits: integer micro-unit scores, exact 3-round replay on a " +
      "known hub/authority graph") {
    // h1,h2 point at both authorities, h3 only at a1: a1 must out-rank
    // a2, h1 == h2 (symmetric) must out-rank h3, and the exact values
    // are the hand-unrolled truncating-integer iteration
    val e = edgesDf(("h1", "a1", 1L), ("h1", "a2", 1L),
      ("h2", "a1", 1L), ("h2", "a2", 1L), ("h3", "a1", 1L))
    val out = Graph.hits(e, iters = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // round 1: a'=(3e6, 2e6) /3 -> (1000000, 666666);
    //          h'=(1666666, 1666666, 1000000) /1 (mx<2e6)
    // round 2: a'=(4333332, 3333332) /4 -> (1083333, 833333);
    //          h'=(1916666, 1916666, 1083333) /1
    // round 3: a'=(4916665, 3833332) /4 -> (1229166, 958333);
    //          h'=(2187499, 2187499, 1229166) /2 -> (1093749, 1093749,
    //          614583)
    assert(out("a1") === ((1229166L, 0L)))
    assert(out("a2") === ((958333L, 0L)))
    assert(out("h1") === ((0L, 1093749L)))
    assert(out("h2") === ((0L, 1093749L)))
    assert(out("h3") === ((0L, 614583L)))
  }

  test("hits rejects non-positive edge weights loudly") {
    val e = edgesDf(("a", "b", 0L))
    val ex = intercept[Exception] {
      Graph.hits(e, iters = 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("katz: hand-unrolled two rounds on a weighted chain; " +
    "sources keep the base score") {
    // a→b (w=1), b→c (w=2), α = 1/5:
    // r1: a=1e6, b=1e6+1e6/5=1.2e6, c=1e6+2e6/5=1.4e6
    // r2: a=1e6, b=1.2e6, c=1e6+(1.2e6·2)/5=1.48e6
    val out = Graph.katz(edgesDf(("a", "b", 1L), ("b", "c", 2L)),
      rounds = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq === Seq(("a", 1000000L), ("b", 1200000L),
      ("c", 1480000L)))
  }

  test("katz rejects non-positive edge weights loudly") {
    val ex = intercept[Exception] {
      Graph.katz(edgesDf(("a", "b", 0L)), rounds = 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("linkPrediction: adjacent pairs and capped hubs are excluded") {
    // x—y are DIRECTLY connected and also share z → must not appear;
    // hub h (deg 3 > cap 2) is no wedge center, so (p,q) disappears
    val e = edgesDf(
      ("x", "y", 1L), ("x", "z", 1L), ("y", "z", 1L),
      ("p", "h", 1L), ("q", "h", 1L), ("r", "h", 1L))
      .select("src", "dst")
    val out = Graph.linkPrediction(e, maxDegree = 2L, k = 50)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!out.contains(("x", "y")))
    assert(!out.contains(("p", "q")))
    // x and y still pair THROUGH z? no — they are adjacent. But p/r
    // share nothing outside h. The only survivors go through deg≤2
    // centers: x,z,y wedges give (x,y) (excluded). Empty output.
    assert(out.isEmpty)
  }
}
