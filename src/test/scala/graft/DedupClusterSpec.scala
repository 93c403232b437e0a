package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Connected-component clustering over near-dup pair lists: the
  * production pointer-doubling path must close long-diameter chains the
  * fixed-hop oracle twin cannot, both must agree wherever the fixed-hop
  * form converges, and the fixed-hop ceiling semantics (diameter ≤ hops
  * accepted, detection round not consumed) must hold exactly.
  */
class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def pairsDf(pairs: (Long, Long)*) = {
    val s = spark; import s.implicits._
    pairs.toSeq.toDF("doc_a", "doc_b")
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap

  test("pointer-doubling closes a planted diameter-32 chain") {
    val chain = pairsDf((0L until 32L).map(i => (i, i + 1)): _*)
    val got = labelMap(Dedup.clusters(chain))
    assert(got == (0L to 32L).map(_ -> 0L).toMap)
  }

  test("fixed-hop form cannot close the diameter-32 chain at hops=4") {
    val chain = pairsDf((0L until 32L).map(i => (i, i + 1)): _*)
    val e = intercept[IllegalArgumentException] {
      Dedup.clustersFixedHop(chain, 4).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("fixed-hop accepts a component of diameter exactly hops") {
    // path 0-1-2-3-4 has diameter 4: four propagation rounds move label 0
    // to node 4, the fifth round detects zero change — hops=4 must accept
    // (the detection round must not consume the ceiling)
    val path = pairsDf((0L until 4L).map(i => (i, i + 1)): _*)
    val got = labelMap(Dedup.clustersFixedHop(path, 4))
    assert(got == (0L to 4L).map(_ -> 0L).toMap)
  }

  test("doubling and fixed-hop agree on a multi-component graph") {
    // two components (one triangle with a tail, one disjoint edge) plus
    // out-of-order ids — representative of real near-dup families
    val pairs = pairsDf(
      (10L, 3L), (3L, 7L), (7L, 10L), (7L, 22L),
      (100L, 90L))
    val a = labelMap(Dedup.clusters(pairs))
    val b = labelMap(Dedup.clustersFixedHop(pairs, 4))
    assert(a == b)
    assert(a == Map(3L -> 3L, 7L -> 3L, 10L -> 3L, 22L -> 3L,
      90L -> 90L, 100L -> 90L))
  }

  test("empty pair list yields an empty cluster table") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.clusters(empty).count() == 0L)
  }
}
