package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Rank, Skew}

/** Exact distributed quantiles (Rank.exactQuantiles) and the salted
  * join (Skew.saltedJoin): correctness vs brute force, partitioning
  * invariance, and the salt machinery in the plan.
  */
class QuantileSkewSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  test("exactQuantiles picks the value at ceil(q*N) under the total order") {
    val s = spark; import s.implicits._
    // values 1..100 shuffled; ceil(0.5*100)=50 -> value 50.0
    val df = scala.util.Random.shuffle((1 to 100).toList)
      .zipWithIndex.map { case (v, i) => (v.toDouble, i.toLong) }
      .toDF("v", "id").repartition(7)
    val qs = Rank.exactQuantiles(df, "v", Seq(asc("id")),
      Seq(0.25, 0.5, 1.0), numPartitions = 5)
      .orderBy("q").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(qs === Array((0.25, 25.0), (0.5, 50.0), (1.0, 100.0)))
  }

  test("exactQuantiles is invariant under repartitioning with ties") {
    val s = spark; import s.implicits._
    val rows = (1 to 500).map(i => ((i % 13).toDouble, i.toLong))
    val a = Rank.exactQuantiles(rows.toDF("v", "id").repartition(3),
      "v", Seq(asc("id")), Seq(0.1, 0.5, 0.9), numPartitions = 4)
      .orderBy("q").collect().map(_.toSeq)
    val b = Rank.exactQuantiles(rows.reverse.toDF("v", "id").repartition(11),
      "v", Seq(asc("id")), Seq(0.1, 0.5, 0.9), numPartitions = 9)
      .orderBy("q").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("sampleQuantiles lands within the sampling rank-error bound " +
      "and replays deterministically under repartitioning") {
    val s = spark; import s.implicits._
    // values 1..10000: true q-quantile is q*10000. k=1000 => rank
    // error ~±3/sqrt(1000) ≈ ±10% worst-case; assert a loose ±8%
    // absolute-value band (uniform values make rank error = value
    // error) and exact replay invariance.
    val df = (1 to 10000).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
    def run(parts: Int) = Rank.sampleQuantiles(
      df.repartition(parts), "v", col("id"), Seq(asc("id")),
      1000, Seq(0.25, 0.5, 0.9))
      .orderBy("q").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val a = run(3)
    for ((q, v) <- a)
      assert(math.abs(v - q * 10000) < 800, s"q=$q v=$v")
    assert(run(11).toSeq === a.toSeq)
  }

  test("exactQuantiles target rank is the exact ceil(q*N), not IEEE") {
    val s = spark; import s.implicits._
    // fl(0.07*100) = 7.000...001, whose ceil is 8 — the decimal product
    // must yield the true 7th value instead
    val df = (1 to 100).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
    val out = Rank.exactQuantiles(df, "v", Seq(asc("id")), Seq(0.07))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out === Array((0.07, 7.0)))
  }

  test("exactQuantiles rejects out-of-range q") {
    val s = spark; import s.implicits._
    val df = Seq((1.0, 1L)).toDF("v", "id")
    intercept[IllegalArgumentException] {
      Rank.exactQuantiles(df, "v", Seq(asc("id")), Seq(0.0))
    }
  }

  test("saltedJoin equals the plain join, inner and left_outer") {
    val s = spark; import s.implicits._
    val probe = (1 to 200).map(i => (i.toLong, (i % 5).toLong))
      .toDF("id", "k").repartition(6)
    // key 9 exists only on the probe side (left_outer null case)
    val probeP = probe.union(Seq((999L, 9L)).toDF("id", "k"))
    val build = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "tag")
    for (jt <- Seq("inner", "left_outer")) {
      val salted = Skew.saltedJoin(probeP, build, Seq("k"), col("id"), 8, jt)
        .orderBy("id").collect().map(_.toSeq)
      val plain = probeP.join(build, Seq("k"), jt)
        .select("id", "k", "tag").orderBy("id").collect().map(_.toSeq)
      // column order: saltedJoin keeps join-key first like the plain form
      assert(salted.map(_.toSet).toSeq === plain.map(_.toSet).toSeq, jt)
    }
  }

  test("saltedJoin plan replicates the build side via explode") {
    val s = spark; import s.implicits._
    val probe = Seq((1L, 1L)).toDF("id", "k")
    val build = Seq((1L, "a")).toDF("k", "tag")
    val plan = Skew.saltedJoin(probe, build, Seq("k"), col("id"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"), s"no salt expansion:\n$plan")
  }
}
