package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hashing

/** KMV distinct sketch (graft.functions.KmvSketch): exact below k,
  * bounded-error estimates above k, merge/partition invariance, and
  * lossless shard union.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def hashed(n: Int, parts: Int = 4) = {
    val s = spark; import s.implicits._
    val df = (1 to n).map(_.toString).toDF("v").repartition(parts)
    Hashing.ensureRegistered(df)
    df.select(expr(Hashing.md5LongSql("v")).as("h"))
  }

  test("below k the sketch is the exact distinct hash set") {
    val ks = hashed(10).agg(expr("graft_kmv(h, 256)").as("ks"))
      .head().getSeq[Long](0)
    val exact = hashed(10).distinct().orderBy("h")
      .collect().map(_.getLong(0)).toSeq
    assert(ks === exact)
  }

  test("set algebra: with k above both set sizes the estimates are exact") {
    val s = spark; import s.implicits._
    // A = 1..60, B = 31..90: |A∪B| = 90, |A∩B| = 30, J = 1/3
    val df = (1 to 90).map(i => (i.toString, i)).toDF("v", "i")
    Hashing.ensureRegistered(df)
    val sk = df.select(expr(Hashing.md5LongSql("v")).as("h"), col("i"))
      .agg(expr("graft_kmv(case when i <= 60 then h end, 256)").as("a"),
        expr("graft_kmv(case when i >= 31 then h end, 256)").as("b"))
      .withColumn("u",
        expr("slice(array_sort(array_distinct(concat(a, b))), 1, 256)"))
      .select(size(col("u")).as("n_u"),
        expr("size(array_intersect(u, array_intersect(a, b)))")
          .as("n_common"))
      .head()
    assert(sk.getInt(0) === 90) // union exact below k
    assert(sk.getInt(1) === 30) // intersection marks exact below k
  }

  test("duplicates do not inflate the sketch") {
    val s = spark; import s.implicits._
    val df = (1 to 50).flatMap(i => Seq.fill(20)(i.toString)).toDF("v")
      .repartition(8)
    Hashing.ensureRegistered(df)
    val ks = df.select(expr(Hashing.md5LongSql("v")).as("h"))
      .agg(expr("graft_kmv(h, 256)").as("ks")).head().getSeq[Long](0)
    assert(ks.size === 50)
    assert(ks === ks.distinct.sorted)
  }

  test("estimate is within 20% of a 2000-cardinality truth at k=256") {
    val ks = hashed(2000, parts = 16)
      .agg(expr("graft_kmv(h, 256)").as("ks")).head().getSeq[Long](0)
    assert(ks.size === 256)
    val kth = ks.last.toDouble
    val est = math.floor(255.0 * 1152921504606846976.0 / kth)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.2, s"est=$est")
  }

  test("sketch is partitioning-invariant (associative merge)") {
    val a = hashed(3000, parts = 1)
      .agg(expr("graft_kmv(h, 64)")).head().getSeq[Long](0)
    val b = hashed(3000, parts = 13)
      .agg(expr("graft_kmv(h, 64)")).head().getSeq[Long](0)
    assert(a === b)
  }

  test("per-shard sketches union losslessly through graft_kmv again") {
    val s = spark; import s.implicits._
    val df = (1 to 1000).map(i => (i % 7, i.toString)).toDF("shard", "v")
      .repartition(8)
    Hashing.ensureRegistered(df)
    val h = df.select(col("shard"), expr(Hashing.md5LongSql("v")).as("h"))
    val merged = h.groupBy("shard").agg(expr("graft_kmv(h, 128)").as("ks"))
      .select(explode(col("ks")).as("h"))
      .agg(expr("graft_kmv(h, 128)")).head().getSeq[Long](0)
    val direct = h.agg(expr("graft_kmv(h, 128)")).head().getSeq[Long](0)
    assert(merged === direct)
  }
}
