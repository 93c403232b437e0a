package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hashing

/** Count-Min frequency sketch (graft.functions.CmsSketch): overcount-only
  * point estimates, partition invariance (element-wise-add merge),
  * lossless shard union, and input validation.
  */
class CmsSketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private val depth = 4
  private val width = 32

  private def rowHashes(key: String) =
    s"transform(sequence(0, ${depth - 1}), i -> " +
      s"graft_md5long(concat(cast(i as string), ':', $key)))"

  /** keys 1..n with key i occurring i times, over `parts` partitions. */
  private def keyed(n: Int, parts: Int = 4) = {
    val s = spark; import s.implicits._
    val df = (1 to n).flatMap(i => Seq.fill(i)(i.toString)).toDF("v")
      .repartition(parts)
    Hashing.ensureRegistered(df)
    df.select(expr(rowHashes("v")).as("hs"))
  }

  private def grid(n: Int, parts: Int = 4): Seq[Long] =
    keyed(n, parts).agg(expr(s"graft_cms(hs, $width)").as("cms"))
      .head().getSeq[Long](0)

  private def estimate(g: Seq[Long], key: String): Long = {
    val s = spark; import s.implicits._
    val df = Seq(key).toDF("v")
    Hashing.ensureRegistered(df)
    df.select(expr(rowHashes("v")).as("hs")).head().getSeq[Long](0)
      .zipWithIndex
      .map { case (h, i) => g(i * width + (h % width).toInt) }.min
  }

  test("grid has depth*width cells and total count rides every row") {
    val g = grid(20)
    assert(g.size === depth * width)
    val total = (1 to 20).sum.toLong
    (0 until depth).foreach { i =>
      assert(g.slice(i * width, (i + 1) * width).sum === total)
    }
  }

  test("point estimates never undercount, and are exact sans collision") {
    val g = grid(20)
    (1 to 20).foreach { k =>
      assert(estimate(g, k.toString) >= k.toLong, s"key $k undercounted")
    }
    // with 20 keys in 4x32 cells most keys are collision-free in some
    // row; the min over rows must then be exact
    val exactHits = (1 to 20).count(k => estimate(g, k.toString) == k.toLong)
    assert(exactHits >= 15, s"only $exactHits/20 exact")
  }

  test("grid is partitioning-invariant (commutative merge)") {
    assert(grid(50, parts = 1) === grid(50, parts = 13))
  }

  test("shard sketches union losslessly by element-wise addition") {
    val s = spark; import s.implicits._
    val df = (1 to 40).flatMap(i => Seq.fill(i)((i % 3, i.toString)))
      .toDF("shard", "v").repartition(8)
    Hashing.ensureRegistered(df)
    val whole = df.select(expr(rowHashes("v")).as("hs"))
      .agg(expr(s"graft_cms(hs, $width)")).head().getSeq[Long](0)
    val shards = df.select(col("shard"), expr(rowHashes("v")).as("hs"))
      .groupBy("shard").agg(expr(s"graft_cms(hs, $width)").as("cms"))
      .collect().map(_.getSeq[Long](1))
    val unioned = shards.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    assert(unioned === whole)
  }

  test("null hash arrays are skipped; null/negative elements raise") {
    val s = spark; import s.implicits._
    val df = Seq(Some("1"), None, Some("2")).toDF("v")
    Hashing.ensureRegistered(df)
    val g = df
      .select(when(col("v").isNotNull, expr(rowHashes("v"))).as("hs"))
      .agg(expr(s"graft_cms(hs, $width)")).head().getSeq[Long](0)
    (0 until depth).foreach(i =>
      assert(g.slice(i * width, (i + 1) * width).sum === 2L))
    val neg = intercept[Exception] {
      df.filter(col("v").isNotNull)
        .select(array(lit(-1L)).as("hs"))
        .agg(expr(s"graft_cms(hs, $width)")).head()
    }
    assert(neg.getMessage.contains("negative hash")
      || neg.getCause != null)
  }

  test("non-foldable, null, out-of-range or tiny width fails typecheck") {
    val s = spark; import s.implicits._
    val df = Seq("1").toDF("v")
    Hashing.ensureRegistered(df)
    Seq("graft_cms(array(1L), v)", "graft_cms(array(1L), null)",
        "graft_cms(array(1L), 0)", "graft_cms(array(1L), 4294967301)",
        "graft_cms(v, 8)").foreach { bad =>
      assertThrows[Exception](df.select(expr(bad)).head())
    }
  }
}
