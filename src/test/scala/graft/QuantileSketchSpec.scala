package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hashing

/** Quantile sample sketch (graft_qsketch): bottom-k-by-(hash,value)
  * parity with a Scala reference under any partitioning, MULTISET
  * semantics (duplicate rows are retained — the sketch samples rows,
  * not distinct values), exact-sample behavior below k, and loud
  * contract failures (NaN values, bad k).
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def md5Hash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Scala reference: multiset bottom-k of (h, v) pairs, values sorted. */
  private def refSample(rows: Seq[(Long, Double)], k: Int): Seq[Double] =
    rows.sorted.take(k).map(_._2).sorted

  test("sketch equals the reference bottom-k sample, any partitioning") {
    val s = spark; import s.implicits._
    val rows = (1 to 300).map(i => (s"id$i", (i * 37 % 101).toDouble))
    val expect = refSample(
      rows.map { case (id, v) => (md5Hash("t:" + id), v) }, 64)
    for (parts <- Seq(1, 8)) {
      val df = rows.toDF("id", "v").repartition(parts)
      Hashing.ensureRegistered(df)
      val got = df
        .select(Hashing.md5Long(concat(lit("t:"), col("id"))).as("h"),
          col("v"))
        .agg(expr("graft_qsketch(h, v, 64)").as("vs"))
        .head().getSeq[Double](0)
      assert(got == expect, s"parts=$parts")
    }
  }

  test("multiset semantics: duplicate (hash, value) rows all count") {
    val s = spark; import s.implicits._
    // three identical rows (same key, same value) — a distinct-based
    // sketch would collapse them and under-weight the value
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 9.0))
      .toDF("id", "v")
    Hashing.ensureRegistered(df)
    val got = df
      .select(Hashing.md5Long(concat(lit("t:"), col("id"))).as("h"),
        col("v"))
      .agg(expr("graft_qsketch(h, v, 10)").as("vs"))
      .head().getSeq[Double](0)
    assert(got.count(_ == 5.0) == 3 && got.count(_ == 9.0) == 1)
  }

  test("below k the sketch IS the exact value multiset") {
    val s = spark; import s.implicits._
    val df = Seq(("x", 3.0), ("y", 1.0), ("z", 2.0)).toDF("id", "v")
    Hashing.ensureRegistered(df)
    val got = df
      .select(Hashing.md5Long(col("id")).as("h"), col("v"))
      .agg(expr("graft_qsketch(h, v, 100)").as("vs"))
      .head().getSeq[Double](0)
    assert(got == Seq(1.0, 2.0, 3.0))
  }

  test("per-group states are independent") {
    val s = spark; import s.implicits._
    val rows = (1 to 200).map(i =>
      (if (i % 2 == 0) "even" else "odd", s"id$i", i.toDouble))
    val df = rows.toDF("g", "id", "v")
    Hashing.ensureRegistered(df)
    val got = df
      .select(col("g"), Hashing.md5Long(col("id")).as("h"), col("v"))
      .groupBy("g").agg(expr("graft_qsketch(h, v, 16)").as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    for ((g, parity) <- Seq("even" -> 0, "odd" -> 1)) {
      val expect = refSample(
        rows.filter(_._1 == g).map { case (_, id, v) => (md5Hash(id), v) },
        16)
      assert(got(g) == expect, g)
      assert(got(g).forall(v => v.toInt % 2 == parity), g)
    }
  }

  test("NaN values fail loudly") {
    val s = spark; import s.implicits._
    val df = Seq(("a", Double.NaN)).toDF("id", "v")
    Hashing.ensureRegistered(df)
    val e = intercept[Exception] {
      df.select(Hashing.md5Long(col("id")).as("h"), col("v"))
        .agg(expr("graft_qsketch(h, v, 4)")).collect()
    }
    assert(e.getMessage.contains("NaN") ||
      e.getCause != null && e.getCause.getMessage.contains("NaN"))
  }

  test("contract violations are rejected at analysis") {
    val s = spark; import s.implicits._
    val df = Seq(("a", 1.0)).toDF("id", "v")
    Hashing.ensureRegistered(df)
    def fails(sql: String): Unit = intercept[Exception] {
      df.select(Hashing.md5Long(col("id")).as("h"), col("v"))
        .agg(expr(sql)).collect()
    }
    fails("graft_qsketch(h, v, 0)")      // k < 1
    fails("graft_qsketch(h, v, h)")      // non-foldable k
    fails("graft_qsketch(v, v, 4)")      // non-BIGINT hash
    fails("graft_qsketch(h, id, 4)")     // non-DOUBLE value
  }
}
