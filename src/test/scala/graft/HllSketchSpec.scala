package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Hashing

/** HyperLogLog register sketch (graft.functions.HllSketch): register
  * semantics, partition invariance, idempotent merge (duplicate
  * immunity), estimate accuracy, and input validation.
  */
class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private val p = 6 // m = 64 for unit tests
  private val m = 1 << p

  private def hashed(vals: Seq[String], parts: Int = 4) = {
    val s = spark; import s.implicits._
    val df = vals.toDF("v").repartition(parts)
    Hashing.ensureRegistered(df)
    df.select(expr(Hashing.md5LongSql("v")).as("h"))
  }

  private def regs(vals: Seq[String], parts: Int = 4): Seq[Int] =
    hashed(vals, parts).agg(expr(s"graft_hll(h, $p)").as("r"))
      .head().getSeq[Int](0)

  test("registers hold the max rank per bucket, zero when unhit") {
    val r = regs((1 to 10).map(_.toString))
    assert(r.size === m)
    assert(r.count(_ > 0) <= 10) // at most one bucket per distinct value
    assert(r.forall(x => x >= 0 && x <= 61 - p))
  }

  test("sketch is partitioning-invariant") {
    val vals = (1 to 500).map(_.toString)
    assert(regs(vals, parts = 1) === regs(vals, parts = 13))
  }

  test("merge is idempotent: duplicates cannot inflate the sketch") {
    val once = regs((1 to 200).map(_.toString))
    val fiveTimes = regs(
      (1 to 200).flatMap(i => Seq.fill(5)(i.toString)), parts = 8)
    assert(once === fiveTimes)
  }

  test("estimate is within 15% at n=2000 with m=512") {
    val s = spark; import s.implicits._
    val df = (1 to 2000).map(_.toString).toDF("v").repartition(16)
    Hashing.ensureRegistered(df)
    val r = df.select(expr(Hashing.md5LongSql("v")).as("h"))
      .agg(expr("graft_hll(h, 9)").as("r")).head().getSeq[Int](0)
    val mm = 512
    val denom = r.foldLeft(0.0)((acc, x) => acc + math.pow(0.5, x))
    val raw = 0.7213 / (1 + 1.079 / mm) * mm * mm / denom
    val zeros = r.count(_ == 0)
    val est = if (raw <= 2.5 * mm && zeros > 0)
      mm * math.log(mm.toDouble / zeros) else raw
    assert(math.abs(est - 2000.0) / 2000.0 < 0.15, s"est=$est")
  }

  test("negative hash raises; bad p fails typecheck") {
    val s = spark; import s.implicits._
    val df = Seq("1").toDF("v")
    Hashing.ensureRegistered(df)
    assertThrows[Exception] {
      df.select(lit(-1L).as("h")).agg(expr(s"graft_hll(h, $p)")).head()
    }
    // 61-63-bit hashes violate the 60-bit family contract: must fail as
    // loudly as negatives, not silently undercount
    assertThrows[Exception] {
      df.select(lit(1L << 60).as("h")).agg(expr(s"graft_hll(h, $p)"))
        .head()
    }
    Seq("graft_hll(cast(1 as bigint), 3)",
        "graft_hll(cast(1 as bigint), 17)",
        "graft_hll(cast(1 as bigint), null)",
        "graft_hll(v, 6)").foreach { bad =>
      assertThrows[Exception](df.select(expr(bad)).head())
    }
  }
}
