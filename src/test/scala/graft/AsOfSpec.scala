package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf

/** As-of join (graft.ops.AsOf): visibility at equal time, tie-breaking,
  * no-match nulls, and the single-shuffle plan shape.
  */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def df(rows: Seq[(Long, Long, Long)], cols: (String, String, String)) = {
    val s = spark; import s.implicits._
    rows.toDF(cols._1, cols._2, cols._3)
  }

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) =
    AsOf.asofJoin(
      df(left, ("event_id", "k", "t")),
      df(right, ("rid", "k", "t")).select(col("k"), col("t"), col("rid")),
      "k", "t", "rid", Seq("rid"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))

  test("picks the latest right row at or before the left time") {
    val out = run(
      left = Seq((100L, 1L, 50L), (101L, 1L, 15L)),
      right = Seq((7L, 1L, 10L), (8L, 1L, 20L), (9L, 1L, 60L)))
    assert(out === Seq(100L -> Some(8L), 101L -> Some(7L)))
  }

  test("a right row at exactly the left time is visible") {
    val out = run(left = Seq((100L, 1L, 20L)), right = Seq((8L, 1L, 20L)))
    assert(out === Seq(100L -> Some(8L)))
  }

  test("equal-time right rows: greatest tie wins; keys do not leak") {
    val out = run(
      left = Seq((100L, 1L, 30L), (200L, 2L, 30L)),
      right = Seq((7L, 1L, 30L), (9L, 1L, 30L), (8L, 2L, 5L)))
    assert(out === Seq(100L -> Some(9L), 200L -> Some(8L)))
  }

  test("no preceding right row yields a null payload") {
    val out = run(left = Seq((100L, 1L, 5L)), right = Seq((8L, 1L, 10L)))
    assert(out === Seq(100L -> None))
  }

  test("payload name collisions are rejected") {
    val l = df(Seq((1L, 1L, 1L)), ("rid", "k", "t"))
    val r = df(Seq((1L, 1L, 1L)), ("rid", "k", "t"))
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, r, "k", "t", "rid", Seq("rid"))
    }
  }

  test("plan is one shuffle on the key, no join operator") {
    val l = df(Seq((1L, 1L, 1L)), ("event_id", "k", "t"))
    val r = df(Seq((2L, 1L, 1L)), ("rid", "k", "t"))
    val plan = AsOf.asofJoin(l, r, "k", "t", "rid", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
    assert(plan.contains("Window"), s"expected window in plan:\n$plan")
  }
}
