package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scd

/** SCD Type-2 build (graft.ops.Scd): versioning, half-open intervals,
  * current-version null, and zero-width same-ts degenerates.
  */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def build(rows: Seq[(Long, Long, Long, String)]) = {
    val s = spark; import s.implicits._
    Scd.scd2(rows.toDF("k", "ts", "id", "v"), "k", "ts", "id")
      .orderBy("k", "version")
      .select("k", "version", "valid_from", "valid_to", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getString(4)))
  }

  test("versions are 1-based per key in ts order; intervals chain") {
    val out = build(Seq(
      (1L, 10L, 100L, "a"), (1L, 30L, 101L, "b"), (2L, 5L, 102L, "x")))
    assert(out === Seq(
      (1L, 1L, 10L, Some(30L), "a"),
      (1L, 2L, 30L, None, "b"),
      (2L, 1L, 5L, None, "x")))
  }

  test("same-ts changes: tie orders versions, earlier gets zero width") {
    val out = build(Seq((1L, 10L, 101L, "b"), (1L, 10L, 100L, "a")))
    assert(out === Seq(
      (1L, 1L, 10L, Some(10L), "a"),   // zero-width [10, 10)
      (1L, 2L, 10L, None, "b")))
  }

  test("interval containment covers every later instant exactly once") {
    val out = build(Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 40L, 3L, "c")))
    for (t <- 10L to 60L) {
      val live = out.filter { case (_, _, from, to, _) =>
        t >= from && to.forall(t < _)
      }
      assert(live.length === 1, s"instant $t")
    }
  }
}
