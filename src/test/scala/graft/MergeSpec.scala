package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Merge

/** Merge.applyChanges: upsert/delete semantics, pass-through, and the
  * loud unknown-op contract.
  */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def snap() = {
    val s = spark; import s.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "price")
  }

  private def ch(rows: (Long, String, String, Double)*) = {
    val s = spark; import s.implicits._
    rows.toDF("k", "op", "status", "price")
  }

  test("update overwrites, delete drops, insert adds, rest passes through") {
    val out = Merge.applyChanges(snap(),
      ch((2L, "U", "B", 21.0), (3L, "D", "", 0.0), (4L, "I", "d", 40.0)),
      Seq("k")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out === Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0)))
  }

  test("I on an existing key and U on an absent key both upsert") {
    val out = Merge.applyChanges(snap(),
      ch((1L, "I", "A", 11.0), (9L, "U", "z", 90.0)), Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out === Seq((1L, "A", 11.0), (2L, "b", 20.0),
      (3L, "c", 30.0), (9L, "z", 90.0)))
  }

  test("D on an absent key is a no-op") {
    val out = Merge.applyChanges(snap(), ch((9L, "D", "", 0.0)), Seq("k"))
      .orderBy("k").collect().map(_.getLong(0))
    assert(out === Seq(1L, 2L, 3L))
  }

  test("unknown op fails loudly at execution") {
    val ex = intercept[Exception] {
      Merge.applyChanges(snap(), ch((2L, "X", "b", 20.0)), Seq("k"))
        .collect()
    }
    assert(ex.getMessage.contains("unknown op") ||
      Option(ex.getCause).exists(_.getMessage.contains("unknown op")))
  }

  test("missing payload column on the changes side is rejected") {
    val s = spark; import s.implicits._
    val bad = Seq((1L, "U", "x")).toDF("k", "op", "status")
    val ex = intercept[IllegalArgumentException] {
      Merge.applyChanges(snap(), bad, Seq("k"))
    }
    assert(ex.getMessage.contains("price"))
  }
}
