package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EntityResolution

/** Entity resolution (graft.ops.EntityResolution): typo variants fold
  * into their original's entity, exact-name records cluster, and
  * unmatched records resolve to themselves.
  */
class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def resolve(rows: Seq[(Long, String)]) =
    EntityResolution.resolve(
      { val s = spark; import s.implicits._; rows.toDF("rec_id", "name") },
      "rec_id", "name", maxDist = 1)
      .orderBy("entity_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("typos, exact duplicates, and chains resolve; singletons survive") {
    val out = resolve(Seq(
      1L -> "acme corporation",   // canonical of the big entity
      2L -> "acme corporation",   // exact duplicate
      3L -> "acme corporatio",    // dist 1 from 1/2
      4L -> "zenith labs",        // singleton
      5L -> "blue widget co",     // dist-1 pair with 6
      6L -> "blue widgets co"))
    assert(out === Seq(
      (1L, 3L, "acme corporation"),
      (4L, 1L, "zenith labs"),
      (5L, 2L, "blue widget co")))
  }

  test("entity_id is the minimum member and carries its string") {
    val out = resolve(Seq(9L -> "gamma ray", 3L -> "gamma ra"))
    assert(out === Seq((3L, 2L, "gamma ra")))
  }
}
