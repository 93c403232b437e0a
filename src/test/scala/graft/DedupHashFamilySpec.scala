package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Proves the documented production hash swap: the dedup operators only
  * need a uniform hash family, so Spark's codegen'd `xxhash64` drops in
  * for the md5 verification family without touching the pipeline shape.
  */
class DedupHashFamilySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  test("minhashSignatures runs identically shaped under xxhash64") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no overlap at all"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingled(docs, 3)
    val md5Sigs = Dedup.minhashSignatures(sh, 8).collect()
    val xxSigs = Dedup
      .minhashSignatures(sh, 8, s => s"xxhash64($s)").collect()
    assert(md5Sigs.length == 3 && xxSigs.length == 3)
    // both families produce full-width signatures...
    xxSigs.foreach(r => assert(r.getSeq[Long](1).length == 8))
    // ...and near-duplicate docs share more signature slots than
    // unrelated ones under EITHER family
    def agree(rows: Array[org.apache.spark.sql.Row], a: Long, b: Long) = {
      val m = rows.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      m(a).zip(m(b)).count { case (x, y) => x == y }
    }
    assert(agree(xxSigs, 1, 2) > agree(xxSigs, 1, 3))
    assert(agree(md5Sigs, 1, 2) > agree(md5Sigs, 1, 3))
  }
}
