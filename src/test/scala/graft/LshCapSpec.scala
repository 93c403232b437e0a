package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** LSH bucket cap (Dedup.lshCandidates maxBucket): bounds a
  * boilerplate-dominated bucket's quadratic pair contribution,
  * deterministically, without touching healthy buckets.
  */
class LshCapSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  // 40 docs with identical text: every band bucket holds all 40
  private def degenerate = {
    val s = spark; import s.implicits._
    (1L to 40L).map(i => (i, "the same boilerplate text repeated " +
      "everywhere in this degenerate corpus family")).toDF("doc_id", "text")
  }

  test("uncapped: a 40-deep bucket contributes 40*39/2 pairs") {
    val sigs = Dedup.minhashSignatures(Dedup.shingled(degenerate, 3), 8)
    assert(Dedup.lshCandidates(sigs, 4, 2).count() === 40L * 39 / 2)
  }

  test("capped: pair space bounded at maxBucket^2/2, smallest ids kept") {
    val sigs = Dedup.minhashSignatures(Dedup.shingled(degenerate, 3), 8)
    val cands = Dedup.lshCandidates(sigs, 4, 2, maxBucket = 8)
    assert(cands.count() === 8L * 7 / 2)
    // deterministic: the 8 smallest doc_ids survive in every band
    val ids = cands.select(explode(array(col("doc_a"), col("doc_b"))))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ids === (1L to 8L).toSet)
  }

  test("cap above every bucket size changes nothing") {
    val s = spark; import s.implicits._
    val mixed = degenerate.unionByName(Seq(
      (100L, "an entirely different document about gardens and rivers"),
      (101L, "yet another unrelated text mentioning ships and stars"))
      .toDF("doc_id", "text"))
    val sigs = Dedup.minhashSignatures(Dedup.shingled(mixed, 3), 8)
    val uncapped = Dedup.lshCandidates(sigs, 4, 2).orderBy("doc_a", "doc_b")
      .collect().toSeq
    val capped = Dedup.lshCandidates(sigs, 4, 2, maxBucket = 1000)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(capped === uncapped)
  }

  test("minhashLsh end-to-end honors the cap") {
    val out = Dedup.minhashLsh(degenerate, 3, 8, 4, 0.5, maxBucket = 8)
    assert(out.count() === 8L * 7 / 2) // identical docs all verify at 1.0
  }
}
