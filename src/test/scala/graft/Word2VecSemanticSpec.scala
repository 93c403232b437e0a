package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.ml.feature.Word2Vec
import graft.ops.TextModels

/** Semantic (not structural) gate on the embedding trainer: planted
  * synonyms with identical contexts must come out mutual top-1 cosine
  * neighbors, and — the sensitivity proof — the SAME token multiset with
  * co-occurrence destroyed must NOT. A trainer bug that preserves the
  * vocabulary but scrambles the context wiring passes every vocab gate
  * and fails here.
  */
class Word2VecSemanticSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def train(scrambled: Boolean) = {
    val corpus = TextModels.plantedSynonymCorpus(spark,
      scrambled = scrambled)
    new Word2Vec()
      .setInputCol("sentence").setOutputCol("vec")
      .setVectorSize(16).setMinCount(1).setSeed(42L)
      .setMaxIter(5).setNumPartitions(1)
      .fit(corpus)
  }

  private def top1(scrambled: Boolean): Map[String, String] =
    TextModels.top1Neighbors(train(scrambled).getVectors,
        Seq("syn_a", "syn_b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("planted synonyms are mutual top-1 neighbors after training") {
    assert(top1(scrambled = false) ==
      Map("syn_a" -> "syn_b", "syn_b" -> "syn_a"))
  }

  test("scrambled corpus (same vocab, destroyed contexts) fails the gate") {
    // identical token multiset — a structural vocab check cannot tell the
    // two corpora apart; the semantic gate must
    val got = top1(scrambled = true)
    assert(got != Map("syn_a" -> "syn_b", "syn_b" -> "syn_a"),
      s"scrambled corpus still yielded mutual synonym neighbors: $got")
  }

  test("scrambling preserves the token multiset (the control is fair)") {
    import org.apache.spark.sql.functions._
    def counts(scrambled: Boolean) =
      TextModels.plantedSynonymCorpus(spark, scrambled = scrambled)
        .select(explode(col("sentence")).as("w"))
        .groupBy("w").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(scrambled = false) == counts(scrambled = true))
  }
}
