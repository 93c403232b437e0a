package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** MIPS (graft.ops.Similarity.mipsTopK) and the Bachrach norm-
  * augmentation reduction: augmented-cosine ranking must equal raw
  * inner-product ranking, and every augmented corpus vector must have
  * the same norm M — the two facts that let the cosine ANN family
  * index MIPS unchanged.
  */
class MipsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.session

  private def vecs = {
    val s = spark; import s.implicits._
    // distinct norms AND directions: cosine and MIPS orders genuinely
    // differ (vec 5 is long but misaligned; vec 3 short but aligned)
    Seq(
      (0L, Array(1.0, 0.2, 0.1)),
      (1L, Array(0.9, 0.3, 0.0)),
      (2L, Array(2.0, 0.1, 0.3)),
      (3L, Array(0.5, 0.05, 0.02)),
      (4L, Array(0.1, 3.0, 0.2)),
      (5L, Array(0.0, 0.1, 4.0))
    ).toDF("vec_id", "embedding")
  }

  test("augmented-cosine ranking equals inner-product ranking") {
    val c = vecs
    val q = vecs.filter(col("vec_id") < 2)
    def order(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
        .map { case (k, rs) => k -> rs.sortBy(_._2).map(_._3).toSeq }
    val mips = order(Similarity.mipsTopK(q, c, 5)
      .select(col("query_id"), col("rank").cast("long"),
        col("neighbor_id")))
    val aug = order(Similarity.bruteForceTopK(
        Similarity.mipsAugmentQueries(q), Similarity.mipsAugmentCorpus(c), 5)
      .select(col("query_id"), col("rank").cast("long"),
        col("neighbor_id")))
    assert(mips === aug)
    // and MIPS genuinely differs from plain cosine here (vec 4/5 rank
    // high on magnitude) — otherwise this spec proves nothing
    val cos = order(Similarity.bruteForceTopK(q, c, 5)
      .select(col("query_id"), col("rank").cast("long"),
        col("neighbor_id")))
    assert(cos != mips, "test vectors too tame: cosine == MIPS order")
  }

  test("every augmented corpus vector has norm exactly M") {
    graft.functions.GraftFunctions.registerAll(spark)
    val norms = Similarity.mipsAugmentCorpus(vecs)
      .select(expr("sqrt(graft_dot(embedding, embedding))").as("n"))
      .collect().map(_.getDouble(0))
    val m = norms.max
    assert(norms.forall(n => math.abs(n - m) < 1e-9),
      s"augmented norms not constant: ${norms.toSeq}")
  }

  test("knnClassify: majority vote among top-k cosine neighbors, " +
    "self excluded, ties toward the smaller label") {
    val s = spark; import s.implicits._
    // two clean clusters on orthogonal axes + labels
    val corpus = Seq(
      (1L, Array(1.0, 0.0), 0), (2L, Array(0.9, 0.1), 0),
      (3L, Array(0.8, 0.2), 0),
      (4L, Array(0.0, 1.0), 1), (5L, Array(0.1, 0.9), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(
      corpus.filter(col("vec_id").isin(1L, 4L)), corpus, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // query 1 (l0): top-3 = {2, 3, one of the l1s} → 2 votes l0
    // query 4 (l1): top-3 = {5, two l0s}? cos(4,5)=.9..; cos(4,3)=.2;
    // cos(4,2)≈.11; cos(4,1)=0 → top-3 = {5, 3, 2} → l0 2 votes WINS
    // — the mislabel the test wants: a 2-vs-3 cluster imbalance at
    // k=3 flips the minority query, which is exactly kNN behavior
    assert(out.toSeq === Seq((1L, 0L, 0L, 2L, true),
      (4L, 1L, 0L, 2L, false)))
  }
}
