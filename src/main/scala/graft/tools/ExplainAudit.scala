package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print formatted physical plans for representative queries
  * so the scale-critical properties can be audited — parquet filter
  * pushdown + column pruning (p1), AQE broadcast selection (q3, j7),
  * TakeOrderedAndProject for top-k (o1), no single-partition exchanges in
  * the two-phase rank (w1).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p1_project_filter", "q3_top_revenue", "o1_topk_parts",
        "w1_vocab_rank_band", "d_lsh_neardup", "sim_neardup_pairs",
        "m_mention_tfidf_scaled", "m_skipgram_filter_scaled")
    for (n <- names) {
      println(s"########## $n")
      println(graft.SparkEntry.queries(n)(spark, d)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
