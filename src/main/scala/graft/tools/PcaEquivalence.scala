package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway r15 diagnostic: prove the r14 long-form and r15 wide-form
  * PCA chains produce IDENTICAL outputs at sf0.1 (the sf where a
  * pre-existing Spark-vs-DuckDB round() tie shows up).
  */
object PcaEquivalence {
  // the r14 long-form pcaPower/pcaDebias, verbatim
  private def pcaTopComponentOld(corpus: DataFrame, rounds: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val xs = corpus
      .select(col("vec_id"),
        posexplode(expr("cast(embedding as array<double>)")))
      .toDF("vec_id", "dim", "xr")
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        expr("cast(round(xr, 6) as decimal(18,6))").as("x"))
    val mu = xs.groupBy("dim")
      .agg(expr("cast(round(cast(sum(x) as double) / " +
        "cast(count(1) as double), 9) as decimal(18,9))").as("mu"))
    val cx = xs.join(broadcast(mu), Seq("dim"))
      .select(col("vec_id"), col("dim"),
        expr("cast(x - mu as decimal(18,9))").as("c"))
      .localCheckpoint(false)
    var v = mu.select(col("dim"),
      expr("cast(1 as decimal(18,6))").as("v"))
    var lam: DataFrame = null
    for (_ <- 1 to rounds) {
      val dots = cx.join(broadcast(v), Seq("dim"))
        .groupBy("vec_id")
        .agg(expr("cast(round(cast(sum(cast(c * v as decimal(38,15))) " +
          "as double), 9) as decimal(18,9))").as("d"))
      val w = cx.join(dots, Seq("vec_id"))
        .groupBy("dim")
        .agg(expr("cast(round(cast(sum(cast(c * d as decimal(38,18))) " +
          "as double), 9) as decimal(18,9))").as("w"))
      val nrm = w.agg(expr("cast(round(sqrt(cast(sum(cast(w * w as " +
        "decimal(38,18))) as double)), 9) as decimal(18,9))").as("nrm"))
      val vn = w.crossJoin(broadcast(nrm))
        .select(col("dim"),
          expr("case when nrm > 0 then cast(round(cast(w as double) / " +
            "cast(nrm as double), 6) as decimal(18,6)) " +
            "else cast(1 as decimal(18,6)) end").as("v"),
          col("nrm"))
        .localCheckpoint(false)
      v = vn.select(col("dim"), col("v"))
      lam = vn.agg(min(col("nrm")).as("nrm"))
    }
    (cx, v, lam)
  }

  private def pcaPowerOld(corpus: DataFrame): DataFrame = {
    val (_, v, lam) = pcaTopComponentOld(corpus, 6)
    v.crossJoin(broadcast(lam))
      .select(col("dim"), round(col("v").cast("double"), 6).as("loading"),
        round(col("nrm").cast("double"), 6).as("lambda"))
      .orderBy("dim")
  }

  private def pcaDebiasOld(corpus: DataFrame): DataFrame = {
    val (cx, v, _) = pcaTopComponentOld(corpus, 6)
    val p = cx.join(broadcast(v), Seq("dim"))
      .groupBy("vec_id")
      .agg(expr("cast(round(cast(sum(cast(c * v as decimal(38,15))) " +
        "as double), 6) as decimal(18,6))").as("p"))
    cx.join(p, Seq("vec_id")).join(broadcast(v), Seq("dim"))
      .groupBy("vec_id")
      .agg(
        expr("sum(cast(c * c as decimal(38,18)))").as("ss"),
        expr("sum(cast(cast(c - p * v as decimal(18,12)) * " +
          "cast(c - p * v as decimal(18,12)) as decimal(38,24)))")
          .as("rr"))
      .select(col("vec_id"),
        round(expr("sqrt(cast(ss as double))"), 6).as("norm"),
        round(expr("sqrt(cast(rr as double))"), 6).as("resid_norm"),
        round(expr("case when ss > 0 then 1.0 - cast(rr as double) / " +
          "cast(ss as double) end"), 6).as("removed_frac"))
      .orderBy("vec_id")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val corpus = spark.read
        .parquet(s"/root/testdata/$sf/embeddings.parquet")
      val po = pcaPowerOld(corpus).collect()
      val pn = graft.ops.Similarity.pcaPower(corpus).collect()
      println(s"== $sf pcaPower rows old=${po.length} new=${pn.length} " +
        s"equal=${po.toSeq == pn.toSeq}")
      if (po.toSeq != pn.toSeq)
        po.zip(pn).filter { case (a, b) => a != b }.take(5)
          .foreach { case (a, b) => println(s"  OLD $a  NEW $b") }
      val bo = pcaDebiasOld(corpus).collect()
      val bn = graft.ops.Similarity.pcaDebias(corpus).collect()
      println(s"== $sf pcaDebias rows old=${bo.length} new=${bn.length} " +
        s"equal=${bo.toSeq == bn.toSeq}")
      if (bo.toSeq != bn.toSeq)
        bo.zip(bn).filter { case (a, b) => a != b }.take(5)
          .foreach { case (a, b) => println(s"  OLD $a  NEW $b") }
    }
    spark.stop()
  }
}
