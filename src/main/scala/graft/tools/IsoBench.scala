package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolation re-bench (the SURVEY §10 drift protocol): each named query
  * is warmed once and then timed `SPARK_GRAFT_REPS` times (default 5)
  * in a fresh JVM, OUTSIDE the 120-query suite — full-suite runs carry
  * cache/GC context that has produced 2-10× phantom drift on individual
  * queries twice now (round 5 t_token_stats, round 6 sim_ivf_topk).
  * Prints per-rep seconds and the median per query.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.IsoBench q1 q2 …
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup, untimed
      val times = (1 to reps).map(_ => once()).sorted
      val median = times(times.length / 2)
      println(s"""{"query":"$name","median":${f3(median)},""" +
        s""""runs":[${times.map(f3).mkString(",")}]}""")
      Console.flush()
    }
    spark.stop()
  }
}
