package graft.tools

import org.apache.spark.sql.SparkSession

/** Count Spark jobs + executed stages for a gate — the cheap evidence
  * that a fan-in pin or a fused pass actually removed executed work
  * (r16 VERDICT item 8: "capture the executed-job count").
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.JobCount gate …
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      @volatile var jobs = 0
      @volatile var stages = 0
      @volatile var tasks = 0L
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages += 1
          tasks += s.stageInfo.numTasks
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Thread.sleep(300) // drain the async listener bus
      } finally spark.sparkContext.removeSparkListener(l)
      println(s"""{"query":"$name","jobs":$jobs,"stages":$stages,"tasks":$tasks}""")
      Console.flush()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
