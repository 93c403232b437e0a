package scratch
import org.apache.spark.sql.SparkSession
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (n <- Seq("st_window_counts", "st_session_counts", "st_stateful_counts", "st_late_data")) {
      graft.SparkEntry.queries(n)(s, d).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(s, d).write.format("noop").mode("overwrite").save()
      println(f"$n ${(System.nanoTime() - t0) / 1e9}%.2f s  conf-after=" + s.conf.get("spark.sql.shuffle.partitions"))
    }
    s.stop()
  }
}
