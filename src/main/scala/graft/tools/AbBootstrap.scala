package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the bootstrapCi replicate engines (judge r12 next-
  * round item 1): times the [[graft.functions.BootstrapFold]] fold
  * form against the declarative explode form on the sf dir's lineitem,
  * first idle, then under a synthetic CPU antagonist (N busy md5
  * threads — the contention class that inflated the explode form to
  * 247-300 s/rep in the r12 official capture at loadavg 10).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.AbBootstrap
  * (env: SPARK_GRAFT_REPS per-cell reps, default 3;
  *  SPARK_GRAFT_AB_LOAD antagonist thread count, default 32)
  */
object AbBootstrap {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val loadN = sys.env.getOrElse("SPARK_GRAFT_AB_LOAD", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def time(fn: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val forms = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "fold" -> (() => graft.ops.Stats.bootstrapCi(
        li, "l_extendedprice", Seq("l_orderkey", "l_linenumber"))),
      "explode" -> (() => graft.ops.Stats.bootstrapCiExplode(
        li, "l_extendedprice", Seq("l_orderkey", "l_linenumber"))))
    // correctness first: both engines must agree before timing means
    // anything
    val a = forms(0)._2().collect().map(_.toSeq).toSeq
    val b = forms(1)._2().collect().map(_.toSeq).toSeq
    require(a == b, s"fold/explode DISAGREE: $a vs $b")
    println(s"""{"parity":"ok","rows":${a.size}}""")

    def sweep(label: String): Unit =
      for ((name, fn) <- forms) {
        time(fn) // warm
        val ts = (1 to reps).map(_ => time(fn)).sorted
        println(s"""{"load":"$label","form":"$name",""" +
          s""""median":${f3(ts(ts.length / 2))},""" +
          s""""runs":[${ts.map(f3).mkString(",")}]}""")
        Console.flush()
      }
    sweep("idle")
    @volatile var stop = false
    val spinners = (1 to loadN).map { i =>
      val t = new Thread(() => {
        val md = java.security.MessageDigest.getInstance("MD5")
        val buf = s"antagonist-$i".getBytes
        while (!stop) { md.update(buf); md.digest() }
      })
      t.setDaemon(true); t.start(); t
    }
    sweep(s"busy$loadN")
    stop = true
    spinners.foreach(_.join(1000))
    spark.stop()
  }
}
